from balboa_spark.streaming.selectors import SelectorRule, compile_selectors, route
