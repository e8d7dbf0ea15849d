from balboa_spark.plans.layout import ObservationStore
