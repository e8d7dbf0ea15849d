from balboa_spark.operators.aggregate import aggregate, merge_increment, total_count
from balboa_spark.operators.query import Query, entries, aliases, rest_search, cidr_search

__all__ = [
    "aggregate",
    "merge_increment",
    "total_count",
    "Query",
    "entries",
    "aliases",
    "rest_search",
    "cidr_search",
]
