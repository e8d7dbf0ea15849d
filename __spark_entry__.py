"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (aggregate fold) on sf0.001
queries()      -> name -> (spark, sf_dir) -> DataFrame
oracle_sql()   -> name -> DuckDB SQL computing the same result

Implementation lives in balboa_spark/ (see SURVEY.md §2 for the
operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: normalize events → group-merge fold → aggregate table
    (the reference's whole write path, SURVEY §3.1) on sf0.001."""
    from balboa_spark.entry_queries import q_observations_agg

    return q_observations_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from balboa_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from balboa_spark.entry_queries import ORACLES

    return dict(ORACLES)
