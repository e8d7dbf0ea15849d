"""Stream-stream event-time interval join.

The batch engine's point-in-interval join (temporal.interval_join)
rewrites BETWEEN into a bucketed equi-join; on two UNBOUNDED streams
the same semantics need watermarks on BOTH sides plus an event-time
range in the join condition, so Spark can bound the buffered state:
a left row is held only until the watermark passes ``left_ts +
max_delay`` — after that no future right row can match it and the
state store drops it.

The canonical shape is impression->click attribution: match each
right event to the left event with the same key whose timestamp
precedes it by at most ``max_delay``. State per side is bounded by
(arrival rate x watermark horizon), independent of stream length —
without the time-range condition Spark would rightly refuse to plan
an inner stream-stream join with unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner join: right events to the left event of the same key at
    most ``max_delay`` earlier. Column names are prefixed left_/right_
    to keep both timestamps in the output."""
    lp = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("left_ts"),
        *[
            F.col(c).alias(f"left_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    ).withWatermark("left_ts", watermark)
    rp = right.select(
        F.col(key).alias(f"_rk"),
        F.col(right_ts).alias("right_ts"),
        *[
            F.col(c).alias(f"right_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark("right_ts", watermark)
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return (
        lp.join(rp, cond, "inner")
        .drop("_rk")
        .withColumnRenamed("_k", key)
    )
