"""Format registry: name -> (raw schema, normalizer) — the Spark
restatement of the feeder config's format switch
(feeder/feeder_config.go:123-147).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from balboa_spark import schemas
from balboa_spark.sources import (
    fever,
    gamelinux,
    gopassivedns,
    nmsg,
    packetbeat,
    suricata,
)

#: format name (as in feeders.yaml) -> (schema or None for text, normalize fn)
FORMATS = {
    "suricata_dns": (schemas.SURICATA_EVE, suricata.normalize),
    "fever_aggregate": (schemas.FEVER_AGGREGATE, fever.normalize),
    "gopassivedns": (schemas.GOPASSIVEDNS, gopassivedns.normalize),
    "packetbeat_dns": (schemas.PACKETBEAT, packetbeat.normalize),
    "gamelinux": (None, gamelinux.normalize),
    "nmsg_newdomain": (schemas.NMSG_NEWDOMAIN, nmsg.normalize),
}

# reference feeder-config vocabulary (feeder_config.go:123-147)
FORMATS["packetbeat"] = FORMATS["packetbeat_dns"]
FORMATS["nmsg"] = FORMATS["nmsg_newdomain"]


def normalize_json_lines(
    lines: DataFrame, fmt: str, sensor_id=None, value_col: str = "value"
) -> DataFrame:
    """Normalize a DataFrame of raw text lines (one message per row, as
    produced by spark.read/readStream.format('text') or a Kafka value
    column) for the given format name.

    This is the engine's UDTF seam (X1): bytes -> 0..n observation rows,
    entirely via from_json + the format's declarative normalizer.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(FORMATS)}")
    schema, fn = FORMATS[fmt]
    if schema is None:  # line-oriented tabular format
        return fn(lines, sensor_id=sensor_id, value_col=value_col)
    parsed = lines.select(
        F.from_json(F.col(value_col), schema).alias("m"), "*"
    ).select("m.*", *[c for c in lines.columns if c != value_col])
    return fn(parsed, sensor_id=sensor_id)
