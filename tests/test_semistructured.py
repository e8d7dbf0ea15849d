"""Schema-on-read over JSON string columns
(balboa_spark.operators.semistructured)."""

from __future__ import annotations

from pyspark.sql import functions as F

from balboa_spark.operators.semistructured import (
    extract_json,
    json_field,
    json_key_profile,
)


def _messy(spark):
    rows = [
        (1, '{"k": 7, "name": "a", "flag": true}'),
        (2, '{"k": -3, "score": 1.5, "flag": false}'),
        (3, '{"k": null, "meta": {"x": 1}, "tags": [1, 2]}'),
        (4, "not json at all"),
        (5, None),
        (6, '{"score": 2e3, "name": "b"}'),
    ]
    return spark.createDataFrame(rows, ["id", "props"])


def test_extract_json_typed_and_null_safe(spark):
    df = _messy(spark)
    out = {
        r["id"]: r
        for r in extract_json(
            df,
            "props",
            {
                "k": ("k", "int"),
                "name": ("name", "string"),
                "x": ("meta.x", "int"),
            },
        ).collect()
    }
    assert out[1]["k"] == 7 and out[1]["name"] == "a"
    assert out[2]["k"] == -3
    # explicit null, nested path, corrupt row, NULL blob -> NULL, no error
    assert out[3]["k"] is None and out[3]["x"] == 1
    assert out[4]["k"] is None and out[5]["k"] is None
    assert out[6]["name"] == "b"
    # the JSON column is consumed
    assert "props" not in out[1].asDict()


def test_extract_json_is_projection_only(spark):
    plan = (
        extract_json(_messy(spark), "props", {"k": ("k", "int")})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_json_key_profile_types_and_corrupt(spark):
    prof = {
        (r["key"], r["type"]): r["n"]
        for r in json_key_profile(_messy(spark), "props").collect()
    }
    assert prof[("k", "int")] == 2
    assert prof[("k", "null")] == 1
    assert prof[("flag", "bool")] == 2
    assert prof[("score", "float")] == 2  # 1.5 and 2e3
    assert prof[("name", "string")] == 2
    assert prof[("meta", "object")] == 1
    assert prof[("tags", "array")] == 1
    # corrupt text counted, NULL blob ignored
    assert prof[("_corrupt", "corrupt")] == 1
    assert sum(n for (k, _t), n in prof.items() if k == "_corrupt") == 1


def test_json_field_missing_key_is_null(spark):
    df = spark.createDataFrame([(1, '{"a": 1}')], ["id", "j"])
    row = df.select(json_field(F.col("j"), "b", "int").alias("b")).collect()[0]
    assert row["b"] is None


def test_json_field_type_mismatch_is_null_not_crash(spark):
    """Spark 4 default ANSI mode: a plain cast of '1.5' to int kills
    the job; extraction must try_cast so messy values degrade to NULL
    like missing keys do."""
    df = spark.createDataFrame(
        [(1, '{"k": 1.5}'), (2, '{"k": "oops"}'), (3, '{"k": 7}')],
        ["id", "props"],
    )
    out = {
        r["id"]: r["k"]
        for r in extract_json(df, "props", {"k": ("k", "int")}).collect()
    }
    assert out == {1: None, 2: None, 3: 7}
