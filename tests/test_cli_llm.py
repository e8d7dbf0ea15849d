

def test_cli_sft_pairs_and_shards_e2e(spark, tmp_path):
    """sft-pairs + shards-export + shards-reexport subcommands drive
    the library paths end to end."""
    from pyspark.sql import functions as F

    from balboa_spark.cli import build_parser, run
    from balboa_spark.operators import shards

    ratings = spark.createDataFrame(
        [(1, 10, "good", 5.0), (1, 11, "bad", 1.0), (2, 20, "only", 3.0)],
        "prompt_id long, response_id long, response string, score double",
    )
    rin = str(tmp_path / "ratings"); ratings.write.parquet(rin)
    pout = str(tmp_path / "pairs")
    assert run(build_parser().parse_args(["sft-pairs", rin, pout]), spark=spark) == 0
    got = spark.read.parquet(pout).collect()
    assert len(got) == 1 and got[0]["chosen_id"] == 10

    packed = spark.range(20).select(
        F.col("id").alias("seq_id"),
        F.transform(F.sequence(F.lit(1), F.lit(4)), lambda i: i).alias("token_ids"),
    )
    pin = str(tmp_path / "packed"); packed.write.parquet(pin)
    sout = str(tmp_path / "shards")
    argv = ["shards-export", pin, sout, "--seq-len", "4", "--num-shards", "2"]
    assert run(build_parser().parse_args(argv), spark=spark) == 0
    assert shards.read_training_shards(spark, sout)[0].count() == 20

    changed = spark.createDataFrame([(3,)], "seq_id long")
    cin = str(tmp_path / "changed"); changed.write.parquet(cin)
    argv = ["shards-reexport", pin, sout, cin]
    assert run(build_parser().parse_args(argv), spark=spark) == 0
    df, m = shards.read_training_shards(spark, sout)
    assert m["generation"] == 1 and df.count() == 20


def test_cli_sft_rejection_e2e(spark, tmp_path):
    from balboa_spark.cli import build_parser, run

    ratings = spark.createDataFrame(
        [(1, 10, "top", 9.0), (1, 11, "mid", 6.0), (1, 12, "low", 1.0)],
        "prompt_id long, response_id long, response string, score double",
    )
    rin = str(tmp_path / "rat"); ratings.write.parquet(rin)
    out = str(tmp_path / "rft")
    argv = ["sft-rejection", rin, out, "--threshold", "5", "--top-k", "2"]
    assert run(build_parser().parse_args(argv), spark=spark) == 0
    got = sorted((r.rank, r.response_id) for r in spark.read.parquet(out).collect())
    assert got == [(1, 10), (2, 11)]
