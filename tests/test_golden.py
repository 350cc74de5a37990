"""Committed golden fixtures (FIXTURES.md §3): DJB2 values and the 8
flag cases ported from the reference's GTest suite — executable spec
that pins kernel behavior independent of the library implementation."""

import json
import os

import pytest
from pyspark.sql import functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


def test_djb2_golden_values(spark):
    from s3_log_parser_spark.functions.hashes import djb2_expr, djb2_py

    golden = json.load(open(os.path.join(GOLDEN, "djb2.json")))
    for s, want in golden.items():
        assert djb2_py(s) == want
    df = spark.createDataFrame([(s,) for s in golden], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", djb2_expr("s").alias("h")).collect()}
    assert got == golden


def test_golden_slim_regression(spark):
    """the full DAG over the seed-42 10k fixture must reproduce the
    committed golden slim table exactly (FIXTURES.md §3) — any semantic
    drift in parse/encode/enrich/flags breaks this."""
    from s3_log_parser_spark.plans.pipeline import build_slim
    from s3_log_parser_spark.sources.gen import gen_transcripts

    golden = spark.read.parquet(os.path.join(GOLDEN, "slim.parquet"))
    slim = build_slim(gen_transcripts(spark, rows=10_000))
    assert slim.exceptAll(golden).isEmpty()
    assert golden.exceptAll(slim).isEmpty()


def test_golden_sink_counts(spark):
    from pyspark.sql import functions as F

    from s3_log_parser_spark.plans.pipeline import build_slim
    from s3_log_parser_spark.sources.gen import gen_transcripts

    want = json.load(open(os.path.join(GOLDEN, "sink_counts.json")))
    slim = build_slim(gen_transcripts(spark, rows=10_000))
    ok = slim.filter("parse_status = 'ok'")
    got = {
        r["tool"]: r["c"]
        for r in ok.groupBy("tool").agg(F.count("*").alias("c")).collect()
    }
    assert got == want["by_tool"]
    got = {
        r["parse_status"]: r["c"]
        for r in slim.filter("parse_status != 'ok'")
        .groupBy("parse_status")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == want["rejects"]


def test_flags_golden_cases(spark):
    from s3_log_parser_spark.operators.flags import chunk_flags

    cases = json.load(open(os.path.join(GOLDEN, "flags_cases.json")))
    df = spark.createDataFrame(
        [
            (c["name"], c["http"], c["start"], c["end"], c["size"], c["first"])
            for c in cases
        ],
        "name string, http int, start long, end long, size long, first boolean",
    )
    out = df.select(
        "name",
        chunk_flags(
            F.col("http"), F.col("start"), F.col("end"), F.col("size"), F.col("first")
        ).alias("flags"),
    )
    got = {r["name"]: r["flags"] for r in out.collect()}
    want = {c["name"]: c["flags"] for c in cases}
    assert got == want
