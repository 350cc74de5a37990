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
