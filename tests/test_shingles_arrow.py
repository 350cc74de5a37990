"""Parity pins for the vectorized Arrow shingle kernel (r7): the
mapInArrow kernel must reproduce the pure-Catalyst
``shingle_hashes`` arrays BIT-FOR-BIT (values and first-occurrence
order) on the fixture corpus and on adversarial edge rows."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _edge(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "one"),
            (5, "one two"),
            (6, "one two three"),
            (7, "  a\t b\nc  d "),
            (8, "x x x x x x x x x x"),  # repeated shingles → distinct
            (9, "héllo wörld café naïve test"),  # non-ASCII codepoints
            (10, "a b c d e f g h i j"),
        ],
        "doc_id long, text string",
    )


def test_arrow_kernel_matches_catalyst_kernel(spark):
    from s3_log_parser_spark.functions.shingles_arrow import with_shingles
    from s3_log_parser_spark.operators.dedup import shingle_hashes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for n in (2, 3, 8):
        for src in (docs, _edge(spark)):
            cat = {
                r["id"]: r["sh"]
                for r in src.select(
                    F.col("doc_id").alias("id"),
                    shingle_hashes("text", n).alias("sh"),
                ).collect()
            }
            arr = {
                r["id"]: r["sh"]
                for r in with_shingles(
                    src.select(F.col("doc_id").alias("id"), "text"),
                    "text",
                    n,
                    keep=("id",),
                ).collect()
            }
            assert cat == arr, f"n={n}: kernel mismatch"


def test_simhash_arrow_matches_catalyst(spark, monkeypatch):
    from s3_log_parser_spark.operators.dedup import simhash_df

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for bits in (16, 64):
        for src in (docs, _edge(spark)):
            arrow = {
                r["id"]: r["simhash"]
                for r in simhash_df(src, bits=bits).collect()
            }
            monkeypatch.setenv("SPARK_GRAFT_SHINGLE_IMPL", "catalyst")
            cat = {
                r["id"]: r["simhash"]
                for r in simhash_df(src, bits=bits).collect()
            }
            monkeypatch.delenv("SPARK_GRAFT_SHINGLE_IMPL")
            assert arrow == cat, f"bits={bits}"


def test_shingle_frame_routes_through_arrow_by_default(spark):
    from s3_log_parser_spark.operators.dedup import shingle_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = shingle_frame(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    # map-side only: the kernel adds no exchange
    assert "Exchange" not in plan


def test_catalyst_fallback_env(spark, monkeypatch):
    from s3_log_parser_spark.operators import dedup

    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_IMPL", "catalyst")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        dedup.shingle_frame(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" not in plan


def test_xxhash64_kernel_matches_catalyst(spark):
    """the r7 xxhash64 kernel mode must be bit-exact vs the Catalyst
    xxhash64 chain — including unicode tokens, >32-byte tokens (the
    XXH64 block path), short rows and NULL/empty text."""
    from pyspark.sql import functions as F

    from s3_log_parser_spark.functions.shingles_arrow import with_shingles
    from s3_log_parser_spark.operators.dedup import shingle_hashes

    rows = [
        (0, "aa bb cc dd ee"),
        (1, "one two"),
        (2, ""),
        (3, None),
        (4, "solo"),
        (5, "héllo wörld ünïcode tökens"),
        (6, "x " * 50),
        (7, "a-very-long-token-exceeding-thirty-two-bytes-for-the-"
            "block-path mid tail end more"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (3, 8):
        a = {
            r["doc_id"]: r["sh"]
            for r in with_shingles(
                df, "text", n, keep=("doc_id",), mode="xxhash64"
            ).collect()
        }
        b = {
            r["doc_id"]: r["sh"]
            for r in df.select(
                "doc_id", shingle_hashes("text", n, "xxhash64").alias("sh")
            ).collect()
        }
        assert a == b


def test_xxhash64_primitives_match_spark(spark):
    """the numpy/python XXH64 primitives must match F.xxhash64 exactly
    (string bytes with seed 42; long chaining h = X(le64(v), h))."""
    import numpy as np
    from pyspark.sql import functions as F

    from s3_log_parser_spark.functions.shingles_arrow import (
        _xxh64_bytes,
        _xxh64_long_py,
        _xxh64_long_vec,
    )

    r = (
        spark.range(1)
        .select(
            F.xxhash64(F.lit("hello")).alias("s"),
            F.xxhash64(F.lit(123).cast("long")).alias("l"),
            F.xxhash64(
                F.lit(5381).cast("long"), F.lit(99).cast("long")
            ).alias("two"),
        )
        .collect()[0]
    )

    def s64(u):
        u = int(u)
        return u - (1 << 64) if u >= (1 << 63) else u

    assert s64(_xxh64_bytes(b"hello")) == r["s"]
    assert s64(_xxh64_long_py(123, 42)) == r["l"]
    assert s64(_xxh64_long_py(99, _xxh64_long_py(5381, 42))) == r["two"]
    v = _xxh64_long_vec(np.array([123], dtype=np.uint64), np.uint64(42))
    assert s64(int(v[0])) == r["l"]
