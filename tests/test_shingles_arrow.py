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
