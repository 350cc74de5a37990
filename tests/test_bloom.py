"""operators/bloom.py — relational Bloom filter + DedupIndex sidecars.

Correctness contract: NO false negatives ever (exactness of the
surrounding dedup depends on it); false positives only cost extra
exact checks. Scale contract: probing never shuffles the probed side,
and the bloom-enabled incremental exact leg never shuffles history.
"""

import pyspark.sql.functions as F

from s3_log_parser_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)

M = 1 << 14
K = 5


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_no_false_negatives_both_modes(spark):
    hist = _keys(spark, 0, 400)
    probe = _keys(spark, 0, 400)
    for mode in ("djb2", "xxhash64"):
        bm = bloom_build(hist, "k", M, K, mode)
        out = bloom_probe(probe, bm, "k", M, K, mode)
        assert out.filter(~F.col("bloom_maybe")).count() == 0, mode


def test_false_positive_rate_sane(spark):
    # 400 keys in 2^14 bits, k=5 → theoretical fp ~2e-5; allow 1%
    bm = bloom_build(_keys(spark, 0, 400), "k", M, K, "xxhash64")
    out = bloom_probe(_keys(spark, 1000, 3000), bm, "k", M, K, "xxhash64")
    assert out.filter(F.col("bloom_maybe")).count() <= 20


def test_probe_keeps_all_rows_and_columns(spark):
    df = _keys(spark, 0, 50).withColumn("payload", F.col("k"))
    bm = bloom_build(_keys(spark, 0, 10), "k", M, K, "djb2")
    out = bloom_probe(df, bm, "k", M, K, "djb2")
    assert out.columns == ["k", "payload", "bloom_maybe"]
    assert out.count() == 50


def test_probe_plan_never_shuffles_probed_side(spark):
    bm = bloom_build(_keys(spark, 0, 100), "k", M, K, "xxhash64")
    out = bloom_probe(_keys(spark, 0, 1000), bm, "k", M, K, "xxhash64")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_merge_equals_full_build(spark):
    """union-of-blooms == bloom-of-union for identical (m, k, mode) —
    what makes per-batch bitmap APPENDS exact."""
    a, b = _keys(spark, 0, 200), _keys(spark, 200, 400)
    merged = bloom_merge(
        bloom_build(a, "k", M, K, "djb2").unionByName(
            bloom_build(b, "k", M, K, "djb2")
        )
    )
    full = bloom_build(_keys(spark, 0, 400), "k", M, K, "djb2")
    assert merged.subtract(full).count() == 0
    assert full.subtract(merged).count() == 0


HIST_TEXT = (
    "the quick brown fox jumps over one lazy dog while seven other "
    "animals watch from a distant hill"
)


def _hist(spark):
    return spark.createDataFrame(
        [(0, HIST_TEXT),
         (1, "entirely separate historical record about glacier melt "
             "rates in northern fjords")],
        "doc_id long, text string",
    )


def _batch(spark):
    return spark.createDataFrame(
        [
            (100, HIST_TEXT),                              # exact dup
            (101, HIST_TEXT.replace("seven", "nine")),     # near dup
            (102, "totally fresh content about sailing boats across "
                  "quiet northern lakes during autumn"),
        ],
        "doc_id long, text string",
    )


def test_incremental_dedup_bloom_parity(spark, tmp_path):
    """bloom-sidecar index path returns EXACTLY the plain-index
    survivors (both legs), through a write→read round-trip."""
    from s3_log_parser_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    hist, new = _hist(spark), _batch(spark)
    idx_dir = str(tmp_path / "bloom_index")
    write_dedup_index(
        build_dedup_index(hist, bloom_m_bits=M, bloom_k=K), idx_dir
    )
    idx = read_dedup_index(spark, idx_dir)
    assert idx.bloom_m == M and idx.bloom is not None

    out = incremental_dedup(new, index=idx, threshold_x1000=500)
    assert {r["doc_id"] for r in out.collect()} == {102}
    exact_only = incremental_dedup(new, index=idx, near=False)
    assert {r["doc_id"] for r in exact_only.collect()} == {101, 102}


def test_incremental_dedup_bloom_exact_leg_no_shuffle_join(spark, tmp_path):
    """with the digest bloom, the exact leg is broadcast joins only —
    the history digest table is scanned map-side, never shuffled."""
    from s3_log_parser_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    idx_dir = str(tmp_path / "bloom_index2")
    write_dedup_index(
        build_dedup_index(_hist(spark), bloom_m_bits=M, bloom_k=K), idx_dir
    )
    idx = read_dedup_index(spark, idx_dir)
    out = incremental_dedup(_batch(spark), index=idx, near=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert {r["doc_id"] for r in out.collect()} == {101, 102}


def test_append_maintains_bloom(spark, tmp_path):
    """daily loop with sidecars: append batch-1 survivors, then batch 2
    must drop dups of BOTH original history and batch-1 accepts —
    bitmap fragments OR back together on read."""
    from s3_log_parser_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    idx_dir = str(tmp_path / "bloom_index3")
    write_dedup_index(
        build_dedup_index(_hist(spark), bloom_m_bits=M, bloom_k=K), idx_dir
    )
    b1 = incremental_dedup(
        _batch(spark), index=read_dedup_index(spark, idx_dir),
        threshold_x1000=500,
    ).persist()
    assert {r["doc_id"] for r in b1.collect()} == {102}
    append_to_dedup_index(b1, idx_dir)

    b2 = spark.createDataFrame(
        [(200, "totally fresh content about sailing boats across quiet "
               "northern lakes during autumn"),     # dup of batch-1 accept
         (201, HIST_TEXT),                          # dup of original history
         (202, "genuinely novel follow-up story regarding mountain trail "
               "maintenance crews and their tools")],
        "doc_id long, text string",
    )
    out = incremental_dedup(
        b2, index=read_dedup_index(spark, idx_dir), threshold_x1000=500
    )
    assert {r["doc_id"] for r in out.collect()} == {202}


def test_compact_dedup_index(spark, tmp_path):
    """compaction removes append-duplicated digests/rows and pre-ORs
    bitmap fragments; dedup results are unchanged afterwards."""
    from s3_log_parser_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        compact_dedup_index,
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    idx_dir = str(tmp_path / "bloom_index4")
    write_dedup_index(
        build_dedup_index(_hist(spark), bloom_m_bits=M, bloom_k=K), idx_dir
    )
    # simulate a replayed append: the same accepted doc lands twice
    accept = spark.createDataFrame(
        [(300, "replayed accepted document about harbor ferries and "
               "their winter maintenance schedule")],
        "doc_id long, text string",
    )
    append_to_dedup_index(accept, idx_dir)
    append_to_dedup_index(accept, idx_dir)
    before = read_dedup_index(spark, idx_dir)
    assert before.digests.count() > before.digests.distinct().count()

    compact_dedup_index(spark, idx_dir)
    after = read_dedup_index(spark, idx_dir)
    assert after.digests.count() == after.digests.distinct().count()
    assert after.sigs.groupBy("id").count().filter("count > 1").count() == 0
    # bitmap fragments collapsed to one row per word
    raw_bloom = spark.read.parquet(f"{idx_dir}/bloom")
    assert (
        raw_bloom.groupBy("word_idx").count().filter("count > 1").count()
        == 0
    )
    # behavior unchanged: history dup + replayed-accept dup both drop
    batch = spark.createDataFrame(
        [(400, HIST_TEXT),
         (401, "replayed accepted document about harbor ferries and "
               "their winter maintenance schedule"),
         (402, "an unrelated report on tidal measurements near the "
               "eastern breakwater during spring")],
        "doc_id long, text string",
    )
    out = incremental_dedup(batch, index=after, threshold_x1000=500)
    assert {r["doc_id"] for r in out.collect()} == {402}
