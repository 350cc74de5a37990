"""Streaming sketch maintenance: cross-batch merge equals the batch
sketch of all data; HLL replay idempotence; CMS replay guard."""

from pyspark.sql import functions as F

from s3_log_parser_spark.operators.sketch import cms_sketch, hll_sketch
from s3_log_parser_spark.streaming.sketches import (
    read_cms_table,
    read_hll_table,
    start_cms_stream,
    start_hll_stream,
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("u"), (F.col("id") % 400).cast("string")).alias("k")
    )


def test_hll_stream_two_batches_equals_batch_sketch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("hll_src"))
    tbl = str(tmp_path_factory.mktemp("hll_out")) + "/registers"
    ckpt = str(tmp_path_factory.mktemp("hll_ckpt"))

    _keys(spark, 0, 500).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    start_hll_stream(stream, tbl, ckpt).awaitTermination(120)

    # second micro-batch arrives later (overlapping keys)
    _keys(spark, 300, 900).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    start_hll_stream(stream, tbl, ckpt).awaitTermination(120)

    want = sorted(
        map(tuple, hll_sketch(_keys(spark, 0, 900), "k").collect())
    )
    got = sorted(map(tuple, read_hll_table(spark, tbl).collect()))
    assert got == want


def test_hll_fold_is_replay_idempotent(spark, tmp_path_factory):
    from s3_log_parser_spark.streaming.sketches import (
        _overwrite_tiny,
        hll_merge,
    )

    tbl = str(tmp_path_factory.mktemp("hll_replay")) + "/registers"
    batch = _keys(spark, 0, 500)
    sk = hll_sketch(batch, "k")
    _overwrite_tiny(sk, tbl)
    before = sorted(map(tuple, read_hll_table(spark, tbl).collect()))
    # replay: fold the same batch again — max-merge must be a no-op
    _overwrite_tiny(hll_merge(read_hll_table(spark, tbl), sk), tbl)
    after = sorted(map(tuple, read_hll_table(spark, tbl).collect()))
    assert after == before


def test_cms_stream_merges_and_skips_replayed_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("cms_src"))
    tbl = str(tmp_path_factory.mktemp("cms_out")) + "/counters"
    ckpt = str(tmp_path_factory.mktemp("cms_ckpt"))

    _keys(spark, 0, 500).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    start_cms_stream(stream, tbl, ckpt, width=64).awaitTermination(120)

    _keys(spark, 500, 900).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    start_cms_stream(stream, tbl, ckpt, width=64).awaitTermination(120)

    want = sorted(
        map(tuple, cms_sketch(_keys(spark, 0, 900), "k", width=64).collect())
    )
    got = sorted(
        map(tuple, read_cms_table(spark, tbl).drop("_batch").collect())
    )
    assert got == want

    # a NEW stream over the same source replays batch 0+1 with the same
    # ids from the fresh checkpoint — without the high-water mark the
    # counters would double. Simulate by re-running with a fresh ckpt:
    ckpt2 = str(tmp_path_factory.mktemp("cms_ckpt2"))
    stream = spark.readStream.schema("k string").parquet(src)
    start_cms_stream(stream, tbl, ckpt2, width=64).awaitTermination(120)
    got2 = sorted(
        map(tuple, read_cms_table(spark, tbl).drop("_batch").collect())
    )
    assert got2 == want  # high-water mark skipped the replay
