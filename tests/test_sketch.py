"""Mergeable sketch laws: HLL register parity + merge algebra, CMS
never-undercount + linearity."""

import pytest
from pyspark.sql import functions as F

from s3_log_parser_spark.operators.sketch import (
    cms_lookup,
    cms_merge,
    cms_sketch,
    hll_estimate,
    hll_estimate_py,
    hll_hash_py,
    hll_merge,
    hll_sketch,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 5000 distinct string keys, some repeated (dupes must not move
    # any register — HLL counts distinct, not rows)
    return spark.range(8000).select(
        F.concat(F.lit("key-"), (F.col("id") % 5000).cast("string")).alias("k")
    )


def _ranks(sketch_df):
    return {r.bucket: r.r for r in sketch_df.collect()}


def test_hll_registers_match_python_reference(spark, keys):
    got = _ranks(hll_sketch(keys, "k"))
    want: dict[int, int] = {}
    for i in range(5000):
        h = hll_hash_py(f"key-{i}")
        b, w = h % 512, h >> 9
        r = 23 if w == 0 else 23 - w.bit_length()
        want[b] = max(want.get(b, 0), r)
    assert got == want


def test_hll_merge_equals_full_and_is_idempotent(spark, keys):
    full = hll_sketch(keys, "k")
    h1 = hll_sketch(keys.filter(F.crc32("k") % 2 == 0), "k")
    h2 = hll_sketch(keys.filter(F.crc32("k") % 2 == 1), "k")
    merged = hll_merge(h1, h2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # idempotent: re-merging an already-merged day is a no-op
    again = hll_merge(merged, h1)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_estimate_accuracy_and_python_parity(spark, keys):
    sk = hll_sketch(keys, "k")
    row = hll_estimate(sk, correction=False).collect()[0]
    # standard error 1.04/sqrt(512) ≈ 4.6%; 3σ bound
    assert abs(row.est_x1000 / 1000 - 5000) < 5000 * 0.15
    ref = hll_estimate_py(_ranks(sk), correction=False)
    assert row.est_x1000 == int(ref * 1000 // 1)


def test_hll_small_range_correction_branch(spark):
    # 40 distinct << 2.5·512 → linear counting branch engages
    tiny = spark.range(40).select(F.concat(F.lit("t"), "id").alias("k"))
    sk = hll_sketch(tiny, "k")
    got = hll_estimate(sk).collect()[0].est_x1000 / 1000
    ref = hll_estimate_py(_ranks(sk))
    # got is floored at ×1000 (and the branch's ln is libm-dependent):
    # agreement to the fixed-point grid is the contract
    assert abs(got - ref) < 1.5e-3
    assert abs(got - 40) < 40 * 0.25  # linear counting is tight here


def test_cms_never_undercounts_any_key(spark):
    df = spark.range(2000).select(
        (F.col("id") % 97).cast("string").alias("k")
    )
    sk = cms_sketch(df, "k", depth=4, width=32)  # heavy collisions
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    est = cms_lookup(sk, exact.select("k"), "k", depth=4, width=32)
    joined = exact.join(est, "k").collect()
    assert len(joined) == 97
    assert all(r.cms_n >= r.n for r in joined)
    # with a wide grid there are no collisions: estimates are exact
    wide = cms_sketch(df, "k", depth=4, width=4096)
    est_w = cms_lookup(wide, exact.select("k"), "k", depth=4, width=4096)
    assert all(r.cms_n == r.n for r in exact.join(est_w, "k").collect())


def test_cms_merge_is_elementwise_sum(spark):
    df = spark.range(1000).select((F.col("id") % 31).cast("string").alias("k"))
    a, b = df.filter(F.col("id") < 400), df.filter(F.col("id") >= 400)
    merged = cms_merge(
        cms_sketch(a, "k", width=64), cms_sketch(b, "k", width=64)
    )
    full = cms_sketch(df, "k", width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_cms_unseen_key_estimates_zero(spark):
    df = spark.range(100).select(F.concat(F.lit("s"), "id").alias("k"))
    sk = cms_sketch(df, "k", width=4096)
    probe = spark.createDataFrame([("never-seen-xyz",)], "k string")
    # wide grid → the unseen key's buckets are very likely untouched
    got = cms_lookup(sk, probe, "k", width=4096).collect()[0]
    assert got.cms_n == 0


def test_cms_xxhash64_mode_same_laws(spark):
    df = spark.range(500).select((F.col("id") % 13).cast("string").alias("k"))
    sk = cms_sketch(df, "k", width=64, mode="xxhash64")
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    est = cms_lookup(sk, exact.select("k"), "k", width=64, mode="xxhash64")
    assert all(r.cms_n >= r.n for r in exact.join(est, "k").collect())


def test_hll_xxhash64_mode_counts(spark, keys):
    sk = hll_sketch(keys, "k", mode="xxhash64")
    est = hll_estimate(sk, correction=False).collect()[0]
    assert abs(est.est_x1000 / 1000 - 5000) < 5000 * 0.15
