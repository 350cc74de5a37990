"""ST1/ST2 — ports the reference's 8 GTest semantics
(tests/test_parser.cpp:10-134): start→0x03, mid→0x04, end→0x08
(END overwrites START), first-vs-repeat (ip,key) dedup."""

from pyspark.sql import functions as F

from s3_log_parser_spark.operators.flags import first_occurrence, with_flags

MB = 1 << 20


def _flags_df(spark, rows):
    """rows: (conv_id, turn_idx, http, start, end, size, ip, key)"""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, http_code int, byte_start long, "
        "byte_end long, object_size long, ip_hash long, key_hash long",
    )


def _flags(spark, rows):
    df = _flags_df(spark, rows)
    out = with_flags(df).orderBy("conv_id", "turn_idx")
    return [r["flags"] for r in out.collect()]


def test_start_unique_is_3(spark):
    # test_parser.cpp start case: byte_start=0, first (ip,key) → 0x03
    assert _flags(spark, [("c", 0, 206, 0, 100, 20 * MB, 1, 2)]) == [3]


def test_start_repeat_is_2(spark):
    # second START for the same (ip,key) → STRT only (0x02)
    got = _flags(
        spark,
        [
            ("c", 0, 206, 0, 100, 20 * MB, 1, 2),
            ("c", 1, 206, 0, 100, 20 * MB, 1, 2),
        ],
    )
    assert got == [3, 2]


def test_mid_is_4(spark):
    assert _flags(spark, [("c", 0, 206, 5 * MB, 6 * MB, 20 * MB, 1, 2)]) == [4]


def test_end_is_8(spark):
    assert _flags(spark, [("c", 0, 206, 18 * MB, 20 * MB - 10, 20 * MB, 1, 2)]) == [8]


def test_end_overwrites_start(spark):
    # start AND end in one request → END wins (src/s3parser.c:613-616,
    # pinned by test_parser.cpp:62-87)
    assert _flags(spark, [("c", 0, 206, 0, 20 * MB - 10, 20 * MB, 1, 2)]) == [8]


def test_small_object_end_check_is_1000b(spark):
    # object < 1 MiB → end threshold tightens to 1000 B (s3lp.h:21)
    size = 500_000
    got = _flags(
        spark,
        [
            ("c", 0, 206, 100, size - 500, size, 1, 2),  # within 1000 → END
            ("c", 1, 206, 100, size - 5000, size, 1, 3),  # outside → MID
        ],
    )
    assert got == [8, 4]


def test_non_206_gets_0(spark):
    assert _flags(spark, [("c", 0, 200, 0, 100, 20 * MB, 1, 2)]) == [0]


def test_unique_per_ip_key_pair(spark):
    # distinct key for same ip → unique again (test_parser.cpp:91-134)
    got = _flags(
        spark,
        [
            ("c", 0, 206, 0, 100, 20 * MB, 1, 2),
            ("c", 1, 206, 0, 100, 20 * MB, 1, 3),
            ("c", 2, 206, 0, 100, 20 * MB, 4, 2),
        ],
    )
    assert got == [3, 3, 3]


def test_first_occurrence_order_stability(spark):
    # the window surrogate for "file order": earliest (conv_id, turn_idx)
    # wins regardless of input partitioning
    rows = [("b", 0, 206, 0, 1, 20 * MB, 9, 9), ("a", 5, 206, 0, 1, 20 * MB, 9, 9)]
    df = _flags_df(spark, rows).repartition(8)
    out = first_occurrence(
        df, only_when=F.lit(True), order=("conv_id", "turn_idx")
    )
    got = {(r["conv_id"]): r["is_first"] for r in out.collect()}
    assert got == {"a": True, "b": False}


def test_mid_when_start_null(spark):
    # 206 with unparseable range → neither start nor end → MID
    assert _flags(spark, [("c", 0, 206, None, None, 20 * MB, 1, 2)]) == [4]
