"""as-of join: backward-inclusive temporal match semantics."""

import pytest
from pyspark.sql import functions as F

from s3_log_parser_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:10", 100),
            (1, "2024-01-01 00:01:00", 101),
            (2, "2024-01-01 00:05:00", 200),
        ],
        "user_id long, ts string, state_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = spark.createDataFrame(
        [
            (10, 1, "2024-01-01 00:00:05"),   # before any state → NULL
            (11, 1, "2024-01-01 00:00:10"),   # equal ts → inclusive match 100
            (12, 1, "2024-01-01 00:00:30"),   # between → 100
            (13, 1, "2024-01-01 00:02:00"),   # after second → 101
            (14, 2, "2024-01-01 00:06:00"),   # other key → 200
            (15, 3, "2024-01-01 00:06:00"),   # key with no states → NULL
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_backward_inclusive_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="ts", by=("user_id",),
                    right_cols=("state_id",))
    got = {r["event_id"]: r["state_id"] for r in out.collect()}
    assert got == {10: None, 11: 100, 12: 100, 13: 101, 14: 200, 15: None}
    # every left row survives exactly once (left-join cardinality)
    assert out.count() == left.count()
    # left columns pass through untouched
    assert set(out.columns) == {"event_id", "user_id", "ts", "state_id"}


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="ts", by=("user_id",),
        right_cols=("state_id",), tolerance_seconds=30,
    )
    got = {r["event_id"]: r["state_id"] for r in out.collect()}
    # 13 is 60s after state 101 → dropped by the 30s tolerance;
    # 14 is 60s after state 200 → dropped too; 12 is 20s after 100 → kept
    assert got == {10: None, 11: 100, 12: 100, 13: None, 14: None, 15: None}


def test_asof_single_window_shuffle(spark, frames):
    """the plan must contain exactly ONE exchange (the by-key window
    partitioning) and no join node at all — the property that makes
    the rewrite linear instead of a per-key cross product."""
    left, right = frames
    out = asof_join(left, right, on="ts", by=("user_id",),
                    right_cols=("state_id",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
