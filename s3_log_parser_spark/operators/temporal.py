"""Temporal joins Spark lacks natively: as-of and interval-range.

``asof_join(left, right)`` matches every left row to the most recent
right row with ``right.on ≤ left.on`` within the ``by`` key (backward,
inclusive) — the canonical "which dim state was in force when this
event happened" operator (pandas ``merge_asof``, DuckDB/kdb ``ASOF
JOIN``; the DuckDB oracle uses its native form).

Spark shape (the distributed-classic rewrite, NOT a range cross-join):
tag and UNION the two inputs, sort each ``by`` partition once on
``(ts, side)`` with right rows first at equal ts, and propagate the
last non-null right payload forward with ``last(..., ignorenulls)``
over an unbounded-preceding running frame. One window shuffle on the
``by`` key — the same single-exchange cost as sessionization — and the
running frame streams (no whole-partition buffering). A naive
non-equi join (``l.ts >= r.ts`` + max) is O(|L|·|R|) per key and an
accidental cartesian at 100 TB; this is O((|L|+|R|) log) per key.
Skewed hot keys salt the same way the pipeline's conv_id does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column | str) -> Column:
    """microseconds since epoch; NTZ-tolerant (interval arithmetic on a
    parquet timestamp yields TIMESTAMP_NTZ, which unix_micros rejects —
    cast first; both engines treat the values as wall-clock UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] = ("state_id",),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """backward-inclusive as-of join; returns every ``left`` row plus
    the matched ``right_cols`` (NULL when no earlier right row exists,
    or when the match is older than ``tolerance_seconds``).

    ``right`` must be unique per ``(by, on)`` — pre-aggregate if not
    (equal-timestamp duplicates would make the winning payload
    order-dependent, the same partition-dependence trap as
    ``dropDuplicates``).
    """
    by = tuple(by)
    left_cols = left.columns
    # union schema: (by..., _ts, _side, _rv, <left-only carry cols>) —
    # by/_ts are real on BOTH sides (they drive the partition/sort);
    # the right payload travels as ONE struct column (carrying the
    # right timestamp for the tolerance check); left-only columns ride
    # as NULL on right rows
    carry = [c for c in left_cols if c not in by]
    rv = F.struct(
        F.col(on).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts
        rv.alias("_rv"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in carry
        ],
    )
    l = left.select(  # noqa: E741
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c) for c in carry],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rv", ignorenulls=True).over(w)
    out = (
        r.unionByName(l)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_m",
            F.when(
                _us(F.col("_ts")) - _us(F.col("_m._rts"))
                <= tolerance_seconds * 1_000_000,
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(c) for c in left_cols],
        *[F.col("_m")[c].alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: tuple[str, ...] = ("user_id",),
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int | None = 1_000,
) -> DataFrame:
    """interval-containment join: every ``left`` row paired with every
    interval (same ``by`` key) satisfying ``start ≤ ts < end``
    (inner-join semantics — a row inside two overlapping intervals
    yields two output rows). The second temporal operator Spark lacks
    natively ("which maintenance window / session / deploy covered
    this event").

    Scale shape: a naive theta-join on the BETWEEN predicate plans a
    per-key cross product (O(|L|·|I|) per key — fatal at 100 TB).
    Instead both sides are quantized to fixed ``bucket_seconds`` time
    buckets — each interval EXPLODES to the buckets it overlaps, each
    event maps to exactly one — then an equi-join on (by…, bucket) +
    the exact residual predicate. Cost: |L| + Σ interval-spans join
    rows, all hash-distributed. Pick ``bucket_seconds`` near the
    typical interval length (a too-small bucket inflates the explode;
    a too-big one inflates false candidate pairs — same tuning story
    as every banded join in this repo). ``max_buckets_per_interval``
    guards the degenerate explode (a year-long interval at 1 s buckets)
    with a loud error; pass None to skip the probe.
    """
    us = 1_000_000 * bucket_seconds
    iv = intervals.filter(F.col(end_col) > F.col(start_col))
    startb = F.floor(_us(start_col) / us)
    # end is EXCLUSIVE: the bucket of the last contained microsecond
    endb = F.floor((_us(end_col) - 1) / us)
    if max_buckets_per_interval is not None:
        worst = iv.agg(F.max(endb - startb + 1).alias("m")).first()["m"]
        if worst is not None and worst > max_buckets_per_interval:
            raise ValueError(
                f"range_join: an interval spans {worst} buckets of "
                f"{bucket_seconds}s (> {max_buckets_per_interval}); raise "
                "bucket_seconds (or the guard) — exploding it would "
                "multiply the interval side by that factor"
            )
    ivx = iv.withColumn("_bucket", F.explode(F.sequence(startb, endb)))
    lx = left.withColumn("_bucket", F.floor(_us(on) / us))
    cond = [lx[c] == ivx[c] for c in by] + [lx["_bucket"] == ivx["_bucket"]]
    joined = lx.join(ivx, cond).filter(
        (lx[on] >= ivx[start_col]) & (lx[on] < ivx[end_col])
    )
    keep_iv = [c for c in intervals.columns if c not in (*by,)]
    return joined.select(
        *[lx[c] for c in left.columns],
        *[ivx[c] for c in keep_iv],
    )
