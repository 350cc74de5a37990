"""Temporal (as-of) join — the event↔state join Spark lacks natively.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
                F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_m._rts"))
                <= tolerance_seconds * 1_000_000,
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(c) for c in left_cols],
        *[F.col("_m")[c].alias(c) for c in right_cols],
    )
