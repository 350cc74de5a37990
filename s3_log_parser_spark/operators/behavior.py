"""Behavioral log analytics: funnels, retention cohorts, windowed
anomaly flags — the product-analytics query tier over an event log
(beyond the reference, whose aggregation stops at group counts,
src/s3extract.c:120-180; any team running it against clickstream-shaped
logs asks for these three next).

Scale shapes:

- **funnel**: events are filtered to the step types FIRST (map-side,
  usually a >90% reduction), then ONE shuffle groups each user's step
  events; the ordered fold over the per-user array is O(events) exact
  subsequence matching — no regex backtracking, no per-step self-join
  (the naive k-step funnel is k-1 joins). Per-user arrays are bounded
  by that user's step events; a per-key cap guards pathological keys.
- **retention**: (user, day) distinct → per-user min (the cohort) via
  one window on the SAME partitioning → one (cohort, offset) count.
- **anomaly**: a per-key ROWS window of the trailing history; the
  z² test is pure integer algebra ((n·x-S)² vs k²·(n·Q-S²)), so
  Spark and the DuckDB oracle agree exactly — no float variance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    max_events_per_key: int = 100_000,
) -> DataFrame:
    """Per key: ``furthest_step`` ∈ [0, len(steps)] — the longest
    prefix of ``steps`` appearing as an ordered subsequence of that
    key's event stream (the standard "signup → view → click → buy"
    conversion semantics; repeats allowed, gaps allowed).

    Exact O(events) via a left fold over the time-sorted step events:
    state = steps matched so far, advance when the next needed step
    arrives. ``max_events_per_key`` bounds the collected array — a key
    past it means a bot/skew key that needs upstream triage, not a
    silently OOMing executor."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    order = [F.col(c) for c in order_cols]
    per_key = (
        df.filter(F.col(type_col).isin(steps))
        .select(key_col, F.struct(*order, F.col(type_col).alias("_s")).alias("_e"))
        .groupBy(key_col)
        .agg(
            F.sort_array(F.collect_list("_e")).alias("_evs"),
            F.count("*").alias("_n"),
        )
    )
    per_key = per_key.withColumn(
        "_evs",
        F.when(F.col("_n") <= max_events_per_key, F.col("_evs")).otherwise(
            F.raise_error(
                F.format_string(
                    "funnel key exceeds max_events_per_key=%d: %s",
                    F.lit(max_events_per_key),
                    F.col(key_col).cast("string"),
                )
            )
        ),
    )

    def _advance(acc: Column, ev: Column) -> Column:
        out = acc
        # build the CASE ladder from the last step down so earlier
        # whens (lower acc) take precedence in the final expression
        cond = None
        for i, s in enumerate(steps):
            c = (acc == i) & (ev["_s"] == s)
            cond = c if cond is None else cond | c
        return F.when(cond, acc + 1).otherwise(out)

    furthest = F.aggregate(
        F.col("_evs"), F.lit(0), _advance
    ).cast("int")
    return per_key.select(
        F.col(key_col), furthest.alias("furthest_step")
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    **kw,
) -> DataFrame:
    """Funnel summary: users whose furthest step is exactly k, plus the
    cumulative reached-step-k count the conversion chart plots."""
    per_user = funnel_steps(df, steps, key_col=key_col, **kw)
    exact = per_user.groupBy("furthest_step").agg(
        F.count("*").cast("long").alias("n_users")
    )
    w = Window.orderBy(F.col("furthest_step").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cumulative over ≤ len(steps)+1 rows — the window is trivial
    return exact.withColumn(
        "n_reached", F.sum("n_users").over(w).cast("long")
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, offset_days, n_users): users first active on
    cohort_day who were also active cohort_day+offset. offset 0 row =
    cohort size. Day bucket is the A2 integer day (epoch div 86400)."""
    day = (F.unix_timestamp(F.col(ts_col)) / SECONDS_PER_DAY).cast("long")
    active = df.select(
        F.col(key_col).alias("_k"), day.alias("_day")
    ).distinct()
    w = Window.partitionBy("_k")
    # min over the window reuses the distinct's hash partitioning on _k
    cohort = active.withColumn("_cohort", F.min("_day").over(w))
    return (
        cohort.groupBy(
            F.col("_cohort").alias("cohort_day"),
            (F.col("_day") - F.col("_cohort")).alias("offset_days"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def windowed_anomalies(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    lookback: int = 8,
    min_history: int = 4,
    k_sigma: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Append ``is_anomaly``: value > k·σ from the mean of that key's
    trailing ``lookback`` values (strictly prior rows — the live-score
    frame). All integer algebra on ×``scale`` fixed-point values:

        z² > k²  ⇔  (n·x − S)² > k²·(n·Q − S²)

    with S, Q the window sum and sum-of-squares — exact in BIGINT, no
    float variance (population σ; zero-variance history → any deviation
    flags). Rows with < ``min_history`` prior values get NULL."""
    v = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    base = df.withColumn("_v", v)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-lookback, -1)
    )
    n = F.count("_v").over(w)
    s = F.sum("_v").over(w)
    q = F.sum(F.col("_v") * F.col("_v")).over(w)
    dev = n * F.col("_v") - s
    var_n2 = n * q - s * s  # n² · population variance
    flag = F.when(
        (n < min_history) | F.col("_v").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(var_n2 == 0, dev != 0).otherwise(
            dev * dev > F.lit(k_sigma * k_sigma) * var_n2
        )
    )
    return base.withColumn("is_anomaly", flag).drop("_v")


def anomaly_daily_counts(
    df: DataFrame,
    ts_col: str = "ts",
    **kw,
) -> DataFrame:
    """(day_bucket, n_checked, n_anomalies) roll-up of the flag."""
    flagged = windowed_anomalies(df, **kw)
    day = (F.unix_timestamp(F.col(ts_col)) / SECONDS_PER_DAY).cast("long")
    return (
        flagged.withColumn("_day", day)
        .groupBy(F.col("_day").alias("day_bucket"))
        .agg(
            F.count("is_anomaly").cast("long").alias("n_checked"),
            # NULL flag (insufficient history) counts 0, like the SQL
            # CASE WHEN flag THEN 1 ELSE 0 form — never a NULL sum
            F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0))
            .cast("long")
            .alias("n_anomalies"),
        )
    )


def interarrival_bins(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Global distribution of per-key inter-event gaps, log2-binned in
    MICROSECONDS: (gap_bin, n, sum_gap_us). The poll-rate/think-time
    profile that sizes sessionization gaps and cache TTLs. One window
    shuffle (lag over the key), then a map-side-combined ≤ ~46-bin
    aggregate; µs integers end-to-end (unix_micros ↔ epoch_us) so the
    DuckDB oracle agrees exactly. First event per key has no gap and
    is excluded."""
    from .aggregate import log2_bin

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (
        df.select(gap.alias("_gap"))
        .filter(F.col("_gap").isNotNull())
        .groupBy(log2_bin(F.col("_gap")).alias("gap_bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_gap").cast("long").alias("sum_gap_us"),
        )
    )
