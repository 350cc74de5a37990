"""Dataset assembly operators: splits, budget sampling, packing.

The last mile of a training-data pipeline, after dedup/filtering
(operators/dedup.py, corpus.py): assign every document to a
train/val/test split, cut each source down to its token budget, and
estimate context-window packing. All three are deterministic,
engine-reproducible (DuckDB oracles in ``__spark_entry__.py``), and
shaped for 100 TB:

- :func:`hash_split` is ROW-LOCAL — a doc's split depends only on the
  salt and its own id (never on other rows), so assignments survive
  corpus growth, re-partitioning, and incremental ingestion. No
  shuffle at all.
- :func:`sample_to_token_budget` / :func:`pack_sequences` need a
  deterministic order, so they run ONE window per group (pass ``by=``
  — e.g. source — to keep the sort per-group instead of global; the
  un-grouped form is the small-scale/verification mode, same split as
  percentiles_disc exact vs approx).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import djb2_expr
from ..functions.text import token_count

# per-mille split weights (sum to 1000)
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 900),
    ("val", 50),
    ("test", 50),
)


# affine universal-hash post-mix over the MinHash family's prime: raw
# DJB2 mod 1000 is UNUSABLE for splits — the trailing id digits carry
# coefficients 33^0/33^1, so sequential ids cluster into a narrow
# bucket band (measured: ids 0..39 ALL landed in 'train' for two
# different salts). (A·h + B) mod P decorrelates neighboring hashes
# while staying exactly reproducible in DuckDB; A·h < 2^54, ANSI-safe.
SPLIT_MIX_A = 2654435
SPLIT_MIX_B = 7
SPLIT_MIX_P = 4294967311  # smallest prime > 2^32 (= dedup.MINHASH_P)


def split_bucket(
    id_col: Column | str, salt: str = "v1", mode: str = "djb2"
) -> Column:
    """deterministic per-mille bucket of a document id:
    ``((A·DJB2(salt || ':' || id) + B) mod P) mod 1000`` (see the mix
    constants above). Reproducible in the DuckDB oracle
    digit-for-digit; changing the salt re-rolls every assignment (the
    standard way to draw a fresh validation set without touching the
    data). ``mode="xxhash64"`` is the production family (same policy
    as the dedup suite: 64-bit codegen hashing, no oracle)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), c), F.lit(1000))
    h = djb2_expr(F.concat(F.lit(salt), F.lit(":"), c.cast("string")))
    return F.pmod(
        F.pmod(h * F.lit(SPLIT_MIX_A) + F.lit(SPLIT_MIX_B), F.lit(SPLIT_MIX_P)),
        F.lit(1000),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    salt: str = "v1",
    mode: str = "djb2",
) -> DataFrame:
    """add a ``split`` column assigning each row to a named split by
    cumulative per-mille weight over :func:`split_bucket`. Row-local
    (no shuffle, no state): the assignment of one doc can never change
    because other docs arrived."""
    total = sum(w for _, w in weights)
    if total != 1000:
        raise ValueError(f"hash_split: weights must sum to 1000, got {total}")
    b = split_bucket(id_col, salt, mode)
    expr = None
    acc = 0
    for name, w in weights:
        acc += w
        cond = b < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn("split", expr)


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
    count_col: Column | None = None,
) -> DataFrame:
    """deterministic prefix-by-id sampling: walk documents in ``id``
    order (per ``by`` group when given) and keep each doc whose
    RUNNING token total before it is still under the budget — so the
    kept set is a stable prefix, never a random draw that reshuffles
    on re-run. The first doc of a group is always kept (a budget
    smaller than one doc still yields that doc — truncation is the
    tokenizer's job, not the sampler's). One window per group; pass
    ``by=`` at scale so the sort is per-group. ``count_col`` swaps in
    any per-doc size expression (e.g. ``bpe_token_count_real`` for a
    real-tokenizer budget); default is the whitespace token count."""
    part = [by] if by else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = token_count(text_col) if count_col is None else count_col
    cum = F.sum(cnt).over(w)
    return (
        df.withColumn("_cum", cum)
        .withColumn("_cnt", cnt)
        .filter(F.col("_cum") - F.col("_cnt") < budget_tokens)
        .drop("_cum", "_cnt")
    )


def pack_sequences(
    df: DataFrame,
    ctx_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = "source",
    count_col: Column | None = None,
) -> DataFrame:
    """assign each doc the context-window bin where it STARTS under
    deterministic id-order concatenation within its group:
    ``bin = floor((running_total_before_doc) / ctx)``. Adds ``pack_bin``
    and ``n_tokens``. This is the streaming-concatenation packing model
    (docs straddle bin boundaries; the bin of record is where the doc
    begins) — the estimate every pretraining pipeline uses to size a
    run before materializing packed examples. ``count_col`` swaps in a
    real-tokenizer size (see sample_to_token_budget)."""
    part = [by] if by else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = token_count(text_col) if count_col is None else count_col
    cum = F.sum(cnt).over(w)
    return df.withColumn("n_tokens", cnt.cast("long")).withColumn(
        "pack_bin",
        F.floor((cum - cnt) / ctx_tokens).cast("long"),
    )


def pack_stats(
    df: DataFrame,
    ctx_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """per-group packing summary: docs, bins, tokens, and fill rate
    ×1000 (``sum_tokens / (n_bins · ctx)`` floored) — how much of the
    allocated context space the corpus actually fills."""
    packed = pack_sequences(df, ctx_tokens, id_col, text_col, by)
    return packed.groupBy(by).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct(F.col("pack_bin")).cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.floor(
            F.sum("n_tokens") * 1000 / (F.count_distinct(F.col("pack_bin")) * ctx_tokens)
        ).cast("long").alias("fill_x1000"),
    )
