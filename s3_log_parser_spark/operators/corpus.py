"""Corpus preparation: the training-data pipeline composed end-to-end.

The flagship composition of the LLM-data operator suite — what a user
actually runs over a raw document corpus before tokenization:

    exact dedup → near-dup removal → quality filter → token budgeting

Each stage is an existing oracled operator; this module wires them into
one DAG with exactly two staged intermediates (r7: the exact-dedup
winner frame and — inside the near-dup operator — the shingle frame
are materialized once via eager local checkpoints, because every
downstream branch consumes them and Catalyst otherwise re-runs the
window/kernel per branch) and reports per-source corpus statistics. Every stage is deterministic
and cross-engine exact, so the complete composition has a DuckDB
oracle (driver query ``corpus_prep_stats``).

Scale shape per stage (all pinned elsewhere, composed here):
- exact dedup: hash-groupBy window winner (never ``dropDuplicates``);
- near-dup: MinHash-LSH banding candidates + exact Jaccard verify
  (``ngram_jaccard_pairs(auto_block=True)``) — linear-ish, no
  all-pairs; drop rule selectable: pair rule (higher id of each
  verified pair — single-pass, the standard first-line policy) or
  ``policy="clusters"`` (connected-component closure via hash-min
  label propagation — order-independent for chained near-dups);
- quality filter: pure-Catalyst integer-scaled features, no shuffle;
- budgeting: one hash aggregate keyed by source.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_token_count, quality_features, token_count
from .dedup import dup_clusters, exact_dedup, ngram_jaccard_pairs


@dataclass
class CorpusPrepResult:
    clean: DataFrame  # surviving documents (all input columns + dup_count)
    stats: DataFrame  # per-source: n_docs, sum_tokens, sum_bpe


def corpus_prep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    near_threshold_x1000: int = 500,
    min_tokens: int = 20,
    min_distinct_ratio_x1000: int = 330,
    n: int = 3,
    policy: str = "pairs",
    mode: str = "djb2",
    model_filter: bool = False,
    model_threshold: int = 0,
    gopher_filter: bool = False,
) -> CorpusPrepResult:
    """Run the full corpus-prep DAG; returns the cleaned corpus and the
    per-source token-budget statistics.

    ``policy`` selects the near-dup drop rule:

    - ``"pairs"`` (default) — drop the higher id of every verified
      pair. Single-pass and deterministic, but chained near-dups
      (A~B, B~C with A~C never a candidate) make survival
      order-dependent in the policy sense;
    - ``"clusters"`` — connected components over the verified pair
      graph (:func:`dup_clusters`, hash-min label propagation), keep
      the lowest id per component. Order-independent closure; costs a
      bounded iterative stage over the (tiny) pair graph.

    ``mode`` is the shingle hash family threaded through the LSH
    banding (VERDICT r4 wrong #2): ``"djb2"`` is the cross-engine
    parity family the DuckDB oracle reproduces; production 100 TB runs
    pass ``"xxhash64"`` (64-bit codegen hashes — the 32-bit DJB2
    space starts colliding on trillion-shingle corpora).

    ``model_filter=True`` additionally keeps only docs the distilled
    hashed-linear quality model (functions/classify.py) scores ≥
    ``model_threshold`` — the model-based filter stage of a real
    pretraining recipe, at zero extra shuffles.

    ``gopher_filter=True`` additionally applies the full published
    Gopher heuristic suite (functions/text.py: rule flags A1.1 +
    repetition flags A1.2) as a row-local predicate — also zero extra
    shuffles (the flags compile into the same scan's projection).
    """
    if policy not in ("pairs", "clusters"):
        raise ValueError(f"corpus_prep: unknown policy {policy!r}")
    # 1) exact dedup — lowest id wins, group size kept as dup_count.
    # Materialized once (eager local checkpoint, r7): the near-dup
    # stage, the anti-join and the quality/stats stage each consume it,
    # and without the checkpoint Catalyst re-runs the md5-window winner
    # per branch. At 100 TB this is the staged-intermediate the module
    # docstring already prescribes for the shingle frame.
    exact = exact_dedup(df, key_cols=(text_col,), order=(id_col,)).localCheckpoint(
        eager=True
    )

    # 2) near-dup removal — LSH-banded candidates, exact Jaccard verify
    pairs = ngram_jaccard_pairs(
        exact,
        id_col=id_col,
        text_col=text_col,
        n=n,
        threshold_x1000=near_threshold_x1000,
        auto_block=True,
        mode=mode,
    )
    if policy == "clusters":
        # keep the lowest id of each duplicate component — every other
        # member (cluster_id != id) drops, including chain members that
        # never paired with the representative directly
        drop = (
            dup_clusters(pairs)
            .filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias(id_col))
        )
    else:
        # drop the higher id of each qualifying pair
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = exact.join(drop, id_col, "left_anti")

    # 3) quality filter — integer-scaled Catalyst features, no Python
    feats = quality_features(text_col)
    clean = kept.filter(
        (feats["n_tokens"] >= min_tokens)
        & (feats["distinct_ratio_x1000"] >= min_distinct_ratio_x1000)
    )
    if model_filter:
        # 3b) distilled model filter (functions/classify.py): the
        # hashed-linear logit rides the same stage as the heuristic
        # features — one literal-array lookup per token, still zero
        # extra shuffles/Python
        from ..functions.classify import quality_model_label

        # always the model's TRAINING-time bucket hash (djb2) — a
        # weight table is meaningless under any other feature hash, so
        # this deliberately does not follow the corpus `mode`
        clean = clean.filter(
            quality_model_label(text_col, model_threshold)
        )
    if gopher_filter:
        # 3c) the published Gopher suite: rule flags (A1.1) +
        # repetition flags (A1.2), both row-local Catalyst predicates
        from ..functions.text import gopher_pass, gopher_repetition_flags

        clean = clean.filter(
            gopher_pass(text_col)
            & gopher_repetition_flags(text_col)["repetition_pass"]
        )

    # 4) per-source token budget
    stats = (
        clean.groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(text_col)).cast("long").alias("sum_tokens"),
            F.sum(bpe_token_count(text_col)).cast("long").alias("sum_bpe"),
        )
    )
    return CorpusPrepResult(clean=clean, stats=stats)


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The data-card aggregate: ONE scan → one per-source summary row
    with the numbers every dataset README starts from —

    - ``n_docs``, ``sum_tokens``, ``sum_chars``, ``min_tokens`` /
      ``max_tokens``
    - ``n_unique`` (exact distinct canonical digests — the exact-dup
      rate is ``1 − n_unique/n_docs``)
    - ``n_en`` (stopword-bank language guess — cheap in-scan language
      mix; full per-language grids live in ``text_lang_guess``)
    - ``sum_quality_x1000`` (composite integer quality score — mean
      quality = ``sum/n_docs`` without a second pass)

    Everything rides in ONE hash aggregate; the exact distinct adds
    the standard count_distinct Expand inside the same scan (the
    one-scan multi-metric idiom the audit operator pins). No joins, no
    windows, no second pass — profiling 100 TB costs exactly one read.
    Deterministic integer arithmetic throughout → full DuckDB oracle
    (driver query ``corpus_profile_by_source``)."""
    from ..functions.text import lang_guess, quality_score_x1000

    t = F.col(text_col)
    ntok = token_count(text_col)
    dig = F.md5(F.lower(F.trim(F.coalesce(t, F.lit("")))))
    return df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("sum_tokens"),
        F.sum(F.length(F.coalesce(t, F.lit("")))).cast("long").alias(
            "sum_chars"
        ),
        F.min(ntok).cast("long").alias("min_tokens"),
        F.max(ntok).cast("long").alias("max_tokens"),
        F.count_distinct(dig).cast("long").alias("n_unique"),
        F.sum((lang_guess(text_col) == "en").cast("long"))
        .cast("long")
        .alias("n_en"),
        F.sum(quality_score_x1000(text_col)).cast("long").alias(
            "sum_quality_x1000"
        ),
    )
