"""CLI entrypoint — the spark-submit analog of the reference's two
binaries (``s3lp`` parse/encode + ``s3_extract`` group/export,
``/root/reference/src/s3driver.c:14-149`` and ``src/s3extract.c:5-109``).

Ship:  spark-submit --py-files s3_log_parser_spark.zip job.py ...

Subcommands:
  gen      — synthesize a transcripts table (fake_logs analog, S7)
  parse    — transcripts → slim table (+ optional csv/json mirror: the
             reference's -t b/c output-format switch, s3driver.c:74-87)
  extract  — slim table → grouped export (the -g p|i|t|n switch,
             s3extract.c:39-62): counts + (optionally) grouped members
  run      — full parse → enrich → route → aggregate DAG with
             manifest resume (the production pipeline)
  prep     — documents → dedup/decontam/quality corpus + budgets
  ingest   — streaming daily loop: new document files → audit gate →
             index dedup → accepted parquet + index append (+ optional
             HLL/CMS sketch maintenance over the accepted batch keys)
  profile  — one-scan corpus data card (per-source docs / tokens /
             chars / exact-unique / language mix / quality mass)
  diff     — snapshot diff between two corpus versions (dataset
             versioning: added/removed/changed/unchanged + churn)
  compact  — small-file maintenance pass over a parquet sink
"""

from __future__ import annotations

import argparse
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(
        app_name=f"s3lp-spark:{args.cmd}",
        cores=getattr(args, "cores", None) or None,
    )


def cmd_gen(args) -> None:
    from .sources.gen import gen_transcripts

    spark = _spark(args)
    df = gen_transcripts(spark, rows=args.rows)
    df.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.rows} turns to {args.output}")


def cmd_parse(args) -> None:
    from .plans.pipeline import build_slim

    spark = _spark(args)
    t = spark.read.parquet(args.input)
    slim = build_slim(t)
    if args.format == "parquet":
        slim.write.mode("overwrite").parquet(args.output)
    elif args.format == "csv":  # S3 sink (output_CSV, s3parser.c:701-717)
        slim.write.mode("overwrite").option("header", True).csv(args.output)
    elif args.format == "json":  # S5 flat JSON (s3extract.c:223-249)
        slim.write.mode("overwrite").json(args.output)
    print(f"parsed {args.input} -> {args.output} ({args.format})")


def cmd_extract(args) -> None:
    from .operators.aggregate import (
        GROUP_NAMES,
        group_count,
        grouped_export,
        grouped_export_json,
    )

    spark = _spark(args)
    slim = spark.read.parquet(args.input)
    key = {
        "p": "tool_hash",  # GROUP_PODCAST (s3extract.c:152-154)
        "i": "ip_hash",  # GROUP_IP (:155-157)
        "t": "day_bucket",  # GROUP_TIME (:158-160)
        "n": None,  # GROUP_NONE (flat)
    }[args.group_by]
    if key is not None and args.members and args.format == "json":
        # the reference's exact grouped-JSON document (valid-JSON
        # variant of print_grouped_json, s3extract.c:251-306), one file
        doc = grouped_export_json(
            slim, key, GROUP_NAMES[args.group_by],
            max_rows_per_group=args.member_cap,
            member_order=("conv_id", "turn_idx")
            if {"conv_id", "turn_idx"} <= set(slim.columns)
            else (),
        )
        with open(args.output, "w") as f:
            f.write(doc)
        print(f"extracted {args.input} grouped by {args.group_by} -> {args.output}")
        return
    if key is None:
        out = slim
    elif args.members:
        out = grouped_export(slim, key, max_rows_per_group=args.member_cap)
    else:
        out = group_count(slim, key)
    if args.format == "json":
        out.write.mode("overwrite").json(args.output)
    else:
        out.write.mode("overwrite").parquet(args.output)
    print(f"extracted {args.input} grouped by {args.group_by} -> {args.output}")


def cmd_run(args) -> None:
    from .plans.pipeline import run_pipeline

    spark = _spark(args)
    t = spark.read.parquet(args.input)
    res = run_pipeline(
        spark, t, args.output, run_id=args.run_id, verbose=args.verbose
    )
    for name, df in sorted(res.sink_counts.items()):
        n = df.count()
        print(f"sink {name}: {n} aggregate rows")
    if args.verbose and res.lineage is not None:
        # reference -v parity: per-batch row counters
        # (src/s3parser.c:56-67) → per-partition rows/bytes here
        print("lineage (partition, rows, approx_bytes):")
        for r in res.lineage.orderBy("_part_id").collect():
            print(f"  {r['_part_id']:>6} {r['rows']:>10} {r['approx_bytes']:>12}")
    print(f"timings: { {k: round(v, 1) for k, v in res.timings.items()} }")


def cmd_prep(args) -> None:
    from .operators.corpus import corpus_prep

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    # each optional stage composes lazily, so counting its output and
    # then feeding it onward would re-execute the full stage DAG (the
    # MinHash band join / broadcast decontam) once per downstream
    # action — persist each stage's output before counting it so the
    # progress counts and corpus_prep all read the materialized result
    # (ADVICE r4: up to ~5 full recomputes of the costliest operators)
    stages = []
    if args.line_dedup:
        # boilerplate removal before document-level dedup: a shared
        # nav-bar line would otherwise make distinct docs look like
        # near-dups of each other
        from .operators.lines import line_dedup

        carry = tuple(
            c for c in ("lang", "source") if c in docs.columns
        )
        n0 = docs.count()
        docs = line_dedup(
            docs,
            delim=args.line_delim,
            max_docs=args.line_max_docs,
            key_mode=args.hash_mode,
            carry_cols=carry,
        ).drop("n_lines_kept", "n_lines_dropped").persist()
        stages.append(docs)
        print(f"line dedup: {n0} docs rewritten (boilerplate lines removed)")
    if args.index:
        # ingestion-mode against a persisted DedupIndex (with Bloom
        # sidecars if the index was built with them): per-batch cost
        # never re-derives history state
        from .operators.dedup import incremental_dedup, read_dedup_index

        idx = read_dedup_index(spark, args.index)
        n0 = docs.count()
        docs = incremental_dedup(
            docs, index=idx, threshold_x1000=args.near_threshold
        ).persist()
        stages.append(docs)
        print(f"index dedup: {n0} -> {docs.count()} docs")
    elif args.history:
        # ingestion-mode: dedup the batch against everything already
        # accepted before in-batch prep
        from .operators.dedup import incremental_dedup

        hist = spark.read.parquet(args.history)
        n0 = docs.count()
        docs = incremental_dedup(
            docs, hist, threshold_x1000=args.near_threshold
        ).persist()
        stages.append(docs)
        print(f"history dedup: {n0} -> {docs.count()} docs")
    if args.benchmark:
        from .operators.decontam import decontaminate

        bench = spark.read.parquet(args.benchmark)
        n0 = docs.count()
        docs = decontaminate(
            docs, bench, n=args.decontam_n, mode=args.hash_mode
        ).persist()
        stages.append(docs)
        print(f"decontamination: {n0} -> {docs.count()} docs")
    res = corpus_prep(
        docs,
        near_threshold_x1000=args.near_threshold,
        min_tokens=args.min_tokens,
        min_distinct_ratio_x1000=args.min_distinct_ratio,
        policy=args.policy,
        model_filter=args.model_filter,
        gopher_filter=args.gopher,
        mode=args.hash_mode,
    )
    clean = res.clean
    if args.mixture:
        # "40% web, 30% code" knob: per-mille shares of --total-budget
        from .operators.sampling import sample_to_mixture

        weights = {}
        for part in args.mixture.split(","):
            src, _, w = part.partition("=")
            weights[src.strip()] = int(w)
        clean = sample_to_mixture(
            clean, total_budget_tokens=args.total_budget, weights=weights
        )
    if args.shuffle_seed:
        # seeded deterministic example order; shard-major read order is
        # the permutation (no global merge)
        from .operators.sampling import deterministic_shuffle

        clean = deterministic_shuffle(
            clean,
            seed=args.shuffle_seed,
            shards=args.shards,
            mode="xxhash64" if args.hash_mode == "xxhash64" else "djb2",
        )
    clean.write.mode("overwrite").parquet(f"{args.output}/clean")
    if args.pack_ctx:
        # materialized fixed-length training windows over the written
        # clean corpus (read back so packing never re-runs the prep DAG)
        from .functions.bpe import bpe_token_ids
        from .operators.sampling import pack_examples

        stored = spark.read.parquet(f"{args.output}/clean")
        ids = bpe_token_ids("text") if args.pack_ids == "bpe" else None
        pack_examples(stored, ctx_tokens=args.pack_ctx, ids_col=ids).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/packed")
    res.stats.coalesce(1).write.mode("overwrite").parquet(f"{args.output}/stats")
    # print budgets from the just-written stats table (not res.stats,
    # which would re-run the whole prep DAG a third time)
    for r in spark.read.parquet(f"{args.output}/stats").orderBy("source").collect():
        print(
            f"source {r['source']}: {r['n_docs']} docs, "
            f"{r['sum_tokens']} tokens, {r['sum_bpe']} bpe units"
        )
    for df in stages:
        df.unpersist()


def cmd_ingest(args) -> None:
    """the daily ingestion loop as ONE command (VERDICT r5 next #6 —
    gen/parse/prep/compact existed but a user couldn't run the
    streaming index-append loop without writing code): documents
    arriving as parquet files under --input stream through the audit
    gate → intra-batch exact dedup → incremental dedup against the
    persisted DedupIndex → accepted parquet partitioned by batch +
    crash-safe index append. Re-running as new files land continues
    from the stream checkpoint — already-ingested files are never
    re-processed, which is the whole loop."""
    import os

    spark = _spark(args)
    # file streams need an explicit schema: take it from the files
    # already present (the CLI is invoked once data exists)
    static = spark.read.parquet(args.input)

    if not os.path.exists(os.path.join(args.index, "meta")):
        # first run: bootstrap an EMPTY persisted index so the meta
        # table pins the hash family for every later batch
        from .operators.dedup import build_dedup_index, write_dedup_index

        empty = spark.createDataFrame([], static.schema)
        write_dedup_index(
            build_dedup_index(
                empty,
                mode=args.hash_mode,
                bloom_m_bits=args.bloom_bits,
            ),
            args.index,
        )
        print(f"bootstrapped empty dedup index at {args.index} "
              f"(mode={args.hash_mode})")

    checks = None
    if args.audit:
        from .operators.audit import not_null

        checks = [not_null("doc_id", "text")]

    from .streaming.ingest import start_ingest

    q = start_ingest(
        spark.readStream.schema(static.schema).parquet(args.input),
        index_path=args.index,
        out_dir=args.output,
        checkpoint_dir=f"{args.output}/_checkpoint/ingest",
        near=not args.exact_only,
        threshold_x1000=args.near_threshold,
        trigger_once=True,
        checks=checks,
        on_audit_fail=args.on_audit_fail,
    )
    q.awaitTermination()

    # a run where every incoming doc was rejected (audit-fail with
    # --on-audit-fail=skip, or an all-duplicate batch against a fresh
    # output dir) leaves no accepted/ parquet at all — report that
    # instead of crashing on an unrelated path-not-found read
    # (ADVICE r6)
    def _has_accepted() -> bool:
        d = f"{args.output}/accepted"
        return os.path.isdir(d) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(d)
            for f in fs
        )

    if not _has_accepted():
        print("total accepted: 0 docs across 0 batches")
        return

    if args.sketches:
        # few-KB persisted sketch tables over the ACCEPTED corpus:
        # distinct-doc HLL + per-source CMS heavy hitters. Separate
        # checkpoints, same drain-available trigger; both replay-safe
        # (max-merge idempotent / fingerprint-gated sum-merge).
        from pyspark.sql import functions as F

        from .streaming.sketches import start_cms_stream, start_hll_stream

        acc_dir = f"{args.output}/accepted"
        acc_schema = spark.read.parquet(acc_dir).schema
        accepted = spark.readStream.schema(acc_schema).parquet(acc_dir)
        keys = accepted.select(
            F.col("doc_id").cast("string").alias("k"),
            F.col("source").alias("s") if "source" in acc_schema.names
            else F.lit("all").alias("s"),
        )
        sk_root = f"{args.output}/sketches"
        start_hll_stream(
            keys, f"{sk_root}/hll_docs", f"{args.output}/_checkpoint/hll",
            key_col="k", mode=args.hash_mode,
        ).awaitTermination()
        start_cms_stream(
            keys, f"{sk_root}/cms_sources", f"{args.output}/_checkpoint/cms",
            key_col="s", mode=args.hash_mode,
        ).awaitTermination()

        from .operators.sketch import hll_estimate

        from .streaming.sketches import read_hll_table

        est = hll_estimate(
            read_hll_table(spark, f"{sk_root}/hll_docs")
        ).collect()[0][0]
        print(f"sketches: ~{est} distinct accepted docs "
              f"(hll_docs, cms_sources under {sk_root})")

    acc = spark.read.parquet(f"{args.output}/accepted")
    per_batch = acc.groupBy("_batch").count().orderBy("_batch").collect()
    for r in per_batch:
        print(f"batch {r['_batch']}: {r['count']} docs accepted")
    print(f"total accepted: {sum(r['count'] for r in per_batch)} docs "
          f"across {len(per_batch)} batches")


def cmd_profile(args) -> None:
    from .operators.corpus import corpus_profile

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    prof = corpus_profile(
        docs, text_col=args.text_col, source_col=args.source_col
    )
    if args.output:
        prof.write.mode("overwrite").parquet(args.output)
        prof = spark.read.parquet(args.output)
    rows = sorted(prof.collect(), key=lambda r: r["source"])
    hdr = ("source", "n_docs", "sum_tokens", "sum_chars", "min_tokens",
           "max_tokens", "n_unique", "n_en", "sum_quality_x1000")
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r[c]) for c in hdr))


def cmd_diff(args) -> None:
    from .operators.versioning import corpus_diff, corpus_diff_stats

    spark = _spark(args)
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    diff = corpus_diff(
        old,
        new,
        id_col=args.id_col,
        text_col=args.text_col,
        normalize=not args.raw,
    )
    if args.output:
        # partitioned by status so downstream consumers (re-crawl the
        # removed, re-embed the changed) prune to their slice at scan
        diff.write.mode("overwrite").partitionBy("status").parquet(
            args.output
        )
        diff = spark.read.parquet(args.output)
    for r in sorted(
        corpus_diff_stats(diff).collect(), key=lambda r: r["status"]
    ):
        print(f"{r['status']:<10} {r['n']}")


def cmd_compact(args) -> None:
    from .sources.maintenance import compact_table

    spark = _spark(args)
    res = compact_table(
        spark, args.path, target_bytes=args.target_bytes,
        min_files=args.min_files,
    )
    print(
        f"compacted {res.partitions_compacted}/{res.partitions_seen} "
        f"partitions: {res.files_before} -> {res.files_after} files "
        f"({res.bytes} bytes rewritten)"
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="s3lp-spark")
    p.add_argument("--cores", help="local[N] cores (default: all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="synthesize transcripts")
    g.add_argument("-n", "--rows", type=int, default=1_000_000)
    g.add_argument("-o", "--output", required=True)

    pa = sub.add_parser("parse", help="transcripts -> slim")
    pa.add_argument("-f", "--input", required=True)
    pa.add_argument("-o", "--output", required=True)
    pa.add_argument(
        "-t", "--format", choices=["parquet", "csv", "json"], default="parquet",
        help="output format (reference -t b/c switch)",
    )

    ex = sub.add_parser("extract", help="slim -> grouped export")
    ex.add_argument("-f", "--input", required=True)
    ex.add_argument("-o", "--output", required=True)
    ex.add_argument(
        "-g", "--group-by", choices=["p", "i", "t", "n"], default="n",
        help="podcast/tool | ip | time | none (reference -g switch)",
    )
    ex.add_argument("--members", action="store_true", help="materialize group members")
    ex.add_argument("--member-cap", type=int, default=1000)
    ex.add_argument("-t", "--format", choices=["parquet", "json"], default="json")

    r = sub.add_parser("run", help="full pipeline with resume")
    r.add_argument("-f", "--input", required=True)
    r.add_argument("-o", "--output", required=True)
    r.add_argument("--run-id", default="run-0")
    r.add_argument(
        "-v", "--verbose", action="store_true",
        help="write + print the _lineage per-partition metrics table "
        "(reference -v, s3driver.c:56-67)",
    )

    pr = sub.add_parser(
        "prep", help="documents -> dedup + quality-filtered corpus + budgets"
    )
    pr.add_argument("-f", "--input", required=True)
    pr.add_argument("-o", "--output", required=True)
    pr.add_argument("--near-threshold", type=int, default=500)
    pr.add_argument("--min-tokens", type=int, default=20)
    pr.add_argument("--model-filter", action="store_true",
                    help="also apply the distilled hashed-linear "
                    "quality model (functions/classify.py)")
    pr.add_argument("--gopher", action="store_true",
                    help="also apply the full published Gopher suite "
                    "(rule flags A1.1 + repetition flags A1.2)")
    pr.add_argument("--min-distinct-ratio", type=int, default=330)
    pr.add_argument(
        "--policy", choices=["pairs", "clusters"], default="pairs",
        help="near-dup drop rule: higher id of each verified pair, or "
        "connected-component closure keeping the lowest id per cluster",
    )
    pr.add_argument(
        "--hash-mode", choices=["djb2", "xxhash64"], default="djb2",
        help="shingle hash family (djb2 = cross-engine parity; "
        "xxhash64 = 64-bit codegen family for production scale)",
    )
    pr.add_argument("--history", help="parquet of already-accepted docs "
                    "(incremental dedup against it first)")
    pr.add_argument("--index", help="persisted DedupIndex dir (see "
                    "operators.dedup.write_dedup_index) — preferred "
                    "over --history: per-batch cost, Bloom fast path "
                    "when the index carries sidecars")
    pr.add_argument("--benchmark", help="parquet of eval docs "
                    "(n-gram decontamination)")
    pr.add_argument("--decontam-n", type=int, default=13)
    pr.add_argument("--line-dedup", action="store_true",
                    help="remove cross-document boilerplate lines first")
    pr.add_argument("--line-delim", default="\n")
    pr.add_argument("--line-max-docs", type=int, default=1)
    pr.add_argument("--mixture", help="per-mille source shares, e.g. "
                    "'src0=400,src1=300' (sources not named are dropped)")
    pr.add_argument("--total-budget", type=int, default=1_000_000,
                    help="token budget the --mixture shares divide")
    pr.add_argument("--shuffle-seed", help="seeded deterministic "
                    "example-order shuffle of the clean corpus")
    pr.add_argument("--shards", type=int, default=None,
                    help="range-partitioned output shards for the shuffle")
    pr.add_argument("--pack-ctx", type=int, default=None,
                    help="materialize packed input_ids windows of this size")
    pr.add_argument("--pack-ids", choices=["bpe", "djb2"], default="bpe",
                    help="token ids for packing (bpe = real tokenizer)")

    ing = sub.add_parser(
        "ingest",
        help="streaming daily loop: new document files -> audit gate "
        "-> dedup against a persisted index -> accepted parquet + "
        "index append (+ optional sketch maintenance)",
    )
    ing.add_argument("-f", "--input", required=True,
                     help="directory where document parquet files land")
    ing.add_argument("-o", "--output", required=True,
                     help="out dir: accepted/, audit/, _checkpoint/, "
                     "sketches/")
    ing.add_argument("--index", required=True,
                     help="persisted DedupIndex dir (bootstrapped "
                     "empty on first run)")
    ing.add_argument("--near-threshold", type=int, default=500)
    ing.add_argument("--exact-only", action="store_true",
                     help="skip near-dup (digest-only) index dedup")
    ing.add_argument("--audit", action="store_true",
                     help="gate each batch on not_null(doc_id, text); "
                     "report under output/audit")
    ing.add_argument("--on-audit-fail", choices=["raise", "skip"],
                     default="raise")
    ing.add_argument("--sketches", action="store_true",
                     help="also maintain the HLL distinct-docs and "
                     "CMS source-frequency sketch tables")
    ing.add_argument("--hash-mode", choices=["djb2", "xxhash64"],
                     default="xxhash64",
                     help="index hash family (pinned in meta on first "
                     "run; later runs must match)")
    ing.add_argument("--bloom-bits", type=int, default=0,
                     help="Bloom sidecar size in bits (0 = none); "
                     "~10x expected distinct docs for ~1%% FP")

    pf = sub.add_parser(
        "profile",
        help="one-scan corpus data card: per-source docs / tokens / "
        "chars / exact-unique / language mix / quality mass",
    )
    pf.add_argument("-f", "--input", required=True)
    pf.add_argument("-o", "--output", help="also write the rows here")
    pf.add_argument("--text-col", default="text")
    pf.add_argument("--source-col", default="source")

    dv = sub.add_parser(
        "diff",
        help="snapshot diff of two document corpus versions: per-id "
        "added/removed/changed/unchanged (one exchange, no join) + "
        "churn summary; -o writes the rows partitioned by status",
    )
    dv.add_argument("-a", "--old", required=True, help="old snapshot parquet")
    dv.add_argument("-b", "--new", required=True, help="new snapshot parquet")
    dv.add_argument("-o", "--output", help="write diff rows here")
    dv.add_argument("--id-col", default="doc_id")
    dv.add_argument("--text-col", default="text")
    dv.add_argument(
        "--raw",
        action="store_true",
        help="digest text verbatim (default: lower+trim canonical form)",
    )

    co = sub.add_parser(
        "compact",
        help="rewrite small-file partitions of a parquet sink in place "
        "(the maintenance pass after streaming ingest / salted writes)",
    )
    co.add_argument("-p", "--path", required=True)
    co.add_argument("--target-bytes", type=int, default=128 << 20)
    co.add_argument("--min-files", type=int, default=2)

    args = p.parse_args(argv)
    {"gen": cmd_gen, "parse": cmd_parse, "extract": cmd_extract,
     "run": cmd_run, "prep": cmd_prep, "ingest": cmd_ingest,
     "profile": cmd_profile, "diff": cmd_diff,
     "compact": cmd_compact}[args.cmd](args)


if __name__ == "__main__":
    main(sys.argv[1:])
