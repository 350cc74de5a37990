"""Time the 9 production-hash-family extras the frozen bench.py times
outside ``queries()`` (xxhash64 dedup/decontam/prep/quality/sketches,
64-bit simhash, 2048-ctx BPE packing), with warm repeats — the
committed per-query artifact needs these rows too.

Usage: python tools/bench_prod_extras.py [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as SF

    from s3_log_parser_spark.functions.bpe import bpe_token_ids
    from s3_log_parser_spark.functions.classify import quality_model_score
    from s3_log_parser_spark.operators.corpus import corpus_prep
    from s3_log_parser_spark.operators.decontam import contamination_hits
    from s3_log_parser_spark.operators.dedup import (
        minhash_candidates,
        simhash_pairs,
    )
    from s3_log_parser_spark.operators.lines import line_dedup
    from s3_log_parser_spark.operators.sampling import pack_examples
    from s3_log_parser_spark.operators.sketch import (
        cms_sketch,
        hll_estimate,
        hll_sketch,
    )
    from s3_log_parser_spark.session import get_spark

    spark = get_spark(app_name="bench-prod-extras", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    mdocs = docs.withColumn(
        "text", SF.replace("text", SF.lit(" table "), SF.lit("\n"))
    )
    sk_key = SF.concat(
        SF.col("user_id").cast("string"),
        SF.lit(":"),
        SF.col("event_type"),
        SF.lit(":"),
        (SF.unix_timestamp("ts") / 86400).cast("long").cast("string"),
    )

    def runs():
        yield "dedup_minhash_lsh_pairs_xxhash64", lambda: minhash_candidates(
            docs, mode="xxhash64"
        ).count()
        yield "dedup_simhash_pairs_64bit", lambda: simhash_pairs(
            docs, bits=64, band_bits=16
        ).count()
        yield "corpus_prep_stats_xxhash64", lambda: corpus_prep(
            docs, mode="xxhash64"
        ).stats.count()
        yield "line_dedup_xxhash64", lambda: line_dedup(
            mdocs, key_mode="xxhash64"
        ).count()
        yield "pack_examples_bpe_2048", lambda: pack_examples(
            docs, ctx_tokens=2048, ids_col=bpe_token_ids("text")
        ).count()
        yield "decontamination_hits_xxhash64", lambda: contamination_hits(
            docs.filter(SF.col("doc_id") >= 50),
            docs.filter(SF.col("doc_id") < 50),
            n=8,
            mode="xxhash64",
        ).count()
        yield "quality_model_scores_xxhash64", lambda: docs.select(
            "doc_id", quality_model_score("text", mode="xxhash64").alias("q")
        ).agg(SF.sum("q")).collect()
        yield "hll_rollup_xxhash64", lambda: hll_estimate(
            hll_sketch(events.select(sk_key.alias("k")), "k", mode="xxhash64"),
            correction=False,
        ).count()
        yield "cms_sketch_xxhash64", lambda: cms_sketch(
            events, SF.col("user_id").cast("string"), mode="xxhash64"
        ).count()

    out: dict[str, list[float]] = {}
    for rep in range(args.repeats):
        for name, fn in runs():
            t0 = time.perf_counter()
            fn()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    print(
        json.dumps(
            {"queries": out, "min": {k: min(v) for k, v in out.items()}}
        )
    )


if __name__ == "__main__":
    main()
