"""Isolated route-stage bench (guide §1.4): re-runs route_and_write
against an already-written slim checkpoint, fresh sink dir each rep.

Usage: python tools/bench_route.py [--reps N] [--slim DIR]
Env: ROUTER_WRITE_STRATEGY / ROUTER_SCAN_SPLIT_MB / ROUTER_CONCURRENCY
pass through to the router.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_log_parser_spark.operators.router import route_and_write  # noqa: E402
from s3_log_parser_spark.session import get_spark  # noqa: E402
from s3_log_parser_spark.sources.catalog import Catalog  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--slim", default="/tmp/spark_graft_bench/pipe_c32/slim"
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench-route", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = "/tmp/bench_route_out"

    for i in range(args.reps):
        shutil.rmtree(out, ignore_errors=True)
        cat = Catalog(spark, out)
        slim = spark.read.parquet(args.slim)
        sink_t: dict[str, float] = {}
        t0 = time.perf_counter()
        route_and_write(slim, cat, timings_out=sink_t)
        dt = time.perf_counter() - t0
        print(
            f"rep {i}: route {dt:.2f}s  "
            + "  ".join(f"{k}={v:.1f}" for k, v in sink_t.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
