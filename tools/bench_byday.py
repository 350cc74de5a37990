"""Isolated by_day partitioned-write strategy comparison (guide §6).

Writes the ok-rows of an existing slim checkpoint partitioned by
day_bucket under each candidate layout strategy; reports wall seconds
and output file count.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3_log_parser_spark.session import get_spark  # noqa: E402

SLIM = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pipe_c32/slim"

spark = get_spark(app_name="bench-byday", cores=32)
spark.sparkContext.setLogLevel("ERROR")
slim = spark.read.parquet(SLIM)
ok = slim.filter(F.col("parse_status") == "ok")
nshuf = int(spark.conf.get("spark.sql.shuffle.partitions"))

salt4 = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(4))


def variants():
    yield "salt4 (current)", ok.repartition(F.col("day_bucket"), salt4)
    yield "day-only repart", ok.repartition(F.col("day_bucket"))
    yield "coalesce16", ok.coalesce(16)
    yield "salt2", ok.repartition(
        F.col("day_bucket"), F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2))
    )
    yield "repart64(day,salt4)", ok.repartition(64, F.col("day_bucket"), salt4)


for name, w in variants():
    out = "/tmp/bench_byday_out"
    for rep in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        w.write.mode("overwrite").partitionBy("day_bucket").parquet(out)
        dt = time.perf_counter() - t0
        nfiles = len(glob.glob(out + "/*/*.parquet"))
        print(f"{name:22s} rep{rep}: {dt:6.2f}s  files={nfiles}", flush=True)
