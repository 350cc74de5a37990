"""Streaming sketch maintenance — the continuous form of the
daily-rollup loop (``hll_sketch``/``cms_sketch`` → merge → persist).

Per micro-batch: build the batch's sketch (bounded rows from any batch
size), merge it into the persisted register/counter table, overwrite
the table. The persisted artifact stays a few KB forever, so "unique
users ever / this window" and "how hot is key X" are answered by
reading the sketch table — the stream never re-scans its own history.

Replay semantics differ by sketch, and that choice of merge operator
is the whole design:

- **HLL is replay-idempotent**: merge = per-bucket MAX, so a
  foreachBatch re-run of the same batch (crash between output commit
  and checkpoint) changes nothing. No dedup bookkeeping needed.
- **CMS is NOT**: merge = per-cell SUM, so a replayed batch would
  double-count. The counter table therefore carries a ``_batch``
  high-water mark and the merge skips batches already folded in —
  the standard idempotent-consumer guard.

Both tables are overwritten atomically per batch via a staged write +
rename-free parquet overwrite of a tiny table (≤ 512 / ≤ 4096 rows);
the read-modify-write is safe because foreachBatch serializes batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_P,
    cms_merge,
    cms_sketch,
    hll_merge,
    hll_sketch,
)

_HLL_SCHEMA = "bucket int, r int"
_CMS_SCHEMA = "row int, bucket int, n long, _batch long"


def read_hll_table(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.isdir(path):
        return spark.createDataFrame([], _HLL_SCHEMA)
    return spark.read.parquet(path)


def read_cms_table(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.isdir(path):
        return spark.createDataFrame([], _CMS_SCHEMA)
    return spark.read.parquet(path)


def _overwrite_tiny(df: DataFrame, path: str) -> None:
    # sever lineage BEFORE overwriting the table the plan reads from
    # (the read-modify-write self-overwrite trap the DedupIndex append
    # hit: lazy plans re-read the target mid-write). The table is
    # sketch-bounded, so the checkpoint is a few KB.
    df.localCheckpoint(eager=True).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def start_hll_stream(
    keys_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "k",
    p: int = HLL_P,
    mode: str = "djb2",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain a persisted HLL register table over a key stream.
    Replay-safe without bookkeeping: max-merge is idempotent."""

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        sk = hll_sketch(batch, key_col, p=p, mode=mode)
        prev = read_hll_table(spark, table_path)
        _overwrite_tiny(hll_merge(prev, sk), table_path)

    writer = keys_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cms_stream(
    keys_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "k",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    mode: str = "djb2",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain a persisted CMS counter table over a key stream.
    Sum-merge double-counts on replay, so the table carries a
    ``_batch`` high-water mark and already-folded batches are skipped
    (foreachBatch redelivers with the SAME batch_id on replay)."""

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = read_cms_table(spark, table_path)
        hwm = prev.agg(F.max("_batch")).collect()[0][0]
        if hwm is not None and batch_id <= hwm:
            return  # replay of an already-folded batch: no-op
        sk = cms_sketch(batch, key_col, depth=depth, width=width, mode=mode)
        merged = cms_merge(prev.drop("_batch"), sk).withColumn(
            "_batch", F.lit(batch_id).cast("long")
        )
        _overwrite_tiny(merged, table_path)

    writer = keys_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
