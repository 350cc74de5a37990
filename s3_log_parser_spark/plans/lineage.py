"""Per-run stage manifest + per-partition lineage metrics (north_rule:
"every stage checkpoints per-partition lineage and row/byte metrics so
a killed run resumes idempotently").

Design (SURVEY.md §4.4): the slim table is the data checkpoint; this
module adds (a) a JSON stage manifest keyed (run_id, stage) — a stage
whose manifest entry exists is skipped on re-run, so a killed run
resumes after its last completed write — and (b) a ``_lineage`` metrics
table collected via ``mapInPandas`` (partition id, rows, bytes) with
zero extra shuffle (piggybacks on an existing pass).

On Iceberg the manifest role is played by snapshot metadata; the JSON
manifest is the format-seam fallback and is what the kill/resume test
exercises.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Manifest:
    def __init__(self, root: str, run_id: str):
        self.dir = os.path.join(root, "_manifest", run_id)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        safe = stage.replace("/", "_").replace(":", "_")
        return os.path.join(self.dir, f"{safe}.json")

    def complete(self, stage: str) -> bool:
        return os.path.exists(self._path(stage))

    def mark(self, stage: str, **meta) -> None:
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "ts": time.time(), **meta}, f)
        os.replace(tmp, self._path(stage))  # atomic → no torn manifests

    def stages(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.dir) if f.endswith(".json")
        )


def with_partition_metrics(df: DataFrame) -> DataFrame:
    """Append per-partition lineage columns without an extra pass:
    each Arrow batch is tagged with its partition id; aggregating
    ``_lineage`` afterwards gives (partition, rows, bytes).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("_part_id", T.IntegerType(), False),
            T.StructField("_part_bytes", T.LongType(), False),
        ]
    )

    def tag(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            pdf = pdf.copy()
            pdf["_part_id"] = pid
            pdf["_part_bytes"] = int(pdf.memory_usage(deep=True).sum())
            yield pdf

    return df.mapInPandas(tag, schema)


def lineage_summary(tagged: DataFrame) -> DataFrame:
    return tagged.groupBy("_part_id").agg(
        F.count("*").alias("rows"),
        F.max("_part_bytes").alias("approx_bytes"),
    )
