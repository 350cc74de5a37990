"""Table-format seam: Iceberg when a runtime catalog is configured,
partitioned Parquet otherwise (SURVEY.md §7 — no Iceberg jar in this
sandbox, identical call sites either way).

At 100 TB the real deployment is Iceberg with ``bucket(N, conv_id)``
partitioning on the fact/slim tables (co-locates a conversation's
turns → the stable-turn-ordering window and conv-keyed aggregations
shuffle-free via storage-partitioned joins) and day partitioning on
the sinks (partition pruning for time-ranged queries).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        cat = spark.conf.get("spark.sql.catalog.spark_catalog", None)
    except Exception:
        cat = None
    return bool(cat and "iceberg" in str(cat).lower())


class Catalog:
    """Minimal write/read abstraction over the format seam."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = _iceberg_available(spark)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] = (),
    ) -> None:
        if self.iceberg:  # pragma: no cover — needs the runtime jar
            w = df.writeTo(f"{table}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, table: str) -> DataFrame:
        if self.iceberg:  # pragma: no cover
            return self.spark.table(table)
        return self.spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        if self.iceberg:  # pragma: no cover
            return self.spark.catalog.tableExists(table)
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )
