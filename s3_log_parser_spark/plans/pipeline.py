"""The end-to-end DAG: parse → encode → enrich → flags → route → aggregate.

Distributed trace (SURVEY.md §3.1): scan transcripts (column-pruned to
conv_id, turn_idx, role, tool, text, ts) → one Arrow pass (DFA parse
bank + DJB2, text dropped at the worker) → Catalyst-codegen'd
casts/encodings + UA classify → ONE shuffle (the (ip_hash, key_hash)
window for ST1, narrowest possible rows) → broadcast-join role/tool
dims post-shuffle → slim table write (the checkpoint) → N filtered
sink writes + per-sink counts from the columnar re-read.

Scale posture: the only wide exchange before the sinks is the ST1
window on high-cardinality hash keys (no skew by construction); the
hot-conversation skew on conv_id never hits a shuffle in this DAG
(conv-keyed work is the *order* surrogate inside the ip/key window,
not a partition key). Sink writes are pruned columnar scans of slim.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.encode import SLIM_COLUMNS, encode_slim
from ..functions.parsing import parse_text_pandas, parse_text_sql
from ..operators.enrich import classify_when, enrich_role_tool
from ..operators.flags import with_flags
from ..operators.router import Route, default_routes, route_and_write
from ..sources.catalog import Catalog
from .lineage import Manifest


@dataclass
class PipelineResult:
    slim: DataFrame
    sink_counts: dict[str, DataFrame]
    timings: dict[str, float] = field(default_factory=dict)
    lineage: DataFrame | None = None


def build_slim(
    transcripts: DataFrame,
    use_sql_parser: bool = False,
    use_udf_hash: bool = True,
    fused: bool = True,
    arrow: bool = True,
) -> DataFrame:
    """The logical plan for transcripts → slim (no writes, no actions).

    Default path is the Arrow-native fused parse (mapInArrow + RE2 +
    dictionary-encoded DJB2) — exactly ONE vectorized stage, zero
    per-row Python objects (north_rule). ``arrow=False`` selects the
    pandas fused UDF; ``use_sql_parser`` the zero-Python Catalyst
    variant (cross-check paths, all equality-pinned in tests).
    """
    if fused and not use_sql_parser:
        from ..functions.encode import encode_slim_flat

        if arrow:
            from ..functions.parsing_arrow import parse_text_arrow

            df = parse_text_arrow(transcripts, "text", "conv_id")
        else:
            from ..functions.parsing import parse_text_slim

            df = parse_text_slim(transcripts, "text", "conv_id")
        df = encode_slim_flat(df)
        df = classify_when(df).drop("user_agent")
    else:
        if use_sql_parser:
            df = parse_text_sql(transcripts, "text")
            df = encode_slim(df, use_udf_hash=False)
        else:
            df = parse_text_pandas(transcripts, "text")
            df = encode_slim(df, use_udf_hash=use_udf_hash)
        # E7/E8: pattern banks are compile-time constants → CASE WHEN
        # chains (whole-stage codegen); the data-driven dims (role/tool)
        # go through real broadcast hash joins.
        df = classify_when(
            df.withColumn("user_agent", F.col("parsed")["user_agent"])
        ).drop("user_agent")
    # window BEFORE the broadcast enrich: with_flags' ST1 exchange is
    # the DAG's one wide shuffle, so it should carry the narrowest rows
    # possible — the role/tool dim columns (3 ints/row) are attached by
    # broadcast joins on the post-shuffle side instead (broadcast hash
    # joins are position-independent; column values are unchanged)
    df = with_flags(df)
    # r7: the role/tool dims are plan-time constants, so the pipeline
    # uses the CASE-WHEN lookup form — same columns/values as the left
    # broadcast join (parity-pinned in tests), zero BroadcastExchange
    # stages per run
    df = enrich_role_tool(df, method="expr")
    return df.select(*SLIM_COLUMNS)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    run_id: str = "run-0",
    routes: list[Route] | None = None,
    use_sql_parser: bool = False,
    verbose: bool = False,
) -> PipelineResult:
    """Execute the full DAG with manifest-gated idempotent resume.

    ``verbose``: additionally write a ``_lineage`` table of
    per-partition (rows, approx bytes) over the slim checkpoint — the
    reference's ``-v`` per-batch counters (src/s3parser.c:56-67) as a
    queryable table instead of stderr noise. One extra pruned pass over
    slim, only when asked for.
    """
    catalog = Catalog(spark, out_dir)
    manifest = Manifest(out_dir, run_id)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    if not manifest.complete("slim"):
        slim = build_slim(transcripts, use_sql_parser=use_sql_parser)
        catalog.write(slim, "slim", mode="overwrite")
        manifest.mark("slim")
    timings["slim"] = time.perf_counter() - t0

    # route from the columnar checkpoint, not the raw text. (Measured:
    # persisting slim in executor memory across the fan-out LOSES to
    # re-scanning the freshly written parquet here — OS page cache +
    # columnar decode beat MEMORY_AND_DISK's serialize/deserialize. On
    # a real cluster with remote object storage the trade flips; the
    # catalog seam is where a cache policy would slot in.)
    slim = catalog.read("slim")

    t0 = time.perf_counter()
    sink_timings: dict[str, float] = {}
    counts = route_and_write(
        slim,
        catalog,
        routes=routes,
        skip=manifest.complete,
        on_done=manifest.mark,
        timings_out=sink_timings,
    )
    timings["route"] = time.perf_counter() - t0
    for name, dt in sink_timings.items():
        timings[f"route:{name}"] = dt

    lineage = None
    if verbose:
        from .lineage import lineage_summary, with_partition_metrics

        if not manifest.complete("lineage"):
            catalog.write(
                lineage_summary(with_partition_metrics(slim)), "_lineage"
            )
            manifest.mark("lineage")
        lineage = catalog.read("_lineage")

    return PipelineResult(
        slim=slim, sink_counts=counts, timings=timings, lineage=lineage
    )
