"""Arrow-native fused parse — the 100 TB hot path.

Why this exists: the pandas grok UDF allocates ~27 Python string
objects per row; at 32 concurrent workers that saturates the memory
bus/allocator and the parse stage stops scaling (measured: extract-only
29 s on 32 cores vs 19 s on 8 — negative scaling). This variant keeps
every per-row operation inside Arrow C++ kernels via ``mapInArrow``:

- RE2 ``extract_regex`` over the Arrow string buffer (reduced pattern:
  only the fields the slim record needs capture; the rest are
  non-capturing) — no Python objects materialize;
- DJB2 via dictionary-encode → hash the (small) dictionary in Python →
  ``take`` back, so Python cost is O(distinct), not O(rows);
- ``strptime`` + explicit UTC-offset arithmetic for the timestamp
  (honoring %z, unlike the reference's local-time mktime — SURVEY P2);
- guarded casts (digit-mask → cast) for the numeric fields.

Output columns and semantics are identical to
``parsing.parse_text_slim`` (pinned by tests/test_pipeline.py).
"""

from __future__ import annotations

import re
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .parsing import PARSED_FIELDS, S3_LINE_PATTERN

# fields that must capture for the slim record; everything else becomes
# non-capturing to halve RE2's per-row work
_SLIM_NEEDED = {
    "owner",
    "ts_str",
    "remote_ip",
    "key",
    "http_code",
    "bytes_sent",
    "object_size",
    "total_time_ms",
    "user_agent",
    "range_header",
}


def _reduced_pattern() -> str:
    pat = S3_LINE_PATTERN
    for name, _ in PARSED_FIELDS:
        if name not in _SLIM_NEEDED:
            pat = pat.replace(f"(?P<{name}>", "(?:")
    return pat


SLIM_ARROW_PATTERN = _reduced_pattern()

_OUT_FIELDS = [
    ("event_ts", T.TimestampType()),
    ("parse_status", T.StringType()),
    ("ip_hash", T.LongType()),
    ("key_hash", T.LongType()),
    ("tool_hash", T.LongType()),
    ("conv_hash", T.LongType()),
    ("http_code_raw", T.IntegerType()),
    ("bytes_sent", T.LongType()),
    ("object_size", T.LongType()),
    ("total_time_ms", T.IntegerType()),
    ("byte_start", T.LongType()),
    ("byte_end", T.LongType()),
    ("user_agent", T.StringType()),
]


def parse_text_arrow(
    df: DataFrame, text_col: str = "text", conv_col: str = "conv_id"
) -> DataFrame:
    """fused grok+DJB2+timestamp parse as a mapInArrow transform.

    Appends the typed slim-parse columns to the input columns.
    """
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(n, t, True) for n, t in _OUT_FIELDS]
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        from .hashes import djb2_numpy

        def dict_hash(arr: pa.Array) -> pa.Array:
            """DJB2 per distinct value; NULL → 5381 (reference NULL guard).

            dictionary-encode → numpy DJB2 over the (deduplicated)
            dictionary's Arrow buffers → take back. Cost is O(distinct
            bytes) of VECTORIZED numpy work — no per-string Python, so
            a high-cardinality column (conv_id/key at real scale, where
            the dictionary approaches batch size) stays cheap instead
            of degenerating to per-row Python.
            """
            d = pc.dictionary_encode(arr)
            lut = pa.array(djb2_numpy(d.dictionary), pa.int64())
            hashed = pc.take(lut, d.indices)
            return pc.fill_null(hashed, 5381)

        def digit_cast(arr: pa.Array, typ: pa.DataType) -> pa.Array:
            ok = pc.match_substring_regex(arr, r"^[0-9]+$")
            masked = pc.if_else(pc.fill_null(ok, False), arr, pa.scalar(None, pa.string()))
            return pc.cast(masked, typ)

        for batch in batches:
            text = batch.column(batch.schema.get_field_index(text_col))
            conv = batch.column(batch.schema.get_field_index(conv_col))

            st = pc.extract_regex(text, pattern=SLIM_ARROW_PATTERN)
            f = lambda n: pc.struct_field(st, n)  # noqa: E731

            # timestamp: "dd/Mon/yyyy:HH:mm:ss +zzzz" → UTC
            tss = f("ts_str")
            base = pc.strptime(
                pc.utf8_slice_codeunits(tss, 0, 20),
                format="%d/%b/%Y:%H:%M:%S",
                unit="us",
                error_is_null=True,
            )
            # offset handling via the (tiny) distinct-offset dictionary
            off = pc.utf8_slice_codeunits(tss, 21, 26)
            od = pc.dictionary_encode(off)

            def off_secs(v):
                if v is None or len(v) != 5 or v[0] not in "+-":
                    return 0
                try:
                    s = int(v[1:3]) * 3600 + int(v[3:5]) * 60
                except ValueError:
                    return 0
                return -s if v[0] == "-" else s

            olut = pa.array(
                [off_secs(v) for v in od.dictionary.to_pylist()], pa.int64()
            )
            osec = pc.fill_null(pc.take(olut, od.indices), 0)
            event_ts = pc.subtract(
                base, pc.cast(pc.multiply(osec, 1_000_000), pa.duration("us"))
            )

            owner_null = pc.is_null(f("owner"))
            status = pc.if_else(
                owner_null,
                pa.scalar("bad_format"),
                pc.if_else(
                    pc.and_(pc.is_valid(tss), pc.is_null(event_ts)),
                    pa.scalar("bad_time"),
                    pa.scalar("ok"),
                ),
            )

            key = f("key")
            seg = pc.struct_field(
                pc.extract_regex(pc.fill_null(key, ""), pattern=r"^/?(?P<seg>[^/]*)"),
                "seg",
            )
            # extract_path: NULL/'' key → seed (src/s3parser.c:425-428)
            rng = pc.extract_regex(
                pc.fill_null(f("range_header"), ""),
                pattern=r"bytes=?(?P<s>[0-9]+)-(?P<e>[0-9]+)",
            )

            cols = {
                "event_ts": event_ts,
                "parse_status": status,
                "ip_hash": dict_hash(f("remote_ip")),
                "key_hash": dict_hash(key),
                "tool_hash": dict_hash(seg),
                "conv_hash": dict_hash(conv),
                "http_code_raw": digit_cast(f("http_code"), pa.int32()),
                "bytes_sent": digit_cast(f("bytes_sent"), pa.int64()),
                "object_size": digit_cast(f("object_size"), pa.int64()),
                "total_time_ms": digit_cast(f("total_time_ms"), pa.int32()),
                "byte_start": pc.cast(pc.struct_field(rng, "s"), pa.int64()),
                "byte_end": pc.cast(pc.struct_field(rng, "e"), pa.int64()),
                "user_agent": f("user_agent"),
            }
            arrays = list(batch.columns) + [
                pa.chunked_array([c]).combine_chunks()
                if isinstance(c, pa.ChunkedArray)
                else c
                for c in cols.values()
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[fld.name for fld in batch.schema] + list(cols)
            )

    return df.mapInArrow(run, out_schema)
