"""P1-P8: vectorized grok parse of the turn ``text`` payload.

The reference's heart is a 268-line single-pass positional tokenizer
(``/root/reference/src/s3parser.c:93-360``: space-delimited with
quote-toggling and bracket-depth tracking). The format is regular, so
here it is ONE precompiled anchored regex (the "pattern bank"), applied
two ways:

- :func:`parse_text_pandas` — the hot path named by the north_star: a
  vectorized pandas UDF (`pandas .str.extract` → C regex engine over an
  Arrow batch; zero per-row Python) returning a struct of raw string
  fields.
- :func:`parse_text_sql` — pure-Catalyst ``regexp_extract`` per field
  from the same pattern; used as the JVM-side cross-check and the shape
  the DuckDB oracle mirrors.

Typed casts (P4), http-code domain clamp (P3), timestamp parse (P2) and
range split (P5) happen *after* extraction in Catalyst so failures feed
an explicit ``parse_status`` column instead of the reference's silent
zeroing (src/s3parser.c:165-171, 216-218 — SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..schemas import PARSED_FIELDS, PARSED_RAW_STRUCT

# field-name order must match PARSED_FIELDS / reassembly
_FIELD_PATTERNS: list[tuple[str, str]] = [
    ("owner", r"(?P<owner>\S+)"),
    ("bucket", r"(?P<bucket>\S+)"),
    ("ts_str", r"\[(?P<ts_str>[^\]]*)\]"),
    ("remote_ip", r"(?P<remote_ip>\S+)"),
    ("requester", r"(?P<requester>\S+)"),
    ("req_id", r"(?P<req_id>\S+)"),
    ("operation", r"(?P<operation>\S+)"),
    ("key", r"(?P<key>\S+)"),
    ("request_uri", r'"(?P<request_uri>[^"]*)"'),
    ("http_code", r"(?P<http_code>\d+)"),
    ("error_code", r"(?P<error_code>\S+)"),
    ("bytes_sent", r"(?P<bytes_sent>\S+)"),
    ("object_size", r"(?P<object_size>\S+)"),
    ("total_time_ms", r"(?P<total_time_ms>\S+)"),
    ("turnaround_ms", r"(?P<turnaround_ms>\S+)"),
    ("referrer", r'"(?P<referrer>[^"]*)"'),
    ("user_agent", r'"(?P<user_agent>[^"]*)"'),
    ("version_id", r"(?P<version_id>\S+)"),
    ("host_id", r"(?P<host_id>\S+)"),
    ("sig_version", r"(?P<sig_version>\S+)"),
    ("cipher", r"(?P<cipher>\S+)"),
    ("auth_type", r"(?P<auth_type>\S+)"),
    ("host_header", r"(?P<host_header>\S+)"),
    ("tls_version", r"(?P<tls_version>\S+)"),
    ("access_point_arn", r"(?P<access_point_arn>\S+)"),
    ("acl_required", r"(?P<acl_required>\S+)"),
]

# optional trailing 27th field: quoted Range header, only on 206 rows
# (reference: src/s3parser.c:323-340; generator src/fake_logs.c:94-99)
S3_LINE_PATTERN = (
    "^"
    + " ".join(p for _, p in _FIELD_PATTERNS)
    + r'(?: "(?P<range_header>[^"]*)")?$'
)

TS_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"  # P2 — src/s3parser.c:161 strptime fmt

_INT_FIELDS = {n for n, t in PARSED_FIELDS if t.typeName() in ("integer", "long")}


def parse_text_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Hot-path grok parse: one pandas UDF → ``parsed`` struct column.

    Uses mapInPandas-free scalar pandas_udf with a struct return type;
    pandas ``.str.extract`` compiles the bank once per worker.
    """

    @pandas_udf(PARSED_RAW_STRUCT)
    def grok(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(S3_LINE_PATTERN)
        cols = [n for n, _ in PARSED_FIELDS]
        for s in it:
            out = s.str.extract(pat)
            yield out[cols]

    parsed = df.withColumn("_raw", grok(F.col(text_col)))
    return _typed_from_raw(parsed, text_col)


def parse_text_sql(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Catalyst-only variant: regexp_extract per field, same pattern.

    regexp_extract needs numbered groups; group i+1 corresponds to
    field i because the bank has exactly one group per field.
    """
    # convert named groups to plain groups for JVM regex group indexing
    import re as _re

    plain = _re.sub(r"\(\?P<[^>]+>", "(", S3_LINE_PATTERN)
    exprs = []
    for i, (name, _) in enumerate(PARSED_FIELDS):
        g = F.regexp_extract(F.col(text_col), plain, i + 1)
        exprs.append(g.alias(name))
    # regexp_extract returns '' on miss — use a match probe to distinguish
    matched = F.col(text_col).rlike(plain)
    raw = F.when(matched, F.struct(*exprs)).otherwise(F.lit(None))
    parsed = df.withColumn("_raw", raw.cast(PARSED_RAW_STRUCT))
    return _typed_from_raw(parsed, text_col, empty_range_is_null=True)


def _typed_from_raw(
    df: DataFrame, text_col: str, empty_range_is_null: bool = False
) -> DataFrame:
    """Shared cast + parse_status derivation from the raw string struct."""
    r = F.col("_raw")
    fields: list[Column] = []
    for name, typ in PARSED_FIELDS:
        c = r[name]
        if name == "range_header" and empty_range_is_null:
            c = F.when(c == "", F.lit(None)).otherwise(c)
        if name in _INT_FIELDS:
            c = c.cast(typ)
        fields.append(c.alias(name))

    ts = F.to_timestamp(r["ts_str"], TS_FORMAT)
    out = (
        df.withColumn("parsed", F.struct(*fields))
        .withColumn("event_ts", ts)
        .withColumn(
            "parse_status",
            F.when(r["owner"].isNull(), F.lit("bad_format"))
            .when(r["ts_str"].isNotNull() & ts.isNull(), F.lit("bad_time"))
            .otherwise(F.lit("ok")),
        )
        .drop("_raw")
    )
    return out


def clamp_http_code(col: Column | str) -> Column:
    """P3: 200 ≤ code ≤ 599 else 0 (src/s3parser.c:214-223)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.between(200, 599), c).otherwise(F.lit(0)).cast("int")


def parse_range(col: Column | str) -> tuple[Column, Column]:
    """P5 *intended* semantics: '"bytes=0-12345"' → (start, end).

    The reference's sscanf pattern lacks the '=' so real ranges never
    populate (src/s3parser.c:334 vs fake_logs.c:98) — we implement the
    intent and accept both spellings.
    """
    c = F.col(col) if isinstance(col, str) else col
    start = F.regexp_extract(c, r"bytes=?(\d+)-(\d+)", 1).cast("long")
    end = F.regexp_extract(c, r"bytes=?(\d+)-(\d+)", 2).cast("long")
    # regexp_extract returns '' → cast gives NULL; keep NULL for non-206 rows
    return start, end


def reassemble_text(parsed: Column) -> Column:
    """Rebuild the raw line from the parsed struct — byte-exact inverse
    of the grok bank for parse_status='ok' rows (north_rule round-trip).
    """
    p = parsed
    base = F.concat_ws(
        " ",
        p["owner"],
        p["bucket"],
        F.concat(F.lit("["), p["ts_str"], F.lit("]")),
        p["remote_ip"],
        p["requester"],
        p["req_id"],
        p["operation"],
        p["key"],
        F.concat(F.lit('"'), p["request_uri"], F.lit('"')),
        p["http_code"].cast("string"),
        p["error_code"],
        p["bytes_sent"].cast("string"),
        p["object_size"].cast("string"),
        p["total_time_ms"].cast("string"),
        p["turnaround_ms"].cast("string"),
        F.concat(F.lit('"'), p["referrer"], F.lit('"')),
        F.concat(F.lit('"'), p["user_agent"], F.lit('"')),
        p["version_id"],
        p["host_id"],
        p["sig_version"],
        p["cipher"],
        p["auth_type"],
        p["host_header"],
        p["tls_version"],
        p["access_point_arn"],
        p["acl_required"],
    )
    return F.when(
        p["range_header"].isNotNull(),
        F.concat(base, F.lit(' "'), p["range_header"], F.lit('"')),
    ).otherwise(base)


def contains_pattern(col: Column | str, pattern: str) -> Column:
    """P6 check_pattern (src/s3parser.c:662-680): plain substring, 0/1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.contains(pattern), F.lit(1)).otherwise(F.lit(0))
