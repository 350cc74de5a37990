"""Regenerate the committed BPE goldens from the pure-Python reference.

Two fixtures over the sf0.01 documents table, used by the driver
queries ``text_bpe_real_counts`` and ``text_bpe_encode`` (the DuckDB
oracle reads these files; Spark recomputes the same values through the
pandas-UDF encoder — an end-to-end pin of the non-SQL tokenizer):

- ``golden/bpe_counts_sf001.parquet``  — (doc_id, n_bpe_real)
- ``golden/bpe_ids_sf001.parquet``     — (doc_id, n_ids, ids_hash)
  where ids_hash is the DJB2 fold (h=5381; h=(h*33+id) mod 2^32) over
  the FIRST 64 token ids — a compact, order-sensitive pin of the id
  sequence that a Catalyst fold reproduces exactly.

Rerun after retraining the merge table:  python tools/make_bpe_golden.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from s3_log_parser_spark.functions.bpe import (  # noqa: E402
    bpe_encode_py,
    bpe_token_count_py,
)

CORPUS = "/root/testdata/sf0.01/documents.parquet"
GOLDEN = os.path.join(REPO, "golden")

IDS_HASH_PREFIX = 64


def ids_hash(ids: list[int], n: int = IDS_HASH_PREFIX) -> int:
    h = 5381
    for d in ids[:n]:
        h = (h * 33 + d) % (1 << 32)
    return h


def main() -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{CORPUS}') ORDER BY doc_id"
    ).fetchall()
    counts = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "n_bpe_real": [bpe_token_count_py(r[1]) for r in rows],
        }
    )
    counts.to_parquet(
        os.path.join(GOLDEN, "bpe_counts_sf001.parquet"), index=False
    )
    encoded = [bpe_encode_py(r[1]) for r in rows]
    ids = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "n_ids": [len(e) for e in encoded],
            "ids_hash": [ids_hash(e) for e in encoded],
        }
    )
    ids.to_parquet(os.path.join(GOLDEN, "bpe_ids_sf001.parquet"), index=False)
    print(
        f"wrote {len(rows)} rows to bpe_counts_sf001.parquet and "
        f"bpe_ids_sf001.parquet (ids_hash over first {IDS_HASH_PREFIX} ids)"
    )


if __name__ == "__main__":
    main()
