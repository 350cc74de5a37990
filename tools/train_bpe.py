"""One-shot trainer for the committed mini-BPE merge table.

Standard BPE training (Sennrich et al. 2016, public algorithm): start
from characters, repeatedly merge the most frequent adjacent symbol
pair in the pre-token vocabulary. Deterministic: corpus is the
seed-stable sf0.001 documents fixture, ties break on lexicographic
pair order. Output: s3_log_parser_spark/functions/bpe_merges.py
(committed — the runtime has no training dependency).

Run from the repo root:  python tools/train_bpe.py
"""

from __future__ import annotations

import os
import re
from collections import Counter

N_MERGES = 80
CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "s3_log_parser_spark", "functions", "bpe_merges.py",
)

# must match functions.text.BPE_RE (the shared pre-tokenizer)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def main() -> None:
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{CORPUS}') WHERE text IS NOT NULL"
        ).fetchall()
    ]
    pretok = Counter()
    for t in texts:
        pretok.update(re.findall(BPE_RE, t))

    vocab = {tuple(word): n for word, n in pretok.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pairs: Counter = Counter()
        for word, n in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += n
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        mx = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == mx)
        merges.append(best)
        merged = "".join(best)
        new_vocab = {}
        for word, n in vocab.items():
            w = list(word)
            i = 0
            out = []
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab

    with open(OUT, "w") as f:
        f.write(
            '"""Committed mini-BPE merge table (fixture).\n\n'
            "Trained once by tools/train_bpe.py on the seed-stable sf0.001\n"
            "documents corpus (standard BPE: most-frequent adjacent pair,\n"
            "lexicographic tie-break). Do not edit by hand — retrain.\n"
            '"""\n\nMERGES: list[tuple[str, str]] = [\n'
        )
        for a, b in merges:
            f.write(f"    ({a!r}, {b!r}),\n")
        f.write("]\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
