"""Distil the heuristic quality score into a hashed linear model.

Offline trainer (run once, commit the table): labels come from the
repo's deterministic heuristic ``quality_score_x1000`` (label 1 ⇔
score ≥ corpus median), features are hashed unigram COUNTS
(djb2 mod N_BUCKETS — the same bucket function
``functions/classify.token_buckets`` applies at scale), and the model
is plain numpy logistic regression. Weights are quantized ×1000 to
integers and written to ``s3_log_parser_spark/functions/
quality_weights.py`` so the scoring pass stays integer end to end.

    python tools/train_quality.py [sf_dir]

This mirrors how production corpora are quality-filtered: an expensive
labeler (here the heuristic; in real life an LLM judge or curated
set) is distilled into a linear model cheap enough to run over 100 TB.
"""

import re
import sys

import numpy as np

sys.path.insert(0, ".")

from s3_log_parser_spark.functions.classify import DEFAULT_BUCKETS  # noqa: E402
from s3_log_parser_spark.functions.hashes import djb2_py  # noqa: E402

OUT = "s3_log_parser_spark/functions/quality_weights.py"


def featurize(texts: list[str], n_buckets: int) -> np.ndarray:
    x = np.zeros((len(texts), n_buckets), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in re.split(r"\s+", (t or "").strip()):
            if tok:
                x[i, djb2_py(tok) % n_buckets] += 1.0
    return x


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from s3_log_parser_spark.functions.text import quality_score_x1000
    from s3_log_parser_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", quality_score_x1000("text").alias("q"))
        .orderBy("doc_id")
        .collect()
    )
    texts = [r["text"] for r in rows]
    q = np.array([r["q"] for r in rows], dtype=np.float64)
    y = (q >= np.median(q)).astype(np.float64)
    x = featurize(texts, DEFAULT_BUCKETS)
    print(f"{len(texts)} docs, positives {int(y.sum())}")

    rng = np.random.default_rng(5381)
    w = rng.normal(0.0, 0.01, DEFAULT_BUCKETS)
    b = 0.0
    lr, l2 = 0.05, 1e-4
    n = len(texts)
    for epoch in range(400):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (x.T @ g / n + l2 * w)
        b -= lr * g.mean()
        if epoch % 100 == 99:
            acc = ((z >= 0) == (y == 1)).mean()
            print(f"epoch {epoch + 1}: train acc {acc:.3f}")

    wi = [int(round(v * 1000)) for v in w]
    bi = int(round(b * 1000))
    acc = (((x @ np.array(wi) + bi) >= 0) == (y == 1)).mean()
    print(f"quantized train acc {acc:.3f}")
    with open(OUT, "w") as f:
        f.write(
            '"""Distilled quality-model weights (x1000 ints) — generated\n'
            f"by tools/train_quality.py over {sf_dir} documents\n"
            f"(labels: quality_score_x1000 >= median). {DEFAULT_BUCKETS} "
            'hashed-unigram buckets.\n"""\n\n'
            f"BIAS_X1000 = {bi}\n\nWEIGHTS_X1000 = [\n"
        )
        for i in range(0, len(wi), 12):
            f.write("    " + ", ".join(str(v) for v in wi[i:i + 12]) + ",\n")
        f.write("]\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
