"""corpus_profile — the one-scan data-card aggregate."""

import hashlib
import io
from contextlib import redirect_stdout

from s3_log_parser_spark.operators.corpus import corpus_profile


def _df(spark):
    rows = [
        # src a: "the and with of to" is stopword-heavy english
        (1, "a", "the cat and the dog with a ball of yarn to play"),
        (2, "a", "the cat and the dog with a ball of yarn to play"),  # dup
        (3, "a", "zz qq ww"),
        # src b: one doc, no stopwords
        (4, "b", "lorem!!! ipsum### dolor"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_corpus_profile_values(spark):
    got = {r["source"]: r.asDict() for r in corpus_profile(_df(spark)).collect()}
    a, b = got["a"], got["b"]
    assert a["n_docs"] == 3 and b["n_docs"] == 1
    assert a["sum_tokens"] == 12 + 12 + 3
    assert a["min_tokens"] == 3 and a["max_tokens"] == 12
    assert a["n_unique"] == 2  # docs 1/2 share a digest
    assert a["n_en"] == 2 and b["n_en"] == 0
    assert b["sum_chars"] == len("lorem!!! ipsum### dolor")
    # hand-computed quality for src b's single doc:
    # 3 distinct / 3 tokens -> 1000*6; stopwords 0; punct 6 -> -60
    assert b["sum_quality_x1000"] == 6000 - 60


def test_corpus_profile_one_scan_no_join(spark):
    import re

    buf = io.StringIO()
    with redirect_stdout(buf):
        corpus_profile(_df(spark)).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    # count_distinct rides the same scan: Catalyst plans it as a
    # two-level aggregate — (source, digest) partial then source final
    # — so the whole profile is one scan and exactly two exchanges
    assert plan.count("+- Exchange") == 2
    # literal-rows input: one scan node total
    assert len(set(re.findall(r"Scan ExistingRDD\s*\((\d+)\)", plan))) == 1


def test_corpus_profile_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a", None)], "doc_id long, source string, text string"
    )
    (r,) = corpus_profile(df).collect()
    assert r["sum_tokens"] == 0 and r["sum_chars"] == 0
    assert r["n_unique"] == 1
    assert r["n_en"] == 0
