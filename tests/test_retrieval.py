"""BM25 lexical retrieval: ranking properties + exact scoring shape."""

import math

import pytest
from pyspark.sql import functions as F

from s3_log_parser_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "apple banana cherry date"),
        (1, "apple apple apple banana"),          # high tf for apple
        (2, "apple " + "filler " * 40),            # long doc, one hit
        (3, "banana cherry"),
        (4, "unrelated words only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, corpus, qtext, k=5):
    q = spark.createDataFrame([(0, qtext)], "q_id long, q_text string")
    return {
        r["doc_id"]: (r["rank"], r["score_x1000"])
        for r in bm25_topk(corpus, q, k=k).collect()
    }


def test_bm25_ranking_properties(spark, corpus):
    got = _run(spark, corpus, "apple")
    # only docs containing the term are scored
    assert set(got) == {0, 1, 2}
    # tf saturation still ranks the tf=3 doc first; the long doc is
    # length-penalized below the short single-hit doc
    assert got[1][0] == 1
    assert got[0][1] > got[2][1]
    # all scores positive and integer
    assert all(s > 0 for _, s in got.values())


def test_bm25_exact_score_matches_reference_formula(spark, corpus):
    """pin one score against the textbook formula computed in Python
    with the same integer scaling."""
    got = _run(spark, corpus, "apple")
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    dls = {i: len(t.split()) for i, t in docs.items()}
    n, sumdl = len(docs), sum(dls.values())
    df = 3
    idf = math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1000)
    for doc, tf in ((0, 1), (1, 3), (2, 1)):
        num = idf * (tf * 220 * sumdl * 100)
        den = tf * 10000 * sumdl + 120 * (25 * sumdl + 75 * dls[doc] * n)
        assert got[doc][1] == num // den, doc


def test_bm25_multi_term_and_k(spark, corpus):
    got = _run(spark, corpus, "banana cherry", k=2)
    # doc 3 contains both terms and is shortest -> rank 1; k truncates
    assert [d for d, (r, _) in sorted(got.items(), key=lambda x: x[1][0])][0] == 3
    assert len(got) == 2
    # duplicate query terms count once (bag-of-terms)
    dup = _run(spark, corpus, "banana banana cherry", k=2)
    assert dup == got


def test_bm25_deterministic_tie_break(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(4)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "same")], "q_id long, q_text string")
    out = bm25_topk(df, q, k=4).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in by_rank] == [0, 1, 2, 3]
    assert len({r["score_x1000"] for r in out}) == 1


def test_rrf_fuse_combines_and_tie_breaks(spark):
    from s3_log_parser_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 20), (0, 3, 30)],
        "q_id long, rank long, doc_id long",
    )
    dense = spark.createDataFrame(
        [(0, 1, 30), (0, 2, 40)],
        "q_id long, rank long, doc_id long",
    )
    out = {r["doc_id"]: (r["rank"], r["rrf_x1m"])
           for r in rrf_fuse([lex, dense], k=10).collect()}
    # doc 30: rank1 in one + rank1... doc 30 = lex rank 3 + dense rank 1
    c = lambda r: 1_000_000 // (60 + r)
    assert out[10][1] == c(1)
    assert out[30][1] == c(3) + c(1)
    assert out[40][1] == c(2)
    assert out[20][1] == c(2)
    # doc appearing in both lists outranks single-list docs here;
    # doc 10 (rank-1 in lex) is next
    assert out[30][0] == 1 and out[10][0] == 2
    # deterministic tie-break on equal scores: lower doc_id first
    assert (out[20][0], out[40][0]) == (3, 4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([])
