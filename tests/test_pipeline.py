"""End-to-end DAG: per-sink aggregate counts, routed-row set equality,
kill/resume idempotence (FIXTURES.md §5)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from s3_log_parser_spark.plans.pipeline import build_slim, run_pipeline
from s3_log_parser_spark.plans.lineage import Manifest
from s3_log_parser_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def piperun(spark, transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    res = run_pipeline(spark, transcripts, out, run_id="t1")
    return out, res


def test_row_conservation(spark, transcripts, piperun):
    out, res = piperun
    assert res.slim.count() == transcripts.count()


def test_sink_counts_consistency(spark, transcripts, piperun):
    out, res = piperun
    total = transcripts.count()
    cat = Catalog(spark, out)
    n_ok = res.slim.filter(F.col("parse_status") == "ok").count()
    n_bad = total - n_ok

    by_tool = cat.read("by_tool_counts")
    assert by_tool.agg(F.sum("count")).collect()[0][0] == n_ok
    assert by_tool.count() == 20  # the 20-tool vocabulary

    by_role = cat.read("by_role_counts")
    assert by_role.agg(F.sum("count")).collect()[0][0] == n_ok
    assert by_role.count() == 3

    rejects = cat.read("rejects_counts")
    assert (rejects.agg(F.sum("count")).collect()[0][0] or 0) == n_bad

    by_day = cat.read("by_day_counts")
    assert by_day.agg(F.sum("count")).collect()[0][0] == n_ok


def test_routed_row_set_equality(spark, piperun):
    from s3_log_parser_spark.operators.router import align_schema

    out, res = piperun
    cat = Catalog(spark, out)
    slim = cat.read("slim")
    # ok-routes ∪ rejects == slim, set-exact both directions
    union = align_schema(
        cat.read("by_tool").unionByName(cat.read("rejects")), slim
    )
    assert union.exceptAll(slim).isEmpty()
    assert slim.exceptAll(union).isEmpty()
    # by_tool / by_role / by_day carry identical row-sets (same ok rows)
    bt = align_schema(cat.read("by_tool"), slim)
    br = align_schema(cat.read("by_role"), slim)
    assert bt.exceptAll(br).isEmpty() and br.exceptAll(bt).isEmpty()


def test_aggregate_matches_direct_groupby(spark, transcripts, piperun):
    """per-sink aggregate counts == independently computed group-bys
    straight from the raw fixture (reference parity: grouped export
    counts, s3extract.c:273)."""
    out, res = piperun
    cat = Catalog(spark, out)
    slim = build_slim(transcripts)
    want = {
        r["tool"]: r["c"]
        for r in slim.filter("parse_status = 'ok'")
        .groupBy("tool")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    got = {r["tool"]: r["count"] for r in cat.read("by_tool_counts").collect()}
    assert got == want


def test_resume_skips_completed_and_is_idempotent(spark, transcripts, tmp_path):
    out = str(tmp_path / "resume")
    # full run
    res1 = run_pipeline(spark, transcripts, out, run_id="r1")
    full_counts = {
        name: sorted((tuple(r) for r in df.collect()))
        for name, df in res1.sink_counts.items()
    }
    # simulate a kill after slim + 2 sinks: drop two manifest entries
    # and the sink dirs, then re-run with the same run_id
    m = Manifest(out, "r1")
    for stage, table in [("sink:by_day", "by_day"), ("sink:rejects", "rejects")]:
        os.remove(m._path(stage))
        shutil.rmtree(os.path.join(out, table))
        shutil.rmtree(os.path.join(out, f"{table}_counts"))
    res2 = run_pipeline(spark, transcripts, out, run_id="r1")
    for name, df in res2.sink_counts.items():
        assert sorted(tuple(r) for r in df.collect()) == full_counts[name]
    # slim stage must have been skipped (manifest still complete)
    assert m.complete("slim")


def test_parser_paths_agree(spark, transcripts):
    """the three parse implementations — Arrow-native fused (hot path),
    pandas fused, and modular pandas+encode — produce identical slim
    tables (exceptAll both ways empty)."""
    arrow = build_slim(transcripts, arrow=True)
    pandas_fused = build_slim(transcripts, arrow=False)
    modular = build_slim(transcripts, fused=False)
    assert arrow.exceptAll(pandas_fused).isEmpty()
    assert pandas_fused.exceptAll(arrow).isEmpty()
    assert arrow.exceptAll(modular).isEmpty()
    assert modular.exceptAll(arrow).isEmpty()


def test_no_python_udf_outside_parse(spark, transcripts):
    """north_rule 'no per-row Python': the DAG's only Python is the
    Arrow-batched grok/DJB2 stage; verify the SQL-parser variant plans
    zero Python evals end-to-end."""
    slim = build_slim(transcripts, use_sql_parser=True, use_udf_hash=False)
    plan = slim._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF
    assert "ArrowEvalPython" not in plan  # fully JVM in this variant


def test_router_write_strategies_equivalent(spark, transcripts, tmp_path):
    """The width-adaptive write layouts (salt repartition vs shuffle-free
    coalesce) must produce identical sink CONTENT — only file layout may
    differ."""
    import os

    from s3_log_parser_spark.operators.router import align_schema, route_and_write
    from s3_log_parser_spark.plans.pipeline import build_slim
    from s3_log_parser_spark.sources.catalog import Catalog

    slim = build_slim(transcripts.limit(2000))
    results = {}
    for strat in ("salt", "coalesce"):
        os.environ["ROUTER_WRITE_STRATEGY"] = strat
        try:
            out = str(tmp_path / strat)
            cat = Catalog(spark, out)
            route_and_write(slim, cat)
            results[strat] = cat
        finally:
            del os.environ["ROUTER_WRITE_STRATEGY"]
    for sink in ("by_tool", "by_day", "rejects", "by_tool_counts"):
        a = results["salt"].read(sink)
        b = align_schema(results["coalesce"].read(sink), a)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), sink


def test_percentiles_disc_exact_and_approx(spark):
    """A5: exact mode = value at ascending rank ceil(p*n); approx mode
    (the scale path) must land within the discrete value range."""
    from s3_log_parser_spark.operators.aggregate import percentiles_disc

    rows = [("a", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("b", 7), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r["k"]: r for r in percentiles_disc(df, "k", "v").collect()}
    assert got["a"]["n"] == 10
    assert got["a"]["p500"] == 50     # ceil(10*0.5) = rank 5
    assert got["a"]["p950"] == 100    # ceil(10*0.95) = rank 10
    assert got["a"]["p990"] == 100
    assert got["b"]["n"] == 1 and got["b"]["p500"] == 7  # NULLs excluded

    ap = {
        r["k"]: r
        for r in percentiles_disc(df, "k", "v", mode="approx").collect()
    }
    assert ap["a"]["n"] == 10
    assert 40 <= ap["a"]["p500"] <= 60
    assert ap["a"]["p950"] >= 90


def test_profile_key_skew_modes(spark):
    """skew profiler: exact stats on a planted hot key; approx mode
    (mergeable, no global sort) lands within sketch error."""
    from s3_log_parser_spark.operators.aggregate import profile_key_skew

    rows = [("hot", i) for i in range(90)] + [
        (f"k{i}", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    r = profile_key_skew(df, "k").collect()[0]
    assert r["n_keys"] == 11
    assert r["total_rows"] == 100
    assert r["max_count"] == 90
    assert r["p50_count"] == 1      # rank ceil(11*0.5)=6 of [1×10, 90]
    assert r["p99_count"] == 90     # rank ceil(11*0.99)=11
    assert r["top1_share_x1000"] == 900
    a = profile_key_skew(df, "k", mode="approx").collect()[0]
    assert a["n_keys"] == 11 and a["max_count"] == 90
    assert a["p50_count"] == 1


def test_grouped_topk_deterministic_and_group_limited(spark):
    """per-group top-k: deterministic total order picks the same rows
    every run, and the plan carries a WindowGroupLimit so ≤k rows per
    group cross the shuffle (the 100 TB property)."""
    from s3_log_parser_spark.operators.aggregate import grouped_topk
    from pyspark.sql import functions as F

    rows = [
        ("u1", "a", 5), ("u1", "b", 5), ("u1", "c", 1),
        ("u2", "x", 9),
    ]
    df = spark.createDataFrame(rows, "user string, item string, n long")
    out = grouped_topk(
        df, ("user",), (F.col("n").desc(), F.col("item").asc()), k=2
    )
    got = {(r["user"], r["item"], r["rank"]) for r in out.collect()}
    # tie on n=5 broken by item asc: a before b
    assert got == {("u1", "a", 1), ("u1", "b", 2), ("u2", "x", 1)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
