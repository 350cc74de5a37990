"""CLI driver parity: gen → parse → extract (reference-shaped grouped
JSON, S6/F1/F2/F3) and run -v (lineage table, reference -v counters)."""

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from s3_log_parser_spark.job import main


@pytest.fixture(scope="module")
def slim_path(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    tpath, spath = str(root / "turns"), str(root / "slim")
    main(["gen", "-n", "2000", "-o", tpath])
    main(["parse", "-f", tpath, "-o", spath])
    return spath


def test_extract_grouped_json_document(slim_path, tmp_path):
    out = str(tmp_path / "by_tool.json")
    main(["extract", "-f", slim_path, "-o", out, "-g", "p",
          "--members", "--member-cap", "3", "-t", "json"])
    doc = json.load(open(out))  # must be VALID json (reference's isn't)
    assert doc["grouped_by"] == "podcast"
    # 20 tools + the malformed-row group (their key is the bare DJB2
    # seed 5381 = 0x1505 — the reference's NULL-key behavior)
    assert doc["total_groups"] == len(doc["groups"]) == 21
    assert "00001505" in doc["groups"]
    total = 0
    for key, g in doc["groups"].items():
        assert re.fullmatch(r"[0-9a-f]{8}", key), "F2: 8-hex group key"
        assert len(g["logs"]) <= 3, "member cap honored"
        assert g["count"] >= len(g["logs"])
        total += g["count"]
        for m in g["logs"]:
            assert re.fullmatch(r"[0-9a-f]{8}", m["ip_hash"])
            assert re.fullmatch(
                r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", m["ts"]
            ), "F1 timestamp shape"
    assert total == 2000


def test_extract_grouped_json_golden(slim_path, tmp_path):
    """golden-file pin of the exported document for the deterministic
    fixture (VERDICT r1 #8)."""
    out = str(tmp_path / "by_day.json")
    main(["extract", "-f", slim_path, "-o", out, "-g", "t",
          "--members", "--member-cap", "2", "-t", "json"])
    golden_path = os.path.join(
        os.path.dirname(__file__), "..", "golden", "grouped_by_day.json"
    )
    got = json.load(open(out))
    want = json.load(open(golden_path))
    assert got == want


def test_run_verbose_writes_lineage(spark, tmp_path, capsys):
    troot = str(tmp_path / "turns")
    out = str(tmp_path / "out")
    main(["gen", "-n", "1000", "-o", troot])
    main(["run", "-f", troot, "-o", out, "--run-id", "r1", "-v"])
    printed = capsys.readouterr().out
    assert "lineage (partition, rows, approx_bytes):" in printed
    lin = spark.read.parquet(os.path.join(out, "_lineage"))
    rows = lin.agg({"rows": "sum"}).collect()[0][0]
    assert rows == 1000, "lineage row counts must cover every slim row"


def test_grouped_export_json_max_groups_guard(spark):
    """VERDICT r2 #6: the driver-materialized export must refuse
    unbounded group counts instead of OOMing the driver."""
    from s3_log_parser_spark.operators.aggregate import grouped_export_json

    df = spark.range(100).withColumn("k", F.col("id") % 50)
    with pytest.raises(ValueError, match="max_groups"):
        grouped_export_json(df, "k", "fifty_groups", max_groups=10)
    # raising the cap succeeds
    doc = json.loads(
        grouped_export_json(df, "k", "fifty_groups", max_groups=50)
    )
    assert doc["total_groups"] == 50


def test_grouped_export_reserved_column_collision(spark):
    """Working columns must not silently collide with input columns."""
    from s3_log_parser_spark.operators.aggregate import grouped_export

    df = spark.range(10).withColumn("__s3lp_rn__", F.lit(1))
    with pytest.raises(ValueError, match="reserved working column"):
        grouped_export(df, "id", max_rows_per_group=2)
