"""Gap-based sessionization: boundary semantics + summary stats."""

from datetime import datetime

from pyspark.sql import functions as F

from s3_log_parser_spark.operators.sessions import session_stats, sessionize


def test_sessionize_gap_boundary(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0)),
        (2, 1, datetime(2024, 1, 1, 0, 30, 0)),          # gap == 1800s
        (3, 1, datetime(2024, 1, 1, 1, 0, 0, 1)),        # gap 1800s + 1µs
        (4, 2, datetime(2024, 1, 1, 0, 0, 0)),           # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df).select("event_id", "session_idx").collect()
    }
    assert got[1] == 0 and got[2] == 0  # exactly-1800s gap: same session
    assert got[3] == 1                  # 1µs beyond: new session
    assert got[4] == 0                  # sessions are per-user

    stats = {r["user_id"]: r for r in session_stats(df).collect()}
    assert stats[1]["n_sessions"] == 2
    assert stats[1]["n_events"] == 3
    assert stats[1]["max_session_events"] == 2
    assert stats[1]["total_span_sec"] == 1800  # second session span 0
    assert stats[2]["n_sessions"] == 1
