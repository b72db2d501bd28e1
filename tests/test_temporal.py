"""As-of join and session windows (operators/temporal.py)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from augdiff_pipeline_spark.operators.temporal import asof_join, sessionize

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_basic_ties_and_missing(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [7, 7, 7, 9],
                "ts": [m(10), m(20), m(5), m(10)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [7, 7, 7, 8],
                "ts": [m(8), m(20), m(25), m(1)],
                "quote": [1.0, 2.0, 3.0, 9.0],
            }
        )
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_quote"])
        for r in asof_join(left, right, ["user_id"], "ts", ["quote"]).collect()
    }
    assert got[1] == (m(8), 1.0)      # latest quote at or before ts
    assert got[2] == (m(20), 2.0)     # tie: right row at exactly left.ts matches
    assert 3 not in got               # no quote before m(5) → dropped (inner)
    assert 4 not in got               # user 9 has no quotes at all


def test_asof_join_matches_duckdb(spark):
    import duckdb

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    got = {
        (r["event_id"], r["asof_ts"])
        for r in asof_join(purchases, clicks, ["user_id"], "ts", []).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = set(
        con.execute(
            """
        SELECT p.event_id, c.ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
        ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type='click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """
        ).fetchall()
    )
    assert got == want and len(got) > 10


def test_sessionize_gap_semantics(spark):
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 1, 2],
            # user 1: 0,10,40 chain (gap of exactly 30 MERGES — Spark
            # session_window is inclusive at the boundary); 40→71 is a
            # 31-minute gap → new session
            "ts": [m(0), m(10), m(40), m(71), m(80), m(0)],
        }
    )
    got = (
        sessionize(spark.createDataFrame(rows), "user_id", "ts", "30 minutes")
        .orderBy("user_id", "session_start")
        .collect()
    )
    u1 = [r for r in got if r["user_id"] == 1]
    assert [(r["session_start"], r["n_events"]) for r in u1] == [(m(0), 3), (m(71), 2)]
    assert u1[0]["session_end"] == m(70)   # last event (40) + 30min gap
    assert u1[1]["session_end"] == m(110)  # last event (80) + 30min gap
    assert len([r for r in got if r["user_id"] == 2]) == 1


def test_asof_join_null_carried_column_stays_one_row(spark):
    """A right row with a genuine NULL in one carried column must NOT be
    stitched together with an older row's value for that column — all
    carried values come from the single matched as-of row."""
    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "user_id": [7], "ts": [m(30)]})
    )
    right = (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [7, 7],
                    "ts": [m(10), m(20)],
                    "quote": [1.0, None],
                    "venue": ["A", "B"],
                }
            )
        )
        .withColumn("quote", F.col("quote").cast("double"))
    )
    rows = asof_join(left, right, ["user_id"], "ts", ["quote", "venue"]).collect()
    assert len(rows) == 1
    r = rows[0]
    # matched row is the m(20) one: quote must be NULL (not back-filled
    # from the m(10) row), venue must be B
    assert r["asof_ts"] == m(20) and r["asof_venue"] == "B" and r["asof_quote"] is None
