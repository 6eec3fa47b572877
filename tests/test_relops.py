"""Tests for relops: gap sessionization and the as-of join."""

import datetime as dt

from pyspark.sql import functions as F

from webextract.relops import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


def test_sessionize_gap_boundary(spark):
    # gap = 10 minutes; exactly-10min gap stays in session (> gap splits)
    rows = [(1, 100, _ts(0)), (2, 100, _ts(10)), (3, 100, _ts(20, 1)),
            (4, 200, _ts(0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap="10 minutes").collect()}
    assert got[1] == 1 and got[2] == 1   # 10:00 gap == gap → same session
    assert got[3] == 2                   # 10:00.000001 gap > gap → new one
    assert got[4] == 1                   # other user independent


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(30)), (3, 200, _ts(5))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts(5)), (12, 100, _ts(10)), (13, 300, _ts(0))],
        "event_id long, user_id long, ts timestamp")
    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_payload=["event_id"])
    got = {r["event_id"]: (r["asof_event_id"], r["asof_ts"])
           for r in out.collect()}
    assert got[1] == (11, _ts(5))      # same-instant right row matches
    assert got[2] == (12, _ts(10))     # greatest right ts <= left ts
    assert got[3] == (None, None)      # no right rows for this key
    assert len(got) == 3               # every left row survives (left join)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 100, _ts(60))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(11, 100, _ts(0))],
                                  "event_id long, user_id long, ts timestamp")
    fresh = asof_join(left, right, key="user_id", left_ts="ts",
                      right_payload=["event_id"],
                      tolerance_us=3600 * 1_000_000).collect()[0]
    stale = asof_join(left, right, key="user_id", left_ts="ts",
                      right_payload=["event_id"],
                      tolerance_us=3599 * 1_000_000).collect()[0]
    assert fresh["asof_event_id"] == 11      # 60 min lag within 1h tolerance
    assert stale["asof_event_id"] is None    # voided past tolerance


def test_asof_join_single_exchange_on_key(spark):
    left = spark.createDataFrame([(1, 100, _ts(1))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(11, 100, _ts(0))],
                                  "event_id long, user_id long, ts timestamp")
    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_payload=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange keyed on user_id for the window; no join node at all
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Join" not in plan


def test_range_join_boundaries(spark):
    from webextract.relops import range_join

    left = spark.createDataFrame([(1, 100, _ts(0))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts(0)),            # same instant: included (gap 0)
         (12, 100, _ts(60)),           # exactly at window edge: included
         (13, 100, _ts(60, 1)),        # 1 us past: excluded
         (14, 100, _ts(-1)),           # before left: excluded
         (15, 200, _ts(30))],          # other key: excluded
        "event_id long, user_id long, ts timestamp")
    out = range_join(left, right, key="user_id", left_ts="ts", right_ts="ts",
                     window_us=3_600_000_000)  # 60 minutes in us
    got = sorted(r["r_event_id"] for r in out.collect())
    assert got == [11, 12]


def test_range_join_is_equi_join_plan(spark):
    from webextract.relops import range_join

    left = spark.createDataFrame([(1, 100, _ts(0))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(11, 100, _ts(1))],
                                  "event_id long, user_id long, ts timestamp")
    out = range_join(left, right, key="user_id", left_ts="ts", right_ts="ts",
                     window_us=3_600_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # hash/sort-merge EQUI join on (_k, _b); never BroadcastNestedLoop
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_null_payload_field_stays_with_matched_row(spark):
    from webextract.relops import asof_join

    # the matched (latest) right row has a NULL payload value; a per-column
    # last(ignorenulls) would back-fill it from the OLDER row — the carried
    # struct must keep the matched row's NULL
    left = spark.createDataFrame([(1, 100, _ts(30))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts(10), 5.0), (12, 100, _ts(20), None)],
        "event_id long, user_id long, ts timestamp, val double")
    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_payload=["event_id", "val"]).collect()[0]
    assert out["asof_event_id"] == 12 and out["asof_ts"] == _ts(20)
    assert out["asof_val"] is None   # NOT 5.0 from the older row


def test_salted_join_equals_plain_join(spark):
    from webextract.relops import salted_join

    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(200)],
        "id long, k string")
    right = spark.createDataFrame([("hot", 1), ("unmatched", 9)],
                                  "k string, w int")
    plain = {(r["id"], r["w"]) for r in
             left.join(right, "k").select("id", "w").collect()}
    salted = {(r["id"], r["w"]) for r in
              salted_join(left, right, key="k", salt=8)
              .select("id", "w").collect()}
    assert salted == plain and len(plain) == 180
    # left join keeps unmatched left rows exactly once
    lj = salted_join(left, right, key="k", salt=8, how="left")
    assert lj.count() == 200
    assert lj.filter(F.col("w").isNull()).count() == 20


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    from webextract.relops import salted_join

    left = spark.createDataFrame([(1, "a")], "id long, k string")
    right = spark.createDataFrame([("a", 1)], "k string, w int")
    # "outer" is Spark's alias for FULL outer — must be rejected too
    for how in ("right", "full", "full_outer", "rightouter", "outer",
                "OUTER", "fullouter"):
        with pytest.raises(ValueError, match="salt"):
            salted_join(left, right, key="k", how=how)
