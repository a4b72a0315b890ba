"""Bucketized range-join vectors + plan shape (operators/rangejoin.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

import datetime

from siteone_crawler_spark.operators.rangejoin import range_join


def _t(s):
    return datetime.datetime.fromisoformat(s)


def _points(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def _ivals(spark, rows):
    return spark.createDataFrame(
        rows, "ival_id long, user_id long, start timestamp, end timestamp"
    )


def test_halfopen_boundaries(spark):
    iv = _ivals(spark, [(1, 7, _t("2024-01-01 10:00:00"), _t("2024-01-01 11:00:00"))])
    pts = _points(
        spark,
        [
            (1, _t("2024-01-01 09:59:59"), 7),  # before: out
            (2, _t("2024-01-01 10:00:00"), 7),  # == start: IN
            (3, _t("2024-01-01 10:30:00"), 7),  # inside: IN
            (4, _t("2024-01-01 11:00:00"), 7),  # == end: out (exclusive)
            (5, _t("2024-01-01 10:30:00"), 8),  # other user: out
        ],
    )
    got = sorted(r["event_id"] for r in range_join(pts, iv).collect())
    assert got == [2, 3]


def test_interval_spanning_many_buckets(spark):
    # 5-hour interval with a tiny bucket: the match must still be found
    # exactly once even though the interval explodes into many buckets
    iv = _ivals(spark, [(1, 7, _t("2024-01-01 00:00:00"), _t("2024-01-01 05:00:00"))])
    pts = _points(spark, [(1, _t("2024-01-01 04:59:59"), 7)])
    rows = range_join(pts, iv, bucket_seconds=60).collect()
    assert len(rows) == 1 and rows[0]["ival_id"] == 1


def test_multiple_overlapping_intervals_all_match(spark):
    iv = _ivals(
        spark,
        [
            (1, 7, _t("2024-01-01 10:00:00"), _t("2024-01-01 12:00:00")),
            (2, 7, _t("2024-01-01 10:30:00"), _t("2024-01-01 11:00:00")),
            (3, 7, _t("2024-01-01 10:45:00"), _t("2024-01-01 10:45:00")),  # empty
        ],
    )
    pts = _points(spark, [(1, _t("2024-01-01 10:45:00"), 7)])
    got = sorted(r["ival_id"] for r in range_join(pts, iv).collect())
    assert got == [1, 2]  # the empty interval matches nothing


def test_plan_equijoin_never_nested_loop(spark):
    iv = _ivals(
        spark,
        [(i, i % 3, _t("2024-01-01 10:00:00"), _t("2024-01-01 11:00:00")) for i in range(9)],
    )
    pts = _points(spark, [(i, _t("2024-01-01 10:30:00"), i % 3) for i in range(9)])
    plan = range_join(pts, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan  # a real equi-join