"""As-of join vectors + plan shape (operators/asof.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

from siteone_crawler_spark.operators.asof import asof_join


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _t(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_most_recent_prior_match(spark):
    left = _ev(spark, [(10, _t("2024-01-01 10:00:00"), 1, 5.0)])
    right = _ev(
        spark,
        [
            (1, _t("2024-01-01 08:00:00"), 1, 1.0),
            (2, _t("2024-01-01 09:00:00"), 1, 2.0),  # most recent prior
            (3, _t("2024-01-01 11:00:00"), 1, 3.0),  # after: excluded
            (4, _t("2024-01-01 09:30:00"), 2, 4.0),  # other user
        ],
    )
    r = asof_join(left, right).first()
    assert r["matched_event_id"] == 2 and r["matched_value"] == 2.0


def test_equal_ts_matches_and_max_seq_wins(spark):
    ts = _t("2024-01-01 10:00:00")
    left = _ev(spark, [(10, ts, 1, 5.0)])
    right = _ev(spark, [(7, ts, 1, 7.0), (8, ts, 1, 8.0)])
    r = asof_join(left, right).first()
    # <= semantics: equal-ts right rows match; largest event_id wins the tie
    assert r["matched_event_id"] == 8


def test_no_prior_row_yields_null(spark):
    left = _ev(spark, [(10, _t("2024-01-01 08:00:00"), 1, 5.0)])
    right = _ev(spark, [(1, _t("2024-01-01 09:00:00"), 1, 1.0)])
    r = asof_join(left, right).first()
    assert r["matched_event_id"] is None and r["matched_value"] is None


def test_plan_single_exchange_no_join(spark):
    left = _ev(spark, [(i, _t("2024-01-01 10:00:00"), i % 3, 1.0) for i in range(9)])
    right = _ev(spark, [(100 + i, _t("2024-01-01 09:00:00"), i % 3, 2.0) for i in range(9)])
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union-window rewrite, not a join
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle total
