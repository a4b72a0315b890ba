"""Decontamination vectors + plan shape (operators/decontam.py)."""

from __future__ import annotations

from siteone_crawler_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
)

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),      # shares 3-grams
    (1, "a completely different sentence about spark jobs"),  # clean
    (2, "quick brown fox jumps high above everything else"),  # shares
    (3, "the quick brown cat sleeps"),                        # 'the quick brown'
    (4, "tiny"),                                              # < n tokens
]
EVAL = [
    (100, "watch the quick brown fox jumps over fences"),
]


def _dfs(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    e = spark.createDataFrame(EVAL, "doc_id long, text string")
    return t, e


def test_contamination_counts(spark):
    t, e = _dfs(spark)
    got = {r["doc_id"]: r["n_overlap"] for r in ngram_contamination(t, e, n=3).collect()}
    # eval 3-grams: {watch the quick, the quick brown, quick brown fox,
    #                brown fox jumps, fox jumps over, jumps over fences}
    assert got[0] == 4  # the quick brown / quick brown fox / brown fox jumps / fox jumps over
    assert got[2] == 2  # quick brown fox / brown fox jumps
    assert got[3] == 1  # the quick brown
    assert 1 not in got and 4 not in got  # clean + too-short never appear


def test_decontaminate_removes_flagged(spark):
    t, e = _dfs(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(t, e, n=3).collect())
    assert kept == [1, 4]
    # higher threshold keeps the lightly-contaminated docs
    kept2 = sorted(r["doc_id"] for r in decontaminate(t, e, n=3, min_overlap=3).collect())
    assert kept2 == [1, 2, 3, 4]


def test_contamination_plan_broadcasts_eval(spark):
    """The (small) eval shingle set must sit on the broadcast side so the
    exploded train side reaches the join map-side, and no full-corpus
    shuffle may run BEFORE the join (only matched shingles shuffle, in the
    count-distinct aggregate after it)."""
    t, e = _dfs(spark)
    df = ngram_contamination(t, e, n=3)
    df.collect()  # finalize the AQE plan before reading it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    join_pos = plan.index("BroadcastHashJoin")
    # the train-side Generate (explode) below the join must not sit under
    # a hashpartitioning Exchange of the exploded columns
    below = plan[join_pos:]
    gen_pos = below.index("Generate explode")
    assert "Exchange hashpartitioning" not in below[:gen_pos], below[:gen_pos]
