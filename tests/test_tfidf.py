"""TF-IDF top-k vectors + plan shape (operators/tfidf.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

import math

from siteone_crawler_spark.operators.tfidf import tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_vector_scores_and_ranks(spark):
    # N=2; "cat" df=1, "the" df=2
    docs = _docs(spark, [(1, "the cat the"), (2, "the dog")])
    out = {
        (r["doc_id"], r["term"]): (r["score"], r["rank"])
        for r in tfidf_topk(docs, k=2).collect()
    }
    idf_cat = math.log(3 / 2) + 1.0
    idf_the = math.log(3 / 3) + 1.0  # = 1.0
    assert out[(1, "the")][0] == round(2 * idf_the, 6)
    assert out[(1, "cat")][0] == round(1 * idf_cat, 6)
    # cat (1.405) beats the (2.0)? no: tf=2 the=2.0 > cat=1.405
    assert out[(1, "the")][1] == 1 and out[(1, "cat")][1] == 2


def test_k_limits_and_term_tiebreak(spark):
    # all terms unique in one doc -> identical scores; rank order = term asc
    docs = _docs(spark, [(1, "delta alpha charlie bravo")])
    out = sorted(
        (r["rank"], r["term"]) for r in tfidf_topk(docs, k=3).collect()
    )
    assert out == [(1, "alpha"), (2, "bravo"), (3, "charlie")]


def test_empty_doc_emits_nothing(spark):
    docs = _docs(spark, [(1, ""), (2, "word")])
    rows = tfidf_topk(docs, k=5).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_plan_windowgrouplimit_and_broadcast_idf(spark):
    docs = _docs(spark, [(i, f"alpha beta w{i}") for i in range(20)])
    plan = tfidf_topk(docs, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial top-k before the exchange
    assert "BroadcastHashJoin" in plan  # idf table broadcast, no 2nd shuffle
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
