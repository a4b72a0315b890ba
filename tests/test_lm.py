"""Unigram LM cross-entropy vectors + plan shape (operators/lm.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

import math

from siteone_crawler_spark.operators.lm import lm_cross_entropy, unigram_logprobs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logprobs_hand_vector(spark):
    # ref tokens: a a b -> N=3, V=2, denom = 3 + 1*(2+1) = 6
    # p(a) = 3/6, p(b) = 2/6, p(unk) = 1/6
    ref = _docs(spark, [(1, "a a b")])
    lp, unk = unigram_logprobs(ref)
    got = {r["tok"]: r["logp"] for r in lp.collect()}
    assert math.isclose(got["a"], math.log(3 / 6))
    assert math.isclose(got["b"], math.log(2 / 6))
    assert math.isclose(unk, math.log(1 / 6))


def test_xent_scores_in_domain_lower(spark):
    ref = _docs(spark, [(9, "the cat sat on the mat")])
    docs = _docs(
        spark,
        [(1, "the cat sat"), (2, "zzz qqq xxx"), (3, "")],
    )
    out = {r["doc_id"]: r for r in lm_cross_entropy(docs, ref).collect()}
    assert out[1]["xent"] < out[2]["xent"]  # in-domain beats junk
    assert out[3]["n_tokens"] == 0 and out[3]["xent"] == 0.0
    # doc 2 is pure UNK: xent = -log p_unk exactly
    # ref: N=6, V=5 -> denom 12, p_unk = 1/12
    assert math.isclose(out[2]["xent"], -math.log(1 / 12), rel_tol=1e-5)


def test_mixed_doc_exact_value(spark):
    # ref "a a b": p(a)=1/2, p(b)=1/3, p(unk)=1/6
    ref = _docs(spark, [(9, "a a b")])
    docs = _docs(spark, [(1, "a b z")])
    r = lm_cross_entropy(docs, ref).first()
    want = -(math.log(1 / 2) + math.log(1 / 3) + math.log(1 / 6)) / 3
    assert r["n_tokens"] == 3 and math.isclose(r["xent"], round(want, 6), abs_tol=1e-6)


def test_plan_broadcasts_vocab_no_python(spark):
    ref = _docs(spark, [(9, "alpha beta gamma alpha")])
    docs = _docs(spark, [(i, "alpha beta") for i in range(6)])
    plan = (
        lm_cross_entropy(docs, ref)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
