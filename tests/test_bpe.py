"""BPE merge-pair statistics vectors + plan shape (operators/bpe.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

from siteone_crawler_spark.operators.bpe import bpe_pair_stats, word_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pair_counts_hand_vector(spark):
    # corpus: "low low lower" -> wc: low=2, lower=1
    # pairs: lo(2)+lo(1)=3, ow(2)+ow(1)=3, we(1), er(1)
    docs = _docs(spark, [(1, "low low lower")])
    got = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in bpe_pair_stats(docs, min_count=1).collect()
    }
    assert got == {("l", "o"): 3, ("o", "w"): 3, ("w", "e"): 1, ("e", "r"): 1}


def test_overlapping_occurrences_counted_per_position(spark):
    # "aaa" contains the pair "aa" TWICE per occurrence (positions 1 and 2)
    docs = _docs(spark, [(1, "aaa aaa b")])
    got = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in bpe_pair_stats(docs, min_count=1).collect()
    }
    assert got == {("a", "a"): 4}  # 2 positions x wc(aaa)=2; "b" has no pair


def test_min_count_filters(spark):
    docs = _docs(spark, [(1, "ab ab cd")])
    got = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in bpe_pair_stats(docs, min_count=2).collect()
    }
    assert got == {("a", "b"): 2}


def test_word_counts_normalizes(spark):
    docs = _docs(spark, [(1, "The THE the!"), (2, "")])
    got = {r["word"]: r["wc"] for r in word_counts(docs).collect()}
    assert got == {"the": 3}


def test_plan_is_pure_codegen_two_aggregates(spark):
    """The tokenizer loop must stay JVM-side: no Python evaluation in the
    plan, and the pair pass aggregates the vocabulary — two HashAggregate
    chains, no join."""
    docs = _docs(spark, [(i, "alpha beta alpha") for i in range(4)])
    plan = (
        bpe_pair_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "HashAggregate" in plan
    assert "Join" not in plan
