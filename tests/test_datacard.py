"""Corpus data-card vectors + plan shape (operators/datacard.py).
Value parity vs the DuckDB oracle is certified by tests/test_entry_oracle.py."""

from siteone_crawler_spark.operators.datacard import corpus_datacard


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")


def test_counts_tokens_and_cross_source_dups(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "en", "hello world"),      # dup of doc 4 (in source b)
            (2, "a", "en", "one two three"),
            (3, "a", "fr", "bonjour"),
            (4, "b", "de", "hello world"),      # dup of doc 1
            (5, "b", "de", "unique text here"),
        ],
    )
    out = {r["source"]: r for r in corpus_datacard(docs).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 3 and a["total_tokens"] == 2 + 3 + 1
    assert b["n_docs"] == 2 and b["total_tokens"] == 2 + 3
    # the duplicate pair spans sources: each side counts its copy
    assert a["n_dup_docs"] == 1 and b["n_dup_docs"] == 1
    assert a["top_lang"] == "en" and b["top_lang"] == "de"


def test_lang_mode_tiebreak_is_lexicographic(spark):
    docs = _docs(
        spark,
        [(1, "s", "fr", "x"), (2, "s", "en", "y"), (3, "s", "de", "z w")],
    )
    r = corpus_datacard(docs).first()
    assert r["top_lang"] == "de"  # all counts 1 -> smallest lang wins


def test_plan_no_python_and_windowgrouplimit(spark):
    docs = _docs(spark, [(i, f"s{i % 3}", "en", f"w{i} common") for i in range(30)])
    plan = corpus_datacard(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "WindowGroupLimit" in plan  # language mode is a partial top-1
