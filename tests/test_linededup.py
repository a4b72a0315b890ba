"""C4-style line-level boilerplate removal vectors + plan shape
(operators/linededup.py)."""

from __future__ import annotations

from siteone_crawler_spark.operators.linededup import (
    line_frequency,
    strip_boilerplate_lines,
)

DOCS = [
    (0, "unique zero\ncookie banner\nbody zero\n\nfooter text"),
    (1, "unique one\ncookie banner\nfooter text"),
    (2, "unique two\ncookie banner\nfooter text"),
    (3, "cookie banner"),            # all-boilerplate doc
    (4, ""),                          # empty doc
    (5, None),                        # null doc
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_line_frequency(spark):
    got = {r["line"]: r["n_docs"] for r in line_frequency(_df(spark)).collect()}
    assert got["cookie banner"] == 4
    assert got["footer text"] == 3
    assert got["unique zero"] == 1
    assert "" not in got  # empty lines never counted


def test_strip_boilerplate(spark):
    got = {r["doc_id"]: r["text"] for r in strip_boilerplate_lines(_df(spark), max_df=2).collect()}
    # 'cookie banner' (4 docs) and 'footer text' (3 docs) exceed max_df=2
    assert got[0] == "unique zero\nbody zero\n"  # empty line preserved in place
    assert got[1] == "unique one"
    assert got[2] == "unique two"
    assert got[3] == ""   # every line was boilerplate -> survives empty
    assert got[4] == ""   # empty doc round-trips
    assert got[5] == ""   # null doc -> ''
    assert len(got) == len(DOCS)  # no doc is ever dropped


def test_strip_boilerplate_threshold(spark):
    got = {r["doc_id"]: r["text"] for r in strip_boilerplate_lines(_df(spark), max_df=3).collect()}
    # footer (3 docs) now survives; cookie banner (4 docs) still dies
    assert got[1] == "unique one\nfooter text"


def test_strip_plan_antijoin_no_global_sort(spark):
    """Scale shape: boilerplate removal is a (broadcastable) LEFT ANTI join
    + per-doc array rebuild — never a global Sort over the exploded
    corpus."""
    df = strip_boilerplate_lines(_df(spark), max_df=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    # local SMJ sorts are fine; a GLOBAL sort (range partitioning) of the
    # exploded corpus is the anti-pattern the rebuild avoids
    assert "rangepartitioning" not in plan, plan
