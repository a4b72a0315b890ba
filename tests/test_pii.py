"""PII scan/redact vectors — precision-first regex families (operators/pii.py).

The reference crawler has no PII surface; these ops are part of the
training-data superset. Vectors pin: per-family counts, non-overlap between
families (a phone is not an SSN, a card is not a phone), redaction order and
placeholders, null/empty handling, and density arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from siteone_crawler_spark.operators.pii import (
    PII_ORDER,
    pii_redact,
    pii_scan,
)

DOCS = [
    # doc_id, text, expected (n_email, n_cc, n_ssn, n_phone, n_ipv4)
    (0, "write to alice.smith+x@sub.example.org today", (1, 0, 0, 0, 0)),
    (1, "card 4111-1111-1111-1111 and 5500 0000 0000 0004", (0, 2, 0, 0, 0)),
    (2, "ssn 123-45-6789", (0, 0, 1, 0, 0)),
    (3, "call 555-123-4567", (0, 0, 0, 1, 0)),
    (4, "host 10.0.0.1 and 192.168.255.255", (0, 0, 0, 0, 2)),
    # families must not shadow each other
    (5, "555-123-4567 123-45-6789 4111-1111-1111-1111", (0, 1, 1, 1, 0)),
    # digits glued to a word char kill \b: neither the version string nor
    # the prefixed phone may match (precision-first)
    (6, "v1.2.3.4 is a version, x555-123-4567 no boundary", (0, 0, 0, 0, 0)),
    (7, "", (0, 0, 0, 0, 0)),
    (8, None, (0, 0, 0, 0, 0)),
    (9, "two mails: a@b.io c@d.co and 1.1.1.1", (2, 0, 0, 0, 1)),
]


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_pii_scan_vectors(spark):
    got = {
        r["doc_id"]: tuple(r[f"n_{k}"] for k in PII_ORDER)
        for r in pii_scan(_docs_df(spark)).collect()
    }
    for doc_id, _text, exp in DOCS:
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)


def test_pii_scan_total_and_density(spark):
    rows = {r["doc_id"]: r for r in pii_scan(_docs_df(spark)).collect()}
    for doc_id, text, exp in DOCS:
        r = rows[doc_id]
        assert r["pii_total"] == sum(exp)
        n = max(len(text or ""), 1)
        assert abs(r["pii_per_kchar"] - round(sum(exp) * 1000.0 / n, 6)) < 1e-9


def test_pii_redact_vectors(spark):
    got = {r["doc_id"]: r["redacted"] for r in pii_redact(_docs_df(spark)).collect()}
    assert got[0] == "write to <EMAIL> today"
    assert got[1] == "card <CC> and <CC>"
    assert got[5] == "<PHONE> <SSN> <CC>"
    assert got[7] == "" and got[8] == ""  # null -> empty, never null
    # no boundaries -> untouched
    assert got[6] == "v1.2.3.4 is a version, x555-123-4567 no boundary"


def test_pii_redact_subset_kinds(spark):
    df = _docs_df(spark).filter(F.col("doc_id") == 5)
    got = pii_redact(df, kinds=("ssn",)).collect()[0]["redacted"]
    assert got == "555-123-4567 <SSN> 4111-1111-1111-1111"


def test_pii_scan_plan_pure_codegen(spark):
    """pii_scan is one codegen'd projection: no Exchange anywhere in the
    plan (a 100 TB scan stays embarrassingly parallel), no Python."""
    df = pii_scan(_docs_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "*(" in plan  # whole-stage codegen span
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
