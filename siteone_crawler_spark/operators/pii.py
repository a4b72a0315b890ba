"""PII detection / redaction for training-data pipelines — pure Catalyst.

Large-scale pretraining corpora are routinely scanned for (and scrubbed of)
personally identifiable information before use. These operators implement the
standard regex families as NATIVE Spark column expressions (regexp_count /
regexp_replace, JVM-side, whole-stage codegen — zero Python in the hot path),
so a 100 TB scan is one codegen'd projection over the text column with no
shuffle at all.

Every pattern is written in the conservative common subset of Java regex
(Spark) and RE2 (DuckDB): character classes, bounded repetition and \b word
boundaries only — no backreferences, no lookaround — so the driver's DuckDB
oracle can verify counts and redacted text bit-for-bit. Patterns are
deliberately precision-first (dashed NANP phones, dashed SSNs, 4x4 grouped
card numbers): at pretraining scale a false positive deletes good text
forever, while a missed exotic format is caught by the next pipeline pass.

The reference crawler has no PII surface (its analyzers stop at headers/DOM,
/root/reference/src/analysis/initiator.rs:99-146); this module is part of the
training-data superset the north rule asks for, alongside functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one source of truth for both the Spark expressions and the SQL oracle
# twins (__spark_entry__ interpolates these into DuckDB SQL verbatim)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # consistent separator per number (alternation, not [- ] at each gap:
    # mixed separators let one "card" span two adjacent unrelated numbers,
    # e.g. '...-6789 4111-...' — a measured false positive)
    "cc": r"\b[0-9]{4}(?:-[0-9]{4}){3}\b|\b[0-9]{4}(?: [0-9]{4}){3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
# redaction applies in this order (longest/most-specific first, so a card
# number is never half-eaten by the phone rule); scan order is irrelevant
# because the patterns are mutually non-overlapping by construction
PII_ORDER = ("email", "cc", "ssn", "phone", "ipv4")


def pii_count(col, kind: str) -> Column:
    """Occurrences of one PII family in a text column (native)."""
    return F.regexp_count(F.coalesce(col, F.lit("")), F.lit(PII_PATTERNS[kind]))


def redact_col(col, kinds: tuple[str, ...] = PII_ORDER) -> Column:
    """Text with each PII family replaced by a <KIND> placeholder."""
    out = F.coalesce(col, F.lit(""))
    for k in kinds:
        if k not in PII_PATTERNS:
            raise KeyError(f"unknown PII kind: {k}")
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document PII census: one count column per family + total +
    density per kilo-char. A single narrow projection — Catalyst prunes the
    scan to (id, text) and the whole thing runs inside one codegen stage."""
    counts = [pii_count(F.col(text_col), k).alias(f"n_{k}") for k in PII_ORDER]
    total = sum(F.col(f"n_{k}") for k in PII_ORDER).alias("pii_total")
    return (
        docs.select(F.col(id_col), F.length(F.coalesce(text_col, F.lit(""))).alias("__len"), *counts)
        .withColumn("pii_total", total)
        .withColumn(
            "pii_per_kchar",
            F.round(F.col("pii_total") * 1000.0 / F.greatest(F.col("__len"), F.lit(1)), 6),
        )
        .drop("__len")
    )


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               kinds: tuple[str, ...] = PII_ORDER) -> DataFrame:
    """Per-document redacted text (placeholders per family)."""
    return docs.select(
        F.col(id_col), redact_col(F.col(text_col), kinds).alias("redacted")
    )
