"""Span-sequence operators — the north-rule per-row invariant.

BASELINE.json input_hint: "per-row invariant vs the reference: span-sequence
equality (kind, text, media_ref, order)". The reference's markdown exporter
(/root/reference/src/export/markdown_exporter.rs, html_to_markdown.rs:18-235)
emits text + inline media refs in document order; the spans column is that
interleaving, and these operators verify/fingerprint it.

All native: sort by offset inside the array (array_sort on a re-keyed
struct), fingerprint via md5 over a canonical text join — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: absent from span text, keeps md5 unambiguous


def ordered_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans sorted by offset, with offsets stripped) — the
    canonical (kind, text, media_ref, order) sequence."""
    sorted_spans = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return docs.select(
        "doc_id",
        F.transform(
            sorted_spans,
            lambda s: F.struct(s["kind"], s["text"], s["media_ref"]),
        ).alias("seq"),
    )


def span_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, n_spans, sig): sig = md5 over SEP-joined kind/text/media_ref
    in offset order — the cheap comparable form of the invariant."""
    seq = ordered_spans(docs)
    joined = F.array_join(
        F.transform(
            "seq",
            lambda s: F.concat_ws(SEP, s["kind"], s["text"], s["media_ref"]),
        ),
        SEP,
    )
    return seq.select(
        "doc_id",
        F.size("seq").alias("n_spans"),
        F.md5(joined).alias("sig"),
    )


def span_parity_violations(docs: DataFrame, expected: DataFrame) -> DataFrame:
    """Rows whose span sequence differs from the expected table
    (doc_id, spans) — empty DataFrame == invariant holds."""
    a = span_signature(docs).withColumnRenamed("sig", "sig_a").withColumnRenamed(
        "n_spans", "n_a"
    )
    b = span_signature(expected).withColumnRenamed("sig", "sig_b").withColumnRenamed(
        "n_spans", "n_b"
    )
    return (
        a.join(b, "doc_id", "full")
        .filter(
            F.col("sig_a").isNull()
            | F.col("sig_b").isNull()
            | (F.col("sig_a") != F.col("sig_b"))
        )
        .select("doc_id", "n_a", "n_b", "sig_a", "sig_b")
    )
