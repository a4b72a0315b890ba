"""Docs-table sources: read the interleaved-span corpus, or derive one
deterministically from a plain documents table (doc_id, text, ...).

`derive_spans_from_documents` turns the driver's documents.parquet into the
input_hint shape (doc_id string, spans array<struct<kind,text,media_ref,
offset>>) with a deterministic link graph — used by __spark_entry__'s
flagship query so the frontier engine can run on driver-provided testdata
without synthesizing external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_of(doc_id_col, n_hosts: int = 7):
    host = F.concat(
        F.lit("h"),
        F.lpad((doc_id_col % n_hosts).cast("string"), 2, "0"),
        F.lit(".corpus.test"),
    )
    return F.concat(F.lit("https://"), host, F.lit("/p/"), doc_id_col.cast("string"))


def derive_spans_from_documents(
    documents: DataFrame, fanout: int = 3, n_hosts: int = 7
) -> DataFrame:
    """One spans-doc per documents row: a text span plus `fanout` a_href links
    to (doc_id*fanout + k + 1) mod N, all absolute URLs."""
    n = documents.count()
    d = documents.select(F.col("doc_id").cast("long").alias("did"), "text")
    spans = F.array(
        *(
            [
                F.struct(
                    F.lit("text").alias("kind"),
                    F.col("text").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ]
            + [
                F.struct(
                    F.lit("a_href").alias("kind"),
                    url_of((F.col("did") * fanout + k + 1) % n, n_hosts).alias("text"),
                    url_of((F.col("did") * fanout + k + 1) % n, n_hosts).alias("media_ref"),
                    F.lit(k + 1).alias("offset"),
                )
                for k in range(fanout)
            ]
        )
    )
    return d.select(url_of(F.col("did"), n_hosts).alias("doc_id"), spans.alias("spans"))


def derive_meta(docs_spans: DataFrame) -> DataFrame:
    """All-200 fetch metadata with deterministic pseudo-latency."""
    return docs_spans.select(
        "doc_id",
        F.lit(200).alias("status_code"),
        F.lit("text/html; charset=utf-8").alias("content_type_header"),
        F.lit(None).cast("string").alias("redirect_location"),
        F.length("doc_id").cast("long").alias("size"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(5000)) / F.lit(10.0)).alias("request_time_ms"),
    )
