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


def spans_from_html(
    html_docs: DataFrame,
    initial_host: str = "",
    flags=None,
    include_text: bool = False,
) -> DataFrame:
    """Live extraction source (F4-F7): (doc_id, content_type, body) ->
    (doc_id, spans) via the ContentProcessor pandas UDF. This is the path a
    real deployment uses — the fetch layer lands raw bodies, extraction
    derives the spans table, the engine crawls it.

    Scale: the UDF is one Arrow exchange per partition; repartition upstream
    if the fetch join coalesced (see engine.py AQE note)."""
    from ..operators.extract import ExtractFlags, make_extract_spans_udf

    udf = make_extract_spans_udf(
        initial_host, flags or ExtractFlags(), include_text=include_text
    )
    return html_docs.select(
        "doc_id",
        udf(F.col("doc_id"), F.col("content_type"), F.col("body")).alias("spans"),
    )


def html_docs_with_meta(html_docs: DataFrame) -> DataFrame:
    """F8 companion: meta columns (title/description/keywords/dom_count)
    extracted from HTML bodies."""
    from ..operators.extract import make_meta_udf

    m = make_meta_udf()
    return html_docs.withColumn("__m", m(F.col("body"))).select(
        "doc_id",
        F.col("__m.title").alias("title"),
        F.col("__m.description").alias("description"),
        F.col("__m.keywords").alias("keywords"),
        F.col("__m.dom_count").alias("dom_count"),
    )


CACHE_CONTROL_VARIANTS = (
    "public, max-age=3600",
    "private, no-cache",
    "max-age=86400, immutable",
    "no-store",
    "public, s-maxage=7200, stale-while-revalidate=60",
)

CONTENT_TYPE_VARIANTS = (
    "text/html; charset=utf-8",
    "text/css",
    "application/javascript",
    "image/webp",
    "application/json",
)


def derive_visited_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic visited-shaped table from the driver's documents table —
    the analyzer-query input for the correctness gate. Every column is pure
    arithmetic on doc_id/n_chars (mirrored 1:1 by DuckDB SQL in
    __spark_entry__.oracle_sql), so the oracle independently reconstructs
    the rows while the Spark side exercises the REAL header kernel
    (functions/headers.cache_flags_expr) and analyzer operators."""
    from ..functions.headers import (
        NOT_AVAILABLE,
        cache_flags_expr,
        cache_lifetime_expr,
    )

    did = F.col("doc_id").cast("long")
    host = F.concat(
        F.lit("h"), F.lpad((did % 7).cast("string"), 2, "0"), F.lit(".corpus.test")
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), did.cast("string"))
    status = (
        F.when(did % 10 == 7, 404)
        .when(did % 10 == 8, 301)
        .when(did % 10 == 9, -1)
        .otherwise(200)
    )
    cth = F.element_at(
        F.array(*[F.lit(v) for v in CONTENT_TYPE_VARIANTS]), (did % 5 + 1).cast("int")
    )
    size = (F.col("n_chars").cast("long") * 3 + did % 100).cast("long")
    rt = (did * 37 % 50000) / F.lit(10.0)
    cc = F.when(
        did % 3 != 0,
        F.element_at(
            F.array(*[F.lit(v) for v in CACHE_CONTROL_VARIANTS]), (did % 5 + 1).cast("int")
        ),
    )
    headers = F.map_filter(
        F.map_concat(
            F.create_map(F.lit("content-type"), cth),
            F.create_map(F.lit("content-length"), size.cast("string")),
            F.create_map(F.lit("cache-control"), cc),
            F.create_map(
                F.lit("expires"),
                F.when(did % 4 == 1, F.lit("Thu, 01 Jan 2026 00:00:00 GMT")),
            ),
            F.create_map(
                F.lit("etag"), F.when(did % 2 == 0, F.concat(F.lit('"e'), did, F.lit('"')))
            ),
            F.create_map(
                F.lit("last-modified"),
                F.when(did % 5 < 2, F.lit("Wed, 01 Jan 2025 00:00:00 GMT")),
            ),
            F.create_map(
                F.lit("content-encoding"), F.when(did % 7 == 2, F.lit("br"))
            ),
            F.create_map(
                F.lit("age"), F.when(did % 6 == 0, (did * 13 % 1000).cast("string"))
            ),
        ),
        lambda _, v: v.isNotNull(),
    )
    v = documents.select(
        url.alias("url"),
        F.substring(F.md5(url), 1, 8).alias("uq_id"),
        host.alias("host"),
        status.cast("int").alias("status_code"),
        cth.alias("content_type_header"),
        size.alias("size"),
        rt.alias("request_time_ms"),
        F.when(status > 0, headers).alias("headers"),
        did.alias("seq"),
        F.lit("").alias("source_uq_id"),
        F.lit(10).alias("source_attr"),
        F.lit(0).alias("wave"),
    )
    return v.withColumn(
        "cache_type_flags",
        F.when(F.col("status_code") <= 0, F.lit(NOT_AVAILABLE))
        .otherwise(cache_flags_expr(F.col("headers")))
        .cast("int"),
    ).withColumn(
        "cache_lifetime",
        F.when(F.col("status_code") > 0, cache_lifetime_expr(F.col("headers"))),
    )


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
