"""Post-crawl analyzer queries — thin DataFrame aggregations.

Each function mirrors one analyzer SuperTable from the reference
(/root/reference/src/analysis/* — registration list
src/engine/initiator.rs:99-146; shared pattern: scan visited -> filter ->
group -> aggregate -> sort -> limit, src/analysis/manager.rs:79-123).
They take the engine's `visited`/`skipped` tables (engine.py schemas) and
return presentation-ready DataFrames. All pure Catalyst — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_content_type(col) -> F.Column:
    """Header substring -> 12-way class (reference ContentTypeId,
    src/types.rs:109-124; detection crawler.rs:1557-1596)."""
    c = F.lower(F.coalesce(col, F.lit("")))
    return (
        F.when(c.contains("text/html"), "html")
        .when(c.contains("javascript"), "script")
        .when(c.contains("text/css"), "stylesheet")
        .when(c.startswith("image/"), "image")
        .when(c.startswith("audio/"), "audio")
        .when(c.startswith("video/"), "video")
        .when(c.contains("font"), "font")
        .when(c.contains("json"), "json")
        .when(c.contains("xml"), "xml")
        .when(c.contains("pdf") | c.contains("msword") | c.contains("officedocument"), "document")
        .when(c == "", "unknown")
        .otherwise("other")
    )


def basic_stats(visited: DataFrame) -> DataFrame:
    """A1 (basic_stats.rs:70-128): global totals incl. exact p90 of
    HTML-200 request times (nearest-rank via percentile)."""
    html200 = (F.col("status_code") == 200) & (
        classify_content_type(F.col("content_type_header")) == "html"
    )
    return visited.agg(
        F.count("*").alias("total_urls"),
        F.sum("size").alias("total_size"),
        F.round(F.sum("request_time_ms"), 3).alias("total_time_ms"),
        F.round(F.avg("request_time_ms"), 3).alias("avg_time_ms"),
        F.round(F.min("request_time_ms"), 3).alias("min_time_ms"),
        F.round(F.max("request_time_ms"), 3).alias("max_time_ms"),
        F.round(
            F.percentile(F.when(html200, F.col("request_time_ms")), F.lit(0.9)), 3
        ).alias("p90_html_ms"),
    )


def count_by_status(visited: DataFrame) -> DataFrame:
    return visited.groupBy("status_code").agg(F.count("*").alias("n")).orderBy("status_code")


def content_type_stats(visited: DataFrame) -> DataFrame:
    """A2 (content_type_analyzer.rs:36-130): per-class counts, sizes, times
    and status buckets."""
    ct = classify_content_type(F.col("content_type_header"))
    sc = F.col("status_code")
    return (
        visited.withColumn("content_type", ct)
        .groupBy("content_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("size").alias("total_size"),
            F.round(F.sum("request_time_ms"), 3).alias("total_time_ms"),
            F.round(F.avg("request_time_ms"), 3).alias("avg_time_ms"),
            F.sum(F.when(sc.between(200, 299), 1).otherwise(0)).alias("s2xx"),
            F.sum(F.when(sc.between(300, 399), 1).otherwise(0)).alias("s3xx"),
            F.sum(F.when(sc.between(400, 499), 1).otherwise(0)).alias("s4xx"),
            F.sum(F.when(sc.between(500, 599), 1).otherwise(0)).alias("s5xx"),
            F.sum(F.when(sc < 0, 1).otherwise(0)).alias("s_err"),
        )
        .orderBy(F.desc("n"), "content_type")
    )


def source_domain_stats(visited: DataFrame) -> DataFrame:
    """A4 (source_domains_analyzer.rs:36-66): (host, content_type) matrix."""
    ct = classify_content_type(F.col("content_type_header"))
    return (
        visited.withColumn("content_type", ct)
        .groupBy("host", "content_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("size").alias("total_size"),
            F.round(F.avg("request_time_ms"), 3).alias("avg_time_ms"),
        )
        .orderBy("host", "content_type")
    )


def skipped_summary(skipped: DataFrame) -> DataFrame:
    """A7 (skipped_urls_analyzer.rs:66-95): (reason, domain) counts."""
    domain = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    return (
        skipped.withColumn("domain", domain)
        .groupBy("reason", "domain")
        .agg(F.count("*").alias("n"))
        .orderBy("reason", "domain")
    )


def external_links(skipped: DataFrame) -> DataFrame:
    """A8 (external_links_analyzer.rs:39-70): NotAllowedHost URLs with counts
    and (capped, sorted) source pages."""
    return (
        skipped.filter(F.col("reason") == 1)
        .groupBy("url")
        .agg(
            F.count("*").alias("n"),
            F.slice(F.sort_array(F.collect_set("source_uq_id")), 1, 5).alias("sources"),
        )
        .orderBy(F.desc("n"), "url")
    )


def top_slowest(visited: DataFrame, k: int = 20, min_time_ms: float = 0.0) -> DataFrame:
    """W1 (slowest_analyzer.rs:49-67): TakeOrderedAndProject, not a sort."""
    return (
        visited.filter(
            (F.col("status_code") == 200) & (F.col("request_time_ms") >= min_time_ms)
        )
        .select("url", "request_time_ms")
        .orderBy(F.desc("request_time_ms"), F.asc("url"))
        .limit(k)
    )


def top_fastest(visited: DataFrame, k: int = 20, max_time_ms: float = 1000.0) -> DataFrame:
    """W2 (fastest_analyzer.rs:15-40)."""
    return (
        visited.filter(
            (F.col("status_code") == 200) & (F.col("request_time_ms") <= max_time_ms)
        )
        .select("url", "request_time_ms")
        .orderBy(F.asc("request_time_ms"), F.asc("url"))
        .limit(k)
    )


def redirects_list(visited: DataFrame) -> DataFrame:
    """A9 (redirects_analyzer.rs:35-46): 301-308 rows + their targets (the
    target is the visited row whose source_uq_id points back, J3 join)."""
    red = visited.filter(F.col("status_code").between(301, 308)).select(
        "url", "uq_id", "status_code", "seq"
    )
    tgt = visited.select(
        F.col("source_uq_id").alias("uq_id"),
        F.col("url").alias("target_url"),
        F.col("source_attr").alias("tattr"),
    ).filter(F.col("tattr") == 80)
    return (
        red.join(tgt, "uq_id", "left")
        .select("url", "status_code", "target_url", "seq")
        .orderBy("seq")
    )


def errors_list(visited: DataFrame, status: int = 404) -> DataFrame:
    """A10 (page404_analyzer.rs:35-43) generalized to any status; includes the
    source page via the J3 self-join on uq_id."""
    src = visited.select(
        F.col("uq_id").alias("source_uq_id"), F.col("url").alias("source_url")
    )
    return (
        visited.filter(F.col("status_code") == status)
        .join(F.broadcast(src), "source_uq_id", "left")
        .select("url", "status_code", "source_url", "seq")
        .orderBy("seq")
    )


def caching_stats(visited: DataFrame, by: str = "domain") -> DataFrame:
    """A5 (caching_analyzer.rs:244-330): cache-type-label stats per domain /
    content type / (domain, content type). Measures per group: row count,
    rows with a lifetime, avg/min/max lifetime (update_cache_stat,
    caching_analyzer.rs:68-83). The reference builds three tables manually —
    a hand-rolled cube; here each is one hash aggregate (map-side partial)."""
    from ..functions.headers import cache_label_expr

    v = visited.withColumn("cache_type", cache_label_expr(F.col("cache_type_flags")))
    if by == "domain":
        keys = [F.col("host").alias("domain")]
    elif by == "content_type":
        keys = [classify_content_type(F.col("content_type_header")).alias("content_type")]
    elif by == "domain_content_type":
        keys = [
            F.col("host").alias("domain"),
            classify_content_type(F.col("content_type_header")).alias("content_type"),
        ]
    else:
        raise ValueError(by)
    key_names = [
        "domain" if by != "content_type" else "content_type",
    ] + (["content_type"] if by == "domain_content_type" else [])
    return (
        v.groupBy(*keys, F.col("cache_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("cache_lifetime").isNotNull(), 1).otherwise(0)).alias(
                "n_with_lifetime"
            ),
            F.round(F.avg("cache_lifetime"), 3).alias("avg_lifetime"),
            F.min("cache_lifetime").alias("min_lifetime"),
            F.max("cache_lifetime").alias("max_lifetime"),
        )
        .orderBy(*key_names, "cache_type")
    )


def header_stats(visited: DataFrame, unique_cap: int = 10, preview_n: int = 5) -> DataFrame:
    """A6 (headers_analyzer.rs:41-98 + header_stats.rs): explode the headers
    map -> per header name: occurrences, bounded distinct-value count
    (the reference caps the unique set and renders 'N+'; distributed twin =
    slice(sort_array(collect_set))), value preview, numeric min/max for
    content-length/age. collect_set is bounded per group by the cap -> no
    unbounded state at 10^10 rows (approx_count_distinct would also work but
    the capped-exact form matches the reference's 'N+' output)."""
    h = (
        visited.filter(F.col("headers").isNotNull())
        .select(F.explode("headers").alias("header", "value"))
    )
    numeric = F.col("header").isin("content-length", "age")
    uniq = F.slice(F.sort_array(F.collect_set("value")), 1, unique_cap + 1)
    return (
        h.groupBy("header")
        .agg(
            F.count("*").alias("occurrences"),
            F.when(F.size(uniq) > unique_cap, F.lit(f"{unique_cap}+"))
            .otherwise(F.size(uniq).cast("string"))
            .alias("unique_values"),
            F.array_join(F.slice(F.sort_array(F.collect_set("value")), 1, preview_n), ", ").alias(
                "values_preview"
            ),
            F.min(F.when(numeric, F.col("value").cast("long"))).alias("min_int"),
            F.max(F.when(numeric, F.col("value").cast("long"))).alias("max_int"),
        )
        .orderBy(F.desc("occurrences"), "header")
    )


def header_value_stats(visited: DataFrame) -> DataFrame:
    """The headers-values SuperTable (docs/JSON-OUTPUT.md §5.12 +
    headers_analyzer.rs value table): one row per unique (header, value)
    with its occurrence count. Plain explode -> hash-agg — map-side combine
    compresses the (header, value) keyspace before the shuffle; the
    presentation layer caps collected rows (high-cardinality headers like
    set-cookie stay distributed)."""
    h = (
        visited.filter(F.col("headers").isNotNull())
        .select(F.explode("headers").alias("header", "value"))
    )
    return (
        h.groupBy("header", "value")
        .agg(F.count("*").alias("occurrences"))
        .select("header", "occurrences", "value")
        .orderBy("header", F.desc("occurrences"), "value")
    )


def content_processor_stats(metrics: DataFrame) -> DataFrame:
    """The content-processors-stats SuperTable (docs/JSON-OUTPUT.md §5.26:
    classAndMethod / execTime / execCount + execTimeFormatted): per engine
    phase, total wall time and execution count, from the `time_us:<phase>`
    rows the engine appends to its checkpointed metrics table each wave
    (engine._run_wave's _mark). The reference times its HTML/CSS/JS
    processor methods; the Spark engine's unit of execution is the wave
    phase, so that's the classAndMethod granularity reported here."""
    t = metrics.filter(F.col("stage").startswith("time_us:"))
    return (
        t.groupBy(
            F.concat(
                F.lit("CrawlEngine::"),
                F.regexp_replace("stage", "^time_us:", ""),
            ).alias("classAndMethod")
        )
        .agg(
            F.round(F.sum("rows") / 1e6, 3).alias("execTime"),
            F.count("*").alias("execCount"),
        )
        .withColumn(
            "execTimeFormatted",
            F.concat(F.format_number("execTime", 3), F.lit(" s")),
        )
        .orderBy(F.desc("execTime"), "classAndMethod")
    )


def format_support(visited: DataFrame) -> DataFrame:
    """A12 (best_practice_analyzer.rs:864-960): Brotli/WebP/AVIF existence
    aggregates over headers and urls — one global agg row."""
    enc = F.lower(F.coalesce(F.col("headers")["content-encoding"], F.lit("")))
    cth = F.lower(F.coalesce(F.col("content_type_header"), F.lit("")))
    url = F.lower(F.col("url"))
    return visited.agg(
        F.max(F.when(enc.contains("br"), 1).otherwise(0)).alias("has_brotli"),
        F.max(
            F.when(cth.contains("webp") | url.endswith(".webp"), 1).otherwise(0)
        ).alias("has_webp"),
        F.max(
            F.when(cth.contains("avif") | url.endswith(".avif"), 1).otherwise(0)
        ).alias("has_avif"),
    )


def mime_type_stats(visited: DataFrame) -> DataFrame:
    """A3 (content_type_analyzer.rs second table): stats by the RAW
    content-type header value (parameters stripped, lowercased)."""
    raw = F.lower(
        F.trim(F.split(F.coalesce(F.col("content_type_header"), F.lit("")), ";")[0])
    )
    return (
        visited.withColumn("mime", raw)
        .groupBy("mime")
        .agg(
            F.count("*").alias("n"),
            F.sum("size").alias("total_size"),
            F.round(F.avg("request_time_ms"), 3).alias("avg_time_ms"),
        )
        .orderBy(F.desc("n"), "mime")
    )


def wave_stats(visited: DataFrame) -> DataFrame:
    """Frontier-shape analytics: per-wave row counts and status mix (the
    engine's own lineage view; no reference analog — wave is our construct)."""
    return (
        visited.groupBy("wave")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("status_code") == 200, 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("status_code") != 200, 1).otherwise(0)).alias("bad"),
        )
        .orderBy("wave")
    )
