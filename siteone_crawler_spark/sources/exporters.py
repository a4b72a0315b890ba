"""Exporter sinks — DataFrame-first re-expressions of the reference's
exporters (/root/reference/src/export/*).

  sitemap_rows / write_sitemap_xml  S8: sitemap_exporter.rs:45-120 — filter
      internal+HTML+200, sort (slash count, alpha), priority =
      clamp(base + inc*(1-extra_slashes), 0.1, 1.0)
  json_summary / write_json         S11: output/json_output.rs:86-135 —
      results + stats + tables (docs/JSON-OUTPUT.md:50-105 schema spirit)
  markdown_spans                    S10: markdown_exporter.rs — the per-doc
      interleaved text+media sequence (the spans column IS this output;
      see operators/spans.py for the parity check)

The heavy computation stays in Spark; only the final small presentation
artifacts are collected/written driver-side (they're reports, not data).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import analyzers as A


def sitemap_rows(
    visited: DataFrame, base_priority: float = 0.5, inc: float = 0.1
) -> DataFrame:
    """Internal HTML 200s sorted by (slash count, url) with computed priority."""
    html200 = (F.col("status_code") == 200) & (
        A.classify_content_type(F.col("content_type_header")) == "html"
    )
    slashes = F.length("url") - F.length(F.regexp_replace("url", "/", ""))
    extra = slashes - 3  # scheme:// + host/ = 3 slashes baseline
    priority = F.round(
        F.greatest(
            F.lit(0.1),
            F.least(F.lit(1.0), F.lit(base_priority) + F.lit(inc) * (1 - extra)),
        ),
        2,
    )
    return (
        visited.filter(html200)
        .select("url", slashes.alias("slashes"), priority.alias("priority"))
        .orderBy("slashes", "url")
    )


def write_sitemap_xml(visited: DataFrame, path: str) -> int:
    rows = sitemap_rows(visited).collect()
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
        for r in rows:
            f.write(
                f"  <url><loc>{_xml_escape(r['url'])}</loc>"
                f"<priority>{r['priority']:.2f}</priority></url>\n"
            )
        f.write("</urlset>\n")
    return len(rows)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def json_summary(visited: DataFrame, skipped: DataFrame) -> dict:
    """Back-compat thin shape (stats + tables); see json_output for the
    full documented schema."""
    out = json_output(visited, skipped)
    return {"stats": out["stats"], "tables": out["tables"]}


def _rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    if limit is not None:
        df = df.limit(limit)
    return [r.asDict(recursive=True) for r in df.collect()]


def json_output(
    visited: DataFrame,
    skipped: DataFrame,
    config=None,
    executed_at: str = "",
    results_limit: int | None = None,
    rows_limit: int = 1000,
) -> dict:
    """S11: the reference's full JSON output shape (docs/JSON-OUTPUT.md §3 —
    8 top-level keys: crawler, extraColumnsFromAnalysis, options,
    qualityScores, results, stats, summary, tables; table apl-codes from
    §5). Aggregations run distributed; only the presentation rows collect."""
    from dataclasses import asdict

    from ..operators import scoring

    summary_counts, stats = scoring.crawl_summary(visited, skipped)
    scores = scoring.calculate_scores(summary_counts, stats)

    def cat(c):
        return {
            "name": c.name,
            "code": c.code,
            "score": c.score,
            "label": c.label,
            "weight": c.weight,
            "deductions": [
                {"description": d.description, "points": d.points} for d in c.deductions
            ],
        }

    results = _rows(
        visited.select(
            "url",
            F.col("status_code").alias("status"),
            F.col("request_time_ms").alias("elapsedTime"),
            "size",
            F.col("content_type_header").alias("contentType"),
            F.col("cache_type_flags").alias("cacheTypeFlags"),
            F.col("cache_lifetime").alias("cacheLifetime"),
        ).orderBy("seq"),
        results_limit,
    )

    tables = {
        "skipped-summary": _rows(A.skipped_summary(skipped), rows_limit),
        "skipped": _rows(
            skipped.select("url", "reason", "source_uq_id").orderBy("url"), rows_limit
        ),
        "redirects": _rows(A.redirects_list(visited), rows_limit),
        "404": _rows(A.errors_list(visited, 404), rows_limit),
        "fastest-urls": _rows(A.top_fastest(visited, 20)),
        "slowest-urls": _rows(A.top_slowest(visited, 20)),
        "headers": _rows(A.header_stats(visited), rows_limit),
        "caching-per-content-type": _rows(
            A.caching_stats(visited, "content_type"), rows_limit
        ),
        "caching-per-domain": _rows(A.caching_stats(visited, "domain"), rows_limit),
        "caching-per-domain-and-content-type": _rows(
            A.caching_stats(visited, "domain_content_type"), rows_limit
        ),
        "source-domains": _rows(A.source_domain_stats(visited), rows_limit),
        "content-types": _rows(A.content_type_stats(visited), rows_limit),
        "content-types-raw": _rows(A.mime_type_stats(visited), rows_limit),
        "external-urls": _rows(A.external_links(skipped), rows_limit),
        "best-practices": _rows(A.format_support(visited)),
        "analysis-stats": _rows(A.wave_stats(visited), rows_limit),
    }

    return {
        "crawler": {
            "name": "siteone_crawler_spark",
            "version": "2.0",
            "executedAt": executed_at,
        },
        "extraColumnsFromAnalysis": [],
        "options": asdict(config) if config is not None else {},
        "qualityScores": {
            "overall": cat(scores.overall),
            "categories": [cat(c) for c in scores.categories],
        },
        "results": results,
        "stats": {
            "totalUrls": stats.total_urls,
            "avgTimeS": stats.avg_time_s,
            "p90HtmlS": stats.p90_html_s,
            "maxTimeS": stats.max_time_s,
            "countByStatus": {str(k): v for k, v in sorted(stats.count_by_status.items())},
        },
        "summary": [
            {"aplCode": code, "count": n, "status": "warning"}
            for code, n in sorted(summary_counts.items())
        ],
        "tables": tables,
    }


def write_json(
    visited: DataFrame, skipped: DataFrame, path: str, config=None, executed_at: str = ""
) -> dict:
    out = json_output(visited, skipped, config=config, executed_at=executed_at)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    return out


def markdown_spans(docs: DataFrame) -> DataFrame:
    """Per-doc markdown-ish rendering of the span sequence: text spans pass
    through, media/link spans become markdown refs — all native exprs."""
    from ..operators.spans import ordered_spans

    render = F.array_join(
        F.transform(
            "seq",
            lambda s: F.when(s["kind"] == "text", s["text"])
            .when(s["kind"] == "img_src", F.concat(F.lit("!["), s["text"], F.lit("](") , s["media_ref"], F.lit(")")))
            .otherwise(F.concat(F.lit("["), s["text"], F.lit("]("), s["media_ref"], F.lit(")"))),
        ),
        "\n",
    )
    return ordered_spans(docs).select("doc_id", render.alias("markdown"))
