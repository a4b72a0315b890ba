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
    """The JSON-output shape: results sample + stats + analyzer tables."""
    bs = A.basic_stats(visited).collect()[0].asDict()
    return {
        "stats": bs,
        "tables": {
            "contentTypes": [r.asDict() for r in A.content_type_stats(visited).collect()],
            "statusCodes": [r.asDict() for r in A.count_by_status(visited).collect()],
            "sourceDomains": [r.asDict() for r in A.source_domain_stats(visited).collect()],
            "skipped": [r.asDict() for r in A.skipped_summary(skipped).collect()],
            "slowest": [r.asDict() for r in A.top_slowest(visited, 20).collect()],
            "fastest": [r.asDict() for r in A.top_fastest(visited, 20).collect()],
            "waves": [r.asDict() for r in A.wave_stats(visited).collect()],
        },
    }


def write_json(visited: DataFrame, skipped: DataFrame, path: str) -> dict:
    out = json_summary(visited, skipped)
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
