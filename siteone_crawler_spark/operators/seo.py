"""SEO / OpenGraph analyzer — metadata extraction + the three SuperTables.

Reimplements the reference SeoAndOpenGraphAnalyzer's behavior from public
observation, not code (/root/reference/src/analysis/seo_opengraph_analyzer.rs):

  extract_seo_metadata (rs:650-711): title, meta description/keywords,
      first h1, robots noindex/nofollow flags, canonical link
  extract_opengraph_metadata / extract_twitter_metadata (rs:713-778):
      og:title/description/image/url/type/site_name, twitter:card/site/
      creator/title/description/image
  build_heading_tree (rs:780-888): h1-h6 blocks in document order with
      whitespace-collapsed text; h1-count error marking (exactly one h1
      expected, rs:856-866)
  SuperTables "seo" / "open-graph" / "seo-headings" (rs:21-23, 890-957)

Everything is native Catalyst regexp expressions (attribute-order-
independent: each attribute pair is probed in both orders and coalesced),
so per-URL extraction is codegen'd — no Python in the scan. Empty-string
attribute values are treated as absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nn(col):
    """'' -> NULL (regexp_extract returns '' on no-match)."""
    return F.nullif(col, F.lit(""))


def _ws(col):
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _strip_tags(col):
    return _ws(F.regexp_replace(col, r"(?is)<[^>]+>", " "))


def _meta_by(body, attr: str, name: str):
    """<meta {attr}='{name}' content='...'> in either attribute order."""
    pat1 = rf"""(?is)<meta[^>]*{attr}=["']{name}["'][^>]*content=["']([^"']*)["']"""
    pat2 = rf"""(?is)<meta[^>]*content=["']([^"']*)["'][^>]*{attr}=["']{name}["']"""
    return _nn(
        F.coalesce(
            _nn(F.regexp_extract(body, pat1, 1)), _nn(F.regexp_extract(body, pat2, 1))
        )
    )


def seo_field_exprs(body):
    """Column dict of the per-URL SEO fields (rs:650-711)."""
    robots = F.lower(F.coalesce(_meta_by(body, "name", "robots"), F.lit("")))
    canon1 = r"""(?is)<link[^>]*rel=["']canonical["'][^>]*href=["']([^"']*)["']"""
    canon2 = r"""(?is)<link[^>]*href=["']([^"']*)["'][^>]*rel=["']canonical["']"""
    return {
        "title": _nn(
            _ws(F.regexp_extract(body, r"(?is)<title[^>]*>(.*?)</title>", 1))
        ),
        "description": _meta_by(body, "name", "description"),
        "keywords": _meta_by(body, "name", "keywords"),
        "h1": _nn(_strip_tags(F.regexp_extract(body, r"(?is)<h1[^>]*>(.*?)</h1>", 1))),
        "noindex": robots.contains("noindex"),
        "nofollow": robots.contains("nofollow"),
        "canonical": _nn(
            F.coalesce(
                _nn(F.trim(F.regexp_extract(body, canon1, 1))),
                _nn(F.trim(F.regexp_extract(body, canon2, 1))),
            )
        ),
    }


OG_PROPERTIES = ["title", "description", "image", "url", "type", "site_name"]
TWITTER_NAMES = ["card", "site", "creator", "title", "description", "image"]


def og_field_exprs(body):
    """og:* (property=) and twitter:* (name=) metadata (rs:713-778)."""
    out = {}
    for p in OG_PROPERTIES:
        out[f"og_{p}"] = _meta_by(body, "property", f"og:{p}")
    for n in TWITTER_NAMES:
        out[f"twitter_{n}"] = _meta_by(body, "name", f"twitter:{n}")
    return out


def heading_exprs(body, max_level: int = 6):
    """Document-order heading tree (rs:780-888): array of (level, text)
    structs, capped at max_level, text whitespace-collapsed."""
    blocks = F.regexp_extract_all(
        body, F.lit(r"(?is)(<h[1-6][^>]*>.*?</h[1-6]>)"), 1
    )
    tree = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                F.regexp_extract(b, r"(?i)<h([1-6])", 1).cast("int").alias("level"),
                _strip_tags(b).alias("text"),
            ),
        ),
        lambda s: s["level"] <= max_level,
    )
    n_h1 = F.size(F.filter(tree, lambda s: s["level"] == 1))
    return {
        "headings": tree,
        "n_headings": F.size(tree),
        "n_h1": n_h1,
        # exactly one h1 expected (mark_h1_errors, rs:856-866)
        "h1_error": n_h1 != 1,
    }


def _path_and_query(url_col):
    """get_url_path_and_query (rs:637-648)."""
    pq = F.regexp_extract(url_col, r"^[a-z]+://[^/]+(/.*)?$", 1)
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def seo_stats(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """The "seo" SuperTable: one row per HTML page."""
    b = F.col(body_col)
    f = seo_field_exprs(b)
    return html_docs.select(
        _path_and_query(F.col(url_col)).alias("path"),
        f["title"].alias("title"),
        f["description"].alias("description"),
        f["keywords"].alias("keywords"),
        f["h1"].alias("h1"),
        f["noindex"].alias("noindex"),
        f["nofollow"].alias("nofollow"),
        f["canonical"].alias("canonical"),
    ).orderBy("path")


def og_stats(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """The "open-graph" SuperTable: og:* + twitter:* per page, plus a
    has_og flag (any og property present)."""
    b = F.col(body_col)
    f = og_field_exprs(b)
    cols = [f[k].alias(k) for k in f]
    has_og = F.coalesce(
        *[f[f"og_{p}"].isNotNull() for p in OG_PROPERTIES], F.lit(False)
    )
    return html_docs.select(
        _path_and_query(F.col(url_col)).alias("path"),
        *cols,
        F.greatest(*[f[f"og_{p}"].isNotNull() for p in OG_PROPERTIES]).alias("has_og"),
    ).orderBy("path")


def heading_stats(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body",
    max_level: int = 6,
) -> DataFrame:
    """The "seo-headings" SuperTable: heading counts + h1 error flag."""
    h = heading_exprs(F.col(body_col), max_level)
    return html_docs.select(
        _path_and_query(F.col(url_col)).alias("path"),
        h["n_headings"].alias("n_headings"),
        h["n_h1"].alias("n_h1"),
        h["h1_error"].alias("h1_error"),
        F.transform(h["headings"], lambda s: s["text"]).alias("heading_texts"),
    ).orderBy("path")


def seo_summary(html_docs: DataFrame, body_col: str = "body") -> DataFrame:
    """Aggregate findings the analyzer reports (analyze_seo, rs:94-216):
    pages missing title/description/h1, noindex pages, pages with
    malformed heading structure."""
    b = F.col(body_col)
    f = seo_field_exprs(b)
    h = heading_exprs(b)
    agg = html_docs.select(
        f["title"].isNull().cast("int").alias("no_title"),
        f["description"].isNull().cast("int").alias("no_desc"),
        f["h1"].isNull().cast("int").alias("no_h1"),
        f["noindex"].cast("int").alias("noindex"),
        h["h1_error"].cast("int").alias("h1_err"),
    )
    return agg.agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("no_title").cast("long").alias("missing_title"),
        F.sum("no_desc").cast("long").alias("missing_description"),
        F.sum("no_h1").cast("long").alias("missing_h1"),
        F.sum("noindex").cast("long").alias("noindex_pages"),
        F.sum("h1_err").cast("long").alias("h1_count_errors"),
    )


def _non_unique(
    html_docs: DataFrame, field: str, out_col: str, url_col: str, body_col: str
) -> DataFrame:
    f = seo_field_exprs(F.col(body_col))
    vals = html_docs.select(f[field].alias(out_col))
    return (
        vals.filter(F.col(out_col).isNotNull() & (F.trim(out_col) != ""))
        .groupBy(out_col)
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") > 1)
        .select("count", out_col)
        .orderBy(F.desc("count"), out_col)
    )


def non_unique_titles(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """The non-unique-titles SuperTable (docs/JSON-OUTPUT.md §5.16:
    count/title — titles appearing on more than one page). Hash-agg over
    extracted titles; map-side combine keeps the shuffle narrow."""
    return _non_unique(html_docs, "title", "title", url_col, body_col)


def non_unique_descriptions(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """The non-unique-descriptions SuperTable (docs/JSON-OUTPUT.md §5.17:
    count/description)."""
    return _non_unique(html_docs, "description", "description", url_col, body_col)
