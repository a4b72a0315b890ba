"""S9 offline-website export: URL -> relative-file-path golden vectors
lifted from /root/reference/src/export/utils/offline_url_converter.rs:700-1020,
plus the Spark offline_paths projection."""

from __future__ import annotations

import pytest

from siteone_crawler_spark.sources.offline import (
    convert_url_to_relative,
    query_hash,
    sanitize_file_path,
)

ALLOWED_STATIC = ("cdn.siteone.io", "cdn.webflow.com", "nextjs.org")
ALLOWED_CRAWL = ("svelte.dev", "nextjs.org")


def convert(initial, base, target, attribute=None, **kw):
    return convert_url_to_relative(
        initial, base, target, attribute,
        is_domain_allowed_for_static_files=lambda d: d in ALLOWED_STATIC,
        is_external_domain_allowed_for_crawling=lambda d: d in ALLOWED_CRAWL,
        **kw,
    )


GOLDEN = [
    # core conversions
    ("https://siteone.io/", "https://siteone.io/", "https://siteone.io/", None, "index.html"),
    ("https://siteone.io/", "https://siteone.io/", "https://siteone.io/page", None, "page.html"),
    ("https://siteone.io/", "https://siteone.io", "https://siteone.io/page/", None, "page/index.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://siteone.io/page#fragment", None,
     "../page.html#fragment"),
    ("https://siteone.io/", "https://siteone.io/", "/page", None, "page.html"),
    ("https://siteone.io/", "https://siteone.io/", "/page/", None, "page/index.html"),
    ("https://siteone.io/", "https://siteone.io/", "page", None, "page.html"),
    ("https://siteone.io/", "https://siteone.io/path/", "../page", None, "../page.html"),
    ("https://siteone.io/", "https://siteone.io/path/", "../page/", None, "../page/index.html"),
    ("https://siteone.io/", "https://siteone.io/a/b/", "https://siteone.io/page", None, "../../page.html"),
    ("https://siteone.io/", "https://siteone.io/a/b/", "https://siteone.io/page/", None,
     "../../page/index.html"),
    # protocol-relative + fragments
    ("https://siteone.io/", "https://siteone.io/", "//nextjs.org/", None, "_nextjs.org/index.html"),
    ("https://siteone.io/", "https://nextjs.org/", "//siteone.io/page", None, "../page.html"),
    ("https://siteone.io/", "https://siteone.io/", "#fragment2", None, "#fragment2"),
    ("https://siteone.io/", "https://nextjs.org/", "#fragment3", None, "#fragment3"),
    # external allowed domains
    ("https://siteone.io/", "https://siteone.io/", "https://nextjs.org/", None, "_nextjs.org/index.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://svelte.dev/x", None, "../_svelte.dev/x.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://svelte.dev/x/file.css", None,
     "../_svelte.dev/x/file.css"),
    # backlinks to the initial domain
    ("https://siteone.io/", "https://nextjs.org/", "https://siteone.io/", None, "../index.html"),
    ("https://siteone.io/", "https://nextjs.org/subpage", "https://siteone.io/", None, "../index.html"),
    ("https://siteone.io/", "https://nextjs.org/subpage/", "https://siteone.io/a", None, "../../a.html"),
    ("https://siteone.io/", "https://nextjs.org/", "https://svelte.dev/page", None,
     "../_svelte.dev/page.html"),
]


@pytest.mark.parametrize("initial,base,target,attr,expected", GOLDEN)
def test_offline_golden(initial, base, target, attr, expected):
    assert convert(initial, base, target, attr) == expected


def test_offline_query_hash():
    r = convert("https://siteone.io/", "https://siteone.io/", "https://siteone.io/page?p=1")
    assert r.startswith("page.") and r.endswith(".html") and "?" not in r
    assert r == f"page.{query_hash('p=1')}.html"
    r = convert("https://siteone.io/", "https://siteone.io/", "?p=1")
    assert r.startswith("index.") and r.endswith(".html")
    r = convert("https://siteone.io/", "https://siteone.io/", "https://siteone.io/file.css?p=1")
    assert r.endswith(".css") and "?" not in r
    # user-configured query replacement ('/' -> '~', no md5)
    assert query_hash("a=1/2", ["a=->x="]) == "x=1~2"


def test_offline_preserve_structure():
    # /about -> about/index.html when preserve_url_structure is on
    assert convert(
        "https://siteone.io/", "https://siteone.io/", "https://siteone.io/about",
        preserve_url_structure=True,
    ) == "about/index.html"
    # real extensions are untouched by preserve mode
    assert convert(
        "https://siteone.io/", "https://siteone.io/", "https://siteone.io/a.css",
        preserve_url_structure=True,
    ) == "a.css"


def test_offline_forced_urls():
    # non-requestable hrefs pass through without conversion
    assert convert("https://siteone.io/", "https://siteone.io/", "mailto:x@y.z") == "mailto:x@y.z"
    # disallowed external host stays absolute
    assert (
        convert("https://siteone.io/", "https://siteone.io/", "https://denied.example/x")
        == "https://denied.example/x"
    )


def test_sanitize_file_path():
    # dangerous chars -> '_', then multi-underscore collapse
    assert sanitize_file_path("a<b>:c*x.html") == "a_b_c_x.html"
    long = "dir/" + "x" * 250 + ".html"
    out = sanitize_file_path(long)
    assert len(out) <= 200 and out.startswith("dir/") and out.endswith(".html")


def test_rewrite_content_for_offline():
    from siteone_crawler_spark.sources.offline import rewrite_content_for_offline

    html = (
        '<a href="/about">a</a><img src="/img/x.png">'
        '<img srcset="/img/a.png 1x, /img/b.png 2x">'
        "<style>.c{background:url(/img/bg.jpg)}</style>"
        '<a href="#frag">f</a>'
    )
    out = rewrite_content_for_offline(
        html, "https://ex.test/sub/page", "https://ex.test/",
        is_external_domain_allowed_for_crawling=lambda _h: True,
    )
    # base /sub/page has depth 1 -> ../ prefixes; fragments untouched
    assert 'href="../about.html"' in out
    assert 'src="../img/x.png"' in out
    assert 'srcset="../img/a.png 1x, ../img/b.png 2x"' in out
    assert "url(../img/bg.jpg)" in out
    assert 'href="#frag"' in out

    css = ".a{background:url('/img/deep.webp')}"
    out = rewrite_content_for_offline(
        css, "https://ex.test/static/site.css", "https://ex.test/", "text/css",
        is_external_domain_allowed_for_crawling=lambda _h: True,
    )
    assert "url('../img/deep.webp')" in out


def test_export_offline_site(spark, tmp_path):
    from siteone_crawler_spark.generator import generate_site, site_to_html
    from siteone_crawler_spark.sources.offline import export_offline_site

    site = generate_site(seed=4, n_hosts=1, docs_per_host=8, with_breaker_family=False)
    rows = [r for r in site_to_html(site) if "html" in r[1]]
    html_df = spark.createDataFrame(rows, "doc_id string, content_type string, body string")
    out = str(tmp_path / "offline")
    n = export_offline_site(html_df, out, site.seeds[0][0])
    assert n == len(rows)
    import os

    assert os.path.exists(os.path.join(out, "index.html"))
    idx = open(os.path.join(out, "index.html")).read()
    # internal links rewritten to relative file paths, no absolute host refs
    assert "https://h0000.example.test/p/1" not in idx or "p/1.html" in idx


def test_offline_paths_spark(spark):
    from siteone_crawler_spark.sources.offline import offline_paths

    visited = spark.createDataFrame(
        [("https://ex.test/",), ("https://ex.test/about",), ("https://ex.test/a/b/",),
         ("https://ex.test/s.css",), ("https://other.test/p",)],
        "url string",
    )
    got = {r["url"]: r["file_path"] for r in offline_paths(visited, "https://ex.test/").collect()}
    assert got["https://ex.test/"] == "index.html"
    assert got["https://ex.test/about"] == "about.html"
    assert got["https://ex.test/a/b/"] == "a/b/index.html"
    assert got["https://ex.test/s.css"] == "s.css"
    assert got["https://other.test/p"] == "_other.test/p.html"
