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
