"""robots.txt parse/match vectors — behaviors pinned by the reference's tests
(/root/reference/src/engine/robots_txt.rs:225-342), re-derived from semantics."""

from siteone_crawler_spark.functions.robots import (
    RobotsRules,
    is_allowed,
    parse_robots,
    path_matches,
)

BODY = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/open
Disallow: /*.pdf$
Disallow:

User-agent: EvilBot
Disallow: /

User-agent: SiteOne-Crawler
Disallow: /only-siteone/

Sitemap: https://h.test/sitemap.xml
Sitemap: https://h.test/sitemap2.xml
"""


def test_parse_sections():
    r = parse_robots(BODY)
    assert "/private/" in r.disallowed
    assert "/private/open" in r.allowed
    assert "/*.pdf$" in r.disallowed
    # EvilBot section NOT honored
    assert "/" not in r.disallowed
    # SiteOne-Crawler section honored
    assert "/only-siteone/" in r.disallowed
    assert r.sitemaps == ["https://h.test/sitemap.xml", "https://h.test/sitemap2.xml"]


def test_empty_disallow_allows_all():
    r = parse_robots("User-agent: *\nDisallow:\n")
    assert r.disallowed == []
    assert is_allowed(r, "/anything")


def test_match_wildcards_and_anchor():
    assert path_matches("/private/", "/private/x")
    assert not path_matches("/private/", "/public/x")
    assert path_matches("/*.pdf$", "/docs/file.pdf")
    assert not path_matches("/*.pdf$", "/docs/file.pdf.html")
    assert path_matches("/a*b", "/aXXXb/c")
    assert path_matches("/A/", "/a/x")  # case-insensitive


def test_allow_overrides_disallow():
    r = parse_robots(BODY)
    assert not is_allowed(r, "/private/secret")
    assert is_allowed(r, "/private/open/page")
    assert not is_allowed(r, "/x/file.pdf")
    assert not is_allowed(r, "/only-siteone/x")
    assert is_allowed(r, "/public/x")


def test_assets_always_allowed():
    r = RobotsRules(disallowed=["/"])
    assert is_allowed(r, "/blocked/style.css")
    assert is_allowed(r, "/blocked/app.js")
    assert is_allowed(r, "/blocked/logo.png")
    assert is_allowed(r, "/blocked/font.woff2")
    assert not is_allowed(r, "/blocked/page.html")


def test_no_rules_allows():
    assert is_allowed(None, "/x")
    assert is_allowed(parse_robots(""), "/x")
