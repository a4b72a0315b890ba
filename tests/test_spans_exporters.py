"""Span-sequence invariant, exporter sinks, extra-columns, crawl-delay."""

import os

import pyspark.sql.functions as F
import pytest

from siteone_crawler_spark.config import CrawlConfig
from siteone_crawler_spark.generator import generate_site, site_to_dfs


def test_span_sequence_invariant(spark):
    """North-rule per-row invariant: (kind, text, media_ref, order) equality."""
    from siteone_crawler_spark.generator import SPAN_SCHEMA
    from siteone_crawler_spark.operators.spans import (
        ordered_spans,
        span_parity_violations,
        span_signature,
    )

    site = generate_site(seed=42, n_hosts=1, docs_per_host=10)
    docs, *_ = site_to_dfs(spark, site)

    seq = ordered_spans(docs).collect()
    by_id = {r["doc_id"]: r["seq"] for r in seq}
    spans0 = sorted(site.docs[0]["spans"], key=lambda s: s["offset"])
    got0 = by_id[site.docs[0]["doc_id"]]
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans0] == [
        (x["kind"], x["text"], x["media_ref"]) for x in got0
    ]

    # identical tables -> zero violations
    assert span_parity_violations(docs, docs).count() == 0

    # a reordered span sequence IS a violation
    mutated_rows = []
    for d in site.docs:
        spans = list(d["spans"])
        if d["doc_id"] == site.docs[0]["doc_id"] and len(spans) > 2:
            spans[0], spans[1] = (
                {**spans[1], "offset": 0},
                {**spans[0], "offset": 1},
            )
        mutated_rows.append(
            (d["doc_id"], [tuple(s[k] for k in ("kind", "text", "media_ref", "offset")) for s in spans])
        )
    mutated = spark.createDataFrame(mutated_rows, schema=SPAN_SCHEMA)
    bad = span_parity_violations(docs, mutated).collect()
    assert len(bad) == 1 and bad[0]["doc_id"] == site.docs[0]["doc_id"]

    sig = span_signature(docs).collect()
    assert all(r["sig"] and r["n_spans"] >= 0 for r in sig)


@pytest.fixture(scope="module")
def crawl_small(spark, tmp_path_factory):
    from siteone_crawler_spark.engine import CrawlEngine

    site = generate_site(seed=42, n_hosts=1, docs_per_host=15)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    eng = CrawlEngine(spark, cfg, str(tmp_path_factory.mktemp("ck")), n_buckets=8)
    return eng.run(docs, meta, site.robots, site.seeds)


def test_sitemap_exporter(spark, tmp_path, crawl_small):
    from siteone_crawler_spark.sources.exporters import sitemap_rows, write_sitemap_xml

    rows = sitemap_rows(crawl_small["visited"]).collect()
    assert rows, "sitemap should contain internal HTML 200s"
    keys = [(r["slashes"], r["url"]) for r in rows]
    assert keys == sorted(keys)
    assert all(0.1 <= r["priority"] <= 1.0 for r in rows)

    p = str(tmp_path / "sitemap.xml")
    n = write_sitemap_xml(crawl_small["visited"], p)
    content = open(p).read()
    assert content.startswith('<?xml') and content.count("<url>") == n


def test_json_exporter(spark, tmp_path, crawl_small):
    from siteone_crawler_spark.sources.exporters import write_json

    out = write_json(crawl_small["visited"], crawl_small["skipped"], str(tmp_path / "out.json"))
    # the 8 documented top-level keys (docs/JSON-OUTPUT.md §3)
    assert set(out) == {
        "crawler", "extraColumnsFromAnalysis", "options", "qualityScores",
        "results", "stats", "summary", "tables",
    }
    assert out["stats"]["totalUrls"] == crawl_small["visited"].count()
    assert len(out["results"]) == out["stats"]["totalUrls"]
    assert out["tables"]["content-types"] and out["tables"]["caching-per-domain"]
    assert out["tables"]["headers"]
    assert 0.0 <= out["qualityScores"]["overall"]["score"] <= 10.0
    assert len(out["qualityScores"]["categories"]) == 5
    import json

    reloaded = json.load(open(tmp_path / "out.json"))
    assert reloaded["stats"]["totalUrls"] == out["stats"]["totalUrls"]


def test_html_and_text_report(spark, tmp_path, crawl_small):
    from siteone_crawler_spark.sources.exporters import text_output, write_html_report

    p = tmp_path / "report.html"
    html = write_html_report(
        crawl_small["visited"], crawl_small["skipped"], str(p), executed_at="t0"
    )
    assert p.exists() and p.read_text() == html
    assert html.startswith("<!DOCTYPE html>")
    # every SuperTable section renders, incl. the caching/header families
    for section in ("content-types", "caching-per-domain", "headers",
                    "slowest-urls", "skipped-summary"):
        assert f"<h2>{section}</h2>" in html
    assert "overall:" in html
    # values are escaped, never raw-injected
    assert "<script>" not in html.split("</style>")[-1]

    txt = text_output(crawl_small["visited"], crawl_small["skipped"])
    assert "=== content-types ===" in txt and "quality:" in txt
    assert str(crawl_small["visited"].count()) in txt.splitlines()[0]


def test_report_with_content_tables(spark, tmp_path, crawl_small):
    """security table always present (headers column exists); seo/
    accessibility/best-practice tables appear when html_docs is passed."""
    from siteone_crawler_spark.sources.exporters import json_output

    docs = spark.createDataFrame(
        [("https://h.test/p", "<html lang='en'><head><title>T</title></head>"
          "<body><main><h1>H</h1></main></body></html>")],
        "url string, body string",
    )
    out = json_output(crawl_small["visited"], crawl_small["skipped"], html_docs=docs)
    assert "security" in out["tables"] and out["tables"]["security"]
    for t in ("seo", "open-graph", "seo-headings", "accessibility",
              "best-practices-content"):
        assert t in out["tables"], t
    assert out["tables"]["seo"][0]["title"] == "T"
    assert out["tables"]["accessibility"][0]["pages_missing_lang"] == 0


def test_json_results_cap_follows_crawl_cap(spark, crawl_small):
    """results_limit derives from config.max_visited_urls — a crawl allowed
    to visit more than 10000 URLs must not be silently truncated by the
    writer (the reference emits every visited URL; its 10000 is a crawl
    cap, not a writer cap). Explicit int/None still override."""
    from siteone_crawler_spark.config import CrawlConfig
    from siteone_crawler_spark.sources.exporters import json_output

    v, s = crawl_small["visited"], crawl_small["skipped"]
    n = v.count()
    out = json_output(v, s, config=CrawlConfig(max_visited_urls=10**9))
    assert len(out["results"]) == n  # cap >= crawl size: nothing dropped
    out = json_output(v, s, config=CrawlConfig(max_visited_urls=2))
    assert len(out["results"]) == 2  # writer cap == the crawl's own cap
    out = json_output(v, s, config=CrawlConfig(max_visited_urls=2), results_limit=None)
    assert len(out["results"]) == n  # explicit None lifts the cap


# every `tables` apl-code the reference documents (docs/JSON-OUTPUT.md §5.1-5.27)
REFERENCE_TABLE_KEYS = {
    "skipped-summary", "skipped", "redirects", "404", "certificate-info",
    "fastest-urls", "slowest-urls", "seo", "open-graph", "seo-headings",
    "headers", "headers-values", "caching-per-content-type",
    "caching-per-domain", "caching-per-domain-and-content-type",
    "non-unique-titles", "non-unique-descriptions", "best-practices",
    "accessibility", "source-domains", "content-types", "content-types-raw",
    "dns", "security", "analysis-stats", "content-processors-stats",
    "external-urls",
}


def test_json_tables_full_parity(spark, crawl_small):
    """All 27 documented reference tables are emitted when bodies + engine
    metrics are supplied, with the documented column shapes."""
    from siteone_crawler_spark.sources.exporters import json_output

    docs = spark.createDataFrame(
        [
            ("https://h.test/a", "<html><head><title>Same</title>"
             "<meta name='description' content='D'></head><body></body></html>"),
            ("https://h.test/b", "<html><head><title>Same</title>"
             "<meta name='description' content='D'></head><body></body></html>"),
            ("https://h.test/c", "<html><head><title>Other</title></head>"
             "<body></body></html>"),
        ],
        "url string, body string",
    )
    out = json_output(
        crawl_small["visited"], crawl_small["skipped"], html_docs=docs,
        metrics=crawl_small["metrics"], now_s=1_700_000_000,
    )
    assert len(REFERENCE_TABLE_KEYS) == 27
    missing = REFERENCE_TABLE_KEYS - set(out["tables"])
    assert not missing, f"missing reference tables: {sorted(missing)}"

    dns = out["tables"]["dns"]
    assert dns and set(dns[0]) == {"info"}
    cert = out["tables"]["certificate-info"]
    assert cert and set(cert[0]) == {"info", "value"}
    assert {r["info"] for r in cert} >= {"Host", "Issuer", "Valid from", "Valid to"}
    hv = out["tables"]["headers-values"]
    assert hv and set(hv[0]) == {"header", "occurrences", "value"}
    cps = out["tables"]["content-processors-stats"]
    assert cps and set(cps[0]) == {
        "classAndMethod", "execTime", "execCount", "execTimeFormatted"
    }
    assert all(r["classAndMethod"].startswith("CrawlEngine::") for r in cps)
    nut = out["tables"]["non-unique-titles"]
    assert nut == [{"count": 2, "title": "Same"}]
    nud = out["tables"]["non-unique-descriptions"]
    assert nud == [{"count": 2, "description": "D"}]


def test_markdown_spans(spark):
    from siteone_crawler_spark.sources.exporters import markdown_spans

    site = generate_site(seed=1, n_hosts=1, docs_per_host=5)
    docs, *_ = site_to_dfs(spark, site)
    md = {r["doc_id"]: r["markdown"] for r in markdown_spans(docs).collect()}
    root = site.docs[0]
    got = md[root["doc_id"]]
    assert "Welcome to page" in got  # text spans pass through
    assert "](" in got  # links become markdown refs


def test_extra_columns(spark):
    from siteone_crawler_spark.functions.extra_columns import (
        parse_extra_column,
        with_extra_columns,
    )

    df = spark.createDataFrame(
        [("Title: Hello World. Body text 42.",), ("no match here",)], "text string"
    )
    out = with_extra_columns(
        df,
        [r"Title=regexp:/Title: ([^.]+)\./#1", r"Num=regexp:/(\d+)/#1", "All=xpath://text()"],
    ).collect()
    assert out[0]["Title"] == "Hello World"
    assert out[0]["Num"] == "42"
    assert out[0]["All"] == out[0]["text"]
    # no-match -> NULL (reference extract_value returns None, never "")
    assert out[1]["Title"] is None

    spec = parse_extra_column("X=regexp:/a(b)c/#1")
    assert spec.group == 1 and spec.spec == "a(b)c"
    # undelimited reference grammar + length/truncate suffix
    spec = parse_extra_column("X=regexp:<title>(.+?)</title>#1(30>)")
    assert spec.spec == "<title>(.+?)</title>" and spec.group == 1
    assert spec.length == 30 and spec.truncate is False
    # bare names are plain passthrough columns (extra_column.rs from_text)
    plain = parse_extra_column("Wide(30>)")
    assert plain.kind == "plain" and plain.length == 30 and not plain.truncate
    # unparseable custom spec -> plain column named by the whole text
    # (from_text's custom-syntax-failure branch, extra_column.rs:131-133)
    fb = parse_extra_column("X=foo:bar")
    assert fb.kind == "plain" and fb.name == "X=foo:bar"
    # Title/Description/Keywords get the 20-char default display width
    # (default_column_size, extra_column.rs:25-32)
    from siteone_crawler_spark.functions.extra_columns import truncated_value

    t = parse_extra_column("Title")
    assert t.length == 20
    long_title = "An Extremely Long Page Title Indeed"
    assert truncated_value(t, long_title) == long_title[:19].strip() + "…"
    assert parse_extra_column("Other").length is None


def test_extra_columns_xpath(spark):
    """F15 xpath surface — full parity with the reference's CSS-convertible
    subset (extra_column.rs:180-234): tag paths, [attr='value'] predicates,
    child (/) vs descendant (//) combinators, /@attr reads, #N indexing."""
    from siteone_crawler_spark.functions.extra_columns import (
        extract_xpath,
        parse_extra_column,
        truncated_value,
        with_extra_columns,
    )

    html = (
        '<html><body><div class="main"><h1>Top Title</h1>'
        '<a href="/first">one</a><p><a href="/second">two</a></p></div>'
        '<div><span data-x="v">deep</span></div>'
        '<meta name="author" content="Ada">'
        "</body></html>"
    )
    assert extract_xpath(html, "//h1/text()") == "Top Title"
    assert extract_xpath(html, "//div[@class='main']/h1") == "Top Title"
    assert extract_xpath(html, "//a/@href") == "/first"
    assert extract_xpath(html, "//a/@href", index=1) == "/second"
    # child combinator: //div/a only matches the direct child anchor
    assert extract_xpath(html, "//div/a/@href") == "/first"
    assert extract_xpath(html, "//meta[@name='author']/@content") == "Ada"
    assert extract_xpath(html, "//span[@data-x]") == "deep"
    assert extract_xpath(html, "//h2") is None
    assert extract_xpath(html, "//a", index=9) is None

    df = spark.createDataFrame([(html,), (None,)], "text string")
    out = with_extra_columns(
        df, ["T=xpath://h1/text()", "Author=xpath://meta[@name='author']/@content"]
    ).collect()
    assert out[0]["T"] == "Top Title" and out[0]["Author"] == "Ada"
    assert out[1]["T"] is None

    spec = parse_extra_column("T=xpath://h1(7)")
    assert truncated_value(spec, "Top Title") == "Top Ti…"
    assert truncated_value(spec, "Top") == "Top"
    assert truncated_value(spec, None) is None


def test_crawl_delay_politeness(spark, tmp_path):
    """Crawl-delay in robots shrinks a host's per-wave budget; all URLs are
    still eventually visited exactly once."""
    from siteone_crawler_spark.engine import CrawlEngine
    from siteone_crawler_spark.functions.robots import parse_robots
    from siteone_crawler_spark.simulator import simulate

    site = generate_site(seed=9, n_hosts=2, docs_per_host=10, with_breaker_family=False)
    # host 0: crawl-delay 5 (budget 2/wave at wave_seconds=10); host 1: none
    site.robots["h0000.example.test"] += "User-agent: *\nCrawl-delay: 5\n"
    assert parse_robots(site.robots["h0000.example.test"]).crawl_delay == 5.0

    cfg = CrawlConfig(
        allowed_domains=("*.example.test",), wave_seconds=10.0, default_crawl_delay=0.5
    )
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "ck"), n_buckets=8)
    tables = eng.run(docs, meta, site.robots, site.seeds)

    base = simulate(site, CrawlConfig(allowed_domains=("*.example.test",)))
    assert {r["url"] for r in tables["visited"].collect()} == {t[1] for t in base.crawl_order}
    assert tables["visited"].count() == len(base.crawl_order)
    # the delayed host processes <= 2 rows per wave
    per_wave = (
        tables["visited"].filter(F.col("host") == "h0000.example.test")
        .groupBy("wave").count().collect()
    )
    assert all(r["count"] <= 2 for r in per_wave)


def test_mailer_export():
    """S11 mailer twin: subject templating, sender hostname resolution,
    email styling, .eml serialization (mailer_exporter.rs:85-160)."""
    import datetime

    from siteone_crawler_spark.sources.exporters import build_email, write_eml

    email = build_email(
        "<html><body><table><tr><td>x</td></tr></table></body></html>",
        "ex.test",
        mail_to=("a@b.test", "c@d.test"),
        subject_template="Report %domain% %date% %datetime%",
        hostname="worker-1",
        now=datetime.datetime(2026, 8, 17, 12, 30),
    )
    assert email["subject"] == "Report ex.test 2026-08-17 2026-08-17 12:30"
    assert email["from"] == "Crawler Report <crawler@worker-1>"
    assert 'style="font-family' in email["attachment_html"]
    assert "border-collapse" in email["attachment_html"]

    import tempfile

    p = tempfile.mktemp(suffix=".eml")
    write_eml(email, p)
    raw = open(p, "rb").read().decode("utf-8", "replace")
    assert "Subject: Report ex.test" in raw
    assert "To: a@b.test, c@d.test" in raw

    import pytest

    with pytest.raises(ValueError):
        build_email("<html></html>", "ex.test", mail_to=())


def test_upload_payload():
    """S11 upload twin: gzip + percent-encode + urlencoded form fields,
    deterministic bytes (upload_exporter.rs:59-110)."""
    import gzip
    import urllib.parse

    from siteone_crawler_spark.sources.exporters import (
        build_upload_payload,
        write_upload_payload,
    )

    html = "<html><body>report</body></html>"
    payload = build_upload_payload(
        html, retention="30d", password=" s3cret ", version="spark", platform="linux"
    )
    assert payload == build_upload_payload(
        html, retention="30d", password="s3cret", version="spark", platform="linux"
    )
    fields = dict(p.split("=", 1) for p in payload.decode().split("&"))
    assert fields["version"] == "spark" and fields["platform"] == "linux"
    assert fields["retention"] == "30d" and fields["password"] == "s3cret"
    back = gzip.decompress(
        urllib.parse.unquote_to_bytes(fields["htmlBody"])
    ).decode()
    assert back == html

    import tempfile

    p = tempfile.mktemp(suffix=".bin")
    m = write_upload_payload(html, p, endpoint="https://upload.example/api")
    assert m["bytes"] == len(open(p, "rb").read())
    # empty password omitted from the form
    p2 = build_upload_payload(html, password="  ").decode()
    assert "password=" not in p2
