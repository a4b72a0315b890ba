"""F4-F8 content extraction: reference regex vectors, generator round-trip,
and end-to-end extraction-mode crawl parity (HTML bodies -> extract UDF ->
spans -> engine) against the simulator on the same extracted spans.

Vector sources: /root/reference/src/engine/crawler.rs:1904-2192 (base href,
meta, sitemap-url detection), html_processor.rs:28-143 regex semantics,
css_processor.rs:61-89, javascript_processor.rs:61-135, xml_processor.rs.
"""

from __future__ import annotations

import pytest

from siteone_crawler_spark.config import NON_LINK_KINDS, CrawlConfig
from siteone_crawler_spark.functions.urls import normalize_href
from siteone_crawler_spark.generator import (
    generate_site,
    render_doc_body,
    site_to_html,
)
from siteone_crawler_spark.operators.extract import (
    ExtractFlags,
    extract_base_href,
    extract_meta,
    extract_spans,
    find_css_links,
    find_html_links,
    find_js_links,
    find_sitemap_locs,
    is_sitemap_url,
    maybe_gunzip,
)
from siteone_crawler_spark.simulator import simulate


# ---------------------------------------------------------- reference vectors
def test_base_href_vectors():
    assert (
        extract_base_href('<html><head><base href="https://example.com/subdir/"></head></html>')
        == "https://example.com/subdir/"
    )
    assert extract_base_href("<base href='https://example.com/'>") == "https://example.com/"
    assert extract_base_href("<base href=https://example.com/dir/>") == "https://example.com/dir/"
    assert extract_base_href('<base href="/subdir/">') == "/subdir/"
    assert extract_base_href('<BASE HREF="https://example.com/">') == "https://example.com/"
    assert extract_base_href("<html><head><title>No base</title></head></html>") is None
    assert (
        extract_base_href('<base target="_blank" href="https://example.com/app/">')
        == "https://example.com/app/"
    )
    # relative (non-rooted) base is ignored (crawler.rs:969-976)
    assert extract_base_href('<base href="subdir/">') is None


def test_meta_vectors():
    assert extract_meta('<meta name="description" content="Hello world" />')["description"] == "Hello world"
    assert (
        extract_meta('<meta content="Une déscription: éèà" name="description" />')["description"]
        == "Une déscription: éèà"
    )
    assert extract_meta("<meta content='Single quoted' name='description'>")["description"] == "Single quoted"
    assert (
        extract_meta('<meta data-foo="bar" content="Desc" lang="en" name="description">')["description"]
        == "Desc"
    )
    assert extract_meta('<meta content="rust, crawler, seo" name="keywords" />')["keywords"] == "rust, crawler, seo"
    assert extract_meta('<meta name="keywords" content="foo, bar">')["keywords"] == "foo, bar"
    m = extract_meta("<title>A &amp; B</title><p><div><span>")
    assert m["title"] == "A & B" and m["dom_count"] == 4


def test_is_sitemap_url_vectors():
    assert is_sitemap_url("/sitemap.xml")
    assert is_sitemap_url("/sitemap-index.xml")
    assert is_sitemap_url("/sitemaps/sitemap-pages.xml")
    assert is_sitemap_url("/Sitemap.XML")
    assert is_sitemap_url("/sitemap.xml.gz")
    assert not is_sitemap_url("/about")
    assert not is_sitemap_url("/feed.xml")
    assert not is_sitemap_url("/sitemap.html")
    assert not is_sitemap_url("/archive.tar.gz")


def test_html_link_extraction_forms():
    html = (
        '<a href="/about">a</a><a href=/unq>u</a><a href="#frag">skip</a>'
        '<img src="/i.png"><img data-src="/lazy.jpg">'
        '<img srcset="/a.png 1x, /b.png 2x"><source srcset="/c.webp 480w">'
        '<input type="image" src="/btn.gif">'
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="preload" href="/f.woff2" as="font">'
        '<link rel="icon" href="/fav.ico">'
        '<script src="/app.js"></script>'
        '<audio src="/a.mp3"></audio><video src="/v.mp4"></video>'
        "<style>.x{background:url(/bg.jpg)} @font-face{src:url(/ff.ttf)}</style>"
        '<script>el.src = "/dyn.js";</script>'
    )
    got = find_html_links(html)
    assert ("a_href", "/about") in got and ("a_href", "/unq") in got
    assert all(t != "#frag" for _, t in got)
    assert ("img_src", "/i.png") in got and ("img_src", "/lazy.jpg") in got
    # srcset: ", "-split + descriptor strip, source_srcset scanned first
    srcset = [t for k, t in got if k == "img_srcset"]
    assert srcset == ["/c.webp", "/a.png", "/b.png"]
    assert ("input_src", "/btn.gif") in got
    assert ("link_href", "/s.css") in got  # stylesheet pass
    assert ("link_href", "/f.woff2") in got  # font link pass
    assert ("link_href", "/fav.ico") in got  # image link pass
    assert ("script_src", "/app.js") in got
    assert ("audio_src", "/a.mp3") in got and ("video_src", "/v.mp4") in got
    assert ("css_url", "/bg.jpg") in got and ("css_url", "/ff.ttf") in got
    assert ("inline_script_src", "/dyn.js") in got


def test_html_comment_stripping():
    html = '<a href="/live">x</a><!-- <a href="/commented">y</a> -->'
    assert ("a_href", "/commented") in find_html_links(html)
    got = find_html_links(html, ExtractFlags(ignore_html_comments=True))
    assert got == [("a_href", "/live")]


def test_flag_gating():
    html = (
        '<a href="/p">x</a><a href="/file.pdf">f</a><img src="/i.png">'
        '<script src="/s.js"></script><link rel="stylesheet" href="/c.css">'
    )
    assert find_html_links(html, ExtractFlags(single_page=True)) == [
        ("img_src", "/i.png"),
        ("script_src", "/s.js"),
        ("link_href", "/c.css"),
    ]
    no_img = find_html_links(html, ExtractFlags(images_enabled=False))
    assert all(k != "img_src" for k, _ in no_img)
    no_js = find_html_links(html, ExtractFlags(scripts_enabled=False))
    assert all(k != "script_src" for k, _ in no_js)
    # files disabled: a_href to non-HTML file extensions dropped
    no_files = find_html_links(html, ExtractFlags(files_enabled=False))
    hrefs = [t for k, t in no_files if k == "a_href"]
    assert hrefs == ["/p"]
    # single_foreign_page suppresses a_href only on foreign-d2l sources
    foreign = find_html_links(
        html,
        ExtractFlags(single_foreign_page=True),
        source_d2l="other.test",
        initial_d2l="example.test",
    )
    assert all(k != "a_href" for k, _ in foreign)


def test_css_js_xml_extractors():
    css = '@import url("deep.css"); .a{background:url(x.png)} @font-face{src:url(f.woff)}'
    assert [t for _, t in find_css_links(css)] == ["deep.css", "x.png", "f.woff"]
    assert [t for _, t in find_css_links(css, ExtractFlags(fonts_enabled=False))] == [
        "deep.css",
        "x.png",
    ]

    js = 'import x from "./m.js"; const a="/assets/app.js"; f("https://cdn.t/l.js")'
    assert [t for _, t in find_js_links(js)] == ["./m.js", "/assets/app.js", "https://cdn.t/l.js"]
    assert find_js_links('const a="/plain.js";') == []  # reference bails without 'from'
    assert find_js_links("<html>from x import y</html>") == []

    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e.com/a</loc></url><url><loc>https://e.com/b</loc></url></urlset>"
    )
    assert [t for _, t in find_sitemap_locs(xml)] == ["https://e.com/a", "https://e.com/b"]
    idx = (
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://e.com/readme.txt</loc></sitemap>"
        "<sitemap><loc>https://e.com/s2.xml.gz</loc></sitemap></sitemapindex>"
    )
    assert [t for _, t in find_sitemap_locs(idx)] == ["https://e.com/s1.xml", "https://e.com/s2.xml.gz"]

    import gzip

    body = gzip.compress(xml.encode())
    assert maybe_gunzip(body).decode() == xml
    assert maybe_gunzip(b"plain") == b"plain"


def test_webpack_chunks():
    js = (
        'x="assets/js/"+function(e){return({5:"vendors~docsearch"}[e]||e)+"."'
        '+{5:"ab12cd",7:"ef34ab"}[e]+".js"}(e) from "x.js"'
    )
    got = [t for _, t in find_js_links(js)]
    assert "/assets/js/5.ab12cd.js" in got
    assert "/assets/js/vendors~docsearch.ab12cd.js" in got
    assert "/assets/js/7.ef34ab.js" in got


# ------------------------------------------------------- generator round-trip
def _expected_links(spans):
    """Dedup'd (normalize-key first-wins) link spans a page should yield."""
    out, seen = [], set()
    for s in sorted(spans, key=lambda x: x["offset"]):
        if s["kind"] in NON_LINK_KINDS or s["kind"] == "redirect_location":
            continue
        if s["text"].startswith("#"):  # fragment-leading hrefs never extracted
            continue
        key = normalize_href(s["text"])
        if key in seen:
            continue
        seen.add(key)
        out.append((s["kind"], s["text"]))
    return out


def test_framework_extractors():
    """F7 vectors lifted from the reference's own unit tests
    (astro_processor.rs:252-262, nextjs_processor.rs find_urls gates,
    svelte_processor.rs:85-92)."""
    from siteone_crawler_spark.operators.extract import (
        astro_offline_scripts,
        extract_spans,
        find_astro_links,
        find_nextjs_manifest_links,
        nextjs_pre_parse,
        strip_svelte_tags,
    )

    astro_html = (
        '<astro-island component-url="/_astro/TestSlider.fb32dc5a.js" '
        'component-export="default" renderer-url="/_astro/client.c4e17359.js">'
    )
    assert find_astro_links(astro_html) == [
        ("js_url", "/_astro/TestSlider.fb32dc5a.js"),
        ("js_url", "/_astro/client.c4e17359.js"),
    ]
    # content gate is a case-sensitive 'astro' substring
    assert find_astro_links('<div component-url="/x.js">ASTRO</div>') == []
    assert find_astro_links("<html><body>Regular page</body></html>") == []

    # Astro finds lead the HTML processor's in span order (manager.rs:801-802)
    spans = extract_spans(
        astro_html + '<a href="/about">a</a>', "text/html", "https://ex.test/p"
    )
    kinds = [(s["kind"], s["text"]) for s in spans]
    assert kinds.index(("js_url", "/_astro/TestSlider.fb32dc5a.js")) < kinds.index(
        ("a_href", "/about")
    )

    # Next.js manifest: source-path gated; base dir = path through '/_next/';
    # the reference regex matches a SINGLE char before .js (mirrored quirk)
    manifest = 'self.__BUILD_MANIFEST={a:"1.js",b:"2.js"}'
    assert find_nextjs_manifest_links(manifest, "/_next/static/build-manifest.js") == [
        ("js_url", "/_next/1.js"),
        ("js_url", "/_next/2.js"),
    ]
    assert find_nextjs_manifest_links(manifest, "/_next/static/chunks/app.js") == []
    assert find_nextjs_manifest_links(manifest, "/static/manifest.js") == []

    # pre-parse strips static-asset query params and ?dpl= ids
    assert (
        nextjs_pre_parse('"/_next/static/chunks/main.js?v=123&x=1"')
        == '"/_next/static/chunks/main.js"'
    )
    assert nextjs_pre_parse('"/_next/a.css?dpl=dpl_abc123" x') == '"/_next/a.css" x'

    # Svelte offline transform removes <svelte:*> tags
    sv = "<html><head><svelte:head></svelte:head></head><body>test</body></html>"
    assert "<svelte:" not in strip_svelte_tags(sv)
    # Astro offline transform demotes module scripts for file:// use
    mod = '<html><!-- astro --><script type="module" src="/_astro/app.js"></script></html>'
    out = astro_offline_scripts(mod)
    assert '<script src="/_astro/app.js"></script>' in out and 'type="module"' not in out


def test_render_extract_roundtrip():
    site = generate_site(seed=11, n_hosts=2, docs_per_host=22)
    metas = site.meta_map()
    for d in site.docs:
        ct = metas[d["doc_id"]]["content_type_header"]
        body = render_doc_body(d["doc_id"], d["spans"], ct)
        got = extract_spans(body, ct, source_url=d["doc_id"])
        # extraction may emit the same url from two processors (Html + Css
        # passes) — the reference dedups at the queue; mirror that here
        got_links, seen = [], set()
        for s in got:
            if s["kind"] in NON_LINK_KINDS:
                continue
            key = normalize_href(s["text"])
            if key in seen:
                continue
            seen.add(key)
            got_links.append((s["kind"], s["text"]))
        exp = _expected_links(d["spans"])
        # per-kind sequences must match exactly (dispatch reorders kinds)
        kinds = {k for k, _ in exp} | {k for k, _ in got_links}
        for k in kinds:
            assert [t for kk, t in got_links if kk == k] == [t for kk, t in exp if kk == k], (
                d["doc_id"],
                k,
            )
        # base_href recovered
        exp_base = [s["text"] for s in d["spans"] if s["kind"] == "base_href"]
        got_base = [s["text"] for s in got if s["kind"] == "base_href"]
        assert got_base == exp_base, d["doc_id"]


# ------------------------------------- end-to-end extraction-mode crawl parity

def test_extraction_mode_crawl_parity(spark, tmp_path):
    """HTML bodies -> extract UDF -> spans -> engine must equal the simulator
    running on the SAME extracted spans (computed by the shared kernel)."""
    from siteone_crawler_spark.engine import CrawlEngine
    from siteone_crawler_spark.generator import META_SCHEMA
    from siteone_crawler_spark.sources.docs import spans_from_html

    site = generate_site(seed=23, n_hosts=2, docs_per_host=18)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))
    html_rows = site_to_html(site)
    initial_host = site.seeds[0][0].split("//", 1)[1].split("/", 1)[0]

    # simulator consumes kernel-extracted spans
    site2 = generate_site(seed=23, n_hosts=2, docs_per_host=18)
    site2.docs = [
        {
            "doc_id": doc_id,
            "spans": extract_spans(body, ct, source_url=doc_id, initial_host=initial_host),
        }
        for doc_id, ct, body in html_rows
    ]
    sim = simulate(site2, cfg)
    assert len(sim.crawl_order) > 20

    # engine consumes UDF-extracted spans
    html_df = spark.createDataFrame(html_rows, "doc_id string, content_type string, body string")
    docs = spans_from_html(html_df, initial_host=initial_host)
    meta = spark.createDataFrame(
        [
            (m["doc_id"], m["status_code"], m["content_type_header"], m["redirect_location"],
             m["size"], m["request_time_ms"], m.get("headers"))
            for m in site.meta
        ],
        schema=META_SCHEMA,
    )
    eng = CrawlEngine(spark, cfg, str(tmp_path / "ext"), n_buckets=8)
    tables = eng.run(docs, meta, site.robots, site.seeds)
    got = [
        (r["seq"], r["url"], r["uq_id"], r["source_uq_id"], r["source_attr"], r["wave"],
         r["status_code"])
        for r in tables["visited"].orderBy("seq").collect()
    ]
    exp = [t[:7] for t in sim.crawl_order]
    assert len(got) == len(exp), (len(got), len(exp))
    for g, e in zip(got, exp):
        assert g == e, f"\n got: {g}\n exp: {e}"
    got_skipped = {
        (r["url"], r["reason"], r["source_uq_id"], r["source_attr"])
        for r in tables["skipped"].collect()
    }
    assert got_skipped == set(sim.skipped)
