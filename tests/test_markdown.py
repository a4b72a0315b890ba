"""F16: HTML->Markdown converter — behavior vectors mirroring the
reference's html_to_markdown.rs tests (:1190-1390)."""

from __future__ import annotations

from siteone_crawler_spark.sources.markdown import html_to_markdown as md


def test_basic_elements():
    assert "Hello world" in md("<p>Hello world</p>")
    assert "# Title" in md("<h1>Title</h1>")
    assert "Title\n=====" in md("<h1>Title</h1>", heading_style="setext")
    assert "**bold text**" in md("<strong>bold text</strong>")
    assert "*italic text*" in md("<em>italic text</em>")
    assert "[Example](https://example.com)" in md('<a href="https://example.com">Example</a>')
    assert "![An image](image.jpg)" in md('<img src="image.jpg" alt="An image">')
    assert "~~deleted text~~" in md("<del>deleted text</del>")
    assert "* * *" in md("<hr>")
    assert "`foo`" in md("<code>foo</code>")


def test_lists():
    out = md("<ul><li>Item 1</li><li>Item 2</li></ul>")
    assert "- Item 1" in out and "- Item 2" in out
    out = md("<ol><li>First</li><li>Second</li></ol>")
    assert "1. First" in out and "2. Second" in out
    out = md("<ul><li>A<ul><li>A1</li></ul></li></ul>")
    assert "- A" in out and "    - A1" in out


def test_code_block():
    out = md('<pre><code class="language-rust">fn main() {}</code></pre>')
    assert "```rust" in out and "fn main() {}" in out and out.count("```") >= 2


def test_table():
    out = md("<table><tr><th>Name</th><th>Age</th></tr><tr><td>A</td><td>1</td></tr></table>")
    assert "| Name" in out and "| A" in out and "---" in out


def test_blockquote():
    out = md("<blockquote><p>quoted</p></blockquote>")
    assert "> quoted" in out


def test_exclusions():
    out = md('<div><p>Keep this</p><div class="hidden">Remove this</div></div>')
    assert "Keep this" in out and "Remove this" not in out
    out = md("<div><p>Content</p><script>alert('test')</script></div>")
    assert "Content" in out and "alert" not in out
    out = md('<div><p>Visible</p><nav aria-hidden="true">Hidden mega-menu</nav></div>')
    assert "Visible" in out and "Hidden mega-menu" not in out
    out = md('<div><p>Content</p><div aria-hidden="true"><a href="/">Home</a><a href="/a">About</a></div></div>')
    assert "Content" in out and "Home" not in out and "About" not in out
    out = md('<div><p>Page content</p><div role="menu"><span>Menu Item</span></div></div>')
    assert "Page content" in out and "Menu Item" not in out
    # user-supplied excluded selector
    out = md('<div><p>Keep</p><div class="ads">Buy now</div></div>', excluded_selectors=[".ads"])
    assert "Keep" in out and "Buy now" not in out


def test_adjacent_blocks_have_spacing():
    out = md("<div>text one</div><div>text two</div>")
    assert "text onetext two" not in out
    assert "text one" in out and "text two" in out
    out = md("<section>s one</section><section>s two</section>")
    assert "s ones two" not in out


def test_custom_delimiters():
    assert "__b__" in md("<b>b</b>", strong_delimiter="__")
    assert "_i_" in md("<i>i</i>", em_delimiter="_")
    assert "* I1" in md("<ul><li>I1</li></ul>", bullet_list_marker="*")


def test_spark_udf(spark):
    from siteone_crawler_spark.sources.markdown import html_to_markdown_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "<h1>T</h1><p>body</p>"), ("b", None)], "doc_id string, body string"
    )
    out = {
        r["doc_id"]: r["md"]
        for r in df.select("doc_id", html_to_markdown_udf()(F.col("body")).alias("md")).collect()
    }
    assert "# T" in out["a"] and "body" in out["a"]
    assert out["b"] is None


def test_normalize_markdown_content():
    from siteone_crawler_spark.sources.markdown import normalize_markdown_content

    src = "[About](about.html) [Deep](a/b.html#frag) ![logo](l.png) [x]()\n- \n"
    out = normalize_markdown_content(src)
    assert "[About](about.md)" in out
    assert "[Deep](a/b.md#frag)" in out
    assert "[x]()" not in out
    assert "\n- \n" not in out
    # images survive unless disabled
    assert "![logo](l.png)" in out
    out2 = normalize_markdown_content(src, disable_images=True)
    assert "![logo]" not in out2
    # ignore regexes keep matching targets untouched
    out3 = normalize_markdown_content(src, ignore_regexes=(r"^about",))
    assert "[About](about.html)" in out3


def test_export_markdown_site(spark, tmp_path):
    """S10 e2e: whole-site .md tree with rewritten inter-page links
    (markdown_exporter.rs store_file; integration baseline ~51 .md files)."""
    import os

    from siteone_crawler_spark.generator import generate_site, site_to_html
    from siteone_crawler_spark.sources.markdown import export_markdown_site

    site = generate_site(seed=4, n_hosts=1, docs_per_host=8, with_breaker_family=False)
    rows = [r for r in site_to_html(site)]
    html_df = spark.createDataFrame(rows, "doc_id string, content_type string, body string")
    out = str(tmp_path / "mdsite")
    n = export_markdown_site(html_df, out, site.seeds[0][0])
    assert n == len(rows)
    assert os.path.exists(os.path.join(out, "index.md"))
    # every page whose stored path ends .html becomes a .md file; non-.html
    # store paths (e.g. /docs/d3.php) keep rewritten HTML like the reference
    from siteone_crawler_spark.sources.offline import convert_url_to_relative

    exp_md = sum(
        1
        for u, ct, _ in rows
        if "html" in ct
        and convert_url_to_relative(
            site.seeds[0][0], site.seeds[0][0], u,
            is_external_domain_allowed_for_crawling=lambda _h: True,
        ).endswith(".html")
    )
    n_md = sum(len([f for f in fs if f.endswith(".md")]) for _, _, fs in os.walk(out))
    assert n_md == exp_md > 0
    # no stray .html files for pages; assets stored raw
    n_html_files = sum(
        len([f for f in fs if f.endswith(".html")]) for _, _, fs in os.walk(out)
    )
    assert n_html_files == 0
    idx = open(os.path.join(out, "index.md")).read()
    # inter-page links: relative AND retargeted at the .md twin
    assert ".md" in idx
    assert "https://h0000.example.test" not in idx


def test_export_markdown_site_link_goldens(spark, tmp_path):
    import os

    from siteone_crawler_spark.sources.markdown import export_markdown_site

    rows = [
        (
            "https://ex.test/",
            "text/html",
            '<html><body><h1>Home</h1><a href="/about">About</a>'
            '<a href="/a/deep/">Deep</a><img src="/img/l.png"></body></html>',
        ),
        (
            "https://ex.test/about",
            "text/html",
            '<html><body><h1>About</h1><a href="/">Home</a></body></html>',
        ),
        (
            "https://ex.test/a/deep/",
            "text/html",
            '<html><body><h1>Deep</h1><a href="/about">About</a></body></html>',
        ),
        ("https://ex.test/img/l.png", "image/png", "PNGDATA"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, content_type string, body string")
    out = str(tmp_path / "md")
    n = export_markdown_site(df, out, "https://ex.test/")
    assert n == 4
    idx = open(os.path.join(out, "index.md")).read()
    assert "[About](about.md)" in idx
    assert "[Deep](a/deep/index.md)" in idx
    assert "![](img/l.png)" in idx
    about = open(os.path.join(out, "about.md")).read()
    assert "[Home](index.md)" in about
    deep = open(os.path.join(out, "a/deep/index.md")).read()
    assert "[About](../../about.md)" in deep
    assert open(os.path.join(out, "img/l.png")).read() == "PNGDATA"


def test_combine_markdown_site(tmp_path):
    """Single-file aggregation (markdown_site_aggregator.rs:30-116): root
    page first, URL markers, common header/footer hoisted once, optional
    link/image stripping."""
    import os

    from siteone_crawler_spark.sources.markdown import combine_markdown_site

    d = str(tmp_path / "tree")
    os.makedirs(os.path.join(d, "a"), exist_ok=True)
    hdr, ftr = "SiteName", "(c) footer"
    open(os.path.join(d, "index.md"), "w").write(
        f"{hdr}\n# Home\n[About](about.md) ![l](x.png)\n{ftr}"
    )
    open(os.path.join(d, "about.md"), "w").write(f"{hdr}\n# About\nbody\n{ftr}")
    open(os.path.join(d, "a", "index.md"), "w").write(f"{hdr}\n# Deep\nzz\n{ftr}")

    md = combine_markdown_site(d, "https://ex.test/")
    # root first, then path order
    i_root = md.index("`URL: https://ex.test`")
    i_a = md.index("`URL: https://ex.test/a/`")
    i_about = md.index("`URL: https://ex.test/about`")
    assert i_root < i_a < i_about
    # header/footer hoisted exactly once
    assert md.count(hdr) == 1 and md.count(ftr) == 1
    assert md.index(hdr) < i_root and md.rindex(ftr) > i_about
    assert "# Home" in md and "# About" in md and "# Deep" in md

    plain = combine_markdown_site(d, "https://ex.test/", remove_links_and_images=True)
    assert "](" not in plain and "![" not in plain and "About" in plain
