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
