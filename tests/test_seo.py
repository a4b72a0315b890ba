"""SEO/OpenGraph analyzer vectors — incl. ones lifted from the reference's
own unit tests (seo_opengraph_analyzer.rs:959-983)."""


PAGE = """<html><head>
<title>  My   Page </title>
<meta name="description" content="A fine page">
<meta content="kw1, kw2" name="keywords">
<meta name="robots" content="NOINDEX, nofollow">
<link rel="canonical" href="https://s.test/canon">
<meta property="og:title" content="OG Title">
<meta content="https://s.test/img.png" property="og:image">
<meta name="twitter:card" content="summary">
</head><body>
<h1>Main <b>Heading</b></h1>
<h2>Sub A</h2><h3>Deep</h3><h2>Sub B</h2>
</body></html>"""


def _one(spark, html, url="https://s.test/a/b?q=1"):
    return spark.createDataFrame([(url, html)], "url string, body string")


def test_seo_fields(spark):
    from siteone_crawler_spark.operators.seo import seo_stats

    r = seo_stats(_one(spark, PAGE)).collect()[0]
    assert r["path"] == "/a/b?q=1"
    assert r["title"] == "My Page"  # whitespace collapsed + trimmed
    assert r["description"] == "A fine page"
    assert r["keywords"] == "kw1, kw2"  # reversed attribute order
    assert r["h1"] == "Main Heading"  # inner tags stripped
    assert r["noindex"] is True and r["nofollow"] is True  # case-insensitive
    assert r["canonical"] == "https://s.test/canon"


def test_seo_absent_fields(spark):
    from siteone_crawler_spark.operators.seo import seo_stats

    # reference unit vectors: no canonical -> None (rs:973-977)
    r = seo_stats(_one(spark, "<html><body>hi</body></html>")).collect()[0]
    assert r["title"] is None and r["canonical"] is None
    assert r["noindex"] is False and r["nofollow"] is False


def test_og_and_twitter(spark):
    from siteone_crawler_spark.operators.seo import og_stats

    r = og_stats(_one(spark, PAGE)).collect()[0]
    assert r["og_title"] == "OG Title"
    assert r["og_image"] == "https://s.test/img.png"  # reversed attr order
    assert r["og_description"] is None
    assert r["twitter_card"] == "summary"
    assert r["has_og"] is True
    r2 = og_stats(_one(spark, "<p>no og</p>")).collect()[0]
    assert r2["has_og"] is False


def test_heading_tree(spark):
    from siteone_crawler_spark.operators.seo import heading_stats

    r = heading_stats(_one(spark, PAGE)).collect()[0]
    assert r["n_headings"] == 4 and r["n_h1"] == 1 and r["h1_error"] is False
    assert r["heading_texts"] == ["Main Heading", "Sub A", "Deep", "Sub B"]

    two_h1 = "<h1>a</h1><h1>b</h1>"
    r2 = heading_stats(_one(spark, two_h1)).collect()[0]
    assert r2["n_h1"] == 2 and r2["h1_error"] is True
    r3 = heading_stats(_one(spark, "<p>none</p>")).collect()[0]
    assert r3["n_h1"] == 0 and r3["h1_error"] is True  # exactly-one expected

    # max_level caps the tree (set_config, rs:49-51)
    r4 = heading_stats(_one(spark, PAGE), max_level=2).collect()[0]
    assert r4["n_headings"] == 3 and r4["heading_texts"] == ["Main Heading", "Sub A", "Sub B"]


def test_seo_summary(spark):
    from siteone_crawler_spark.operators.seo import seo_summary

    docs = spark.createDataFrame(
        [
            ("https://s.test/1", PAGE),
            ("https://s.test/2", "<html><body><h1>only h1</h1></body></html>"),
            ("https://s.test/3", "<title>t</title><h1>x</h1><h1>y</h1>"),
        ],
        "url string, body string",
    )
    r = seo_summary(docs).collect()[0]
    assert r["n_pages"] == 3
    assert r["missing_title"] == 1 and r["missing_description"] == 2
    assert r["missing_h1"] == 0
    assert r["noindex_pages"] == 1
    assert r["h1_count_errors"] == 1
