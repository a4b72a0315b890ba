"""Accessibility analyzer vectors (accessibility_analyzer.rs semantics)."""


def _stats(spark, html, url="https://a.test/p"):
    from siteone_crawler_spark.operators.accessibility import accessibility_stats

    df = spark.createDataFrame([(url, html)], "url string, body string")
    return accessibility_stats(df).collect()[0]


def test_img_alt(spark):
    r = _stats(
        spark,
        '<html lang="en"><body><main>'
        '<img src="a.png" alt="A"><img src="b.png" alt=""><img src="c.png">'
        "</main></body></html>",
    )
    # alt="" counts as PRESENT (decorative) — only truly missing attr flags
    assert r["n_img"] == 3 and r["n_img_no_alt"] == 1
    assert r["has_main"] is True and r["has_lang"] is True


def test_form_labels(spark):
    html = """<html><body>
      <label for="name">Name</label><input id="name" type="text">
      <input id="free" type="text">
      <input type="hidden" name="csrf">
      <input type="submit" value="Go">
      <select aria-label="Pick"></select>
      <textarea title="Notes"></textarea>
      <textarea id="bare"></textarea>
    </body></html>"""
    r = _stats(spark, html)
    # hidden/submit excluded; labeled: name(label-for), select(aria-label),
    # textarea(title); unlabeled: free, bare
    assert r["n_controls"] == 5
    assert r["n_controls_unlabeled"] == 2


def test_unnamed_interactive(spark):
    html = (
        '<a href="/x">Text name</a>'
        '<a href="/y"><img src="i.png" alt="icon"></a>'
        '<a href="/z" aria-label="Close"><svg></svg></a>'
        '<a href="/bad"><svg></svg></a>'
        "<button>OK</button>"
        '<button title="Menu"><svg></svg></button>'
        "<button><svg></svg></button>"
    )
    r = _stats(spark, html)
    assert r["n_interactive"] == 7
    assert r["n_unnamed_interactive"] == 2  # /bad anchor + last button


def test_landmarks_lang_ids(spark):
    r = _stats(spark, "<html><body><p>x</p></body></html>")
    assert r["has_main"] is False and r["has_lang"] is False
    r2 = _stats(spark, '<html lang=""><body><div role="main"></div></body></html>')
    assert r2["has_main"] is True and r2["has_lang"] is False  # empty lang

    dup = '<div id="a"></div><div id="a"></div><label for="ghost">g</label>'
    r3 = _stats(spark, dup)
    assert r3["n_duplicate_ids"] == 1
    assert r3["n_dangling_label_for"] == 1


def test_accessibility_summary(spark):
    from siteone_crawler_spark.operators.accessibility import accessibility_summary

    docs = spark.createDataFrame(
        [
            ("https://a.test/1", '<html lang="en"><main><img src="x" alt="y"></main></html>'),
            ("https://a.test/2", "<html><body><img src='n'></body></html>"),
        ],
        "url string, body string",
    )
    r = accessibility_summary(docs).collect()[0]
    assert r["n_pages"] == 2
    assert r["pages_missing_img_alt"] == 1
    assert r["pages_missing_main_landmark"] == 1
    assert r["pages_missing_lang"] == 1
