"""Best-practice deep-check vectors (best_practice_analyzer.rs semantics)."""


def _stats(spark, html, url="https://b.test/p"):
    from siteone_crawler_spark.operators.best_practices import best_practice_stats

    df = spark.createDataFrame([(url, html)], "url string, body string")
    return best_practice_stats(df).collect()[0]


def test_inline_svgs(spark):
    small = "<svg><rect/></svg>"
    big = "<svg>" + "x" * 6000 + "</svg>"
    r = _stats(spark, small + big)
    assert r["n_svgs"] == 2 and r["n_large_svgs"] == 1
    # escaped svgs (code samples) are skipped
    r2 = _stats(spark, "<svg>&#x22;quoted&#x22;</svg>")
    assert r2["n_svgs"] == 0

    # duplicates: >5 copies of a >1KiB svg flag ONE group
    dup = "<svg>" + "y" * 1200 + "</svg>"
    r3 = _stats(spark, dup * 6 + small * 6)
    assert r3["n_duplicated_svg_groups"] == 1  # small dup group under size cap


def test_missing_quotes(spark):
    html = (
        '<a href=/unquoted>x</a>'
        '<img src="/fine.png" alt=bare>'
        '<meta content=123 name="n">'  # numeric value skipped
        '<astro-island component-url=/x.js>'  # astro skipped
    )
    r = _stats(spark, html)
    assert r["n_missing_quotes"] == 2  # href=/unquoted + alt=bare


def test_dom_depth(spark):
    html = "<html><body><div><div><p>deep</p></div></div><br><img src='x'></body></html>"
    r = _stats(spark, html)
    assert r["dom_depth"] == 5  # html>body>div>div>p; void tags don't nest
    assert r["dom_depth_verdict"] == "ok"

    deep = "<html><body>" + "<div>" * 35 + "x" + "</div>" * 35 + "</body></html>"
    assert _stats(spark, deep)["dom_depth_verdict"] == "warning"
    deeper = "<html><body>" + "<div>" * 55 + "x" + "</div>" * 55 + "</body></html>"
    assert _stats(spark, deeper)["dom_depth_verdict"] == "critical"


def test_phone_numbers(spark):
    html = (
        "<p>Call +420 123 456 789 now</p>"
        '<a href="tel:+15551234567">+1 555 123 4567</a>'
        "<p>(123) 456-7890</p>"
        "<script>var x = '+999 888 777 666';</script>"  # stripped
    )
    r = _stats(spark, html)
    # found: +420... , +1555... (clickable via tel href), +1 555 123 4567
    # (inside the tel anchor block), (123) 456-7890
    assert r["n_nonclickable_phones"] == 2  # +420... and the US one
    assert r["n_phones"] >= 3


def test_best_practice_summary(spark):
    from siteone_crawler_spark.operators.best_practices import best_practice_summary

    docs = spark.createDataFrame(
        [
            ("https://b.test/1", "<a href=/x>y</a>"),
            ("https://b.test/2", "<p>clean</p>"),
        ],
        "url string, body string",
    )
    r = best_practice_summary(docs).collect()[0]
    assert r["n_pages"] == 2 and r["pages_missing_quotes"] == 1
    assert r["pages_deep_dom"] == 0
