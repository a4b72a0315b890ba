"""A13/A14: quality scorer invariants (mirroring scorer.rs:701-735 tests)
and CI-gate exit codes (ci_gate.rs:580-680), plus the integration-style
"crawl a healthy synthetic site -> overall quality >= 7" assertion the
reference pins in tests/integration_crawl.rs:28-97."""

from __future__ import annotations

from siteone_crawler_spark.operators.scoring import (
    CATEGORY_WEIGHTS,
    CrawlStats,
    calculate_scores,
    crawl_summary,
    evaluate_ci_gate,
    round1,
    score_label,
)


def _stats(**kw) -> CrawlStats:
    base = dict(total_urls=50, avg_time_s=0.2, p90_html_s=0.3, max_time_s=0.9,
                count_by_status={200: 50})
    base.update(kw)
    return CrawlStats(**base)


def test_weights_sum_to_one():
    assert abs(sum(CATEGORY_WEIGHTS.values()) - 1.0) < 1e-9
    scores = calculate_scores({}, _stats())
    assert abs(sum(c.weight for c in scores.categories) - 1.0) < 1e-9


def test_overall_is_weighted_average():
    scores = calculate_scores({"slowUrls": 3, "redirects": 2}, _stats(avg_time_s=1.5))
    expected = round1(sum(c.score * c.weight for c in scores.categories))
    assert scores.overall.score == expected


def test_score_label_thresholds():
    assert score_label(9.5) == "Excellent"
    assert score_label(8.0) == "Good"
    assert score_label(5.5) == "Fair"
    assert score_label(3.5) == "Poor"
    assert score_label(1.0) == "Critical"


def test_empty_summary_scores_ten():
    scores = calculate_scores({}, _stats())
    for c in scores.categories:
        assert c.score == 10.0, c
    assert scores.overall.score == 10.0


def test_slow_response_reduces_performance():
    scores = calculate_scores({}, _stats(avg_time_s=1.5))
    perf = next(c for c in scores.categories if c.code == "performance")
    assert perf.score < 10.0


def test_per_url_caps():
    # 100 pages without h1 at 0.3/url hits the 2.5 per-type cap, not 30
    scores = calculate_scores({"pages-without-h1": 100}, _stats())
    seo = next(c for c in scores.categories if c.code == "seo")
    assert seo.score == 7.5
    # stacked per-url rules cannot exceed the 5.0 per-category budget
    scores = calculate_scores(
        {"pages-without-h1": 100, "pages-with-multiple-h1": 100,
         "title-uniqueness": 100, "meta-description-uniqueness": 100,
         "redirects": 100},
        _stats(),
    )
    seo = next(c for c in scores.categories if c.code == "seo")
    assert seo.score >= 5.0 - 1e-9


def test_404_tiers():
    for n, pts in ((1, 0.5), (3, 1.0), (10, 1.5), (25, 2.0)):
        scores = calculate_scores({}, _stats(count_by_status={200: 10, 404: n}))
        seo = next(c for c in scores.categories if c.code == "seo")
        assert seo.score == round1(10.0 - pts), (n, seo.score)


def test_ci_gate_exit_codes():
    scores = calculate_scores({}, _stats())
    # empty crawl -> immediate fail, exit 10 (ci_gate.rs:38-53)
    r = evaluate_ci_gate(scores, CrawlStats(), {})
    assert not r.passed and r.exit_code == 10
    # all-negative statuses count as empty
    r = evaluate_ci_gate(scores, CrawlStats(total_urls=3, count_by_status={-1: 3}), {})
    assert r.exit_code == 10
    # healthy crawl with min score met -> 0
    r = evaluate_ci_gate(scores, _stats(), {}, min_score=7.0)
    assert r.passed and r.exit_code == 0
    # 404 budget exceeded -> 10
    r = evaluate_ci_gate(
        scores, _stats(count_by_status={200: 10, 404: 5}), {}, max_404=2
    )
    assert not r.passed and r.exit_code == 10
    # category threshold
    bad = calculate_scores({"slowUrls": 100}, _stats(avg_time_s=2.0, max_time_s=9.0))
    r = evaluate_ci_gate(bad, _stats(), {}, min_category={"performance": 9.0})
    assert r.exit_code == 10
    # forbidden code present -> 10; ignored -> 0
    r = evaluate_ci_gate(scores, _stats(), {"mixed-content": 2}, fail_on_code=("mixed-content",))
    assert r.exit_code == 10
    r = evaluate_ci_gate(
        scores, _stats(), {"mixed-content": 2},
        fail_on_code=("mixed-content",), ignore_code=("mixed-content",),
    )
    assert r.exit_code == 0


def test_crawl_quality_integration(spark, tmp_path):
    """Crawl the healthy synthetic site end-to-end and assert overall
    quality >= 7.0 — the reference's headline integration assertion."""
    import tempfile

    from siteone_crawler_spark.config import CrawlConfig
    from siteone_crawler_spark.engine import CrawlEngine
    from siteone_crawler_spark.generator import generate_site, site_to_dfs

    site = generate_site(seed=3, n_hosts=2, docs_per_host=15, with_breaker_family=False)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "q"), n_buckets=8)
    tables = eng.run(docs, meta, site.robots, site.seeds)

    summary, stats = crawl_summary(tables["visited"], tables["skipped"])
    assert stats.total_urls > 20
    scores = calculate_scores(summary, stats)
    assert scores.overall.score >= 7.0, (scores.overall, summary)
    gate = evaluate_ci_gate(scores, stats, summary, min_score=7.0)
    assert gate.exit_code == 0, gate.checks


def test_gopher_flags_rule_vectors(spark):
    """Each Gopher §A1.1 rule trips on a targeted vector (functions/text.
    gopher_flags); the oracle pair `gopher_quality` covers corpus-wide
    parity, this pins per-rule behavior."""
    from siteone_crawler_spark.functions.text import gopher_flags
    from pyspark.sql import functions as F

    good = ("the data be of good and that quality have grown with time " * 6).strip()
    vectors = [
        ("ok", good, True),
        ("too_short", "the be of and that have with tiny", False),
        ("symbol_soup", good + " " + "# " * 40, False),
        ("bullets", good + ("\n- item" * 30), False),
        ("ellipsis_lines", good + ("\nwait for it..." * 9), False),
        ("no_stopwords", ("alpha beta gamma delta epsilon zeta " * 12).strip(), False),
        ("long_words", ("pneumonoultramicroscopics " * 60).strip(), False),
    ]
    df = spark.createDataFrame(
        [(n, t) for n, t, _ in vectors], "name string, text string"
    )
    got = {
        r["name"]: r["g"]
        for r in df.select("name", gopher_flags(F.col("text")).alias("g")).collect()
    }
    for name, _, want_keep in vectors:
        assert got[name]["keep"] == want_keep, (name, got[name].asDict())
    assert got["bullets"]["bullet_line_ratio"] > 0.9
    assert got["ellipsis_lines"]["ellipsis_line_ratio"] > 0.3
    assert got["no_stopwords"]["stop_hits"] == 0
    assert got["long_words"]["mean_word_len"] > 10
