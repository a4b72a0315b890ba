"""Analyzer aggregations over engine output + streaming telemetry."""

import pytest
from pyspark.sql import functions as F

from siteone_crawler_spark.config import CrawlConfig
from siteone_crawler_spark.generator import generate_site, site_to_dfs
from siteone_crawler_spark.simulator import simulate


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    from siteone_crawler_spark.engine import CrawlEngine

    site = generate_site(seed=42, n_hosts=2, docs_per_host=20)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    eng = CrawlEngine(spark, cfg, ckpt, n_buckets=8)
    tables = eng.run(docs, meta, site.robots, site.seeds)
    return site, cfg, tables, ckpt


def test_analyzer_tables(spark, crawl):
    from siteone_crawler_spark.operators import analyzers as A

    site, cfg, tables, _ = crawl
    visited, skipped = tables["visited"], tables["skipped"]
    sim = simulate(site, cfg)

    bs = A.basic_stats(visited).collect()[0]
    assert bs["total_urls"] == len(sim.crawl_order)
    assert bs["p90_html_ms"] is not None

    cbs = {r["status_code"]: r["n"] for r in A.count_by_status(visited).collect()}
    from collections import Counter

    exp = Counter(t[6] for t in sim.crawl_order)
    assert cbs == dict(exp)

    cts = {r["content_type"]: r["n"] for r in A.content_type_stats(visited).collect()}
    assert cts.get("html", 0) > 0 and cts.get("stylesheet", 0) > 0

    sd = A.source_domain_stats(visited).collect()
    assert {r["host"] for r in sd} == {"h0000.example.test", "h0001.example.test"}

    sk = {(r["reason"], r["domain"]): r["n"] for r in A.skipped_summary(skipped).collect()}
    exp_sk = Counter((t[1], t[0].split("/")[2]) for t in sim.skipped)
    assert sk == dict(exp_sk)

    ext = A.external_links(skipped).collect()
    assert all(r["n"] >= 1 and r["sources"] for r in ext)

    slow = A.top_slowest(visited, k=5).collect()
    times = [r["request_time_ms"] for r in slow]
    assert times == sorted(times, reverse=True) and len(slow) == 5
    fast = A.top_fastest(visited, k=5).collect()
    assert [r["request_time_ms"] for r in fast] == sorted(r["request_time_ms"] for r in fast)

    red = A.redirects_list(visited).collect()
    assert all(301 <= r["status_code"] <= 308 for r in red)
    exp_redirect_targets = [t for t in sim.crawl_order if t[4] == 80]
    assert sum(r["target_url"] is not None for r in red) == len(exp_redirect_targets)

    e404 = A.errors_list(visited, 404).collect()
    exp_404 = [t for t in sim.crawl_order if t[6] == 404]
    assert len(e404) == len(exp_404)
    assert all(r["source_url"] is not None for r in e404)

    ws = A.wave_stats(visited).collect()
    assert sum(r["n"] for r in ws) == len(sim.crawl_order)

    # per-partition lineage: file-level row counts reconcile with the tables
    lin = tables["lineage"].collect()
    vis_rows = sum(r["n_rows"] for r in lin if r["table"] == "visited")
    assert vis_rows == len(sim.crawl_order)
    assert all(r["n_bytes"] > 0 for r in lin)


def test_streaming_telemetry(spark, crawl):
    from siteone_crawler_spark.streaming import run_to_memory, visited_stream
    from siteone_crawler_spark.streaming.telemetry import status_mix

    site, cfg, tables, ckpt = crawl
    stream = visited_stream(spark, ckpt)
    assert stream.isStreaming
    run_to_memory(status_mix(stream), name="t_telemetry")
    got = spark.sql("SELECT sum(n) AS total FROM t_telemetry").collect()[0]["total"]
    assert got == tables["visited"].count()


def test_streaming_windowed_and_stateful(spark, crawl):
    """Watermarked event-time windows + applyInPandasWithState custom
    stateful operator over the visited stream."""
    from siteone_crawler_spark.streaming import run_to_memory, visited_stream
    from siteone_crawler_spark.streaming.telemetry import (
        fetch_time_windows,
        host_budget_state_stream,
    )

    site, cfg, tables, ckpt = crawl
    n_visited = tables["visited"].count()

    stream = visited_stream(spark, ckpt)
    win = fetch_time_windows(stream)
    q = (
        win.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_windows")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # append mode only emits windows the watermark has closed; a second
    # batch would flush the tail — assert the aggregate structure instead
    rows = spark.sql("SELECT * FROM t_windows").collect()
    assert all(r["n_fetches"] >= 1 for r in rows)

    state = host_budget_state_stream(stream, budget=5)
    q2 = (
        state.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .trigger(availableNow=True)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = {
        r["host"]: (r["n_total"], r["over_budget"])
        for r in spark.sql(
            "SELECT host, max(n_total) AS n_total, max(over_budget) AS over_budget"
            " FROM t_state GROUP BY host"
        ).collect()
    }
    per_host = {
        r["host"]: r["n"]
        for r in tables["visited"].groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert {h: v[0] for h, v in got.items()} == per_host
    for h, n in per_host.items():
        assert got[h][1] == (n > 5)


def test_politeness_budget(spark, tmp_path):
    """North-rule superset: per-host wave budget defers rows instead of
    dropping them; every URL still gets visited exactly once."""
    from siteone_crawler_spark.engine import CrawlEngine

    # no breaker family: -6 short-circuits depend on visit ORDER, so the
    # discovered set is only order-independent without failing URL families
    site = generate_site(seed=5, n_hosts=2, docs_per_host=12, with_breaker_family=False)
    cfg = CrawlConfig(allowed_domains=("*.example.test",), per_host_wave_budget=3)
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "ckpt"), n_buckets=8)
    tables = eng.run(docs, meta, site.robots, site.seeds)

    base = simulate(site, CrawlConfig(allowed_domains=("*.example.test",)))
    got_urls = {r["url"] for r in tables["visited"].collect()}
    assert got_urls == {t[1] for t in base.crawl_order}
    assert tables["visited"].count() == len(base.crawl_order)  # no dupes
    # budget actually bound: more waves than the unconstrained BFS depth
    assert tables["last_wave"] > base.waves
