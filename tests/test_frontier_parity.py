"""Crawl-order / URL-seen / skipped parity: CrawlEngine (Spark) vs the
reference-faithful workers=1 simulator, on the same generated site.

This is the fixture strategy from FIXTURES.md §5: the simulator produces
expected_crawl_order / expected_url_seen / expected_skipped, and the
distributed engine must reproduce them exactly (BFS order at workers=1
semantics, per BASELINE.md)."""

import shutil

import pytest

from siteone_crawler_spark.config import CrawlConfig
from siteone_crawler_spark.engine import CrawlEngine
from siteone_crawler_spark.generator import generate_site, site_to_dfs
from siteone_crawler_spark.simulator import simulate


def run_engine(spark, site, cfg, tmpdir, **kw):
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    eng = CrawlEngine(spark, cfg, str(tmpdir), n_buckets=8)
    return eng, eng.run(docs, meta, site.robots, site.seeds, **kw)


def assert_parity(sim, tables):
    visited = [
        (r["seq"], r["url"], r["uq_id"], r["source_uq_id"], r["source_attr"], r["wave"],
         r["status_code"])
        for r in tables["visited"].orderBy("seq").collect()
    ]
    expected = [t[:7] for t in sim.crawl_order]
    assert len(visited) == len(expected), (len(visited), len(expected))
    for got, exp in zip(visited, expected):
        assert got == exp, f"\n got: {got}\n exp: {exp}"

    got_seen = {r["url_key"] for r in tables["frontier"].select("url_key").collect()}
    assert got_seen == set(sim.seen.keys())

    got_skipped = {
        (r["url"], r["reason"], r["source_uq_id"], r["source_attr"])
        for r in tables["skipped"].collect()
    }
    assert got_skipped == set(sim.skipped)


@pytest.mark.parametrize(
    "cfg_kw",
    [
        dict(allowed_domains=("*.example.test",)),
        dict(),  # single-host: cross-host links -> skipped(NotAllowedHost)
        dict(allowed_domains=("*.example.test",), remove_query_params=True),
        dict(allowed_domains=("*.example.test",), max_depth=2),
        dict(allowed_domains=("*.example.test",), crawl_assets=False),
        dict(allowed_domains=("*.example.test",), ignore_robots_txt=True),
        dict(allowed_domains=("*.example.test",), max_visited_urls=25),
        dict(allowed_domains=("*.example.test",), ignore_regex=(r"/docs/",)),
    ],
)
def test_parity_configs(spark, tmp_path, cfg_kw):
    site = generate_site(seed=42, n_hosts=2, docs_per_host=20)
    cfg = CrawlConfig(**cfg_kw)
    sim = simulate(site, cfg)
    _, tables = run_engine(spark, site, cfg, tmp_path / "ckpt")
    assert_parity(sim, tables)


def test_parity_larger_site(spark, tmp_path):
    site = generate_site(seed=7, n_hosts=3, docs_per_host=40)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))
    sim = simulate(site, cfg)
    _, tables = run_engine(spark, site, cfg, tmp_path / "ckpt")
    assert_parity(sim, tables)


def test_resume_bit_identical(spark, tmp_path):
    """Kill after 2 waves, resume, and compare every table to an
    uninterrupted run — the resumability the reference lacks (R3)."""
    site = generate_site(seed=3, n_hosts=2, docs_per_host=15)
    cfg = CrawlConfig(allowed_domains=("*.example.test",))

    _, full = run_engine(spark, site, cfg, tmp_path / "full")

    # interrupted: stop after 2 waves, then resume with a FRESH engine
    docs, meta, robots, seeds = site_to_dfs(spark, site)
    e1 = CrawlEngine(spark, cfg, str(tmp_path / "part"), n_buckets=8)
    e1.run(docs, meta, site.robots, site.seeds, max_waves=2)
    assert not e1.store.read_manifest()["done"]
    e2 = CrawlEngine(spark, cfg, str(tmp_path / "part"), n_buckets=8)
    resumed = e2.run(docs, meta, site.robots, site.seeds)
    assert e2.store.read_manifest()["done"]

    for t in ("visited", "frontier", "skipped"):
        a = sorted(map(tuple, full[t].collect()))
        b = sorted(map(tuple, resumed[t].collect()))
        assert a == b, f"table {t} differs after resume"


def test_breaker_parity(spark, tmp_path):
    """The basename circuit breaker (-6 short-circuits) must match the
    sequential reference semantics exactly, including mid-wave trips."""
    site = generate_site(seed=42, n_hosts=1, docs_per_host=30, with_breaker_family=True)
    cfg = CrawlConfig(allowed_domains=("*.example.test",), max_non200_per_basename=3)
    sim = simulate(site, cfg)
    assert any(t[6] == -6 for t in sim.crawl_order), "fixture must exercise -6"
    _, tables = run_engine(spark, site, cfg, tmp_path / "ckpt")
    assert_parity(sim, tables)


def test_queue_cap_parity(spark, tmp_path):
    site = generate_site(seed=42, n_hosts=2, docs_per_host=25)
    cfg = CrawlConfig(allowed_domains=("*.example.test",), max_queue_length=10)
    sim = simulate(site, cfg)
    _, tables = run_engine(spark, site, cfg, tmp_path / "ckpt")
    assert_parity(sim, tables)
