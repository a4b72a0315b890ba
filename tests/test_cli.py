"""CLI surface: the reference's option registry mapped onto the engine
(core_options.rs names/semantics) — end-to-end over a synthetic site."""

from __future__ import annotations

import os


def test_cli_synthetic_crawl_with_sinks(spark, tmp_path, capsys):
    from siteone_crawler_spark.__main__ import main

    out_json = str(tmp_path / "report.json")
    out_sitemap = str(tmp_path / "sitemap.xml")
    out_md = str(tmp_path / "mdtree")
    out_single = str(tmp_path / "site.md")
    out_eml = str(tmp_path / "report.eml")
    rc = main([
        "--synthetic-docs", "400",
        "--allowed-domains", "*.bench.test",
        "--max-waves", "3",
        "--cores", "8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--output-json-file", out_json,
        "--sitemap-xml-file", out_sitemap,
        "--markdown-export-dir", out_md,
        "--markdown-export-single-file", out_single,
        "--mail-to", "a@b.test",
        "--mail-eml-file", out_eml,
    ])
    assert rc == 0
    got = capsys.readouterr().out
    assert "crawled" in got
    assert os.path.getsize(out_json) > 0
    assert "<urlset" in open(out_sitemap).read()
    n_md = sum(
        len([f for f in fs if f.endswith(".md")]) for _, _, fs in os.walk(out_md)
    )
    assert n_md > 0
    assert "`URL: " in open(out_single).read()
    assert b"Subject:" in open(out_eml, "rb").read()


def test_cli_requires_data_plane(capsys):
    from siteone_crawler_spark.__main__ import main

    assert main(["--url", "https://x.test/"]) == 2


def test_cli_politeness_flags(spark, tmp_path):
    """--workers/--max-reqs-per-sec/--timeout (core_options.rs:328,362-363)
    reach CrawlConfig and are operative: the global rate budget admits at
    most max_reqs_per_sec * wave_seconds URLs per wave, and recorded fetches
    slower than the timeout fail with transport-error -2."""
    import json

    from siteone_crawler_spark.__main__ import main

    out_json = str(tmp_path / "r.json")
    rc = main([
        "--synthetic-docs", "400",
        "--allowed-domains", "*.bench.test",
        "--max-waves", "3",
        "--cores", "8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--workers", "2",
        "--max-reqs-per-sec", "6",
        "--wave-seconds", "1",
        "--timeout", "1",
        "--output-json-file", out_json,
    ])
    assert rc == 0
    rep = json.load(open(out_json))
    # global budget = 6 urls/wave * 3 waves is a hard ceiling
    assert 0 < rep["stats"]["totalUrls"] <= 18
    # synthetic latencies span 0..5000ms, so a 1s timeout must produce -2s
    assert "-2" in rep["stats"]["countByStatus"]
    # the flags landed in the recorded options block
    assert rep["options"]["workers"] == 2
    assert rep["options"]["max_reqs_per_sec"] == 6.0
    assert rep["options"]["request_timeout_s"] == 1.0
    assert rep["options"]["global_wave_budget"] == 6


def test_cli_fractional_rate_budget():
    """--max-reqs-per-sec 0.5 over a 1s wave must cap at 1 request/wave,
    not floor to 0 (which silently DISABLED the global budget exactly when
    the user asked for the strictest limit)."""
    from siteone_crawler_spark.__main__ import build_parser, config_from_args

    a = build_parser().parse_args(
        ["--url", "https://x.test/", "--max-reqs-per-sec", "0.5", "--wave-seconds", "1"]
    )
    assert config_from_args(a).global_wave_budget == 1
    a = build_parser().parse_args(["--url", "https://x.test/"])
    assert config_from_args(a).global_wave_budget == 0  # no rate flag: unlimited


def test_docs_to_html_body_passthrough(spark):
    """--docs-parquet advertises 'doc_id, spans|body': a body-shaped docs
    table must pass straight through (no spans column to render)."""
    from siteone_crawler_spark.__main__ import _docs_to_html

    docs = spark.createDataFrame(
        [("https://a.test/", "<html>x</html>")], "doc_id string, body string"
    )
    meta = spark.createDataFrame(
        [("https://a.test/", "text/html")], "doc_id string, content_type_header string"
    )
    rows = _docs_to_html(docs, meta).collect()
    assert rows[0]["body"] == "<html>x</html>"
    assert rows[0]["content_type"] == "text/html"
