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
