"""DNS + SSL/TLS analyzer tests (dns_analyzer.rs / ssl_tls/mod.rs model)."""

import pyspark.sql.functions as F

NOW = 1_800_000_000
DAY = 86400


def _probe(spark, **over):
    row = dict(
        host="a.test", port=443, cnames=[], ipv4=["192.0.2.1"], ipv6=[],
        connect_error=None, handshake_ok=True,
        cert_not_before=NOW - 90 * DAY, cert_not_after=NOW + 60 * DAY,
        sig_algorithm="sha256WithRSAEncryption", key_algo="RSA", key_bits=2048,
        has_cn=True, subject_empty=False, trusted=True, trust_reason=None,
        protocols=["TLSv1.2", "TLSv1.3"], issuer="CN=Synthetic Root CA",
    )
    row.update(over)
    from siteone_crawler_spark.operators.network import PROBE_SCHEMA

    return spark.createDataFrame([tuple(row.values())], PROBE_SCHEMA)


def _codes(spark, **over):
    from siteone_crawler_spark.operators.network import tls_findings

    kw = {}
    if "accept_invalid_certs" in over:
        kw["accept_invalid_certs"] = over.pop("accept_invalid_certs")
    return {
        (r["code"], r["severity"])
        for r in tls_findings(_probe(spark, **over), NOW, **kw).collect()
    }


def test_probe_targets(spark):
    from siteone_crawler_spark.operators.network import probe_targets

    v = spark.createDataFrame(
        [("https://a.test/1",), ("https://a.test/2",), ("https://b.test:8443/x",),
         ("http://plain.test/y",)],
        "url string",
    )
    t = {(r["host"], r["port"]) for r in probe_targets(v).collect()}
    assert t == {("a.test", 443), ("b.test", 8443)}  # deduped, https only


def test_tls_healthy_host(spark):
    codes = _codes(spark)
    assert ("ssl-signature-strong", 1) in codes
    assert ("ssl-key-strong", 1) in codes
    assert ("ssl-certificate-trusted", 1) in codes
    assert not any(sev >= 3 for _, sev in codes)


def test_tls_failures(spark):
    assert _codes(spark, connect_error="refused") == {("ssl-certificate-connect", 4)}
    assert _codes(spark, handshake_ok=False) == {("ssl-tls-handshake-failed", 4)}

    expired = _codes(spark, cert_not_after=NOW - DAY)
    assert ("ssl-certificate-valid-to", 4) in expired
    # accept_invalid_certs downgrades expiry/trust to warnings
    soft = _codes(spark, cert_not_after=NOW - DAY, accept_invalid_certs=True)
    assert ("ssl-certificate-valid-to", 3) in soft

    weak = _codes(spark, sig_algorithm="sha1WithRSAEncryption", key_bits=1024)
    assert ("ssl-weak-signature", 4) in weak and ("ssl-weak-key", 4) in weak
    assert ("ssl-signature-strong", 1) not in weak

    legacy = _codes(spark, protocols=["TLSv1", "TLSv1.2"])
    assert ("ssl-protocol-unsafe", 4) in legacy
    assert ("ssl-protocol-hint", 4) in legacy  # no TLSv1.3

    untrusted = _codes(spark, trusted=False, trust_reason="self-signed")
    assert ("ssl-certificate-untrusted", 4) in untrusted
    assert ("ssl-no-common-name", 2) in _codes(spark, has_cn=False)


def test_dns_stats_and_synth(spark):
    from siteone_crawler_spark.operators.network import (
        dns_stats,
        probe_targets,
        synth_probes,
    )

    v = spark.createDataFrame(
        [(f"https://h{i}.test/p",) for i in range(40)], "url string"
    )
    probes = synth_probes(probe_targets(v), NOW)
    assert probes.count() == 40
    d = dns_stats(probes)
    rows = d.collect()
    assert len(rows) == 40
    r0 = rows[0]
    assert r0["resolved_chain"][0] == r0["host"] and r0["resolved"] is True
    # deterministic: same input -> same probes
    a = sorted(map(tuple, probes.collect()))
    b = sorted(map(tuple, synth_probes(probe_targets(v), NOW).collect()))
    assert a == b

    from siteone_crawler_spark.operators.network import tls_summary

    s = {(r["code"], r["severity"]): r["n_hosts"] for r in tls_summary(probes, NOW).collect()}
    assert sum(n for (c, _), n in s.items() if c == "ssl-certificate-connect") >= 1
    assert s.get(("ssl-signature-strong", 1), 0) > 20
