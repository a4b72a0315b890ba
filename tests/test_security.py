"""Security analyzer vectors mirroring security_analyzer.rs semantics."""

import pyspark.sql.functions as F


def _vis(spark, rows):
    return spark.createDataFrame(
        rows, "url string, headers map<string,string>"
    )


def _sev(spark, headers, url="https://s.test/p"):
    from siteone_crawler_spark.operators.security import security_findings

    df = _vis(spark, [(url, headers)])
    return {
        (r["header"]): (r["severity"], r["value"])
        for r in security_findings(df).collect()
    }


def test_header_severity_ladder(spark):
    from siteone_crawler_spark.operators.security import (
        SEVERITY_CRITICAL,
        SEVERITY_NOTICE,
        SEVERITY_OK,
        SEVERITY_WARNING,
    )

    s = _sev(spark, {})
    # absent ACAO / X-Powered-By / Set-Cookie emit NO finding
    assert "access-control-allow-origin" not in s
    assert "x-powered-by" not in s and "set-cookie" not in s
    # absent HSTS/CSP critical, XFO/XCTO/Referrer warning on https
    assert s["strict-transport-security"][0] == SEVERITY_CRITICAL
    assert s["content-security-policy"][0] == SEVERITY_CRITICAL
    assert s["x-frame-options"][0] == SEVERITY_WARNING
    assert s["x-content-type-options"][0] == SEVERITY_WARNING
    assert s["referrer-policy"][0] == SEVERITY_WARNING
    # deprecated X-XSS-Protection: absent is the CORRECT modern behavior
    assert s["x-xss-protection"][0] == SEVERITY_OK
    # absent Server header is OK (recommended); COOP/COEP/CORP notice
    assert s["server"][0] == SEVERITY_OK
    assert s["cross-origin-opener-policy"][0] == SEVERITY_NOTICE

    # HSTS ladder: max-age=0 critical, short warning, long ok; skipped on http
    assert _sev(spark, {"strict-transport-security": "max-age=0"})[
        "strict-transport-security"
    ][0] == SEVERITY_CRITICAL
    assert _sev(spark, {"strict-transport-security": "max-age=600"})[
        "strict-transport-security"
    ][0] == SEVERITY_WARNING
    assert _sev(spark, {"strict-transport-security": "max-age=63072000"})[
        "strict-transport-security"
    ][0] == SEVERITY_OK
    assert "strict-transport-security" not in _sev(
        spark, {}, url="http://s.test/p"
    )

    # XFO exact values (DENY ok, SAMEORIGIN/ALLOW-FROM notice, junk warning)
    assert _sev(spark, {"x-frame-options": "DENY"})["x-frame-options"][0] == SEVERITY_OK
    assert _sev(spark, {"x-frame-options": "SAMEORIGIN"})["x-frame-options"][0] == SEVERITY_NOTICE
    assert _sev(spark, {"x-frame-options": "deny"})["x-frame-options"][0] == SEVERITY_WARNING

    # ACAO: * warning, named origin notice, same-origin ok
    assert _sev(spark, {"access-control-allow-origin": "*"})[
        "access-control-allow-origin"
    ][0] == SEVERITY_WARNING
    assert _sev(spark, {"access-control-allow-origin": "https://a.test"})[
        "access-control-allow-origin"
    ][0] == SEVERITY_NOTICE
    assert _sev(spark, {"access-control-allow-origin": "same-origin"})[
        "access-control-allow-origin"
    ][0] == SEVERITY_OK

    # Server: version digits critical, known product warning, custom notice
    assert _sev(spark, {"server": "nginx/1.25.1"})["server"][0] == SEVERITY_CRITICAL
    assert _sev(spark, {"server": "nginx"})["server"][0] == SEVERITY_WARNING
    assert _sev(spark, {"server": "potato"})["server"][0] == SEVERITY_NOTICE
    assert _sev(spark, {"server": " / - "})["server"][0] == SEVERITY_OK

    # X-Powered-By present: version critical else warning
    assert _sev(spark, {"x-powered-by": "PHP/8.2"})["x-powered-by"][0] == SEVERITY_CRITICAL
    assert _sev(spark, {"x-powered-by": "Express"})["x-powered-by"][0] == SEVERITY_WARNING


def test_csp_weaknesses(spark):
    from siteone_crawler_spark.operators.security import SEVERITY_OK, SEVERITY_WARNING

    ok = "default-src 'self'; script-src 'self' cdn.test"
    assert _sev(spark, {"content-security-policy": ok})[
        "content-security-policy"
    ][0] == SEVERITY_OK
    # unsafe-inline weakens...
    weak = "script-src 'self' 'unsafe-inline'"
    assert _sev(spark, {"content-security-policy": weak})[
        "content-security-policy"
    ][0] == SEVERITY_WARNING
    # ...unless a nonce/hash in the SAME directive neutralizes it (CSP3)
    nonce = "script-src 'self' 'unsafe-inline' 'nonce-abc123'"
    assert _sev(spark, {"content-security-policy": nonce})[
        "content-security-policy"
    ][0] == SEVERITY_OK
    # bare * in an executable directive
    wild = "default-src *"
    assert _sev(spark, {"content-security-policy": wild})[
        "content-security-policy"
    ][0] == SEVERITY_WARNING
    # * in a non-executable directive is fine; unsafe-eval is not
    assert _sev(spark, {"content-security-policy": "img-src *"})[
        "content-security-policy"
    ][0] == SEVERITY_OK
    assert _sev(spark, {"content-security-policy": "script-src 'unsafe-eval'"})[
        "content-security-policy"
    ][0] == SEVERITY_WARNING


def test_set_cookie_ladder(spark):
    from siteone_crawler_spark.operators.security import (
        SEVERITY_CRITICAL,
        SEVERITY_NOTICE,
        SEVERITY_OK,
        SEVERITY_WARNING,
    )

    full = "sid=1; Secure; HttpOnly; SameSite=Lax"
    assert _sev(spark, {"set-cookie": full})["set-cookie"] == (SEVERITY_OK, "sid")
    # missing SameSite only -> notice
    assert _sev(spark, {"set-cookie": "sid=1; Secure; HttpOnly"})["set-cookie"][0] == SEVERITY_NOTICE
    # missing HttpOnly -> warning
    assert _sev(spark, {"set-cookie": "sid=1; Secure; SameSite=Lax"})["set-cookie"][0] == SEVERITY_WARNING
    # https missing Secure -> critical
    assert _sev(spark, {"set-cookie": "sid=1; HttpOnly; SameSite=Lax"})["set-cookie"][0] == SEVERITY_CRITICAL
    # on http, missing Secure doesn't fire; HttpOnly present, SameSite missing
    assert _sev(spark, {"set-cookie": "sid=1; HttpOnly"}, url="http://s.test/")[
        "set-cookie"
    ][0] == SEVERITY_NOTICE
    # multi-cookie: one row per line
    from siteone_crawler_spark.operators.security import security_findings

    df = _vis(spark, [("https://s.test/p", {"set-cookie": full + "\nb=2"})])
    rows = security_findings(df).filter(F.col("header") == "set-cookie").collect()
    assert {(r["value"], r["severity"]) for r in rows} == {
        ("sid", SEVERITY_OK), ("b", SEVERITY_CRITICAL)
    }


def test_security_stats_supertable(spark):
    from siteone_crawler_spark.operators.security import security_stats

    rows = [
        ("https://s.test/1", {"x-frame-options": "DENY", "server": "nginx/1.2"}),
        ("https://s.test/2", {"x-frame-options": "junk"}),
        ("https://s.test/3", None),  # no headers -> no findings
    ]
    st = {r["header"]: r for r in security_stats(_vis(spark, rows)).collect()}
    xfo = st["x-frame-options"]
    assert (xfo["n_ok"], xfo["n_warning"], xfo["highest_severity"]) == (1, 1, 3)
    assert sorted(xfo["values_sample"]) == ["DENY", "junk"]
    srv = st["server"]
    assert srv["n_critical"] == 1 and srv["n_ok"] == 1  # absent server is ok
    assert srv["highest_severity"] == 4


def test_mixed_content(spark):
    from siteone_crawler_spark.operators.security import mixed_content_findings

    html = (
        '<form action="http://evil.test/post"></form>'
        '<script src="http://cdn.test/x.js"></script>'
        '<link rel="stylesheet" href="http://cdn.test/a.css">'
        '<link href="http://cdn.test/b.css" rel="stylesheet">'
        '<link rel="canonical" href="http://s.test/p">'  # NOT active content
        '<img src="http://cdn.test/i.png">'
        '<script src="https://cdn.test/ok.js"></script>'
    )
    docs = spark.createDataFrame(
        [("https://s.test/p", html), ("http://plain.test/p", html), ("https://s.test/clean", "<p>hi</p>")],
        "url string, body string",
    )
    rows = {r["url"]: r for r in mixed_content_findings(docs).collect()}
    assert set(rows) == {"https://s.test/p"}  # http pages + clean pages skip
    r = rows["https://s.test/p"]
    assert r["n_form_http"] == 1 and r["n_script_http"] == 1
    assert r["n_stylesheet_http"] == 2 and r["n_media_http"] == 1
    assert r["n_critical"] == 4 and r["n_warning"] == 1
