"""Security analyzer — header hygiene + mixed-content checks.

Reimplements the reference SecurityAnalyzer's behavior from public
observation, not code (/root/reference/src/analysis/security_analyzer.rs):

  - per-URL severity classification of 13 checked response headers
    (security_analyzer.rs:86-760): severity ladder OK=1 < NOTICE=2 <
    WARNING=3 < CRITICAL=4 (result/security_checked_header.rs:6-9)
  - the "security" SuperTable: per header, highest severity, counts per
    severity, unique value sample (security_checked_header.rs:12-49)
  - mixed-content HTML checks on https pages (security_analyzer.rs:157-215):
    form/iframe/script/stylesheet over http are critical, media passive
    content is a warning

Everything is native Catalyst expressions over the `headers
map<string,string>` column — when/otherwise ladders, regexp_extract for
max-age, higher-order functions for the per-directive CSP weakness scan
(csp_weaknesses, security_analyzer.rs:999-1045). No UDFs, so the
classification is whole-stage-codegen'd and the aggregate is one
hash-agg: scale = a projection + groupBy on ~13 keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEVERITY_OK = 1
SEVERITY_NOTICE = 2
SEVERITY_WARNING = 3
SEVERITY_CRITICAL = 4

REFERRER_OK_VALUES = [
    "no-referrer", "no-referrer-when-downgrade", "origin",
    "origin-when-cross-origin", "same-origin", "strict-origin",
    "strict-origin-when-cross-origin", "unsafe-url",
]

CSP_WILDCARD_DIRECTIVES = [
    "default-src", "script-src", "object-src", "style-src", "frame-src",
    "connect-src", "worker-src", "child-src", "manifest-src",
]


def _csp_weak(v):
    """csp_weaknesses (security_analyzer.rs:999-1045): per-directive scan —
    'unsafe-inline' not neutralized by a nonce/hash token in the SAME
    directive, any 'unsafe-eval', or a bare * source in an executable/
    fetch directive."""
    dirs = F.split(F.lower(v), ";")

    def toks(d):
        return F.filter(F.split(F.trim(d), r"\s+"), lambda x: x != F.lit(""))

    def has_nonce_or_hash(d):
        return F.exists(
            toks(d),
            lambda t: t.startswith("'nonce-")
            | t.startswith("'sha256-")
            | t.startswith("'sha384-")
            | t.startswith("'sha512-"),
        )

    unsafe_inline = F.exists(
        dirs,
        lambda d: F.array_contains(toks(d), "'unsafe-inline'") & ~has_nonce_or_hash(d),
    )
    unsafe_eval = F.exists(dirs, lambda d: F.array_contains(toks(d), "'unsafe-eval'"))
    wildcard = F.exists(
        dirs,
        lambda d: F.element_at(toks(d), 1).isin(*CSP_WILDCARD_DIRECTIVES)
        & F.array_contains(toks(d), "*"),
    )
    return unsafe_inline | unsafe_eval | wildcard


def security_findings(
    visited: DataFrame, headers_col: str = "headers", url_col: str = "url"
) -> DataFrame:
    """One row per (url, header, value, severity) security finding.
    Headers that yield no finding when absent (ACAO, X-Powered-By,
    Set-Cookie — security_analyzer.rs:144, 667, 687) emit no row."""
    h = F.col(headers_col)
    https = F.col(url_col).startswith("https://")

    def g(k):
        return F.element_at(h, F.lit(k))

    def entry(name, value, severity):
        return F.struct(
            F.lit(name).alias("header"),
            value.cast("string").alias("value"),
            severity.cast("int").alias("severity"),
        )

    acao = g("access-control-allow-origin")
    hsts = g("strict-transport-security")
    hsts_age = F.regexp_extract(F.lower(hsts), r"max-age=([0-9]+)", 1)
    xfo = g("x-frame-options")
    xxss = g("x-xss-protection")
    xcto = g("x-content-type-options")
    refp = g("referrer-policy")
    csp = g("content-security-policy")
    fp = g("feature-policy")
    pp = g("permissions-policy")
    server = g("server")
    server_empty = F.translate(server, " /-.~:", "") == ""
    xpb = g("x-powered-by")

    findings = [
        # ACAO (security_analyzer.rs:228-262): absent -> no finding
        entry(
            "access-control-allow-origin",
            acao,
            F.when(acao.isNull(), F.lit(None))
            .when(acao == "*", SEVERITY_WARNING)
            .when(acao.isin("same-origin", "none"), SEVERITY_OK)
            .otherwise(SEVERITY_NOTICE),
        ),
        # HSTS, https only (rs:264-317)
        entry(
            "strict-transport-security",
            hsts,
            F.when(~https, F.lit(None))
            .when(hsts.isNull(), SEVERITY_CRITICAL)
            .when(hsts.contains("max-age=0"), SEVERITY_CRITICAL)
            .when(
                (hsts_age != "") & (hsts_age.cast("long") < 31 * 24 * 3600),
                SEVERITY_WARNING,
            )
            .otherwise(SEVERITY_OK),
        ),
        # X-Frame-Options (rs:318-354): exact-match values
        entry(
            "x-frame-options",
            xfo,
            F.when(xfo.isNull(), SEVERITY_WARNING)
            .when(xfo == "DENY", SEVERITY_OK)
            .when(xfo.isin("SAMEORIGIN", "ALLOW-FROM"), SEVERITY_NOTICE)
            .otherwise(SEVERITY_WARNING),
        ),
        # X-XSS-Protection (rs:356-393): deprecated — absent/'0' is OK
        entry(
            "x-xss-protection",
            xxss,
            F.when(xxss.isNull() | (xxss == "0"), SEVERITY_OK).otherwise(
                SEVERITY_NOTICE
            ),
        ),
        # X-Content-Type-Options (rs:395-424)
        entry(
            "x-content-type-options",
            xcto,
            F.when(xcto == "nosniff", SEVERITY_OK).otherwise(SEVERITY_WARNING),
        ),
        # Referrer-Policy (rs:426-466)
        entry(
            "referrer-policy",
            refp,
            F.when(refp.isNull(), SEVERITY_WARNING)
            .when(refp.isin(*REFERRER_OK_VALUES), SEVERITY_OK)
            .otherwise(SEVERITY_NOTICE),
        ),
        # CSP (rs:468-500 + 999-1045)
        entry(
            "content-security-policy",
            csp,
            F.when(csp.isNull(), SEVERITY_CRITICAL)
            .when(_csp_weak(csp), SEVERITY_WARNING)
            .otherwise(SEVERITY_OK),
        ),
        # Feature-Policy / Permissions-Policy pair (rs:523-583)
        entry(
            "feature-policy",
            fp,
            F.when(fp.isNull() & pp.isNotNull(), SEVERITY_NOTICE)
            .when(fp.isNull(), SEVERITY_WARNING)
            .otherwise(SEVERITY_OK),
        ),
        entry(
            "permissions-policy",
            pp,
            F.when(pp.isNull() & fp.isNotNull(), SEVERITY_NOTICE)
            .when(pp.isNull(), SEVERITY_WARNING)
            .otherwise(SEVERITY_OK),
        ),
        # Server (rs:585-641): absent/empty is GOOD; version digits critical
        entry(
            "server",
            server,
            F.when(server.isNull() | server_empty, SEVERITY_OK)
            .when(server.rlike("[0-9]"), SEVERITY_CRITICAL)
            .when(
                F.lower(server).rlike("apache|nginx|microsoft-iis"),
                SEVERITY_WARNING,
            )
            .otherwise(SEVERITY_NOTICE),
        ),
        # X-Powered-By (rs:643-673): absent -> no finding
        entry(
            "x-powered-by",
            xpb,
            F.when(xpb.isNull(), F.lit(None))
            .when(xpb.rlike("[0-9]"), SEVERITY_CRITICAL)
            .otherwise(SEVERITY_WARNING),
        ),
        # COOP/COEP/CORP (rs:126-152, 501-521): absence is a notice
        *[
            entry(
                name,
                g(name),
                F.when(g(name).isNull(), SEVERITY_NOTICE).otherwise(SEVERITY_OK),
            )
            for name in (
                "cross-origin-opener-policy",
                "cross-origin-embedder-policy",
                "cross-origin-resource-policy",
            )
        ],
    ]

    # Set-Cookie: one finding PER cookie line; value = cookie name; the
    # flag checks assign in order samesite->notice, httponly->warning,
    # (https) secure->critical — later assignments override (rs:687-760).
    # Folded into the SAME projection/explode as the 13 header checks (an
    # array-of-struct transform over the cookie lines, concat'd onto the
    # findings array): one parquet scan and ONE evaluation of the headers
    # map per row instead of a union of two full passes — the row multiset
    # is unchanged, so the severity aggregate downstream is identical.
    def cookie_sev(c):
        lower = F.lower(c)
        return (
            F.when(https & ~lower.contains("secure"), SEVERITY_CRITICAL)
            .when(~lower.contains("httponly"), SEVERITY_WARNING)
            .when(~lower.contains("samesite"), SEVERITY_NOTICE)
            .otherwise(SEVERITY_OK)
        )

    cookie_lines = F.filter(
        F.transform(F.split(g("set-cookie"), "\n"), F.trim),
        lambda c: c != F.lit(""),
    )
    cookie_findings = F.when(
        g("set-cookie").isNotNull(),
        F.transform(
            cookie_lines,
            lambda c: F.struct(
                F.lit("set-cookie").alias("header"),
                F.split(c, "=").getItem(0).alias("value"),
                cookie_sev(c).cast("int").alias("severity"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<header:string,value:string,severity:int>>"))

    # NB the url column is aliased to a fresh name ("__u", renamed back one
    # select later): the finding expressions reference url_col inside
    # higher-order-function lambdas, and aliasing the SAME name in the same
    # select trips Spark's lateral-column-alias resolution inside lambda
    # bodies (INTERNAL_ERROR: unresolved LateralColumnAliasReference).
    base = visited.filter(F.col(headers_col).isNotNull()).select(
        F.col(url_col).alias("__u"),
        F.explode(F.concat(F.array(*findings), cookie_findings)).alias("f"),
    )
    return base.filter(F.col("f.severity").isNotNull()).select(
        F.col("__u").alias("url"),
        F.col("f.header").alias("header"),
        F.col("f.value").alias("value"),
        F.col("f.severity").alias("severity"),
    )


def security_stats(
    visited: DataFrame, headers_col: str = "headers", url_col: str = "url",
    values_cap: int = 5,
) -> DataFrame:
    """The "security" SuperTable (security_checked_header.rs:12-49): per
    checked header, the highest severity seen, per-severity counts, and a
    bounded unique-value sample."""
    f = security_findings(visited, headers_col, url_col)
    return (
        f.groupBy("header")
        .agg(
            F.max("severity").alias("highest_severity"),
            F.sum(F.when(F.col("severity") == SEVERITY_OK, 1).otherwise(0))
            .cast("long")
            .alias("n_ok"),
            F.sum(F.when(F.col("severity") == SEVERITY_NOTICE, 1).otherwise(0))
            .cast("long")
            .alias("n_notice"),
            F.sum(F.when(F.col("severity") == SEVERITY_WARNING, 1).otherwise(0))
            .cast("long")
            .alias("n_warning"),
            F.sum(F.when(F.col("severity") == SEVERITY_CRITICAL, 1).otherwise(0))
            .cast("long")
            .alias("n_critical"),
            F.slice(
                F.array_sort(F.collect_set(F.col("value"))), 1, values_cap
            ).alias("values_sample"),
        )
        .orderBy("header")
    )


# mixed-content regexes (security_analyzer.rs:157-215) as native regexp
# counts; the reference's two-condition <link> scan (http href AND rel=
# stylesheet in either attribute order) becomes two orderings
_RE_FORM_HTTP = r"""(?i)<form[^>]*action=["']http://[^"']+["'][^>]*>"""
_RE_IFRAME_HTTP = r"""(?i)<iframe[^>]*src=["']http://[^"']+["'][^>]*>"""
_RE_SCRIPT_HTTP = r"""(?i)<script[^>]*src=["']http://[^"']+["']"""
_RE_STYLE_HTTP_1 = (
    r"""(?i)<link\b[^>]*rel=["']stylesheet["'][^>]*href=["']http://[^"']+["']"""
)
_RE_STYLE_HTTP_2 = (
    r"""(?i)<link\b[^>]*href=["']http://[^"']+["'][^>]*rel=["']stylesheet["']"""
)
_RE_MEDIA_HTTP = r"""(?i)<(?:img|audio|video|source)[^>]*src=["']http://[^"']+["']"""


def mixed_content_findings(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Per-URL mixed-content counts for https pages: active content over
    http (forms, iframes, scripts, stylesheets) is critical; passive media
    is a warning (security_analyzer.rs:157-215)."""
    https = F.col(url_col).startswith("https://")
    b = F.col(body_col)
    counts = {
        "n_form_http": F.regexp_count(b, F.lit(_RE_FORM_HTTP)),
        "n_iframe_http": F.regexp_count(b, F.lit(_RE_IFRAME_HTTP)),
        "n_script_http": F.regexp_count(b, F.lit(_RE_SCRIPT_HTTP)),
        "n_stylesheet_http": F.regexp_count(b, F.lit(_RE_STYLE_HTTP_1))
        + F.regexp_count(b, F.lit(_RE_STYLE_HTTP_2)),
        "n_media_http": F.regexp_count(b, F.lit(_RE_MEDIA_HTTP)),
    }
    out = html_docs.filter(https & b.isNotNull()).select(
        F.col(url_col).alias("url"),
        *[v.cast("long").alias(k) for k, v in counts.items()],
    )
    critical = (
        F.col("n_form_http")
        + F.col("n_iframe_http")
        + F.col("n_script_http")
        + F.col("n_stylesheet_http")
    )
    return out.withColumn("n_critical", critical).withColumn(
        "n_warning", F.col("n_media_http")
    ).filter((F.col("n_critical") > 0) | (F.col("n_warning") > 0))
