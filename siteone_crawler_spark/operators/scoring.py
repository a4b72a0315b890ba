"""Quality scoring (A13) + CI gate (A14) — driver-side arithmetic over
small analyzer aggregates.

Reimplements (from public behavior) the reference's scorer
(/root/reference/src/scoring/scorer.rs:21-560): five weighted categories
(Performance .20, SEO .20, Security .25, Accessibility .20,
Best Practices .15), each scored `round1(clamp(10 - Σ deductions, 0, 10))`
(build_category, scorer.rs:548-563) with per-URL deductions capped at 2.5
per type and 5.0 per category (scorer.rs:15-18, 567-590); overall =
Σ score·weight (scorer.rs:30). Labels at quality_score.rs:71-79. CI gate
thresholds/exit codes at ci_gate.rs:34-220 (exit 10 on failure, 0 on pass).

These run on the DRIVER over scalar aggregates (counts, averages) that the
distributed analyzers produce — per scorer semantics there is no row-level
work here, so plain Python is the right altitude (SURVEY §2.4 A13/A14).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_PER_URL_DEDUCTION = 5.0
MAX_PER_TYPE_DEDUCTION = 2.5

CATEGORY_WEIGHTS = {
    "performance": 0.20,
    "seo": 0.20,
    "security": 0.25,
    "accessibility": 0.20,
    "best-practices": 0.15,
}


def round1(v: float) -> float:
    """scorer.rs:662-664 (round-half-away-from-zero like Rust f64::round)."""
    import math

    return math.floor(v * 10.0 + 0.5) / 10.0 if v >= 0 else -math.floor(-v * 10.0 + 0.5) / 10.0


def score_label(score: float) -> str:
    """quality_score.rs:71-79."""
    if score >= 9.0:
        return "Excellent"
    if score >= 7.0:
        return "Good"
    if score >= 5.0:
        return "Fair"
    if score >= 3.0:
        return "Poor"
    return "Critical"


@dataclass
class Deduction:
    description: str
    points: float


@dataclass
class CategoryScore:
    name: str
    code: str
    score: float
    label: str
    weight: float
    deductions: list[Deduction] = field(default_factory=list)


@dataclass
class QualityScores:
    overall: CategoryScore
    categories: list[CategoryScore]


@dataclass
class CrawlStats:
    """The BasicStats slice the scorer consumes (basic_stats.rs:23-38).
    Times in SECONDS like the reference."""

    total_urls: int = 0
    avg_time_s: float = 0.0
    p90_html_s: float = 0.0
    max_time_s: float = 0.0
    count_by_status: dict[int, int] = field(default_factory=dict)


# summary: {apl_code: count} — a non-OK finding with its item count.
# Absent code == OK (the reference's ItemStatus::Ok items deduct nothing).
Summary = dict[str, int]


def _build_category(name: str, code: str, deductions: list[Deduction]) -> CategoryScore:
    total = sum(d.points for d in deductions)
    score = round1(min(max(10.0 - total, 0.0), 10.0))
    return CategoryScore(name, code, score, score_label(score), CATEGORY_WEIGHTS[code], deductions)


def _per_url(summary: Summary, code: str, pts_per_url: float, desc: str,
             deductions: list[Deduction], state: dict) -> None:
    """per_url_deduct (scorer.rs:567-590): per-type sub-cap then the running
    per-URL budget."""
    count = summary.get(code, 0)
    if count <= 0:
        return
    remaining = MAX_PER_URL_DEDUCTION - state["per_url_total"]
    if remaining <= 0:
        return
    pts = min(count * pts_per_url, MAX_PER_TYPE_DEDUCTION, remaining)
    state["per_url_total"] += pts
    deductions.append(Deduction(f"{count} {desc}", round1(pts)))


def score_performance(summary: Summary, stats: CrawlStats) -> CategoryScore:
    d: list[Deduction] = []
    if stats.avg_time_s > 1.0:
        d.append(Deduction("Average response time > 1000ms", 1.0))
    elif stats.avg_time_s > 0.5:
        d.append(Deduction("Average response time > 500ms", 0.5))
    if stats.p90_html_s > 1.0:
        d.append(Deduction("p90 HTML response time > 1000ms", 0.5))
    elif stats.p90_html_s > 0.6:
        d.append(Deduction("p90 HTML response time > 600ms", 0.25))
    if stats.max_time_s > 5.0:
        d.append(Deduction("Slowest response > 5.0s", 1.0))
    elif stats.max_time_s > 3.0:
        d.append(Deduction("Slowest response > 3.0s", 0.5))
    n = summary.get("slowUrls", 0)
    if n > 0:
        d.append(Deduction(f"{n} slow URL(s)", round1(min(n * 0.3, MAX_PER_URL_DEDUCTION))))
    n = summary.get("static-assets-uncacheable", 0)
    if n > 0:
        d.append(Deduction(f"{n} uncacheable static asset(s)", round1(min(n * 0.05, 2.0))))
    n = summary.get("pages-weight-exceeded", 0)
    if n > 0:
        d.append(Deduction(f"{n} page(s) over weight budget", round1(min(n * 0.1, 1.5))))
    return _build_category("Performance", "performance", d)


def score_seo(summary: Summary, stats: CrawlStats) -> CategoryScore:
    d: list[Deduction] = []
    state = {"per_url_total": 0.0}
    _per_url(summary, "pages-without-h1", 0.3, "page(s) without <h1>", d, state)
    _per_url(summary, "pages-with-multiple-h1", 0.2, "page(s) with multiple <h1>", d, state)
    for code, desc in (
        ("title-uniqueness", "Non-unique page titles"),
        ("meta-description-uniqueness", "Non-unique meta descriptions"),
    ):
        n = summary.get(code, 0)
        if n > 0:
            pts = min(n * 0.3, MAX_PER_TYPE_DEDUCTION)
            pts = max(min(pts, MAX_PER_URL_DEDUCTION - state["per_url_total"]), 0.0)
            state["per_url_total"] += pts
            d.append(Deduction(desc, round1(pts)))
    n404 = stats.count_by_status.get(404, 0)
    if n404 > 0:
        pts = 0.5 if n404 == 1 else 1.0 if n404 <= 5 else 1.5 if n404 <= 20 else 2.0
        d.append(Deduction(f"{n404} page(s) returned 404", pts))
    n = summary.get("redirects", 0)
    if n > 0:
        pts = min(n * 0.15, MAX_PER_TYPE_DEDUCTION)
        pts = max(min(pts, MAX_PER_URL_DEDUCTION - state["per_url_total"]), 0.0)
        state["per_url_total"] += pts
        d.append(Deduction(f"{n} redirect(s)", round1(pts)))
    return _build_category("SEO", "seo", d)


def score_security(summary: Summary) -> CategoryScore:
    d: list[Deduction] = []
    if summary.get("ssl-certificate", 0) > 0:
        d.append(Deduction("SSL/TLS certificate issue", 3.0))
    if summary.get("ssl-expiry", 0) > 0:
        d.append(Deduction("SSL certificate expired or expiring soon", 0.5))
    if summary.get("tls-protocols", 0) > 0:
        d.append(Deduction("Insecure TLS protocol versions supported", 1.0))
    n = summary.get("security-critical", 0)
    if n > 0:
        pts = 0.0 if n == 0 else 2.0 if n == 1 else 3.0 if n == 2 else 4.0
        d.append(Deduction(f"{n} page(s) with critical security findings", pts))
    n = summary.get("security-warning", 0)
    if n > 0:
        pts = 0.5 if n == 1 else 0.75 if n == 2 else 1.0
        d.append(Deduction(f"{n} page(s) with security warnings", pts))
    return _build_category("Security", "security", d)


def score_accessibility(summary: Summary) -> CategoryScore:
    d: list[Deduction] = []
    state = {"per_url_total": 0.0}
    n = summary.get("pages-without-lang", 0)
    if n > 0:
        d.append(Deduction(f"{n} page(s) without lang attribute", round1(min(n * 0.2, 2.0))))
    _per_url(summary, "images-without-alt", 0.5, "image(s) without alt", d, state)
    _per_url(summary, "pages-without-title", 0.5, "page(s) without <title>", d, state)
    _per_url(summary, "small-click-targets", 0.1, "small click target(s)", d, state)
    _per_url(summary, "low-contrast", 0.3, "low-contrast element(s)", d, state)
    _per_url(summary, "missing-form-labels", 0.15, "form input(s) without label", d, state)
    _per_url(summary, "aria-issues", 0.3, "ARIA issue(s)", d, state)
    return _build_category("Accessibility", "accessibility", d)


def score_best_practices(summary: Summary) -> CategoryScore:
    d: list[Deduction] = []
    state = {"per_url_total": 0.0}
    _per_url(summary, "invalid-html", 0.3, "page(s) with invalid HTML", d, state)
    _per_url(summary, "console-errors", 0.2, "page(s) with console errors", d, state)
    _per_url(summary, "deprecated-api", 0.2, "deprecated API use(s)", d, state)
    _per_url(summary, "mixed-content", 0.2, "mixed-content resource(s)", d, state)
    _per_url(summary, "missing-doctype", 0.5, "page(s) without doctype", d, state)
    _per_url(summary, "charset-issues", 0.3, "charset issue(s)", d, state)
    if summary.get("brotli-support", 0) > 0:
        d.append(Deduction("No Brotli compression support", 0.5))
    if summary.get("webp-support", 0) > 0:
        d.append(Deduction("No WebP image support", 0.3))
    if summary.get("avif-support", 0) > 0:
        d.append(Deduction("No AVIF image support", 0.1))
    return _build_category("Best Practices", "best-practices", d)


def calculate_scores(summary: Summary, stats: CrawlStats) -> QualityScores:
    """scorer.rs:21-43."""
    categories = [
        score_performance(summary, stats),
        score_seo(summary, stats),
        score_security(summary),
        score_accessibility(summary),
        score_best_practices(summary),
    ]
    overall_score = round1(sum(c.score * c.weight for c in categories))
    overall = CategoryScore(
        "Overall", "overall", overall_score, score_label(overall_score), 1.0
    )
    return QualityScores(overall, categories)


# --- wiring from the distributed analyzers ----------------------------------


def crawl_summary(visited, skipped, dup_title_groups: int = 0, dup_desc_groups: int = 0,
                  slow_threshold_ms: float = 3000.0) -> tuple[Summary, CrawlStats]:
    """Build (summary, stats) from the engine's visited/skipped DataFrames —
    ONE aggregate job; everything after is driver arithmetic."""
    from pyspark.sql import functions as F

    from .analyzers import classify_content_type

    html200 = (F.col("status_code") == 200) & (
        classify_content_type(F.col("content_type_header")) == "html"
    )
    static_ct = classify_content_type(F.col("content_type_header")).isin(
        "image", "script", "stylesheet", "font"
    )
    no_store = F.lower(
        F.coalesce(F.col("headers")["cache-control"], F.lit(""))
    ).contains("no-store")
    uncacheable = static_ct & (
        F.col("cache_lifetime").isNull() | (F.col("cache_lifetime") <= 0) | no_store
    )
    enc = F.lower(F.coalesce(F.col("headers")["content-encoding"], F.lit("")))
    cth = F.lower(F.coalesce(F.col("content_type_header"), F.lit("")))
    row = visited.agg(
        F.count("*").alias("total"),
        F.round(F.avg("request_time_ms") / 1000.0, 6).alias("avg_s"),
        F.percentile(F.when(html200, F.col("request_time_ms") / 1000.0), F.lit(0.9)).alias("p90_s"),
        (F.max("request_time_ms") / 1000.0).alias("max_s"),
        F.sum(F.when(F.col("request_time_ms") >= slow_threshold_ms, 1).otherwise(0)).alias("slow"),
        F.sum(F.when(F.col("status_code").between(301, 308), 1).otherwise(0)).alias("redirects"),
        F.sum(F.when(uncacheable & (F.col("status_code") == 200), 1).otherwise(0)).alias("uncache"),
        F.max(F.when(enc.contains("br"), 1).otherwise(0)).alias("brotli"),
        F.max(F.when(cth.contains("webp"), 1).otherwise(0)).alias("webp"),
        F.max(F.when(cth.contains("avif"), 1).otherwise(0)).alias("avif"),
    ).first()
    by_status = {
        r["status_code"]: r["n"]
        for r in visited.groupBy("status_code").agg(F.count("*").alias("n")).collect()
    }
    stats = CrawlStats(
        total_urls=row["total"],
        avg_time_s=row["avg_s"] or 0.0,
        p90_html_s=row["p90_s"] or 0.0,
        max_time_s=row["max_s"] or 0.0,
        count_by_status=by_status,
    )
    summary: Summary = {}
    if row["slow"]:
        summary["slowUrls"] = int(row["slow"])
    if row["redirects"]:
        summary["redirects"] = int(row["redirects"])
    if row["uncache"]:
        summary["static-assets-uncacheable"] = int(row["uncache"])
    if not row["brotli"]:
        summary["brotli-support"] = 1
    if not row["webp"]:
        summary["webp-support"] = 1
    if not row["avif"]:
        summary["avif-support"] = 1
    if dup_title_groups:
        summary["title-uniqueness"] = dup_title_groups
    if dup_desc_groups:
        summary["meta-description-uniqueness"] = dup_desc_groups
    return summary, stats


# --- CI gate (A14) ----------------------------------------------------------


@dataclass
class CiCheck:
    metric: str
    operator: str
    threshold: float
    actual: float
    passed: bool


@dataclass
class CiGateResult:
    passed: bool
    exit_code: int
    checks: list[CiCheck]


def evaluate_ci_gate(
    scores: QualityScores,
    stats: CrawlStats,
    summary: Summary,
    min_score: float = 0.0,
    min_category: dict[str, float] | None = None,
    max_404: int = 2**31 - 1,
    max_5xx: int = 2**31 - 1,
    max_criticals: int = 2**31 - 1,
    max_warnings: int | None = None,
    critical_codes: tuple[str, ...] = (),
    warning_codes: tuple[str, ...] = (),
    fail_on_code: tuple[str, ...] = (),
    ignore_code: tuple[str, ...] = (),
) -> CiGateResult:
    """ci_gate.rs:34-220: exit 10 on any failed check, 0 otherwise; an empty
    crawl (no positive status) fails immediately."""
    checks: list[CiCheck] = []
    if stats.total_urls == 0 or not any(c > 0 for c in stats.count_by_status):
        checks.append(CiCheck("Pages crawled", ">", 0.0, 0.0, False))
        return CiGateResult(False, 10, checks)

    def check_min(metric: str, actual: float, threshold: float) -> None:
        checks.append(CiCheck(metric, ">=", threshold, actual, actual >= threshold))

    def check_max(metric: str, actual: float, threshold: float) -> None:
        checks.append(CiCheck(metric, "<=", threshold, actual, actual <= threshold))

    check_min("Overall score", scores.overall.score, min_score)
    for code, threshold in (min_category or {}).items():
        actual = next((c.score for c in scores.categories if c.code == code), 0.0)
        check_min(f"{code} score", actual, threshold)
    check_max("404 errors", float(stats.count_by_status.get(404, 0)), float(max_404))
    n5xx = sum(n for c, n in stats.count_by_status.items() if 500 <= c < 600)
    check_max("5xx errors", float(n5xx), float(max_5xx))
    criticals = sum(
        1 for c in critical_codes if c not in ignore_code and summary.get(c, 0) > 0
    )
    check_max("Critical findings", float(criticals), float(max_criticals))
    if max_warnings is not None:
        warnings = sum(
            1 for c in warning_codes if c not in ignore_code and summary.get(c, 0) > 0
        )
        check_max("Warning findings", float(warnings), float(max_warnings))
    for code in fail_on_code:
        if code not in ignore_code:
            present = summary.get(code, 0) > 0
            checks.append(CiCheck(f"Forbidden finding: {code}", "==", 0.0, float(present), not present))

    passed = all(c.passed for c in checks)
    return CiGateResult(passed, 0 if passed else 10, checks)
