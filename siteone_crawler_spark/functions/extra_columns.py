"""User-extensible extra-column extractors — the reference's only
user-pluggable scalar surface (/root/reference/src/extra_column.rs:9-234:
`--extra-columns "Name=xpath://h1/text()"` / `=regexp:pat#group`).

Spark-first re-expression: a registry of named extractors evaluated over a
document column. regexp extractors compile to NATIVE regexp_extract
(Catalyst, codegen); xpath extractors run as one Arrow-batched pandas UDF
with a stdlib-DOM selector engine that replicates the reference's documented
xpath surface exactly (extra_column.rs:180-234: the xpath is converted to a
CSS selector — tag / [attr='value'] / child (>) / descendant combinators —
evaluated against a parsed DOM; `/text()` means text content, a trailing
`/@attr` reads an attribute, `#N` picks the N-th match in document order).
The reference supports nothing beyond this CSS-convertible subset.

One deliberate SUPERSET beyond observed reference behavior: xpath attribute
predicates (`//meta[@name='author']/@content`). The reference's
xpath_to_css never strips the `@` inside `[...]`, so Selector::parse fails
and such specs return None there (its docs describe them working; its code
does not) — here the `[@attr]` -> `[attr]` rewrite makes them actually
work. Everything else matches the reference's implemented surface."""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExtraColumn:
    name: str
    kind: str  # 'regexp' | 'xpath' | 'plain'
    spec: str = ""
    group: int = 0
    length: int | None = None
    truncate: bool = True


# reference from_text grammar (extra_column.rs:105): name=(method):(pattern)
# [#group][(len[>])]; a bare "Name[(len[>])]" is a plain passthrough column
_RE_CUSTOM = re.compile(r"^([^=]+)=(xpath|regexp):(.+?)(?:#(\d+))?(?:\((\d+)(>?)\))?$")
_RE_PLAIN = re.compile(r"^([^=()]+)(?:\((\d+)(>?)\))?$")


# plain columns named Title/Description/Keywords default to a 20-char
# display width (extra_column.rs default_column_size, pinned by its
# parse_simple_name_uses_default_length test); others fall back to len(name)
_DEFAULT_COLUMN_SIZE = {"Title": 20, "Description": 20, "Keywords": 20}


def parse_extra_column(arg: str) -> ExtraColumn:
    """Parse CLI-style specs (reference extra_column.rs:97-150 grammar,
    re-derived): 'Name=regexp:<title>(.+?)</title>#1', the legacy-delimited
    'Name=regexp:/pat/#1', 'Name=xpath://h1/text()', 'Name(30>)'. An
    unparseable custom spec falls back to a plain column named by the whole
    text (from_text's "If parsing of the custom syntax fails" branch)."""
    arg = arg.strip()
    if "=" in arg:
        m = _RE_CUSTOM.match(arg)
        if not m:
            return ExtraColumn(arg, "plain", "", 0, None, truncate=True)
        name, kind, pattern, group, length, notrunc = m.groups()
        pattern = pattern.strip()
        if kind == "regexp":
            d = re.match(r"^/(.*)/$", pattern)
            if d:  # accept the delimited form too
                pattern = d.group(1)
            re.compile(pattern)  # reference validates at parse time
        return ExtraColumn(
            name.strip(),
            kind,
            pattern,
            int(group or 0),
            int(length) if length else None,
            truncate=not notrunc,
        )
    m = _RE_PLAIN.match(arg)
    if not m:
        raise ValueError(f"bad extra-column spec: {arg!r}")
    name, length, notrunc = m.groups()
    name = name.strip()
    return ExtraColumn(
        name, "plain", "", 0,
        int(length) if length else _DEFAULT_COLUMN_SIZE.get(name),
        truncate=not notrunc,
    )


# ------------------------------------------------- xpath-via-CSS evaluation
def _xpath_to_css(xpath: str) -> str:
    """extra_column.rs:217-234: strip the leading axis, '//' becomes the
    descendant combinator, '/' the child combinator."""
    s = xpath
    if s.startswith("//"):
        s = s[2:]
    elif s.startswith("/"):
        s = s[1:]
    # xpath attribute predicates drop the axis marker: [@attr='v'] -> [attr='v']
    # (the behavior extra_column.rs:177 documents for its CSS conversion)
    s = s.replace("[@", "[")
    return s.replace("//", " ").replace("/", " > ")


_RE_COMPOUND = re.compile(
    r"^(\*|[a-zA-Z][a-zA-Z0-9-]*)?"
    r"((?:\.[\w-]+|#[\w-]+|\[[a-zA-Z-]+(?:=(?:'[^']*'|\"[^\"]*\"|[^\]]*))?\])*)$"
)
_RE_SIMPLE = re.compile(
    r"\.[\w-]+|#[\w-]+|\[([a-zA-Z-]+)(?:=('[^']*'|\"[^\"]*\"|[^\]]*))?\]"
)


def _parse_css(css: str) -> list[tuple[str, dict]]:
    """'a > b c' -> [('', a), ('>', b), (' ', c)] with each compound parsed
    into tag / id / classes / attr requirements."""
    toks = [t for t in re.split(r"(\s*>\s*|\s+)", css.strip()) if t and t.strip() != ""]
    out: list[tuple[str, dict]] = []
    comb = ""
    for t in toks:
        if t.strip() == ">":
            comb = ">"
            continue
        if not t.strip():
            continue
        m = _RE_COMPOUND.match(t.strip())
        if not m:
            raise ValueError(f"unsupported selector component: {t!r}")
        tag = (m.group(1) or "*").lower()
        req = {"tag": tag, "id": None, "classes": [], "attrs": []}
        for sm in _RE_SIMPLE.finditer(m.group(2) or ""):
            tok = sm.group(0)
            if tok.startswith("."):
                req["classes"].append(tok[1:])
            elif tok.startswith("#"):
                req["id"] = tok[1:]
            else:
                attr, val = sm.group(1), sm.group(2)
                if val is not None:
                    val = val.strip()
                    if len(val) >= 2 and val[0] in "'\"" and val[-1] == val[0]:
                        val = val[1:-1]
                req["attrs"].append((attr, val))
        out.append((comb, req))
        comb = " "  # default combinator between successive compounds
    return out


def _node_matches(node, req: dict) -> bool:
    if node.tag.startswith("__"):
        return False
    if req["tag"] != "*" and node.tag != req["tag"]:
        return False
    if req["id"] is not None and node.attrs.get("id") != req["id"]:
        return False
    classes = (node.attrs.get("class") or "").split()
    if any(c not in classes for c in req["classes"]):
        return False
    for attr, val in req["attrs"]:
        if attr not in node.attrs:
            return False
        if val is not None and node.attrs.get(attr) != val:
            return False
    return True


def _select(root, chain: list[tuple[str, dict]]):
    """All elements matching the combinator chain, in document order."""

    def path_matches(path) -> bool:
        # path = ancestors root..node; match chain right-to-left
        def rec(ci: int, pi: int) -> bool:
            if ci < 0:
                return True
            comb, req = chain[ci]
            if pi < 0 or not _node_matches(path[pi], req):
                return False
            if ci == 0:
                return True
            prev_comb = chain[ci][0]
            if prev_comb == ">":
                return rec(ci - 1, pi - 1) if pi >= 1 else False
            # descendant: any ancestor strictly above can match chain[ci-1]
            return any(rec(ci - 1, j) for j in range(pi - 1, -1, -1))

        return rec(len(chain) - 1, len(path) - 1)

    found = []

    def walk(node, path):
        for ch in node.children:
            if ch.tag == "__text__":
                continue
            p = path + [ch]
            last_req = chain[-1][1]
            if _node_matches(ch, last_req) and path_matches(p):
                found.append(ch)
            walk(ch, p)

    walk(root, [])
    return found


def _text_content(node) -> str:
    parts: list[str] = []

    def rec(n):
        for ch in n.children:
            if ch.tag == "__text__":
                parts.append(ch.text or "")
            else:
                rec(ch)

    rec(node)
    return "".join(parts)


def extract_xpath(html: str, xpath: str, index: int = 0) -> str | None:
    """The reference's xpath evaluation (extra_column.rs:180-215): strip
    `/text()`, split a trailing `/@attr`, convert to CSS, select the
    index-th match in document order, return trimmed text content (None if
    empty) or the attribute value."""
    from ..sources.markdown import _TreeBuilder

    if html is None:
        return None
    xpath = xpath.strip()
    if xpath.endswith("/text()"):
        xpath = xpath[: -len("/text()")]
    base, _, attr = xpath.rpartition("/@")
    if not base:
        base, attr = xpath, None
    chain = _parse_css(_xpath_to_css(base))
    tb = _TreeBuilder()
    tb.feed(html)
    nodes = _select(tb.root, chain)
    if index >= len(nodes):
        return None
    el = nodes[index]
    if attr:
        v = el.attrs.get(attr)
        return v.strip() if v is not None else None
    text = _text_content(el).strip()
    return text or None


def truncated_value(spec: ExtraColumn, value: str | None) -> str | None:
    """Display truncation (extra_column.rs:92-103): over-length values chop
    to length-1 chars + ellipsis unless the spec opted out with '>'."""
    if value is None:
        return None
    length = spec.length if spec.length is not None else len(spec.name)
    if spec.truncate and len(value) > length:
        return value[: max(length - 1, 0)].strip() + "…"
    return value


def extra_column_expr(spec: ExtraColumn, text_col) -> Column:
    if spec.kind == "regexp":
        # native, codegen'd — the fast path for the common case; '' -> NULL
        # because the reference's extract_value returns None on no-match
        # (regexp_extract's empty-string-on-miss would differ)
        return F.nullif(F.regexp_extract(text_col, spec.spec, spec.group), F.lit(""))
    if spec.kind == "plain":
        return text_col
    if spec.spec in ("//text()", "string(.)"):
        # whole-document text: pure string ops, skip the DOM
        return F.trim(F.regexp_replace(text_col, r"<[^>]*>", " "))
    xpath, idx = spec.spec, spec.group

    @F.pandas_udf("string")
    def xpath_udf(bodies: pd.Series) -> pd.Series:
        return pd.Series([extract_xpath(b, xpath, idx) for b in bodies.tolist()])

    return xpath_udf.asNondeterministic()(text_col)


def with_extra_columns(df: DataFrame, specs: list[str], text_col: str = "text") -> DataFrame:
    """Apply CLI-style extra-column specs as real columns."""
    out = df
    for raw in specs:
        spec = parse_extra_column(raw)
        out = out.withColumn(spec.name, extra_column_expr(spec, F.col(text_col)))
    return out
