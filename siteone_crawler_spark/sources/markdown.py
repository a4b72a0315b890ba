"""F16: HTML -> Markdown converter (S10's per-page core).

Reimplements (from public behavior) the reference's
HtmlToMarkdownConverter (/root/reference/src/export/utils/
html_to_markdown.rs, behavior vectors :1190-1390): ATX/Setext headings,
strong/em/strikethrough delimiters, links, images, nested ordered/
unordered lists, fenced code blocks with language from `class=
"language-*"`, inline code, blockquotes, `* * *` horizontal rules,
pipe tables, script/style/head removal, excluded selectors (tag, .class,
#id, [attr='value'] — the subset the reference's implicit exclusion list
uses: aria-hidden, role=menu, cookie banners, .hidden variants).

Pure stdlib (html.parser) — no external HTML libs in this image. The
Spark surface is `html_to_markdown_udf`, an Arrow-batched pandas UDF for
the markdown exporter sink.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
BLOCK_TAGS = frozenset(
    "p div section article header footer main aside nav h1 h2 h3 h4 h5 h6 ul ol li "
    "table tr blockquote pre figure figcaption".split()
)
SKIP_TAGS = frozenset("script style head noscript template svg iframe".split())

IMPLICIT_EXCLUDED_SELECTORS = [
    ".hidden", ".hide", ".invisible",
    "[aria-hidden='true']", "[role='menu']",
    ".cookie-panel", ".cookie-banner", ".cookie-consent", ".cookie-notice",
    ".cookie-bar", "#cookie-banner", "#cookie-consent", "#cookie-notice",
    "#cookiebanner", ".cc-window",
]


class _Node:
    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag, attrs=None, text=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[_Node] = []
        self.text = text


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("__root__")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(_Node("__text__", text=data))


def _matches_selector(node: _Node, sel: str) -> bool:
    sel = sel.strip()
    m = re.match(r"^\[([a-zA-Z-]+)=['\"]?([^'\"\]]*)['\"]?\]$", sel)
    if m:
        return node.attrs.get(m.group(1)) == m.group(2)
    if sel.startswith("."):
        cls = sel[1:].replace("\\:", ":")
        return cls in (node.attrs.get("class") or "").split()
    if sel.startswith("#"):
        return node.attrs.get("id") == sel[1:]
    return node.tag == sel


class HtmlToMarkdown:
    def __init__(
        self,
        excluded_selectors: list[str] | None = None,
        strong_delimiter: str = "**",
        em_delimiter: str = "*",
        bullet_list_marker: str = "-",
        code_block_fence: str = "```",
        horizontal_rule: str = "* * *",
        heading_style: str = "atx",  # 'atx' | 'setext'
        include_images: bool = True,
        convert_tables: bool = True,
        convert_strikethrough: bool = True,
        strikethrough_delimiter: str = "~~",
    ):
        self.excluded = list(excluded_selectors or []) + IMPLICIT_EXCLUDED_SELECTORS
        self.strong = strong_delimiter
        self.em = em_delimiter
        self.bullet = bullet_list_marker if bullet_list_marker in "-*+" else "-"
        self.fence = code_block_fence
        self.hr = horizontal_rule
        self.heading_style = heading_style
        self.include_images = include_images
        self.convert_tables = convert_tables
        self.convert_strikethrough = convert_strikethrough
        self.strike = strikethrough_delimiter

    # ---------------------------------------------------------------- public
    def convert(self, html: str) -> str:
        builder = _TreeBuilder()
        builder.feed(html or "")
        md = self._render_children(builder.root, depth=0)
        md = re.sub(r"\n{3,}", "\n\n", md)
        return md.strip("\n") + ("\n" if md.strip() else "")

    # --------------------------------------------------------------- render
    def _excluded(self, node: _Node) -> bool:
        return any(_matches_selector(node, s) for s in self.excluded)

    def _render_children(self, node: _Node, depth: int) -> str:
        out = []
        for c in node.children:
            out.append(self._render(c, depth))
        return "".join(out)

    def _inline(self, node: _Node, depth: int = 0) -> str:
        return self._render_children(node, depth)

    def _render(self, n: _Node, depth: int) -> str:
        if n.tag == "__text__":
            return re.sub(r"\s+", " ", n.text or "")
        if n.tag in SKIP_TAGS or self._excluded(n):
            return ""
        t = n.tag
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(t[1])
            text = self._inline(n).strip()
            if self.heading_style == "setext" and level <= 2:
                underline = ("=" if level == 1 else "-") * max(len(text), 3)
                return f"\n\n{text}\n{underline}\n\n"
            return f"\n\n{'#' * level} {text}\n\n"
        if t == "p":
            return f"\n\n{self._inline(n).strip()}\n\n"
        if t == "br":
            return "  \n"
        if t == "hr":
            return f"\n\n{self.hr}\n\n"
        if t in ("strong", "b"):
            inner = self._inline(n).strip()
            return f"{self.strong}{inner}{self.strong}" if inner else ""
        if t in ("em", "i"):
            inner = self._inline(n).strip()
            return f"{self.em}{inner}{self.em}" if inner else ""
        if t in ("del", "s", "strike"):
            inner = self._inline(n).strip()
            if not self.convert_strikethrough:
                return inner
            return f"{self.strike}{inner}{self.strike}" if inner else ""
        if t == "a":
            inner = self._inline(n).strip()
            href = n.attrs.get("href", "")
            return f"[{inner}]({href})" if href else inner
        if t == "img":
            if not self.include_images:
                return ""
            return f"![{n.attrs.get('alt', '')}]({n.attrs.get('src', '')})"
        if t in ("ul", "ol"):
            return "\n\n" + self._render_list(n, depth) + "\n\n"
        if t == "blockquote":
            inner = self._render_children(n, depth).strip()
            quoted = "\n".join(f"> {line}" for line in inner.splitlines())
            return f"\n\n{quoted}\n\n"
        if t == "pre":
            return self._render_pre(n)
        if t == "code":
            return f"`{self._text_of(n)}`"
        if t == "table" and self.convert_tables:
            return self._render_table(n)
        if t in BLOCK_TAGS:
            inner = self._render_children(n, depth).strip()
            return f"\n\n{inner}\n\n" if inner else ""
        return self._render_children(n, depth)

    def _text_of(self, n: _Node) -> str:
        if n.tag == "__text__":
            return n.text or ""
        return "".join(self._text_of(c) for c in n.children)

    def _render_pre(self, n: _Node) -> str:
        code = n.children[0] if n.children and n.children[0].tag == "code" else n
        lang = ""
        for cls in (code.attrs.get("class") or "").split():
            if cls.startswith("language-"):
                lang = cls[len("language-") :]
                break
        body = self._text_of(code).strip("\n")
        return f"\n\n{self.fence}{lang}\n{body}\n{self.fence}\n\n"

    def _render_list(self, n: _Node, depth: int) -> str:
        lines = []
        idx = 0
        for c in n.children:
            if c.tag != "li":
                continue
            idx += 1
            marker = f"{idx}." if n.tag == "ol" else self.bullet
            sublists = [k for k in c.children if k.tag in ("ul", "ol")]
            own = [k for k in c.children if k.tag not in ("ul", "ol")]
            head = _Node("li")
            head.children = own
            text = self._render_children(head, depth + 1).strip()
            lines.append("    " * depth + f"{marker} {text}")
            for sub in sublists:
                lines.append(self._render_list(sub, depth + 1))
        return "\n".join(lines)

    def _render_table(self, n: _Node) -> str:
        rows: list[list[str]] = []

        def collect(node):
            for c in node.children:
                if c.tag == "tr":
                    cells = [
                        self._inline(cell).strip()
                        for cell in c.children
                        if cell.tag in ("td", "th")
                    ]
                    if cells:
                        rows.append(cells)
                else:
                    collect(c)

        collect(n)
        if not rows:
            return ""
        width = max(len(r) for r in rows)
        out = []
        for i, r in enumerate(rows):
            r = r + [""] * (width - len(r))
            out.append("| " + " | ".join(r) + " |")
            if i == 0:
                out.append("|" + "|".join(" --- " for _ in range(width)) + "|")
        return "\n\n" + "\n".join(out) + "\n\n"


def html_to_markdown(html: str, **options) -> str:
    return HtmlToMarkdown(**options).convert(html)


def html_to_markdown_udf(**options):
    """Arrow-batched pandas UDF for the markdown exporter sink (S10)."""
    from pyspark.sql import functions as F

    conv = HtmlToMarkdown(**options)

    @F.pandas_udf("string")
    def to_md(body: pd.Series) -> pd.Series:
        return pd.Series([conv.convert(b) if b is not None else None for b in body.tolist()])

    return to_md.asNondeterministic()


# --------------------------------------------------- site-tree export (S10)
RE_MD_LINK = re.compile(r"\[([^\]]*)\]\(([^)]+)\)")
RE_MD_IMAGE = re.compile(r"!\[.*?\]\(.*?\)")
RE_MD_LINKED_IMAGE = re.compile(r"\[!\[[^\]]*\]\([^\)]*\)\]\([^\)]*\)")
RE_MD_EMPTY_LINK = re.compile(r"\[[^\]]*\]\(\)")
RE_MD_EMPTY_LIST_ITEM = re.compile(r"(?m)^\s*[-*+]\s*$\n?")


def normalize_markdown_content(
    md: str,
    replace_html_links_with_md: bool = True,
    disable_images: bool = False,
    ignore_regexes: tuple[str, ...] = (),
) -> str:
    """Post-conversion normalization (markdown_exporter.rs:312-457 observed
    behavior): when exporting a full site, `.html` link targets become `.md`
    (so inter-page links stay navigable inside the exported tree), images can
    be stripped, and empty links / empty list items left behind by removals
    are cleaned up."""
    ignore = [re.compile(p) for p in ignore_regexes]

    if replace_html_links_with_md:

        def to_md_target(m: re.Match) -> str:
            text, url = m.group(1), m.group(2)
            if any(r.search(url) for r in ignore):
                return m.group(0)
            return f"[{text}]({url.replace('.html#', '.md#').replace('.html', '.md')})"

        md = RE_MD_LINK.sub(to_md_target, md)
    if disable_images:
        md = RE_MD_LINKED_IMAGE.sub("", md)
        md = RE_MD_IMAGE.sub("", md)
    md = RE_MD_EMPTY_LINK.sub("", md)
    md = RE_MD_EMPTY_LIST_ITEM.sub("", md)
    return md


def export_markdown_site(
    html_docs,
    out_dir: str,
    initial_url: str,
    excluded_selectors: list[str] | None = None,
    disable_images: bool = False,
    preserve_url_structure: bool = False,
) -> int:
    """S10's whole-site exporter (markdown_exporter.rs:147-299 behavior,
    integration baseline tests/integration_crawl.rs:284-290): one .md file
    per HTML page at its offline-converted path with `.html` swapped for
    `.md`, inter-page links rewritten relative and re-targeted at the .md
    twins; non-HTML assets are stored raw at their converted paths.

    Same executor-side mapInPandas shape as export_offline_site — each
    partition writes its own files to the shared filesystem; only the
    per-file manifest rows return to the driver. Expects columns
    (doc_id, content_type, body). Returns files written."""
    import os

    from .offline import (
        convert_url_to_relative,
        rewrite_content_for_offline,
        safe_export_target,
    )

    os.makedirs(out_dir, exist_ok=True)
    kw = dict(
        preserve_url_structure=preserve_url_structure,
        is_external_domain_allowed_for_crawling=lambda _h: True,
    )

    def write_partition(pdfs):
        conv = HtmlToMarkdown(excluded_selectors=excluded_selectors)
        for pdf in pdfs:
            paths = []
            for url, ct, body in zip(pdf["doc_id"], pdf["content_type"], pdf["body"]):
                rel = convert_url_to_relative(initial_url, initial_url, url, **kw)
                if rel.startswith(("http://", "https://", "#", "mailto:")):
                    paths.append(None)
                    continue
                rel = rel.split("#", 1)[0]
                # storage is rooted at the export dir: '../' backlinks from a
                # non-root initial URL collapse (store_file's traversal strip,
                # markdown_exporter.rs:205 + :937-950)
                rel = rel.replace("../", "").lstrip("/ ")
                is_html = (ct or "text/html").split(";")[0].strip() in (
                    "text/html",
                    "application/xhtml+xml",
                )
                # only .html-suffixed store paths become .md (reference
                # store_file converts by stored extension, not content type —
                # a .php page stores its offline-rewritten HTML unconverted)
                to_md = is_html and rel.endswith(".html")
                if to_md:
                    rel = rel[: -len(".html")] + ".md"
                target = safe_export_target(out_dir, rel)
                if target is None:  # crafted ..-segments must not escape
                    paths.append(None)
                    continue
                os.makedirs(os.path.dirname(target) or out_dir, exist_ok=True)
                if is_html:
                    content = rewrite_content_for_offline(
                        body or "", url, initial_url, ct or "text/html", **kw
                    )
                    if to_md:
                        content = normalize_markdown_content(
                            conv.convert(content),
                            replace_html_links_with_md=True,
                            disable_images=disable_images,
                        )
                else:
                    content = body or ""
                with open(target, "w", encoding="utf-8") as f:
                    f.write(content)
                paths.append(rel)
            yield pd.DataFrame({"url": pdf["doc_id"], "file_path": paths})

    manifest = html_docs.mapInPandas(write_partition, "url string, file_path string")
    return manifest.filter("file_path IS NOT NULL").count()


# ------------------------------------------- single-file aggregation (S10)
def _url_from_md_path(rel_path: str, base_url: str) -> str:
    """Converted-tree path -> original URL (markdown_site_aggregator.rs:
    150-181: strip .md, a trailing /index becomes /, root index is the
    base URL itself)."""
    p = rel_path.replace("\\", "/").lstrip("/")
    if p.endswith(".md"):
        p = p[:-3]
    p = re.sub(r"/index$", "/", p)
    base = base_url.rstrip("/")
    if p in ("index", ""):
        return base
    return f"{base}/{p.lstrip('/')}" if base else p


def _page_sort_key(url: str, base_url: str):
    """Root first, then component-wise path order (aggregator.rs:45-66)."""
    base = base_url.rstrip("/")
    if url == base or url == "":
        return (0,)
    return (1, url.rstrip("/").split("/"))


def combine_markdown_site(
    directory: str,
    base_url: str,
    remove_links_and_images: bool = False,
) -> str:
    """Combine an exported .md tree into one document
    (markdown_site_aggregator.rs:30-116 observed behavior): pages ordered
    root-first/path-wise, each introduced by an `⬇️ `URL: ...``
    marker between `---` rules; lines common to the top (header) and bottom
    (footer) of EVERY page are hoisted out once. Header/footer detection
    here is exact-line common prefix/suffix — the reference additionally
    fuzzy-matches ~90%-similar lines; exact matching is a documented
    conservative subset (it never hoists non-identical content)."""
    import os

    pages: list[tuple[str, list[str]]] = []
    for root, _dirs, files in os.walk(directory):
        for fn in sorted(files):
            if not fn.endswith(".md"):
                continue
            p = os.path.join(root, fn)
            rel = os.path.relpath(p, directory)
            with open(p, encoding="utf-8") as f:
                lines = f.read().rstrip("\n").split("\n")
            pages.append((_url_from_md_path(rel, base_url), lines))
    pages.sort(key=lambda t: _page_sort_key(t[0], base_url))

    header: list[str] = []
    footer: list[str] = []
    if len(pages) >= 2:
        all_lines = [lines for _, lines in pages]
        n = min(len(ls) for ls in all_lines)
        while len(header) < n and all(
            ls[len(header)] == all_lines[0][len(header)] for ls in all_lines
        ):
            header.append(all_lines[0][len(header)])
        remaining = n - len(header)
        while len(footer) < remaining and all(
            ls[-1 - len(footer)] == all_lines[0][-1 - len(footer)] for ls in all_lines
        ):
            footer.append(all_lines[0][-1 - len(footer)])
        footer.reverse()

    out: list[str] = []
    if header:
        out.extend(header)
        out.append("")
    for url, lines in pages:
        body = lines[len(header):] if header else lines
        if footer:
            body = body[: len(body) - len(footer)]
        out.append(f"⬇️ `URL: {url}`\n\n---\n\n")
        out.extend(body)
        out.append("\n\n---\n")
    if footer:
        if out and out[-1] == "":
            out.pop()
        out.append("")
        out.extend(footer)
    md = "\n".join(out)
    if remove_links_and_images:
        md = RE_MD_LINKED_IMAGE.sub("", md)
        md = RE_MD_IMAGE.sub("", md)
        md = RE_MD_LINK.sub(lambda m: m.group(1), md)
    return md
