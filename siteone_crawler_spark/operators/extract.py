"""Content extraction (F4-F8): HTML/CSS/JS/XML link extractors + meta.

Reimplements (from observed public behavior, not code) the reference's
ContentProcessor family:

  - HTML: ~25 regexes — <a href> quoted/unquoted (fragment-leading hrefs
    excluded at the regex level), escaped href, font url()/<link>, <img
    src/data-src>, <input src>, <link> image/js/stylesheet variants,
    <source src>, CSS image url(), srcset/imagesrcset (", "-split +
    whitespace descriptor strip, per-srcset dedup), <audio src>,
    <video src>, <script src>, .src= assignments, Next.js ":...chunks...js",
    optional HTML-comment stripping, <base href> override
    (/root/reference/src/content_processor/html_processor.rs:28-143,
    161-415, 767-811; base href crawler.rs:17, 963-987)
  - CSS: url() refs classified image/font/css by extension
    (css_processor.rs:17-89)
  - JS: import-from, quoted .js paths, quoted https .js URLs, webpack
    chunk-map reconstruction (javascript_processor.rs:18-143)
  - XML: sitemap <urlset>/<sitemapindex> <loc> extraction
    (xml_processor.rs:32-160), gzip support (crawler.rs:607-624)
  - meta: title/description/keywords (attribute-order independent), DOM
    element count, entity decode (crawler.rs:17-34, 901-937, 1652-1660)

Extraction output is the spans schema (kind, text, media_ref, offset):
kind names map to UrlSource codes via config.SPAN_KIND_TO_SOURCE, text
holds the RAW extracted href (normalization happens downstream in the
resolve kernel, matching the reference's FoundUrl::new), and offset is the
enqueue-relevant order — the reference's extractor dispatch order with
FoundUrls first-wins dedup (found_urls.rs:29-32, keyed on the normalized
text, found_url.rs:122-163).

Spark surface: ONE Arrow-batched pandas UDF (make_extract_spans_udf) that
turns (url, content_type, body) into the spans array — per-row Python only
inside Arrow batches, per the north rule. The per-executor regex set is
compiled once at module import (reference once_cell Lazy statics, O1).
"""

from __future__ import annotations

import gzip
import re
from dataclasses import dataclass

import pandas as pd

from ..functions.urls import canonicalize, normalize_href

# --- HTML regexes (html_processor.rs:28-143) --------------------------------

RE_A_HREF = re.compile(
    r"""(?is)<a[^>]*\shref=(?:["']([^"'#][^"']*)["']|([^\s>"'#][^\s>"']*))[^>]*>"""
)
RE_ESCAPED_HREF = re.compile(r"""(?i)href\\["'][:=]\\["'](https?://[^"'\\]+)\\["']""")
RE_FONT_URL = re.compile(
    r"""(?is)url\s*\(\s*['"]?([^'"\s>]+\.(?:eot|ttf|woff2|woff|otf)[^'")\s]*)['"]?\s*\)"""
)
RE_FONT_LINK = re.compile(
    r"""(?is)<link\s+[^>]*href=(?:["']([^"']+\.(?:eot|ttf|woff2|woff|otf)[^"']*)["']|"""
    r"""([^\s>"']+\.(?:eot|ttf|woff2|woff|otf)[^\s>"']*))[^>]*>"""
)
RE_IMG_SRC = re.compile(r"""(?is)<img\s+[^>]*?src=(?:["']([^"']+)["']|([^\s>"']+))[^>]*>""")
RE_IMG_DATA_SRC = re.compile(
    r"""(?is)<img\s+[^>]*?data-src=(?:["']([^"']+)["']|([^\s>"']+))[^>]*>"""
)
RE_INPUT_SRC = re.compile(
    r"""(?is)<input\s+[^>]*?src=(?:["']([^"']+\.[a-z0-9]{1,10})["']|"""
    r"""([^\s>"']+\.[a-z0-9]{1,10}))[^>]*>"""
)
RE_LINK_IMAGE = re.compile(
    r"""(?is)<link\s+[^>]*?href=(?:["']([^"']+\.(?:png|gif|jpg|jpeg|webp|avif|tif|bmp|svg|ico)"""
    r"""(?:\?[^"']*)?)["']|([^\s>"']+\.(?:png|gif|jpg|jpeg|webp|avif|tif|bmp|svg|ico)"""
    r"""(?:\?[^\s>"']*)?))[^>]*>"""
)
RE_SOURCE_SRC = re.compile(r"""(?is)<source\s+[^>]*?src=["']([^"'>]+)["'][^>]*>""")
RE_CSS_URL_IMAGE = re.compile(
    r"""(?is)url\s*\(\s*['"]?([^'")\s]+\.(?:jpg|jpeg|png|gif|bmp|tif|webp|avif)[^'")\s]*)['"]?\s*\)"""
)
RE_SOURCE_SRCSET = re.compile(r"""(?is)<source\s+[^>]*?srcset=["']([^"'>]+)["'][^>]*>""")
RE_IMG_SRCSET = re.compile(r"""(?is)<img[^>]+srcset=["']([^"']+)["']""")
RE_IMAGESRCSET = re.compile(r"""(?is)<[a-z]+[^>]+imagesrcset=["']([^"']+)["']""")
RE_AUDIO_SRC = re.compile(r"""(?is)<audio\s+[^>]*?src=(?:["']([^"']+)["']|([^\s>"']+))[^>]*>""")
RE_VIDEO_SRC = re.compile(r"""(?is)<video\s+[^>]*?src=(?:["']([^"']+)["']|([^\s>"']+))[^>]*>""")
RE_SCRIPT_SRC = re.compile(r"""(?is)<script\s+[^>]*?src=(?:["']([^"']+)["']|([^\s>"']+))[^>]*>""")
RE_LINK_JS = re.compile(
    r"""(?is)<link\s+[^>]*href=(?:["']([^"']+\.(?:json|js)(?:\?[^"']*)?)["']|"""
    r"""([^\s>"']+\.(?:json|js)(?:\?[^\s>"']*)?))[^>]*>"""
)
RE_DOT_SRC = re.compile(r"""(?is)\.src\s*=\s*["']([^"']+)["']""")
RE_NEXTJS_CHUNKS = re.compile(r"""(?is):([a-z0-9/._\-\[\]]+chunks[a-z0-9/._\-\[\]]+\.js)""")
RE_LINK_STYLESHEET = re.compile(r"""(?is)<link\s+[^>]*?href=["']([^"']+)["'][^>]*>""")
RE_FILE_EXTENSION = re.compile(r"(?i)\.[a-z0-9]{1,10}(\?.*)?$")
RE_HTML_COMMENT = re.compile(r"<!--[\s\S]*?-->")
RE_BASE_HREF = re.compile(r"""(?is)<base[^>]+href\s*=\s*["']?([^"'\s>]+)""")

HTML_PAGES_EXTENSIONS = (
    "htm html shtml php phtml ashx xhtml asp aspx jsp jspx do cfm cgi pl"
).split()
RE_HTML_EXT = re.compile(r"(?i)\.(%s)" % "|".join(HTML_PAGES_EXTENSIONS))

# --- CSS regexes (css_processor.rs:18-26) -----------------------------------

RE_CSS_URL = re.compile(r"""(?im)url\s*\(\s*["']?([^"')]+)["']?\s*\)""")
RE_IS_IMAGE = re.compile(r"(?i)\.(jpg|jpeg|png|gif|webp|avif|svg|ico|tif|bmp)(\?.*|#.*)?$")
RE_IS_FONT = re.compile(r"(?i)\.(eot|ttf|woff2|woff|otf)(\?.*|#.*)?$")
RE_IS_CSS = re.compile(r"(?i)\.css(\?.*|#.*)?$")

# --- JS regexes (javascript_processor.rs:18-30) -----------------------------

RE_IMPORT_FROM = re.compile(r"""(?i)from\s*["']([^"']+\.js[^"']*)["']""")
RE_QUOTED_JS_PATH = re.compile(r"""(?i)["'](/[^"']+\.js)["']""")
RE_QUOTED_HTTPS_JS = re.compile(r"""(?i)["'](https://[^"']+\.js)["']""")
RE_WEBPACK_CHUNKS = re.compile(
    r"""(?i)"assets/js/".*\+.*\(\{([^}]*)\}.*\[e\].*\|\|.*e\)\s*\+\s*"\.".*\+\s*\{([^}]+)\}"""
)
RE_WEBPACK_NAME_ITEM = re.compile(r"""([0-9]+):\s*"([^"']+)\"""")
RE_WEBPACK_HASH_ITEM = re.compile(r"""([0-9]+):\s*"([a-f0-9]+)\"""")

# --- meta regexes (crawler.rs:20-34) ----------------------------------------

RE_TITLE = re.compile(r"(?is)<title[^>]*>([^<]*)</title>")
RE_DESCRIPTION = re.compile(
    r"""(?is)<meta\s+(?:[^>]*?name=["']description["'][^>]*?content=["']([^"']*)["']|"""
    r"""[^>]*?content=["']([^"']*)["'][^>]*?name=["']description["'])[^>]*>"""
)
RE_KEYWORDS = re.compile(
    r"""(?is)<meta\s+(?:[^>]*?name=["']keywords["'][^>]*?content=["']([^"']*)["']|"""
    r"""[^>]*?content=["']([^"']*)["'][^>]*?name=["']keywords["'])[^>]*>"""
)
RE_DOM_COUNT = re.compile(r"<\w+")

RE_TAG = re.compile(r"(?s)<[^>]*>")
RE_SCRIPT_BLOCK = re.compile(r"(?is)<script[^>]*>.*?</script>")
RE_STYLE_BLOCK = re.compile(r"(?is)<style[^>]*>.*?</style>")
RE_WS = re.compile(r"\s+")


def decode_html_entities(text: str) -> str:
    """crawler.rs:1652-1660 — the reference's fixed entity set."""
    return (
        text.replace("&amp;", "&")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&ndash;", "–")
        .replace("&mdash;", "—")
    )


@dataclass(frozen=True)
class ExtractFlags:
    """Per-asset-class toggles (P13/P14) — html_processor.rs:766-807."""

    single_page: bool = False
    single_foreign_page: bool = False
    images_enabled: bool = True
    fonts_enabled: bool = True
    files_enabled: bool = True
    scripts_enabled: bool = True
    styles_enabled: bool = True
    ignore_html_comments: bool = False


def _g12(m: re.Match) -> str:
    return m.group(1) if m.group(1) is not None else m.group(2)


def extract_base_href(html: str) -> str | None:
    """<base href> override — only absolute/scheme-relative/rooted values
    count (crawler.rs:963-987)."""
    m = RE_BASE_HREF.search(html)
    if not m:
        return None
    v = m.group(1)
    if v.startswith(("http://", "https://", "//", "/")):
        return v
    return None


def _srcset_urls(values: list[str]) -> list[str]:
    """', '-split, whitespace descriptor strip, order-preserving dedup
    (html_processor.rs:286-303)."""
    out: list[str] = []
    for srcset in values:
        for source in srcset.split(", "):
            t = source.strip()
            if not t:
                continue
            url_part = t.split()[0].strip() if t.split() else ""
            if url_part and url_part not in out:
                out.append(url_part)
    return out


def find_html_links(
    html: str,
    flags: ExtractFlags = ExtractFlags(),
    source_d2l: str | None = None,
    initial_d2l: str | None = None,
    source_url: str = "",
    initial_host: str = "",
) -> list[tuple[str, str]]:
    """Ordered (kind, raw_text) pairs in the reference's find_urls dispatch
    order (html_processor.rs:766-807) with FoundUrls first-wins dedup keyed
    on the normalized text (found_urls.rs:29-32)."""
    if flags.ignore_html_comments and "<!--" in html:
        html = RE_HTML_COMMENT.sub("", html)

    ordered: list[tuple[str, str]] = []
    seen: set[str] = set()

    def add(kind: str, texts: list[str]) -> None:
        for t in texts:
            key = normalize_href(t)
            if not key or key in seen:
                continue
            seen.add(key)
            ordered.append((kind, t))

    # 1. <a href> (+ escaped) — find_href_urls (html_processor.rs:161-198)
    if not flags.single_page and not (
        flags.single_foreign_page
        and source_d2l is not None
        and initial_d2l is not None
        and source_d2l != initial_d2l
    ):
        hrefs = [_g12(m) for m in RE_A_HREF.finditer(html)]
        hrefs += [m.group(1) for m in RE_ESCAPED_HREF.finditer(html)]
        if not flags.files_enabled:
            hrefs = [
                u for u in hrefs if not RE_FILE_EXTENSION.search(u) or RE_HTML_EXT.search(u)
            ]
        add("a_href", hrefs)

    # 2. fonts (html_processor.rs:201-219)
    if flags.fonts_enabled:
        add("css_url", [m.group(1) for m in RE_FONT_URL.finditer(html)])
        add("link_href", [_g12(m) for m in RE_FONT_LINK.finditer(html)])

    # 3. images (html_processor.rs:222-305)
    if flags.images_enabled:
        add("img_src", [_g12(m) for m in RE_IMG_SRC.finditer(html)])
        add("img_src", [_g12(m) for m in RE_IMG_DATA_SRC.finditer(html)])
        add("input_src", [_g12(m) for m in RE_INPUT_SRC.finditer(html)])
        add("link_href", [_g12(m) for m in RE_LINK_IMAGE.finditer(html)])
        add("source_src", [m.group(1) for m in RE_SOURCE_SRC.finditer(html)])
        add("css_url", [m.group(1) for m in RE_CSS_URL_IMAGE.finditer(html)])
        srcsets = [m.group(1) for m in RE_SOURCE_SRCSET.finditer(html)]
        srcsets += [m.group(1) for m in RE_IMG_SRCSET.finditer(html)]
        srcsets += [m.group(1) for m in RE_IMAGESRCSET.finditer(html)]
        add("img_srcset", _srcset_urls(srcsets))

    # 4. audio + video under files (html_processor.rs:750-753)
    if flags.files_enabled:
        add("audio_src", [_g12(m) for m in RE_AUDIO_SRC.finditer(html)])
        add("video_src", [_g12(m) for m in RE_VIDEO_SRC.finditer(html)])

    # 5. scripts (html_processor.rs:330-383)
    if flags.scripts_enabled:
        add("script_src", [_g12(m) for m in RE_SCRIPT_SRC.finditer(html)])
        add("link_href", [_g12(m) for m in RE_LINK_JS.finditer(html)])
        add("inline_script_src", [m.group(1) for m in RE_DOT_SRC.finditer(html)])
        add("inline_script_src", _nextjs_chunks(html, source_url, initial_host))

    # 6. stylesheets (html_processor.rs:386-403)
    if flags.styles_enabled:
        sheets = []
        for m in RE_LINK_STYLESHEET.finditer(html):
            full_lower = m.group(0).lower()
            if "rel=" not in full_lower or "stylesheet" in full_lower:
                sheets.append(m.group(1))
        add("link_href", sheets)

    return ordered


def _source_path(url: str) -> str:
    c = canonicalize(url) if url else None
    return c["path"] if c and c["valid"] else ""


def _homepage(url: str) -> str:
    c = canonicalize(url)
    if not c["valid"]:
        return ""
    port = "" if c["port"] in (80, 443) else f":{c['port']}"
    return f"{c['scheme']}://{c['host']}{port}"


def _nextjs_chunks(html: str, source_url: str, initial_host: str) -> list[str]:
    """Next.js chunk URL reconstruction (html_processor.rs:358-381)."""
    out = []
    src = canonicalize(source_url) if source_url else None
    for m in RE_NEXTJS_CHUNKS.finditer(html):
        v = m.group(1)
        if v.startswith("//"):
            scheme = src["scheme"] if src and src["valid"] else "https"
            out.append(f"{scheme}:{v}")
        elif v.startswith(("http://", "https://")):
            out.append(v)
        elif "/_next/" in v:
            if src and src["valid"] and initial_host and src["host"] != initial_host:
                out.append(_homepage(source_url) + v)
            else:
                out.append(v)
        else:
            out.append(f"{_homepage(source_url)}/_next/{v}")
    return out


def find_css_links(css: str, flags: ExtractFlags = ExtractFlags()) -> list[tuple[str, str]]:
    """CSS url() refs, class-gated by extension (css_processor.rs:61-89)."""
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in RE_CSS_URL.finditer(css):
        u = m.group(1)
        is_img, is_font, is_css = (
            bool(RE_IS_IMAGE.search(u)),
            bool(RE_IS_FONT.search(u)),
            bool(RE_IS_CSS.search(u)),
        )
        if (
            (flags.images_enabled and is_img)
            or (flags.fonts_enabled and is_font)
            or (flags.styles_enabled and is_css)
        ):
            key = normalize_href(u)
            if key and key not in seen:
                seen.add(key)
                out.append(("css_url", u))
    return out


def find_js_links(js: str) -> list[tuple[str, str]]:
    """JS import/quoted-path/webpack-chunk extraction
    (javascript_processor.rs:61-135). The processor bails on HTML content
    and on files without a 'from' token — reference-faithful."""
    if "<html" in js.lower():
        return []
    if "from" not in js:
        return []
    urls: list[str] = []
    urls += [m.group(1).strip() for m in RE_IMPORT_FROM.finditer(js)]
    urls += [m.group(1).strip() for m in RE_QUOTED_JS_PATH.finditer(js)]
    urls += [m.group(1).strip() for m in RE_QUOTED_HTTPS_JS.finditer(js)]
    m = RE_WEBPACK_CHUNKS.search(js)
    if m:
        names = {
            im.group(1): im.group(2)
            for item in m.group(1).split(",")
            if (im := RE_WEBPACK_NAME_ITEM.search(item))
        }
        for item in m.group(2).split(","):
            im = RE_WEBPACK_HASH_ITEM.search(item)
            if im:
                cid, chash = im.group(1), im.group(2)
                urls.append(f"/assets/js/{cid}.{chash}.js")
                if cid in names:
                    urls.append(f"/assets/js/{names[cid]}.{chash}.js")
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for u in urls:
        key = normalize_href(u)
        if key and key not in seen:
            seen.add(key)
            out.append(("js_url", u))
    return out


# --- framework extractors (F7) ----------------------------------------------
# Astro (astro_processor.rs:21-31, 146-168), Next.js manifest
# (nextjs_processor.rs:17-97), Svelte (svelte_processor.rs:16, 48-58).

RE_ASTRO_URLS = re.compile(r"""(?i)(component-url|renderer-url)=["']([^"']+)["']""")
# reference RE_MANIFEST_JS has no quantifier on the char class — it really
# matches a single character before ".js" (nextjs_processor.rs:17); mirrored
RE_NEXTJS_MANIFEST_JS = re.compile(r"""(?is)["']([a-z0-9/._\-\[\]]\.js)["']""")
RE_NEXT_QUERY_PARAMS = re.compile(
    r"(?i)((_next|chunks)/[a-z0-9/()\[\]._@%^{}-]+\.[a-z0-9]{1,5})\?[a-z0-9_&=.-]+"
)
RE_DPL_QUERY = re.compile(r"""(?i)\?dpl=[^"' ]+""")
RE_SVELTE_TAG = re.compile(r"(?i)<svelte:[^>]+>\s*")
RE_MODULE_SCRIPT_SRC_1 = re.compile(
    r"""(?im)<script[^>]+type="module"[^>]+src="([^"]+)"[^>]*>\s*</script>"""
)
RE_MODULE_SCRIPT_SRC_2 = re.compile(
    r"""(?im)<script[^>]+src="([^"]+)"[^>]+type="module"[^>]*>\s*</script>"""
)


def find_astro_links(content: str) -> list[tuple[str, str]]:
    """Astro island component-url/renderer-url extraction, gated on a
    case-sensitive 'astro' substring (astro_processor.rs:139-167). Kind is
    js_url (UrlSource::JsUrl)."""
    if "astro" not in content:
        return []
    return [("js_url", m.group(2)) for m in RE_ASTRO_URLS.finditer(content)]


def find_nextjs_manifest_links(content: str, source_path: str) -> list[tuple[str, str]]:
    """Next.js build-manifest chunk extraction: only runs when the SOURCE
    path contains '_next/' and 'manifest'; each match is prefixed with the
    path up to and including '/_next/' (nextjs_processor.rs:64-97)."""
    path = source_path or ""
    if "_next/" not in path or "manifest" not in path.lower():
        return []
    pos = path.find("/_next/")
    if pos < 0:
        return []
    base = path[: pos + 7]
    return [("js_url", base + m.group(1)) for m in RE_NEXTJS_MANIFEST_JS.finditer(content)]


def nextjs_pre_parse(content: str) -> str:
    """NextJsProcessor.apply_content_changes_before_url_parsing: strip query
    params from _next/chunks static-asset refs and ?dpl= deploy ids
    (nextjs_processor.rs:99-113) so extracted URLs dedup cleanly."""
    if "_next" not in content.lower():
        return content
    content = RE_NEXT_QUERY_PARAMS.sub(r"\1", content)
    return RE_DPL_QUERY.sub("", content)


def strip_svelte_tags(content: str) -> str:
    """SvelteProcessor offline transform: remove <svelte:*> tags
    (svelte_processor.rs:48-58)."""
    if "<svelte:" not in content:
        return content
    return RE_SVELTE_TAG.sub("", content)


def astro_offline_scripts(content: str) -> str:
    """AstroProcessor offline transform without a content loader: rewrite
    <script type="module" src=X></script> to <script src=X></script> for
    file:// compatibility (astro_processor.rs:180-205)."""
    if "astro" not in content:
        return content
    content = RE_MODULE_SCRIPT_SRC_1.sub(r'<script src="\1"></script>', content)
    return RE_MODULE_SCRIPT_SRC_2.sub(r'<script src="\1"></script>', content)


# --- XML sitemap source (S5) ------------------------------------------------


def maybe_gunzip(body: bytes) -> bytes:
    """.xml.gz sitemaps arrive gzipped (crawler.rs:607-624)."""
    if body[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(body)
        except OSError:
            return body
    return body


def find_sitemap_locs(xml: str) -> list[tuple[str, str]]:
    """<urlset>/<sitemapindex> <loc> extraction (xml_processor.rs:32-160):
    index docs keep only .xml/.xml.gz locs; namespace-agnostic."""
    import xml.etree.ElementTree as ET

    low = xml.lower()
    is_index = "<sitemapindex" in low
    if not is_index and "<urlset" not in low:
        return []
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    out: list[tuple[str, str]] = []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    if is_index:
        for sm in root.iter():
            if local(sm.tag) != "sitemap":
                continue
            for loc in sm.iter():
                if local(loc.tag) == "loc" and loc.text:
                    u = loc.text.strip()
                    if u.lower().endswith((".xml", ".xml.gz")):
                        out.append(("sitemap_loc", u))
    else:
        for loc in root.iter():
            if local(loc.tag) == "loc" and loc.text:
                u = loc.text.strip()
                if u:
                    out.append(("sitemap_loc", u))
    return out


def is_sitemap_url(path: str) -> bool:
    """crawler.rs:1637-1640."""
    p = path.lower()
    return "sitemap" in p and (p.endswith(".xml") or p.endswith(".xml.gz"))


# --- meta extraction (F8) ---------------------------------------------------


def extract_meta(html: str) -> dict:
    """Title/Description/Keywords/DOM count (crawler.rs:895-937)."""
    out = {"title": None, "description": None, "keywords": None, "dom_count": 0}
    m = RE_TITLE.search(html)
    if m:
        out["title"] = decode_html_entities(m.group(1).strip())
    m = RE_DESCRIPTION.search(html)
    if m:
        out["description"] = decode_html_entities(
            (m.group(1) if m.group(1) is not None else m.group(2) or "").strip()
        )
    m = RE_KEYWORDS.search(html)
    if m:
        out["keywords"] = decode_html_entities(
            (m.group(1) if m.group(1) is not None else m.group(2) or "").strip()
        )
    out["dom_count"] = len(RE_DOM_COUNT.findall(html))
    return out


def visible_text(html: str) -> str:
    """Crude tag-stripped text (for the interleaved text span)."""
    t = RE_SCRIPT_BLOCK.sub(" ", html)
    t = RE_STYLE_BLOCK.sub(" ", t)
    t = RE_HTML_COMMENT.sub(" ", t)
    t = RE_TAG.sub(" ", t)
    return RE_WS.sub(" ", decode_html_entities(t)).strip()


# --- dispatch (ContentProcessor registry) -----------------------------------


def extract_spans(
    body: str,
    content_type: str,
    source_url: str = "",
    flags: ExtractFlags = ExtractFlags(),
    initial_host: str = "",
    include_text: bool = False,
) -> list[dict]:
    """Dispatch to the right processor by content type (the reference's
    ContentProcessorManager, content_processor/manager.rs) and emit spans
    in enqueue order. HTML docs additionally yield a leading base_href span
    when <base href> is present (crawler.rs:963-987) and, optionally, one
    text span with the tag-stripped page text. Processor order matches the
    reference registry — Astro, Html, JavaScript, Css, Xml, NextJs, Svelte
    (manager.rs:801-807); NextJs' pre-parse query-param strip runs first
    (the manager applies content changes before any find_urls)."""
    ct = (content_type or "").lower()
    spans: list[dict] = []
    if body and ("html" in ct or "javascript" in ct or ct.endswith("/js") or "css" in ct):
        body = nextjs_pre_parse(body)

    def push(kind: str, text: str, media_ref: str = "") -> None:
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    if "html" in ct:
        base = extract_base_href(body)
        if base is not None:
            push("base_href", base)
        if include_text:
            push("text", visible_text(body))
        src = canonicalize(source_url) if source_url else None
        init_d2l = canonicalize(f"https://{initial_host}/")["d2l"] if initial_host else None
        # AstroProcessor registers before HtmlProcessor (manager.rs:801-802)
        links = find_astro_links(body)
        links += find_html_links(
            body,
            flags,
            source_d2l=src["d2l"] if src and src["valid"] else None,
            initial_d2l=init_d2l,
            source_url=source_url,
            initial_host=initial_host,
        )
        # the standalone CssProcessor also runs on Html content in the
        # reference (css_processor.rs relevant_content_types includes Html);
        # its finds enqueue AFTER the HtmlProcessor's — duplicate keys are
        # first-wins-rejected downstream at the queue, so appending is exact
        links += find_css_links(body, flags)
        links += find_nextjs_manifest_links(body, _source_path(source_url))
        for kind, text in links:
            push(kind, text, text)
    elif "css" in ct:
        links = find_css_links(body, flags)
        links += find_nextjs_manifest_links(body, _source_path(source_url))
        for kind, text in links:
            push(kind, text, text)
    elif "javascript" in ct or ct.endswith("/js"):
        links = find_astro_links(body)
        links += find_js_links(body)
        links += find_nextjs_manifest_links(body, _source_path(source_url))
        for kind, text in links:
            push(kind, text, text)
    elif "xml" in ct:
        for kind, text in find_sitemap_locs(body):
            push(kind, text, text)
    elif include_text and ct.startswith("text/"):
        push("text", body)
    return spans


SPANS_TYPE = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
META_TYPE = (
    "struct<title:string,description:string,keywords:string,dom_count:int>"
)


def make_extract_spans_udf(
    initial_host: str = "", flags: ExtractFlags = ExtractFlags(), include_text: bool = False
):
    """Arrow-batched pandas UDF: (url, content_type, body) -> spans array.
    The regex work is pure Python per value inside an Arrow batch — the
    sanctioned slow path (regex alternations with per-match capture-group
    fallbacks are not Catalyst-expressible)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(SPANS_TYPE)
    def extract_udf(url: pd.Series, ctype: pd.Series, body: pd.Series) -> pd.Series:
        out = []
        for u, ct, b in zip(url.tolist(), ctype.tolist(), body.tolist()):
            if b is None:
                out.append([])
                continue
            out.append(
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in extract_spans(
                        b, ct or "", u or "", flags, initial_host, include_text
                    )
                ]
            )
        return pd.Series(out)

    return extract_udf.asNondeterministic()


def make_meta_udf():
    """Arrow-batched pandas UDF: html body -> (title, description, keywords,
    dom_count) struct (F8)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(META_TYPE)
    def meta_udf(body: pd.Series) -> pd.DataFrame:
        rows = []
        for b in body.tolist():
            if b is None:
                rows.append({"title": None, "description": None, "keywords": None, "dom_count": 0})
                continue
            rows.append(extract_meta(b))
        return pd.DataFrame(rows)

    return meta_udf.asNondeterministic()
