"""Property-based tests (hypothesis) for the pure-Python kernels — the
invariants that must hold on ANY input at 10^10-URL scale, not just the
fixture vectors: canonicalization idempotence/stability, hash/key
determinism, offline path safety (no escape from the export root), robots
matcher well-definedness, extraction crash-freedom + span-offset contiguity.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from siteone_crawler_spark.functions.robots import path_matches
from siteone_crawler_spark.functions.urls import absolutize, base_name, canonicalize, normalize_href
from siteone_crawler_spark.operators.extract import extract_spans
from siteone_crawler_spark.sources.offline import sanitize_file_path

# url-ish text: printable ascii without spaces, plus url punctuation
URLCHARS = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=80
)
PATHS = st.text(
    alphabet=st.sampled_from(list("abcdefgh012/._-%*$?=&")), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(host=st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
       path=PATHS)
def test_canonicalize_idempotent(host, path):
    """canon(canon(u).url).url == canon(u).url — the canonical form is a
    fixed point, so re-processing checkpointed URLs can never drift."""
    u = f"https://{host}/{path}"
    c1 = canonicalize(u)
    if not c1["valid"]:
        return
    c2 = canonicalize(c1["canon_url"])
    assert c2["valid"]
    assert c2["canon_url"] == c1["canon_url"]
    assert c2["url_key"] == c1["url_key"]
    assert c2["uq_id"] == c1["uq_id"]


@settings(max_examples=300, deadline=None)
@given(url=URLCHARS)
def test_canonicalize_total_and_deterministic(url):
    """Never raises on arbitrary input; equal input -> equal output (the
    dedup key contract)."""
    a = canonicalize(url)
    b = canonicalize(url)
    assert a == b
    if a["valid"]:
        assert a["canon_url"] and len(a["uq_id"]) == 8 and len(a["url_key"]) == 32


@settings(max_examples=200, deadline=None)
@given(base_path=PATHS, href=URLCHARS)
def test_absolutize_total(base_path, href):
    """Absolutize never raises and produces a string on any href."""
    out = absolutize(f"https://ex.test/{base_path}", normalize_href(href))
    assert isinstance(out, str)


@settings(max_examples=300, deadline=None)
@given(path=PATHS, query=st.text(alphabet=st.sampled_from(list("ab/%2F=&")), max_size=20))
def test_base_name_total(path, query):
    """base_name is total; root/empty -> None; never contains a slash
    unless it came from the query suffix (parsed_url.rs:465-481)."""
    bn = base_name("/" + path, query)
    if bn is not None and "/" in bn:
        assert "/" in query or "%2F" in query or "%2f" in query


@settings(max_examples=300, deadline=None)
@given(fp=st.text(alphabet=st.sampled_from(list("abcd/.#?_%-")), max_size=60))
def test_export_target_never_escapes(fp):
    """The offline exporter may never write outside the export root,
    whatever relative path the converter produced (encoded dot-segments
    unquote to '..'): safe_export_target returns a path under the root or
    refuses."""
    import os

    from siteone_crawler_spark.sources.offline import safe_export_target

    rel = sanitize_file_path(fp)  # total: must not raise
    assert isinstance(rel, str)
    target = safe_export_target("/tmp/export-root-prop", fp)
    if target is not None:
        assert target.startswith(os.path.realpath("/tmp/export-root-prop") + os.sep)
        assert ".." not in target.split("/")


@settings(max_examples=300, deadline=None)
@given(pattern=st.text(alphabet=st.sampled_from(list("ab/*$.")), max_size=20),
       path=st.text(alphabet=st.sampled_from(list("ab/.")), max_size=30))
def test_robots_matcher_total(pattern, path):
    """The wildcard matcher is total and deterministic on any pattern; a
    pattern always matches itself with wildcards stripped."""
    r1 = path_matches(pattern, "/" + path)
    r2 = path_matches(pattern, "/" + path)
    assert r1 == r2 and isinstance(r1, bool)
    literal = pattern.replace("*", "").replace("$", "")
    if literal.startswith("/"):
        assert path_matches(literal, literal)


@settings(max_examples=150, deadline=None)
@given(html=st.text(max_size=300),
       ct=st.sampled_from(["text/html", "text/css", "application/javascript", "text/xml", "application/octet-stream"]))
def test_extract_spans_total_and_contiguous(html, ct):
    """Extraction never raises on arbitrary bytes-as-text and emits
    contiguous 0-based span offsets (the spans-schema contract)."""
    spans = extract_spans(html, ct, "https://ex.test/p")
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    for s in spans:
        assert isinstance(s["kind"], str) and isinstance(s["text"], str)
