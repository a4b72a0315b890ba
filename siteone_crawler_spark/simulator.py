"""Reference-faithful single-threaded BFS crawl simulator (golden fixtures).

Mirrors the reference's workers=1 semantics — FIFO dequeue
(/root/reference/src/engine/crawler.rs:372-391), the enqueue pipeline
(crawler.rs:1020-1306), the basename circuit breaker (crawler.rs:506-525,
1440-1451) and first-wins dedup everywhere — using the SAME scalar kernels
(functions/urls.py, functions/robots.py) the Spark engine uses, so parity
tests compare two independent *control flows* over one shared kernel.

Reference crawl order is deterministic only at workers=1; fixtures pin that
(BASELINE.md note). Output fixture schemas follow FIXTURES.md §5.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import (
    SKIP_NOT_ALLOWED_HOST,
    SKIP_ROBOTS_TXT,
    SOURCE_REDIRECT,
    ASSET_KINDS,
    NON_LINK_KINDS,
    SPAN_KIND_TO_SOURCE,
    CrawlConfig,
    span_kind_allowed,
)
from .functions.robots import compile_rules_map, is_allowed
from .functions.urls import (
    BREAKER_EXEMPT_BASENAMES,
    HTMLISH_EXTENSIONS,
    canonicalize,
    resolve_candidate,
)
import re


@dataclass
class SimResult:
    # (seq, url, uq_id, source_uq_id, source_attr, wave, status_code, size, request_time_ms)
    crawl_order: list[tuple] = field(default_factory=list)
    seen: dict[str, str] = field(default_factory=dict)  # url_key -> url
    skipped: list[tuple] = field(default_factory=list)  # (url, reason, source_uq_id, source_attr)
    waves: int = 0


def simulate(site, config: CrawlConfig) -> SimResult:
    docs = site.docs_map()
    meta = site.meta_map()
    rules_map = compile_rules_map(site.robots)
    allowed_res = config.allowed_domain_regexes()
    include_res = [re.compile(p) for p in config.include_regex]
    ignore_res = [re.compile(p) for p in config.ignore_regex]

    res = SimResult()
    first = canonicalize(site.seeds[0][0])
    initial_host, initial_scheme = first["host"], first["scheme"]

    queue: deque = deque()  # entries: (url, url_key, uq_id, source_uq_id, source_attr, wave)
    skipped_keys: set[str] = set()
    basename_fails: dict[str, int] = {}

    def host_allowed(host: str) -> bool:
        if host == initial_host:
            return True
        bare, ib = host.removeprefix("www."), initial_host.removeprefix("www.")
        if bare == ib:
            return True
        return any(rx.match(host) for rx in allowed_res)

    def try_enqueue(cand: dict, source_uq_id: str, source_attr: int, wave: int) -> None:
        """The enqueue pipeline, reference order (SURVEY §2.2 P1-P11)."""
        if not cand["valid"]:
            return  # P1/P2: dropped silently
        url, key = cand["canon_url"], cand["url_key"]
        # P3 host allowlist -> skipped(NotAllowedHost), first-wins
        if not host_allowed(cand["host"]):
            if key not in skipped_keys and key not in res.seen:
                skipped_keys.add(key)
                res.skipped.append((url, SKIP_NOT_ALLOWED_HOST, source_uq_id, source_attr))
            return
        # P4 basename circuit breaker (enqueue side trips at >=, crawler.rs:1086;
        # root/empty basenames are exempt — get_base_name returns None)
        bn = cand["basename"]
        if bn is not None and basename_fails.get(bn, 0) >= config.max_non200_per_basename:
            return
        # P5 robots -> skipped(RobotsTxt), first-wins
        if not config.ignore_robots_txt and not is_allowed(
            rules_map.get(cand["host"]), cand["path"], cand["query"]
        ):
            if key not in skipped_keys and key not in res.seen:
                skipped_keys.add(key)
                res.skipped.append((url, SKIP_ROBOTS_TXT, source_uq_id, source_attr))
            return
        # P9 include/ignore regex (silent)
        if include_res and not any(rx.search(url) for rx in include_res):
            return
        if any(rx.search(url) for rx in ignore_res):
            return
        # P10 suitability
        if len(url) > config.max_url_length:
            return
        if not config.crawl_assets and cand["ext"] not in HTMLISH_EXTENSIONS:
            return
        if key in res.seen:
            return
        if len(res.seen) >= config.max_visited_urls:  # global enqueue cap
            return
        if len(queue) >= config.max_queue_length:  # P11 queue cap
            return
        res.seen[key] = url
        queue.append((url, key, cand["uq_id"], source_uq_id, source_attr, wave))

    # seed
    for surl, sattr in site.seeds:
        c = canonicalize(surl, initial_host, initial_scheme,
                         config.remove_query_params, list(config.keep_query_params))
        try_enqueue(c, "", sattr, 0)

    seq = 0
    while queue:
        url, key, uq_id, src_uq, src_attr, wave = queue.popleft()
        res.waves = max(res.waves, wave)
        m = meta.get(url)
        status = m["status_code"] if m else -1
        size = m["size"] if m else 0
        rt = m["request_time_ms"] if m else 0.0

        # process-time basename circuit breaker pre-check -> status -6, no
        # fetch. Trips STRICTLY ABOVE the max (crawler.rs:507-509 uses
        # `count > max`, unlike the enqueue side's >=).
        bn = canonicalize(url)["basename"]
        if bn is not None and basename_fails.get(bn, 0) > config.max_non200_per_basename:
            res.crawl_order.append((seq, url, uq_id, src_uq, src_attr, wave, -6, 0, 0.0))
            seq += 1
            continue

        res.crawl_order.append((seq, url, uq_id, src_uq, src_attr, wave, status, size, rt))
        # non-200 bookkeeping (crawler.rs:1440-1451): root and index.html/
        # index.htm/index basenames are never counted
        if status != 200 and bn is not None and bn not in BREAKER_EXEMPT_BASENAMES:
            basename_fails[bn] = basename_fails.get(bn, 0) + 1

        # redirect enqueue (301-308 + Location), source_attr=Redirect
        if m and 301 <= status <= 308 and m.get("redirect_location"):
            cand = resolve_candidate(
                url, m["redirect_location"], initial_host, initial_scheme,
                config.remove_query_params, list(config.keep_query_params),
            )
            try_enqueue(cand, uq_id, SOURCE_REDIRECT, wave + 1)
            seq += 1
            continue

        if status == 200:
            spans = sorted(docs.get(url, []), key=lambda s: s["offset"])
            base = url
            for s in spans:
                if s["kind"] == "base_href":
                    base = s["text"]
                    break
            page_host = canonicalize(url)["host"]
            foreign = (
                config.single_foreign_page
                and ".".join(page_host.split(".")[-2:])
                != ".".join(initial_host.split(".")[-2:])
            )
            for s in spans:
                kind = s["kind"]
                if kind in NON_LINK_KINDS:
                    continue
                if not config.crawl_assets and kind in ASSET_KINDS:
                    continue
                # P14 per-asset-class toggles
                if not span_kind_allowed(config, kind, s["text"]):
                    continue
                # P13: single-page suppresses <a href> extraction only;
                # single-foreign-page suppresses it on foreign-d2l pages
                # (html_processor.rs:180-182, 781-783)
                if (config.single_page or foreign) and kind == "a_href":
                    continue
                cand = resolve_candidate(
                    base, s["text"], initial_host, initial_scheme,
                    config.remove_query_params, list(config.keep_query_params),
                )
                # P12: a_href depth filter (extraction-side silent drop)
                if (
                    config.max_depth > 0
                    and kind == "a_href"
                    and cand["valid"]
                    and cand["depth"] > config.max_depth
                ):
                    continue
                try_enqueue(cand, uq_id, SPAN_KIND_TO_SOURCE.get(kind, 10), wave + 1)
        seq += 1

    return res
