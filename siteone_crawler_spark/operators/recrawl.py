"""Recrawl-log analytics: per-URL generation summary over the visited log.

CrawlEngine.invalidate (engine.py) turns `visited` into a fetch LOG — a
recrawled URL appears once per crawl generation, same seq (its stable
first-enqueue identity), higher wave. This operator collapses the log into
the current-state view plus change detection, the thing an incremental
corpus pipeline diffs between generations to decide what to re-extract:

    crawl_diff(visited) -> (url_key, url, seq, n_fetches,
                            first_wave, last_wave,
                            last_status, last_size, changed)

`changed` = the latest fetch differs from the previous one in status or
size (content-length is the cheap change proxy; a content-hash column
slots into the same comparison).

Plan shape: ONE hash aggregate on url_key — min/max/min_by plus a sorted
collect_list of (wave, status, size) structs sliced to the top 2. The
collect is bounded by the number of CRAWL GENERATIONS a URL has been
through (each generation fetches a URL at most once), not by corpus size,
so unlike an unbounded doc_ids list this never builds a mega-row. No
window, no per-key sort beyond the tiny per-group array, map-side partial
aggregation throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_diff(visited: DataFrame) -> DataFrame:
    """Collapse a (possibly multi-generation) visited log to current state
    + change flags. Single-generation URLs report changed=false."""
    gen = F.struct("wave", "status_code", "size")
    agg = visited.groupBy("url_key").agg(
        F.min_by(F.struct("url", "seq"), "wave").alias("__id"),
        F.count(F.lit(1)).alias("n_fetches"),
        F.min("wave").alias("first_wave"),
        F.max("wave").alias("last_wave"),
        F.slice(F.sort_array(F.collect_list(gen), False), 1, 2).alias("__top2"),
    )
    last = F.col("__top2")[0]
    prev = F.col("__top2")[1]
    return agg.select(
        "url_key",
        F.col("__id.url").alias("url"),
        F.col("__id.seq").alias("seq"),
        "n_fetches",
        "first_wave",
        "last_wave",
        last["status_code"].alias("last_status"),
        last["size"].alias("last_size"),
        F.when(
            F.col("n_fetches") > 1,
            (last["status_code"] != prev["status_code"])
            | (last["size"] != prev["size"]),
        )
        .otherwise(F.lit(False))
        .alias("changed"),
    )
