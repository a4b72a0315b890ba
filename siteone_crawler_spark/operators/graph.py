"""Link-graph analytics over the crawl graph — degree stats and PageRank.

The engine's visited/frontier tables already encode the link graph
(source_uq_id -> uq_id: who discovered whom); corpus-curation pipelines
weight documents by link authority as a quality prior (public method:
Page, Brin, Motwani, Winograd — "The PageRank Citation Ranking", Stanford
1999; Common Crawl publishes harmonic-centrality/PageRank host rankings
computed the same way). This module implements the power iteration as
pure DataFrame ops:

  - one shuffle per iteration: edges ⋈ ranks on src (a broadcast-sized
    rank table stays a broadcast join; at 10^10 nodes both sides shuffle
    on the node key and AQE keeps the exchange reused), then a hash
    aggregate on dst — map-side partial sums, no windows, no Python;
  - dangling mass (nodes with no out-links — at web scale, most leaf
    assets) is one tiny scalar aggregate per iteration, redistributed
    uniformly, keeping sum(rank) == 1 exactly;
  - `localCheckpoint` every few iterations cuts the lineage so the plan
    does not grow linearly with iteration count (same contract as
    operators/components.py; a cluster run points this at the reliable
    checkpoint dir).

Reference parity note: the reference records per-URL source attribution
(visited_url.rs) but computes no graph metrics — this family is part of
the beyond-reference training-data surface, like the dedup clustering in
operators/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_deg, in_deg) for every node in the (deduplicated) graph."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out_d = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) after `iterations` power steps; sum(rank) == 1.

    Multi-edges count once (the edge set is deduplicated first — the crawl
    graph records one discovery edge per (source, target) pair anyway).
    The two driver-side scalars (node count once, dangling mass per
    iteration) are single-value reduces, not data collects.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # the loop re-reads it every iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(eager=True)
    base = (1.0 - damping) / n

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        # dangling mass stays a LAZY one-row DataFrame attached by cross
        # join (broadcast of a single row): collecting it with .first()
        # per iteration forced one extra driver action per power step AND
        # recomputed the un-checkpointed rank chain each time. The
        # arithmetic is unchanged — sum over the same anti-joined rank
        # rows, divided by n — so ranks match the collect-based form to
        # the same float-accumulation noise the 6-dp rounding absorbs.
        dang = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.col("__dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # LAZY per-iteration cut (checkpoint_every kept for API compat; a
        # lazy cut is strictly cheaper than the old eager-every-4): the
        # next iteration consumes `ranks` TWICE (dangling + contribs), so
        # without a shared materialization point the rank chain would be
        # recomputed per consumer, doubling per step. One lazy checkpoint
        # per step = each iteration computed exactly once, inside the
        # caller's action, with the lineage cut the loop always needed —
        # and zero driver actions inside the loop (the old form paid an
        # eager materialization every 4 steps plus a .first() every step).
        ranks = ranks.localCheckpoint(eager=False)
    return ranks
