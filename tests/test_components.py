"""connected_components / dedup_clusters vs a local union-find oracle."""

import random

import pytest
from pyspark.sql import functions as F

from siteone_crawler_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    roots = {}
    for n in list(parent):
        r = find(n)
        roots.setdefault(r, []).append(n)
    out = {}
    for r, members in roots.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _uf_oracle(edges)


def test_chain_merges_transitively(spark):
    # (1-2)+(2-3)+(3-4): one cluster labeled 1 — the pairwise-dedup gap
    # this operator exists to close
    _run(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])


def test_duplicate_and_reversed_edges(spark):
    _run(spark, [(2, 1), (1, 2), (2, 3), (3, 3), (5, 4)])


def test_hub_and_long_path(spark):
    edges = [(0, i) for i in range(1, 40)]  # star hub
    edges += [(100 + i, 101 + i) for i in range(30)]  # 31-node path
    _run(spark, edges)


@pytest.mark.parametrize("seed", [7, 23])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_dedup_clusters_total_coverage_and_keeper(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 10  # every doc labeled, singletons included
    assert rows[1]["component"] == 1 and rows[2]["component"] == 1
    assert rows[5]["component"] == 1 and rows[8]["component"] == 7
    assert rows[0]["component"] == 0 and rows[0]["is_keeper"]
    keepers = {d for d, r in rows.items() if r["is_keeper"]}
    assert keepers == {0, 1, 3, 4, 6, 7, 9}


def test_no_collect_list_in_plan(spark):
    # the per-node reduction must be min/first aggregates — a collect_list
    # materializes a 10^8-degree hub's neighborhood in one row
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    from siteone_crawler_spark.operators.components import (
        _large_star,
        _small_star,
    )

    for stage in (_large_star, _small_star):
        plan = stage(
            df.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "collect_list" not in plan
        assert "collect_set" not in plan
