"""Link-graph analytics (operators/graph.py) vs a numpy power-iteration
oracle, plus invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from siteone_crawler_spark.operators.graph import degree_stats, pagerank


def _np_pagerank(edges, damping, iterations):
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in e:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[out_deg == 0].sum()
        nxt = np.full(n, (1.0 - damping) / n) + damping * dangling / n
        for a, b in e:
            nxt[idx[b]] += damping * r[idx[a]] / out_deg[idx[a]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize("seed,iters", [(5, 3), (11, 8)])
def test_pagerank_matches_numpy_oracle(spark, seed, iters):
    rng = np.random.RandomState(seed)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.randint(0, 60, 250), rng.randint(0, 60, 250))
        if a != b
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=iters, checkpoint_every=3).collect()
    }
    exp = _np_pagerank(edges, 0.85, iters)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, (v, got[v], exp[v])
    # probability mass conserved exactly (dangling redistribution)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_authority_ordering(spark):
    # a hub pointed at by everyone must outrank the spokes; enough
    # iterations to converge (the 0<->1 cycle oscillates with lag early)
    edges = [(i, 0) for i in range(1, 20)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=30).collect()}
    assert got[0] == max(got.values())
    assert got[1] > got[5]  # endorsed by the hub beats a plain spoke
    assert got[0] > got[1] > 10 * got[5]


def test_degree_stats(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (1, 2)], "src long, dst long"
    )
    rows = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(df).collect()}
    # duplicate (1,2) counts once
    assert rows == {1: (2, 1), 2: (1, 1), 3: (1, 2)}


def test_pagerank_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = (
        pagerank(df, iterations=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
