"""Mean pooling + Gumbel-top-k vectors and plan shapes.
Value parity vs DuckDB oracles is certified by tests/test_entry_oracle.py."""

from pyspark.sql import functions as F

from siteone_crawler_spark.operators.pooling import mean_pool
from siteone_crawler_spark.operators.sampling import gumbel_topk_sample


def test_mean_pool_hand_vector(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (1, [3.0, 4.0]),
            (2, [10.0, 20.0]),
            (2, None),          # ignored, not counted
            (3, []),            # empty group after filtering: absent
        ],
        "doc_id long, embedding array<float>",
    )
    out = {r["doc_id"]: r for r in mean_pool(df).collect()}
    assert out[1]["pooled"] == [2.0, 3.0] and out[1]["n_vectors"] == 2
    assert out[2]["pooled"] == [10.0, 20.0] and out[2]["n_vectors"] == 1
    assert 3 not in out


def test_mean_pool_plan_never_collects_vectors(spark):
    df = spark.createDataFrame(
        [(i % 4, [float(i), float(i + 1)]) for i in range(40)],
        "doc_id long, embedding array<float>",
    )
    plan = mean_pool(df)._jdf.queryExecution().executedPlan().toString()
    # the refold collects dim-sized structs AFTER the per-dim aggregate;
    # no collect_list may appear below the first aggregate of raw vectors
    assert "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_gumbel_topk_is_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(200)], "doc_id long, w double"
    )
    a = sorted(r["doc_id"] for r in gumbel_topk_sample(df, "doc_id", "w", 20).collect())
    b = sorted(r["doc_id"] for r in gumbel_topk_sample(df, "doc_id", "w", 20).collect())
    assert a == b and len(a) == 20
    # a different salt draws a different sample
    c = sorted(
        r["doc_id"]
        for r in gumbel_topk_sample(df, "doc_id", "w", 20, salt="x").collect()
    )
    assert c != a


def test_gumbel_topk_respects_weights(spark):
    # two blocks with a huge log-weight gap: the heavy block must dominate
    df = spark.createDataFrame(
        [(i, 50.0 if i < 30 else 0.0) for i in range(300)], "doc_id long, w double"
    )
    picked = [r["doc_id"] for r in gumbel_topk_sample(df, "doc_id", "w", 25).collect()]
    assert all(i < 30 for i in picked)  # exp(50) gap: heavies always win


def test_gumbel_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "doc_id long, w double"
    )
    plan = (
        gumbel_topk_sample(df, "doc_id", "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # partial per-partition top-k
    assert "Exchange rangepartitioning" not in plan  # never a global sort
