"""Deterministic sampling + repetition operators (operators/sampling.py,
functions/text.ngram_repetition).

The value-level Spark-vs-DuckDB oracle compare for these runs in
tests/test_entry_oracle.py (hash_sample / stratified_sample /
repetition_ratio); here we pin the operator-level contracts: determinism
under re-partitioning, rate accuracy, per-stratum caps, and the
WindowGroupLimit physical rewrite that makes the stratified cap viable at
scale."""

from pyspark.sql import functions as F

from siteone_crawler_spark.functions.text import ngram_repetition
from siteone_crawler_spark.operators.sampling import (
    hash_sample,
    sample_threshold_hex,
    stratified_sample,
)


def _keys_df(spark, n=20000, parts=7):
    return spark.range(n).repartition(parts).withColumn(
        "k", F.concat(F.lit("key-"), F.col("id"))
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _keys_df(spark)
    got = hash_sample(df, "k", rate=0.25, salt="a")
    n = got.count()
    # md5 is uniform: 20000 draws at p=0.25 -> 5000 +- ~5 sigma (306)
    assert abs(n - 5000) < 320, n
    # content-addressed: identical membership regardless of partitioning
    ids1 = {r["id"] for r in got.collect()}
    ids2 = {
        r["id"]
        for r in hash_sample(_keys_df(spark, parts=3), "k", 0.25, "a").collect()
    }
    assert ids1 == ids2
    # a different salt draws an independent sample (not the same rows)
    ids3 = {r["id"] for r in hash_sample(df, "k", 0.25, "b").collect()}
    assert ids3 != ids1
    overlap = len(ids1 & ids3) / len(ids1)
    assert abs(overlap - 0.25) < 0.05  # independent draws: P(both) = p


def test_hash_sample_edge_rates(spark):
    df = _keys_df(spark, n=500)
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 500
    assert sample_threshold_hex(0.2) == "3333"
    assert sample_threshold_hex(1.0) == "g"  # sorts above any 4-char hex


def test_stratified_sample_cap_and_determinism(spark):
    # skewed strata: stratum s0 has 900 rows, s1 has 90, s2 has 9
    df = spark.range(999).withColumn(
        "s",
        F.when(F.col("id") < 900, "s0").when(F.col("id") < 990, "s1").otherwise("s2"),
    )
    got = stratified_sample(df, "s", "id", 50)
    by = {r["s"]: r["n"] for r in got.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by == {"s0": 50, "s1": 50, "s2": 9}
    # rn is a 1..N dense prefix per stratum and the pick is deterministic
    rows1 = sorted((r["s"], r["id"], r["rn"]) for r in got.collect())
    rows2 = sorted(
        (r["s"], r["id"], r["rn"])
        for r in stratified_sample(df.repartition(13), "s", "id", 50).collect()
    )
    assert rows1 == rows2
    s2 = sorted(rn for s, _, rn in rows1 if s == "s2")
    assert s2 == list(range(1, 10))


def test_stratified_sample_plan_has_window_group_limit(spark):
    """rank<=N must compile to WindowGroupLimit (partial per-partition top-N
    BEFORE the shuffle) — without it the stratified cap ships every row of
    every stratum through the exchange, the thing that dies at 10^11 rows."""
    df = spark.range(1000).withColumn("s", (F.col("id") % 7).cast("string"))
    plan = stratified_sample(df, "s", "id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_ngram_repetition_values(spark):
    rows = [
        (1, "a b c a b c a b"),  # 6 shingles, 3 distinct -> 0.5
        (2, "x y"),  # < 3 tokens -> 0.0
        (3, "p q r s"),  # 2 shingles, both distinct -> 0.0
        (4, "z z z z z"),  # 3 shingles, 1 distinct -> 2/3
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", ngram_repetition(F.col("text"), 3).alias("f")).collect()
    }
    assert got[1] == 0.5
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert abs(got[4] - 2 / 3) < 1e-12


def _strata_df(spark):
    # skewed strata: big=8000 rows, mid=1600, small=80
    from siteone_crawler_spark.operators.sampling import temperature_sample  # noqa: F401

    df = spark.range(9680).withColumn(
        "src",
        F.when(F.col("id") < 8000, "big")
        .when(F.col("id") < 9600, "mid")
        .otherwise("small"),
    )
    return df.repartition(5)


def test_temperature_sample_flattens_mix(spark):
    from siteone_crawler_spark.operators.sampling import temperature_sample

    df = _strata_df(spark)
    out = temperature_sample(df, strata="src", key="id", alpha=0.5,
                             target_fraction=0.25, salt="t")
    got = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    n = {"big": 8000, "mid": 1600, "small": 80}
    keep_rate = {s: got.get(s, 0) / n[s] for s in n}
    # alpha<1: smaller strata keep a LARGER fraction
    assert keep_rate["small"] > keep_rate["mid"] > keep_rate["big"]
    # overall close to the 25% target (binomial noise at these sizes)
    total = sum(got.values())
    assert abs(total / 9680 - 0.25) < 0.05, total
    # expected rates r_s = 0.25 * N/W * n^-0.5: check each stratum is near
    import math
    W = sum(math.sqrt(v) for v in n.values())
    for s, v in n.items():
        exp_rate = min(0.25 * 9680 / W / math.sqrt(v), 1.0)
        assert abs(keep_rate[s] - exp_rate) < 0.12, (s, keep_rate[s], exp_rate)


def test_temperature_sample_deterministic_and_capped(spark):
    from siteone_crawler_spark.operators.sampling import temperature_sample

    df = _strata_df(spark)
    a = set(r["id"] for r in temperature_sample(df, "src", "id", 0.5, 0.25, "t").collect())
    b = set(r["id"] for r in temperature_sample(
        df.repartition(13), "src", "id", 0.5, 0.25, "t").collect())
    assert a == b  # content-addressed: partitioning-independent
    # alpha=0 with a generous target: the tiny stratum saturates (rate
    # capped at 1 -> every small row kept)
    out = temperature_sample(df, "src", "id", alpha=0.0,
                             target_fraction=0.5, salt="t")
    kept_small = out.filter(F.col("src") == "small").count()
    assert kept_small == 80


def test_pack_sequences_layout(spark):
    """Concat-then-chunk invariants: per-shard offsets are contiguous
    (start_tok = sum of earlier docs' tokens), pack_id = floor(start/L),
    and the layout is partitioning-independent."""
    from siteone_crawler_spark.operators.sampling import pack_sequences

    df = spark.range(500).withColumn(
        "text",
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), (F.pmod(F.col("id"), 7) + 1).cast("int"))),
    ).withColumnRenamed("id", "doc_id")
    out = pack_sequences(df, seq_len=16, n_shards=8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 500
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["start_tok"])
        cum = 0
        for r in rows:
            assert r["start_tok"] == cum, (shard, r)
            assert r["pack_id"] == cum // 16
            assert 1 <= r["n_tokens"] <= 7
            cum += r["n_tokens"]
    # deterministic under repartitioning
    out2 = pack_sequences(df.repartition(11), seq_len=16, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pack_sequences_plan_no_global_window(spark):
    """The running sum must be partitioned by shard — a single-partition
    window over the corpus would serialize packing at scale."""
    from siteone_crawler_spark.operators.sampling import pack_sequences

    df = spark.range(100).withColumn("text", F.lit("a b c")).withColumnRenamed("id", "doc_id")
    plan = pack_sequences(df, seq_len=16, n_shards=8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re
    m = re.search(r"Window \[[^\]]*\], \[shard", plan)
    assert m, plan[:1500]


def test_split_assign_disjoint_exhaustive_stable(spark):
    from siteone_crawler_spark.operators.sampling import split_assign

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = split_assign(
        df, key="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="t1",
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 2000  # exhaustive, one label per row
    import collections

    counts = collections.Counter(rows.values())
    assert set(counts) == {"train", "val", "test"}
    # fractions approximate the request (binomial slack)
    assert 0.74 < counts["train"] / 2000 < 0.86
    assert 0.06 < counts["val"] / 2000 < 0.14
    assert 0.06 < counts["test"] / 2000 < 0.14
    # content-addressed: rerun identical; new salt reshuffles
    rows2 = {r["doc_id"]: r["split"] for r in split_assign(
        df, key="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="t1",
    ).collect()}
    assert rows == rows2
    rows3 = {r["doc_id"]: r["split"] for r in split_assign(
        df, key="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="t2",
    ).collect()}
    assert rows != rows3


def test_split_assign_rejects_over_unity(spark):
    import pytest

    from siteone_crawler_spark.operators.sampling import split_assign

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        split_assign(df, key="doc_id", splits={"a": 0.9, "b": 0.2})
