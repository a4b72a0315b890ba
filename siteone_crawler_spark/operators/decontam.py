"""Benchmark decontamination — n-gram overlap between train and eval corpora.

Standard pretraining hygiene: any training document that shares word
n-grams with an evaluation/benchmark set is flagged (and usually dropped)
so downstream eval numbers aren't contaminated by memorization. The classic
recipe is 13-gram overlap (GPT-3 appendix C); n is a parameter here.

Spark-first shape: explode both sides to (id, shingle), distinct, inner
join on the shingle, count per training doc. The eval side of a real
pipeline is tiny relative to 100 TB of training text (benchmarks are
megabytes), so Catalyst broadcasts its distinct-shingle set and the train
side never shuffles — the whole operator is a map-side semi-join over the
scan. If the eval set ever exceeds the broadcast threshold, AQE falls back
to a hash join keyed on the shingle, which is the correct distributed
fallback (shingle keys are high-cardinality and evenly spread).

The reference crawler has no decontamination surface; this is part of the
training-data superset the north rule asks for (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siteone_crawler_spark.functions.text import word_shingles


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-doc count of distinct n-gram shingles shared with the
    eval corpus: (id_col, n_overlap), only docs with n_overlap >= 1.

    Shuffle discipline: the join runs FIRST (the small eval shingle set
    broadcasts, so it is map-side over the exploded train scan) and only
    the MATCHED shingles — on a healthy corpus a tiny fraction — reach the
    count-distinct shuffle. Deduping the train side before the join would
    shuffle the entire exploded corpus instead (measured plan: a full
    Exchange on (doc_id, shingle) before the join).
    """
    ev = (
        eval_docs.select(F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )
    # explicit hint: WE know eval is benchmark-sized even when statistics
    # don't (fresh parquet, no ANALYZE) — never let the planner try to
    # build a hash relation from 100 TB of exploded train shingles
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("shingle")).alias("n_overlap"))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_overlap: int = 1,
) -> DataFrame:
    """Training corpus with contaminated documents removed (anti-join on
    the contamination flags) — the shape a pipeline actually materializes."""
    bad = ngram_contamination(train, eval_docs, n, text_col, id_col).filter(
        F.col("n_overlap") >= min_overlap
    )
    return train.join(bad.select(id_col), id_col, "left_anti")
