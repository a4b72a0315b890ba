"""TF-IDF keyword extraction — top-k characteristic terms per document.

The classic corpus-analysis primitive (public method: Sparck Jones 1972;
smoothed idf variant used by scikit-learn's TfidfTransformer docs):
score(d, t) = tf(d, t) * (ln((N + 1) / (df(t) + 1)) + 1), top-k per doc.

Scale shape:
  1. (doc, term) term-frequency aggregate — THE corpus shuffle, map-side
     combined (Zipf terms collapse hard in the partial aggregate);
  2. document frequencies — vocabulary-sized aggregate over stage 1's
     output, BROADCAST back for the score join (no second corpus shuffle);
  3. per-doc top-k — row_number window partitioned by doc_id, which
     Spark executes with WindowGroupLimit: each map task keeps only k rows
     per doc before the exchange (same physical shape plan-asserted for
     operators/sampling.stratified_sample).

Ranking compares the 6-dp-ROUNDED score (ties broken by term asc) so the
order is reproducible across engines — raw tf*idf doubles differ by ulps
between libm implementations, and a rank flip at 1e-15 would be noise
presented as signal.

The reference's closest surface is word frequency in content stats
(/root/reference/src/analysis); per-doc tf-idf is part of the
training-data/corpus-analysis superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import norm_tokens


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, score, rank) — the k highest-tf-idf terms per doc,
    rank 1..k by (rounded score desc, term asc). Docs with no tokens emit
    nothing. N = total doc count (including empty docs — the corpus size)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    n_docs = docs.count()  # scalar corpus size, like dsir's gram totals
    # lazy barrier: tf feeds BOTH the document-frequency aggregate and the
    # score join — without it the corpus tokenize+explode+aggregate ran
    # twice. The checkpoint holds the post-aggregate (doc, term, tf) rows
    # (the corpus vocabulary slice the joins shuffle anyway), computed
    # inside the consuming action, fresh per build.
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(norm_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log((n_docs + 1.0) / (F.col("__df") + 1.0)) + 1.0
    scored = tf.join(F.broadcast(df.select("term", idf.alias("__idf"))), "term").select(
        "doc_id",
        "term",
        F.round(F.col("__tf") * F.col("__idf"), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )
