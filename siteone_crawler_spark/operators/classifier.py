"""Model-based document quality classification (training-data pipeline).

Two halves, mirroring how production corpus-curation pipelines split the
problem (GPT-3/CCNet-style quality filtering — score every crawled page
against a learned "reference corpus vs crawl noise" model, keep the tail):

1. **Scoring kernel** (`hashed_token_features` + `quality_lr_score`):
   logistic-regression inference as PURE Catalyst expressions — tokenize,
   hashing-trick bucket (md5-derived so the DuckDB oracle reproduces it
   bit-for-bit), broadcast-join the weight vector, per-doc dot product,
   sigmoid. No Python in the plan; the weight table is tiny (≤ feature_dim
   rows) and always broadcast. At 100 TB this is a map-side join + one
   hash aggregate per doc — the cheapest possible shape for "score every
   document against a linear model".

2. **Distributed training** (`train_quality_classifier`): pyspark.ml
   RegexTokenizer → HashingTF → LogisticRegression (JVM-side, L-BFGS with
   treeAggregate gradient passes — the standard Spark answer to "fit a
   linear model on 10^9 labeled rows"). The fitted model transforms
   DataFrames entirely JVM-side too; `model_weights_df` exports its
   coefficients as a (bucket, weight) table so the native scoring kernel
   above can serve it without pyspark.ml at inference time.

The two halves use different token->bucket hashes (md5 here, murmur3 in
HashingTF) — each is internally consistent; the export path keeps the
HashingTF bucketing, documented on `model_weights_df`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siteone_crawler_spark.functions.text import norm_tokens

DEFAULT_DIM = 1 << 18


def token_bucket(tok_col, dim: int = DEFAULT_DIM):
    """Hashing-trick bucket from the token's md5 — first 8 hex chars as an
    integer, mod dim. Portable: DuckDB's ('0x'||substr(md5(t),1,8))::BIGINT
    computes the identical value, so the driver oracle can verify scores."""
    return F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10).cast("long") % dim


def hashed_token_features(
    docs: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, tf) sparse term-frequency features, pure Catalyst:
    explode tokens -> bucket -> count. The groupBy shuffles (id, bucket)
    pairs only — no document bodies move."""
    toks = docs.select(id_col, F.explode(norm_tokens(F.col(text_col))).alias("tok"))
    return (
        toks.withColumn("bucket", token_bucket(F.col("tok"), dim))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def deterministic_weights(spark, dim: int = DEFAULT_DIM) -> DataFrame:
    """A fixed, seedless weight vector derived from the bucket id — the
    oracle-checkable stand-in for a trained model in the driver gate (the
    gate needs a weight table both engines can regenerate from nothing).
    Real deployments pass model_weights_df(...) instead."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 2001 - 1000) / 10000.0).alias("weight"),
    )


def quality_lr_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """Logistic scores: sigmoid(bias + sum_b tf_b * w_b) per document.

    Plan shape: features (one shuffle on (id, bucket)) -> broadcast join
    weights -> hash-aggregate per id. Docs with zero tokens score
    sigmoid(bias) via the left join + coalesce."""
    feats = hashed_token_features(docs, text_col, dim, id_col)
    scored = (
        feats.join(F.broadcast(weights), on="bucket", how="inner")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("weight")).alias("dot"))
    )
    return (
        docs.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            (1.0 / (1.0 + F.exp(-(F.coalesce(F.col("dot"), F.lit(0.0)) + bias))))
            .alias("quality_prob"),
        )
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = DEFAULT_DIM,
    reg_param: float = 1e-4,
    max_iter: int = 30,
):
    """Fit tokenize->HashingTF->LogisticRegression on (text, label 0/1).

    Everything runs JVM-side: RegexTokenizer and HashingTF are narrow maps,
    LogisticRegression is MLlib's L-BFGS (each iteration one treeAggregate
    over the partitions — the canonical distributed GLM fit). Returns the
    fitted PipelineModel; `.transform(df)` adds `probability`/`prediction`
    with zero Python UDFs in the plan."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern="[^a-zA-Z0-9]+",
        toLowercase=True,
    )
    tf = HashingTF(inputCol="__toks", outputCol="__feats", numFeatures=dim)
    lr = LogisticRegression(
        featuresCol="__feats", labelCol=label_col, regParam=reg_param,
        maxIter=max_iter, standardization=False,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def model_weights_df(spark, model) -> tuple[DataFrame, float]:
    """Export a fitted pipeline's LR coefficients as a (bucket, weight)
    table + intercept — the serving format for quality_lr_score. NOTE the
    buckets are HashingTF's murmur3 buckets: serve them with the SAME
    tokenizer+HashingTF featurization (model.transform), or re-train on
    hashed_token_features for md5-bucket serving; mixing hash families
    mis-scores silently."""
    lr_model = model.stages[-1]
    coef = lr_model.coefficients
    rows = [(int(i), float(coef[int(i)])) for i in coef.indices] if hasattr(
        coef, "indices"
    ) else [(i, float(v)) for i, v in enumerate(coef) if v != 0.0]
    df = spark.createDataFrame(rows, "bucket long, weight double")
    return df, float(lr_model.intercept)
