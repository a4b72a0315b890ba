"""Language-model quality filtering — smoothed unigram cross-entropy.

Public method: CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks crawled
documents by the perplexity of a language model trained on a trusted corpus
(they use a KenLM 5-gram on Wikipedia) and keeps the low-perplexity head.
This operator is the same filter with the LM reduced to an add-alpha
smoothed unigram model — the estimator a SQL oracle can re-derive exactly;
the token->logprob join below is model-order-agnostic, so swapping in
higher-order gram tables changes only the `unigram_logprobs` producer.

Scale shape (mirrors operators/dsir.py): the reference corpus collapses to
a (token, logp) table — vocabulary-sized, BROADCAST into the scoring join —
so scoring is one pass over the corpus scan plus one map-side-combined
per-doc aggregate. The two reference totals (N tokens, V vocab) are scalar
aggregate results collected on the driver, like dsir's gram totals.

The reference crawler has no LM surface; this is part of the training-data
superset the north rule asks for.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_tokens


def unigram_logprobs(
    ref: DataFrame, text_col: str = "text", alpha: float = 1.0
) -> tuple[DataFrame, float]:
    """((token, logp) table, unk_logp) from the reference corpus.

    p(tok) = (count + alpha) / (N + alpha * (V + 1)) — the +1 reserves one
    smoothing slot for unseen tokens, whose shared logprob is returned as
    the scalar unk_logp."""
    # lazy barrier: the vocabulary counts feed BOTH the scalar totals
    # (.first() below) and the logprob table — without it the reference
    # corpus tokenize+explode+aggregate ran twice. Vocabulary-sized rows
    # only; computed inside the first consuming action, fresh per build.
    counts = (
        ref.select(F.explode(norm_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("__c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n, v = (tot["n"] or 0), tot["v"]
    denom = n + alpha * (v + 1)
    lp = counts.select(
        "tok", F.log((F.col("__c") + alpha) / denom).alias("logp")
    )
    return lp, math.log(alpha / denom)


def lm_cross_entropy(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """(id_col, n_tokens, xent) for EVERY doc: xent = mean negative logprob
    of the doc's tokens under the reference unigram LM (perplexity =
    exp(xent) — monotone, so filtering thresholds apply to either). Unseen
    tokens score the shared UNK logprob; a zero-token doc scores 0.0.
    xent is rounded to 6 dp (per-doc accumulation order differs between
    engines); keep = xent below a corpus-tuned cutoff, composable with
    operators/sampling.hash_sample for head-and-sample selection."""
    lp, unk = unigram_logprobs(ref, text_col, alpha)
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"),
    )
    per_doc = (
        toks.join(F.broadcast(lp), "tok", "left")
        .select("__id", F.coalesce(F.col("logp"), F.lit(unk)).alias("__l"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (-F.avg("__l")).alias("__x"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias("n_tokens"),
            F.round(F.coalesce(F.col("__x"), F.lit(0.0)), 6).alias("xent"),
        )
    )
