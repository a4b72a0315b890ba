"""Distributed BPE merge-pair statistics — the tokenizer-training inner loop.

Byte-pair-encoding vocabulary induction (public method: Sennrich et al.
2016, arXiv:1508.07909) repeatedly merges the most frequent adjacent symbol
pair. At corpus scale the expensive step is counting those pairs, and the
classic optimization is to count over the WORD VOCABULARY weighted by word
frequency, never over raw text: 100 TB of text collapses to a few million
distinct words after the first aggregate, so every later pass is
vocabulary-sized.

Spark shape: two hash aggregates, both map-side combined —
  1. word counts   : explode(norm_tokens) -> groupBy(word)   [corpus-sized
     scan, Zipf keys combine well map-side; the ONLY pass over the corpus]
  2. pair counts   : per-vocab-word adjacent symbol pairs (native
     sequence+transform+explode, occurrences kept — "aaa" counts "aa"
     twice) weighted by word count -> groupBy(pair)           [vocab-sized]
No UDF, no join, whole-stage codegen end to end. Driver-looped merge
iterations (real BPE training) re-run only step 2 on the re-segmented
vocabulary; step 1 never repeats.

The reference has no tokenizer surface (its closest op is word counting in
/root/reference/src/analysis — content stats); this is part of the
training-data superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) over the normalized-token stream — the one corpus pass."""
    return (
        docs.select(F.explode(norm_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def bpe_pair_stats(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(lhs, rhs, pair_count) for every adjacent character pair whose
    corpus-weighted occurrence count reaches `min_count` — the candidate
    table for one BPE merge decision (iteration 1: symbols = characters).

    Occurrence semantics match the published algorithm: pairs are counted
    per position (overlapping), weighted by the containing word's corpus
    frequency; single-character words contribute nothing.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    wc = word_counts(docs, text_col)
    n = F.length("word")
    starts = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.explode(
        F.transform(starts, lambda i: F.substring(F.col("word"), i, 2))
    )
    return (
        wc.select(pair.alias("__p"), "wc")
        .groupBy("__p")
        .agg(F.sum("wc").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .select(
            F.substring("__p", 1, 1).alias("lhs"),
            F.substring("__p", 2, 1).alias("rhs"),
            "pair_count",
        )
    )
