"""Corpus data-card — per-source governance summary of a training corpus.

Public practice: "Datasheets for Datasets" (Gebru et al. 2021,
arXiv:1803.09010) and the data cards shipped with public corpora (C4,
The Pile, Dolma) report per-source composition — document counts, token
totals, duplication rates, language mix — so downstream users can audit
what went into a model. This operator emits that table directly from the
documents relation.

Scale shape: one corpus scan computes per-row (source, tokens, fingerprint,
lang); global duplicate detection is a fingerprint hash-aggregate (map-side
combined; a doc is a duplicate when its md5 fingerprint occurs >1 time
ANYWHERE — the same contract as operators/dedup.exact_duplicates) whose
>1-count survivors broadcast back as a semi-probe; everything then folds
into ONE per-source aggregate. The language mode is a per-(source,lang)
count + WindowGroupLimit top-1 — deterministic tie-break (count desc, lang
asc). No UDF, no unbounded state per group.

The reference's closest surface is source_domain_stats
(/root/reference/src/analysis — per-domain counts/sizes); the data card is
its training-data superset with dedup and language composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import norm_tokens


def corpus_datacard(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(source, n_docs, total_tokens, n_dup_docs, top_lang) per source.

    n_dup_docs counts docs whose exact-text fingerprint appears more than
    once in the WHOLE corpus (cross-source duplicates count in every source
    that holds a copy); top_lang is the most frequent language (ties ->
    lexicographically smallest)."""
    # lazy barrier: base is consumed three times (duplicate-fingerprint
    # aggregate, dup-flag join, language mode) and the tokenize+md5 scan
    # re-ran per consumer without it; the checkpoint holds only the slim
    # (source, lang, n_tokens, fp) projection
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.size(norm_tokens(F.col(text_col))).alias("__nt"),
        F.md5(F.col(text_col)).alias("__fp"),
    ).localCheckpoint(eager=False)
    dup_fps = (
        base.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__fp")
    )
    flagged = base.join(
        F.broadcast(dup_fps.select("__fp", F.lit(1).alias("__dup"))), "__fp", "left"
    )
    stats = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("__nt").cast("bigint").alias("total_tokens"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0))).cast("int").alias("n_dup_docs"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("__lc"), F.asc("lang")
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("__lc"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return stats.join(top_lang, "source")
