"""Document chunking — fixed-token sliding windows for embedding / RAG prep.

The standard pre-embedding step in a training-data pipeline: split each
document into `chunk_tokens`-word windows advancing by `stride` tokens
(overlap = chunk_tokens - stride), so no context is lost at window borders.

Everything is a per-row native expression (norm_tokens -> sequence ->
transform -> explode): no shuffle, no UDF, whole-stage codegen, and the
output rowcount is size(tokens)/stride per doc — an explode the scan
parallelism absorbs. The reference has no chunking (it stores whole
documents: /root/reference/src/storage — spans stay intact); this is part
of the training-data superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — one row per window.

    Window rule (deterministic, engine-portable): starts are 0, stride,
    2*stride, ... for every start < n_tokens — trailing windows shorter
    than chunk_tokens ARE emitted (they carry the document tail), and a
    zero-token document emits nothing. chunk_idx = start // stride.
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")

    # let-bind the token array via a single-element transform: CollapseProject
    # re-inlines a materialized __toks projection into every lambda
    # reference, re-tokenizing once per window (see operators/dsir.word_grams
    # for the measured 6.7x cost); a lambda variable is evaluated once
    def build(tk):
        n = F.size(tk)
        starts = F.when(
            n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("int").alias("chunk_idx"),
                F.array_join(F.slice(tk, s + 1, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
                F.least(F.lit(chunk_tokens), n - s).cast("int").alias("n_tokens"),
            ),
        )

    chunks = F.flatten(
        F.transform(F.array(norm_tokens(F.col(text_col))), build)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
