"""Line-level boilerplate removal — C4/RefinedWeb-style corpus-frequency dedup.

Web text carries repeated per-site furniture (cookie banners, nav, footers,
"subscribe" calls) that exact/near document dedup never catches because the
surrounding text differs. The standard recipe (C4; RefinedWeb §3.2) drops
any LINE whose exact text recurs across the corpus more than a threshold.

Spark-first shape, no driver-side state:

  1. posexplode the line array (position kept for order-exact rebuild)
  2. corpus-wide line frequency = one hash aggregate on the line text
     (map-side partial combine does the heavy lifting: boilerplate is by
     definition massively repeated, so partials collapse it early)
  3. LEFT ANTI join lines against the over-threshold set — at 100 TB the
     frequent-line set is small (it took >max_df repeats to get in), so
     AQE broadcasts it; clean lines never shuffle
  4. rebuild documents with sort_array(collect_list(struct(pos, line)))
     — per-doc arrays, bounded by document size, never a global sort

Line identity is the exact trimmed text; empty lines are kept verbatim
(they carry formatting, and counting them as "boilerplate" would delete
every paragraph break corpus-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)).alias(
            "pos", "line"
        ),
    )


def line_frequency(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide (line, n_docs) — distinct docs containing each non-empty
    line. One exploded pass + one hash aggregate."""
    return (
        _lines(docs, text_col, id_col, sep)
        .filter(F.trim("line") != "")
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    max_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Documents with lines occurring in more than max_df docs removed:
    (id_col, text) where text is the order-preserved rebuild of surviving
    lines. Docs whose every line is boilerplate survive with text ''."""
    freq = line_frequency(docs, text_col, id_col, sep)
    bad = freq.filter(F.col("n_docs") > max_df).select("line")
    lines = _lines(docs, text_col, id_col, sep)
    kept = lines.join(bad, "line", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias(text_col)
        )
    )
    # docs can lose every line (all boilerplate): preserve them with ''
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .fillna({text_col: ""})
    )
