"""As-of join — attach the most recent prior right-stream row to each left row.

The canonical time-series operator Spark's DataFrame API lacks (pandas
merge_asof / DuckDB ASOF JOIN / kdb aj are the public references). Naive
formulations — a range join (quadratic per key) or a per-left-row subquery —
die at scale; the classic distributed shape is the UNION-WINDOW rewrite:

    tag both streams, union, sort within each key by (ts, side, seq),
    last_value(right columns, ignoreNulls) over the running window,
    keep left rows.

One shuffle total (the window partition on the key — the same exchange a
join would need), no join node, no per-key quadratic blowup, and skew is
bounded by per-key stream length exactly like any windowed aggregation.

Tie rule (deterministic, engine-portable): a right row at ts == left.ts
MATCHES (<= semantics, the merge_asof/ASOF JOIN default); among right rows
sharing the max ts the largest seq_col wins (sort is (ts, side, seq) with
right rows ordered before left rows at equal ts).

The reference has no time-series surface (its closest op is wave ordering,
/root/reference/src/crawler.rs queue ranking); this is part of the
training/analytics superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    seq_col: str = "event_id",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "matched_",
) -> DataFrame:
    """Left rows + `prefix`-renamed right columns from the as-of match
    (NULL when the key has no right row at or before the left timestamp).
    Output columns: all of `left`'s, then prefix+c for c in right_cols."""
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(by),
        F.col(on),
        F.col(seq_col).alias("__seq"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l = l.withColumn("__seq", F.col(seq_col))
    ordered = [by, on, "__side", "__seq", *[f"__r_{c}" for c in right_cols]] + [
        c for c in lcols if c not in (by, on)
    ]
    u = l.select(*ordered).unionByName(r.select(*ordered))
    w = (
        Window.partitionBy(by)
        .orderBy(F.asc(on), F.asc("__side"), F.asc("__seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(
            f"__m_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return u.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__m_{c}").alias(f"{prefix}{c}") for c in right_cols]
    )
