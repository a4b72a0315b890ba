"""Deterministic global sequence assignment without a single-partition window.

`Window.orderBy(...)` with no partition key funnels the whole DataFrame
through ONE task — fine at unit-test scale, fatal on a 10^10-row frontier.
This helper assigns a contiguous global rank with the classic two-pass
pattern: range-repartition on the sort keys, sort within partitions, count
rows per partition (tiny driver-side collect, one row per partition), then
add per-partition offsets in a mapInPandas. Wall-clock cost is one range
shuffle — the minimum any global ordering can pay.

Determinism: the sort keys must be a unique compound key (the frontier uses
(parent_seq, span_offset, sub), unique by construction), so the produced
sequence is independent of partition boundaries and parallelism level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_global_seq(
    df: DataFrame,
    order_keys: list[str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
    small_threshold: int = 100_000,
    cache_registry: list | None = None,
    size_hint: int | None = None,
) -> tuple[DataFrame, int]:
    """Add `seq_col` = start + 0-based global rank by `order_keys`.
    Returns (ranked_df, row_count) — the count is a byproduct of the
    materialization and callers need it, so don't pay for it twice.

    Small inputs (≤ small_threshold rows) take the one-task window path —
    cheaper than a range shuffle when everything fits one partition anyway;
    big inputs take the scalable two-pass path. A caller that already knows
    the input is big passes `size_hint` (any upper-bound estimate >
    small_threshold) to skip the sizing count() — that removes one full
    pass over the input; the exact count then falls out of the
    per-partition count collect."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    n_rows: int | None = None
    if size_hint is None or size_hint <= small_threshold:
        df.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(df)
        n_rows = df.count()
        if n_rows <= small_threshold:
            w = W.orderBy(*order_keys)
            return (
                df.withColumn(seq_col, (F.row_number().over(w) - 1 + start).cast("long")),
                n_rows,
            )
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n_part, *order_keys)
        .sortWithinPartitions(*order_keys)
        .withColumn("__pid", F.spark_partition_id())
    )
    sorted_df.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(sorted_df)
    counts = {
        r["__pid"]: r["cnt"]
        for r in sorted_df.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    if n_rows is None:
        n_rows = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    bc = spark.sparkContext.broadcast(offsets)
    schema_out = sorted_df.drop("__pid").schema.add(seq_col, "long")

    def assign(iterator):
        # a partition arrives as SEVERAL Arrow batches, in order — carry a cursor
        cursor = None
        for pdf in iterator:
            if len(pdf) and cursor is None:
                cursor = bc.value[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns="__pid")
            if len(pdf):
                pdf[seq_col] = range(cursor, cursor + len(pdf))
                cursor += len(pdf)
            else:
                pdf[seq_col] = pdf.index.astype("int64")
            yield pdf

    out = sorted_df.mapInPandas(assign, schema=schema_out)
    return out, n_rows
