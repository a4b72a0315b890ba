"""Range (interval) join — match points into time intervals at scale.

Spark's optimizer executes a plain `ON p.ts BETWEEN i.start AND i.end`
join as BroadcastNestedLoop (or worse, cartesian) — quadratic the moment
the interval side outgrows a broadcast. The public scale pattern (the same
idea behind Databricks' range-join bin hint and interval trees in kdb) is
BUCKETIZATION: chop time into fixed-width buckets, explode each interval
into the buckets it overlaps, tag each point with the ONE bucket containing
it, then equi-join on (key, bucket) and re-check the exact predicate. The
join becomes a shuffled hash join whose fan-out is bounded by
interval_width / bucket_width + 1; a point's bucket is unique, so no
dedup pass is needed — each qualifying (point, interval) pair meets in
exactly one bucket.

Semantics: start <= ts < end (half-open, the standard interval contract);
degenerate intervals (end <= start) match nothing.

The reference has no interval surface; this is part of the
training/analytics superset the north rule asks for (pairs with
operators/asof.py — as-of answers "latest before", range answers "all
within").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _epoch_us(df: DataFrame, col: str) -> Column:
    """unix_micros for either timestamp flavor. TIMESTAMP_NTZ is cast to
    LTZ first — exact under the engine's pinned UTC session timezone
    (session.py: spark.sql.session.timeZone=UTC; no DST, identity map)."""
    c = F.col(col)
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        c = c.cast("timestamp_ltz")
    return F.unix_micros(c)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str = "user_id",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of points to every interval (same `by` key) containing
    their timestamp. Output: all point columns + all interval columns
    except its `by` twin. Pick `bucket_seconds` near the TYPICAL interval
    width: wider buckets mean fewer exploded rows but more same-bucket
    false candidates for the exact re-check."""
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    w_us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(
        "__b", F.floor(_epoch_us(points, ts_col) / w_us)
    )
    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_epoch_us(intervals, start_col) / w_us),
                # end is exclusive: the last overlapped bucket holds end-1us
                F.floor((_epoch_us(intervals, end_col) - 1) / w_us),
            )
        ),
    )
    icols = [c for c in intervals.columns if c != by]
    joined = p.join(
        i.select(F.col(by).alias("__by"), "__b", *icols),
        (F.col(by) == F.col("__by")) & (p["__b"] == i["__b"]),
    ).filter(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.select(*points.columns, *icols)
