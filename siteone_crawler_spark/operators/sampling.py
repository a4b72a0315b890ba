"""Deterministic sampling operators for training-data pipelines.

At 100-TB scale a training pipeline rarely consumes everything: it takes
content-addressed samples (reproducible across reruns, engines and input
re-partitionings — unlike rand(), the same row always lands on the same side
of the cut) and per-stratum caps (domain / language balancing). Both are
pure native Catalyst:

  - hash_sample: filter on a 4-hex-char prefix of md5(key || salt) — a
    scan-side predicate (no shuffle, no RNG state, no driver involvement);
    rate resolution 1/65536. Lowercase-hex string comparison is
    lexicographically identical to the numeric comparison, so the same
    predicate is expressible in any engine with md5() (the DuckDB oracle
    uses the literal same SQL).
  - stratified_sample: top-N per stratum in md5 order. Spark's
    WindowGroupLimit rewrite (physical plan) turns the rank <= N filter
    into a per-partition partial top-N BEFORE the exchange, so the shuffle
    carries at most N rows per stratum per map partition, not the whole
    table — the property that makes a per-domain cap viable at 10^11 rows.

The reference crawler has no sampling surface (crawl-everything semantics);
this module is part of the training-data superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sample_threshold_hex(rate: float) -> str:
    """4-hex-char threshold t: P(substr(md5(k),1,4) < t) = floor(rate*65536)/65536.

    rate >= 1.0 returns "g": every hex digit sorts below 'g', so the
    comparison stays a fixed-width string compare (formatting 65536 as hex
    would yield the 5-char '10000', which sorts BELOW 'ffff')."""
    b = max(0, min(65536, int(rate * 65536)))
    if b >= 65536:
        return "g"
    return format(b, "04x")


def hash_sample(df: DataFrame, key: str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic content-addressed sample: keep rows whose
    md5(key||salt) hex prefix falls below the rate threshold. Changing
    `salt` draws an independent sample; the same (key, salt) always makes
    the same decision, so incremental reruns are stable."""
    thr = sample_threshold_hex(rate)
    h = F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 4
    )
    return df.filter(h < F.lit(thr))


def stratified_sample(
    df: DataFrame, strata: str, key: str, n_per_stratum: int
) -> DataFrame:
    """Keep at most n_per_stratum rows per stratum, chosen in md5(key)
    order (a deterministic uniform shuffle within each stratum; `key`
    string as tiebreak makes the order total). Adds a bigint `rn` column
    (1-based rank within the stratum)."""
    ord_key = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(strata).orderBy(ord_key, F.col(key).cast("string"))
    return (
        df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= n_per_stratum)
    )
