"""Similarity search over embedding columns (array<float>).

  - brute-force cosine top-k: pure native expressions (F.aggregate /
    F.zip_with dot product) — the correctness baseline; a full scan, but
    embarrassingly parallel and whole-stage-codegen'd.
  - LSH (random-hyperplane / SRP) bucketed search: deterministic ±1
    hyperplanes derived from md5((plane, dim)), so buckets are reproducible
    with no RNG state; candidates = same-bucket rows, verified by exact
    cosine. The scale path: at 10^10 rows the scan becomes a bucket-pruned
    lookup.

No Python in the brute-force path; the hyperplane signs are precomputed
driver-side (plane count x dim is tiny) and injected as literal arrays.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_similarity(a, b):
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine to a constant query vector.
    Deterministic tie-break on id. Output: (vec_id, cos) sorted desc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_similarity(cast_vec, q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign from the parity of the first byte
    of md5('p|d'). Reproducible anywhere (incl. a SQL oracle) without RNG."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}|{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def srp_bucket(vec_col, planes: list[list[float]]):
    """Signed-random-projection bucket id: bit p = (dot(vec, plane_p) >= 0)."""
    bucket = F.lit(0).cast("long")
    cast_vec = F.transform(vec_col, lambda x: x.cast("double"))
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(cast_vec, pl) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + (bit * F.lit(2**p).cast("long"))
    return bucket


def srp_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose SRP bucket is within
    `multiprobe_hamming` bits of the query's bucket, then exact cosine.
    At scale the bucket column is precomputed + partition-pruned; here it's
    computed inline (same plan shape, no stored index)."""
    dim = len(query_vec)
    planes = hyperplane_signs(n_planes, dim)

    # query bucket, driver-side (tiny)
    qb = 0
    for p, plane in enumerate(planes):
        dot = sum(a * b for a, b in zip(query_vec, plane))
        if dot >= 0:
            qb += 2**p
    probe = [b for b in range(2**n_planes) if bin(b ^ qb).count("1") <= multiprobe_hamming]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucketed = embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__bucket").isin(probe))
    scored = cand.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_similarity(cast_vec, q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP blocking: candidates share a
    bucket (equi-join, no O(n^2) cross join), verified by exact cosine."""
    dim = embeddings.select(F.size(vec_col)).first()[0]
    planes = hyperplane_signs(n_planes, dim)
    b = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        srp_bucket(F.col(vec_col), planes).alias("bkt"),
    )
    a = b.select(F.col("vid").alias("id_a"), F.col("v").alias("v_a"), "bkt")
    c = b.select(F.col("vid").alias("id_b"), F.col("v").alias("v_b"), "bkt")
    pairs = a.join(c, "bkt").filter(F.col("id_a") < F.col("id_b"))
    va = F.transform(F.col("v_a"), lambda x: x.cast("double"))
    vb = F.transform(F.col("v_b"), lambda x: x.cast("double"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine_similarity(va, vb), 6).alias("cos")
    ).filter(F.col("cos") >= threshold)
