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
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _py_norm(vals) -> float:
    """Driver-side L2 norm replicating the EXACT IEEE operation order of
    `_norm` on a literal array after constant folding: a left fold of
    acc + x*x in element order, then sqrt — both engines use correctly-
    rounded double ops, so the result is bit-identical to what Catalyst
    would compute from the same literals at runtime."""
    acc = 0.0
    for x in vals:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


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


def srp_bucket(vec_col, planes: list[list[float]], cast: bool = True):
    """Signed-random-projection bucket id: bit p = (dot(vec, plane_p) >= 0).
    cast=False skips the per-plane double cast when `vec_col` is already an
    array<double> (e.g. a hoisted projection column) — the dot products and
    sign tests are then identical ops over identical values."""
    bucket = F.lit(0).cast("long")
    cast_vec = (
        F.transform(vec_col, lambda x: x.cast("double")) if cast else vec_col
    )
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
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP blocking: candidates share a
    bucket (equi-join, no O(n^2) cross join), verified by exact cosine.
    The within-bucket join is quadratic, so `max_bucket` drops buckets with
    more members than the cap (2^8 buckets at 10^10 rows averages ~4*10^7
    rows/bucket — at that scale raise n_planes with log2(n) and cap the
    stragglers; an over-full bucket means the projection is uninformative
    for its members). Pass None to disable the guard."""
    dim = embeddings.select(F.size(vec_col)).first()[0]
    planes = hyperplane_signs(n_planes, dim)
    # per-ROW precompute: the cast and the norm are row-local, so doing them
    # here instead of inside the per-PAIR cosine turns 3 interpreted HOF
    # array passes per pair (dot + 2 norms) into 1 (the dot). The arithmetic
    # is unchanged — the same scalar ops run, just before the join — so
    # round(cos, 6) stays bit-identical to the naive form (and the oracle).
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    b = embeddings.withColumn("__vd", vd).select(
        F.col(id_col).alias("vid"),
        F.col("__vd").alias("v"),
        _norm(F.col("__vd")).alias("nrm"),
        # cast=False: __vd is already array<double>, so the per-plane
        # re-cast disappears; dot/sign results are identical
        srp_bucket(F.col("__vd"), planes, cast=False).alias("bkt"),
    )
    # one exchange + a lazy localCheckpoint barrier for the bucket build:
    # the guard aggregate and both join sides are three consumers and
    # exchange reuse does not fire across their differently-pruned copies —
    # without the barrier the hyperplane projection re-ran per consumer.
    # Lazy: computed inside the consuming action, fresh per build (no
    # cross-run reuse); it holds the already-projected (id, v, nrm, bkt)
    # slice the join shuffles anyway.
    b = b.repartition("bkt").localCheckpoint(eager=False)
    if max_bucket is not None:
        keep = (
            b.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("bkt")
        )
        b = b.join(keep, "bkt")
    a = b.select(
        F.col("vid").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"), "bkt",
    )
    c = b.select(
        F.col("vid").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"), "bkt",
    )
    pairs = a.join(c, "bkt").filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("n_a") * F.col("n_b")
    cos = F.when(denom > 0, _dot(F.col("v_a"), F.col("v_b")) / denom).otherwise(
        F.lit(0.0)
    )
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cos")
    ).filter(F.col("cos") >= threshold)


# --- IVF (inverted-file) ANN ------------------------------------------------


def _cos_to_lit(cast_vec, centroid: list[float]):
    return cosine_similarity(cast_vec, F.array(*[F.lit(float(x)) for x in centroid]))


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_aux: bool = False,
):
    """Assign each row to its nearest centroid by cosine (ties -> larger
    centroid id). Centroids are broadcast as literal arrays, so assignment
    is pure codegen'd expressions — no UDF, no shuffle. At scale the
    resulting `ivf_bucket` is a stored, partition-pruned column: probing
    nprobe lists reads nprobe/k of the data.

    The row's cast vector and norm are HOISTED into projection columns
    (evaluated once per row) and each centroid's norm is pre-folded
    driver-side with the same IEEE operation order (_py_norm): the naive
    per-centroid cosine re-cast the vector and re-computed its norm k
    times per row and carried k copies of the expression tree through the
    plan (the semdedup plan was 400+ KB of repeated subtrees — planning
    time alone dominated small runs). denom stays norm(v) * norm(c) in
    that order, so round(cos, 9) is bit-identical to the naive form.
    keep_aux=True retains the `__ivf_vd` (array<double>) and `__ivf_nv`
    columns for callers that need the cast vector/norm again (semdedup,
    ivf_topk) — saving further per-row passes."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vdc, nvc = F.col("__ivf_vd"), F.col("__ivf_nv")
    scored = []
    for i, c in enumerate(centroids):
        cn = _py_norm(c)
        denom = nvc * F.lit(cn)
        cos = F.when(
            denom > 0,
            _dot(vdc, F.array(*[F.lit(float(x)) for x in c])) / denom,
        ).otherwise(F.lit(0.0))
        scored.append(
            F.struct(F.round(cos, 9).alias("cos"), F.lit(i).alias("cid"))
        )
    out = (
        embeddings.withColumn("__ivf_vd", vd)
        .withColumn("__ivf_nv", _norm(vdc))
        .withColumn("ivf_bucket", F.array_max(F.array(*scored))["cid"])
    )
    return out if keep_aux else out.drop("__ivf_vd", "__ivf_nv")


def pivot_centroids(
    embeddings: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic coarse quantizer: the vectors of the k smallest ids.
    Real IVF trains centroids offline (k-means over a sample); the index
    contract — assign + probe — is identical whatever produced them."""
    rows = embeddings.orderBy(F.col(id_col).asc()).limit(k).collect()
    return [[float(x) for x in r[vec_col]] for r in rows]


def kmeans_refine(
    embeddings: DataFrame,
    centroids: list[list[float]],
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd refinement of the coarse quantizer: assign (codegen exprs) ->
    per-bucket elementwise mean (posexplode + groupBy(bucket, pos).avg — one
    shuffle of n*dim skinny rows per iteration) -> collect k*dim floats to
    the driver. Empty clusters keep their previous centroid."""
    for _ in range(iters):
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        means = (
            assigned.select(
                "ivf_bucket", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("ivf_bucket", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("ivf_bucket")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[r["ivf_bucket"]] = [s["m"] for s in r["ms"]]
        centroids = new
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` inverted lists whose
    centroids are closest to the query (chosen driver-side — k centroids is
    tiny), exact cosine within them. The scale path alongside srp_topk:
    centroid lists partition the corpus, so a stored `ivf_bucket` column
    plus partition pruning turns the scan into nprobe/k of the data."""
    if centroids is None:
        centroids = pivot_centroids(embeddings, n_centroids, id_col, vec_col)

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-round(cos(query_vec, centroids[i]), 9), -i)
    )
    probe = ranked[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # reuse the assignment's hoisted cast vector + norm for the query-side
    # cosine (same denom order norm(v) * norm(q), so round(cos, 6) is
    # bit-identical to the naive per-row recompute)
    denom = F.col("__ivf_nv") * F.lit(_py_norm(query_vec))
    cos = F.when(denom > 0, _dot(F.col("__ivf_vd"), q) / denom).otherwise(
        F.lit(0.0)
    )
    cand = ivf_assign(embeddings, centroids, id_col, vec_col, keep_aux=True).filter(
        F.col("ivf_bucket").isin(probe)
    )
    scored = cand.select(
        F.col(id_col).alias("vec_id"),
        F.round(cos, 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


# --- stored ANN index (the partition-pruned scale path) ---------------------


def build_ann_index(
    embeddings: DataFrame,
    path: str,
    method: str = "srp",
    n_planes: int = 8,
    n_centroids: int = 8,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the bucket column as a PARTITIONED parquet index: one
    directory per bucket, so a probe reads nprobe/k of the data via
    partition pruning instead of scanning and filtering. Returns the
    metadata needed to query (dim + centroids for ivf). At 10^10 rows
    this is the difference between a full scan per query and a handful of
    directory reads."""
    dim = embeddings.select(F.size(vec_col)).first()[0]
    if method == "srp":
        planes = hyperplane_signs(n_planes, dim)
        bucketed = embeddings.withColumn(
            "bucket", srp_bucket(F.col(vec_col), planes)
        )
        meta = {"method": "srp", "n_planes": n_planes, "dim": dim}
    elif method == "ivf":
        if centroids is None:
            centroids = pivot_centroids(embeddings, n_centroids, id_col, vec_col)
        bucketed = ivf_assign(embeddings, centroids, id_col, vec_col).withColumnRenamed(
            "ivf_bucket", "bucket"
        )
        meta = {"method": "ivf", "centroids": centroids, "dim": dim}
    else:
        raise ValueError(f"unknown ANN index method: {method}")
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return meta


def ann_topk_indexed(
    spark,
    path: str,
    meta: dict,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a stored index: compute the probe buckets driver-side (tiny),
    filter on the PARTITION column — the scan plan shows PartitionFilters,
    so only the probed directories are read — then exact cosine top-k."""
    emb = spark.read.parquet(path)
    if meta["method"] == "srp":
        planes = hyperplane_signs(meta["n_planes"], meta["dim"])
        qb = 0
        for p, plane in enumerate(planes):
            if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
                qb += 2**p
        probe = [
            b
            for b in range(2 ** meta["n_planes"])
            if bin(b ^ qb).count("1") <= multiprobe_hamming
        ]
    else:
        cents = meta["centroids"]

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(x * x for x in b) ** 0.5
            return dot / (na * nb) if na > 0 and nb > 0 else 0.0

        ranked = sorted(
            range(len(cents)), key=lambda i: (-round(cos(query_vec, cents[i]), 9), -i)
        )
        probe = ranked[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = emb.filter(F.col("bucket").isin(probe)).select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_similarity(cast_vec, q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization (the standard SQ8 compression in
    public ANN systems — Faiss/ScaNN-style): scale = max(|v|)/127 (floored
    at 1e-12 for zero vectors), code_i = floor(v_i/scale + 0.5). The
    explicit floor(+0.5) half-up is engine-portable (round()'s tie rule
    varies by dialect), so the DuckDB oracle reproduces codes bit-exactly.

    Output: (id, codes array<int> in [-127, 127], scale, max_err) — max_err
    is the reconstruction bound check max|code*scale - v| <= scale/2. At
    10^9 vectors this cuts the stored ANN index ~4x and dot products run on
    int8 lanes; everything here is a per-row native projection (no shuffle,
    no Python)."""
    a = F.col(vec_col)
    with_s = emb.withColumn(
        "__s",
        F.greatest(F.array_max(F.transform(a, lambda x: F.abs(x))), F.lit(1e-12))
        / 127.0,
    )
    codes = F.transform(a, lambda x: F.floor(x / F.col("__s") + 0.5).cast("int"))
    max_err = F.array_max(
        F.transform(a, lambda x: F.abs(F.floor(x / F.col("__s") + 0.5) * F.col("__s") - x))
    )
    return with_s.select(
        F.col(id_col),
        codes.alias("codes"),
        F.round(F.col("__s"), 6).alias("scale"),
        F.round(max_err, 6).alias("max_err"),
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): semantic
    dedup by clustering embeddings, then pruning within each cluster any
    point whose cosine similarity to a LOWER-id cluster member reaches the
    threshold. The keep rule — keep(d) iff no e<d in d's cluster with
    cos(d,e) >= threshold — is the paper's "keep one representative per
    semantic duplicate group" made deterministic (lowest id wins), which is
    what an oracle can re-derive.

    Scale shape: cluster assignment is `ivf_assign` (broadcast literal
    centroids, pure codegen — no shuffle, no UDF); the pair comparison is a
    bucket-colocated equi-join on the cluster id, quadratic ONLY within a
    cluster, so `max_cluster` drops over-full clusters from pairing (their
    members all keep=true) exactly like the sibling LSH guards
    (embedding_near_dup_pairs, simhash). At 10^9 rows run kmeans_refine on
    a sample first and raise n_centroids ~ n/10^5 so clusters stay joinable.

    Returns every input row as (id_col, cluster, keep)."""
    cents = pivot_centroids(embeddings, n_centroids, id_col, vec_col)
    # per-ROW precompute (cast + norm) — reused straight from ivf_assign's
    # hoisted aux columns: the per-pair cosine then needs only the dot
    # pass, with bit-identical round(cos, 6) results (the identical scalar
    # ops run, just earlier)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col, keep_aux=True).select(
        F.col(id_col).alias("__id"),
        F.col("__ivf_vd").alias("__v"),
        F.col("__ivf_nv").alias("__nrm"),
        F.col("ivf_bucket").alias("cluster"),
    )
    # one exchange + a lazy localCheckpoint barrier for the assignment: the
    # guard aggregate, both join sides, and the final keep-join are four
    # consumers of this subtree, and Spark's exchange reuse does NOT fire
    # across their differently-pruned copies — without the barrier the
    # centroid scoring ran per consumer and the final plan carried four
    # copies of the k-centroid expression tree (420 KB of plan at k=8,
    # dim=64: planning time alone dominated small runs). The checkpoint is
    # lazy (computed inside the consuming action, nothing runs at build
    # time) and per-DataFrame (a fresh build re-computes — no cross-run
    # result reuse); it materializes one already-shuffled, projected slice
    # (id, vector, norm, cluster), the same bytes the join shuffles anyway.
    assigned = assigned.repartition("cluster").localCheckpoint(eager=False)
    pairable = assigned
    if max_cluster is not None:
        ok = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_cluster)
            .select("cluster")
        )
        # <= n_centroids rows: always broadcastable
        pairable = assigned.join(F.broadcast(ok), "cluster")
    a = pairable.select(
        F.col("__id").alias("ia"), F.col("__v").alias("va"),
        F.col("__nrm").alias("na"), "cluster",
    )
    b = pairable.select(
        F.col("__id").alias("ib"), F.col("__v").alias("vb"),
        F.col("__nrm").alias("nb"), "cluster",
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(
        denom > 0, _dot(F.col("va"), F.col("vb")) / denom
    ).otherwise(F.lit(0.0))
    dups = (
        a.join(b, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("ib").alias("__dup"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned["__id"] == dups["__dup"], "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            F.col("__dup").isNull().alias("keep"),
        )
    )
