#!/usr/bin/env python
"""Extra benchmarks + plan capture for optimization work (guide §1).

NOT part of the driver contract — bench.py stays the frozen measurement
harness. This file exists so optimization claims in OPTIMIZATION_r06.md are
backed by isolated, repeatable numbers:

  python bench_extra.py plans [out_subdir] [name ...]
      Capture .explain("formatted") for declared queries into
      plans/r06/<name>_<out_subdir>.txt  (default suffix: "before").

  python bench_extra.py time [name ...]
      Time each query with the noop sink (computation only, guide §1.4),
      N draws each (BENCH_EXTRA_DRAWS, default 3), one shared session,
      jobs labelled with setJobDescription (guide §1.5). Prints one JSON
      line per query and a summary map at the end.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), core
count from $SPARK_GRAFT_CPUS — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the 32 queries bench.py times (run_queries list + the native simhash arm)
BENCH_NAMES = [
    "tpch_q1", "dedup_exact", "minhash_lsh_pairs", "knn_cosine_topk",
    "quality_score", "lang_id", "sessionize", "url_canonicalize",
    "url_dedup_first_wins", "extract_links", "simhash_near_pairs",
    "knn_ivf_topk", "security_stats", "seo_meta",
    "hash_sample", "stratified_sample", "repetition_ratio",
    "pii_scan", "pii_redact", "decontamination", "line_boilerplate",
    "temperature_sample", "pack_sequences",
    "dedup_clusters", "pagerank", "classifier_score", "gopher_quality",
    "semdedup", "dsir_weights", "tfidf_topk", "lm_xent",
    "simhash_near_pairs_native",
]


def _queries() -> dict:
    import __spark_entry__ as E

    qs = {**E.queries(), **E.extra_queries()}

    from siteone_crawler_spark.operators.dedup import simhash_near_pairs

    def _native_simhash(spark, sf_dir):
        return simhash_near_pairs(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")),
            max_hamming=12, native=True,
        )

    qs["simhash_near_pairs_native"] = _native_simhash
    return qs


def _get_spark():
    from siteone_crawler_spark.session import get_spark

    return get_spark("bench_extra", cores=CPUS, shuffle_partitions=max(CPUS, 16))


def capture_plans(suffix: str, names: list[str]) -> None:
    spark = _get_spark()
    qs = _queries()
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip {name}: unknown", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


def time_queries(names: list[str]) -> None:
    draws = int(os.environ.get("BENCH_EXTRA_DRAWS", "3"))
    spark = _get_spark()
    qs = _queries()
    out = {}
    for name in names:
        if name not in qs:
            print(f"skip {name}: unknown", file=sys.stderr)
            continue
        ts = []
        for i in range(draws):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(ts), "draws": ts}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        sfx = sys.argv[2] if len(sys.argv) > 2 else "before"
        names = sys.argv[3:] or BENCH_NAMES
        capture_plans(sfx, names)
    else:
        names = sys.argv[2:] or BENCH_NAMES
        time_queries(names)
