#!/usr/bin/env python
"""Wave-phase isolation harness (guide §1) — NOT part of the driver contract.

Runs ONE steady-state engine wave like bench.py's wave_bench, but surfaces
the fine-grained `subtime_us:` metric rows the engine records (per-thread
finalize decomposition) so optimization work can name the serial slice it
cut. Usage:

  python bench_wave_extra.py [cores] [frontier_rows] [n_runs]

Prints one JSON line per run: total sec, time_us phases, subtime_us rows.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_frontier = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from siteone_crawler_spark.config import CrawlConfig
    from siteone_crawler_spark.engine import CrawlEngine
    from siteone_crawler_spark.generator import generate_site_df
    from siteone_crawler_spark.session import get_spark

    from bench import PART_MULT, _build_frontier

    spark = get_spark(
        f"bench_wave_extra_{cores}", cores=cores,
        shuffle_partitions=max(PART_MULT * cores, 8),
    )
    docs, meta, robots, _seed_fn = generate_site_df(
        spark, n_docs=2 * n_frontier, n_hosts=512, fanout=8
    )
    n_part = max(PART_MULT * cores, 8)
    docs = docs.repartition(n_part, "doc_id").persist()
    meta = meta.repartition(n_part, "doc_id").persist()
    docs.count(), meta.count()
    frontier = _build_frontier(spark, docs, n_frontier)

    for i in range(n_runs):
        ckpt = tempfile.mkdtemp(
            prefix=f"bwe_{cores}_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        cfg = CrawlConfig(
            allowed_domains=("*.bench.test",),
            max_visited_urls=10**12,
            max_queue_length=10**12,
        )
        eng = CrawlEngine(spark, cfg, ckpt, n_buckets=64)
        eng.seed_frontier(frontier)
        t0 = time.time()
        tables = eng.run(
            docs, meta, robots, seeds=[("https://h0000.bench.test/p/0", 5)],
            max_waves=1, external_frontier=frontier, preseeded=True,
        )
        n_visited = tables["visited"].count()
        mrows = {r["stage"]: r["rows"] for r in tables["metrics"].collect()}
        dt = time.time() - t0
        out = {
            "run": i,
            "cores": cores,
            "frontier": n_frontier,
            "visited": n_visited,
            "sec": round(dt, 2),
            "phases": {
                k.split(":", 1)[1]: round(v / 1e6, 2)
                for k, v in mrows.items()
                if k.startswith("time_us:")
            },
            "sub": {
                k.split(":", 1)[1]: round(v / 1e6, 2)
                for k, v in mrows.items()
                if k.startswith("subtime_us:")
            },
        }
        shutil.rmtree(ckpt, ignore_errors=True)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
