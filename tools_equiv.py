#!/usr/bin/env python
"""Output-equivalence harness for optimization work.

Captures a canonical fingerprint (row count + order-independent hash of
every cell, schema included) for every declared query, so a restructured
implementation can be proven to compute EXACTLY the same result:

  python tools_equiv.py snapshot /tmp/equiv_before.json [sf_dir] [name ...]
  python tools_equiv.py compare  /tmp/equiv_before.json [sf_dir] [name ...]

Not part of the driver contract; used by OPTIMIZATION_r06.md evidence.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _fingerprint(df) -> dict:
    from pyspark.sql import functions as F

    schema = df.schema.simpleString()
    # canonical per-row string -> md5 -> xor-free order-independent fold:
    # sum of int64 slices of md5 (commutative, collision-safe enough for
    # an equivalence check), plus row count
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0NULL")) for c in df.columns]
    h = F.md5(F.concat_ws("\x01", *cols))
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)")).alias("s1"),
        F.sum(F.conv(F.substring(h, 16, 15), 16, 10).cast("decimal(38,0)")).alias("s2"),
    ).first()
    return {
        "schema": schema,
        "n": agg["n"],
        "s1": str(agg["s1"]),
        "s2": str(agg["s2"]),
    }


def main() -> None:
    mode, path = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])

    import __spark_entry__ as E
    from siteone_crawler_spark.session import get_spark

    spark = get_spark("equiv", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    qs = {**E.queries(), **E.extra_queries()}
    from siteone_crawler_spark.operators.dedup import simhash_near_pairs

    qs["simhash_near_pairs_native"] = lambda s, d: simhash_near_pairs(
        s.read.parquet(os.path.join(d, "documents.parquet")), max_hamming=12,
        native=True,
    )

    names = sorted(only or qs)
    out, old = {}, {}
    if mode == "compare":
        with open(path) as f:
            old = json.load(f)
    bad = []
    for name in names:
        if name not in qs:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        try:
            fp = _fingerprint(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            fp = {"error": str(e)[:300]}
        out[name] = fp
        if mode == "compare":
            ref = old.get(name)
            status = "MATCH" if fp == ref else "DIFF"
            if fp != ref:
                bad.append(name)
                print(f"{name}: {status}\n  old={ref}\n  new={fp}", flush=True)
            else:
                print(f"{name}: {status}", flush=True)
        else:
            print(f"{name}: {fp}", flush=True)
    if mode == "snapshot":
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path} ({len(out)} queries)")
    else:
        print(f"\n{len(bad)} mismatches: {bad}")
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
