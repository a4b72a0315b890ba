"""Partitioned cuckoo filter — the URL-seen prefilter with DELETE support.

The north-star design names a "partitioned cuckoo/bloom URL-seen filter";
`operators/seen.py` implements the bloom arm. This module implements the
cuckoo arm (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014, public): per-bucket tables of
16-bit fingerprints with partial-key cuckoo hashing, which a bloom filter
cannot do —

  - **deletion**: a recrawl/invalidation pipeline removes a URL's
    fingerprint and the URL becomes schedulable again WITHOUT rebuilding
    the whole prefilter (a bloom bit can never be cleared — other keys may
    share it);
  - lookup reads exactly 2 table rows (cache-resident), vs k scattered
    bit probes;
  - ~same space at the 3% FPR regime (16-bit fp, 4 slots/row, ~95% load).

Partitioning mirrors the bloom arm 1:1 so the two are drop-in siblings:
keys hash-bucket by pmod(xxhash64(url_key), B); each bucket owns an
independent cuckoo table built executor-parallel inside an applyInPandas
group (`build_cuckoo_blobs`), serialized as one binary blob per bucket,
driver-merged, broadcast, and probed by a vectorized Arrow-batched UDF.
At 10^10 keys you size B so one bucket's table fits executor memory, the
same arithmetic as operators/seen.py's bloom sizing.

Semantics contract (shared with the bloom arm, property-pinned in
tests/test_cuckoo.py): `contains` has NO false negatives for present keys;
false positives are safe (they only route a candidate into the exact
anti-join). Unlike bloom, inserts can FAIL when a table is pathologically
full; failed fingerprints spill to a per-bucket exact stash of
(row, fingerprint) pairs so the no-false-negative contract survives
worst-case load (the stash is the standard "victim cache" from the paper,
generalized to a list; keeping the row index keeps the stash check as
tight as a table hit and lets `merge_blob` re-insert spilled victims).

Reference parity note: the reference holds its seen set as one in-process
DashMap keyed by MD5(url) (/root/reference/src/engine/crawler.rs:96-103) —
exact, deletable, single-node. The partitioned cuckoo filter is the
distributed analogue that keeps BOTH properties (bounded memory via
fingerprints, deletability) at cluster scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16-bit fingerprints, 4 slots per row: the paper's sweet spot (§5.1) —
# FPR ≈ 2*slots/2^16 ≈ 0.012% at full load, 2 bytes/slot
FP_BITS = 16
SLOTS = 4
MAX_KICKS = 500


def _fingerprints(keys: pd.Series) -> np.ndarray:
    """16-bit nonzero fingerprint from the md5-hex url_key's second half.

    The url_key is already an md5 hex digest (the engine computes it once,
    natively) — slicing bits out of it costs no extra hashing, exactly like
    the bloom arm's h1/h2 scheme.
    """
    fp = (
        keys.str.slice(16, 20).apply(int, base=16).to_numpy(dtype=np.uint64)
        & np.uint64(0xFFFF)
    ).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)  # 0 means "empty slot"


def _index1(keys: pd.Series, m: int) -> np.ndarray:
    h1 = keys.str.slice(0, 16).apply(int, base=16).to_numpy(dtype=np.uint64)
    return (h1 % np.uint64(m)).astype(np.int64)


def _alt_index(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """Partial-key cuckoo hashing: i2 = i1 XOR h(fp). m must be a power of
    two so the XOR stays a permutation of [0, m)."""
    hfp = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) >> np.uint64(32)
    return ((i.astype(np.uint64) ^ hfp) % np.uint64(m)).astype(np.int64)


class CuckooState:
    """Per-bucket cuckoo tables: {bucket: (table ndarray[m, SLOTS] uint16,
    stash list[(row, fp)])}. Same driver-held/broadcast lifecycle as
    BloomState."""

    def __init__(self, n_buckets: int, rows_per_bucket: int = 1 << 15):
        if rows_per_bucket & (rows_per_bucket - 1):
            raise ValueError("rows_per_bucket must be a power of two")
        self.n_buckets = n_buckets
        self.m = rows_per_bucket
        self.tables: dict[int, np.ndarray] = {}
        self.stash: dict[int, list[tuple[int, int]]] = {}

    # ---------------------------------------------------------------- build
    def _table(self, b: int) -> np.ndarray:
        return self.tables.setdefault(
            int(b), np.zeros((self.m, SLOTS), dtype=np.uint16)
        )

    def _insert_one(self, tab: np.ndarray, stash: list, i1: int, fp: int) -> None:
        i2 = int(_alt_index(np.array([i1]), np.array([fp], dtype=np.uint16), self.m)[0])
        for i in (i1, i2):
            free = np.flatnonzero(tab[i] == 0)
            if len(free):
                tab[i, free[0]] = fp
                return
        # evict: deterministic kick walk (slot chosen by kick counter, not
        # RNG — rebuilds are bit-identical, which the resume tests rely on)
        i, cur = i1, fp
        for kick in range(MAX_KICKS):
            s = kick % SLOTS
            cur, tab[i, s] = int(tab[i, s]), cur
            i = int(_alt_index(np.array([i]), np.array([cur], dtype=np.uint16), self.m)[0])
            free = np.flatnonzero(tab[i] == 0)
            if len(free):
                tab[i, free[0]] = cur
                return
        # table saturated: exact spill, never a miss — the victim's candidate
        # row i pins its {i, i^h(fp)} pair for the index-aware stash check
        stash.append((int(i), int(cur)))

    def add_keys(self, pdf: pd.DataFrame) -> None:
        """pdf columns: url_key, bucket. Insert loop is per-key (eviction is
        inherently sequential) but runs ONLY at build/absorb time — and the
        distributed builder runs one bucket per executor task."""
        for b, grp in pdf.groupby("bucket"):
            tab = self._table(int(b))
            stash = self.stash.setdefault(int(b), [])
            fps = _fingerprints(grp["url_key"])
            i1s = _index1(grp["url_key"], self.m)
            for i1, fp in zip(i1s.tolist(), fps.tolist()):
                self._insert_one(tab, stash, i1, fp)

    # --------------------------------------------------------------- lookup
    def contains(self, pdf: pd.DataFrame) -> np.ndarray:
        """Vectorized maybe-seen test (no insert-loop on the wave hot path):
        two gathers + equality against SLOTS columns per key."""
        out = np.zeros(len(pdf), dtype=bool)
        if not len(pdf):
            return out
        for b, grp in pdf.groupby("bucket"):
            tab = self.tables.get(int(b))
            if tab is None:
                continue
            fps = _fingerprints(grp["url_key"])
            i1 = _index1(grp["url_key"], self.m)
            i2 = _alt_index(i1, fps, self.m)
            hit = (tab[i1] == fps[:, None]).any(axis=1) | (
                tab[i2] == fps[:, None]
            ).any(axis=1)
            st = self.stash.get(int(b))
            if st:
                s_i = np.asarray([e[0] for e in st], dtype=np.int64)
                s_fp = np.asarray([e[1] for e in st], dtype=np.uint16)
                # index-aware: a stash entry only matches keys whose row
                # pair {i1, i2} contains its pinned row — same tightness
                # as a table hit (the stash is tiny; broadcasting is fine)
                hit |= (
                    (s_fp[None, :] == fps[:, None])
                    & ((s_i[None, :] == i1[:, None]) | (s_i[None, :] == i2[:, None]))
                ).any(axis=1)
            out[grp.index.to_numpy()] = hit
        return out

    # --------------------------------------------------------------- delete
    def delete_keys(self, pdf: pd.DataFrame) -> int:
        """Remove ONE stored fingerprint per present key (cuckoo semantics:
        delete only keys known to have been inserted — deleting an absent
        key can evict a colliding neighbor's fingerprint, same caveat as
        the paper §3.2). Returns the number of fingerprints removed."""
        removed = 0
        for b, grp in pdf.groupby("bucket"):
            tab = self.tables.get(int(b))
            if tab is None:
                continue
            st = self.stash.get(int(b), [])
            fps = _fingerprints(grp["url_key"])
            i1s = _index1(grp["url_key"], self.m)
            i2s = _alt_index(i1s, fps, self.m)
            for i1, i2, fp in zip(i1s.tolist(), i2s.tolist(), fps.tolist()):
                done = False
                for i in (i1, i2):
                    slot = np.flatnonzero(tab[i] == fp)
                    if len(slot):
                        tab[i, slot[0]] = 0
                        removed += 1
                        done = True
                        break
                if not done:
                    for e in st:
                        if e[1] == fp and e[0] in (i1, i2):
                            st.remove(e)
                            removed += 1
                            break
        return removed

    # -------------------------------------------------------- serialization
    def to_rows(self) -> list[tuple[int, bytes]]:
        """(bucket, blob) rows; blob = table bytes + uint64-packed
        (row << 16 | fp) stash tail + uint32 stash length footer. One blob
        per bucket, same checkpoint shape as the bloom arm's bitsets."""
        rows = []
        for b in sorted(self.tables):
            st = self.stash.get(b, [])
            packed = np.asarray(
                [(int(i) << 16) | int(fp) for i, fp in st], dtype=np.uint64
            )
            blob = (
                self.tables[b].tobytes()
                + packed.tobytes()
                + np.uint32(len(st)).tobytes()
            )
            rows.append((b, blob))
        return rows

    @classmethod
    def from_rows(cls, rows, n_buckets: int, rows_per_bucket: int):
        s = cls(n_buckets, rows_per_bucket)
        body = rows_per_bucket * SLOTS * 2
        for b, blob in rows:
            s.tables[int(b)] = (
                np.frombuffer(blob[:body], dtype=np.uint16)
                .reshape(rows_per_bucket, SLOTS)
                .copy()
            )
            n_st = int(np.frombuffer(blob[-4:], dtype=np.uint32)[0])
            packed = np.frombuffer(blob[body : body + 8 * n_st], dtype=np.uint64)
            s.stash[int(b)] = [
                (int(p >> np.uint64(16)), int(p & np.uint64(0xFFFF))) for p in packed
            ]
        return s

    def merge_blob(self, bucket: int, blob: bytes) -> None:
        """Fold another build's bucket blob into this state — the absorb
        path for incremental (per-wave) distributed builds, mirroring
        BloomState.merge_blob. Unlike bloom's bitwise OR, cuckoo tables
        merge by re-inserting: an incoming fingerprint at row i re-enters
        via the same {i, i ^ h(fp)} pair, so lookups stay exact. Incoming
        keys are new-by-construction (the engine only absorbs post-anti-join
        keys), so duplicate fingerprints are collisions, kept harmlessly."""
        b = int(bucket)
        incoming = CuckooState.from_rows([(b, blob)], self.n_buckets, self.m)
        if b not in self.tables and not self.stash.get(b):
            self.tables[b] = incoming.tables[b]
            self.stash[b] = incoming.stash.get(b, [])
            return
        tab = self._table(b)
        stash = self.stash.setdefault(b, [])
        src = incoming.tables[b]
        for i, s in zip(*np.nonzero(src)):
            self._insert_one(tab, stash, int(i), int(src[i, s]))
        for i, fp in incoming.stash.get(b, []):
            self._insert_one(tab, stash, int(i), int(fp))


def build_cuckoo_blobs(keys_df: DataFrame, rows_per_bucket: int) -> list[tuple[int, bytes]]:
    """Distributed per-bucket construction: one applyInPandas group per
    bucket builds its table executor-side; only B blobs return to the
    driver. Mirror of operators/seen.build_bloom_blobs."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        st = CuckooState(1, rows_per_bucket)
        st.add_keys(pdf.assign(bucket=0))
        blob = st.to_rows()[0][1]
        return pd.DataFrame({"bucket": [b], "bits": [blob]})

    rows = (
        keys_df.groupBy("bucket")
        .applyInPandas(per_bucket, "bucket int, bits binary")
        .collect()
    )
    return [(r["bucket"], r["bits"]) for r in rows]


def cuckoo_filter_new(
    spark,
    candidates: DataFrame,
    state: CuckooState,
    exact_keys: DataFrame,
    key_col: str = "url_key",
) -> DataFrame:
    """Prefiltered anti-join, cuckoo arm: definitely-new candidates (filter
    miss) skip the exact anti-join; only maybe-seen rows join. Shape-for-
    shape the same plan as SeenSet.filter_new's bloom path, so the engine
    could swap arms without a plan change."""
    from siteone_crawler_spark.operators.seen import key_bucket

    cand = candidates.withColumn(
        "__bucket", key_bucket(F.col(key_col), state.n_buckets)
    )
    bc = spark.sparkContext.broadcast(
        {"rows": state.to_rows(), "m": state.m, "B": state.n_buckets}
    )

    @F.pandas_udf("boolean")
    def maybe_seen(keys: pd.Series, buckets: pd.Series) -> pd.Series:
        st = CuckooState.from_rows(bc.value["rows"], bc.value["B"], bc.value["m"])
        pdf = pd.DataFrame({"url_key": keys, "bucket": buckets}).reset_index(drop=True)
        return pd.Series(st.contains(pdf))

    cand = cand.withColumn("__maybe", maybe_seen(F.col(key_col), F.col("__bucket")))
    definite_new = cand.filter(~F.col("__maybe"))
    maybe = cand.filter(F.col("__maybe"))
    survivors = maybe.join(
        exact_keys.withColumnRenamed("url_key", key_col).select(key_col),
        on=[key_col],
        how="left_anti",
    )
    return definite_new.unionByName(survivors).drop("__bucket", "__maybe")
