"""Bloom-filter fast path for incremental exact dedup (extension X1 at scale).

At ingest time most new documents are NOVEL: an exact anti-join against the
corpus shuffles the whole batch (and touches the corpus index) just to learn
that almost nothing collides. A Bloom filter over the corpus keys turns that
into a map-side test: novel docs (the overwhelming majority) are admitted
with ZERO shuffle; only Bloom HITS — true duplicates plus the small
false-positive fraction — pay the confirming equi-join against the corpus.
The final result is EXACT: false positives are resolved by the confirm join,
and false negatives don't exist (Bloom guarantee), so downstream results are
independent of filter sizing. Sizing only moves the fast-path/slow-path
split: 10 bits/key at k=7 hashes gives <1% FP, i.e. ~99% of a novel batch
never shuffles.

100 TB posture: the filter is built DISTRIBUTED — each partition ORs its
keys into a local bitmap, and the bitmaps combine up a tree (depth log P);
the driver only ever holds the final m/8-byte array, never any keys. At
10^10 corpus keys the bitmap is ~12 GiB — broadcast once per executor
(Spark's own runtime bloom-filter joins make the same trade); shrink
``bits_per_key`` or shard by key prefix when the corpus outgrows a single
broadcast. Probes are a vectorized Arrow pandas UDF over the broadcast
bitmap — no per-row Python.

Hashing: bit positions come from the Kirsch–Mitzenmacher double-hash scheme
``pos_i = (h1 + i*h2) mod m`` over two independent ``xxhash64`` values —
JVM-side hashing, numpy uint64 wrap-around arithmetic, no Python hashing of
keys anywhere. Correctness never depends on hash portability (the confirm
join is on the raw key), so the fast non-portable xxhash64 is the right
choice here — unlike the md5-based minhash digests, which must replay in the
oracle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_H2_SEED = 0x5EED


@dataclass
class BloomFilter:
    bits: np.ndarray  # uint8 bitmap, little-endian bit order within bytes
    m_bits: int
    num_hashes: int

    def fp_rate(self, n_keys: int) -> float:
        """Theoretical false-positive rate for n_keys inserted keys."""
        k = self.num_hashes
        return float((1.0 - np.exp(-k * n_keys / self.m_bits)) ** k)


def _hash_cols(key: Column) -> tuple[Column, Column]:
    return F.xxhash64(key), F.xxhash64(key, F.lit(_H2_SEED))


def _positions(h1: np.ndarray, h2: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    # int64 → uint64 reinterpretation; uint64 ops wrap mod 2^64, identical
    # between build and probe, so only this file defines the position scheme.
    return (h1.astype(np.uint64) + np.uint64(i) * h2.astype(np.uint64)) % np.uint64(m_bits)


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_keys: int | None = None,
    bits_per_key: int = 10,
    num_hashes: int = 7,
) -> BloomFilter:
    """Distributed Bloom build over ``df[key_col]``. One count action when
    ``num_keys`` isn't supplied (pass the known corpus size to skip it), one
    tree-reduce over per-partition bitmaps. Driver memory: the final bitmap
    only."""
    h1c, h2c = _hash_cols(F.col(key_col))
    hashed = df.select(h1c.alias("h1"), h2c.alias("h2"))
    if num_keys is None:
        num_keys = hashed.count()
    m_bits = max(64, int(np.ceil(num_keys * bits_per_key / 64.0)) * 64)
    k = num_hashes

    # One pass per partition: gather (h1, h2) into arrays, set k bits each.
    def _bitmap(rows):
        buf = [(r["h1"], r["h2"]) for r in rows]
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        if buf:
            arr = np.asarray(buf, dtype=np.int64)
            for i in range(k):
                pos = _positions(arr[:, 0], arr[:, 1], i, m_bits)
                np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        yield bm

    # treeAggregate (not treeReduce): a zero-value bitmap makes the empty
    # corpus well-defined — an all-zeros filter that rejects everything.
    zero = np.zeros(m_bits // 8, dtype=np.uint8)
    bits = hashed.rdd.mapPartitions(_bitmap).treeAggregate(zero, np.bitwise_or, np.bitwise_or)
    return BloomFilter(bits=bits, m_bits=m_bits, num_hashes=k)


def bloom_might_contain(df: DataFrame, key_col: str, bloom: BloomFilter, out_col: str = "_bloom_hit") -> DataFrame:
    """Adds a boolean membership column — map-side only: JVM xxhash64 + an
    Arrow-vectorized probe of the broadcast bitmap. False ⇒ definitely novel."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.bits)
    m_bits, k = bloom.m_bits, bloom.num_hashes

    @pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = bc.value
        a1 = h1.to_numpy(dtype=np.int64)
        a2 = h2.to_numpy(dtype=np.int64)
        hit = np.ones(len(a1), dtype=bool)
        for i in range(k):
            pos = _positions(a1, a2, i, m_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(hit)

    h1c, h2c = _hash_cols(F.col(key_col))
    return df.withColumn(out_col, _probe(h1c, h2c))


def bloom_dedup_filter(batch: DataFrame, corpus_keys: DataFrame, key_col: str, bloom: BloomFilter) -> DataFrame:
    """EXACT batch-vs-corpus dedup through the Bloom fast path: rows whose
    key the filter rejects are novel by guarantee and bypass the join; only
    Bloom hits are confirmed against the corpus (left_anti keeps the false
    positives). Output ≡ ``batch LEFT ANTI JOIN corpus ON key`` for every
    filter sizing — the bloom moves cost, never answers.

    Catalyst bonus (visible in the physical plan): InferFiltersFromConstraints
    propagates the probe predicate across the join-key equality onto the
    CORPUS side too, so the confirm join's corpus input also collapses to
    bloom hits — a map-side scan-speed probe instead of shuffling/broadcasting
    the full corpus key set. Safe for anti-join semantics (every matching
    corpus row necessarily probes true), and exactly the plan you'd want at
    100 TB."""
    probed = bloom_might_contain(batch, key_col, bloom)
    novel_fast = probed.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    suspects = probed.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    confirmed_novel = suspects.join(corpus_keys.select(key_col), key_col, "left_anti")
    return novel_fast.unionByName(confirmed_novel)


def save_bloom(bloom: BloomFilter, path: str) -> None:
    """Persist for build-once/probe-many ingestion (same discipline as the
    LSH band index and the IVF cells): raw bitmap + JSON sizing sidecar."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "bits.bin"), "wb") as fh:
        fh.write(bloom.bits.tobytes())
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"m_bits": bloom.m_bits, "num_hashes": bloom.num_hashes}, fh)


def load_bloom(path: str) -> BloomFilter:
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    bits = np.frombuffer(open(os.path.join(path, "bits.bin"), "rb").read(), dtype=np.uint8).copy()
    return BloomFilter(bits=bits, m_bits=meta["m_bits"], num_hashes=meta["num_hashes"])
