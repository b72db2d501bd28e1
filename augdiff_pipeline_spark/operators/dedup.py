"""Deduplication operators over the documents table.

- exact_dedup: hash-groupBy on a normalized fingerprint (md5) — fully
  native, shuffles once on the 128-bit key.
- minhash_lsh_pairs: char-shingle MinHash + banded LSH: one Arrow kernel
  emits (doc_id, band, band_hash) rows (numpy multiply-shift hashing —
  deterministic across executors, no Python ``hash``); a self-join on
  (band, band_hash) yields candidate pairs; an exact n-gram Jaccard
  kernel verifies.  The self-join shuffles only signature rows
  (docs × bands), never document text.
- simhash_pairs: 64-bit SimHash in an Arrow kernel; candidates via
  native band-extraction equi-join (shiftright/mask — JVM-side), verify
  with native bit_count(a XOR b) <= t.  No text leaves the first kernel.
- ngram_jaccard: exact pairwise verifier kernel (cogrouped by pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint

# -------------------------------------------------------- exact (hash) dedup
def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, canonical_id, dup_count) for groups with >1 doc."""
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


# ------------------------------------------------------------ numpy hashing
_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= _M1
    x ^= x >> np.uint64(29)
    x *= _M2
    x ^= x >> np.uint64(32)
    return x


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Deterministic 64-bit hashes of the char n-grams of ``text``."""
    b = text.lower().encode("utf-8")
    if len(b) < n:
        b = b + b" " * (n - len(b))
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # polynomial accumulate over a sliding window, then mix
    k = len(a) - n + 1
    acc = np.zeros(k, dtype=np.uint64)
    for i in range(n):
        acc = acc * np.uint64(1099511628211) + a[i : i + k]
    return np.unique(_mix64(acc))


_SALT_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _salts(num_perm: int, seed: int) -> np.ndarray:
    key = (num_perm, seed)
    if key not in _SALT_CACHE:
        _SALT_CACHE[key] = _mix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    return _SALT_CACHE[key]


def minhash_signature(text: str, num_perm: int, seed: int = 1) -> np.ndarray:
    sh = _shingle_hashes(text)
    # universal hashing h_i(x) = mix(x ^ salt_i); min per permutation —
    # one (P, S) vectorized pass, no per-salt Python
    salts = _salts(num_perm, seed)
    return _mix64(sh[None, :] ^ salts[:, None]).min(axis=1)


def minhash_bands(docs: DataFrame, num_perm: int = 32, bands: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, band_hash) — the LSH bucket rows."""
    rows_per_band = num_perm // bands

    def kernel(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "band": pd.Series([], dtype="int32"),
                     "band_hash": pd.Series([], dtype="int64")}
                )
                continue
            sigs = np.stack(
                [minhash_signature(str(t), num_perm) for t in pdf[text_col]]
            )  # (n, num_perm)
            # band hash: mix-fold each band's rows, vectorized over docs
            bh = np.empty((n, bands), dtype=np.uint64)
            for b in range(bands):
                h = np.full(n, np.uint64(b), dtype=np.uint64)
                for r in range(rows_per_band):
                    h = _mix64(h ^ sigs[:, b * rows_per_band + r])
                bh[:, b] = h
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), n),
                    "band_hash": bh.astype(np.int64).ravel(),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, band int, band_hash long"
    )


def minhash_lsh_pairs(docs: DataFrame, num_perm: int = 32, bands: int = 8,
                      jaccard_threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(a, b, jaccard) verified near-duplicate pairs, a < b."""
    sigs = minhash_bands(docs, num_perm, bands, text_col, id_col)
    l, r = sigs.alias("l"), sigs.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.band_hash") == F.col("r.band_hash")))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    texts = docs.select(F.col(id_col), F.col(text_col))
    paired = (
        cand.join(texts.withColumnRenamed(id_col, "a").withColumnRenamed(text_col, "ta"), "a")
        .join(texts.withColumnRenamed(id_col, "b").withColumnRenamed(text_col, "tb"), "b")
    )

    def verify(it):
        for pdf in it:
            out_a, out_b, out_j = [], [], []
            for a, b, ta, tb in zip(pdf["a"], pdf["b"], pdf["ta"], pdf["tb"]):
                sa, sb = _shingle_hashes(str(ta)), _shingle_hashes(str(tb))
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 0.0
                if j >= jaccard_threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(round(j, 6))
            yield pd.DataFrame(
                {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64"),
                 "jaccard": pd.Series(out_j, dtype="float64")}
            )

    return paired.mapInPandas(verify, "a long, b long, jaccard double")


# --------------------------------------------------------------------- simhash
def simhash_column(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens."""

    def kernel(it):
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in it:
            out_id, out_h = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = str(text).lower().split()
                if not toks:
                    out_id.append(did)
                    out_h.append(0)
                    continue
                hs = _mix64(
                    np.array([np.uint64(abs(hash_bytes(t))) for t in toks], dtype=np.uint64)
                )
                bits = ((hs[:, None] & bitcols[None, :]) != 0).astype(np.int64)
                v = bits.sum(axis=0) * 2 - len(toks)
                h = np.uint64(0)
                for i in range(64):
                    if v[i] > 0:
                        h |= bitcols[i]
                out_id.append(did)
                out_h.append(int(h.astype(np.int64)))
            yield pd.DataFrame(
                {"doc_id": pd.Series(out_id, dtype="int64"), "simhash": pd.Series(out_h, dtype="int64")}
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, "doc_id long, simhash long")


def hash_bytes(t: str) -> int:
    """Deterministic FNV-1a 64 of a token (no PYTHONHASHSEED dependence)."""
    h = 0xCBF29CE484222325
    for c in t.encode("utf-8"):
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(a, b, hamming) near-dup pairs via 4x16-bit band candidates +
    native bit_count verify.  By pigeonhole, hamming<=3 pairs share at
    least one of 4 bands exactly."""
    sh = simhash_column(docs, text_col, id_col)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key")))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
