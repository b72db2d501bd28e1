"""Deduplication operators over the documents table.

- exact_dedup: hash-groupBy on a normalized fingerprint (md5) — fully
  native, shuffles once on the 128-bit key.
- minhash_lsh_pairs: char-shingle MinHash + banded LSH: one Arrow kernel
  emits (doc_id, band, band_hash) rows (numpy multiply-shift hashing —
  deterministic across executors, no Python ``hash``); a self-join on
  (band, band_hash) yields candidate pairs; an exact n-gram Jaccard
  kernel verifies.  The self-join shuffles only signature rows
  (docs × bands), never document text.  The signature kernel is fully
  vectorized across the batch (concatenated-buffer sliding-window
  hashing + per-salt ``minimum.reduceat``) — no per-doc Python loop.
  Default band/row split (128 perms, 64 bands of 2 rows) makes the
  per-pair miss probability at Jaccard s: (1 - s^2)^64 — ≤ 1e-8 at
  s = 0.5 — so at the verify threshold the output equals the exact
  brute-force pair set and a DuckDB brute-force oracle checks it
  end-to-end.
- simhash_column / simhash_pairs: 64-bit SimHash computed ENTIRELY in
  native Spark SQL (whole-stage codegen, zero Python): token hash is the
  low 64 bits of md5 (reproducible in any engine), bit-vote via
  higher-order aggregate/zip_with.  Candidate bands are derived from the
  threshold — bands = max_hamming + 1 — so by pigeonhole every pair with
  hamming ≤ max_hamming shares at least one exact band: the candidate
  stage is lossless and the output is exactly the brute-force pair set,
  verified by a DuckDB oracle.
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
_FNV_P = np.uint64(1099511628211)


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
        acc = acc * _FNV_P + a[i : i + k]
    return np.unique(_mix64(acc))


def _batch_shingle_hashes(texts: list[str], n: int = 5) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``_shingle_hashes`` over a whole batch.

    Returns (hashes, offsets, counts): per-doc-unique shingle hashes
    concatenated doc-major, segment start offsets, and per-doc counts.
    One sliding-window pass over the concatenated byte buffer — no
    per-doc Python loop beyond the encode.
    """
    enc = []
    for t in texts:
        b = str(t).lower().encode("utf-8")
        if len(b) < n:
            b = b + b" " * (n - len(b))
        enc.append(b)
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    k_per_doc = lens - n + 1
    total = int(k_per_doc.sum())
    kexcl = np.concatenate([[0], np.cumsum(k_per_doc)[:-1]])
    # global byte position of each window start
    pos = np.arange(total, dtype=np.int64) - np.repeat(kexcl, k_per_doc) + np.repeat(doc_starts, k_per_doc)
    acc = np.zeros(total, dtype=np.uint64)
    for i in range(n):
        acc = acc * _FNV_P + buf[pos + i]
    hv = _mix64(acc)
    di = np.repeat(np.arange(len(texts), dtype=np.int64), k_per_doc)
    # per-doc unique: sort by (doc, hash), drop repeats within a doc
    order = np.lexsort((hv, di))
    hv_s, di_s = hv[order], di[order]
    keep = np.ones(total, dtype=bool)
    keep[1:] = (hv_s[1:] != hv_s[:-1]) | (di_s[1:] != di_s[:-1])
    hv_u, di_u = hv_s[keep], di_s[keep]
    cnts = np.bincount(di_u, minlength=len(texts)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    return hv_u, offs, cnts


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


def minhash_bands(docs: DataFrame, num_perm: int = 128, bands: int = 64,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, band_hash) — the LSH bucket rows."""
    rows_per_band = num_perm // bands
    salts = _salts(num_perm, 1)

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
            hv, offs, _ = _batch_shingle_hashes(list(pdf[text_col]))
            # signature matrix: one vectorized pass per salt over ALL
            # shingles in the batch (segments never empty: padding
            # guarantees ≥1 shingle per doc)
            sigs = np.empty((n, num_perm), dtype=np.uint64)
            for j in range(num_perm):
                sigs[:, j] = np.minimum.reduceat(_mix64(hv ^ salts[j]), offs)
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


def minhash_lsh_pairs(docs: DataFrame, num_perm: int = 128, bands: int = 64,
                      jaccard_threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(a, b, jaccard) verified near-duplicate pairs, a < b.

    ``jaccard`` is the EXACT shingle-set Jaccard (the LSH only proposes
    candidates); emitted as a raw IEEE division of two integers so any
    engine recomputing it from the same shingle sets matches bit-for-bit.
    """
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
            cache: dict[int, np.ndarray] = {}

            def sh(doc, txt):
                s = cache.get(doc)
                if s is None:
                    s = cache[doc] = _shingle_hashes(str(txt))
                return s

            for a, b, ta, tb in zip(pdf["a"], pdf["b"], pdf["ta"], pdf["tb"]):
                sa, sb = sh(int(a), ta), sh(int(b), tb)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 0.0
                if j >= jaccard_threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(j)
            yield pd.DataFrame(
                {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64"),
                 "jaccard": pd.Series(out_j, dtype="float64")}
            )

    return paired.mapInPandas(verify, "a long, b long, jaccard double")


# --------------------------------------------------------------------- simhash
# Native-SQL SimHash: token hash = low 64 bits of md5(token), bit b of
# the simhash is 1 iff sum over tokens of (bit b set ? +1 : -1) > 0.
# All higher-order functions — whole-stage codegen, no shuffle, no
# Python; bit assembly uses bitwise-or (ANSI-safe, no overflow).
_TOKENS = "filter(split(lower({col}), '\\\\s+'), t -> t != '')"
_TOK_HASH = (
    "shiftleft(cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint), 32) | "
    "cast(conv(substr(md5(t), 9, 8), 16, 10) as bigint)"
)
_BIT_VOTES = (
    "aggregate(transform({tokens}, t -> {tok_hash}), array_repeat(0, 64), "
    "(acc, hv) -> zip_with(acc, sequence(0, 63), "
    "(a, b) -> a + IF((shiftrightunsigned(hv, b) & 1) = 1, 1, -1)))"
)
_FOLD_BITS = (
    "aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) -> "
    "acc | IF(element_at({votes}, b + 1) > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
)


def simhash_expr(text_col: str) -> F.Column:
    """64-bit SimHash of a text column as a single native expression."""
    votes = _BIT_VOTES.format(
        tokens=_TOKENS.format(col=text_col), tok_hash=_TOK_HASH
    )
    return F.expr(_FOLD_BITS.format(votes=votes))


def simhash_column(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens.

    Two-step select so the 64-vote array materializes once per row
    instead of once per output bit.
    """
    votes = _BIT_VOTES.format(tokens=_TOKENS.format(col=text_col), tok_hash=_TOK_HASH)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.expr(votes).alias("_votes"))
        .select("doc_id", F.expr(_FOLD_BITS.format(votes="_votes")).alias("simhash"))
    )


def _band_splits(bits: int, bands: int) -> list[tuple[int, int]]:
    """(offset, width) for each of ``bands`` near-equal bit bands."""
    base, extra = divmod(bits, bands)
    out, off = [], 0
    for i in range(bands):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(a, b, hamming) near-dup pairs via lossless banded candidates +
    native bit_count verify.

    bands = max_hamming + 1: by pigeonhole, any pair with hamming ≤
    max_hamming has at least one band with ZERO differing bits, so the
    band equi-join proposes every qualifying pair — the result is exactly
    the brute-force pair set (DuckDB-oracle checkable).  All stages are
    JVM-native; the self-join shuffles (docs × bands) short rows.
    """
    if max_hamming >= 64:
        raise ValueError("max_hamming must be < 64")
    bands = max_hamming + 1
    # token-less docs (empty/whitespace text) carry no signal: a
    # brute-force oracle derives no simhash row for them, so they are
    # excluded from pairing rather than all colliding at simhash=0
    docs = docs.filter(
        F.expr(f"size({_TOKENS.format(col=text_col)}) > 0")
    )
    sh = simhash_column(docs, text_col, id_col)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), off)
                    .bitwiseAND(F.lit((1 << w) - 1)).alias("key"),
                )
                for i, (off, w) in enumerate(_band_splits(64, bands))
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
