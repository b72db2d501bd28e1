"""Similarity search over the embeddings table (array<float> column).

- brute_force_topk: baseline exact cosine top-k.  Query vectors are
  broadcast as one numpy matrix; a single mapInPandas pass computes the
  batch×query cosine block with one BLAS matmul (no per-row Python), then
  a window row_number takes top-k per query.  Cosines are rounded (6dp)
  so engines agree; ties broken by vec_id — this makes the ranking
  bit-deterministic and lets a plain-SQL oracle reproduce it.
- lsh_topk: the scale path — random-hyperplane (SimHash-for-cosine)
  signatures bucket candidates by band equi-join; exact cosine refine on
  candidates only.  Recall<1 by construction: tests compare against
  brute force with a recall floor, and the scale win is that the
  candidate join shuffles signature rows, never the vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DP = 6


def _collect_queries(embeddings: DataFrame, query_ids: list[int], id_col: str,
                     vec_col: str, normalize: bool = True):
    rows = (
        embeddings.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    )
    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    qm = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if qm.size == 0:
        return qids, qm.reshape(0, 0)
    if not normalize:
        return qids, qm
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    return qids, qn


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) exact top-k (self excluded)."""
    spark = embeddings.sparkSession
    qids, qn = _collect_queries(embeddings, query_ids, id_col, vec_col)
    bc = spark.sparkContext.broadcast((qids, qn))

    def kernel(it):
        qi, qv = bc.value
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                    "vec_id": pd.Series([], dtype="int64"),
                                    "cos_sim": pd.Series([], dtype="float64")})
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            mn = m / norms[:, None]
            block = mn @ qv.T  # (batch, nq)
            nb, nq = block.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qi[None, :], nb, axis=0).ravel(),
                    "vec_id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), nq),
                    "cos_sim": np.round(block.ravel(), ROUND_DP),
                }
            )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "query_id long, vec_id long, cos_sim double"
    ).filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(n_bits: int, dim: int, seed: int) -> np.ndarray:
    """The (n_bits, dim) random-hyperplane matrix — one function so the
    index side (hyperplane_signatures) and the query-side multi-probe
    key generator (_probe_keys) always agree bit-for-bit."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _probe_keys(
    qn: np.ndarray, planes: np.ndarray, bands: int, n_probes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Multi-probe key generation (Lv et al., "Multi-probe LSH",
    VLDB 2007 — public paper; pattern only, no code copied): for each
    (query, band), beside the base signature key, probe the buckets
    reached by flipping the lowest-|margin| bits — the hyperplanes the
    query sits closest to, i.e. the buckets its near neighbors most
    likely fell into.  Query-side only: the INDEX keeps one signature
    row per (vec, band), so recall rises with zero index-side cost.

    Returns parallel arrays (q_idx, band, key) covering base + probe
    keys.  Probes are ranked by summed flipped margin over all single-
    and double-bit flips (bits_per_band is small, so exhaustive
    enumeration of ≤ b + b(b-1)/2 candidates beats the paper's heap).
    """
    bits_per_band = planes.shape[0] // bands
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)
    proj = qn @ planes.T  # (nq, n_bits)
    bits = proj > 0
    margins = np.abs(proj)
    # candidate flip sets: all singles and pairs within a band
    singles = [(m,) for m in range(bits_per_band)]
    pairs = [
        (i, j) for i in range(bits_per_band) for j in range(i + 1, bits_per_band)
    ]
    flip_sets = singles + pairs
    flip_masks = np.array(
        [int(sum(weights[list(s)])) for s in flip_sets], dtype=np.int64
    )
    # (len(flip_sets), bits_per_band) 0/1 selector for margin sums
    sel = np.zeros((len(flip_sets), bits_per_band))
    for fi, s in enumerate(flip_sets):
        sel[fi, list(s)] = 1.0
    out_q, out_b, out_k = [], [], []
    nq = qn.shape[0]
    for b in range(bands):
        chunk_bits = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
        base = (chunk_bits.astype(np.int64) * weights[None, :]).sum(axis=1)
        out_q.append(np.arange(nq, dtype=np.int64))
        out_b.append(np.full(nq, b, dtype=np.int64))
        out_k.append(base)
        if n_probes <= 0:
            continue
        m = margins[:, b * bits_per_band : (b + 1) * bits_per_band]  # (nq, bpb)
        scores = m @ sel.T  # (nq, n_flip_sets): summed margin per flip set
        take = min(n_probes, len(flip_sets))
        top = np.argpartition(scores, take - 1, axis=1)[:, :take]  # smallest sums
        out_q.append(np.repeat(np.arange(nq, dtype=np.int64), take))
        out_b.append(np.full(nq * take, b, dtype=np.int64))
        out_k.append((base[:, None] ^ flip_masks[top]).ravel())
    return np.concatenate(out_q), np.concatenate(out_b), np.concatenate(out_k)


def hyperplane_signatures(
    embeddings: DataFrame, n_bits: int = 64, bands: int = 8, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """(vec_id, band, key) random-hyperplane LSH bucket rows."""
    spark = embeddings.sparkSession
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(n_bits, dim, seed)
    bc = spark.sparkContext.broadcast(planes)
    bits_per_band = n_bits // bands

    def kernel(it):
        pl = bc.value
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "band": pd.Series([], dtype="int32"),
                                    "key": pd.Series([], dtype="int64")})
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (m @ pl.T) > 0  # (batch, n_bits)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            frames = []
            for b in range(bands):
                chunk = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
                keys = (chunk.astype(np.int64) * weights[None, :]).sum(axis=1)
                frames.append(pd.DataFrame({"vec_id": ids, "band": np.int32(b), "key": keys}))
            yield pd.concat(frames, ignore_index=True)

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "vec_id long, band int, key long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 64,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    n_probes: int = 0,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates via band equi-join, exact refine.

    ``max_bucket`` (None = uncapped, the contract-exactness setting)
    drops signature buckets with more members before the refine — a
    degenerate hot bucket would otherwise flood the candidate set with
    bucket-size rows PER QUERY; capped vectors still reach queries
    through their other, more selective bands.

    ``n_probes`` > 0 enables query-side multi-probe (see _probe_keys):
    per band, the ``n_probes`` nearest-margin bit-flip buckets are
    probed in addition to the base bucket.  Candidate volume grows
    ~(1 + n_probes)x on the QUERY side only — the index signature table
    and its shuffle are unchanged, which is the whole point at corpus
    scale (the alternative, more bands, grows the index side too)."""
    sigs = hyperplane_signatures(
        embeddings, n_bits, bands, seed=seed, id_col=id_col, vec_col=vec_col
    )
    if n_probes > 0:
        spark = embeddings.sparkSession
        # RAW query vectors: the index kernel projects unnormalized
        # vectors, and sign + margin ORDERING are scale-invariant, so
        # skipping normalization gives bit-for-bit parity with the
        # kernel's base keys and avoids NaN margins on a zero vector.
        qids, qm = _collect_queries(embeddings, query_ids, id_col, vec_col,
                                    normalize=False)
        if len(qids) == 0:
            qi = qb = qk = np.empty(0, dtype=np.int64)
        else:
            qi, qb, qk = _probe_keys(
                qm, _hyperplanes(n_bits, qm.shape[1], seed), bands, n_probes
            )
        qs = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": qids[qi], "band": qb.astype(np.int32), "key": qk}
            ),
            schema="query_id long, band int, key long",
        ).distinct()
    else:
        qs = sigs.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"), "band", "key"
        )
    if max_bucket is not None:
        # bucket size = MEMBERSHIP of (band, key) in sigs, measured
        # BEFORE the query join (counting the joined result instead
        # would give members x queries_in_bucket and silently drop
        # under-cap buckets whenever several query ids share a band
        # key) — same semantics as _bucket_pairs / cosine_pairs_lsh
        sizes = sigs.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_bsz"))
        qs = (
            sizes.join(F.broadcast(qs), ["band", "key"])
            .filter(F.col("_bsz") <= max_bucket)
            .select("query_id", "band", "key")
        )
    joined = sigs.join(F.broadcast(qs), ["band", "key"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cand = joined.select("query_id", "vec_id").distinct()
    vecs = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qvecs = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    paired = cand.join(vecs, "vec_id").join(F.broadcast(qvecs), "query_id")

    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                    "vec_id": pd.Series([], dtype="int64"),
                                    "cos_sim": pd.Series([], dtype="float64")})
                continue
            a = np.array(list(pdf["v"]), dtype=np.float64)
            b = np.array(list(pdf["qv"]), dtype=np.float64)
            an = np.linalg.norm(a, axis=1)
            bn = np.linalg.norm(b, axis=1)
            an[an == 0] = 1.0
            bn[bn == 0] = 1.0
            cos = np.einsum("ij,ij->i", a, b) / (an * bn)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"],
                 "cos_sim": np.round(cos, ROUND_DP)}
            )

    scored = paired.mapInPandas(refine, "query_id long, vec_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------- embedding-cosine dedup
def _collect_normalized(embeddings: DataFrame, id_col: str, vec_col: str):
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    order = np.argsort(ids)
    return ids[order], (m / norms[:, None])[order]


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
    max_broadcast_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """(a, b, cos_sim) exact embedding-cosine near-duplicate pairs,
    a < b, cos_sim rounded to 6dp with the threshold applied to the
    ROUNDED value (engine-agnostic boundary).

    Physical shape: the normalized matrix is broadcast once; each Arrow
    batch computes its block row of the similarity matrix with ONE BLAS
    matmul against the broadcast side and emits only qualifying pairs —
    a block-distributed exact O(n^2/B) baseline with zero shuffles.
    Above ``max_broadcast_rows`` OR ``max_broadcast_bytes`` (rows x dim
    x 8 — a 2M-row, 1024-dim corpus is ~16 GB and must not pass a
    row-only guard) use ``cosine_pairs_lsh`` (candidates via hyperplane
    bands; the all-pairs matmul stops being the right tool before the
    broadcast stops fitting).
    """
    spark = embeddings.sparkSession
    agg = embeddings.select(
        F.count(F.lit(1)).alias("n"), F.max(F.size(vec_col)).alias("dim")
    ).first()
    n, dim = int(agg["n"]), int(agg["dim"] or 0)
    est_bytes = n * dim * 8
    if n > max_broadcast_rows or est_bytes > max_broadcast_bytes:
        raise ValueError(
            f"{n} rows x {dim} dims (~{est_bytes} B) exceed the exact-broadcast "
            f"budget ({max_broadcast_rows} rows / {max_broadcast_bytes} B); "
            "use cosine_pairs_lsh for the approximate scale path"
        )
    ids, mn = _collect_normalized(embeddings, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mn))

    def kernel(it):
        all_ids, all_m = bc.value
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                    "b": pd.Series([], dtype="int64"),
                                    "cos_sim": pd.Series([], dtype="float64")})
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            mn_b = m / norms[:, None]
            row_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.round(mn_b @ all_m.T, ROUND_DP)  # (batch, n)
            # keep i<j once: this block's row id must be the smaller one
            keep = (block >= threshold) & (row_ids[:, None] < all_ids[None, :])
            bi, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"a": row_ids[bi], "b": all_ids[bj], "cos_sim": block[bi, bj]}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "a long, b long, cos_sim double"
    )


def cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_bits: int = 128,
    bands: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs at scale: hyperplane-band candidates
    (one-shuffle bucketed pair emission — vectors never shuffle), exact
    cosine verify on candidates only.  Recall < 1 by construction;
    tests bound it against the exact operator.

    ``max_bucket`` drops signature buckets with more members (the
    standard too-common-to-discriminate cap: a degenerate bucket —
    e.g. every near-zero vector hashing alike — would emit ~m^2/2
    candidate pairs; capped members still pair through their other,
    rarer bands)."""
    from .dedup import _bucket_pairs

    sigs = hyperplane_signatures(embeddings, n_bits, bands, id_col=id_col, vec_col=vec_col)
    cand = _bucket_pairs(sigs, ["band", "key"], "vec_id", max_bucket=max_bucket)
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    paired = (
        cand.join(vecs.withColumnRenamed(id_col, "a").withColumnRenamed(vec_col, "va"), "a")
        .join(vecs.withColumnRenamed(id_col, "b").withColumnRenamed(vec_col, "vb"), "b")
    )

    def verify(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                    "b": pd.Series([], dtype="int64"),
                                    "cos_sim": pd.Series([], dtype="float64")})
                continue
            va = np.array(list(pdf["va"]), dtype=np.float64)
            vb = np.array(list(pdf["vb"]), dtype=np.float64)
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            cos = np.round(np.einsum("ij,ij->i", va, vb) / (na * nb), ROUND_DP)
            keep = cos >= threshold
            yield pd.DataFrame(
                {"a": pdf["a"].to_numpy(dtype=np.int64)[keep],
                 "b": pdf["b"].to_numpy(dtype=np.int64)[keep],
                 "cos_sim": cos[keep]}
            )

    return paired.mapInPandas(verify, "a long, b long, cos_sim double")


# ------------------------------------------------------------------ IVF ANN
def _assign_kernel_factory(bc, vec_col: str, id_col: str):
    def kernel(it):
        cents = bc.value  # (k, dim), L2-normalized
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "cluster": pd.Series([], dtype="int32")})
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cl = np.argmax((m / norms[:, None]) @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(dtype=np.int64), "cluster": cl}
            )

    return kernel


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 2,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer (the IVF codebook).

    Scale shape: each Lloyd iteration is ONE scan — an Arrow kernel
    assigns every vector to its nearest centroid and emits PER-BATCH
    partial (cluster, sum_vec, count) rows (map-side combine), which a
    tiny native groupBy folds with zip_with; only k rows reach the
    driver.  No vector ever shuffles.
    """
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    # deterministic init: k seed vectors by hash order (spread, seedable)
    init_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col) + seed))
        .limit(k)
        .collect()
    )
    cents = np.array([r[vec_col] for r in init_rows], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(it, _bc=bc):
            cs = _bc.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                m = np.array(list(pdf[vec_col]), dtype=np.float64)
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0] = 1.0
                mn = m / norms[:, None]
                cl = np.argmax(mn @ cs.T, axis=1)
                sums = np.zeros((len(cs), mn.shape[1]))
                np.add.at(sums, cl, mn)
                cnts = np.bincount(cl, minlength=len(cs))
                nz = np.nonzero(cnts)[0]
                yield pd.DataFrame(
                    {"cluster": nz.astype(np.int32),
                     "s": [sums[c].tolist() for c in nz],
                     "n": cnts[nz].astype(np.int64)}
                )

        agg = (
            embeddings.select(id_col, vec_col)
            .mapInPandas(partials, "cluster int, s array<double>, n long")
            .groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("s"),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("s"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in agg:
            v = np.array(r["s"], dtype=np.float64) / max(int(r["n"]), 1)
            nv = np.linalg.norm(v)
            if nv > 0:
                new[int(r["cluster"])] = v / nv
        cents = new
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors bucketed into inverted lists by the
    k-means codebook; each query probes its ``nprobe`` nearest lists and
    exact-refines only those candidates.  Recall < 1 by construction
    (bounded against brute force in tests); the scale win is that the
    candidate set is ~nprobe/n_centroids of the corpus and vectors join
    by a tiny broadcast probe table — no all-pairs work, no vector
    shuffle beyond the candidates."""
    spark = embeddings.sparkSession
    cents = kmeans_centroids(embeddings, n_centroids, iters, id_col=id_col, vec_col=vec_col)
    bc = spark.sparkContext.broadcast(cents)
    assign = embeddings.select(id_col, vec_col).mapInPandas(
        _assign_kernel_factory(bc, vec_col, id_col), "vec_id long, cluster int"
    )
    qids, qn = _collect_queries(embeddings, query_ids, id_col, vec_col)
    probe_rows = []
    sims = qn @ cents.T  # (nq, k)
    for qi, row in zip(qids, sims):
        for c in np.argsort(-row)[:nprobe]:
            probe_rows.append((int(qi), int(c)))
    probes = spark.createDataFrame(probe_rows, "query_id long, cluster int")
    cand = (
        assign.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    vecs = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    bq = spark.sparkContext.broadcast({int(i): v for i, v in zip(qids, qn)})

    def refine(it):
        qmap = bq.value
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                    "vec_id": pd.Series([], dtype="int64"),
                                    "cos_sim": pd.Series([], dtype="float64")})
                continue
            a = np.array(list(pdf["v"]), dtype=np.float64)
            an = np.linalg.norm(a, axis=1)
            an[an == 0] = 1.0
            b = np.array([qmap[int(q)] for q in pdf["query_id"]], dtype=np.float64)
            cos = np.einsum("ij,ij->i", a / an[:, None], b)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"],
                 "cos_sim": np.round(cos, ROUND_DP)}
            )

    scored = cand.join(vecs, "vec_id").mapInPandas(
        refine, "query_id long, vec_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
