"""kNN join: each image matched to its k nearest feature points.

Grid-bucketed ring expansion (public cell-index kNN pattern; the role
H3 gridDisk/k-ring plays in the north star): feature points are bucketed
by grid cell at a fixed resolution and broadcast as cell-sorted numpy
arrays; a single mapInPandas pass over images then, PER DISTINCT IMAGE
CELL in the batch (distinct cells ≪ points), expands Chebyshev rings
until the k-th best distance is provably below the next ring's lower
bound, and scores all points of that cell against the gathered
candidates in one vectorized pass.

Distance is squared planar degrees — only +,-,* — deliberately chosen so
Spark, numpy, and the DuckDB oracle produce bit-identical orderings
(trig-based haversine differs in last-ulp across engines and flips ranks
on near-ties).  Ties broken by feature_id ascending, matching the SQL
oracle's ORDER BY (dist, feature_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells


# Above this many estimated feature-side bytes the feature table is NOT
# collected/broadcast — knn_join routes to the cell-bucketed shuffle
# strategy instead (same guard philosophy as spatial_join).
DEFAULT_MAX_BROADCAST_BYTES = 512 * 1024 * 1024


def estimate_feature_bytes(features: DataFrame) -> int:
    """Catalyst plan-size estimate (free, no job); falls back to a
    count-based estimate (24 B/row: id + lon + lat) if unavailable."""
    try:
        return int(features._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return int(features.count()) * 24


def collect_feature_points(features: DataFrame, res: int):
    """features: DataFrame[feature_id, lon, lat] → cell-sorted arrays."""
    rows = features.select("feature_id", "lon", "lat").collect()
    fid = np.array([r["feature_id"] for r in rows], dtype=np.int64)
    lon = np.array([r["lon"] for r in rows], dtype=np.float64)
    lat = np.array([r["lat"] for r in rows], dtype=np.float64)
    cell = cells.morton(lon, lat, res)
    order = np.argsort(cell, kind="stable")
    return cell[order], fid[order], lon[order], lat[order]


def _gather_cells(cell_sorted: np.ndarray, wanted: np.ndarray) -> np.ndarray:
    """Indices into the sorted feature arrays for all wanted cells."""
    lo = np.searchsorted(cell_sorted, wanted, side="left")
    hi = np.searchsorted(cell_sorted, wanted, side="right")
    n = hi - lo
    total = int(n.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    excl = np.concatenate([[0], np.cumsum(n)[:-1]])
    within = np.arange(total) - np.repeat(excl, n)
    return np.repeat(lo, n) + within


def knn_join(
    images: DataFrame,
    features: DataFrame,
    k: int = 3,
    res: int = 10,
    id_col: str = "image_id",
    max_rings: int = 64,
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
) -> DataFrame:
    """(image_id, feature_id, knn_rank, dist_sq_deg) — exact kNN.

    Correctness bound: after gathering rings 0..r, a neighbor in ring
    r' > r is at least (r'-1) * cell_size away (Chebyshev ⇒ planar);
    expansion stops once k candidates exist AND the k-th best squared
    distance ≤ ((r) * cell_size)^2, i.e. no farther ring can improve.

    Guard: a feature table above ``max_broadcast_bytes`` is never
    collected to the driver — the join routes to ``knn_join_shuffle``
    (cell-bucketed doubling-disk strategy, identical output).
    """
    spark = images.sparkSession
    if estimate_feature_bytes(features) > max_broadcast_bytes:
        # res=None: the shuffle path picks its own grid resolution from
        # feature density (the broadcast kernel's res suits an in-memory
        # ring walk, not a distributed bucket join)
        return knn_join_shuffle(images, features, k=k, id_col=id_col)
    fc, ff, flon, flat = collect_feature_points(features, res)
    bc = spark.sparkContext.broadcast((fc, ff, flon, flat))
    id_type = images.schema[id_col].dataType.simpleString()
    id_np = "object" if id_type == "string" else "int64"
    n_side = 1 << res
    cell_w = 360.0 / n_side  # lon degrees per cell (lat cells are 180/n — use the smaller bound)
    cell_h = 180.0 / n_side
    cell_min = min(cell_w, cell_h)

    def kernel(it):
        fcell, fid, fx, fy = bc.value
        for pdf in it:
            if len(pdf) == 0:
                yield _empty()
                continue
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            ids = pdf["image_id"].to_numpy()
            ix, iy = cells.lonlat_to_ixy(lon, lat, res)
            pcell = cells.interleave(ix, iy)
            parts: list[tuple] = []
            for c in np.unique(pcell):
                sel = np.nonzero(pcell == c)[0]
                cix, ciy = int(ix[sel[0]]), int(iy[sel[0]])
                plon, plat = lon[sel], lat[sel]
                # expand rings until provably complete for the WORST point
                cand_idx = np.empty(0, dtype=np.int64)
                d2 = None
                r = 0
                proven = False
                while r <= max_rings:
                    ring = cells.ring_cells(cix, ciy, res, r)
                    cand_idx = np.concatenate([cand_idx, _gather_cells(fcell, ring)])
                    if len(cand_idx) >= k:
                        # safe radius covered so far: (r) rings beyond own cell
                        # guarantee distance >= (r)*cell_min for ring r+1.
                        # STRICT inequality: an unseen feature can sit at
                        # exactly the bound (grid-aligned layouts) and win
                        # the (dist, feature_id) tie-break — ties defer to
                        # the next ring instead of claiming proven.
                        safe = (r * cell_min) ** 2
                        dx = fx[cand_idx][None, :] - plon[:, None]
                        dy = fy[cand_idx][None, :] - plat[:, None]
                        d2 = dx * dx + dy * dy
                        kth = np.sort(d2, axis=1)[:, min(k, d2.shape[1]) - 1]
                        if (kth < safe).all():
                            proven = True
                            break
                        d2 = None
                    r += 1
                if not proven:
                    # ring budget exhausted without a proven-exact bound
                    # (sparse feature layout, or fewer than k features):
                    # score the FULL broadcast feature array — it is
                    # already in memory, so exactness costs one matmul
                    # for this (rare) cell instead of dropped rows.
                    cand_idx = np.arange(len(fid), dtype=np.int64)
                    d2 = None
                if len(cand_idx) == 0:
                    continue  # feature table itself is empty
                if d2 is None:
                    dx = fx[cand_idx][None, :] - plon[:, None]
                    dy = fy[cand_idx][None, :] - plat[:, None]
                    d2 = dx * dx + dy * dy
                cf = fid[cand_idx]
                # rank by (distance, feature_id) — lexsort is ascending
                order = np.lexsort((np.broadcast_to(cf, d2.shape), d2), axis=1)[:, :k]
                kk = order.shape[1]
                parts.append(
                    (
                        np.repeat(ids[sel], kk),                       # point-major
                        cf[order].ravel(),
                        np.tile(np.arange(1, kk + 1, dtype=np.int32), len(sel)),
                        np.take_along_axis(d2, order, axis=1).ravel(),
                    )
                )
            if not parts:
                yield _empty()
                continue
            yield pd.DataFrame(
                {
                    "image_id": np.concatenate([p[0] for p in parts]),
                    "feature_id": np.concatenate([p[1] for p in parts]).astype(np.int64),
                    "knn_rank": np.concatenate([p[2] for p in parts]),
                    "dist_sq_deg": np.concatenate([p[3] for p in parts]),
                }
            )

    def _empty():
        return pd.DataFrame(
            {
                "image_id": pd.Series([], dtype=id_np),
                "feature_id": pd.Series([], dtype="int64"),
                "knn_rank": pd.Series([], dtype="int32"),
                "dist_sq_deg": pd.Series([], dtype="float64"),
            }
        )

    return images.select(F.col(id_col).alias("image_id"), "lon", "lat").mapInPandas(
        kernel, f"image_id {id_type}, feature_id long, knn_rank int, dist_sq_deg double"
    )


def _score_topk(cand: DataFrame, k: int, safe_sq: float | None):
    """Rank candidates per image by (dist, feature_id); return
    (topk_rows, proven_image_ids).  ``proven`` means the image has >= k
    candidates and its k-th best distance is within the round's safe
    radius (no unseen feature can beat it); safe_sq=None marks the
    exhaustive round (everything proven)."""
    from pyspark.sql import Window

    dist = (
        (F.col("flon") - F.col("lon")) * (F.col("flon") - F.col("lon"))
        + (F.col("flat") - F.col("lat")) * (F.col("flat") - F.col("lat"))
    )
    scored = cand.withColumn("dist_sq_deg", dist)
    w = Window.partitionBy("image_id").orderBy("dist_sq_deg", "feature_id")
    wu = Window.partitionBy("image_id")
    ranked = (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(wu))
        .withColumn(
            "_kth",
            F.max(F.when(F.col("knn_rank") <= k, F.col("dist_sq_deg"))).over(wu),
        )
    )
    if safe_sq is None:
        proven = ranked.select("image_id").distinct()
    else:
        # strict <: a k-th candidate at EXACTLY the safe bound can tie
        # with an unseen feature that would win the (dist, feature_id)
        # tie-break — defer ties to a later round (negligible cost)
        proven = (
            ranked.filter((F.col("_cnt") >= k) & (F.col("_kth") < F.lit(safe_sq)))
            .select("image_id")
            .distinct()
        )
    topk = (
        ranked.filter(F.col("knn_rank") <= k)
        .join(proven, "image_id", "left_semi")
        .select("image_id", "feature_id",
                F.col("knn_rank").cast("int").alias("knn_rank"), "dist_sq_deg")
    )
    return topk, proven


_AUTO_RES_MAX = 22
_KNN_RES_CACHE: dict[tuple, int] = {}


def _pick_shuffle_res(features: DataFrame, max_bucket: int = 64) -> int:
    """Finest-data-aware grid resolution: the COARSEST res whose
    largest feature bucket holds <= max_bucket points.

    Resolution is the make-or-break knob of a bucketed kNN: too coarse
    and one dense cell puts ~bucket_size candidates on EVERY image in
    it (candidate volume ~ images x bucket — measured catastrophic);
    too fine and sparse regions need many expansion rounds.  One
    aggregate builds the res-22 cell histogram; coarser levels derive
    from it by shifting (log-many tiny jobs, no rescans of the
    feature table).  Memoized per (app, features-plan): a static
    feature layer joined every micro-batch pays the histogram once."""
    from .spatial_join import _layer_cache_key, _purge_dead_entries

    key = _layer_cache_key(features, max_bucket, "knn_res")
    if key is not None:
        _purge_dead_entries(_KNN_RES_CACHE, key[0])
        if key in _KNN_RES_CACHE:
            return _KNN_RES_CACHE[key]
    base = features.groupBy(
        cells.morton_col(F.col("lon"), F.col("lat"), _AUTO_RES_MAX).alias("c")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    for r in range(8, _AUTO_RES_MAX + 1, 2):
        shift = 2 * (_AUTO_RES_MAX - r)
        m = (
            base.groupBy(F.shiftrightunsigned(F.col("c"), shift).alias("cc"))
            .agg(F.sum("n").alias("n"))
            .agg(F.max("n").alias("m"))
            .first()["m"]
        )
        if m is not None and m <= max_bucket:
            if key is not None:
                _KNN_RES_CACHE[key] = r
            return r
    if key is not None:
        _KNN_RES_CACHE[key] = _AUTO_RES_MAX
    return _AUTO_RES_MAX


def knn_join_shuffle(
    images: DataFrame,
    features: DataFrame,
    k: int = 3,
    res: int | None = None,
    id_col: str = "image_id",
    rounds: tuple[int, ...] = (1, 3, 7, 15),
) -> DataFrame:
    """Exact kNN with NO driver-side feature state — the 100-TB-path
    twin of ``knn_join`` (identical output, plan-tested).

    Doubling-disk rounds, all native DataFrame ops:

    - Round 0 (disk radius 1): FEATURES register into their 3x3
      neighbor cells (feature-side explode x9) and equi-join every
      image's cell — one shuffle keyed by cell, AQE-salted for hot
      cells.  Per image, a window ranks candidates by (dist,
      feature_id); an image is DONE (proven exact, same bound as the
      broadcast kernel) when it has >= k candidates and its k-th
      distance <= (r * cell_min)^2.
    - Later rounds r in {3, 7, 15}: only the unproven remainder (tiny
      in practice) explodes image-side into its (2r+1)^2 disk cells
      and equi-joins the bucketed features.
    - Guarded tail: anything still unproven (sparse layouts / fewer
      than k features) continues with GEOMETRICALLY DOUBLING disk
      radii, each realized as a broadcast-nested-loop join: the
      remainder is COUNTED, hash-sliced to the broadcast budget if
      needed, broadcast, and joined to the streamed feature table
      under a Chebyshev-box predicate — the feature table is filtered
      at scan time and NEVER cross-joined (no CartesianProduct node;
      plan-tested).  The final round's box provably covers the whole
      grid, so exactness is never traded for the bound.

    Rankings use the same squared-planar-degree distance and
    (dist, feature_id) tie-break as every other engine twin.

    ``res=None`` (default) picks the grid resolution from the feature
    table's measured cell density (see ``_pick_shuffle_res``) — the
    fixed-res form is exact at any res, but a res mismatched to the
    density either floods the candidate join (dense buckets) or
    multiplies expansion rounds (sparse ones).
    """
    if res is None:
        res = _pick_shuffle_res(features)
    n_side = 1 << res
    cell_min = min(360.0 / n_side, 180.0 / n_side)
    id_type = images.schema[id_col].dataType.simpleString()

    feats = features.select(
        F.col("feature_id"),
        F.col("lon").alias("flon"),
        F.col("lat").alias("flat"),
    )
    fix, fiy = cells.ixy_col(F.col("flon"), F.col("flat"), res)
    feats = feats.withColumn("_fix", fix).withColumn("_fiy", fiy).withColumn(
        "fcell", cells.interleave_col(F.col("_fix"), F.col("_fiy"))
    )

    imgs = images.select(F.col(id_col).alias("image_id"), "lon", "lat")
    iix, iiy = cells.ixy_col(F.col("lon"), F.col("lat"), res)
    imgs = imgs.withColumn("_ix", iix).withColumn("_iy", iiy).withColumn(
        "cell", cells.interleave_col(F.col("_ix"), F.col("_iy"))
    )

    out_schema = ["image_id", "feature_id", "knn_rank", "dist_sq_deg"]
    parts: list[DataFrame] = []

    # round 0: feature-side 3x3 registration
    r0 = rounds[0]
    reg = (
        feats.withColumn("_dx", F.explode(F.sequence(F.lit(-r0), F.lit(r0))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r0), F.lit(r0))))
        .withColumn("_rx", F.col("_fix") + F.col("_dx"))
        .withColumn("_ry", F.col("_fiy") + F.col("_dy"))
        .filter(
            (F.col("_rx") >= 0) & (F.col("_rx") < n_side)
            & (F.col("_ry") >= 0) & (F.col("_ry") < n_side)
        )
        .select(
            "feature_id", "flon", "flat",
            cells.interleave_col(F.col("_rx"), F.col("_ry")).alias("cell"),
        )
    )
    cand = imgs.join(reg, "cell")
    topk, proven = _score_topk(cand, k, (r0 * cell_min) ** 2)
    parts.append(topk)
    remaining = imgs.join(proven, "image_id", "left_anti").localCheckpoint(eager=True)

    feats_b = feats.select("feature_id", "flon", "flat", "fcell")
    for r in rounds[1:]:
        if remaining.isEmpty():
            break
        disk = (
            remaining.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("_rx", F.col("_ix") + F.col("_dx"))
            .withColumn("_ry", F.col("_iy") + F.col("_dy"))
            .filter(
                (F.col("_rx") >= 0) & (F.col("_rx") < n_side)
                & (F.col("_ry") >= 0) & (F.col("_ry") < n_side)
            )
            .select(
                "image_id", "lon", "lat",
                cells.interleave_col(F.col("_rx"), F.col("_ry")).alias("fcell"),
            )
        )
        cand = disk.join(feats_b, "fcell")
        topk, proven = _score_topk(cand, k, (r * cell_min) ** 2)
        parts.append(topk)
        remaining = remaining.join(proven, "image_id", "left_anti").localCheckpoint(eager=True)

    # guarded tail: doubling-radius broadcast-nested-loop rounds.  The
    # unproven remainder exists precisely when the feature side was too
    # big to broadcast, so a plain crossJoin(features) here would be a
    # remainder x 100-TB cartesian.  Instead each round broadcasts the
    # (counted, sliced-to-budget) remainder and streams the feature
    # table once under a Chebyshev-box join predicate — candidates are
    # filtered AT THE SCAN, and the box eventually covers the grid, at
    # which point everything ranks as proven (safe=None).
    feats_box = feats.select("feature_id", "flon", "flat", "_fix", "_fiy")
    tail_r = rounds[-1]
    max_tail_broadcast_rows = 2_000_000  # ~80 MB of (id, lon, lat, ix, iy)
    while not remaining.isEmpty():
        # x4 growth: each tail round streams the feature table once, so
        # fewer/larger rounds beat doubling (worst-case scan count is
        # log4(n_side) ~ 9 at res 22) while the box area overshoots the
        # minimal proving radius by at most 16x
        tail_r = min(4 * tail_r + 3, n_side)
        covers = tail_r >= n_side  # box [-r, r] spans every cell index
        safe = None if covers else (tail_r * cell_min) ** 2
        cnt = remaining.count()
        n_slices = max(1, -(-cnt // max_tail_broadcast_rows))
        box = (
            (F.abs(F.col("_fix") - F.col("_ix")) <= F.lit(tail_r))
            & (F.abs(F.col("_fiy") - F.col("_iy")) <= F.lit(tail_r))
        )
        new_proven = []
        for s in range(n_slices):
            part = (
                remaining if n_slices == 1
                else remaining.filter(
                    F.pmod(F.xxhash64(F.col("image_id")), F.lit(n_slices)) == s
                )
            )
            cand = F.broadcast(
                part.select("image_id", "lon", "lat", "_ix", "_iy")
            ).join(feats_box, box).select(
                "image_id", "lon", "lat", "feature_id", "flon", "flat"
            )
            topk, proven = _score_topk(cand, k, safe)
            parts.append(topk)
            new_proven.append(proven)
        if covers:
            break
        proven_all = new_proven[0]
        for p in new_proven[1:]:
            proven_all = proven_all.unionByName(p)
        remaining = remaining.join(
            proven_all, "image_id", "left_anti"
        ).localCheckpoint(eager=True)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("image_id").cast(id_type).alias("image_id"),
        "feature_id",
        "knn_rank",
        "dist_sq_deg",
    )
