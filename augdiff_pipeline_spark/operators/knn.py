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
) -> DataFrame:
    """(image_id, feature_id, knn_rank, dist_sq_deg) — exact kNN.

    Correctness bound: after gathering rings 0..r, a neighbor in ring
    r' > r is at least (r'-1) * cell_size away (Chebyshev ⇒ planar);
    expansion stops once k candidates exist AND the k-th best squared
    distance ≤ ((r) * cell_size)^2, i.e. no farther ring can improve.
    """
    spark = images.sparkSession
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
                        # guarantee distance >= (r)*cell_min for ring r+1
                        safe = (r * cell_min) ** 2
                        dx = fx[cand_idx][None, :] - plon[:, None]
                        dy = fy[cand_idx][None, :] - plat[:, None]
                        d2 = dx * dx + dy * dy
                        kth = np.sort(d2, axis=1)[:, min(k, d2.shape[1]) - 1]
                        if (kth <= safe).all():
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
