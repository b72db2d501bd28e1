"""Spatial joins over the image fact table.

Two physical strategies, chosen by polygon-layer size:

1. ``pip_join_broadcast`` (the north-rule path): the polygon layer's
   cover intervals + geometries are collected ONCE, packed into numpy
   arrays (sorted-interval index, operators/interval_index.py) and a
   feature-id→geometry dict, broadcast to every executor, and consulted
   inside a single mapInPandas pass over the images: Morton encode
   (numpy) → interval searchsorted → exact even-odd refine, vectorized
   per feature over all its candidate points in the batch.  ZERO
   shuffles on the 10^12-row side; cost is one scan.

2. ``cell_equi_join`` (layer too big to broadcast): explode cover
   intervals into fixed-resolution grid cells, equi-join images'
   grid cell (native Column expr, codegen'd) against the cover-cell
   table, then refine candidates in an Arrow kernel.  The image side
   shuffles on the cell key — salted by AQE's skew-join splitting for
   hot cells.

Both produce identical (image_id, feature_id) rows; the tests assert
strategy-equivalence, and the equi-join path is what the DuckDB oracle
can check end-to-end (bbox variant) in __spark_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells
from ..geometry import core, wkb
from .interval_index import IntervalIndex


# Above this many estimated bytes the layer is NOT collected to the
# driver — pip_join_broadcast routes to cell_equi_join instead (a 10 GB
# layer would OOM the driver and swamp executor broadcast memory).
DEFAULT_MAX_BROADCAST_BYTES = 512 * 1024 * 1024


def _layer_cache_key(layer: DataFrame, *extra):
    """Memo key for per-layer derived state: (applicationId,
    semanticHash, *extra).  The applicationId component means a frame
    checkpointed under one SparkContext is never served to another
    (localCheckpoint blocks die with their context); entries from dead
    contexts are purged by ``_purge_dead_entries``.  Assumes the
    layer's underlying files are immutable while the session lives —
    the augdiff snapshot layout guarantees this (snapshots are
    write-once dirs); call ``invalidate_layer_caches()`` after
    overwriting a layer path in place."""
    try:
        return (layer.sparkSession.sparkContext.applicationId,
                layer.semanticHash(), *extra)
    except Exception:
        return None


def _purge_dead_entries(cache: dict, app_id: str) -> None:
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]


def invalidate_layer_caches() -> None:
    """Drop all per-layer memos (covers, prefilter cells, size
    estimates) — for callers that rewrite a layer's files in place."""
    _PREFILTER_CACHE.clear()
    _COVERS_CACHE.clear()
    _LAYER_BYTES_CACHE.clear()
    _GEOMS_CACHE.clear()


_LAYER_BYTES_CACHE: dict[tuple, int] = {}
_GEOMS_CACHE: dict[tuple, object] = {}


def estimate_layer_bytes(layer: DataFrame) -> int:
    """Cheap aggregate scan (layer side only): wkb bytes + ~32B/row of
    interval/id overhead.  Memoized per (app, layer): the layer is
    probed on every micro-batch, the size never changes mid-session."""
    key = _layer_cache_key(layer)
    if key is not None and key in _LAYER_BYTES_CACHE:
        return _LAYER_BYTES_CACHE[key]
    row = layer.select(
        (F.sum(F.length("geom_wkb")) + F.count(F.lit(1)) * 32).alias("b")
    ).first()
    out = int(row["b"] or 0)
    if key is not None:
        _purge_dead_entries(_LAYER_BYTES_CACHE, key[0])
        _LAYER_BYTES_CACHE[key] = out
    return out


# covers memo: a layer is joined against every minutely batch, so the
# exploded+distinct cover-cell set is built once per (layer, res) and
# the materialized (localCheckpoint'ed) frame reused — steady-state
# batches never re-pay the explode
_PREFILTER_CACHE: dict[tuple, tuple[DataFrame | None, int]] = {}


def _prefilter_covers(layer: DataFrame, prefilter_res: int, max_cells: int):
    key = _layer_cache_key(layer, prefilter_res)
    if key is not None:
        _purge_dead_entries(_PREFILTER_CACHE, key[0])
        if key in _PREFILTER_CACHE:
            return _PREFILTER_CACHE[key]
    res = prefilter_res
    covers = None
    while res >= 4:
        c = cover_cells_df(layer, res).select("cell").distinct()
        if c.count() <= max_cells:
            covers = c.localCheckpoint(eager=True)
            break
        res -= 2
    out = (covers, res)
    if key is not None:
        _PREFILTER_CACHE[key] = out
    return out


def collect_layer(layer: DataFrame):
    """Collect the polygon layer into broadcastable numpy structures."""
    rows = layer.select("feature_id", "geom_wkb", "cell_lo", "cell_hi").collect()
    fid = np.array([r["feature_id"] for r in rows], dtype=np.int64)
    lo = np.array([r["cell_lo"] for r in rows], dtype=np.int64)
    hi = np.array([r["cell_hi"] for r in rows], dtype=np.int64)
    geoms: dict[int, bytes] = {}
    for r in rows:
        geoms.setdefault(int(r["feature_id"]), bytes(r["geom_wkb"]))
    idx = IntervalIndex.build(fid, lo, hi)
    return idx, geoms


def _refine(pidx: np.ndarray, fids: np.ndarray, lon: np.ndarray, lat: np.ndarray, geoms: dict[int, bytes]):
    """Exact PIP refine, vectorized per candidate feature."""
    keep_p: list[np.ndarray] = []
    keep_f: list[int] = []
    out_p, out_f = [], []
    for f in np.unique(fids):
        sel = fids == f
        pts = pidx[sel]
        geom = wkb.loads(geoms[int(f)])
        if isinstance(geom, core.Polygon):
            inside = core.points_in_polygon(lon[pts], lat[pts], geom)
        else:
            inside = core.points_in_multipolygon(lon[pts], lat[pts], geom)
        hit = pts[inside]
        out_p.append(hit)
        out_f.append(np.full(len(hit), f, dtype=np.int64))
    if not out_p:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_p), np.concatenate(out_f)


def pip_join_broadcast(
    images: DataFrame,
    layer: DataFrame,
    id_col: str = "image_id",
    passthrough: list[str] | None = None,
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    equi_join_res: int = 12,
    prefilter_res: int | None = 14,
    max_prefilter_cells: int = 2_000_000,
) -> DataFrame:
    """(image_id, feature_id, *passthrough) via broadcast sorted-interval
    index.  ``passthrough`` columns ride along on hit rows so downstream
    stages (tile rollups etc.) never need to join back onto the
    10^12-row fact table — the whole join is one scan, zero fact-side
    shuffles.

    Prefilter: before any row crosses the Python boundary, a NATIVE
    broadcast left-semi join against the layer's distinct cover cells at
    ``prefilter_res`` drops every row that cannot hit any polygon (cover
    cells are supersets of the polygons).  The Arrow transport — the
    per-row cost floor of this path — then only pays for plausible
    candidates; everything else stays inside whole-stage codegen.  The
    resolution steps down automatically if the cover set would exceed
    ``max_prefilter_cells`` (broadcast budget); None disables.

    Guard: if the layer's estimated size exceeds ``max_broadcast_bytes``
    it is never collected to the driver — the join routes to
    ``cell_equi_join`` (shuffle-on-cell strategy) automatically.
    """
    spark = images.sparkSession
    if estimate_layer_bytes(layer) > max_broadcast_bytes:
        return cell_equi_join(images, layer, res=equi_join_res, id_col=id_col,
                              passthrough=passthrough,
                              max_geom_broadcast_bytes=max_broadcast_bytes)
    if prefilter_res is not None:
        covers, res = _prefilter_covers(layer, prefilter_res, max_prefilter_cells)
        if covers is not None:
            images = (
                images.withColumn(
                    "_pfcell", cells.morton_col(F.col("lon"), F.col("lat"), res)
                )
                .join(
                    F.broadcast(covers.withColumnRenamed("cell", "_pfcell")),
                    "_pfcell",
                    "left_semi",
                )
                .drop("_pfcell")
            )
    idx, geoms = collect_layer(layer)
    bc = spark.sparkContext.broadcast((idx, geoms))
    passthrough = passthrough or []
    # id dtype follows the input (string ids per input_hint; numeric
    # surrogates cut Arrow/pandas object churn ~4x on the hot path)
    id_type = images.schema[id_col].dataType.simpleString()
    pt_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in images.select(*passthrough).schema.fields
    )

    def kernel(it):
        # mapInArrow: RecordBatch in/out, numpy views zero-copy where the
        # type allows — no pandas materialization on the 10^12-row path
        import pyarrow as pa

        index, gd = bc.value
        for rb in it:
            lon = rb.column(rb.schema.get_field_index("lon")).to_numpy(zero_copy_only=False)
            lat = rb.column(rb.schema.get_field_index("lat")).to_numpy(zero_copy_only=False)
            m = cells.morton(lon, lat)
            pidx, fids = index.query(m)
            if len(pidx) == 0:
                hit_p = np.empty(0, dtype=np.int64)
                hit_f = np.empty(0, dtype=np.int64)
            else:
                hit_p, hit_f = _refine(pidx, fids, lon, lat, gd)
            arrays = [
                rb.column(rb.schema.get_field_index(id_col)).take(pa.array(hit_p)),
                pa.array(hit_f, type=pa.int64()),
            ]
            names = ["image_id", "feature_id"]
            for c in passthrough:
                arrays.append(rb.column(rb.schema.get_field_index(c)).take(pa.array(hit_p)))
                names.append(c)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    cols = [F.col(id_col), "lon", "lat"] + [F.col(c) for c in passthrough if c not in ("lon", "lat")]
    return images.select(*cols).mapInArrow(
        kernel, f"image_id {id_type}, feature_id long{pt_schema}"
    )


_COVERS_CACHE: dict[tuple, DataFrame] = {}


def cover_cells_df(layer: DataFrame, res: int) -> DataFrame:
    """Explode cover intervals into fixed-res cells: one row per
    (cell@res, feature_id, full) — the equi-join build side.  ``full``
    marks cells entirely inside the feature (no refine needed); a cell
    both full and boundary for the same feature keeps full=false.

    Memoized per (app, layer, res) and materialized: the layer side is
    joined against every minutely batch, so steady state never re-pays
    the explode+group (same rationale as the prefilter memo)."""
    key = _layer_cache_key(layer, res)
    if key is not None:
        _purge_dead_entries(_COVERS_CACHE, key[0])
        if key in _COVERS_CACHE:
            return _COVERS_CACHE[key]
    out = _cover_cells_df(layer, res)
    if key is not None:
        out = out.localCheckpoint(eager=True)
        _COVERS_CACHE[key] = out
    return out


def _cover_cells_df(layer: DataFrame, res: int) -> DataFrame:

    def kernel(it):
        shift = 2 * (cells.MAX_RES - res)
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"cell": pd.Series([], dtype="int64"),
                     "feature_id": pd.Series([], dtype="int64"),
                     "full": pd.Series([], dtype="bool")}
                )
                continue
            c0 = pdf["cell_lo"].to_numpy(dtype=np.int64) >> shift
            c1 = pdf["cell_hi"].to_numpy(dtype=np.int64) >> shift
            n = c1 - c0 + 1  # interval lengths at target res (>= 1)
            total = int(n.sum())
            # vectorized interval explosion: global position minus each
            # interval's exclusive prefix gives the within-interval step
            excl = np.concatenate([[0], np.cumsum(n)[:-1]])
            step = np.arange(total, dtype=np.int64) - np.repeat(excl, n)
            yield pd.DataFrame(
                {
                    "cell": np.repeat(c0, n) + step,
                    "feature_id": np.repeat(pdf["feature_id"].to_numpy(dtype=np.int64), n),
                    "full": np.repeat(pdf["cell_full"].to_numpy(dtype=bool), n),
                }
            )

    raw = layer.mapInPandas(kernel, "cell long, feature_id long, full boolean")
    # a boundary interval coarser than `res` can emit the same (cell,
    # feature) as a full interval; bool_and keeps the conservative flag
    return raw.groupBy("cell", "feature_id").agg(F.bool_and("full").alias("full"))


def cell_equi_join(
    images: DataFrame,
    layer: DataFrame,
    res: int = 12,
    id_col: str = "image_id",
    passthrough: list[str] | None = None,
    max_geom_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
) -> DataFrame:
    """(image_id, feature_id, *passthrough) via hybrid cell equi-join.

    The image-side cell is a native Column expression; candidates in
    FULL cover cells are exact hits and never leave the JVM; only the
    thin boundary band (cells the polygon edge crosses) flows through
    the Arrow refine kernel.  At 10^12 rows this keeps the Python path
    proportional to (perimeter x cell size), not to the polygon areas.

    Geometry transport for the refine is size-routed — this path is the
    "layer too big to broadcast" fallback, so it must never assume the
    layer fits anywhere:

    - layer <= ``max_geom_broadcast_bytes``: only the geometries of
      features that actually own a BOUNDARY cell are collected and
      broadcast (full-cell hits never need a geometry), and the cover
      table gets an explicit broadcast hint.
    - larger: NOTHING is collected to the driver.  Boundary candidates
      shuffle-join the (feature_id, geom_wkb) table on feature_id —
      the sort-merge join clusters each feature's candidates, so the
      refine kernel parses each distinct WKB once per Arrow batch.
      The cover join is left unhinted for AQE to pick a strategy from
      runtime sizes.
    """
    spark = images.sparkSession
    passthrough = passthrough or []
    covers = cover_cells_df(layer, res)
    broadcast_geoms = estimate_layer_bytes(layer) <= max_geom_broadcast_bytes
    id_type = images.schema[id_col].dataType.simpleString()
    pt_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in images.select(*passthrough).schema.fields
    )
    out_cols = [F.col(id_col).alias("image_id"), F.col("feature_id")] + [
        F.col(c) for c in passthrough
    ]

    img = images.select(F.col(id_col), "lon", "lat", *[c for c in passthrough if c not in ("lon", "lat")]).withColumn(
        "cell", cells.morton_col(F.col("lon"), F.col("lat"), res)
    )
    cand = img.join(F.broadcast(covers) if broadcast_geoms else covers, "cell")
    full_hits = cand.filter(F.col("full")).select(*out_cols)
    boundary = cand.filter(~F.col("full")).select(
        F.col(id_col), "lon", "lat", "feature_id", *[c for c in passthrough if c not in ("lon", "lat")]
    )

    if broadcast_geoms:
        # memoized per (app, layer, res): the layer side is joined
        # against every micro-batch — steady state must not re-collect
        # and re-broadcast the boundary geometries each batch
        key = _layer_cache_key(layer, res, "boundary_geoms")
        bc = None
        if key is not None:
            _purge_dead_entries(_GEOMS_CACHE, key[0])
            bc = _GEOMS_CACHE.get(key)
        if bc is None:
            boundary_fids = covers.filter(~F.col("full")).select("feature_id").distinct()
            geoms = {
                int(r["feature_id"]): bytes(r["geom_wkb"])
                for r in layer.select("feature_id", "geom_wkb")
                .join(F.broadcast(boundary_fids), "feature_id", "left_semi")
                .distinct()
                .collect()
            }
            bc = spark.sparkContext.broadcast(geoms)
            if key is not None:
                _GEOMS_CACHE[key] = bc

        def refine(it):
            gd = bc.value
            for pdf in it:
                lon = pdf["lon"].to_numpy(dtype=np.float64)
                lat = pdf["lat"].to_numpy(dtype=np.float64)
                fids = pdf["feature_id"].to_numpy(dtype=np.int64)
                pidx = np.arange(len(pdf))
                hit_p, hit_f = _refine(pidx, fids, lon, lat, gd)
                out = {"image_id": pdf[id_col].to_numpy()[hit_p], "feature_id": hit_f}
                for c in passthrough:
                    out[c] = pdf[c].to_numpy()[hit_p]
                yield pd.DataFrame(out)

        refined = boundary.mapInPandas(
            refine, f"image_id {id_type}, feature_id long{pt_schema}"
        )
        return full_hits.unionByName(refined)

    geom_tbl = layer.select("feature_id", "geom_wkb").distinct()
    with_geom = boundary.join(geom_tbl, "feature_id")

    def refine_shuffled(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            fids = pdf["feature_id"].to_numpy(dtype=np.int64)
            # per-batch geometry dict: the feature_id join clusters
            # rows by feature, so each WKB parses once per batch
            gd: dict[int, bytes] = {}
            for f, w in zip(fids, pdf["geom_wkb"]):
                if int(f) not in gd:
                    gd[int(f)] = bytes(w)
            pidx = np.arange(len(pdf))
            hit_p, hit_f = _refine(pidx, fids, lon, lat, gd)
            out = {"image_id": pdf[id_col].to_numpy()[hit_p], "feature_id": hit_f}
            for c in passthrough:
                out[c] = pdf[c].to_numpy()[hit_p]
            yield pd.DataFrame(out)

    refined = with_geom.mapInPandas(
        refine_shuffled, f"image_id {id_type}, feature_id long{pt_schema}"
    )
    return full_hits.unionByName(refined)
