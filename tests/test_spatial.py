"""Spatial layer: cover/index invariants, PIP join strategy equivalence
vs brute force, kNN vs brute force, tiling + image fidelity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from augdiff_pipeline_spark import fixtures
from augdiff_pipeline_spark.functions import cells
from augdiff_pipeline_spark.geometry import core, wkb
from augdiff_pipeline_spark.operators import images as imgcodec
from augdiff_pipeline_spark.operators.cover import polygon_cover
from augdiff_pipeline_spark.operators.interval_index import IntervalIndex
from augdiff_pipeline_spark.operators.knn import knn_join
from augdiff_pipeline_spark.operators.spatial_join import cell_equi_join, pip_join_broadcast
from augdiff_pipeline_spark.operators.tiling import assign_tiles, cut_tiles
from augdiff_pipeline_spark.plans.polygon_layer import build_polygon_layer

N_IMG = 4000


@pytest.fixture(scope="module")
def layer(spark):
    state = fixtures.base_state_df(spark)
    return build_polygon_layer(spark, state, max_res=14, min_res=4).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(
        fixtures.image_rows(N_IMG)[["image_id", "lat", "lon"]]
    ).localCheckpoint(eager=True)


def test_interval_index_matches_naive():
    rng = np.random.default_rng(7)
    lo = rng.integers(0, 1000, 200)
    hi = lo + rng.integers(0, 50, 200)
    fid = rng.integers(1, 20, 200)
    idx = IntervalIndex.build(fid, lo, hi)
    pts = rng.integers(-10, 1100, 500)
    pidx, fids = idx.query(pts)
    got = set(zip(pidx.tolist(), fids.tolist()))
    want = {
        (i, int(f))
        for i, p in enumerate(pts)
        for f, l, h in zip(fid, lo, hi)
        if l <= p <= h
    }
    assert got == want


def test_cover_is_superset():
    poly = core.Polygon(
        (
            np.array([[10.05, 50.05], [10.08, 50.05], [10.08, 50.08], [10.05, 50.08], [10.05, 50.05]]),
            np.array([[10.06, 50.06], [10.07, 50.06], [10.07, 50.07], [10.06, 50.07], [10.06, 50.06]]),
        )
    )
    lo, hi, full = polygon_cover(poly, max_res=16, min_res=4)
    assert len(lo) > 0 and (lo[1:] > hi[:-1]).all()  # sorted, disjoint
    assert full.any() and (~full).any()  # both interior and boundary cells
    rng = np.random.default_rng(11)
    px = rng.uniform(10.04, 10.09, 3000)
    py = rng.uniform(50.04, 50.09, 3000)
    inside = core.points_in_polygon(px, py, poly)
    m = cells.morton(px, py)
    pos = np.searchsorted(lo, m, side="right") - 1
    covered = (pos >= 0) & (m <= hi[np.clip(pos, 0, len(hi) - 1)])
    assert (covered[inside]).all()  # every inside point is covered
    # every point in a FULL interval is truly inside (exactness of the
    # JVM-only fast path)
    in_full = covered & full[np.clip(pos, 0, len(full) - 1)]
    assert inside[in_full].all()


def test_polygon_layer_contents(spark, layer):
    kinds = {
        (r["feature_id"] >> 2, r["kind"])
        for r in layer.select("feature_id", "kind").distinct().collect()
    }
    assert (2000, "way") in kinds       # building polygon
    assert (3000, "relation") in kinds  # multipolygon
    assert all(k != 2001 for k, _ in kinds)  # closed highway is a Line, not area
    g = wkb.loads(
        bytes(layer.filter(F.col("feature_id") == (3000 << 2 | 2)).first()["geom_wkb"])
    )
    assert isinstance(g, core.Polygon) and len(g.rings) == 2


def brute_force_pip(layer_rows, pts):
    geoms = {}
    for r in layer_rows:
        geoms.setdefault(int(r["feature_id"]), wkb.loads(bytes(r["geom_wkb"])))
    out = set()
    lon = pts["lon"].to_numpy()
    lat = pts["lat"].to_numpy()
    ids = pts["image_id"].to_numpy()
    for fid, g in geoms.items():
        if isinstance(g, core.Polygon):
            inside = core.points_in_polygon(lon, lat, g)
        else:
            inside = core.points_in_multipolygon(lon, lat, g)
        for i in np.nonzero(inside)[0]:
            out.add((ids[i], fid))
    return out


def test_pip_join_strategies_match_bruteforce(spark, layer, images):
    pts = images.toPandas()
    expected = brute_force_pip(layer.collect(), pts)
    got_b = {
        (r["image_id"], r["feature_id"]) for r in pip_join_broadcast(images, layer).collect()
    }
    got_e = {
        (r["image_id"], r["feature_id"]) for r in cell_equi_join(images, layer, res=12).collect()
    }
    assert got_b == expected
    assert got_e == expected
    assert len(expected) > 100  # fixture actually exercises the join


def test_hybrid_join_with_full_cells(spark, images):
    """Finer cover → interior candidates take the JVM-only fast path;
    result must still match brute force exactly."""
    state = fixtures.base_state_df(spark)
    layer16 = build_polygon_layer(spark, state, max_res=16, min_res=4).localCheckpoint(eager=True)
    assert layer16.filter("cell_full").count() > 0  # fast path exercised
    pts = images.toPandas()
    expected = brute_force_pip(layer16.collect(), pts)
    got = {
        (r["image_id"], r["feature_id"])
        for r in cell_equi_join(images, layer16, res=15).collect()
    }
    assert got == expected


def test_knn_matches_bruteforce(spark, images):
    # feature points: the fixture node coordinates
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "feature_id": list(fixtures.NODE_COORDS.keys()),
                "lon": [c[0] for c in fixtures.NODE_COORDS.values()],
                "lat": [c[1] for c in fixtures.NODE_COORDS.values()],
            }
        )
    )
    k = 3
    got = knn_join(images, feats, k=k, res=10).toPandas()
    pts = images.toPandas()
    fl = np.array([c[0] for c in fixtures.NODE_COORDS.values()])
    fa = np.array([c[1] for c in fixtures.NODE_COORDS.values()])
    fi = np.array(list(fixtures.NODE_COORDS.keys()))
    for _, r in pts.sample(100, random_state=0).iterrows():
        d2 = (fl - r["lon"]) ** 2 + (fa - r["lat"]) ** 2
        order = np.lexsort((fi, d2))[:k]
        mine = got[got["image_id"] == r["image_id"]].sort_values("knn_rank")
        assert list(mine["feature_id"]) == list(fi[order]), r["image_id"]
    # every image got exactly k rows
    counts = got.groupby("image_id").size()
    assert (counts == k).all() and len(counts) == N_IMG


def test_knn_sparse_features_no_silent_drop(spark):
    """Features farther than max_rings cells from the query points: ring
    expansion exhausts its budget; every point must STILL get its exact
    k matches via the full-scan fallback (round-1 bug: points vanished)."""
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": ["p0", "p1"], "lon": [0.0, 0.1], "lat": [0.0, 0.1]})
    )
    # at res=10 a cell is ~0.35 deg wide; 64 rings ≈ 22 deg — put the
    # features 60+ degrees away and on the other side of the world
    feats = spark.createDataFrame(
        pd.DataFrame(
            {"feature_id": [1, 2, 3], "lon": [120.0, -150.0, 60.0], "lat": [70.0, -80.0, -60.0]}
        )
    )
    got = knn_join(pts, feats, k=2, res=10, max_rings=4).toPandas()
    assert sorted(got["image_id"].unique()) == ["p0", "p1"]
    for pid, plon, plat in [("p0", 0.0, 0.0), ("p1", 0.1, 0.1)]:
        d2 = {f: (lo - plon) ** 2 + (la - plat) ** 2
              for f, lo, la in [(1, 120.0, 70.0), (2, -150.0, -80.0), (3, 60.0, -60.0)]}
        want = sorted(d2, key=lambda f: (d2[f], f))[:2]
        mine = got[got["image_id"] == pid].sort_values("knn_rank")["feature_id"].tolist()
        assert mine == want, (pid, mine, want)


def test_knn_k_exceeds_feature_count(spark):
    """k larger than the feature table: emit all features ranked, not a
    crash or silence."""
    pts = spark.createDataFrame(pd.DataFrame({"image_id": ["p"], "lon": [1.0], "lat": [1.0]}))
    feats = spark.createDataFrame(
        pd.DataFrame({"feature_id": [7, 8], "lon": [1.1, 1.2], "lat": [1.0, 1.0]})
    )
    got = knn_join(pts, feats, k=5, res=10).toPandas().sort_values("knn_rank")
    assert got["feature_id"].tolist() == [7, 8]


def test_tiling_assignment_and_fidelity(spark):
    pdf = fixtures.image_rows(200)
    df = spark.createDataFrame(pdf)
    assigned = assign_tiles(df, z=14, salt_n=8)
    a = assigned.select("image_id", "x", "y", "salt", "lon", "lat").toPandas()
    nx, ny = __import__(
        "augdiff_pipeline_spark.functions.mercator", fromlist=["tile_xy"]
    ).tile_xy(a["lon"].to_numpy(), a["lat"].to_numpy(), 14)
    assert (a["x"].to_numpy() == nx).all() and (a["y"].to_numpy() == ny).all()
    assert a["salt"].between(0, 7).all() and a["salt"].nunique() > 1

    tiles = cut_tiles(assigned, tile_px=16, salt_n=8).toPandas()
    assert (tiles["psnr_db"] >= 40.0).all()  # per-row invariant (BASELINE input_hint)
    # lossless rows must round-trip exactly (psnr capped at 99)
    png_ids = set(pdf[pdf["fmt"] == "png"]["image_id"])
    assert (tiles[tiles["image_id"].isin(png_ids)]["psnr_db"] == 99.0).all()
    # tile counts match ceil(w/16)*ceil(h/16)
    exp = {
        r["image_id"]: ((r["w"] + 15) // 16) * ((r["h"] + 15) // 16) for _, r in pdf.iterrows()
    }
    got = tiles.groupby("image_id").size().to_dict()
    assert got == exp


def test_tile_cut_scalar_batched_equivalence(spark):
    """The bench's A/B scalar kernel (pre-round-4 shape) and the batched
    per-(shape, fmt) kernel must emit identical tiles — the A/B is only
    meaningful if both compute the same thing."""
    df = spark.createDataFrame(fixtures.image_rows(60))
    assigned = assign_tiles(df, z=14, salt_n=4)
    cols = ["image_id", "tix", "tiy"]

    def canon(p):
        p = p.sort_values(cols).reset_index(drop=True)
        p["tile_bytes"] = p["tile_bytes"].map(bytes)
        return p

    a = canon(cut_tiles(assigned, tile_px=16, batched=True).toPandas())
    b = canon(cut_tiles(assigned, tile_px=16, batched=False).toPandas())
    assert len(a) == len(b) > 0
    for c in a.columns:
        if c == "psnr_db":
            assert np.allclose(a[c].to_numpy(), b[c].to_numpy())
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_image_codec_invariants():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert (imgcodec.decode(imgcodec.encode(arr, "png")) == arr).all()
    lossy = imgcodec.decode(imgcodec.encode(arr, "jpeg"))
    assert imgcodec.psnr(arr, lossy) >= 40.0
    assert imgcodec.phash64(arr) == imgcodec.phash64(arr.copy())
    with pytest.raises(NotImplementedError):
        imgcodec.encode(arr, "webp")
    with pytest.raises(NotImplementedError):
        imgcodec.decode(b"\x89PNG\r\n...not ours")


def test_knn_guard_routes_oversized_features(spark, images):
    """A feature table above the broadcast budget must never be
    collected to the driver: knn_join routes to the cell-bucketed
    shuffle strategy and the output is identical (rows, ranks,
    distances)."""
    import pyspark.sql as pssql
    from augdiff_pipeline_spark.operators.knn import knn_join_shuffle

    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "feature_id": list(fixtures.NODE_COORDS.keys()),
                "lon": [c[0] for c in fixtures.NODE_COORDS.values()],
                "lat": [c[1] for c in fixtures.NODE_COORDS.values()],
            }
        )
    )
    want = (
        knn_join(images, feats, k=3, res=10)
        .toPandas()
        .sort_values(["image_id", "knn_rank"])
        .reset_index(drop=True)
    )
    orig_collect = pssql.DataFrame.collect

    def trapped(self):
        raise AssertionError("oversized kNN path collected a DataFrame to the driver")

    pssql.DataFrame.collect = trapped
    try:
        routed = knn_join(images, feats, k=3, res=10, max_broadcast_bytes=1)
        got = routed.toPandas()
    finally:
        pssql.DataFrame.collect = orig_collect
    got = got.sort_values(["image_id", "knn_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the explicit shuffle API produces the same thing
    direct = (
        knn_join_shuffle(images, feats, k=3, res=10)
        .toPandas()
        .sort_values(["image_id", "knn_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, want, check_dtype=False)


def test_knn_shuffle_sparse_and_small_feature_table(spark):
    """Shuffle-kNN exhaustive tail: far-away features and k > n must
    behave exactly like the broadcast kernel's full-scan fallback."""
    from augdiff_pipeline_spark.operators.knn import knn_join_shuffle

    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": ["p0", "p1"], "lon": [0.0, 0.1], "lat": [0.0, 0.1]})
    )
    feats = spark.createDataFrame(
        pd.DataFrame(
            {"feature_id": [1, 2, 3], "lon": [120.0, -150.0, 60.0], "lat": [70.0, -80.0, -60.0]}
        )
    )
    got = knn_join_shuffle(pts, feats, k=2, res=10).toPandas()
    for pid, plon, plat in [("p0", 0.0, 0.0), ("p1", 0.1, 0.1)]:
        d2 = {f: (lo - plon) ** 2 + (la - plat) ** 2
              for f, lo, la in [(1, 120.0, 70.0), (2, -150.0, -80.0), (3, 60.0, -60.0)]}
        want = sorted(d2, key=lambda f: (d2[f], f))[:2]
        mine = got[got["image_id"] == pid].sort_values("knn_rank")["feature_id"].tolist()
        assert mine == want, (pid, mine, want)
    one = spark.createDataFrame(pd.DataFrame({"image_id": ["p"], "lon": [1.0], "lat": [1.0]}))
    feats2 = spark.createDataFrame(
        pd.DataFrame({"feature_id": [7, 8], "lon": [1.1, 1.2], "lat": [1.0, 1.0]})
    )
    got2 = knn_join_shuffle(one, feats2, k=5, res=10).toPandas().sort_values("knn_rank")
    assert got2["feature_id"].tolist() == [7, 8]


def test_knn_shuffle_tail_never_cartesian(spark):
    """The guarded tail exists precisely when the feature side is too
    big to broadcast, so it must NEVER plan a CartesianProduct against
    the feature table: a sparse image cluster far from every feature
    (unproven through all scheduled rounds) must resolve through
    broadcast-nested-loop box-join rounds, and still match brute
    force."""
    from augdiff_pipeline_spark.operators.knn import knn_join_shuffle

    rng = np.random.default_rng(7)
    # images clustered at (0, 0); features far away at (90, 40) —
    # nothing within the scheduled disk rounds at res 10
    pts = spark.createDataFrame(
        pd.DataFrame({
            "image_id": [f"p{i}" for i in range(40)],
            "lon": rng.uniform(-0.05, 0.05, 40),
            "lat": rng.uniform(-0.05, 0.05, 40),
        })
    )
    feats = spark.createDataFrame(
        pd.DataFrame({
            "feature_id": np.arange(50, dtype=np.int64),
            "lon": 90.0 + rng.uniform(0, 0.1, 50),
            "lat": 40.0 + rng.uniform(0, 0.1, 50),
        })
    )
    out = knn_join_shuffle(pts, feats, k=3, res=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    got = out.toPandas().sort_values(["image_id", "knn_rank"]).reset_index(drop=True)
    pp = pts.toPandas()
    ff = feats.toPandas()
    rows = []
    for _, p in pp.iterrows():
        d2 = (ff["lon"] - p["lon"]) ** 2 + (ff["lat"] - p["lat"]) ** 2
        top = sorted(zip(d2, ff["feature_id"]))[:3]
        rows += [
            {"image_id": p["image_id"], "feature_id": int(f), "knn_rank": r + 1,
             "dist_sq_deg": d}
            for r, (d, f) in enumerate(top)
        ]
    want = (
        pd.DataFrame(rows)
        .sort_values(["image_id", "knn_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
