"""Unit tests: packing parity, tag predicates, cells, mercator."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from augdiff_pipeline_spark.functions import cells, mercator, osm_tags, packing


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_packing_parity(spark, rng):
    ids = rng.integers(1, 10**13, 5000)
    types = np.array(["node", "way", "relation"])[rng.integers(0, 3, 5000)]
    df = spark.createDataFrame(pd.DataFrame({"id": ids, "type": types}))
    out = df.select(
        "id", "type",
        packing.pair_to_long(F.col("id"), F.col("type")).alias("packed"),
        packing.partition_number(F.col("id"), F.col("type")).alias("p"),
    ).toPandas()
    for _, r in out.sample(200, random_state=0).iterrows():
        assert r["packed"] == packing.pair_to_long_py(r["id"], r["type"])
        assert r["p"] == packing.partition_number_py(r["id"], r["type"])
    rt = df.select(
        packing.long_to_id(packing.pair_to_long(F.col("id"), F.col("type"))).alias("id2"),
        packing.long_to_type(packing.pair_to_long(F.col("id"), F.col("type"))).alias("t2"),
        "id", "type",
    ).filter((F.col("id2") != F.col("id")) | (F.col("t2") != F.col("type")))
    assert rt.count() == 0


def test_is_area(spark):
    cases = [
        ({"building": "yes"}, True),
        ({"highway": "residential"}, False),
        ({"area": "no", "building": "yes"}, False),
        ({"area": "YES", "highway": "x"}, True),
        ({"waterway": "dam"}, False),
        ({"waterway": "riverbank"}, True),
        ({"leisure": "park"}, True),
        ({"leisure": "track"}, False),
        ({}, False),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, tags map<string,string>"
    )
    got = {r["i"]: r["a"] for r in df.select("i", osm_tags.is_area(F.col("tags")).alias("a")).collect()}
    for i, (tags, want) in enumerate(cases):
        assert got[i] == want, (tags, got[i])
        assert osm_tags.is_area_py(tags) == want, tags


def test_morton_roundtrip(rng):
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-90, 90, 3000)
    m = cells.morton(lon, lat)
    ix, iy = cells.lonlat_to_ixy(lon, lat, cells.MAX_RES)
    dx, dy = cells.deinterleave(m)
    assert (dx == ix).all() and (dy == iy).all()
    for r in (4, 11, 22):
        mr = cells.morton(lon, lat, r)
        lo, hi = cells.cell_interval(mr, r)
        assert ((m >= lo) & (m <= hi)).all()


def test_tile_parity_spark_numpy_duckdb(spark, rng):
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-89, 89, 4000)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    tx, ty = mercator.tile_cols(F.col("lon"), F.col("lat"), 13)
    got = df.select(tx.alias("tx"), ty.alias("ty"), "lon", "lat").toPandas()
    nx, ny = mercator.tile_xy(got["lon"].to_numpy(), got["lat"].to_numpy(), 13)
    assert (got["tx"].to_numpy() == nx).all() and (got["ty"].to_numpy() == ny).all()
    con = duckdb.connect()
    con.register("pts", got[["lon", "lat"]])
    sx, sy = mercator.tile_sql("lon", "lat", 13)
    dd = con.sql(f"select {sx} tx, {sy} ty from pts").df()
    assert (dd["tx"].to_numpy() == got["tx"].to_numpy()).all()
    assert (dd["ty"].to_numpy() == got["ty"].to_numpy()).all()
