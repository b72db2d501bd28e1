"""Geometry rendering plan: entity histories → per-mode WKB → features.

Distributed re-expression of the reference's driver-side getGeometry /
emission state machine (/root/reference/ad/src/main/scala/RowsToJson.scala:272-383):

- two render modes per entity id: "after" (in-window row, member lookups
  fall back in→before — RowsToJson:277-283) and "before" (before-window
  row, before-only lookups);
- ways: posexplode(nds) ⋈ broadcast node-coordinate lookup → sorted
  collect → Arrow kernel builds Line, or Polygon when the way isArea and
  closed (RowsToJson:294);
- relations: bounded rounds over the membership DAG — round k assembles
  every relation whose relation-members were assembled in rounds < k;
  kernels: buildMultiPolygon for type=multipolygon tags, MultiLine when
  every member geometry is a line, else GeometryCollection
  (RowsToJson:329-345); unresolved members are dropped from roles/types
  *and* geoms in lockstep (the reference zips full-length role arrays
  with resolved-only wkb arrays, silently misaligning when a member is
  unresolvable — on such inputs its assembly generally fails to
  GeometryCollection; we keep the arrays aligned);
- emission (RowsToJson:353-383): create → 1 visible feature; modify →
  after-feature + invisible before-feature; delete → invisible
  before-feature only.

All geometry work happens in applyInPandas/mapInPandas Arrow kernels
over batch-scoped groups; the node-coordinate lookup is broadcast.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.osm_tags import is_area_py, is_multipolygon_py
from ..geometry import assembly, core, wkb

_MODE_COLS = {"after": ("ax", "ay"), "before": ("bx", "by")}


def node_points(node_hist: DataFrame) -> DataFrame:
    """(id, ax, ay, bx, by): per-mode coordinates for every node in scope."""
    after = F.coalesce(F.col("in_row"), F.col("before_row"))
    return node_hist.select(
        "id",
        after["lon"].cast("double").alias("ax"),
        after["lat"].cast("double").alias("ay"),
        F.col("before_row")["lon"].cast("double").alias("bx"),
        F.col("before_row")["lat"].cast("double").alias("by"),
    )


def _way_rows(way_hist: DataFrame, mode: str) -> DataFrame:
    row = (
        F.coalesce(F.col("in_row"), F.col("before_row"))
        if mode == "after"
        else F.col("before_row")
    )
    return way_hist.select("id", row.alias("r")).filter(F.col("r").isNotNull())


def way_wkbs(way_hist: DataFrame, node_pts: DataFrame, mode: str) -> DataFrame:
    """(id, wkb) for every renderable way in ``mode``."""
    xcol, ycol = _MODE_COLS[mode]
    rows = _way_rows(way_hist, mode)
    exploded = rows.select(
        "id",
        F.col("r.tags").alias("tags"),
        F.posexplode("r.nds").alias("pos", "nd"),
    ).join(
        F.broadcast(node_pts.select(F.col("id").alias("nid"), F.col(xcol).alias("x"), F.col(ycol).alias("y"))),
        F.col("nd.ref") == F.col("nid"),
        "left",
    )
    agg = exploded.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "x", "y"))).alias("pts"),
        F.first("tags").alias("tags"),
    )

    def kernel(it):
        for pdf in it:
            out_ids, out_wkb = [], []
            for wid, pts, tags in zip(pdf["id"], pdf["pts"], pdf["tags"]):
                xs = np.array([p["x"] for p in pts], dtype=np.float64)
                ys = np.array([p["y"] for p in pts], dtype=np.float64)
                if len(xs) == 0 or np.isnan(xs).any() or np.isnan(ys).any() or any(p["x"] is None for p in pts):
                    out_ids.append(wid)
                    out_wkb.append(None)
                    continue
                coords = np.stack([xs, ys], axis=1)
                closed = len(coords) >= 2 and (coords[0] == coords[-1]).all()
                tags_d = dict(tags) if tags is not None else {}
                if is_area_py(tags_d) and closed and len(coords) >= 4:
                    geom: core.Geometry = core.Polygon((coords,))
                else:
                    geom = core.LineString(coords)
                out_ids.append(wid)
                out_wkb.append(wkb.dumps(geom))
            yield pd.DataFrame({"id": out_ids, "wkb": out_wkb})

    return agg.mapInPandas(kernel, "id long, wkb binary")


def way_wkbs_both(way_hist: DataFrame, node_pts: DataFrame) -> DataFrame:
    """(id, mode, wkb) for BOTH render modes in one explode+join+agg
    pass — the per-batch pipeline derives its "after"/"before" way
    tables by filtering this one checkpointed result instead of paying
    the explode, broadcast join, sort-collect and Arrow kernel twice
    (mode geometry differs only in which history row supplies nds and
    which coordinate pair the node lookup yields).  mode: 'a' | 'b'.
    Semantics per mode are identical to ``way_wkbs`` (same kernel)."""
    after_r = F.coalesce(F.col("in_row"), F.col("before_row"))
    before_r = F.col("before_row")
    modes = way_hist.select(
        "id",
        F.explode(
            F.filter(
                F.array(
                    F.struct(F.lit("a").alias("mode"), after_r.alias("r")),
                    F.struct(F.lit("b").alias("mode"), before_r.alias("r")),
                ),
                lambda s: s["r"].isNotNull(),
            )
        ).alias("mr"),
    ).select("id", F.col("mr.mode").alias("mode"), F.col("mr.r").alias("r"))
    exploded = modes.select(
        "id", "mode",
        F.col("r.tags").alias("tags"),
        F.posexplode("r.nds").alias("pos", "nd"),
    ).join(
        F.broadcast(node_pts.select(
            F.col("id").alias("nid"), F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")
        )),
        F.col("nd.ref") == F.col("nid"),
        "left",
    ).select(
        "id", "mode", "tags", "pos",
        F.when(F.col("mode") == "a", F.col("ax")).otherwise(F.col("bx")).alias("x"),
        F.when(F.col("mode") == "a", F.col("ay")).otherwise(F.col("by")).alias("y"),
    )
    agg = exploded.groupBy("id", "mode").agg(
        F.sort_array(F.collect_list(F.struct("pos", "x", "y"))).alias("pts"),
        F.first("tags").alias("tags"),
    )

    def kernel(it):
        for pdf in it:
            out_ids, out_modes, out_wkb = [], [], []
            for wid, mode, pts, tags in zip(pdf["id"], pdf["mode"], pdf["pts"], pdf["tags"]):
                xs = np.array([p["x"] for p in pts], dtype=np.float64)
                ys = np.array([p["y"] for p in pts], dtype=np.float64)
                out_ids.append(wid)
                out_modes.append(mode)
                if len(xs) == 0 or np.isnan(xs).any() or np.isnan(ys).any() or any(p["x"] is None for p in pts):
                    out_wkb.append(None)
                    continue
                coords = np.stack([xs, ys], axis=1)
                closed = len(coords) >= 2 and (coords[0] == coords[-1]).all()
                tags_d = dict(tags) if tags is not None else {}
                if is_area_py(tags_d) and closed and len(coords) >= 4:
                    geom: core.Geometry = core.Polygon((coords,))
                else:
                    geom = core.LineString(coords)
                out_wkb.append(wkb.dumps(geom))
            yield pd.DataFrame({"id": out_ids, "mode": out_modes, "wkb": out_wkb})

    return agg.mapInPandas(kernel, "id long, mode string, wkb binary")


def relation_wkbs(
    rel_hist: DataFrame,
    node_pts: DataFrame,
    way_wkb: DataFrame,
    mode: str,
    max_rounds: int = 8,
) -> DataFrame:
    """(id, wkb) for every renderable relation in ``mode`` — bounded
    rounds over the relation-membership DAG."""
    xcol, ycol = _MODE_COLS[mode]
    row = (
        F.coalesce(F.col("in_row"), F.col("before_row"))
        if mode == "after"
        else F.col("before_row")
    )
    rows = rel_hist.select("id", row.alias("r")).filter(F.col("r").isNotNull())
    members = rows.select(
        "id",
        F.col("r.tags").alias("tags"),
        F.posexplode("r.members").alias("pos", "m"),
    ).select(
        "id", "tags", "pos",
        F.col("m.type").alias("mtype"),
        F.col("m.ref").alias("mid"),
        F.col("m.role").alias("role"),
    )
    # node/way member geometries are immediately available
    node_wkb_df = node_pts.select(
        F.col("id").alias("mid"),
        F.col(xcol).alias("x"),
        F.col(ycol).alias("y"),
    )
    renderable_rel = rows.select(F.col("id").alias("mid")).withColumn("r_ok", F.lit(True))

    base = (
        members.join(
            F.broadcast(node_wkb_df), (F.col("mtype") == "node") & (members["mid"] == node_wkb_df["mid"]), "left"
        )
        .drop(node_wkb_df["mid"])
        .join(
            F.broadcast(way_wkb.select(F.col("id").alias("wmid"), F.col("wkb").alias("way_wkb"))),
            (F.col("mtype") == "way") & (F.col("mid") == F.col("wmid")),
            "left",
        )
        .drop("wmid")
        .join(
            F.broadcast(renderable_rel),
            (F.col("mtype") == "relation") & (members["mid"] == renderable_rel["mid"]),
            "left",
        )
        .drop(renderable_rel["mid"])
        .withColumn("rel_pending", F.coalesce(F.col("r_ok"), F.lit(False)))
        .localCheckpoint(eager=True)
    )

    done: DataFrame | None = None
    pending = base
    for _ in range(max_rounds):
        if pending.isEmpty():
            break
        if done is not None:
            pending = (
                pending.drop("rel_wkb") if "rel_wkb" in pending.columns else pending
            ).join(
                F.broadcast(done.select(F.col("id").alias("dmid"), F.col("wkb").alias("rel_wkb"))),
                (F.col("mtype") == "relation") & (F.col("mid") == F.col("dmid")),
                "left",
            ).drop("dmid")
        else:
            pending = pending.withColumn("rel_wkb", F.lit(None).cast("binary"))
        undecided = F.col("rel_pending") & F.col("rel_wkb").isNull()
        blocked_ids = pending.filter(undecided).select("id").distinct()
        ready = pending.join(F.broadcast(blocked_ids), "id", "left_anti")
        still = pending.join(F.broadcast(blocked_ids), "id", "left_semi").localCheckpoint(eager=True)

        assembled = _assemble_relations(ready)
        done = assembled if done is None else done.unionByName(assembled)
        done = done.localCheckpoint(eager=True)
        pending = still
    if done is not None and not pending.isEmpty():
        # cycles / depth overflow: assemble with unresolved members dropped
        leftover = _assemble_relations(pending)
        done = done.unionByName(leftover).localCheckpoint(eager=True)
    elif done is None:
        done = _assemble_relations(pending)
    return done


def _assemble_relations(members: DataFrame) -> DataFrame:
    if "rel_wkb" not in members.columns:
        members = members.withColumn("rel_wkb", F.lit(None).cast("binary"))
    agg = members.groupBy("id").agg(
        F.first("tags").alias("tags"),
        F.sort_array(
            F.collect_list(F.struct("pos", "mtype", "role", "x", "y", "way_wkb", "rel_wkb"))
        ).alias("ms"),
    )

    def kernel(it):
        for pdf in it:
            out_ids, out_wkb = [], []
            for rid, tags, ms in zip(pdf["id"], pdf["tags"], pdf["ms"]):
                roles, types, geoms = [], [], []
                for m in ms:
                    g: core.Geometry | None = None
                    if m["mtype"] == "node" and m["x"] is not None and not pd.isna(m["x"]):
                        g = core.Point(float(m["x"]), float(m["y"]))
                    elif m["mtype"] == "way" and m["way_wkb"] is not None:
                        g = wkb.loads(bytes(m["way_wkb"]))
                    elif m["mtype"] == "relation" and m["rel_wkb"] is not None:
                        g = wkb.loads(bytes(m["rel_wkb"]))
                    if g is None:
                        continue  # unresolved member dropped (aligned arrays)
                    roles.append(m["role"])
                    types.append(m["mtype"])
                    geoms.append(g)
                tags_d = dict(tags) if tags is not None else {}
                geom: core.Geometry | None
                if is_multipolygon_py(tags_d):
                    geom = assembly.build_multipolygon(roles, geoms, types)
                    if geom is None:
                        geom = core.GeometryCollection(tuple(geoms))
                elif geoms and all(
                    isinstance(g, (core.LineString, core.MultiLineString)) for g in geoms
                ):
                    geom = assembly.build_multiline(geoms) or core.GeometryCollection(tuple(geoms))
                else:
                    geom = core.GeometryCollection(tuple(geoms))
                out_ids.append(rid)
                out_wkb.append(wkb.dumps(geom))
            yield pd.DataFrame({"id": out_ids, "wkb": out_wkb})

    return agg.mapInPandas(kernel, "id long, wkb binary")


# ------------------------------------------------------------------ features
def emit_features(
    hist: DataFrame, after_wkb: DataFrame, before_wkb: DataFrame, etype: str
) -> DataFrame:
    """GeoJSON feature lines per the create/modify/delete state machine
    (RowsToJson.scala:353-383).

    The branching is NATIVE DataFrame logic (create → after feature;
    modify → after + invisible-before; delete → invisible-before); only
    the WKB→GeoJSON render crosses into the Arrow kernel, one output row
    per input row (no per-row pandas iteration, no branch work in
    Python).  ``sub`` orders after(0)/before(1) lines of one entity
    deterministically for the sink.
    """
    h = (
        hist.join(after_wkb.withColumnRenamed("wkb", "a_wkb"), "id", "left")
        .join(before_wkb.withColumnRenamed("wkb", "b_wkb"), "id", "left")
        .filter(F.col("in_row").isNotNull())
    )
    visible_now = F.col("in_row")["visible"]
    has_before = F.col("before_row")["id"].isNotNull()
    # after-line: created or modified, currently visible, renderable
    after = h.filter(visible_now & F.col("a_wkb").isNotNull()).select(
        F.col("a_wkb").alias("gwkb"),
        F.col("in_row").alias("row"),
        F.lit(None).cast("boolean").alias("vis_override"),
        F.lit(0).alias("sub"),
    )
    # before-line: modify or delete — always emitted invisible
    before = h.filter(has_before & F.col("b_wkb").isNotNull()).select(
        F.col("b_wkb").alias("gwkb"),
        F.col("before_row").alias("row"),
        F.lit(False).alias("vis_override"),
        F.lit(1).alias("sub"),
    )
    sel = after.unionByName(before)

    def kernel(it):
        for pdf in it:
            out_id, out_line = [], []
            for gwkb, row, vo in zip(pdf["gwkb"], pdf["row"], pdf["vis_override"]):
                geom = wkb.loads(bytes(gwkb))
                props = _props(row, None if pd.isna(vo) else bool(vo))
                out_id.append(int(row["id"]))
                out_line.append(
                    json.dumps(
                        {
                            "type": "Feature",
                            "geometry": core.to_geojson_dict(geom),
                            "properties": props,
                        },
                        ensure_ascii=False,
                        separators=(",", ":"),
                    )
                )
            yield pd.DataFrame(
                {
                    "etype": pd.Series([etype] * len(out_id), dtype="object"),
                    "id": pd.Series(out_id, dtype="int64"),
                    "sub": pdf["sub"].astype("int32"),
                    "feature": pd.Series(out_line, dtype="object"),
                }
            )

    return sel.mapInPandas(kernel, "etype string, id long, sub int, feature string")


def _props(row, visible_override) -> dict:
    ts = row["timestamp"]
    iso = pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
    return {
        "id": int(row["id"]),
        "type": row["type"],
        "tags": dict(row["tags"]) if row["tags"] is not None else {},
        "changeset": int(row["changeset"]) if row["changeset"] is not None else None,
        "timestamp": iso,
        "uid": int(row["uid"]) if row["uid"] is not None else None,
        "user": row["user"],
        "version": int(row["version"]),
        "visible": bool(row["visible"]) if visible_override is None else bool(visible_override),
    }
