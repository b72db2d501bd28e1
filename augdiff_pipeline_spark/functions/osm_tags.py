"""OSM tag predicates as native Column expressions.

Semantics-parity targets (no code copied; the reference realizes these as
JVM scalar UDFs, we expand them into codegen'd boolean expression trees):

- ``is_area``: /root/reference/ingest/src/main/scala/osmesa/functions/osm/package.scala:135-145
  an explicit boolean ``area=`` tag wins; otherwise a way is an area when
  any tag key appears in the id-area-keys table with a value NOT in that
  key's inverted exclusion list.  The key table is the public
  osmlab/id-area-keys dataset @ v2.8.0 (values inverted), as in the
  reference (osm/package.scala:22-125).
- ``is_multipolygon``: osm/package.scala:147-150 — tags["type"]
  (lower-cased) in {multipolygon, boundary}.
- ``is_route``: osm/package.scala:152-154 — tags["type"] == "route"
  (exact, not lower-cased, matching the reference).
- ``compress_member_types``: osm/package.scala:156-176 — member type
  string -> byte code via a higher-order ``transform``.
- ``merge_tags``: osm/package.scala:555-557 — right-biased map merge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Public dataset: osmlab/id-area-keys v2.8.0 (same vintage the reference
# vendors).  Key -> set of values for which the key does NOT imply an area
# (the dataset stores exclusions, i.e. "values are inverted").
AREA_KEYS: dict[str, frozenset[str]] = {
    "addr:*": frozenset(),
    "advertising": frozenset({"billboard"}),
    "aerialway": frozenset(
        {
            "cable_car",
            "chair_lift",
            "drag_lift",
            "gondola",
            "goods",
            "magic_carpet",
            "mixed_lift",
            "platter",
            "rope_tow",
            "t-bar",
        }
    ),
    "aeroway": frozenset({"runway", "taxiway"}),
    "allotments": frozenset(),
    "amenity": frozenset({"bench"}),
    "area:highway": frozenset(),
    "attraction": frozenset({"dark_ride", "river_rafting", "train", "water_slide"}),
    "building": frozenset(),
    "camp_site": frozenset(),
    "club": frozenset(),
    "craft": frozenset(),
    "emergency": frozenset({"designated", "destination", "no", "official", "private", "yes"}),
    "golf": frozenset({"hole", "lateral_water_hazard", "water_hazard"}),
    "healthcare": frozenset(),
    "historic": frozenset(),
    "industrial": frozenset(),
    "junction": frozenset({"circular", "roundabout"}),
    "landuse": frozenset(),
    "leisure": frozenset({"slipway", "track"}),
    "man_made": frozenset(
        {"breakwater", "crane", "cutline", "embankment", "groyne", "pier", "pipeline"}
    ),
    "military": frozenset(),
    "natural": frozenset({"cliff", "coastline", "ridge", "tree_row"}),
    "office": frozenset(),
    "piste:type": frozenset(),
    "place": frozenset(),
    "playground": frozenset({"balancebeam", "slide", "zipwire"}),
    "power": frozenset({"line", "minor_line"}),
    "public_transport": frozenset({"platform"}),
    "shop": frozenset(),
    "tourism": frozenset(),
    "waterway": frozenset({"canal", "dam", "ditch", "drain", "river", "stream", "weir"}),
}

MULTIPOLYGON_TYPES = frozenset({"multipolygon", "boundary"})
BOOLEAN_VALUES = frozenset({"yes", "no", "true", "false", "1", "0"})
TRUTHY_VALUES = frozenset({"yes", "true", "1"})


def is_area(tags: Column) -> Column:
    """Codegen'd boolean expression tree over the tags map."""
    area_val = F.lower(tags.getItem("area"))
    explicit = area_val.isNotNull() & area_val.isin(*sorted(BOOLEAN_VALUES))
    truthy = area_val.isin(*sorted(TRUTHY_VALUES))
    implied = F.lit(False)
    for key, excluded in AREA_KEYS.items():
        val = tags.getItem(key)
        if excluded:
            implied = implied | (val.isNotNull() & ~val.isin(*sorted(excluded)))
        else:
            implied = implied | val.isNotNull()
    return F.when(explicit, truthy).otherwise(implied)


def is_area_py(tags: dict[str, str] | None) -> bool:
    """Driver/kernel-side scalar twin (used inside geometry assembly)."""
    tags = tags or {}
    area = tags.get("area")
    if area is not None and area.lower() in BOOLEAN_VALUES:
        return area.lower() in TRUTHY_VALUES
    return any(k in AREA_KEYS and tags[k] not in AREA_KEYS[k] for k in tags)


def is_multipolygon(tags: Column) -> Column:
    return F.coalesce(
        F.lower(tags.getItem("type")).isin(*sorted(MULTIPOLYGON_TYPES)), F.lit(False)
    )


def is_multipolygon_py(tags: dict[str, str] | None) -> bool:
    t = (tags or {}).get("type")
    return t is not None and t.lower() in MULTIPOLYGON_TYPES


def is_route(tags: Column) -> Column:
    return F.coalesce(tags.getItem("type") == F.lit("route"), F.lit(False))


def compress_member_types(members: Column) -> Column:
    """member.type string -> byte code (node=1, way=2, relation=3)."""
    return F.transform(
        members,
        lambda m: F.struct(
            F.when(m["type"] == "node", F.lit(1))
            .when(m["type"] == "way", F.lit(2))
            .when(m["type"] == "relation", F.lit(3))
            .cast("tinyint")
            .alias("type"),
            m["ref"].alias("ref"),
            m["role"].alias("role"),
        ),
    )


def merge_tags(left: Column, right: Column) -> Column:
    """Right-biased map merge (reference mergeTags = scala ``map ++ map``):
    for every key in either map, the right map's value wins."""
    keys = F.array_union(F.map_keys(left), F.map_keys(right))
    vals = F.transform(keys, lambda k: F.coalesce(F.try_element_at(right, k), F.try_element_at(left, k)))
    return F.map_from_arrays(keys, vals)
