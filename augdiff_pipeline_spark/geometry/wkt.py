"""WKT writer + validity/emptiness predicates (reference parity:
ST_AsText, ST_IsEmpty, ST_IsValid — /root/reference/common/src/main/
scala/osmesa/functions/package.scala:27-37, which delegate to JTS).

WKT formatting follows the OGC simple-features grammar; numbers render
via Python repr (shortest round-trip float), matching what JTS's
WKTWriter produces for doubles without a fixed precision model.

Validity is the pragmatic OGC subset that matters for OSM-derived
geometry: finite coordinates, closed rings with >= 4 points, non-zero
ring area, no self-intersection within a ring (proper crossings or
non-adjacent touches), holes contained in the exterior.  All edge-pair
work is vectorized numpy (O(E^2) elementwise, fine for OSM-scale rings).
"""

from __future__ import annotations

import numpy as np

from . import core


# ------------------------------------------------------------------ WKT (F8)
def _num(v: float) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def _coords_text(coords: np.ndarray) -> str:
    return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in coords) + ")"


def _poly_text(poly: core.Polygon) -> str:
    return "(" + ", ".join(_coords_text(r) for r in poly.rings) + ")"


def to_wkt(geom: core.Geometry) -> str:
    """OGC WKT for any geometry in the value model."""
    if isinstance(geom, core.Point):
        return f"POINT ({_num(geom.x)} {_num(geom.y)})"
    if isinstance(geom, core.LineString):
        if len(geom.coords) == 0:
            return "LINESTRING EMPTY"
        return "LINESTRING " + _coords_text(geom.coords)
    if isinstance(geom, core.Polygon):
        if not geom.rings:
            return "POLYGON EMPTY"
        return "POLYGON " + _poly_text(geom)
    if isinstance(geom, core.MultiLineString):
        if not geom.lines:
            return "MULTILINESTRING EMPTY"
        return "MULTILINESTRING (" + ", ".join(_coords_text(l) for l in geom.lines) + ")"
    if isinstance(geom, core.MultiPolygon):
        if not geom.polygons:
            return "MULTIPOLYGON EMPTY"
        return "MULTIPOLYGON (" + ", ".join(_poly_text(p) for p in geom.polygons) + ")"
    if isinstance(geom, core.GeometryCollection):
        if not geom.geoms:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in geom.geoms) + ")"
    raise TypeError(geom)


# ------------------------------------------------------- predicates (F9)
def is_empty(geom: core.Geometry) -> bool:
    if isinstance(geom, core.Point):
        return not (np.isfinite(geom.x) and np.isfinite(geom.y))
    if isinstance(geom, core.LineString):
        return len(geom.coords) == 0
    if isinstance(geom, core.Polygon):
        return len(geom.rings) == 0 or len(geom.rings[0]) == 0
    if isinstance(geom, core.MultiLineString):
        return len(geom.lines) == 0
    if isinstance(geom, core.MultiPolygon):
        return len(geom.polygons) == 0
    if isinstance(geom, core.GeometryCollection):
        return len(geom.geoms) == 0 or all(is_empty(g) for g in geom.geoms)
    raise TypeError(geom)


def _segments_cross(ring: np.ndarray) -> bool:
    """True if any two non-adjacent ring edges properly intersect or any
    two adjacent edges overlap (vectorized orientation tests over all
    edge pairs)."""
    p0 = ring[:-1]  # (E,2)
    p1 = ring[1:]
    e = len(p0)
    if e < 2:
        return False

    def orient(a, b, c):
        # sign of cross((b-a), (c-a)); a,b: (E,1,2), c: (1,E,2) broadcast
        return np.sign(
            (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0])
        )

    a, b = p0[:, None, :], p1[:, None, :]
    c, d = p0[None, :, :], p1[None, :, :]
    o1 = orient(a, b, c)
    o2 = orient(a, b, d)
    o3 = orient(c, d, a)
    o4 = orient(c, d, b)
    proper = (o1 != o2) & (o3 != o4) & (o1 != 0) & (o2 != 0) & (o3 != 0) & (o4 != 0)
    i, j = np.meshgrid(np.arange(e), np.arange(e), indexing="ij")
    nonadj = (np.abs(i - j) > 1) & (np.abs(i - j) != e - 1)
    if (proper & nonadj).any():
        return True
    # improper (touch) between non-adjacent edges: an endpoint of one
    # edge lying strictly inside another edge's span is also invalid
    collinear_touch = ((o1 == 0) | (o2 == 0) | (o3 == 0) | (o4 == 0)) & nonadj
    if not collinear_touch.any():
        return False
    for ii, jj in zip(*np.nonzero(collinear_touch)):
        for pt in (p0[jj], p1[jj]):
            ax, ay = p0[ii]
            bx, by = p1[ii]
            cross = (bx - ax) * (pt[1] - ay) - (by - ay) * (pt[0] - ax)
            if cross == 0:
                t_num = (pt[0] - ax) * (bx - ax) + (pt[1] - ay) * (by - ay)
                t_den = (bx - ax) ** 2 + (by - ay) ** 2
                if t_den > 0 and 0 < t_num < t_den:
                    return True
    return False


def _ring_valid(ring: np.ndarray) -> bool:
    if len(ring) < 4 or not core.is_closed(ring):
        return False
    if not np.isfinite(ring).all():
        return False
    if core.ring_area(ring) == 0.0:
        return False
    return not _segments_cross(ring)


def _polygon_valid(poly: core.Polygon) -> bool:
    if not poly.rings:
        return False
    if not all(_ring_valid(r) for r in poly.rings):
        return False
    ext = core.Polygon((poly.rings[0],))
    return all(core.polygon_contains_ring(ext, h) for h in poly.rings[1:])


def is_valid(geom: core.Geometry) -> bool:
    if isinstance(geom, core.Point):
        return bool(np.isfinite(geom.x) and np.isfinite(geom.y))
    if isinstance(geom, core.LineString):
        return len(geom.coords) >= 2 and bool(np.isfinite(geom.coords).all())
    if isinstance(geom, core.Polygon):
        return _polygon_valid(geom)
    if isinstance(geom, core.MultiLineString):
        return len(geom.lines) > 0 and all(
            len(l) >= 2 and bool(np.isfinite(l).all()) for l in geom.lines
        )
    if isinstance(geom, core.MultiPolygon):
        return len(geom.polygons) > 0 and all(_polygon_valid(p) for p in geom.polygons)
    if isinstance(geom, core.GeometryCollection):
        return all(is_valid(g) for g in geom.geoms)
    raise TypeError(geom)
