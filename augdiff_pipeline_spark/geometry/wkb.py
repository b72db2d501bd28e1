"""Minimal WKB codec (OGC well-known binary, little-endian, 2D).

Implements exactly the geometry kinds the engine ships between stages:
Point, LineString, Polygon, MultiLineString, MultiPolygon,
GeometryCollection.  Format per the public OGC Simple Features spec.
Coordinate payloads are (de)serialized through numpy ``tobytes``/
``frombuffer`` so per-geometry cost is O(1) python + one memcpy.
"""

from __future__ import annotations

import struct

import numpy as np

from .core import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)

_LE = 1
_TYPES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}


def _ring_bytes(ring: np.ndarray) -> bytes:
    return struct.pack("<I", len(ring)) + np.ascontiguousarray(ring, dtype="<f8").tobytes()


def dumps(geom: Geometry) -> bytes:
    head = struct.pack("<BI", _LE, _TYPES[geom.kind])
    if isinstance(geom, Point):
        return head + struct.pack("<dd", geom.x, geom.y)
    if isinstance(geom, LineString):
        return head + _ring_bytes(geom.coords)
    if isinstance(geom, Polygon):
        body = struct.pack("<I", len(geom.rings)) + b"".join(_ring_bytes(r) for r in geom.rings)
        return head + body
    if isinstance(geom, MultiLineString):
        parts = [dumps(LineString(l)) for l in geom.lines]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if isinstance(geom, MultiPolygon):
        parts = [dumps(p) for p in geom.polygons]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if isinstance(geom, GeometryCollection):
        parts = [dumps(g) for g in geom.geoms]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    raise TypeError(geom)


def _read_ring(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr.copy(), off + 16 * n


def _loads_at(buf: memoryview, off: int) -> tuple[Geometry, int]:
    byte_order, gtype = struct.unpack_from("<BI", buf, off)
    if byte_order != _LE:
        raise ValueError("big-endian WKB not supported")
    off += 5
    if gtype == 1:
        x, y = struct.unpack_from("<dd", buf, off)
        return Point(x, y), off + 16
    if gtype == 2:
        coords, off = _read_ring(buf, off)
        return LineString(coords), off
    if gtype == 3:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            r, off = _read_ring(buf, off)
            rings.append(r)
        return Polygon(tuple(rings)), off
    if gtype in (5, 6, 7):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            g, off = _loads_at(buf, off)
            parts.append(g)
        if gtype == 5:
            return MultiLineString(tuple(g.coords for g in parts)), off
        if gtype == 6:
            return MultiPolygon(tuple(parts)), off
        return GeometryCollection(tuple(parts)), off
    raise ValueError(f"unsupported WKB type {gtype}")


def loads(data: bytes) -> Geometry:
    geom, _ = _loads_at(memoryview(data), 0)
    return geom
