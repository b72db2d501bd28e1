"""Relation geometry assembly — reference-parity semantics, numpy inside.

Re-implements (from observed behavior, no code copied) the assembly
kernels of /root/reference/ingest/src/main/scala/osmesa/functions/osm/package.scala:

- ``form_rings``     (:402-431): greedy endpoint chaining of open segments
  into closed rings; the head segment extends by a segment whose *start*
  matches its end, else by a *reversed* segment whose end matches; raises
  AssemblyError when no continuation exists.
- ``connect_segments`` (:434-459): same chaining but unmatched chains are
  emitted as open lines instead of failing.
- ``build_multipolygon`` (:471-553): members with roles outer/inner/""
  (others dropped); closed lines with >=4 vertices become rings directly;
  open segments are ring-formed sorted by vertex count desc; rings are
  re-classified by containment-count parity over the area-desc order
  (even = outer, odd = inner); inners are allocated once each to the
  largest containing outer; missing way geometry or failed assembly
  returns None (caller falls back to GeometryCollection, matching
  RowsToJson.scala:333-336).

Divergence note (documented, fixture-safe): the reference runs a JTS
unary union over classified rings ("dissolveRings", :461-468) which is a
no-op for non-overlapping ring sets; a full polygon-clipping union is out
of scope without JTS/shapely, so overlapping outer rings raise
AssemblyError here → the None/GeometryCollection fallback path (strictly
more conservative than the reference, identical on well-formed input).
"""

from __future__ import annotations

import numpy as np

from .core import (
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPolygon,
    Polygon,
    Geometry,
    bbox,
    is_closed,
    points_in_polygon,
    polygon_contains_ring,
    ring_area,
)


class AssemblyError(Exception):
    pass


def _ends(seg: np.ndarray) -> tuple[float, float, float, float]:
    return seg[0, 0], seg[0, 1], seg[-1, 0], seg[-1, 1]


def form_rings(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Chain open segments into closed rings (exact-equality endpoints)."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments]
    rings: list[np.ndarray] = []
    while segs:
        head = segs.pop(0)
        if is_closed(head):
            rings.append(head)
            continue
        ex, ey = head[-1, 0], head[-1, 1]
        nxt_i = None
        reverse = False
        for i, s in enumerate(segs):
            if s[0, 0] == ex and s[0, 1] == ey:
                nxt_i, reverse = i, False
                break
        if nxt_i is None:
            for i, s in enumerate(segs):
                if s[-1, 0] == ex and s[-1, 1] == ey:
                    nxt_i, reverse = i, True
                    break
        if nxt_i is None:
            raise AssemblyError("Unable to connect segments.")
        nxt = segs.pop(nxt_i)
        if reverse:
            nxt = nxt[::-1]
        segs.insert(0, np.concatenate([head, nxt[1:]], axis=0))
    return rings


def connect_segments(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Chain segments; unmatched chains become open lines (no failure)."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments]
    lines: list[np.ndarray] = []
    while segs:
        head = segs.pop(0)
        ex, ey = head[-1, 0], head[-1, 1]
        nxt_i = None
        reverse = False
        for i, s in enumerate(segs):
            if s[0, 0] == ex and s[0, 1] == ey:
                nxt_i, reverse = i, False
                break
        if nxt_i is None:
            for i, s in enumerate(segs):
                if s[-1, 0] == ex and s[-1, 1] == ey:
                    nxt_i, reverse = i, True
                    break
        if nxt_i is None:
            lines.append(head)
            continue
        nxt = segs.pop(nxt_i)
        if reverse:
            nxt = nxt[::-1]
        segs.insert(0, np.concatenate([head, nxt[1:]], axis=0))
    return lines


def _rings_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    """Partial-overlap detection: some-but-not-all vertices of one ring
    inside the other (proper containment and disjointness are fine)."""
    pa = Polygon((a,))
    pb = Polygon((b,))
    in_b = points_in_polygon(a[:, 0], a[:, 1], pb)
    in_a = points_in_polygon(b[:, 0], b[:, 1], pa)
    return bool((in_b.any() and not in_b.all()) or (in_a.any() and not in_a.all()))


ROLE_ACCEPTED = ("outer", "inner", "")


def build_multipolygon(
    roles: list[str],
    member_geoms: list[Geometry | None],
    member_types: list[str],
) -> Geometry | None:
    """roles/types/geoms are parallel arrays over relation members.

    Returns Polygon or MultiPolygon WKB-able geometry; None = assembly
    failed / incomplete (caller falls back to GeometryCollection).
    """
    # bail early if a way member has no geometry (reference :472-476)
    for t, g in zip(member_types, member_geoms):
        if t == "way" and g is None:
            return None

    # Polygon members contribute their exterior; everything else as line
    lines: list[tuple[str, np.ndarray]] = []
    for role, g in zip(roles, member_geoms):
        if g is None:
            continue
        if isinstance(g, Polygon):
            coords = g.exterior
        elif isinstance(g, LineString):
            coords = g.coords
        else:
            continue  # non-line geometries are dropped (reference: as[Line] → None)
        if role not in ROLE_ACCEPTED:
            continue
        lines.append((role, coords))

    complete: list[np.ndarray] = []
    partial: list[np.ndarray] = []
    for _role, coords in lines:
        if is_closed(coords) and len(coords) >= 4:
            complete.append(coords)
        else:
            partial.append(coords)

    try:
        partial_sorted = sorted(partial, key=lambda c: -len(c))
        rings = complete + form_rings(partial_sorted)
        if not rings:
            return None

        # classify by containment parity over area-desc order
        ring_polys = [Polygon((r,)) for r in rings]
        order = sorted(range(len(rings)), key=lambda i: -abs(ring_area(rings[i])))
        outers: list[int] = [order[0]]
        inners: list[int] = []
        for idx in order[1:]:
            count = 0
            for j in range(len(rings)):
                if j != idx and polygon_contains_ring(ring_polys[j], rings[idx]):
                    count += 1
            (outers if count % 2 == 0 else inners).append(idx)

        # dissolve step: no-op for non-overlapping rings; overlapping
        # outers would require a clipping union → conservative failure.
        for i, a in enumerate(outers):
            for b in outers[i + 1 :]:
                if _rings_overlap(rings[a], rings[b]):
                    raise AssemblyError("overlapping outer rings (union unsupported)")

        # allocate each inner once to the largest containing outer
        outer_order = sorted(outers, key=lambda i: -abs(ring_area(rings[i])))
        remaining = list(inners)
        polys: list[Polygon] = []
        for oi in outer_order:
            opoly = ring_polys[oi]
            mine = [ri for ri in remaining if polygon_contains_ring(opoly, rings[ri])]
            remaining = [ri for ri in remaining if ri not in mine]
            polys.append(Polygon((rings[oi], *[rings[ri] for ri in mine])))

        if len(polys) == 1:
            return polys[0]
        return MultiPolygon(tuple(polys))
    except AssemblyError:
        return None
    except (ValueError, IndexError):
        return None


def build_multiline(member_geoms: list[Geometry]) -> Geometry | None:
    """Reference getMultiLine (RowsToJson.scala:86-100): concatenates all
    member lines into one MultiLine (no merging)."""
    parts: list[np.ndarray] = []
    for g in member_geoms:
        if isinstance(g, LineString):
            parts.append(g.coords)
        elif isinstance(g, MultiLineString):
            parts.extend(g.lines)
        else:
            return None
    if not parts:
        return None
    return MultiLineString(tuple(parts))


def build_route(roles: list[str], member_geoms: list[Geometry | None]) -> dict[str, Geometry]:
    """Reference buildRoute (osm/package.scala:561-599): per-role connect
    of line segments → Line or MultiLine per role."""
    by_role: dict[str, list[np.ndarray]] = {}
    for role, g in zip(roles, member_geoms):
        if isinstance(g, LineString):
            by_role.setdefault(role, []).append(g.coords)
    out: dict[str, Geometry] = {}
    for role, segs in by_role.items():
        joined = connect_segments(segs)
        if len(joined) == 1:
            out[role] = LineString(joined[0])
        else:
            out[role] = MultiLineString(tuple(joined))
    return out
