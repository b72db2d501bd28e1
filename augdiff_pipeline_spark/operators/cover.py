"""Polygon → quadtree cell cover as sorted Morton intervals.

Adaptive descent (public quadtree-cover algorithm, the role S2's
RegionCoverer / H3 polyfill play): starting from the cells of a coarse
resolution that intersect the polygon's bbox, classify each cell as
outside (dropped), fully-inside (emitted as one interval at its
resolution), or boundary (split until ``max_res``, then emitted).  The
inside/boundary test is conservative — a cell counts as boundary if any
polygon edge's bbox overlaps it — which can only ENLARGE the cover, and
the spatial join refines candidates with the exact even-odd test, so the
join result is exact regardless.

All coordinate math is vectorized numpy; the per-polygon cell loop is
bounded by the cover size (O(perimeter / cell_size + depth)).
"""

from __future__ import annotations

import numpy as np

from ..functions import cells
from ..geometry import core


def _cell_rect(ix: int, iy: int, res: int) -> tuple[float, float, float, float]:
    n = 1 << res
    lon0 = ix / n * 360.0 - 180.0
    lon1 = (ix + 1) / n * 360.0 - 180.0
    lat0 = iy / n * 180.0 - 90.0
    lat1 = (iy + 1) / n * 180.0 - 90.0
    return lon0, lat0, lon1, lat1


def _rings(geom: core.Geometry) -> list[np.ndarray]:
    if isinstance(geom, core.Polygon):
        return list(geom.rings)
    if isinstance(geom, core.MultiPolygon):
        return [r for p in geom.polygons for r in p.rings]
    raise TypeError(f"cover requires Polygon/MultiPolygon, got {geom.kind}")


def _point_inside(geom: core.Geometry, x: float, y: float) -> bool:
    px, py = np.array([x]), np.array([y])
    if isinstance(geom, core.Polygon):
        return bool(core.points_in_polygon(px, py, geom)[0])
    return bool(core.points_in_multipolygon(px, py, geom)[0])


def polygon_cover(
    geom: core.Geometry, max_res: int = 14, min_res: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo, hi, full) sorted max-res Morton intervals covering ``geom``.

    ``full[i]`` is True when the interval's cells lie ENTIRELY inside the
    polygon — matches against full intervals are exact hits needing no
    point-in-polygon refine (the spatial join keeps them JVM-side);
    boundary intervals (full=False) carry the thin band that needs the
    exact even-odd test."""
    rings = _rings(geom)
    ex0 = np.concatenate([r[:-1] for r in rings])
    ex1 = np.concatenate([r[1:] for r in rings])
    # per-edge bboxes for the conservative boundary test
    exlo = np.minimum(ex0, ex1)
    exhi = np.maximum(ex0, ex1)
    all_pts = np.concatenate(rings)
    bx0, by0 = all_pts[:, 0].min(), all_pts[:, 1].min()
    bx1, by1 = all_pts[:, 0].max(), all_pts[:, 1].max()

    # seed: min_res cells overlapping the bbox
    six0, siy0 = cells.lonlat_to_ixy(np.array([bx0]), np.array([by0]), min_res)
    six1, siy1 = cells.lonlat_to_ixy(np.array([bx1]), np.array([by1]), min_res)
    stack: list[tuple[int, int, int]] = [
        (int(ix), int(iy), min_res)
        for ix in range(int(six0[0]), int(six1[0]) + 1)
        for iy in range(int(siy0[0]), int(siy1[0]) + 1)
    ]

    lo_out: list[int] = []
    hi_out: list[int] = []
    full_out: list[bool] = []
    while stack:
        ix, iy, res = stack.pop()
        lon0, lat0, lon1, lat1 = _cell_rect(ix, iy, res)
        if lon1 <= bx0 or lon0 >= bx1 or lat1 <= by0 or lat0 >= by1:
            continue  # outside bbox
        # does any edge bbox overlap this cell?
        touches = (
            (exlo[:, 0] < lon1) & (exhi[:, 0] > lon0) & (exlo[:, 1] < lat1) & (exhi[:, 1] > lat0)
        ).any()
        if not touches:
            # uniformly inside or outside: decide by the cell center
            cx, cy = (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0
            if _point_inside(geom, cx, cy):
                m = int(cells.interleave(np.array([ix]), np.array([iy]))[0])
                lo, hi = cells.cell_interval(m, res)
                lo_out.append(int(lo))
                hi_out.append(int(hi))
                full_out.append(True)
            continue
        if res >= max_res:
            m = int(cells.interleave(np.array([ix]), np.array([iy]))[0])
            lo, hi = cells.cell_interval(m, res)
            lo_out.append(int(lo))
            hi_out.append(int(hi))
            full_out.append(False)
            continue
        for dx in (0, 1):
            for dy in (0, 1):
                stack.append((ix * 2 + dx, iy * 2 + dy, res + 1))

    if not lo_out:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), np.empty(0, dtype=bool)
    lo_a = np.array(lo_out, dtype=np.int64)
    hi_a = np.array(hi_out, dtype=np.int64)
    fl_a = np.array(full_out, dtype=bool)
    order = np.argsort(lo_a)
    lo_a, hi_a, fl_a = lo_a[order], hi_a[order], fl_a[order]
    # merge adjacent/contiguous intervals of the SAME kind (full flags
    # must not blend — full intervals skip the exact refine)
    merged_lo, merged_hi, merged_fl = [int(lo_a[0])], [int(hi_a[0])], [bool(fl_a[0])]
    for l, h, fl in zip(lo_a[1:], hi_a[1:], fl_a[1:]):
        if int(l) <= merged_hi[-1] + 1 and bool(fl) == merged_fl[-1]:
            merged_hi[-1] = max(merged_hi[-1], int(h))
        else:
            merged_lo.append(int(l))
            merged_hi.append(int(h))
            merged_fl.append(bool(fl))
    return (
        np.array(merged_lo, dtype=np.int64),
        np.array(merged_hi, dtype=np.int64),
        np.array(merged_fl, dtype=bool),
    )
