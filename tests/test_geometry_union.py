"""Overlapping-outer-ring union (the reference's dissolveRings /
JTS unaryUnion step, ingest osm/package.scala:461-468)."""

import numpy as np

from augdiff_pipeline_spark.geometry import assembly, core


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def area_of(rings):
    return sum(core.ring_area(r) for r in rings)


def test_dissolve_two_overlapping_squares():
    a, b = sq(0, 0, 4, 4), sq(2, 2, 6, 6)
    out = assembly.dissolve_rings([a, b])
    assert len(out) == 1
    ring = out[0]
    assert core.is_closed(ring)
    # union area: 16 + 16 - 4 overlap = 28 (CCW positive)
    assert abs(core.ring_area(ring) - 28.0) < 1e-9
    # boundary passes through both crossing points
    pts = {tuple(p) for p in ring}
    assert (4.0, 2.0) in pts and (2.0, 4.0) in pts


def test_dissolve_three_chained_squares():
    rings = [sq(0, 0, 4, 4), sq(3, 0, 7, 4), sq(6, 0, 10, 4)]
    out = assembly.dissolve_rings(rings)
    assert len(out) == 1
    assert abs(core.ring_area(out[0]) - (3 * 16 - 2 * 4)) < 1e-9


def test_dissolve_c_shapes_make_donut():
    """Two C-shapes whose union encloses a hole: re-polygonization must
    emit the hole ring (CW) as well as the exterior (CCW)."""
    # left C: covers x in [0,3], y in [0,5], notch x in [1,3], y in [1,4]
    left = np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 4], [3, 4], [3, 5], [0, 5], [0, 0]], float
    )
    # right bar closing the C into a ring around the notch
    right = sq(2, 0, 3, 5)
    out = assembly.dissolve_rings([left, right])
    outers = [r for r in out if core.ring_area(r) > 0]
    holes = [r for r in out if core.ring_area(r) < 0]
    assert len(outers) == 1 and len(holes) == 1
    # hole is the notch minus the right bar: x in [1,2], y in [1,4] → area 3
    assert abs(core.ring_area(holes[0]) + 3.0) < 1e-9
    assert abs(core.ring_area(outers[0]) - 15.0) < 1e-9  # 3x5 full block
    # exterior area minus hole equals sum of parts minus overlap
    # left C area = 15 - 6 notch = 9; right bar = 5; overlap = 2x1... checked via totals
    assert abs(area_of(out) - 12.0) < 1e-9


def test_build_multipolygon_dissolves_overlapping_outers():
    """Round-1 divergence closed: overlapping outers must render a
    dissolved Polygon, not fall back to None/GeometryCollection."""
    a, b = sq(0, 0, 4, 4), sq(2, 2, 6, 6)
    hole = sq(0.5, 0.5, 1.5, 1.5)
    geom = assembly.build_multipolygon(
        ["outer", "outer", "inner"],
        [core.LineString(a), core.LineString(b), core.LineString(hole)],
        ["way", "way", "way"],
    )
    assert isinstance(geom, core.Polygon), geom
    assert abs(abs(core.ring_area(geom.rings[0])) - 28.0) < 1e-9
    assert len(geom.rings) == 2  # the inner survived allocation
    assert abs(abs(core.ring_area(geom.rings[1])) - 1.0) < 1e-9


def test_build_multipolygon_disjoint_outers_unchanged():
    a, b = sq(0, 0, 2, 2), sq(5, 5, 7, 7)
    geom = assembly.build_multipolygon(
        ["outer", "outer"],
        [core.LineString(a), core.LineString(b)],
        ["way", "way"],
    )
    assert isinstance(geom, core.MultiPolygon) and len(geom.polygons) == 2


def test_dissolve_union_hole_from_outers_becomes_inner():
    """C-shape + bar as relation members: the union hole must appear as
    an interior ring of the assembled polygon."""
    left = np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 4], [3, 4], [3, 5], [0, 5], [0, 0]], float
    )
    right = sq(2, 0, 3, 5)
    geom = assembly.build_multipolygon(
        ["outer", "outer"],
        [core.LineString(left), core.LineString(right)],
        ["way", "way"],
    )
    assert isinstance(geom, core.Polygon)
    assert len(geom.rings) == 2
    assert abs(geom.area - 12.0) < 1e-9


def test_dissolve_rings_pinch_vertex_stays_simple():
    """Two squares touching at exactly one corner: four boundary edges
    meet at the pinch vertex; the leftmost-turn rule must produce
    simple rings (two separate squares or one valid 8-figure split),
    never a self-crossing ring."""
    import numpy as np

    from augdiff_pipeline_spark.geometry.assembly import dissolve_rings
    from augdiff_pipeline_spark.geometry.core import ring_area

    sq1 = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
    sq2 = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    out = dissolve_rings([sq1, sq2])
    # total dissolved area preserved
    assert abs(sum(abs(ring_area(r)) for r in out) - 2.0) < 1e-9
    # every emitted ring is simple: no repeated vertex except closure
    for ring in out:
        pts = [tuple(p) for p in ring[:-1]]
        # the pinch vertex may legitimately appear twice ONLY if the
        # dissolve emits a single combined ring; separate rings must
        # not repeat any vertex
        if len(out) > 1:
            assert len(pts) == len(set(pts)), pts
