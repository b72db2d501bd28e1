"""Pure-numpy geometry kernel (no shapely/JTS in this environment).

Lightweight geometry values passed between Spark stages as WKB binary
columns; all hot-path predicates (point-in-polygon, bbox) are vectorized
numpy over Arrow batches.
"""

from .core import (  # noqa: F401
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
    ring_area,
    is_closed,
)
