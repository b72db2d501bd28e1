"""augdiff_pipeline_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the *semantics* of azavea/augdiff-pipeline
(OSM augmented diffs: minutely entity versions joined against prior state
to emit before/after geometry diffs), re-expressed as idiomatic Spark
DataFrame plans, extended per BASELINE.json with an image/caption fact
table, H3/S2-style cell indexing, point-in-polygon + kNN spatial joins,
ZXY raster tiling with skew handling, and checkpoint/lineage/metrics.

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo under /root/reference (semantics only — no code is
copied; it is Scala/Spark-2.3 driver-side algebra, we are DataFrame-first),
and standard published algorithms (Morton/Z-order curves, even-odd
point-in-polygon, Web Mercator tiling, MinHash/SimHash).
"""

__version__ = "0.1.0"

# Runs on every process that imports the package — driver AND forked
# Python workers (kernel unpickling imports the defining module).  See
# session._pin_malloc_arenas for the measured why.
from .session import _pin_malloc_arenas as _pma  # noqa: E402

_pma()
del _pma
