"""One-off measurement: the cell_equi_join >512MB shuffle-refine branch
vs the broadcast-geometry branch at scale (the spatial twin of
BASELINE.md's kNN strategy-crossover table).

The shuffle branch exists for layers whose geometry bytes exceed the
broadcast budget; this script times BOTH branches on the SAME workload
(forcing the shuffle route with max_geom_broadcast_bytes=0) so the cost
of not broadcasting is a measured number, not a shape argument.

Run:  python bench_spatial_fallback.py  (quiet host; local[32])
Env:  SPARK_GRAFT_FALLBACK_IMAGES (default 500000)
      SPARK_GRAFT_FALLBACK_GRID   (default 40 -> 1600 polygons)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    n_images = int(os.environ.get("SPARK_GRAFT_FALLBACK_IMAGES", "500000"))
    grid_n = int(os.environ.get("SPARK_GRAFT_FALLBACK_GRID", "40"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from augdiff_pipeline_spark import fixtures
    from augdiff_pipeline_spark.operators.spatial_join import cell_equi_join
    from augdiff_pipeline_spark.plans.polygon_layer import build_polygon_layer
    from augdiff_pipeline_spark.session import get_spark
    from bench import build_meta_table

    spark = get_spark(
        "bench-spatial-fallback", cores=cpus, shuffle_partitions=2 * cpus,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m"},
    )
    meta = build_meta_table(spark, n_images).select(
        F.col("img_no").alias("image_id"), "lon", "lat"
    ).repartition(2 * cpus).localCheckpoint(eager=True)
    layer = build_polygon_layer(
        spark, fixtures.dense_grid_state_df(spark, n=grid_n), max_res=16
    ).localCheckpoint(eager=True)
    n_feats = layer.count()

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 2)

    # warm python workers + cover memo
    rows_b = cell_equi_join(meta, layer, res=14).count()
    t_broadcast = timed(lambda: cell_equi_join(meta, layer, res=14).count())
    # force the no-driver-state route (what an over-budget layer takes)
    rows_s = cell_equi_join(
        meta, layer, res=14, max_geom_broadcast_bytes=0
    ).count()
    t_shuffle = timed(
        lambda: cell_equi_join(meta, layer, res=14, max_geom_broadcast_bytes=0).count()
    )
    assert rows_b == rows_s, (rows_b, rows_s)  # branches must agree

    print(json.dumps({
        "n_images": n_images, "n_polygons": n_feats, "rows": rows_b,
        "broadcast_branch_sec": t_broadcast,
        "shuffle_refine_branch_sec": t_shuffle,
        "overhead_ratio": round(t_shuffle / t_broadcast, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
