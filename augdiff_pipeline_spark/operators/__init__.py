"""Engine operators: closure, histories, spatial joins, tiling, dedup,
similarity, image kernels — each a DataFrame-plan builder or Arrow-UDF
kernel, never driver-side row loops."""
