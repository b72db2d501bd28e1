"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set mirrors the north-star metric (images+geometries
joined+tiled per second) plus the relational/window/dedup spine:

  pip_tile   — image fact table → broadcast sorted-interval PIP join
               against the OSM polygon layer → ZXY tile assignment →
               per-feature rollup (count action)
  knn        — ring-expansion kNN of every image to fixture nodes
  tile_cut   — salted repartition + decode/crop/re-encode raster tiles
               (10k-image slice; per-image work dominates)
  group_agg  — TPC-H-Q1-shaped aggregate on lineitem
  top1_window— latest-event-per-user window on events
  minhash    — MinHash-LSH near-dup pairs on documents

The synthetic image table is generated once per sf (in parallel via
mapInPandas) and cached under /tmp so generation never pollutes timings.
Scaling-efficiency evidence (same job at two parallelism levels) is
produced by bench_scaling.py, which shells out to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

N_IMAGES_PER_SF = 5_000_000  # sf0.1 -> 500k images (FIXTURES.md §4)


def build_image_table(spark, sf: float, cache_dir: str = "/tmp/spark_graft_bench_cache", n: int | None = None):
    """Generate (or load) the deterministic image fact table, in parallel."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = n or max(int(N_IMAGES_PER_SF * sf), 10_000)
    path = os.path.join(cache_dir, f"images_n{n}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path), n

    from augdiff_pipeline_spark import fixtures

    # parallel synthesis: each partition generates its slice with the same
    # deterministic per-index RNG the fixtures module uses; 64 output
    # partitions divide evenly into both scaling core counts (8 and 32)
    chunk = max(2_000, n // 64)
    starts = list(range(0, n, chunk))
    sdf = spark.createDataFrame(
        [(s, min(chunk, n - s)) for s in starts], "start long, cnt long"
    ).repartition(min(len(starts), 256))

    def gen(it):
        for pdf in it:
            for s, c in zip(pdf["start"], pdf["cnt"]):
                rows = fixtures.image_rows(int(c), seed=fixtures.SEED + int(s))
                rows["image_id"] = [f"img_{int(s)+i:09d}" for i in range(int(c))]
                yield rows

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, lat double, lon double"
    )
    sdf.mapInPandas(gen, schema).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), n


def build_meta_table(spark, n: int, cache_dir: str = "/tmp/spark_graft_bench_cache"):
    """Geotag-only fact table (image_id, lon, lat) — what column pruning
    leaves of the image table for the pip/knn paths.  Cheap to generate
    at tens of millions of rows, so scaling runs get enough per-core
    compute to dominate fixed job overhead without tens of GB of blobs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    path = os.path.join(cache_dir, f"meta2_n{n}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)

    chunk = max(50_000, n // 128)
    sdf = spark.createDataFrame(
        [(s, min(chunk, n - s)) for s in range(0, n, chunk)], "start long, cnt long"
    ).repartition(128)

    def gen(it):
        from augdiff_pipeline_spark import fixtures

        for pdf in it:
            for s, c in zip(pdf["start"], pdf["cnt"]):
                s, c = int(s), int(c)
                rng = np.random.default_rng(fixtures.SEED + s)
                centers_lon = rng.uniform(10.0, 10.1, 20)
                centers_lat = rng.uniform(50.0, 50.1, 20)
                zipf = 1.0 / np.arange(1, 21) ** 1.5
                zipf /= zipf.sum()
                which = rng.random(c)
                ci = rng.choice(20, size=c, p=zipf)
                lon = np.where(which < 0.85, centers_lon[ci] + rng.normal(0, 0.002, c),
                               rng.uniform(9.95, 10.15, c))
                lat = np.where(which < 0.85, centers_lat[ci] + rng.normal(0, 0.002, c),
                               rng.uniform(49.95, 50.15, c))
                yield pd.DataFrame(
                    {"image_id": [f"img_{s+i:010d}" for i in range(c)],
                     "lon": lon, "lat": lat}
                )

    sdf.mapInPandas(gen, "image_id string, lon double, lat double").withColumn(
        "img_no", F.xxhash64(F.col("image_id"))
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def build_docs_table(spark, n: int, cache_dir: str = "/tmp/spark_graft_bench_cache"):
    """Deterministic synthetic documents table for scaling runs: the sf
    tables' documents are too small (5k rows at sf0.1) for the minhash
    kernel to dominate fixed job overhead at 1 core, so scaling evidence
    uses an n-row corpus (~300 chars/doc, ~10% near-duplicates so LSH
    buckets and the verify stage do real work)."""
    import numpy as np
    import pandas as pd

    path = os.path.join(cache_dir, f"docs_n{n}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)

    chunk = max(10_000, n // 64)
    sdf = spark.createDataFrame(
        [(s, min(chunk, n - s)) for s in range(0, n, chunk)], "start long, cnt long"
    ).repartition(64)

    def gen(it):
        vocab = None
        for pdf in it:
            for s, c in zip(pdf["start"], pdf["cnt"]):
                s, c = int(s), int(c)
                rng = np.random.default_rng(991 + s)
                if vocab is None:
                    vrng = np.random.default_rng(17)
                    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
                    vocab = np.array([
                        "".join(vrng.choice(letters, vrng.integers(3, 9)))
                        for _ in range(4096)
                    ])
                words = rng.integers(0, len(vocab), (c, 45))
                texts = [" ".join(vocab[w]) for w in words]
                # ~10% near-duplicates: re-emit an earlier doc in the
                # chunk with one word changed
                dup = rng.random(c) < 0.1
                for i in np.flatnonzero(dup):
                    j = int(rng.integers(0, max(i, 1)))
                    w = words[j].copy()
                    w[int(rng.integers(0, 45))] = int(rng.integers(0, len(vocab)))
                    texts[i] = " ".join(vocab[w])
                yield pd.DataFrame(
                    {"doc_id": np.arange(s, s + c, dtype=np.int64), "text": texts}
                )

    sdf.mapInPandas(gen, "doc_id long, text string").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    scaling_mode = os.environ.get("SPARK_GRAFT_BENCH_MODE") == "scaling"

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from augdiff_pipeline_spark import fixtures
    from augdiff_pipeline_spark.functions import mercator
    from augdiff_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from augdiff_pipeline_spark.operators.knn import knn_join
    from augdiff_pipeline_spark.operators.spatial_join import pip_join_broadcast
    from augdiff_pipeline_spark.operators.tiling import assign_tiles, cut_tiles
    from augdiff_pipeline_spark.plans.polygon_layer import build_polygon_layer
    from augdiff_pipeline_spark.session import get_spark

    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(2 * cpus, 16),
        # sizes tuned to bench data volume: AQE advisory so post-shuffle
        # parallelism survives, and input-split size so the scan yields
        # >= cores tasks (500MB of input under the 128MB default packs
        # into ~9 splits and caps every downstream stage at 9 tasks; at
        # production volumes the defaults are right)
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )

    from augdiff_pipeline_spark.operators.spatial_join import cell_equi_join

    images, n_images = build_image_table(spark, sf)
    if scaling_mode:
        # meta-only fact table for pip/knn (column pruning leaves exactly
        # this at production scale); blobs only feed the tile_cut sample.
        # Numeric surrogate ids: string ids make the Arrow path memory-
        # bandwidth-bound, which on ONE box stops scaling past ~8 cores —
        # a box limit, not a plan property (4N executors = 4x bandwidth).
        n_meta = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "20000000"))
        meta = build_meta_table(spark, n_meta).select(
            F.col("img_no").alias("image_id"), "lon", "lat"
        )
    else:
        n_meta = n_images
        # right-size the 3-column meta table: the 4 MB input-split conf
        # is tuned for the BLOB table and leaves ~500 splits here, and
        # each mapInPandas/mapInArrow task pays ~80-100 ms of fixed
        # Python-worker cost — 2 partitions/core cuts ~3.5 s of pure
        # task overhead from every fact-side query (measured)
        meta = (
            images.select("image_id", "lon", "lat")
            .repartition(2 * cpus)
            .localCheckpoint(eager=True)
        )
    # finer cover -> most interior hits resolve JVM-side in the hybrid
    # cell join (only the boundary band crosses into Arrow)
    layer = build_polygon_layer(
        spark, fixtures.base_state_df(spark), max_res=17
    ).localCheckpoint(eager=True)

    import pandas as pd

    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "feature_id": list(fixtures.NODE_COORDS.keys()),
                "lon": [c[0] for c in fixtures.NODE_COORDS.values()],
                "lat": [c[1] for c in fixtures.NODE_COORDS.values()],
            }
        )
    )

    # warm the Python workers (spawn + numpy/pandas import) so timings
    # measure steady-state throughput, not one-time worker startup —
    # on a long-lived cluster workers stay warm across batches anyway
    def _noop(it):
        for pdf in it:
            yield pdf.iloc[:0]

    meta.mapInPandas(_noop, meta.schema).count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # min-of-5 by default: the first repetition also warms per-layer
    # artifacts (prefilter covers memo) exactly as a long-lived job
    # would, and the extra repeats guard against this box's documented
    # run-to-run noise (individual reps observed 3.8s..32s for the SAME
    # query in one process — extrinsic host contention; min-of-5 keeps
    # the recorded number at the reproducible fast mode, min-of-3 was a
    # dice roll; see BASELINE.md methodology)
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "5"))
    only = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if q.strip()
    }
    debug_reps = os.environ.get("SPARK_GRAFT_BENCH_DEBUG") == "1"

    # Per-session host calibration (VERDICT r4 #1): a fixed pure-JVM
    # codegen aggregate — no Python workers, no disk, no shuffle — whose
    # cost depends only on the host's CPU/memory state.  Recorded in the
    # artifact so any round-over-round comparison can be normalized for
    # the documented ballooned-VM drift (BASELINE.md methodology): if
    # calib moved 2x between rounds, so did every other number.
    def calib():
        # pmod bounds the sum far below long overflow (ANSI mode throws)
        return (
            spark.range(0, 400_000_000)
            .select(F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("h"))
            .agg(F.sum("h"))
            .collect()
        )

    creps = []
    for _ in range(3):
        t0 = time.time()
        calib()
        creps.append(round(time.time() - t0, 3))
    extras["calib_jvm_sec"] = min(creps)
    extras["calib_jvm_max_sec"] = max(creps)
    if debug_reps:
        print(f"# calib_jvm reps: {creps}", file=sys.stderr)

    def timed(name, fn):
        if only and name not in only:
            return None
        best = float("inf")
        reps = []
        for _ in range(repeat):
            t0 = time.time()
            out = fn()
            reps.append(round(time.time() - t0, 3))
            best = min(best, reps[-1])
        if debug_reps:
            print(f"# {name} reps: {reps}", file=sys.stderr)
        timings[name] = round(best, 3)
        return out

    def ab_timed(name, fn_a, label_a, fn_b, label_b):
        """Same-session interleaved A/B (VERDICT r4 #1/#3): reps of the
        two plans alternate A,B,A,B,... so both see the same host state;
        the headline number is plan A's min, and BOTH mins land in
        extras — the artifact itself carries the comparison instead of
        prose claims about separate sessions."""
        if only and name not in only:
            return
        reps_a, reps_b = [], []
        for _ in range(repeat):
            t0 = time.time()
            fn_a()
            reps_a.append(round(time.time() - t0, 3))
            t0 = time.time()
            fn_b()
            reps_b.append(round(time.time() - t0, 3))
        if debug_reps:
            print(f"# {name} A({label_a}) reps: {reps_a}", file=sys.stderr)
            print(f"# {name} B({label_b}) reps: {reps_b}", file=sys.stderr)
        timings[name] = min(reps_a)
        extras[f"{name}_{label_a}_sec"] = min(reps_a)
        extras[f"{name}_{label_b}_sec"] = min(reps_b)

    # 1. PIP join + tile assignment (the headline metric) — tiles are
    # native Column exprs computed in the SAME scan and carried through
    # the join, so the whole pipeline is one pass + one tiny aggregate
    # shuffle (never a self-join back onto the fact table).  The hybrid
    # cell join keeps interior hits fully JVM-side.
    def pip_tile():
        assigned = assign_tiles(meta, z=14)
        joined = cell_equi_join(assigned, layer, res=16, passthrough=["x", "y"])
        out = joined.groupBy("feature_id").agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("x", "y").alias("tiles")
        )
        return out.count()

    timed("pip_tile", pip_tile)
    if "pip_tile" in timings:
        extras["pip_tile_images_per_sec"] = round(n_meta / timings["pip_tile"], 1)

    # 1b. same join through the broadcast sorted-interval kernel (the
    # strategy for layers too big to explode into cover cells)
    def pip_scan():
        return pip_join_broadcast(meta, layer).count()

    timed("pip_scan", pip_scan)
    if "pip_scan" in timings:
        extras["pip_scan_images_per_sec"] = round(n_meta / timings["pip_scan"], 1)

    # 2. kNN
    timed("knn", lambda: knn_join(meta, feats, k=3, res=10).count())
    if "knn" in timings:
        extras["knn_images_per_sec"] = round(n_meta / timings["knn"], 1)

    # 3. tile cut on a ~10k-image hash sample (decode/crop/encode
    # dominated; a hash filter keeps the sample spread across ALL input
    # partitions — limit() would collapse to one task and serialize)
    if not only or "tile_cut" in only:
        tile_sample = int(os.environ.get("SPARK_GRAFT_TILE_SAMPLE", "10000"))
        frac = max(1, n_images // tile_sample)
        img_slice = images.filter(
            F.pmod(F.xxhash64(F.col("image_id")), F.lit(frac)) == 0
        ).localCheckpoint(eager=True)
        slice_n = img_slice.count()

        # salt 32 / 32 cut partitions: the Zipf-hot tiles split finely
        # enough that no single task gates the stage (measured: faster at
        # every core count AND the best 1→4 scaling ratio)
        def cut(batched: bool):
            return cut_tiles(
                assign_tiles(img_slice, z=14, salt_n=32), tile_px=16,
                shuffle_partitions=32, batched=batched,
            ).count()

        if scaling_mode:
            timed("tile_cut", lambda: cut(True))
        else:
            # interleaved A/B of the round-4 batched kernel vs the
            # round-3 per-image scalar kernel (identical rows,
            # equivalence-tested): attributes any recorded regression
            # to host vs code inside the artifact itself (VERDICT r4 #3)
            ab_timed("tile_cut", lambda: cut(True), "batched", lambda: cut(False), "scalar")
        if "tile_cut" in timings:
            extras["tile_cut_images_per_sec"] = round(slice_n / timings["tile_cut"], 1)

        # e2e image feature extraction (decode -> phash/means/std/thumb,
        # shape-stacked batch kernel) on the same slice — recorded as an
        # extra so the headline suite stays round-over-round comparable
        from augdiff_pipeline_spark.operators.multimodal import image_features

        t0 = time.time()
        image_features(img_slice).count()
        best_feat = time.time() - t0
        for _ in range(repeat - 1):
            t0 = time.time()
            image_features(img_slice).count()
            best_feat = min(best_feat, time.time() - t0)
        extras["img_features_sec"] = round(best_feat, 3)
        extras["img_features_images_per_sec"] = round(slice_n / best_feat, 1)

    # 4-6. relational spine on the driver tables
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def group_agg():
        rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(24,6)")
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(rev).alias("rev"))
            .count()
        )

    timed("group_agg", group_agg)

    def top1():
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        return ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).count()

    timed("top1_window", top1)
    # production LSH parameters (32 bands x 4 rows: ~0.87 recall at the
    # 0.5 threshold, candidate volume bounded) — the CONTRACT query q19
    # instead runs the exactness config (64x2 bands, recall-lossless)
    # which is the right trade at sf0.01 but floods the verify stage
    # with low-similarity candidates at 500k docs.  The repartition
    # spreads the signature kernel across cores: the sf0.1 table is one
    # parquet split, which would serialize the whole stage on one task
    # (production corpora arrive in thousands of splits).  One
    # partition per core: the batch-vectorized signature kernel gains
    # more from bigger Arrow batches than from finer scheduling, and
    # each extra mapInPandas task costs ~100ms fixed (measured; see
    # BASELINE.md methodology).
    if scaling_mode and (not only or "minhash" in only):
        # scaled corpus (see build_docs_table): per-core kernel work must
        # dominate fixed job overhead for the N->4N ratio to measure the
        # PLAN rather than the scheduler
        docs = build_docs_table(
            spark, int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
        )

    def mh(**kw):
        return minhash_lsh_pairs(
            docs.repartition(cpus), num_perm=128, bands=32, jaccard_threshold=0.5, **kw
        ).count()

    # interleaved A/B of the two verify plans in ONE session (VERDICT r4
    # #1): the fused single-pass plan (headline) vs the round-3 shape —
    # bucket pairs shuffled + joined back onto text, forced by zeroing
    # the broadcast budget.  Both routes are output-identical
    # (route-parity-tested); the artifact records both mins.  Scaling
    # runs time only the headline plan.
    if scaling_mode:
        timed("minhash", mh)
    else:
        ab_timed("minhash", mh, "fused",
                 lambda: mh(max_shingle_broadcast_bytes=0), "r3shape")

    # steady-state streaming batch latency: drive the full augdiff
    # micro-batch pipeline (closure -> point-lookup -> histories ->
    # geometry -> emission -> snapshot commits, compaction+expiry live)
    # over a synthetic minutely sequence and record the mean latency of
    # the SECOND half — by then every table has been through at least
    # one compact/expire cycle, so the number is the steady-state cost
    # the reference's unbounded minutely mode would see, not warmup.
    # One measurement (not min-of-N): each batch is itself a sample.
    if not only or "stream_soak" in only:
        import shutil
        import tempfile

        from augdiff_pipeline_spark.operators.closure import (
            edges_from_rows,
            transitive_closure,
        )
        from augdiff_pipeline_spark.plans.lineage import LineageLog
        from augdiff_pipeline_spark.plans.runner import resume_and_run
        from augdiff_pipeline_spark.sources.catalog import SnapshotTable
        from augdiff_pipeline_spark.sources.state import StateTable

        n_soak = int(os.environ.get("SPARK_GRAFT_SOAK_BATCHES", "12"))
        root = tempfile.mkdtemp(prefix="spark_graft_soak_")
        try:
            state = StateTable(root + "/state", save_interval=5, keep_snapshots=8)
            index = SnapshotTable(root + "/index")
            log = LineageLog(root + "/log")
            base_df = fixtures.base_state_df(spark)
            state.init(base_df)
            index.overwrite(transitive_closure(edges_from_rows(base_df)))
            batches = dict(fixtures.change_batch_rows())
            batches.update(fixtures.soak_batch_rows(max(0, n_soak - len(batches))))
            lat = []
            stage_acc: dict[str, list[float]] = {}
            for seq in sorted(batches)[:n_soak]:
                bdf = fixtures.soak_batch_df(spark, batches[seq])
                t0 = time.time()
                res = resume_and_run(spark, state, index, log, root + "/out",
                                     {seq: lambda bdf=bdf: bdf})
                lat.append(time.time() - t0)
                for r in res.values():
                    for k, v in r.get("stage_sec", {}).items():
                        stage_acc.setdefault(k, []).append(v)
            steady = lat[len(lat) // 2:]
            extras["stream_soak_batches"] = len(lat)
            extras["stream_soak_steady_batch_sec"] = round(sum(steady) / len(steady), 3)
            extras["stream_soak_p_max_sec"] = round(max(steady), 3)
            # per-stage breakdown over the same steady half (VERDICT r4
            # #2): where each batch's wall-clock actually goes
            for k, vals in stage_acc.items():
                sv = vals[len(vals) // 2:]
                extras[f"stream_stage_{k}_sec"] = round(sum(sv) / len(sv), 3)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_images": n_meta,
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
