"""SparkSession factory with scale-oriented defaults.

Local mode is a single JVM; on a real cluster the same confs apply per
executor. AQE is on so skewed joins re-plan at runtime; Arrow is on for
every pandas-UDF boundary (the engine never uses row-at-a-time Python
UDFs in a hot path).
"""

from __future__ import annotations

import ctypes
import os

from pyspark.sql import SparkSession


def _pin_malloc_arenas() -> None:
    """Keep large allocations in the persistent brk heap instead of
    transient mmaps (glibc M_MMAP_THRESHOLD / M_TRIM_THRESHOLD = 512 MB).

    glibc mmaps big buffers and munmaps them on free, so every large
    numpy temporary re-faults fresh anon pages.  On ballooned VM hosts
    (this sandbox included) first-touch of new pages can run at
    ~10-25 MB/s — measured here: np.repeat into a fresh 1.5 GB buffer
    69-197 s cold vs 0.6 s once the arena is warm, and the SAME kernel
    swings 4 s <-> 0.2 s run-to-run with arena state (BASELINE.md
    methodology).  Pinning the arena makes the fault cost one-time per
    process instead of per-allocation.  No-op where glibc is absent."""
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 29)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 29)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_pin_malloc_arenas()


def get_spark(
    app_name: str = "augdiff-pipeline-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    cores: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to 2x cores — small enough that local
    shuffles don't drown in task overhead, large enough that AQE can
    coalesce rather than split.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores * 2, 8)
    # glibc reads these at process start: the JVM inherits them from
    # this process and the pyspark daemon/workers inherit them from the
    # JVM, so forked workers get pinned arenas even before the package
    # import re-applies mallopt (see _pin_malloc_arenas).
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 29))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 29))
    # One BLAS thread per Python worker: every BLAS-heavy kernel in this
    # engine (minhash verify sgemm, cosine top-k, IVF partials) already
    # runs `cores`-way data-parallel, so OpenBLAS' own threading (up to
    # 4-8 threads per worker on this box) only oversubscribes the CPUs —
    # measured 259 Gflop/s multi vs 56 Gflop/s x 32 workers sequential.
    # Workers inherit this from the JVM, which inherits it from here;
    # set before the JVM starts, overridable by the environment.
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # ANSI is Spark 4's default; the engine is ANSI-clean, keep it on.
        .config("spark.sql.ansi.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
