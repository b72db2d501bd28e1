"""Structured Streaming drive of the augmented-diff pipeline.

The reference consumes the minutely OSC replication sequence with a
driver loop + exponential-backoff polling (AugmentedDiff.scala:103-158,
206-222 — T1/T2).  Here the same feed is a Structured Streaming file
source: minutely batch files land in a directory (one parquet per seq,
carrying a ``seq`` column), ``readStream`` picks them up, and
``foreachBatch`` routes each seq through plans/augdiff.run_batch — so
checkpointing is two-level: Spark's streaming checkpoint tracks WHICH
files were consumed, and the engine's snapshot/lineage commit protocol
makes each seq's effects atomic and replayable (T3/T4).  Late or
re-delivered files are idempotent: committed seqs are skipped.

A watermarked event-window aggregate (``windowed_event_counts``) covers
the streaming-aggregation surface (late rows beyond the watermark drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.augdiff import run_batch
from ..plans.lineage import LineageLog
from ..plans.runner import _rollback_uncommitted
from ..schemas import OSM_SCHEMA
from ..sources.catalog import SnapshotTable
from ..sources.state import StateTable

CHANGE_STREAM_SCHEMA = T.StructType(
    OSM_SCHEMA.fields + [T.StructField("seq", T.LongType(), False)]
)


def write_change_file(spark: SparkSession, batch_df: DataFrame, seq: int, changes_dir: str) -> None:
    """Producer side: land one minutely batch file (fixture/test helper)."""
    batch_df.withColumn("seq", F.lit(seq).cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)


def stream_augdiff(
    spark: SparkSession,
    changes_dir: str,
    checkpoint_dir: str,
    state: StateTable,
    index: SnapshotTable,
    log: LineageLog,
    out_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start the streaming query; returns the StreamingQuery handle.

    ``max_files_per_trigger=1`` reproduces the reference's granularity
    exactly (one OSC file per micro-batch, AugmentedDiff.scala:206-222);
    the default packs a few files per trigger for catch-up throughput —
    the per-seq loop inside ``process`` commits each seq atomically
    either way."""
    src = (
        spark.readStream.schema(CHANGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changes_dir)
    )

    def process(micro_df: DataFrame, epoch_id: int) -> None:
        # Run the WHOLE batch on the stream's cloned session —
        # micro_df is bound to it, and mixing it with the outer
        # session builds cross-session plans.  AQE is off on the
        # clone: per-batch frames are tiny (AQE's re-planning buys
        # nothing), and AQE's background re-optimization can mint
        # plan nodes with no active session, which NPE
        # (SparkPlan.session is null in resetMetrics) when a long
        # soak re-executes the adaptive plan.  The clone's conf is
        # isolated, so batch-mode queries keep AQE.
        bspark = micro_df.sparkSession
        bspark.conf.set("spark.sql.adaptive.enabled", "false")
        seqs = [r["seq"] for r in micro_df.select("seq").distinct().collect()]
        committed = set(log.committed_seqs(bspark))
        # same crash-recovery contract as plans/runner.resume_and_run: a
        # crash between a state/index append and the lineage COMMIT
        # marker leaves snapshots tagged with an uncommitted seq — roll
        # them back BEFORE rerunning, or the rerun double-appends rows.
        _rollback_uncommitted(state.table, committed)
        _rollback_uncommitted(index, committed)
        for seq in sorted(seqs):
            if seq in committed:
                continue  # idempotent on re-delivery / restart replay
            batch = micro_df.filter(F.col("seq") == seq).drop("seq")
            run_batch(bspark, state, index, log, batch, int(seq), out_dir)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionized_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows: per-user sessions that merge while
    consecutive events arrive within ``gap`` (boundary inclusive — the
    same native session_window operator the batch path
    (operators/temporal.sessionize) uses, so batch and streaming agree
    row-for-row on closed sessions).  Watermark bounds state: sessions
    older than the watermark finalize and evict."""
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding event-time aggregate (late rows past
    the watermark are dropped — the T2 late-data policy, Spark-native)."""
    win = (
        F.window(F.col("ts"), window)
        if slide is None
        else F.window(F.col("ts"), window, slide)
    )
    # watermarks require TIMESTAMP (tz-adjusted); parquet sources often
    # infer TIMESTAMP_NTZ — session tz is pinned UTC, so the cast is exact
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def deduplicated_event_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: the first arrival of each key within the
    watermark horizon passes, re-deliveries drop — the streaming twin
    of ``operators.dedup.exact_dedup_groups``'s keep-first semantics.

    Uses the NATIVE ``dropDuplicatesWithinWatermark`` stateful operator
    (state store keyed by the id columns).  Plain ``dropDuplicates``
    only evicts state when the event-time column is PART of the dedup
    subset — with id-only keys its state grows for the stream's
    lifetime.  The WithinWatermark variant implements exactly the
    horizon-bounded semantics documented here: keys older than the
    watermark are evicted, so state size tracks the dedup window, not
    the stream — the only shape that survives an unbounded stream.
    """
    id_cols = id_cols or ["event_id"]
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(id_cols)
