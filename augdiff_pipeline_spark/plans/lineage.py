"""Per-partition lineage + metrics tables (north-rule requirement).

Every batch commit records, per stage, the input/output snapshot ids and
per-partition row counts; ``metrics`` records scalar stage measurements.
Resume logic reads the lineage table to find the last fully-committed
sequence number and rolls half-committed table snapshots back — this is
the atomicity the reference lacks (its JSON write, Postgres index write
and ORC flush can interleave a crash: AugmentedDiff.scala:226-233,
ChangeAugmenter.scala:159-163).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LINEAGE_SCHEMA, METRICS_SCHEMA
from ..sources.catalog import SnapshotTable

COMMIT_STAGE = "commit"


class LineageLog:
    """Buffers per-stage rows in memory and flushes ONE lineage append +
    ONE metrics append at commit time — the commit marker row is part of
    the same atomic manifest swap, so lineage never shows stage rows for
    an uncommitted batch (and per-batch snapshot-commit overhead stays
    O(1) instead of O(stages))."""

    def __init__(self, path: str):
        self.lineage = SnapshotTable(path + "/lineage")
        self.metrics = SnapshotTable(path + "/metrics")
        self._pending_lineage: list[tuple] = []
        self._pending_metrics: list[tuple] = []

    def record_stage(
        self,
        spark: SparkSession,
        seq: int,
        stage: str,
        df: DataFrame | None = None,
        input_snapshot: int | None = None,
        output_snapshot: int | None = None,
    ) -> None:
        """Buffer per-partition row counts of ``df`` for (seq, stage)."""
        if df is not None:
            counts = (
                df.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("row_count"))
                .collect()
            )
            for r in counts:
                self._pending_lineage.append(
                    (seq, stage, r["partition_id"], input_snapshot, output_snapshot, r["row_count"])
                )
            if not counts:
                self._pending_lineage.append((seq, stage, -1, input_snapshot, output_snapshot, 0))
        else:
            self._pending_lineage.append((seq, stage, -1, input_snapshot, output_snapshot, None))

    def commit_seq(self, spark: SparkSession, seq: int, snapshots: dict[str, int | None]) -> int:
        self._pending_lineage.append(
            (seq, COMMIT_STAGE, -1, snapshots.get("state"), snapshots.get("index"), None)
        )
        df = spark.createDataFrame(self._pending_lineage, LINEAGE_SCHEMA)
        snap = self.lineage.append(df.coalesce(1), summary={"seq": seq, "stage": COMMIT_STAGE})
        self._pending_lineage = []
        if self._pending_metrics:
            mdf = spark.createDataFrame(self._pending_metrics, METRICS_SCHEMA)
            self.metrics.append(mdf.coalesce(1), summary={"seq": seq})
            self._pending_metrics = []
        # steady-state dir bound: one append per minutely batch would
        # otherwise leave one directory per batch forever, and EVERY
        # restart's committed_seqs() scan unions all of them.  The
        # compaction lands after this seq's commit marker, so the tag is
        # already-committed metadata (safe even if compaction crashes).
        from ..sources.state import KEEP_SNAPSHOTS, SAVE_INTERVAL

        self.lineage.maybe_compact(
            spark, SAVE_INTERVAL, KEEP_SNAPSHOTS,
            schema=LINEAGE_SCHEMA, summary={"seq": seq},
        )
        self.metrics.maybe_compact(
            spark, SAVE_INTERVAL, KEEP_SNAPSHOTS,
            schema=METRICS_SCHEMA, summary={"seq": seq},
        )
        return snap

    def record_metric(self, spark: SparkSession, seq: int, stage: str, metric: str, value: float) -> None:
        self._pending_metrics.append((seq, stage, metric, float(value)))

    def committed_seqs(self, spark: SparkSession) -> list[int]:
        if not self.lineage.exists():
            return []
        df = self.lineage.read(spark, schema=LINEAGE_SCHEMA)
        rows = df.filter(F.col("stage") == COMMIT_STAGE).select("seq").distinct().collect()
        return sorted(r["seq"] for r in rows)

    def last_committed(self, spark: SparkSession) -> int | None:
        seqs = self.committed_seqs(spark)
        return seqs[-1] if seqs else None


class StageTimer:
    def __init__(self, log: LineageLog, spark: SparkSession, seq: int):
        self.log, self.spark, self.seq = log, spark, seq

    def time(self, stage: str):
        log, spark, seq = self.log, self.spark, self.seq

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                log.record_metric(spark, seq, stage, "wall_sec", time.time() - self.t0)
                return False

        return _Ctx()
