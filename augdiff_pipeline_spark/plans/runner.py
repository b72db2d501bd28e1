"""Resumable batch runner: replay the minutely sequence from the last
fully-committed batch (north rule: any minutely batch can resume
mid-stream).

Commit protocol per batch (plans/augdiff.run_batch): features file →
state append → index append → lineage COMMIT marker (last).  A crash
leaves at most: orphan feature files (overwritten on rerun) and
state/index snapshots tagged with an uncommitted seq.  Resume rolls the
tables back to their last snapshot whose seq is committed, then reruns —
snapshot isolation gives the atomicity the reference's flush protocol
lacks (AugmentedDiff.scala:226-233 can lose state between the JSON write
and the index write).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import SnapshotTable
from ..sources.state import StateTable
from .augdiff import run_batch
from .lineage import LineageLog


def _rollback_uncommitted(table: SnapshotTable, committed: set[int]) -> None:
    """Roll back to the newest snapshot not tagged with an uncommitted seq."""
    snaps = table.snapshots()
    if not snaps:
        return
    target = None
    for s in snaps:
        seq = s.summary.get("seq")
        if s.operation == "rollback":
            continue
        if seq is None or seq in committed:
            target = s
    cur = snaps[-1]
    if target is None:
        # Every retained snapshot is tagged with an UNCOMMITTED seq:
        # expiry has reclaimed all committed rollback targets (possible
        # only with keep_snapshots <= save_interval, which the table
        # constructors reject — but a hand-built manifest can still get
        # here).  Silently skipping the rollback would let the rerun
        # double-append the uncommitted rows; fail loudly instead.
        raise RuntimeError(
            f"resume cannot roll back {table.path}: newest snapshot is "
            f"tagged with uncommitted seq {cur.summary.get('seq')!r} and "
            "no committed rollback target survives in the manifest "
            "(snapshot expiry outran the commit cadence — raise "
            "keep_snapshots above save_interval)"
        )
    if target.snapshot_id != cur.snapshot_id:
        table.rollback_to(target.snapshot_id)


def resume_and_run(
    spark: SparkSession,
    state: StateTable,
    index: SnapshotTable,
    log: LineageLog,
    out_dir: str,
    batches: dict[int, Callable[[], DataFrame]],
) -> dict[int, dict]:
    committed = set(log.committed_seqs(spark))
    _rollback_uncommitted(state.table, committed)
    _rollback_uncommitted(index, committed)

    results: dict[int, dict] = {}
    for seq in sorted(batches):
        if seq in committed:
            continue
        results[seq] = run_batch(spark, state, index, log, batches[seq](), seq, out_dir)
    return results
