"""Temporal join/window operators: as-of join and session windows.

Beyond the reference's operator set (its AugmentedDiff loop is the only
temporal machinery — AugmentedDiff.scala:206-233); these are the
time-series primitives a training-data pipeline needs at 100 TB, built
as single-shuffle native plans:

- ``asof_join``: the classic union-tag + running-last pattern — both
  sides are unioned (right rows tagged 0, left rows 1), sorted within
  each key partition by (ts, side), and every left row picks up the
  most recent right row via last(ignorenulls) over the running window.
  ONE shuffle on the join keys, no range explosion, no skew amplification
  (a hot key stays one partition's sort, not a cross product).
- ``sessionize``: native ``session_window`` groupBy (same operator
  Structured Streaming uses, so the batch and streaming plans agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with the same keys
    and right.ts <= left.ts (inclusive).  Output: all left columns plus
    ``prefix + ts`` and ``prefix + c`` for each requested right column.
    Left rows with no prior right row are dropped (inner as-of)."""
    carried = [ts] + [c for c in right_cols if c != ts]
    # the carried right columns travel as ONE struct and a single
    # last(ignorenulls) picks the whole matched row — back-filling each
    # column independently would stitch values from DIFFERENT right
    # rows whenever a newer right row holds a genuine NULL in one
    # carried column (non-standard as-of semantics)
    r = right.select(
        *keys,
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_asof_row"),
    )
    struct_type = r.schema["_asof_row"].dataType
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_row", F.lit(None).cast(struct_type)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in left.columns],
        F.last("_asof_row", ignorenulls=True).over(w).alias("_asof_row"),
        F.col("_side"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .filter(F.col("_asof_row").isNotNull())
        .select(
            *[c for c in left.columns],
            *[F.col(f"_asof_row.{c}").alias(f"{prefix}{c}") for c in carried],
        )
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """(key, session_start, session_end, n_events) via native
    session_window — sessions merge while consecutive events are < gap
    apart; session_end = last event + gap."""
    return (
        events.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
