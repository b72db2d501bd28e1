"""Custom stateful streaming operator: per-entity version tracker.

Demonstrates the applyInPandasWithState surface (the Spark-native home
for the reference's keyed driver state, T3): the state store holds the
max (version, visible) seen per (id, type); each incoming micro-batch
row is classified create/modify/delete/out_of_order against it — i.e.
the reference's implicit action inference, streaming-native and
distributed, with state checkpointed by Structured Streaming.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("action", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_version", T.LongType()),
        T.StructField("visible", T.BooleanType()),
    ]
)


def _classify(key, pdf_iter, state: GroupState):
    if state.exists:
        max_version, visible = state.get
    else:
        max_version, visible = 0, True
    out_rows = []
    for pdf in pdf_iter:
        for _, r in pdf.sort_values(["version"]).iterrows():
            v = int(r["version"])
            if v <= max_version:
                action = "out_of_order"
            elif not bool(r["visible"]):
                action = "delete"
            elif max_version == 0:
                action = "create"
            else:
                action = "modify"
            if v > max_version:
                max_version, visible = v, bool(r["visible"])
            out_rows.append((int(key[0]), str(key[1]), v, action))
    state.update((max_version, visible))
    yield pd.DataFrame(out_rows, columns=["id", "type", "version", "action"])


def entity_actions_stream(changes: DataFrame) -> DataFrame:
    """changes: streaming DF with (id, type, version, visible, ...)."""
    return (
        changes.select("id", "type", "version", "visible")
        .groupBy("id", "type")
        .applyInPandasWithState(
            _classify,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
