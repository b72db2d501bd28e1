"""JDBC sinks (reference parity: PostgresBackend.scala:20-58 — S5 bulk
CopyManager sink, S6 row-at-a-time upsert sink).

The reference pushes its edge index into Postgres two ways: a bulk COPY
for initial load and per-row statements for incremental updates.  Spark's
native JDBC writer covers both shapes — ``batchsize`` controls whether
the executor-side inserts are batched (bulk) or issued row-at-a-time.
In this sandbox the sink is exercised against embedded Derby (the JDBC
driver shipped with Spark); against Postgres only the URL/driver change.

Scale shape: df.write.jdbc parallelizes across the DataFrame's
partitions — one connection per partition, inserts inside a transaction
per partition.  ``coalesce`` before writing bounds connection count;
``numPartitions`` option does the same declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc_bulk(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1024,
    max_connections: int = 8,
) -> None:
    """S5: bulk sink — batched inserts (the CopyManager analog).
    batchsize mirrors the reference's groupLimit=1024 (Common.scala:29)."""
    (
        df.coalesce(max_connections)
        .write.option("batchsize", str(batchsize))
        .jdbc(url, table, mode=mode)
    )


def write_jdbc_rows(df: DataFrame, url: str, table: str, mode: str = "append") -> None:
    """S6: row-at-a-time sink (the incremental-update analog)."""
    df.coalesce(1).write.option("batchsize", "1").jdbc(url, table, mode=mode)


def read_jdbc(spark: SparkSession, url: str, table: str) -> DataFrame:
    return spark.read.jdbc(url, table)
