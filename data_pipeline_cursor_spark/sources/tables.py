"""Batch table sources — columnar Parquet scans.

Mirrors the reference's lakehouse read path (Trino → Iceberg/Parquet on
MinIO, /root/reference/trino/etc/catalog/iceberg.properties:1-9): here the
catalog + object store collapse into ``spark.read.parquet`` over a directory.
Catalyst handles predicate pushdown, column pruning and (for partitioned
layouts) partition pruning on these scans — every query in this package is
declared so those optimizations apply (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins the session confs we rely on (UTC tz)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) → read as int64 nanos (legacy conf in
        # session.py), rebuilt here at µs precision.  Integer `div` — float
        # division would lose precision on epoch-nanos (> 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
