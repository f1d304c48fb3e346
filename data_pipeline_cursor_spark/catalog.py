"""Catalog DDL — declared tables with format/partition/location properties
(SURVEY.md §2.B B18).

Parity targets:
- the Iceberg lakehouse DDL (/root/reference/trino/sql/init-tables.sql:1-12):
  Parquet + ZSTD (lines 7-8), partitioned hour(ts) (line 11), explicit
  LOCATION (line 10) → Spark `CREATE TABLE ... USING parquet PARTITIONED BY
  (hour) LOCATION ...` (zstd is the session default, session.py);
- the Postgres serving DDL (/root/reference/flink/init-analytics-db.sql:2-10)
  → a managed serving table keyed (event_type, window_start);
- the Flink source DDL (weather-aggregation.sql:2-17) is the streaming
  reader's schema (streaming/sources.py EVENT_SCHEMA), not a catalog table.

At 100 TB the LOCATION is an object-store URI and the catalog is HMS/Glue/
Unity — identical statements; only the URI changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.sources import load_table


def create_lakehouse_table(
    spark: SparkSession, name: str, location: str
) -> None:
    """CREATE TABLE ... USING parquet PARTITIONED BY (hour) LOCATION ...

    The Spark rendition of init-tables.sql:1-12 (engine swap: Iceberg v2 on
    MinIO+HMS → Spark session catalog over partitioned Parquet; USING
    iceberg is a drop-in when the connector ships with the runtime)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""
        CREATE TABLE {name} (
          event_id   BIGINT,
          event_type STRING,
          value      DOUBLE,
          ts         TIMESTAMP,
          hour       STRING
        )
        USING parquet
        PARTITIONED BY (hour)
        LOCATION '{location}'
        """
    )


def create_serving_table(spark: SparkSession, name: str, location: str) -> None:
    """The serving-store DDL (init-analytics-db.sql:2-10): keyed window
    aggregates + last_updated audit column."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""
        CREATE TABLE {name} (
          event_type   STRING,
          window_start TIMESTAMP,
          window_end   TIMESTAMP,
          avg_value    DOUBLE,
          n_events     BIGINT,
          last_updated TIMESTAMP
        )
        USING parquet
        PARTITIONED BY (event_type)
        LOCATION '{location}'
        """
    )


def load_lakehouse(spark: SparkSession, table: str, sf_dir: str) -> None:
    """Populate the lakehouse table from the events fixture with the hour
    partition transform (B13; run.sh:109 hours(ts))."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        "ts",
        F.date_format("ts", "yyyy-MM-dd-HH").alias("hour"),
    )
    ev.write.mode("overwrite").insertInto(table)


def hour_pruned_scan(spark: SparkSession, table: str, hour: str) -> DataFrame:
    """Partition-pruned read (README.md:470-471: WHERE hour(ts) = N).

    The predicate hits the partition column → Catalyst prunes at the file
    index; verify with .explain: 'partition filters: [isnotnull(hour), ...'."""
    return spark.table(table).filter(F.col("hour") == hour)
