"""data_pipeline_cursor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference streaming-lakehouse
pipeline (rejithry/data-pipeline-cursor, studied read-only at
/root/reference/).

The reference composes Kafka + Flink SQL + Iceberg/Trino + Postgres
declaratively (see SURVEY.md §0).  Here the whole pipeline collapses into ONE
engine: a SparkSession whose

- Spark SQL / DataFrame API replaces Trino batch SQL,
- Structured Streaming replaces the Flink job + Kafka Connect sink,
- session catalog + partitioned Parquet replaces Hive-Metastore + Iceberg,
- ``foreachBatch`` keyed MERGE replaces the Postgres upsert serving store.

Everything is declarative DataFrame / SQL — Catalyst plans, Tungsten executes.
No RDD code anywhere; Python UDFs only where built-ins genuinely cannot
express the semantics (and then Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
