"""JSON functions (SURVEY.md §2.A A4, §2.D D26).

Parity anchor: the reference's records are schemaless JSON all the way to
storage (/root/reference/logging-server/server.py:70,
/root/reference/compose.yaml:171-172 `schemas.enable=false`), decoded at
query time.  ``events.props`` plays that role here (FIXTURES.md §2).

Two decode styles, both JVM-side:
- ``get_json_object`` — per-path extraction (Trino-style ad-hoc),
- ``from_json`` with an explicit schema — the PERMISSIVE-mode typed decode
  the streaming path uses (malformed → NULL row, mirroring Flink's
  json.ignore-parse-errors, /root/reference/flink/sql/weather-aggregation.sql:15-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_json_extract_cast",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k_val
    FROM events
    """,
)
def json_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction + cast (A4/D26): get_json_object ≡ json_extract_string.
    Schema-on-read casting is a load-bearing reference semantic
    (SURVEY.md §1.1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@register(
    "q_json_typed_decode",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k_val,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def json_typed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed decode via from_json(schema) in PERMISSIVE mode (A4): malformed
    documents yield NULL fields instead of failing the query — the batch
    mirror of Flink's error-tolerant Kafka JSON source.

    Validity can't come from the from_json result: since Spark 3.0 PERMISSIVE
    mode returns an all-null-fields row (not a NULL struct) for malformed
    input.  ``try_parse_json`` parses to VARIANT and returns NULL for any
    malformed document, matching DuckDB's ``json_valid`` on both objects and
    bare scalars."""
    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    decoded = ev.withColumn("j", F.from_json("props", schema))
    return decoded.select(
        "event_id",
        F.col("j.k").alias("k_val"),
        F.when(F.try_parse_json("props").isNotNull(), 1)
        .otherwise(0)
        .alias("is_valid"),
    )
