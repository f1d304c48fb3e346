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


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_valid,
           CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_null,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k
    FROM (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    ) t
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT decode (Spark 4.0 VARIANT type,
    SPARK-45827): ``try_parse_json`` ingests the schemaless payload into
    the binary VARIANT encoding once, then ``try_variant_get`` does typed
    path extraction — the open-format successor to per-path
    get_json_object (q_json_extract_cast) that parses the JSON text once
    per row instead of once per path.

    Same reference anchor as the rest of this module: records are
    schemaless JSON to storage, decoded at query time.  Malformed text →
    NULL variant (try_), missing/uncastable path → NULL value; the
    per-type rollup counts both so tolerance is verified, not assumed.

    Scale shape: parse + extract are per-row JVM expressions inside the
    scan projection (no shuffle until the type-grain aggregate — one
    exchange of |event_type| rows).  At 100 TB the one-parse VARIANT
    column is the thing you'd materialize in the lakehouse; extraction
    then never re-tokenizes text."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int").alias("k")
    return (
        ev.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_valid"),
            (F.count(F.lit(1)) - F.count("k")).alias("n_null"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
