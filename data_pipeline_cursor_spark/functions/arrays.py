"""Array / struct / map functions (SURVEY.md §2.B B17, §2.D D24-D25).

Parity anchor: the serving layer regroups rows into per-key collections
(/root/reference/visualization-server/server.js:45-57,81-94) — that's
``collect_list(struct(...))`` here.  Arrays are sorted before comparison
(determinism rule, SURVEY §5.2): collect_list order is partition-dependent,
``sort_array`` makes it canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_array_funcs",
    oracle="""
    SELECT user_id,
           list_sort(list_distinct(list(event_type)))      AS etypes,
           len(list_distinct(list(event_type)))::INTEGER   AS n_etypes,
           CASE WHEN list_contains(list(event_type), 'purchase')
                THEN 1 ELSE 0 END                          AS has_purchase
    FROM events
    GROUP BY user_id
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (D24): collect_list → array_distinct → sort_array,
    size, array_contains."""
    ev = load_table(spark, sf_dir, "events")
    types = F.collect_list("event_type")
    return ev.groupBy("user_id").agg(
        F.sort_array(F.array_distinct(types)).alias("etypes"),
        F.size(F.array_distinct(types)).alias("n_etypes"),
        F.when(F.array_contains(types, "purchase"), 1).otherwise(0).alias(
            "has_purchase"
        ),
    )


@register(
    "q_struct_funcs",
    oracle="""
    SELECT event_id,
           event_type AS s_type,
           ROUND(value, 4) AS s_value
    FROM events
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct create + field access (D25): build a struct, read fields back —
    output flattened to scalars so the oracle stays dialect-neutral."""
    ev = load_table(spark, sf_dir, "events")
    s = F.struct(
        F.col("event_type").alias("etype"), F.round("value", 4).alias("val")
    )
    return ev.select(
        "event_id",
        s.getField("etype").alias("s_type"),
        s.getField("val").alias("s_value"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           'et'                 AS first_key,
           event_type           AS et_value
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (D25): create_map → map_keys / element_at — flattened
    output (DuckDB MAP hashing differs, SURVEY §2.D)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.sort_array(F.map_keys(m)).getItem(0).alias("first_key"),
        F.element_at(m, "et").alias("et_value"),
    )


@register("q_collect_struct")  # rows-only: list-of-struct hashing is fragile (B17)
def collect_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regroup rows → per-key collection of structs (B17). Parity:
    rows → {city: [points]} (/root/reference/visualization-server/server.js:45-57).
    Sorted by (ts, event_id) inside each array for reproducibility."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("points"),
        F.count(F.lit(1)).alias("n_points"),
    )
