"""Relational core — projections, derived columns, casts, filters, sort/limit,
distinct, CASE/NULL handling (SURVEY.md §2.B B1-B11, §2.D D18/D20/D29/D30).

These are the operators the reference's own queries exercise: the Flink job's
projection/cast/derived-column (/root/reference/flink/sql/weather-aggregation.sql:39-45),
Trino's documented ad-hoc filters (/root/reference/README.md:461-482), and the
serving API's predicates (/root/reference/visualization-server/server.js:35-104).

Scale notes (100 TB): every query here is a narrow single-stage scan —
filter + projection reach the parquet reader (PushedFilters / ReadSchema in
the explain), no shuffle except the explicit global sorts, which at scale are
TakeOrderedAndProject (sort-limit pushed into each partition, driver merges
k·partitions rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_scan_project",
    oracle="SELECT event_id, event_type, value FROM events",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection (B1). Parity: SELECT city, avg_temperature, last_updated
    (/root/reference/visualization-server/server.js:38)."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


@register(
    "q_derived_col",
    oracle="""
    SELECT event_id,
           CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS event_time
    FROM events
    """,
)
def derived_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed column (B2): string-formatted timestamp re-parsed, mirroring
    the reference's stringly-typed ts → TO_TIMESTAMP(ts,'yyyy-MM-dd HH:mm:ss')
    (/root/reference/flink/sql/weather-aggregation.sql:6)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("event_time"),
    )


@register(
    "q_cast",
    oracle="""
    SELECT event_id,
           ROUND(CAST(CAST(value AS VARCHAR) AS DOUBLE), 4) AS value_d
    FROM events
    """,
)
def cast_string_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast string→double (B3). Parity: CAST(temperature AS DOUBLE)
    (/root/reference/flink/sql/weather-aggregation.sql:41) — the reference
    keeps numerics as strings until query time (schema-on-read)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.col("value").cast("string").cast("double"), 4).alias("value_d"),
    )


@register(
    "q_hour_filter",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE EXTRACT(HOUR FROM ts) = 14
    """,
)
def hour_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter on the partition transform (B4). Parity:
    WHERE hour(ts) = 14 (/root/reference/README.md:471) — on an hour-
    partitioned lakehouse layout this prunes partitions instead of scanning."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.hour("ts") == 14).select("event_id", "event_type", "value")


@register(
    "q_time_range",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open time-range filter (B5). Parity:
    ts >= TIMESTAMP '…' AND ts < TIMESTAMP '…' (/root/reference/README.md:480-481).
    The predicate pushes down to the parquet scan (row-group min/max skip)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "event_type", "value")


@register(
    "q_sort_limit",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort DESC + LIMIT (B10/D18). Parity: ORDER BY window_start DESC LIMIT 10
    (/root/reference/README.md:491).  event_id tie-break keeps the limit
    deterministic.  Physical plan is TakeOrderedAndProject: per-partition
    top-k + driver merge — no global sort even at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(10)
        .select("event_id", "event_type", "value")
    )


@register(
    "q_order_multi",
    oracle="""
    SELECT event_type, user_id, event_id
    FROM events
    WHERE user_id < 10
    ORDER BY event_type, user_id
    """,
)
def order_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ASC sort (B11). Parity: ORDER BY city, last_updated ASC
    (/root/reference/visualization-server/server.js:41,78)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 10)
        .orderBy("event_type", "user_id")
        .select("event_type", "user_id", "event_id")
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT event_type, user_id FROM events",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (D20) — a hash aggregate on the projected keys;
    map-side partial dedup keeps the shuffle proportional to distinct keys,
    not input rows."""
    return load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()


@register(
    "q_case_when",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 100 THEN 'high'
                WHEN value > 50  THEN 'mid'
                ELSE 'low' END AS band
    FROM events
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN (D29) — whole-stage-codegen'd branch expression."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 50, "mid")
        .otherwise("low")
        .alias("band"),
    )


@register(
    "q_coalesce_null",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'error'), 'unknown') AS etype,
           CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 1 ELSE 0 END
             AS was_error
    FROM events
    """,
)
def coalesce_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling (D30): nullif + coalesce + isnull."""
    ev = load_table(spark, sf_dir, "events")
    nulled = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        F.coalesce(nulled, F.lit("unknown")).alias("etype"),
        F.when(F.isnull(nulled), 1).otherwise(0).alias("was_error"),
    )


@register("q_sample")
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling (D35): `df.sample(fraction, seed)`.

    Seeded but engine-specific row selection → rows-only driver check
    (SURVEY.md §2.D D35).  For a sample that is reproducible ACROSS engines
    and stable under repartitioning, use q_sample_hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE ('0x' || substr(md5('smp:' || l_orderkey || ':' || l_linenumber), 1, 15))::BIGINT % 10 = 0
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (D35 scale idiom): keep rows whose
    key-hash falls in a fixed residue class — reproducible across engines,
    runs, and partitionings (unlike `sample`), and pushes down as a plain
    predicate.  The 100 TB way to carve stable train/eval splits."""
    from data_pipeline_cursor_spark.text.dedup import phash

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.filter(phash(key, "smp") % 10 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS val
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    UNION ALL
    SELECT o_orderkey, 'orderyear', CAST(date_part('year', o_orderdate) AS DOUBLE) FROM orders
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (D19 twin of q_pivot): wide metric columns → long
    (key, metric, val) rows via `DataFrame.unpivot` (SQL `UNPIVOT`).

    100 TB: narrow map-side transform — no shuffle, no UDF; output is
    3× the rows at 1/3 the width.  The oracle spells it as the portable
    UNION ALL equivalent."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
        F.year("o_orderdate").cast("double").alias("orderyear"),
    ).unpivot(
        "o_orderkey",
        ["totalprice", "custkey", "orderyear"],
        "metric",
        "val",
    )
