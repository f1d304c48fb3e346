"""Date/time functions (SURVEY.md §2.D D27).

Parity anchors: the reference's partition transform hour(ts)
(/root/reference/trino/sql/init-tables.sql:11), timestamp parsing
(/root/reference/flink/sql/weather-aggregation.sql:6), and the Trino
date/time surface.  Session TZ pinned UTC (sources/tables.py) makes the
extract family deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_date_funcs",
    oracle="""
    SELECT event_id,
           EXTRACT(YEAR FROM ts)::INTEGER   AS y,
           EXTRACT(MONTH FROM ts)::INTEGER  AS mo,
           EXTRACT(DAY FROM ts)::INTEGER    AS d,
           EXTRACT(HOUR FROM ts)::INTEGER   AS h,
           EXTRACT(MINUTE FROM ts)::INTEGER AS mi,
           date_trunc('day', ts)            AS day_start,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS as_date,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::INTEGER
                                            AS days_since_epoch_start,
           CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)
                                            AS unix_sec
    FROM events
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract/trunc/diff/unix family (D27)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_format("ts", "yyyy-MM-dd").alias("as_date"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("unix_sec"),
    )


@register(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY   AS due_date,
           CAST(o_orderdate AS DATE) - INTERVAL 7 DAY    AS week_before,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (D27): add/sub/last_day on day-precision orders."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.date_sub(d, 7).cast("timestamp").alias("week_before"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )
