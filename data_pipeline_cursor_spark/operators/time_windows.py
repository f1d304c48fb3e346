"""Time-window aggregates (batch twins of the streaming job).

The reference's flagship computation is the Flink job
(/root/reference/flink/sql/weather-aggregation.sql:38-49): per-key AVG +
COUNT over 5-unit tumbling event-time windows, emitting window start/end.
``tumble_avg`` is its batch twin over the ``events`` fixture (event_type ≈
city, value ≈ temperature — FIXTURES.md §2); ``sliding_avg`` is the HOP
capability Flink SQL ships (SURVEY.md §2.C C3-C4).

Scale notes (100 TB): a tumbling-window agg is a single hash aggregation
keyed (bucket, event_type) — one shuffle, map-side partial aggregation,
state bounded by #buckets × #keys.  Spark's ``window()`` is a scalar
projection (no blow-up); the sliding window expands each row into
len/slide windows (2× here) before the same single-shuffle agg — still
linear, and AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table

# Spark's window() and DuckDB's time_bucket() are both epoch-aligned,
# left-closed/right-open — verified on an exact-boundary row (SURVEY.md §7.4).

_TUMBLE_ORACLE = """
SELECT
  time_bucket(INTERVAL '5 minutes', ts)                       AS window_start,
  time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
  event_type,
  ROUND(AVG(value), 4) AS avg_value,
  COUNT(*)             AS n_events
FROM events
GROUP BY 1, 2, 3
"""


@register("q_tumble_avg", oracle=_TUMBLE_ORACLE)
def tumble_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window AVG(value), COUNT(*) per event_type.

    Parity: /root/reference/flink/sql/weather-aggregation.sql:38-49 (5 s
    windows over the weather stream; 5 min here to suit fixture spacing).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT
    time_bucket(INTERVAL '5 minutes', ts) - (n * INTERVAL '5 minutes')
      AS window_start,
    event_type,
    value
  FROM events
  CROSS JOIN (SELECT UNNEST([0, 1]) AS n)
)
SELECT
  window_start,
  window_start + INTERVAL '10 minutes' AS window_end,
  event_type,
  ROUND(AVG(value), 4) AS avg_value,
  COUNT(*)             AS n_events
FROM buckets
GROUP BY 1, 2, 3
"""


@register("q_sliding_avg", oracle=_SLIDING_ORACLE)
def sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes (Flink HOP capability).

    Parity: Flink SQL HOP surface shipped by /root/reference/flink/Dockerfile:1
    (SURVEY.md §2.C C4).  Each row lands in exactly 2 windows: the oracle
    enumerates them as bucket(ts - n*slide) + n*slide for n in {0,1}.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )
