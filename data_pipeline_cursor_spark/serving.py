"""Serving-API parity queries (SURVEY.md §2.A A8).

The reference's visualization server reads the Postgres serving store with
two parameterized SQL shapes (/root/reference/visualization-server/server.js:35-104):

- GET /api/weather         → WHERE city = ANY($1) ORDER BY city, last_updated
- GET /api/weather/latest  → … AND last_updated > $2   (incremental poll)

Here the serving store is the engine itself; the same predicates run as
DataFrame filters over the events table (event_type ≈ city, ts ≈
last_updated).  At scale the IN-list and `>` watermark predicates push down
to the scan; on a ts-partitioned serving layout the incremental poll reads
only the newest partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_in_list",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (B6). Parity: WHERE city = ANY($1)
    (/root/reference/visualization-server/server.js:40,77)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "event_type", "value"
    )


@register(
    "q_since_incremental",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
      AND event_type IN ('click', 'purchase')
    """,
)
def since_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental watermark-style poll (B7). Parity:
    WHERE city = ANY($1) AND last_updated > $2
    (/root/reference/visualization-server/server.js:74-79)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp"))
        & F.col("event_type").isin("click", "purchase")
    ).select("event_id", "event_type", "value")
