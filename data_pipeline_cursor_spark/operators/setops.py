"""Set operations (SURVEY.md §2.D D19) — UNION [ALL] / INTERSECT / EXCEPT,
part of the Trino SQL surface the reference ships
(/root/reference/README.md:454-482).

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
UNION DISTINCT / INTERSECT / EXCEPT each add one hash shuffle on the full
row — keep projections narrow before them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE value > 150
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — duplicates preserved (clicks with value>150 appear twice)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    b = ev.filter(F.col("value") > 150).select("event_id", "event_type")
    return a.unionByName(b)


@register(
    "q_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — users who clicked or purchased, each once."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.unionByName(b).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — users who both clicked and purchased."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
    FROM events WHERE event_type = 'purchase'
    """,
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — (user, day) pairs that clicked but didn't purchase
    that day.

    Per-day granularity keeps the result non-empty: at sf0.01 all 150 users
    perform every event type at least once over the fixture window, so the
    plain user-level EXCEPT was vacuously empty (round-2 VERDICT item 1).
    Day-level asymmetry gives ~1000 surviving pairs.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
    )
    return a.subtract(b)


@register(
    "q_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: each user_id appears
    min(click count, view count) times, the bag semantics DISTINCT
    intersect destroys.  One hash shuffle with per-key counters."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "view").select("user_id")
    return a.intersectAll(b)


@register(
    "q_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each user_id survives
    (click count − purchase count) times when positive — the occurrence
    accounting that distinct EXCEPT cannot express."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b)
