"""Temporal/history operators (SURVEY.md §2.D extension — the lakehouse
change-tracking surface).

The reference's serving table keeps only the latest row per key (Postgres
PK upsert, /root/reference/flink/init-analytics-db.sql:9) and its Iceberg
table keeps full append history (run.sh:88-114) — the two classic
change-tracking postures.  These operators implement the standard
warehouse derivations between them: SCD type-2 validity intervals from an
append log, and a changelog diff between two snapshots.

Scale notes (100 TB):
- SCD2 is one shuffle on the entity key + a per-key sort (lead window) —
  the same profile as any per-key window op; no self-join, no driver state.
- The changelog diff is a single full-outer equi-join of two snapshot
  scans; both sides prune to the compared columns, and at 100 TB the join
  co-locates for free if both snapshots are bucketed on the key
  (q_join_bucketed's layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, value, ts,
             lead(ts) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS next_ts,
             event_id
      FROM events
      WHERE event_type IN ('click', 'view')
    )
    SELECT user_id, event_type,
           ROUND(value, 4) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
             AS valid_to,
           (next_ts IS NULL) AS is_current
    FROM ordered
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build: turn an append-only event log into per-key
    validity intervals — each observation valid from its own timestamp
    until the key's next observation (open-ended sentinel for the current
    row).  The standard dimension-history derivation, as one lead()
    window; ordering made total with event_id so same-timestamp rows
    produce a deterministic chain."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(next_ts, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        next_ts.isNull().alias("is_current"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY user_id
    ),
    new AS (
      SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events
      GROUP BY user_id
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           o.total AS old_total,
           n.total AS new_total,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                WHEN o.total <> n.total THEN 'update'
                ELSE 'unchanged' END AS change
    FROM old o FULL JOIN new n ON o.user_id = n.user_id
    WHERE NOT (o.total IS NOT DISTINCT FROM n.total)
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog diff between two snapshot states (CDC derivation): the
    per-user aggregate as of a cutoff vs as of now, classified
    insert/delete/update — what a MERGE INTO consumes, derived here the
    set-based way.  Unchanged rows are filtered with null-safe equality
    (IS NOT DISTINCT FROM ≡ Spark's eqNullSafe), so the emitted set IS
    the minimal changelog.  Decimal-exact sums keep old/new comparable
    cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    total = F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    old = (
        ev.filter(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy(F.col("user_id").alias("o_user"))
        .agg(total.alias("old_total"))
    )
    new = ev.groupBy(F.col("user_id").alias("n_user")).agg(
        total.alias("new_total")
    )
    joined = old.join(new, old.o_user == new.n_user, "full")
    return joined.filter(
        ~F.col("old_total").eqNullSafe(F.col("new_total"))
    ).select(
        F.coalesce("o_user", "n_user").alias("user_id"),
        "old_total",
        "new_total",
        F.when(F.col("o_user").isNull(), "insert")
        .when(F.col("n_user").isNull(), "delete")
        .when(F.col("old_total") != F.col("new_total"), "update")
        .otherwise("unchanged")
        .alias("change"),
    )
