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


_EWMA_ORACLE = """
    WITH RECURSIVE base AS (
      SELECT user_id,
             CAST(round(value * 100, 0) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    ew AS (
      SELECT user_id, rn, v AS e FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn, (b.v + ew.e) // 2
      FROM ew JOIN base b ON b.user_id = ew.user_id AND b.rn = ew.rn + 1
    ),
    last AS (SELECT user_id, MAX(rn) AS n_obs FROM base GROUP BY user_id)
    SELECT l.user_id,
           CAST(l.n_obs AS BIGINT)  AS n_obs,
           CAST(e.e AS BIGINT)      AS ewma_cents,
           ROUND(e.e / 100.0, 2)    AS ewma_value
    FROM last l JOIN ew e ON e.user_id = l.user_id AND e.rn = l.n_obs
"""


@register("q_ewma", oracle=_EWMA_ORACLE)
def ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponentially-weighted moving average — the time-series
    smoothing recurrence e_t = (v_t + e_{t-1}) / 2 (α = ½), which no
    window frame can express (each output depends on ALL priors through
    the fold, not a fixed frame).

    Determinism strategy is x_kmeans_int8's integer fixed-point: values
    become exact cents (BIGINT) and each step is (v + e) // 2 — an exact
    integer fold with NO float drift, so the sequential recurrence
    hash-matches a DuckDB recursive-CTE replay bit-for-bit.  (Values are
    nonnegative, so Python floor-// and DuckDB trunc-// agree.)

    Plan: ONE shuffle on user_id, an in-partition sort, and a single
    mapInPandas pass that folds every group it sees in order, carrying
    the open group's state across Arrow batches.  This replaces the
    round-12 groupBy().applyInPandas form, which built one pandas
    DataFrame PER GROUP for both input and output — ~1.5 s of pure
    frame-construction overhead at 1.5k keys (guide §4.1: prefer the
    whole-partition iterator forms when per-group work is tiny).  The
    fold itself — sort by (ts, event_id), integer (v+e)//2 recurrence,
    half-away cents — is byte-identical.  100 TB: state per key is
    O(1), rows stream per partition; parallelism is |keys| via the
    hash shuffle, exactly as before."""
    import pandas as pd

    from data_pipeline_cursor_spark.functions.math_ops import cents_half_away

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    def fold_partition(batches):
        import numpy as np

        def emit(uids, es, ns):
            return pd.DataFrame(
                {
                    "user_id": np.asarray(uids, dtype=np.int64),
                    "n_obs": np.asarray(ns, dtype=np.int64),
                    "ewma_cents": np.asarray(es, dtype=np.int64),
                    "ewma_value": [round(e / 100.0, 2) for e in es],
                }
            )

        open_uid, open_e, open_n = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            v = cents_half_away(pdf["value"].to_numpy())
            uids = pdf["user_id"].to_numpy()
            out_u, out_e, out_n = [], [], []
            # group boundaries within the (user-sorted) batch
            cuts = np.flatnonzero(uids[1:] != uids[:-1]) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(uids)]))
            for s, t in zip(starts, ends):
                uid = int(uids[s])
                if uid == open_uid:
                    e, n = open_e, open_n
                else:
                    if open_uid is not None:
                        out_u.append(open_uid)
                        out_e.append(open_e)
                        out_n.append(open_n)
                    e, n = None, 0
                for x in v[s:t]:
                    xi = int(x)
                    e = xi if e is None else (xi + e) // 2
                    n += 1
                open_uid, open_e, open_n = uid, e, n
            if out_u:
                yield emit(out_u, out_e, out_n)
        if open_uid is not None:
            yield emit([open_uid], [open_e], [open_n])

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            fold_partition,
            "user_id bigint, n_obs bigint, ewma_cents bigint, ewma_value double",
        )
    )


_TWAP_ORACLE = """
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(CAST(SUM(CAST(v_cents AS HUGEINT) * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE) / 100.0, 4) AS twap
    FROM seg
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
"""


@register("q_twap", oracle=_TWAP_ORACLE)
def twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key TIME-weighted average — each observation holds until the
    next one, so its weight is the gap it was live for (the TWAP/
    time-weighted-sensor-mean every metrics store computes; a plain AVG
    over-weights bursts).

    Determinism: weights are exact integer MICROSECONDS (unix_micros /
    epoch_us — the fixture carries sub-second timestamps) and values are
    exact cents; the weighted sum folds in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — a cents×micros product summed over a large key
    in BIGINT could overflow, decimal cannot — so both engines divide
    the SAME two integers and the quotient is bit-identical.

    Plan: one shuffle on user_id for the lead() window; the aggregate
    reuses that partitioning (no second exchange).  100 TB: identical —
    window + agg on the same key is the canonical single-shuffle pair."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    num = F.sum(F.col("v_cents").cast("decimal(38,0)") * F.col("dt_us"))
    den = F.sum("dt_us")
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(
            num.cast("double") / den.cast("double") / 100.0, 4
        ).alias("twap"),
    )
