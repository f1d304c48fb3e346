"""Window (analytic) functions (SURVEY.md §2.B B14-B15, §2.D D15-D17).

Parity anchors: the dashboard's per-city last-100-points retention and
current-value readout (/root/reference/visualization-server/public/index.html:336-339,378-379)
— both are window-function queries over the serving data — plus the Trino
window-function surface the reference ships.

Scale notes (100 TB): every query here is ONE shuffle on the partition key
followed by a per-partition sort.  Determinism rule: every ORDER BY inside
a window carries a unique tie-break column (event_id / orderkey) so rank
and frame results are reproducible across engines.  Skew caveat: a window
partitioned on a hot key serializes that key into one task — for power-law
keys pre-aggregate or bucket by a salted composite first (PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_topk_per_group",
    oracle="""
    SELECT event_type, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 100
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key last-N retention (B14). Parity: dashboard keeps the last 100
    points per city (/root/reference/visualization-server/public/index.html:336-339)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("event_type", "event_id", "value")
    )


@register(
    "q_latest_per_key",
    oracle="""
    SELECT event_type, event_id, value, ts FROM (
      SELECT event_type, event_id, value, ts,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest value per key (B15). Parity: current temperature = newest point
    (/root/reference/visualization-server/public/index.html:378-379)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", "value", "ts")
    )


@register(
    "q_row_number",
    oracle="""
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking: row_number (D15) — first 3 events per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


@register(
    "q_rank_dense",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk
    FROM customer
    """,
)
def rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (D15) over a ties-heavy integer key — rank values
    depend only on the order key, so ties are deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q_ntile",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile (D15): price quartiles within order status."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).alias("quartile"))


@register(
    "q_lag_lead",
    oracle="""
    SELECT event_id,
           ROUND(LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS prev_value,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS next_value
    FROM events
    """,
)
def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead (D16) along each user's event-time sequence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
    )


@register(
    "q_first_last",
    oracle="""
    SELECT event_id, event_type,
           ROUND(FIRST_VALUE(value) OVER w, 4) AS first_v,
           ROUND(LAST_VALUE(value)  OVER w, 4) AS last_v
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (D16) over the full-partition frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.first("value").over(w), 4).alias("first_v"),
        F.round(F.last("value").over(w), 4).alias("last_v"),
    )


@register(
    "q_frame_rows",
    oracle="""
    SELECT event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg
    FROM events
    """,
)
def frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame (D17): 3-point moving average along each user's sequence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("moving_avg")
    )


@register(
    "q_frame_range",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                                         RANGE BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW), 4)
             AS cum_spend
    FROM orders
    """,
)
def frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (D17): cumulative spend per customer; same-day orders
    (range peers) accumulate together, which makes ties deterministic —
    ORDER BY + default frame IS the RANGE unbounded-preceding frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 4).alias("cum_spend")
    )

@register(
    "q_percent_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           ROUND(percent_rank() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_acctbal), 4) AS pct_rank,
           ROUND(cume_dist() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal), 4) AS cume
    FROM supplier
    """,
)
def percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (D15 family: percent_rank, cume_dist)
    — supplier account-balance position within its nation.  Same shuffle
    profile as every ranking window: one exchange on the partition key."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "q_sessionize",
    oracle="""
    WITH g AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
                  > 1800 * 1000000 THEN 1
                  WHEN lag(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
                  IS NULL THEN 1
                  ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT event_type, us,
             SUM(is_new) OVER (PARTITION BY event_type ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT event_type, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(make_timestamp(MAX(us)), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM s GROUP BY event_type, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the gaps-and-islands idiom): a new session
    starts after a >30-min silence per event_type; session_id is the
    running count of session starts.  The batch twin of s_session's
    streaming session window.

    Deterministic under timestamp ties: the window order carries event_id
    as a tiebreaker, a TOTAL order — a tie group straddling a session
    boundary would otherwise split differently between the two window
    passes (the engines need not re-sort ties identically) and between
    engines.  100 TB: two window passes + one aggregate, all on the same
    event_type partitioning — one shuffle total; skewed key → pre-split
    by (event_type, day) with a stitch pass on day boundaries."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy(us, F.col("event_id"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap > 1800 * 1_000_000, 1
    ).when(F.lag(us).over(w).isNull(), 1).otherwise(0)
    sess = F.sum(is_new).over(
        Window.partitionBy("event_type")
        .orderBy(us, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_type", us.alias("us"), sess.alias("session_id"))
        .groupBy("event_type", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(
                F.timestamp_micros(F.min("us")), "yyyy-MM-dd HH:mm:ss"
            ).alias("session_start"),
            F.date_format(
                F.timestamp_micros(F.max("us")), "yyyy-MM-dd HH:mm:ss"
            ).alias("session_end"),
        )
    )


@register(
    "q_fill_forward",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, ts,
             CASE WHEN value >= 100 AND json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS reading
      FROM events
    )
    SELECT event_type, event_id,
           last_value(reading IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled
    FROM r
    """,
)
def fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill / last-observation-carried-forward (the IGNORE NULLS
    window surface, D16's missing sibling): a sensor reading observed only
    sometimes (here: props.k when value ≥ 100) is propagated to every
    later row of its key until the next observation; leading rows stay
    NULL.  The standard gap-fill for irregular telemetry before
    resampling/joining.

    Spark spells IGNORE NULLS as last(col, ignorenulls=True) over a
    running frame.  100 TB: one shuffle on the key + per-partition sort —
    the same single-window shape as every query in this module, with the
    (ts, event_id) total order making the carried value deterministic."""
    ev = load_table(spark, sf_dir, "events")
    reading = F.when(
        F.col("value") >= 100, F.get_json_object("props", "$.k").cast("int")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.last(reading, ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "q_frame_range_interval",
    oracle="""
    SELECT event_id,
           CAST(n_win AS BIGINT) AS n_win,
           ROUND(CAST(sum_cents AS DOUBLE) / n_win / 100.0, 4)
             AS trailing_avg
    FROM (
      SELECT event_id,
             COUNT(*) OVER w AS n_win,
             SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS sum_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                         AND CURRENT ROW)
    )
    """,
)
def frame_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED time-interval RANGE frame (D17's third frame form): each
    event's trailing-10-minute average per user — the sliding-window
    metric computed per ROW rather than per fixed bucket (contrast
    q_sliding_avg's HOP windows).

    RANGE frames are tie-proof by construction (every row whose ORDER
    key falls in [ts−10min, ts] is in the frame, regardless of row
    order), and the fold is EXACT: integer cents sum / integer count,
    one double division at the end — no float accumulation at all.
    Spark expresses the interval bound as a numeric rangeBetween over
    unix microseconds; DuckDB as RANGE INTERVAL — same frame, same
    integers, identical quotient.

    Plan: one exchange on user_id, one sort, both window aggregates in
    a single pass.  100 TB: identical — the canonical windowed-metric
    shape."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-10 * 60 * 1_000_000, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    out = ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(cents).over(w).alias("sum_cents"),
    )
    return out.select(
        "event_id",
        "n_win",
        F.round(
            F.col("sum_cents").cast("double") / F.col("n_win") / 100.0, 4
        ).alias("trailing_avg"),
    )


@register(
    "q_rolling_median",
    oracle="""
    SELECT event_id,
           CAST(n_win AS BIGINT) AS n_win,
           ROUND(med, 4) AS rolling_median
    FROM (
      SELECT event_id,
             COUNT(*) OVER w AS n_win,
             median(value) OVER w AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    """,
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING MEDIAN (the robust moving statistic — q_frame_rows' moving
    average is spike-dragged; the 5-point median is not): per user, the
    median of the trailing 5 observations.

    Spark has no median over a window FRAME, so the frame's values
    collect into a bounded array (≤5 elements — collect_list over a ROWS
    frame) and the median is computed as an array expression with the
    exact even/odd midpoint rule both engines share.  Deterministic: the
    frame is defined by the total order (ts, event_id) and the in-frame
    fold is a sort of ≤5 doubles.

    100 TB: per-row state is the frame width (a constant), one exchange
    on user_id — same envelope as every window query; wide frames swap
    the array for the two-heap streaming-median pattern inside
    applyInPandas."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    mid_hi = F.try_element_at(vals, (n / 2 + 1).cast("int"))
    mid_lo = F.try_element_at(vals, ((n + 1) / 2).cast("int"))
    med = (mid_lo + mid_hi) / 2.0
    return ev.select(
        "event_id",
        n.cast("long").alias("n_win"),
        F.round(med, 4).alias("rolling_median"),
    )


@register(
    "q_interpolate_linear",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) AS tus,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
             END AS known_cents
      FROM events
    ),
    br AS (
      SELECT user_id, event_id, known_cents,
             last_value(known_cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS pv,
             last_value(CASE WHEN known_cents IS NOT NULL THEN tus END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS pt,
             first_value(known_cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS nv,
             first_value(CASE WHEN known_cents IS NOT NULL THEN tus END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS nt,
             tus
      FROM r
    )
    SELECT user_id, event_id,
           CASE WHEN known_cents IS NOT NULL THEN 1 ELSE 0 END AS is_known,
           ROUND(CASE
             WHEN known_cents IS NOT NULL THEN CAST(known_cents AS DOUBLE)
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt = pt
               THEN CAST(pv AS DOUBLE)
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN CAST(pv AS DOUBLE)
                    + CAST(nv - pv AS DOUBLE)
                      * (CAST(tus - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
             WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
             WHEN nv IS NOT NULL THEN CAST(nv AS DOUBLE)
           END / 100.0, 4) AS interp_value
    FROM br
    """,
)
def interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR time-series interpolation (D16/D38's missing third sibling:
    LOCF carries the last value flat; this draws the line).  The sparse
    observed series is each user's 'purchase' amounts; every other event
    of that user gets the value linearly interpolated IN EVENT TIME
    between the bracketing observations — the standard gap-fill before
    resampling an irregular series onto a regular grid.  Edge rule:
    before the first / after the last observation the boundary value
    extends flat (the pandas `interpolate(limit_direction='both')`
    convention); a user with no observations stays NULL.

    Determinism: observations are integer CENTS and timestamps integer
    MICROSECONDS; the only float math is one ratio + one multiply-add on
    exactly equal inputs in both engines (same IEEE ops in the same
    order), then ROUND(.,4).  Equal-timestamp brackets (nt = pt) short-
    circuit to the previous value before the 0/0 division can occur.

    Plan: ONE exchange on user_id + one sort feeds all four IGNORE-NULLS
    window reads (same frame family, one WindowExec pass for the
    preceding pair, one for the following pair).  100 TB: the canonical
    per-key window envelope — per-row state is O(1), no value-grain or
    corpus-grain joins anywhere."""
    ev = load_table(spark, sf_dir, "events")
    tus = F.unix_micros("ts")
    known = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100, 0).cast("bigint"),
    )
    r = ev.select(
        "user_id", "event_id", tus.alias("tus"), known.alias("known_cents")
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    kt = F.when(F.col("known_cents").isNotNull(), F.col("tus"))
    br = r.select(
        "user_id",
        "event_id",
        "tus",
        "known_cents",
        F.last("known_cents", ignorenulls=True).over(wb).alias("pv"),
        F.last(kt, ignorenulls=True).over(wb).alias("pt"),
        F.first("known_cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(kt, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = (
        F.when(F.col("known_cents").isNotNull(), F.col("known_cents").cast("double"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") == F.col("pt")),
            F.col("pv").cast("double"),
        )
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv").cast("double")
            + (F.col("nv") - F.col("pv")).cast("double")
            * (
                (F.col("tus") - F.col("pt")).cast("double")
                / (F.col("nt") - F.col("pt")).cast("double")
            ),
        )
        .when(F.col("pv").isNotNull(), F.col("pv").cast("double"))
        .when(F.col("nv").isNotNull(), F.col("nv").cast("double"))
    )
    return br.select(
        "user_id",
        "event_id",
        F.when(F.col("known_cents").isNotNull(), 1)
        .otherwise(0)
        .alias("is_known"),
        F.round(interp / 100.0, 4).alias("interp_value"),
    )
