"""Join family (SURVEY.md §2.D D1-D8) — the batch-SQL surface the reference
exposes by shipping Trino (/root/reference/compose.yaml:374-396; users directed
to arbitrary SQL at /root/reference/README.md:454-482).

Scale notes (100 TB):
- Equi-joins shuffle both sides on the key unless one side broadcasts.
  region/nation/supplier/part are classic broadcast dims — below
  `spark.sql.autoBroadcastJoinThreshold` Catalyst broadcasts automatically;
  `q_join_broadcast` forces the hint and the test asserts the physical plan.
- The star join chains broadcasts for dims and shuffles only the two fact
  tables (lineitem⋈orders) — one big exchange instead of four.
- Non-equi joins (range/banding) are broadcast-nested-loop: keep the
  broadcast side tiny (a literal band table here).  At scale, banding is
  better rewritten as a computed key (`width_bucket`-style) + equi-join —
  both forms shown in `q_join_range`'s docstring.
- The as-of join avoids an O(n·m) range join entirely: union the two
  streams, one window pass per key (`last(ignoreNulls)`) — single shuffle
  on user_id, linear state.  This is the 100 TB path; DuckDB's native
  ASOF JOIN is the oracle.
- Skewed keys: AQE skew-join splitting is on (session.py); worst-case key
  salting is documented in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (D1); Catalyst picks broadcast vs sort-merge by size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (D2) — customers without orders keep a NULL orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "q_join_right",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (D2)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_full",
    oracle="""
    WITH big AS (SELECT * FROM customer WHERE c_acctbal > 5000)
    SELECT b.c_custkey, b.c_name, o.o_orderkey
    FROM big b FULL JOIN orders o ON o.o_custkey = b.c_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (D2) — filtered left side so both null-extensions occur."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (D3) ≡ EXISTS — emits left rows once, no duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (D3) ≡ NOT EXISTS.

    The subquery is pre-filtered (``o_totalprice > 400000``) so the result is
    non-empty at every fixture SF — at sf0.01 every customer has *some* order,
    which previously made the unfiltered anti-join vacuously empty (0 = 0 rows
    proves nothing; round-2 VERDICT item 1).  ~200/1500 customers survive.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (D4) — only sane between tiny dims (5×25 here)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join (D5): explicit `broadcast()` hints on both dims — the
    fact side never shuffles.  tests/test_plans.py asserts
    BroadcastHashJoin appears in the physical plan."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "q_join_star",
    oracle="""
    SELECT r.r_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (D6), TPC-H Q5 shape: revenue per region.

    Physical shape at scale: lineitem⋈orders is the one real shuffle
    (both facts, co-partitioned on orderkey); customer/nation/region are
    broadcast — hinted explicitly so the plan is stable regardless of
    stats.  Rounded to 2 decimals: a 6-figure revenue sum leaves < 1e-10
    relative float noise, far inside 2 decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0),
             ('mid', 500.0, 1000.0),
             ('premium', 1000.0, 1500.0),
             ('luxury', 1500.0, 100000.0)
    )
    SELECT b.band, COUNT(*) AS n_parts, ROUND(AVG(p.p_retailprice), 4) AS avg_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (D7): banding parts by price against a literal band
    table — a BroadcastNestedLoopJoin with a 4-row broadcast side.

    100 TB note: when the band table is static like here, rewrite as a
    computed key (CASE/width_bucket → equi-join or plain CASE projection);
    BNLJ is only acceptable with a tiny broadcast side."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 500.0),
            ("mid", 500.0, 1000.0),
            ("premium", 1000.0, 1500.0),
            ("luxury", 1500.0, 100000.0),
        ],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, c.ts AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (D8): for each purchase, the latest click by the same user
    at-or-before the purchase time (`<=`-latest convention, SURVEY §7.4).

    Spark has no native as-of; the scalable composition (SURVEY §4.3) is
    union-the-streams + one window pass per key: tag rows, sort by
    (ts, clicks-first), carry the last non-null click ts forward with
    last(ignoreNulls).  One shuffle on user_id, O(1) state per row —
    survives 100 TB where a range join + groupBy(max) would not."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("p_event_id"), F.lit(1).alias("is_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("p_event_id"), F.lit(0).alias("is_click"),
    )
    merged = clicks.unionByName(purchases)
    # clicks sort before purchases at identical ts → `<=` semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("p_event_id").isNotNull())
        .select(
            F.col("p_event_id").alias("event_id"), "user_id", "last_click_ts"
        )
    )


ASOF_TOLERANCE_S = 7200  # 2 h staleness cap for the tolerance as-of


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL {ASOF_TOLERANCE_S} SECONDS
                THEN c.ts END AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof's
    ``tolerance=`` / kdb wj's window cap — D88): the latest click
    at-or-before each purchase, but only if it is no staler than 2
    hours; an older match is as good as none (the feature-store
    staleness rule: serving a day-old feature as 'latest' is a silent
    correctness bug).  Same single window pass as D8 — the tolerance is
    ONE post-window predicate, not a second join; the NULLed-out rows
    prove the cap bites (the fixture has users whose last click
    precedes a purchase by more than the cap)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("p_event_id"), F.lit(1).alias("is_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("p_event_id"), F.lit(0).alias("is_click"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last("click_ts", ignorenulls=True).over(w)
    return (
        merged.withColumn("raw_click_ts", last_click)
        .filter(F.col("p_event_id").isNotNull())
        .select(
            F.col("p_event_id").alias("event_id"),
            "user_id",
            F.when(
                F.col("ts").cast("long") - F.col("raw_click_ts").cast("long")
                <= ASOF_TOLERANCE_S,
                F.col("raw_click_ts"),
            ).alias("last_click_ts"),
        )
    )


SALT_BUCKETS = 8


@register(
    "q_join_salted",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN region r ON (CAST(l.l_orderkey % 5 AS INTEGER)) = r.r_regionkey
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (PLANS.md's join-side skew recipe, runnable): the
    fact side joins a 5-key dimension — the textbook skewed shuffle where
    5 reducers own the whole fact table if the join hash-partitions.

    Recipe: salt the fact key with pmod(hash(rowid), S); EXPLODE the dim
    side S ways (dim × S rows — dims are small by definition); join on
    (key, salt) → S×keys uniform cells.  Identical result to the plain
    join (the oracle), which is the point: salting changes the schedule,
    not the answer.  Here the dim side also broadcasts (plan-asserted —
    broadcasting *already* kills this particular skew, making the salt a
    no-op shuffle-wise at this SF; the recipe is for the fact⋈fact case
    where neither side broadcasts and AQE's skew split cannot help a
    single monster key).  The groupBy after the join pre-folds per
    (flag, salt) cell before its exchange, so skew never reappears
    downstream."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "jk", (F.col("l_orderkey") % 5).cast("int")
    ).withColumn("salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)))
    r = load_table(spark, sf_dir, "region")
    r_salted = r.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    joined = li.join(
        F.broadcast(r_salted),
        (li.jk == r_salted.r_regionkey) & (li.salt == r_salted.salt),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ), bounds AS (
      SELECT p.event_id, p.user_id, p.ts,
             (SELECT max(c.ts) FROM clicks c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS back_ts,
             (SELECT min(c.ts) FROM clicks c
              WHERE c.user_id = p.user_id AND c.ts > p.ts)  AS fwd_ts
      FROM purchases p
    )
    SELECT event_id, user_id,
           CASE WHEN back_ts IS NULL THEN fwd_ts
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
                ELSE fwd_ts END AS nearest_click_ts,
           CASE WHEN back_ts IS NULL THEN 'fwd'
                WHEN fwd_ts IS NULL THEN 'back'
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'back'
                ELSE 'fwd' END AS direction
    FROM bounds
    WHERE back_ts IS NOT NULL OR fwd_ts IS NOT NULL
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-asof join (D8's bidirectional completion): each purchase
    pairs with the click closest in time — before OR after — ties to the
    earlier (backward) side.  The sensor-alignment semantic (pandas
    merge_asof direction='nearest') that backward-only asof can't give.

    Same scalable shape as q_join_asof: ONE union + ONE window pass per
    direction over the same (user_id, ts) sort — last non-null click at
    or before, first non-null click strictly after — then a pure
    projection picks the smaller exact-microsecond gap.  One shuffle
    total, O(1) window state; the oracle's correlated min/max subqueries
    are the O(n·m) formulation this plan replaces at scale."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(1).alias("is_click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("p_event_id"),
        F.lit(0).alias("is_click"),
    )
    merged = clicks.unionByName(purchases)
    # clicks sort before purchases at identical ts → equal-ts clicks land
    # in the BACKWARD window (Δ = 0, which nearest prefers anyway)
    order = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("is_click").desc()
    )
    wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = (
        merged.withColumn(
            "back_ts", F.last("click_ts", ignorenulls=True).over(wb)
        )
        .withColumn(
            "fwd_ts", F.first("click_ts", ignorenulls=True).over(wf)
        )
        .filter(F.col("p_event_id").isNotNull())
    )
    d_back = F.unix_micros("ts") - F.unix_micros("back_ts")
    d_fwd = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    pick_back = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (d_back <= d_fwd)
    )
    return (
        out.filter(F.col("back_ts").isNotNull() | F.col("fwd_ts").isNotNull())
        .select(
            F.col("p_event_id").alias("event_id"),
            "user_id",
            F.when(pick_back, F.col("back_ts"))
            .otherwise(F.col("fwd_ts"))
            .alias("nearest_click_ts"),
            F.when(pick_back, "back").otherwise("fwd").alias("direction"),
        )
    )


from data_pipeline_cursor_spark.text.dedup import (  # noqa: E402
    _duck_phash,
    phash,
)

BLOOM_BITS = 4096  # filter width (bits); sized ~100x the dim-key count
BLOOM_SEEDS = ("bf0", "bf1")  # k=2 hash functions
BLOOM_NATION = "NATION_15"  # selective dim predicate (present at every SF)

_DUCK_BLOOM_POS = [
    f"CAST({_duck_phash('CAST({key} AS VARCHAR)', s)} % {BLOOM_BITS} AS INT)"
    for s in BLOOM_SEEDS
]


def _bloom_pos(key, seed: str):
    return (phash(key.cast("string"), seed) % BLOOM_BITS).cast("int")


@register(
    "x_bloom_prefilter",
    oracle=f"""
    WITH dim AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{BLOOM_NATION}'
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        SELECT {_DUCK_BLOOM_POS[0].format(key='s_suppkey')} AS pos FROM dim
        UNION
        SELECT {_DUCK_BLOOM_POS[1].format(key='s_suppkey')} AS pos FROM dim
      )
    ),
    cand AS (
      SELECT l_suppkey,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
      FROM lineitem
      WHERE {_DUCK_BLOOM_POS[0].format(key='l_suppkey')}
              IN (SELECT pos FROM bits)
        AND {_DUCK_BLOOM_POS[1].format(key='l_suppkey')}
              IN (SELECT pos FROM bits)
    ),
    flag AS (
      SELECT c.rev, CASE WHEN d.s_suppkey IS NOT NULL THEN 1 END AS hit
      FROM cand c LEFT JOIN dim d ON c.l_suppkey = d.s_suppkey
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim)  AS n_dim_keys,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT)                    AS n_candidates,
           CAST(COALESCE(SUM(hit), 0) AS BIGINT)       AS n_matches,
           CAST(COUNT(*) - COALESCE(SUM(hit), 0) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN hit = 1 THEN rev END) AS DOUBLE)
             AS revenue_matched
    FROM flag
    """,
)
def bloom_prefilter(
    spark: SparkSession, sf_dir: str, bits_width: int = BLOOM_BITS
) -> DataFrame:
    """EXPLICIT RUNTIME BLOOM-FILTER join pruning — the "ship a bitset,
    not a shuffle" pattern behind Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` rewrite, made
    portable and auditable: the selective dim side (suppliers of one
    nation) hashes each key into k={len(BLOOM_SEEDS)} positions of a
    {BLOOM_BITS}-bit filter; the fact side keeps only rows whose k
    positions are ALL set, then an exact broadcast join removes the
    bloom's false positives.  Output is the one-row audit a deployment
    sizes the filter with: dim keys, bits set, candidates passed,
    true matches, false positives, matched revenue.

    Plan shape (the 100 TB story): ONE dim aggregation collects the
    set-bit positions to the driver (bounded at ``bits_width`` ints by
    construction — dim ROWS are never collected) and the probes compile
    to literal IN-lists inside the fact's scan stage, so the lineitem
    fact is scanned ONCE, never shuffled, and rows failing a probe die
    inside the scan; the exact verification join is a broadcast of the
    (small) dim.  On a 1000-executor cluster this is the difference
    between moving a 100 TB fact to the join and moving ~16 KB of filter
    to the fact.  NOTE: building the filter runs an EAGER Spark job (the
    dim aggregation collect) at DataFrame-construction time — plan-only
    callers pay that job, and the filter snapshots dim state as of build
    time rather than execution time (irrelevant for the immutable
    fixture; a live deployment rebuilds per run).  The md5 positions are
    engine-portable (text.dedup.phash), so the DuckDB oracle replays the
    EXACT same filter, candidates included — the false-positive count is
    verified, not estimated.  ``bits_width`` is the sizing knob (tests
    shrink it to force false positives; n_false_pos >= 0 and
    n_candidates >= n_matches are invariants at any width)."""
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == BLOOM_NATION
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )

    def pos(key, seed):
        return (phash(key.cast("string"), seed) % bits_width).cast("int")

    # BUILD THE FILTER ON THE DRIVER, ONCE (optimization guide §3.2's
    # manual-bloom recipe: build → collect → broadcast).  The round-12
    # form kept `bits` and `dim` as lazy plans referenced 3× each, so one
    # run launched ~10 tiny broadcast/agg jobs (dim re-joined per
    # reference) — ~1.5 s of pure job latency at sf0.1 for a filter that
    # is AT MOST bits_width ints by construction.  One aggregation job
    # now yields the set-bit list and the dim-key count; the set tests
    # compile to literal IN-lists inside the fact's scan stage — the
    # exact "ship a bitset, not a shuffle" shape this operator documents.
    # Driver memory is bounded by bits_width (default 4 KB), NOT by dim
    # cardinality — the dim rows themselves are never collected.
    pos_sets = dim.agg(
        F.count(F.lit(1)).alias("n_dim"),
        *[
            F.collect_set(pos(F.col("s_suppkey"), s)).alias(f"b{i}")
            for i, s in enumerate(BLOOM_SEEDS)
        ],
    ).collect()[0]
    n_dim_keys = int(pos_sets["n_dim"])
    bit_union = sorted(
        set().union(*[pos_sets[f"b{i}"] for i in range(len(BLOOM_SEEDS))])
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    # two md5 probes per fact row dominate the stage, and the fixture is
    # one row group → one scan task; fan out only when the input can't
    # fill the cores itself (no-op on production-layout tables)
    from data_pipeline_cursor_spark.sources.tables import fan_out_small_scan

    fact = fan_out_small_scan(
        load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem"
    ).select(
        "l_suppkey",
        rev.alias("rev"),
        pos(F.col("l_suppkey"), BLOOM_SEEDS[0]).alias("p0"),
        pos(F.col("l_suppkey"), BLOOM_SEEDS[1]).alias("p1"),
    )
    cand = fact.filter(
        F.col("p0").isin(bit_union) & F.col("p1").isin(bit_union)
        if bit_union
        # empty dim ⇒ empty filter ⇒ no candidates (isin() rejects an
        # empty list, so spell the vacuous case out)
        else F.lit(False)
    )
    flag = cand.join(
        F.broadcast(
            dim.select(
                F.col("s_suppkey").alias("l_suppkey"), F.lit(1).alias("hit")
            )
        ),
        "l_suppkey",
        "left",
    )
    return flag.agg(
        F.lit(n_dim_keys).cast("long").alias("n_dim_keys"),
        F.lit(len(bit_union)).cast("long").alias("n_bits_set"),
        F.count(F.lit(1)).alias("n_candidates"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_matches"),
        (
            F.count(F.lit(1))
            - F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
        ).alias("n_false_pos"),
        F.sum(F.when(F.col("hit") == 1, F.col("rev")))
        .cast("double")
        .alias("revenue_matched"),
    ).select(
        "n_dim_keys",
        "n_bits_set",
        "n_candidates",
        "n_matches",
        "n_false_pos",
        "revenue_matched",
    )
