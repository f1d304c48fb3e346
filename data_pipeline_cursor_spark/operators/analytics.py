"""Composed headline analytics (SURVEY.md §2.D) — TPC-H-shaped ad-hoc SQL.

The reference ships Trino and explicitly directs users to run arbitrary
analytical SQL over the lakehouse (/root/reference/README.md:454-482); its
own documented queries are single-table aggregates.  This module exercises
the *composed* end of that surface — multi-way star joins + grouped money
aggregates + correlated subqueries in one plan, shaped after the classic
TPC-H query patterns the fixture schema mirrors (TESTDATA.md).

Determinism: money aggregates are the classic cross-engine hash hazard
(double SUM is fold-order dependent).  Rule used throughout (registry.py):
compute per-row amounts in double (each row is one IEEE multiply — bit
deterministic in both engines), cast the per-row amount to DECIMAL(18,4)
(same HALF_UP double→decimal cast in Spark and DuckDB), SUM the decimals
(exact, order-independent), and cast the final total to DOUBLE.  Averages
divide two exact quantities once, in double.

Scale notes (100 TB):
- Every query here is a star join: region/nation/supplier/part/customer are
  broadcast dims (Catalyst auto-broadcasts under the threshold; the fact
  side shuffles at most once on the group key).
- Filters are plain column predicates on the fact scan → pushed to the
  Parquet reader (PushedFilters), so the date-windowed queries never read
  the full fact table.
- Aggregations are partial (map-side combine) before the single exchange;
  DECIMAL(18,4) sums keep the combine exact at any parallelism.
- The Q15-style max-revenue subquery reuses one aggregated CTE for both
  the ranking and the filter — one shuffle, not two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


def _money(c: Column) -> Column:
    """Per-row double amount → exact DECIMAL(18,4), for order-free SUM."""
    return c.cast("decimal(18,4)")


def _revenue() -> Column:
    """l_extendedprice * (1 - l_discount), decimal-quantized per row."""
    return _money(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# DuckDB twin of _revenue(); per-row double multiply then the same cast.
_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


@register(
    "q_tpch_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV_SQL}) AS DOUBLE)                             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(24,6))) AS DOUBLE)                 AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4)                                        AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4)                                        AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4)                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one scan, partial agg, one exchange."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-08-01 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    sum_qty = F.sum(_money(F.col("l_quantity")))
    sum_price = F.sum(_money(F.col("l_extendedprice")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            # charge = price(2dp)·(1-disc)(2dp)·(1+tax)(2dp) has SIX true
            # decimal digits: a scale-4 cast lands on genuine .xxxx50 ties
            # that Spark (HALF_UP) and DuckDB break differently — quantize
            # at the product's exact scale instead, where no tie exists.
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast("decimal(24,6)")
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(sum_qty.cast("double") / cnt, 4).alias("avg_qty"),
            F.round(sum_price.cast("double") / cnt, 4).alias("avg_price"),
            F.round(
                F.sum(_money(F.col("l_discount"))).cast("double") / cnt, 4
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_shipping",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')     AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: dim-filtered star join, top-10.

    customer (segment-filtered) broadcasts into orders; only the two fact
    tables shuffle on the join key.  Both date predicates push to the scans.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_local_supplier",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue: 6-way star join.

    supplier/nation/region broadcast (region pre-filtered to one row);
    the lineitem⋈orders⋈customer chain is the only shuffled path.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q_tpch_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: EXISTS → left-semi join.

    The correlated ship-after-order predicate rides the semi join condition,
    so lineitem is never materialized into the output — one semi-join
    shuffle, then a tiny 5-group aggregate.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           ROUND(c.c_acctbal, 4) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item ranking: who returned the most value."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
)
def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: one aggregated CTE reused for the
    global-max filter (exact decimal equality, so ties are all returned)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01 00:00:00").cast("timestamp"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    best = revenue0.agg(F.max("total_revenue").alias("best_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue0.join(F.broadcast(best), F.col("total_revenue") == F.col("best_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 4) AS totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > 300
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: agg lineitem first, then join.

    Unlike the textbook HAVING-after-join, the quantity aggregate runs on
    lineitem alone (group key = its own join key → one shuffle) and the
    surviving ~dozens of keys join back — at 100 TB this is the difference
    between aggregating a joined fact-fact row set and aggregating one fact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money(F.col("l_quantity"))).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL.replace('l_', 'l.l_')}     AS volume,
             n.n_name                             AS nation
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: one nation's slice of a region's revenue
    per year.  Conditional decimal sums → one double division per group."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            F.col("n_name").alias("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_global_sales",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def tpch_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sleeping-customer analysis: customers with an
    above-global-average balance and no orders since 2000 (the fixture's
    order density makes literal Q22's "no orders ever" empty), grouped by
    segment — global-scalar subquery + date-filtered anti join in one plan.

    The scalar average broadcasts as a one-row crossJoin (never a driver
    collect); the NOT EXISTS is a left-anti hash join on custkey.  The
    comparison `c_acctbal > avg` uses the raw double average — identical
    per-row IEEE compare in both engines (no aggregation-order hazard:
    AVG of doubles is fold-order-dependent, BUT the predicate only
    changes the result if a customer's balance lands within ulps of the
    mean — the fixture's 2-decimal balances sit far from it, and the
    decimal-exact output sum keeps the emitted values stable)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            ),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_tpch_promo_share",
    oracle=f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_REV_SQL.replace('l_', 'l.l_')}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END)
                          AS DOUBLE)
                 / CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE), 4)
             AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1999-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-10-01 00:00:00'
    """,
)
def tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: promo revenue as a share of one
    month's revenue — conditional decimal sums over a part-dim broadcast
    join, one double division at the end.  The month predicate prunes the
    fact scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(zero)
                ).cast("double")
                / F.sum(_revenue()).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q_tpch_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting query: the revenue increase if one
    year's small-quantity mid-discount discounts were dropped — the purest
    pushdown benchmark: every predicate is a plain column comparison that
    reaches the parquet reader (PushedFilters), and the plan is scan →
    partial agg → one-row exchange.  At 100 TB with l_shipdate partition
    or zone-map layout this reads one year, not the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_money(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("revenue_increase")
    )


@register(
    "q_tpch_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: LEFT join so
    never-ordered customers land in the c_count=0 bucket (COUNT of a
    nullable key, not COUNT(*)), then a distribution over the per-customer
    counts — the two-level agg-of-agg shape.

    100 TB: first agg shuffles on c_custkey (orders' natural key
    distribution — no skew), second agg input is |customers| rows and the
    distribution itself is ≤|distinct counts| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_small_qty",
    oracle=f"""
    WITH pq AS (
      SELECT l.l_partkey,
             0.2 * (SUM(l.l_quantity) / COUNT(*)) AS qty_threshold
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3'
      GROUP BY l.l_partkey
    )
    SELECT ROUND(CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE l.l_quantity < pq.qty_threshold
    """,
)
def tpch_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: for one brand's parts,
    revenue from orders below 20% of that part's average quantity — the
    decorrelated form of Q17's correlated AVG subquery: one per-part
    aggregate joined back onto the fact scan (Catalyst's own rewrite; the
    dim filter prunes both sides first).

    Determinism: fixture quantities are small integers in double, so the
    per-part SUM is exact (no fold-order drift) and the threshold
    0.2·(sum/count) is bit-identical across engines; revenue is the
    decimal-quantized money sum.

    100 TB: the per-part aggregate is O(|brand's parts|) rows — broadcast
    back onto the fact; the fact scan itself never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pq = brand_li.groupBy("l_partkey").agg(
        (0.2 * (F.sum("l_quantity") / F.count(F.lit(1)))).alias(
            "qty_threshold"
        )
    )
    return (
        li.join(F.broadcast(pq), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(_revenue()).cast("double") / 7.0, 4).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q_tpch_disjunctive",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    brand/size/quantity clauses spanning BOTH join sides.  The shape
    matters: the join key (p_partkey = l_partkey) is still a clean
    equi-predicate, so Catalyst plans a hash join and evaluates the OR as
    a post-join filter — while the single-side prunable parts of the
    disjunction (brand ∈ {{...}}, size ≤ 50, quantity ≤ 40 envelopes) are
    pushed below the join by constraint propagation.  The classic
    pitfall — writing the disjunction INTO the join condition and getting
    a nested-loop join — is what this operator is verified not to do
    (tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    s = F.col("p_size")
    clause = (
        ((F.col("p_brand") == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & s.between(20, 50) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "x_skyline",
    oracle="""
    SELECT a.p_partkey, a.p_name, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the parts where no other part is
    both cheaper-or-equal AND bigger-or-equal with at least one strict —
    the "best value" query of recommendation/procurement analytics.

    The textbook formulation is the NOT-EXISTS dominance anti-join the
    oracle uses — a theta join Catalyst can only run as an O(n²)
    BroadcastNestedLoopJoin.  The Spark plan instead exploits the 2-D
    structure: sorted by (price ASC, size DESC), a row is dominated iff
    a PRECEDING row has strictly larger size (running MAX — one window
    pass) or an equal size at strictly lower price (per-size MIN).  Two
    windows, one sort each, zero joins: O(n log n) against the oracle's
    O(n²), and the rewrite is hash-verified row-for-row.

    The global-order window moves the frontier CANDIDATES to one task, so
    the plan pre-filters with per-partition LOCAL skylines (mapInPandas,
    numpy running-max over a partition sort): dominance within a subset
    implies dominance in the full set, so frontier(full) ⊆
    union(local frontiers) and the exact window pass runs over the few
    survivors — the standard distributed-skyline two-phase shape.  At
    100 TB the single-task stage sees |union of local frontiers| rows
    (sub-linear in practice: one frontier point per partition kills that
    partition's dominated bulk), never the corpus."""
    import pandas as pd

    from pyspark.sql.window import Window

    p = load_table(spark, sf_dir, "part")

    def local_skyline(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(
                ["p_retailprice", "p_size"], ascending=[True, False]
            )
            size = pdf["p_size"].to_numpy()
            run_max = pd.Series(size).cummax().shift(1).to_numpy()
            keep = ~(run_max > size)  # NaN first row compares False → kept
            yield pdf[keep]

    p = p.mapInPandas(local_skyline, p.schema)
    w_prec = (
        Window.orderBy(F.asc("p_retailprice"), F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_size = Window.partitionBy("p_size")
    return (
        p.withColumn("max_prev_size", F.max("p_size").over(w_prec))
        .withColumn("min_price_same_size", F.min("p_retailprice").over(w_size))
        .filter(
            (
                F.col("max_prev_size").isNull()
                | (F.col("max_prev_size") <= F.col("p_size"))
            )
            & (F.col("min_price_same_size") >= F.col("p_retailprice"))
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


@register(
    "x_fuzzy_match",
    oracle="""
    WITH d AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[-1] AS noun
      FROM part
    ),
    cand AS (
      SELECT a.p_partkey, a.p_name,
             b.p_name AS match_name, b.p_partkey AS match_key,
             levenshtein(a.p_name, b.p_name) AS lev
      FROM d a JOIN d b
        ON a.noun = b.noun AND a.p_partkey <> b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    )
    SELECT p_partkey, p_name, n_close, match_name, lev FROM (
      SELECT p_partkey, p_name, match_name, lev,
             CAST(COUNT(*) OVER (PARTITION BY p_partkey) AS BIGINT)
               AS n_close,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY lev, match_name, match_key) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
)
def fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy ENTITY RESOLUTION on names — blocked Levenshtein join: parts
    sharing a blocking key (their last word) are compared by edit
    distance, and each part reports its close-match count and single
    best match (total tie order lev, name, key).  The dedup-by-typo
    primitive behind catalog/vendor-master matching.

    The load-bearing rewrite is the word-TYPE move (BPE's trick): names
    repeat heavily (64 distinct among 20k parts at sf0.1), so the
    instance-level block join the ORACLE writes — O(block²) over part
    ROWS, 20M Levenshtein pairs and 48 s at sf0.1 — collapses to a
    |types|² comparison (64² = 4k pairs) whose per-type verdict
    (partner-instance count, best (lev, name)) maps back onto part rows
    with one broadcast join.  Result sets are identical: the emitted
    columns are a pure function of the name type (plus whether the type
    has ≥2 instances, which legitimizes the lev-0 self-type partner).

    100 TB: type-table size is the vocabulary of names, orders below
    corpus size; when even THAT squares too big, q-gram/PassJoin
    blocking replaces the noun block — the instance→type collapse is
    orthogonal and stays."""
    from pyspark.sql.window import Window

    p = load_table(spark, sf_dir, "part")
    types = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    types = types.withColumn(
        "noun", F.element_at(F.split("p_name", " "), -1)
    )
    a = types.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        "noun",
    )
    b = types.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        "noun",
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    # type-pair relation: same noun, lev ≤ 2; the self pair (a = b) is a
    # valid partner source only when the type has ≥ 2 part instances —
    # its contribution to the partner count is cnt−1 (excluding the part
    # itself), exactly the instance-level p_partkey <> p_partkey rule
    tp = (
        a.join(b, "noun")
        .filter(lev <= 2)
        .select(
            "name_a",
            "name_b",
            lev.alias("lev"),
            F.when(F.col("name_a") == F.col("name_b"), F.col("cnt_b") - 1)
            .otherwise(F.col("cnt_b"))
            .alias("partners"),
        )
    )
    wr = Window.partitionBy("name_a").orderBy("lev", "name_b")
    verdict = (
        tp.filter(F.col("partners") > 0)
        .withColumn("n_close", F.sum("partners").over(Window.partitionBy("name_a")))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("name_a").alias("p_name"),
            "n_close",
            F.col("name_b").alias("match_name"),
            "lev",
        )
    )
    return p.select("p_partkey", "p_name").join(
        F.broadcast(verdict), "p_name"
    ).select("p_partkey", "p_name", "n_close", "match_name", "lev")


@register(
    "q_drift_kl",
    oracle="""
    WITH bucketed AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) % 2 AS half
      FROM events
    ),
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM bucketed GROUP BY event_type
    ),
    tot AS (
      SELECT event_type, n_a, n_b,
             CAST(SUM(n_a) OVER () AS DOUBLE) AS t_a,
             CAST(SUM(n_b) OVER () AS DOUBLE) AS t_b
      FROM counts
    )
    SELECT event_type, n_a, n_b,
           ROUND(n_a / t_a, 4) AS share_a,
           ROUND(n_b / t_b, 4) AS share_b,
           CAST(ROUND(CAST((n_a / t_a) * ln((n_a / t_a) / (n_b / t_b))
                           AS DECIMAL(28,10)), 4) AS DOUBLE)
             AS kl_term
    FROM tot
    WHERE n_a > 0 AND n_b > 0
    """,
)
def drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION DRIFT monitor: the event-type mix of even epoch-weeks
    vs odd epoch-weeks, with each type's Kullback-Leibler contribution
    p·ln(p/q) — the statistic a pipeline alerts on when its input mix
    shifts (new source, broken producer, seasonality).  Σ kl_term is the
    KL divergence; per-type terms localize WHICH type drifted.

    Exact integer counts, one double division per share, stable_round4
    on the log term.  Plan: one partial-agg shuffle on (type) with the
    half split as conditional sums — ONE corpus pass for both
    distributions (plan-asserted single FileScan); totals come from an
    unpartitioned window over the |types|-row aggregate, which costs one
    single-partition pass of a handful of rows, never a second scan.

    100 TB: identical; the comparison table is |types| rows.  Real
    deployments slide the window (this week vs trailing four) — same
    plan with different bucket predicates."""
    from data_pipeline_cursor_spark.functions.math_ops import stable_round4

    ev = load_table(spark, sf_dir, "events")
    half = (F.floor(F.unix_timestamp("ts") / 604800).cast("bigint") % 2)
    counts = ev.select("event_type", half.alias("half")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    from pyspark.sql.window import Window

    wall = Window.partitionBy()
    tot = counts.select(
        "event_type",
        "n_a",
        "n_b",
        F.sum("n_a").over(wall).cast("double").alias("t_a"),
        F.sum("n_b").over(wall).cast("double").alias("t_b"),
    )
    p = F.col("n_a") / F.col("t_a")
    q = F.col("n_b") / F.col("t_b")
    return (
        tot.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(p, 4).alias("share_a"),
            F.round(q, 4).alias("share_b"),
            stable_round4(p * F.log(p / q)).alias("kl_term"),
        )
    )


@register(
    "q_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT)  AS n_keys,
             CAST(MAX(n) AS BIGINT)    AS max_rows,
             CAST(SUM(n) AS BIGINT)    AS total_rows
      FROM per_key
    ),
    heavy AS (
      SELECT l_orderkey, n,
             row_number() OVER (ORDER BY n DESC, l_orderkey) AS rnk
      FROM per_key
    )
    SELECT h.rnk, h.l_orderkey AS hot_key, h.n AS n_rows,
           s.n_keys, s.max_rows,
           ROUND(s.max_rows * s.n_keys / CAST(s.total_rows AS DOUBLE), 4)
             AS skew_factor
    FROM heavy h CROSS JOIN stats s
    WHERE h.rnk <= 5
    """,
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW diagnostics — the report run before sizing a shuffle:
    the 5 heaviest l_orderkey values with their row counts, the key
    cardinality, and the skew factor max/avg (1.0 = uniform; ≫1 = a
    reducer will run hot).  This is the evidence that decides between
    plain hash join, AQE skew split, and the salted join (q_join_salted)
    — measured, not guessed, per this repo's working rule.

    Plan: one partial-agg shuffle on the key; the heavy-hitter ranking
    runs on the |keys| aggregate via TakeOrdered-style top-n; stats are
    a broadcast one-row crossJoin.  100 TB: identical — the per-key
    count table is the shuffle's own histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.sum("n").alias("total_rows"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n"), F.asc("l_orderkey"))
    heavy = (
        per_key.orderBy(F.desc("n"), F.asc("l_orderkey"))
        .limit(5)
        .withColumn("rnk", F.row_number().over(w))
    )
    return heavy.crossJoin(F.broadcast(stats)).select(
        "rnk",
        F.col("l_orderkey").alias("hot_key"),
        F.col("n").alias("n_rows"),
        "n_keys",
        "max_rows",
        F.round(
            F.col("max_rows") * F.col("n_keys")
            / F.col("total_rows").cast("double"),
            4,
        ).alias("skew_factor"),
    )


def passjoin_probe_keys(
    t: DataFrame, tau: int, k: int, multi_match: bool = True
) -> DataFrame:
    """PassJoin probe-side key generation (`name_b, L, i, sub`): for every
    plausible partner length L ∈ [len±τ] and chunk slot i, the probe's
    substrings at the slot's position shifted by d.

    multi_match=True applies the paper's MULTI-MATCH-AWARE shift window
    instead of a flat d ∈ [−τ, τ]: for slot i (0-based) and length gap
    Δ = Lb − L, a matching alignment's shift must satisfy |d| ≤ i (only
    the i earlier slots can displace slot i — if they were all edit-free
    an earlier slot would be the exact match instead) AND |Δ − d| ≤ τ − i
    (the τ−i edits after the slot must absorb the remaining length gap):
    d ∈ [max(−i, Δ−(τ−i)), min(i, Δ+(τ−i))] — always non-empty for
    |Δ| ≤ τ, and ~2× fewer probe keys than the flat window (asserted by
    test_passjoin_candidates_prune_the_cross_product; the 24-pair oracle
    hash proves the tighter window loses no pair).  multi_match=False
    keeps the flat window — retained only so the test can measure the
    reduction."""
    # the multi-match derivation assumes exactly τ+1 chunks; with more,
    # slots past τ would get d_lo > d_hi and F.sequence would count DOWN
    # through the excluded middle (the char_trigrams trap) — guard it
    assert k == tau + 1, (k, tau)
    gap = F.col("Lb") - F.col("L")
    if multi_match:
        d_lo = F.greatest(-F.col("i"), gap - (tau - F.col("i")))
        d_hi = F.least(F.col("i"), gap + (tau - F.col("i")))
    else:
        d_lo, d_hi = F.lit(-tau), F.lit(tau)
    probe = (
        t.select(F.col("p_name").alias("name_b"), F.col("L").alias("Lb"))
        .withColumn(
            "L", F.explode(F.sequence(F.col("Lb") - tau, F.col("Lb") + tau))
        )
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("d", F.explode(F.sequence(d_lo, d_hi)))
    )
    pstart = (F.floor(F.col("i") * F.col("L") / k) + 1 + F.col("d")).cast(
        "int"
    )
    plen = (
        F.floor((F.col("i") + 1) * F.col("L") / k)
        - F.floor(F.col("i") * F.col("L") / k)
    ).cast("int")
    return (
        probe.filter(
            (pstart >= 1) & (plen > 0) & (pstart + plen - 1 <= F.col("Lb"))
        )
        .select(
            "name_b",
            "L",
            "i",
            F.col("name_b").substr(pstart, plen).alias("sub"),
        )
        .distinct()
    )


@register(
    "x_fuzzy_passjoin",
    oracle="""
    WITH t AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
    FROM t a JOIN t b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin-style edit-distance self-join (Li et al., PVLDB 2012 —
    public literature): ALL name pairs within edit distance τ=2, found
    WITHOUT any block cross product — the scale lever x_fuzzy_match's
    docstring names, as code.

    The pigeonhole scheme: partition each indexed name into τ+1 = 3
    contiguous chunks; any name within distance τ must contain one chunk
    as an EXACT substring, shifted by at most τ.  So the probe side
    emits, for every plausible partner length L ∈ [len±τ] and chunk slot
    i, its substrings at the slot's position ±τ — a bounded constant
    (≤ 5·3·5) of short keys per name — and candidates come from an
    EQUI-join on (substring, slot, L).  Levenshtein then verifies only
    the candidates.  The oracle is the direct quadratic formulation over
    distinct names; the hash match proves the chunk scheme found every
    pair.

    100 TB: candidate cost is O(names · τ²·(τ+1)) keys + verified pairs
    — linear in the name table where the naive join squares; compose
    with x_fuzzy_match's instance→type collapse for repeated names."""
    TAU = 2
    K = TAU + 1

    p = load_table(spark, sf_dir, "part")
    t = p.select("p_name").distinct().withColumn("L", F.length("p_name"))

    # indexed side: the K chunks of each name (slot i, the partner-length
    # key is the name's own length)
    slot = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("i")
    chunks = t.select("p_name", "L", slot)
    start = (F.floor(F.col("i") * F.col("L") / K) + 1).cast("int")
    clen = (
        F.floor((F.col("i") + 1) * F.col("L") / K)
        - F.floor(F.col("i") * F.col("L") / K)
    ).cast("int")
    indexed = chunks.select(
        F.col("p_name").alias("name_a"),
        "L",
        "i",
        F.col("p_name").substr(start, clen).alias("sub"),
    ).filter(F.length("sub") > 0)

    probe = passjoin_probe_keys(t, TAU, K)

    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        indexed.join(probe, ["sub", "i", "L"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .filter(lev <= TAU)
        .select("name_a", "name_b", lev.cast("int").alias("lev"))
    )


KS_SRC_A, KS_SRC_B = "src0", "src1"


@register(
    "x_ks_drift",
    oracle=f"""
    WITH counts AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN source = '{KS_SRC_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN source = '{KS_SRC_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_b
      FROM documents
      WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
      GROUP BY n_chars
    ),
    cum AS (
      SELECT v,
             SUM(c_a) OVER (ORDER BY v) AS cum_a,
             SUM(c_b) OVER (ORDER BY v) AS cum_b,
             SUM(c_a) OVER () AS t_a,
             SUM(c_b) OVER () AS t_b
      FROM counts
    )
    SELECT CAST(v AS BIGINT)                AS at_value,
           CAST(t_a AS BIGINT)              AS n_a,
           CAST(t_b AS BIGINT)              AS n_b,
           CAST(abs(cum_a * t_b - cum_b * t_a) AS BIGINT) AS d_num,
           ROUND(CAST(abs(cum_a * t_b - cum_b * t_a) AS DOUBLE)
                 / (t_a * t_b), 4)          AS ks_stat
    FROM cum
    ORDER BY abs(cum_a * t_b - cum_b * t_a) DESC, v
    LIMIT 1
    """,
)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two
    sources' document-length distributions — q_drift_kl's
    order-statistic sibling: KL localizes drift per category; KS is the
    distribution-free test over an ORDERED domain (length, score,
    timestamp), the standard drift alarm for continuous features.  One
    row: the supremum gap D = max_v |F_a(v) - F_b(v)|, the length v
    achieving it (smallest on ties), and both sample sizes.

    Exactness: D is compared as the INTEGER cross-product
    |cum_a·t_b - cum_b·t_a| — no float CDFs, so the argmax is
    tie-stable across engines; the statistic divides once at the end.
    (At extreme counts the product needs DECIMAL(38) — fixture counts
    keep it in int64 with 2^63/(t_a·t_b) headroom documented.)

    Plan: ONE corpus pass (conditional partial-agg sums on the
    value-grain key), then cumulative + total windows over the
    |distinct values|-row summary — the deliberate bounded
    single-partition window of the q_drift_kl/x_curriculum_order
    pattern (a few hundred rows), then TakeOrdered(1).  100 TB:
    identical — the value grain for integer lengths is bounded by the
    length cap, not the corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    )
    counts = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == KS_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("source") == KS_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    from pyspark.sql.window import Window

    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "v",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_b").over(w_cum).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("t_a"),
        F.sum("c_b").over(w_all).alias("t_b"),
    )
    d_num = F.abs(
        F.col("cum_a") * F.col("t_b") - F.col("cum_b") * F.col("t_a")
    )
    return (
        cum.select(
            F.col("v").alias("at_value"),
            F.col("t_a").alias("n_a"),
            F.col("t_b").alias("n_b"),
            d_num.alias("d_num"),
            F.round(
                d_num.cast("double") / (F.col("t_a") * F.col("t_b")), 4
            ).alias("ks_stat"),
        )
        .orderBy(F.col("d_num").desc(), "at_value")
        .limit(1)
    )


DP_MAX_ORDERS = 3  # per-customer contribution bound


@register(
    "x_dp_clip",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ),
    flagged AS (
      SELECT r.o_custkey, r.o_totalprice,
             CASE WHEN r.rn <= {DP_MAX_ORDERS} THEN 1 ELSE 0 END AS kept
      FROM ranked r
    )
    SELECT n.n_name,
           CAST(COUNT(DISTINCT f.o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(f.kept) AS BIGINT)                 AS n_orders_kept,
           CAST(SUM(1 - f.kept) AS BIGINT)             AS n_orders_dropped,
           CAST(SUM(CASE WHEN f.kept = 1
                    THEN CAST(f.o_totalprice AS DECIMAL(18,4)) END)
                AS DOUBLE)                             AS clipped_spend
    FROM flagged f
    JOIN customer c ON f.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def dp_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRIBUTION-BOUNDED aggregation — the user-level sensitivity
    clipping stage of a differential-privacy / privacy-aware statistics
    pipeline: before aggregating spend per nation, each customer
    contributes at most {DP_MAX_ORDERS} orders (their earliest, by
    (o_orderdate, o_orderkey) — a deterministic rule, so the clip is
    reproducible).  The report shows what clipping cost: kept/dropped
    order counts and the clipped spend — after this, adding/removing
    one customer moves any nation's sum by at most
    {DP_MAX_ORDERS}·max_price, the bounded sensitivity calibrated noise
    needs.  (Noise injection itself is deliberately OUT of the
    deterministic engine surface; this operator is the exact part.)

    Plan: the rank window partitions by customer (bounded groups — a
    customer has ~10 orders at any SF), one shuffle; the dim joins
    (customer→nation) follow on the clipped rows; DECIMAL(18,4) keeps
    the fold exact.  100 TB: identical — per-user windows are the
    canonical bounded-state shuffle, and skew is impossible by the
    clip's own definition."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        "o_custkey",
        "o_totalprice",
        F.when(F.row_number().over(w) <= DP_MAX_ORDERS, 1)
        .otherwise(0)
        .alias("kept"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        flagged.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("kept").cast("long").alias("n_orders_kept"),
            F.sum(1 - F.col("kept")).cast("long").alias("n_orders_dropped"),
            F.sum(
                F.when(
                    F.col("kept") == 1,
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            )
            .cast("double")
            .alias("clipped_spend"),
        )
    )


PSI_DECILES = 9  # interior cutpoints → 10 buckets


@register(
    "x_psi_drift",
    oracle=f"""
    WITH counts AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN source = '{KS_SRC_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN source = '{KS_SRC_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_b
      FROM documents
      WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
      GROUP BY n_chars
    ),
    cum AS (
      SELECT v, c_a, c_b,
             SUM(c_a) OVER (ORDER BY v) AS cum_a,
             SUM(c_a) OVER () AS t_a
      FROM counts
    ),
    bucketed AS (
      SELECT c_a, c_b,
             1 + least({PSI_DECILES},
                       CAST((10 * (cum_a - c_a)) // t_a AS INT)) AS bucket
      FROM cum
    ),
    pb AS (
      SELECT bucket,
             CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_b) AS BIGINT) AS n_b,
             CAST(SUM(SUM(c_a)) OVER () AS DOUBLE) AS t_a,
             CAST(SUM(SUM(c_b)) OVER () AS DOUBLE) AS t_b
      FROM bucketed GROUP BY bucket
    )
    SELECT bucket, n_a, n_b,
           ROUND(n_a / t_a, 4) AS share_a,
           ROUND(n_b / t_b, 4) AS share_b,
           CAST(ROUND(CAST((n_a / t_a - n_b / t_b)
                           * ln((n_a / t_a) / (n_b / t_b))
                           AS DECIMAL(28,10)), 4) AS DOUBLE) AS psi_term
    FROM pb
    WHERE n_a > 0 AND n_b > 0
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX — the third leg of the drift-monitor
    family (q_drift_kl: categorical KL; x_ks_drift: continuous
    supremum; this: the binned industry standard every model-monitoring
    deployment alerts on at PSI > 0.2): decile buckets are derived from
    the REFERENCE source's exact distribution, both sources are counted
    into them, and each bucket contributes (p-q)·ln(p/q); Σ psi_term is
    the PSI, per-bucket terms localize WHERE the distribution moved.

    The bucket rule needs no cutpoint table at all: the percentile_disc
    cutpoint cut_d = min{{v : 10·cum(v) ≥ d·total}} satisfies
    v > cut_d ⟺ 10·cum(v-1) ≥ d·total for integer values, so a value's
    bucket is 1 + min({PSI_DECILES}, (10·(cum - c)) div total) —
    computed INLINE from the cumulative, pure integer math, tie-stable
    across engines.  (Deriving cuts as a separate branch would re-scan
    the corpus: the counts aggregate feeds two plan branches and Spark
    recomputes it — the inline rule keeps the whole query ONE chain.)

    Plan: one corpus pass builds the value-grain conditional counts;
    the cumulative runs on the bounded |distinct values| summary (the
    deliberate value-grain single-partition window of the q_drift_kl /
    x_ks_drift pattern); shares come from a ≤10-row aggregate.
    100 TB: identical — only value-grain and bucket-grain rows exist
    after the first aggregate."""
    from data_pipeline_cursor_spark.functions.math_ops import stable_round4
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    )
    counts = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == KS_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("source") == KS_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "c_a",
        "c_b",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_a").over(w_all).alias("t_a"),
    )
    bucketed = cum.select(
        "c_a",
        "c_b",
        (
            1
            + F.least(
                F.lit(PSI_DECILES),
                F.expr("(10 * (cum_a - c_a)) div t_a").cast("int"),
            )
        ).alias("bucket"),
    )
    pb = bucketed.groupBy("bucket").agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    wb = Window.partitionBy()
    pb = pb.select(
        "bucket",
        "n_a",
        "n_b",
        F.sum("n_a").over(wb).cast("double").alias("t_a"),
        F.sum("n_b").over(wb).cast("double").alias("t_b"),
    )
    p = F.col("n_a") / F.col("t_a")
    q = F.col("n_b") / F.col("t_b")
    return (
        pb.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round(p, 4).alias("share_a"),
            F.round(q, 4).alias("share_b"),
            stable_round4((p - q) * F.log(p / q)).alias("psi_term"),
        )
    )
