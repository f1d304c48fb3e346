"""Array / struct / map functions (SURVEY.md §2.B B17, §2.D D24-D25).

Parity anchor: the serving layer regroups rows into per-key collections
(/root/reference/visualization-server/server.js:45-57,81-94) — that's
``collect_list(struct(...))`` here.  Arrays are sorted before comparison
(determinism rule, SURVEY §5.2): collect_list order is partition-dependent,
``sort_array`` makes it canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_array_funcs",
    oracle="""
    SELECT user_id,
           list_sort(list_distinct(list(event_type)))      AS etypes,
           len(list_distinct(list(event_type)))::INTEGER   AS n_etypes,
           CASE WHEN list_contains(list(event_type), 'purchase')
                THEN 1 ELSE 0 END                          AS has_purchase
    FROM events
    GROUP BY user_id
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (D24): collect_list → array_distinct → sort_array,
    size, array_contains."""
    ev = load_table(spark, sf_dir, "events")
    types = F.collect_list("event_type")
    return ev.groupBy("user_id").agg(
        F.sort_array(F.array_distinct(types)).alias("etypes"),
        F.size(F.array_distinct(types)).alias("n_etypes"),
        F.when(F.array_contains(types, "purchase"), 1).otherwise(0).alias(
            "has_purchase"
        ),
    )


@register(
    "q_struct_funcs",
    oracle="""
    SELECT event_id,
           event_type AS s_type,
           ROUND(value, 4) AS s_value
    FROM events
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct create + field access (D25): build a struct, read fields back —
    output flattened to scalars so the oracle stays dialect-neutral."""
    ev = load_table(spark, sf_dir, "events")
    s = F.struct(
        F.col("event_type").alias("etype"), F.round("value", 4).alias("val")
    )
    return ev.select(
        "event_id",
        s.getField("etype").alias("s_type"),
        s.getField("val").alias("s_value"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           'et'                 AS first_key,
           event_type           AS et_value
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (D25): create_map → map_keys / element_at — flattened
    output (DuckDB MAP hashing differs, SURVEY §2.D)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.sort_array(F.map_keys(m)).getItem(0).alias("first_key"),
        F.element_at(m, "et").alias("et_value"),
    )


@register(
    "q_collect_struct",
    oracle="""
    SELECT event_type,
           md5(string_agg(
                 strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                 CAST(event_id AS VARCHAR) || '|' ||
                 CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR),
                 ';' ORDER BY ts, event_id)) AS points_md5,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM events
    GROUP BY event_type
    """,
)
def collect_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regroup rows → per-key collection of structs (B17). Parity:
    rows → {city: [points]} (/root/reference/visualization-server/server.js:45-57).

    Was rows-only through round 4 (list-of-struct hashing is engine-
    fragile: Spark Rows vs DuckDB dicts canonicalize differently).
    Promoted to a full oracle by rendering the SORTED collection to one
    canonical string per key and md5-ing it — the same portable-hash trick
    the MinHash/SimHash signatures use.  The struct collection itself is
    still built in-plan (collect_list(struct) + sort_array, total order on
    (ts, event_id)); the md5 then pins every element, in order, including
    the decimal(18,4) rendering of value (double→decimal(.,4) has no
    dyadic midpoints, so both engines round identically)."""
    ev = load_table(spark, sf_dir, "events")
    points = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    canon = F.array_join(
        F.transform(
            points,
            lambda p: F.concat_ws(
                "|",
                F.date_format(p["ts"], "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                p["event_id"].cast("string"),
                p["value"].cast("decimal(18,4)").cast("string"),
            ),
        ),
        ";",
    )
    return ev.groupBy("event_type").agg(
        F.md5(canon).alias("points_md5"),
        F.count(F.lit(1)).alias("n_points"),
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): concatenate the
    group's values in a declared order — deterministic because the order
    is total (names are unique per region).

    Spark spells it listagg(...) WITHIN GROUP (ORDER BY ...) (4.0+);
    same single hash-agg plan as any groupBy."""
    n = load_table(spark, sf_dir, "nation")
    n.createOrReplaceTempView("nation_sa")
    return n.sparkSession.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               COUNT(*) AS n
        FROM nation_sa
        GROUP BY n_regionkey
        """
    )


@register(
    "q_width_bucket",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN l_quantity < 0 THEN 0
                  WHEN l_quantity >= 50 THEN 11
                  ELSE CAST(floor(l_quantity / 5) AS BIGINT) + 1
             END AS bucket,
             l_extendedprice
      FROM lineitem
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(l_extendedprice), 4)   AS avg_price
    FROM b GROUP BY bucket
    """,
)
def width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bucketing (width_bucket): equi-width binning of a
    numeric column + per-bucket stats — the building block of histogram/
    distribution reports.  One hash agg on a derived int key."""
    li = load_table(spark, sf_dir, "lineitem")
    b = F.width_bucket(F.col("l_quantity"), F.lit(0), F.lit(50), F.lit(10))
    return li.groupBy(b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@register(
    "q_posexplode",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
          FROM documents WHERE doc_id % 199 = 0) d,
         unnest(generate_series(1, len(toks))) AS t(i)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY): each array element with
    its 0-based position — the token-offset view a tokenizer emits.
    Same Generate node as explode; position costs nothing extra."""
    from data_pipeline_cursor_spark.text.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 199 == 0).select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "token")
    )


@register(
    "q_date_series",
    oracle="""
    WITH days AS (
      SELECT CAST(d AS DATE) AS day
      FROM generate_series(DATE '1995-01-01', DATE '1995-03-31',
                           INTERVAL 1 DAY) AS t(d)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM days LEFT JOIN orders ON o_orderdate = day
    GROUP BY day
    """,
)
def date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation (generate_series over dates) + left join —
    the gap-free time series every dashboard needs (days with zero orders
    still appear).

    100 TB: facts pre-aggregate to one row per day FIRST (one shuffle with
    map-side partial agg), so the spine joins a per-day aggregate — and
    that aggregate, now tiny, broadcasts as the right side of the left
    join.  A broadcast hint on the spine itself is unusable: Spark cannot
    broadcast the PRESERVED side of an outer join (BroadcastHashJoin
    builds only the non-preserved side), so the previous spine-side hint
    was silently ignored (round-2 ADVICE)."""
    o = load_table(spark, sf_dir, "orders")
    days = (
        o.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1995-03-31").cast("date"),
                )
            ).alias("day")
        )
    )
    per_day = o.groupBy("o_orderdate").agg(
        F.count("o_orderkey").alias("cnt")
    )
    return (
        days.join(
            F.broadcast(per_day), per_day.o_orderdate == F.col("day"), "left"
        )
        # string day: pandas renders an engine DATE as midnight Timestamp
        # on one side and datetime.date on the other — format for parity
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders"),
        )
    )


@register(
    "q_array_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           list_sort(list(DISTINCT o_orderstatus)) AS statuses,
           CAST(len(list(DISTINCT o_orderstatus)) AS INTEGER) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def array_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT set aggregation to a sorted array (D24b's set-valued form):
    collect_set + array_sort ≡ list_sort(list(DISTINCT)).  The sort is the
    determinism rule (registry.py: sort arrays before comparison); the
    distinct fold combines map-side so per-group state is bounded by
    cardinality, not row count."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_sort(F.collect_set("o_orderstatus")).alias("statuses"),
            F.size(F.collect_set("o_orderstatus")).alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER)
             AS n_long,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
             AS len_sum,
           (len(list_filter(toks, t -> t = 'spark')) > 0)  AS has_spark,
           (len(list_filter(toks, t -> length(t) = 0)) = 0) AS all_nonempty
    FROM t
    """,
)
def higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (D24's lambda tier: filter / aggregate
    fold / exists / forall) — per-row functional programming that stays
    entirely inside Catalyst codegen, the idiomatic alternative to
    exploding when the answer is per-row.  The fold's add runs in long —
    deterministic; the oracle spells exists/forall as the portable
    list_filter forms."""
    from data_pipeline_cursor_spark.text.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("len_sum"),
        F.exists(toks, lambda t: t == F.lit("spark")).alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
    )
