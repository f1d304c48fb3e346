"""String & regex scalar functions (SURVEY.md §2.D D21-D23).

All JVM-side Catalyst built-ins — zero Python in the hot path; every
expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_type)                          AS type_lower,
           upper(p_name)                          AS name_upper,
           substring(p_name, 1, 5)                AS name_pre,
           length(p_name)                         AS name_len,
           concat_ws('|', p_brand, p_type)        AS brand_type,
           trim(concat(' ', p_name, ' '))         AS name_trim,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
           replace(p_name, ' ', '_')              AS name_snake,
           instr(p_name, 'widget')                AS widget_at
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (D21): lower/upper/substring/length/concat_ws/
    trim/lpad/replace/instr."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr(F.col("p_name"), "widget").alias("widget_at"),
    )


@register(
    "q_regexp",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1)              AS cust_num,
           regexp_replace(c_name, '^Customer#0*', '')          AS short_id,
           CASE WHEN regexp_matches(c_name, '00$') THEN 1 ELSE 0 END AS ends_00
    FROM customer
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (D22): extract/replace/rlike.  Patterns restricted to the
    Java∩RE2-compatible subset so Spark and DuckDB agree."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_num"),
        F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_id"),
        F.when(F.col("c_name").rlike("00$"), 1).otherwise(0).alias("ends_00"),
    )


@register(
    "q_split_explode",
    oracle="""
    SELECT p_partkey, word
    FROM part, UNNEST(string_split(p_name, ' ')) AS t(word)
    """,
)
def split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode (D23) ≡ LATERAL UNNEST: one row per word of p_name."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@register(
    "q_levenshtein",
    oracle="""
    SELECT n_name,
           levenshtein(n_name, 'NATION_12')                  AS dist_lit,
           levenshtein(lower(n_name), replace(lower(n_name), '_', '-'))
                                                             AS dist_sep
    FROM nation
    ORDER BY n_name
    """,
)
def levenshtein_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (D21's fuzzy-match sibling; both engines ship
    levenshtein as a built-in).  Integer outputs — no float hazard.
    100 TB note: levenshtein is O(len²) per pair — fine as a projection,
    but fuzzy JOINS should band candidates first (the x_dedup_* pattern),
    never theta-join on edit distance."""
    n = load_table(spark, sf_dir, "nation")
    lower = F.lower(F.col("n_name"))
    return n.select(
        "n_name",
        F.levenshtein(F.col("n_name"), F.lit("NATION_12")).alias("dist_lit"),
        F.levenshtein(lower, F.replace(lower, F.lit("_"), F.lit("-"))).alias(
            "dist_sep"
        ),
    ).orderBy("n_name")
