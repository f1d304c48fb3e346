"""UDF surface (SURVEY.md §2.D D36): scalar pandas UDF, grouped-agg pandas
UDF, applyInPandas (grouped map), mapInPandas (UDTF-ish).

The reference ships no UDFs anywhere; this is the extension surface a Spark
user gets.  Policy (100 TB): Python only via Arrow-batched pandas UDFs —
never row-at-a-time ``udf()`` in a hot path (10-100× slower, SNIPPETS.md
patterns).  Each query here has a pure-SQL oracle so the UDF machinery is
verified for VALUE correctness, not just shape.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table


@register(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::INTEGER AS n_words,
           ROUND(n_chars / (1.0 + len(string_split(text, ' '))), 4) AS chars_per_word
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized): word count over the documents
    table, plus a derived ratio computed JVM-side on the UDF output."""

    @pandas_udf("int")
    def word_count(text: pd.Series) -> pd.Series:
        # split on the literal single space to match string_split(text, ' ');
        # nullable Int32 so a NULL text yields NULL (plain int32 astype
        # raises on the NaN a null row produces, killing the whole task)
        return text.str.split(" ").str.len().astype("Int32")

    docs = load_table(spark, sf_dir, "documents")
    # invoke the UDF ONCE and derive from the alias: Python UDFs are
    # extracted before expression CSE, so two textual calls run the whole
    # Arrow round trip twice
    counted = docs.select("doc_id", "n_chars", word_count("text").alias("n_words"))
    return counted.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_chars") / (1.0 + F.col("n_words")), 4).alias(
            "chars_per_word"
        ),
    )


@register(
    "q_pandas_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * value) / SUM(value), 4) AS self_weighted_avg
    FROM events
    GROUP BY event_type
    """,
)
def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: a custom aggregate (self-weighted mean)
    computed in one Arrow batch per group."""

    @pandas_udf("double")
    def self_weighted_avg(v: pd.Series) -> float:
        return float((v * v).sum() / v.sum())

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(self_weighted_avg("value"), 4).alias("self_weighted_avg")
    )


@register(
    "q_apply_in_pandas",
    oracle="""
    SELECT event_id,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score normalization (the
    canonical grouped-map pattern).  pandas std() is ddof=1 = stddev_samp.

    100 TB note: each group must fit in one executor's memory — fine for
    bounded key domains like event_type; for unbounded keys use the
    window-function formulation instead (same oracle SQL)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": ((v - v.mean()) / v.std()).round(4)}
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, z double"
    )


@register(
    "q_map_in_pandas",
    oracle="""
    SELECT event_id, ROUND(value * 2, 4) AS boosted
    FROM events
    WHERE event_type = 'click'
    """,
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (UDTF-ish): streaming per-partition Arrow batches with
    filter + projection — the plumbing pattern for multimodal decode
    (vectors/multimodal.py) verified here on plain data."""

    def transform(batches):
        for pdf in batches:
            out = pdf[pdf["event_type"] == "click"]
            yield pd.DataFrame(
                {"event_id": out["event_id"], "boosted": (out["value"] * 2).round(4)}
            )

    ev = load_table(spark, sf_dir, "events")
    return ev.mapInPandas(transform, schema="event_id long, boosted double")


@register(
    "q_udtf",
    oracle="""
    SELECT doc_id, s.i AS sent_idx,
           trim(s.sent) AS sentence,
           CAST(len(string_split(trim(s.sent), ' ')) AS INT) AS n_words
    FROM (
      SELECT doc_id,
             generate_subscripts(string_split(text, '.'), 1) AS i,
             unnest(string_split(text, '.')) AS sent
      FROM documents
    ) s
    WHERE trim(s.sent) <> ''
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python USER-DEFINED TABLE FUNCTION (Spark 3.5+ `@udtf`) — the
    one-row-in/many-rows-out UDF shape that completes the D36 surface
    (scalar, pandas, grouped, mapInPandas, and now table-valued):
    sentence segmentation with positions, the canonical UDTF example and
    the text-pipeline primitive behind chunkers.

    The built-in twin is posexplode(split(...)) — a UDTF earns its place
    when the per-row expansion needs imperative logic (real sentence
    breakers, parsers); the interface cost is what this query pins.
    Plan: a Generate-style expansion inside the scan projection, no
    shuffle; at 100 TB rows fan out per-task exactly like explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split("."), start=1):
                sent = raw.strip()
                if sent:
                    yield i, sent, len(sent.split(" "))

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words "
        "FROM udtf_docs d, LATERAL sentence_split(d.text) s"
    )
