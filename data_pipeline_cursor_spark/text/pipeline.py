"""The composed curation pipeline — the end-to-end flow a training-data
team actually runs, as ONE verified query (SURVEY.md §2.E capstone).

Stages, in dependency order, each already proven as a standalone operator:

1. **quality gate** — length and token-count bounds (x_quality_score's
   family of signals, reduced to the two portable ones);
2. **exact dedup** — keep the min doc_id per identical text (x_dedup_exact);
3. **near-dup drop** — greedy: drop every doc that appears as the LARGER
   id of a verified near-dup pair over the surviving set
   (minhash_verified_pairs_df — the wide-band + exact-Jaccard family
   that is the round-7 default for the whole dedup-graph stack; the
   prefix-block jaccard_pairs_df went quadratic at sf10).  Greedy-by-id
   keeps at least one doc per near-dup cluster deterministically without
   the iterative clustering pass (x_dedup_cluster is the exact variant);
4. **stratified sample** — per-language keep rates by portable hash
   residue (x_stratified_sample's idiom);
5. **audit summary** — per (lang, source) doc/token/char counts, the
   numbers a curation run reports.

Each stage's intermediate is a DataFrame — the pipeline is ONE lazy plan,
so Catalyst sees through the whole composition (filters reach the scan,
the dedup aggregate and the signature pipeline share the gated corpus
via one cache).  The DuckDB oracle replays all five stages as chained
CTEs, so the final audit numbers are value-checked end to end.

100 TB: stages 1/4 are zero-shuffle predicates; stage 2 is one hash agg on
text; stage 3 is band equi-joins + candidate-sized exact verify (never
O(n²) — candidates ~linear in the corpus, round-6 measurement) plus an
anti-join on doc id; stage 5 one small agg.  Nothing collects; every
stage's output is a fraction of its input, so the expensive pair join runs
on the already-gated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table
from data_pipeline_cursor_spark.text.dedup import (
    duck_wide_verified_pairs,
    minhash_verified_pairs_df,
    phash,
)

MIN_CHARS, MAX_CHARS = 50, 10_000
MIN_TOKENS = 10

_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    ),
    gated AS (
      SELECT * FROM base
      WHERE n_chars BETWEEN {MIN_CHARS} AND {MAX_CHARS}
        AND n_tok >= {MIN_TOKENS}
    ),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text
    ),
    exact_deduped AS (
      SELECT g.* FROM gated g JOIN keepers USING (doc_id)
    ),
    {duck_wide_verified_pairs('exact_deduped')},
    near_deduped AS (
      SELECT * FROM exact_deduped
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    ),
    sampled AS (
      SELECT * FROM near_deduped
      WHERE ('0x' || substr(md5('strat:' || doc_id), 1, 15))::BIGINT % 100
            < CASE lang WHEN 'en' THEN 80 WHEN 'zh' THEN 50 ELSE 20 END
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(SUM(n_tok) AS BIGINT)  AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM sampled
    GROUP BY lang, source
"""


@register("x_curation_pipeline", oracle=_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → greedy near-dup drop → stratified
    sample → audit summary, as one lazy Spark plan (module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.withColumn(
        "n_tok", F.size(F.split(F.lower("text"), " ")).cast("bigint")
    )
    gated = base.filter(
        F.col("n_chars").between(MIN_CHARS, MAX_CHARS)
        & (F.col("n_tok") >= MIN_TOKENS)
    )
    keepers = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    # cache: the exact-deduped corpus feeds the signature pipeline, the
    # shingle-set verify AND the anti-join — uncached, the gate + dedup
    # subplan would re-run three times
    exact_deduped = gated.join(keepers.select("doc_id"), "doc_id").cache()
    dropped = (
        minhash_verified_pairs_df(exact_deduped)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    near_deduped = exact_deduped.join(dropped, "doc_id", "left_anti")
    rate = (
        F.when(F.col("lang") == "en", 80)
        .when(F.col("lang") == "zh", 50)
        .otherwise(20)
    )
    sampled = near_deduped.filter(
        phash(F.col("doc_id").cast("string"), "strat") % 100 < rate
    )
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
