"""Benchmark decontamination + repetition filtering (SURVEY.md §2.E
extensions — training-data curation steps every large-scale pipeline runs
before a corpus ships to pretraining).

Reference parity note: the reference pipeline has no LLM-curation surface
(its corpus is weather telemetry); these operators extend the engine per
the driver brief ("the operations a large-scale training-data pipeline
would need"), alongside dedup (text/dedup.py) and quality scoring
(text/analysis.py).

Scale shapes:
- Contamination is an INVERTED-INDEX equi-join on shingle hash — corpus
  and benchmark are both shingled once, the benchmark side is tiny
  (an eval suite, thousands of docs) and broadcasts; there is never a
  doc×doc comparison.  Same blocking idea as MinHash banding
  (text/dedup.py), specialized to exact n-gram containment.
- Repetition scoring is per-row expression work (zero shuffle until the
  audit aggregate): Gopher-style duplicate-token / duplicate-bigram
  fractions computed from the token array in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.functions.math_ops import stable_round4
from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table
from data_pipeline_cursor_spark.text.analysis import tokens_col

# Stand-in for the external eval-suite corpus: a deterministic 2% slice of
# documents (doc_id % 50 == 0).  In production this side is the benchmark
# set loaded from its own table; everything downstream is unchanged.
BENCH_MOD = 50
NGRAM = 3


def _shingles(tok, n: int):
    """DISTINCT word n-grams of a token array (slice+zip against shifted
    tails — x_ngram's idiom, no index arithmetic).

    Deliberately NOT shared with text.dedup.shingles_col: that one is
    pinned to different edge semantics by its own oracle (non-distinct
    grams; a <n-token doc emits one PARTIAL shingle via concat_ws
    NULL-skipping, which MinHash needs so short docs still get a
    signature).  Here a <n-token doc contributes nothing — containment
    over partial grams would fabricate cross-length matches.  Distinctness
    is load-bearing too: contamination counts each gram once per doc."""
    cnt = F.greatest(F.size(tok) - (n - 1), F.lit(0))
    parts = [F.slice(tok, i + 1, cnt) for i in range(n)]
    zipped = F.arrays_zip(*parts)
    gram = F.transform(
        zipped, lambda p: F.concat_ws(" ", *[p[str(i)] for i in range(n)])
    )
    return F.array_distinct(gram)


@register(
    "x_contamination",
    oracle="""
    WITH tri AS (
      SELECT doc_id, concat_ws(' ', l[i], l[i+1], l[i+2]) AS g
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM documents) x,
           unnest(generate_series(1, len(l) - 2)) AS t(i)
    ),
    bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 50 = 0),
    corp AS (
      SELECT DISTINCT doc_id, g FROM tri WHERE doc_id % 50 != 0
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM corp GROUP BY doc_id
    ),
    hits AS (
      SELECT corp.doc_id, COUNT(*) AS n_hit
      FROM corp JOIN bench USING (g)
      GROUP BY corp.doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(h.n_hit AS BIGINT) AS n_hit,
           CAST(ROUND(CAST(h.n_hit * 1.0 / p.n_grams AS DECIMAL(28,10)), 4)
                AS DOUBLE) AS contamination
    FROM per_doc p JOIN hits h USING (doc_id)
    """,
)
def contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct word trigrams that appear anywhere in the benchmark set —
    the n-gram-overlap decontamination test run before pretraining (the
    published recipe: drop or flag docs sharing n-grams with eval suites).

    Plan: corpus docs → distinct trigrams (explode), benchmark trigram
    set likewise (distinct, deduplicated across its docs), equi-join on
    the gram with the benchmark side BROADCAST (an eval suite is tiny
    relative to a training corpus), then a per-doc hash agg.  Inverted
    index, not pairwise comparison: cost is O(corpus grams + hits).

    100 TB: the repartition below exists because the FIXTURE is one
    parquet file → one scan task (a real corpus arrives in thousands of
    splits and needs no such spreading); past that, the shuffles are the
    per-doc gram/hit aggregations.  Swap the broadcast for a shuffle join
    if the benchmark side ever outgrows the broadcast threshold.  Emit
    n_hit >= 1 docs only — the clean majority would dominate the output
    with zeros."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    tri = docs.select(
        "doc_id", F.explode(_shingles(tokens_col(), NGRAM)).alias("g")
    )
    bench = (
        tri.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE traversal of the corpus grams: left-join the broadcast benchmark
    # set as a hit MARKER, then a single per-doc agg counts total grams and
    # hits together (the naive per_doc ⋈ hits formulation recomputes the
    # tokenize+shingle+explode subtree three times — r4 review finding)
    corp = tri.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corp.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
        .filter(F.col("n_hit") >= 1)
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            stable_round4(F.col("n_hit") / F.col("n_grams")).alias(
                "contamination"
            ),
        )
    )


@register(
    "x_repetition_filter",
    oracle="""
    WITH stats AS (
      SELECT doc_id,
             len(l) AS n_tokens,
             len(list_distinct(l)) AS n_distinct,
             len(bi) - len(list_distinct(bi)) AS dup_bigrams
      FROM (
        SELECT doc_id,
               string_split(lower(text), ' ') AS l,
               list_transform(
                 generate_series(1, len(string_split(lower(text), ' ')) - 1),
                 i -> concat_ws(' ', string_split(lower(text), ' ')[i],
                                     string_split(lower(text), ' ')[i+1])
               ) AS bi
        FROM documents
      )
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(1.0 - n_distinct * 1.0 / n_tokens
                           AS DECIMAL(28,10)), 4) AS DOUBLE)
             AS dup_token_ratio,
           CAST(ROUND(CAST(dup_bigrams * 1.0 / greatest(n_tokens - 1, 1)
                           AS DECIMAL(28,10)), 4) AS DOUBLE)
             AS dup_bigram_ratio
    FROM stats
    WHERE 1.0 - n_distinct * 1.0 / n_tokens > 0.55
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: flag documents whose
    duplicate-token fraction exceeds 0.55 (fixture-calibrated; the
    published filters use per-n-gram thresholds of the same shape),
    reporting the duplicate-token and duplicate-bigram ratios.

    Pure per-row expression work over the token array (distinct/size
    arithmetic) — no shuffle, no UDF; predicates stay in whole-stage
    codegen and the filter pushes into the scan's output early.  At
    100 TB this runs at scan speed; the flagged set is the interesting
    (small) side."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens_col()
    bi = _shingles(tok, 2)  # distinct bigrams
    n_tok = F.size(tok)
    n_bi = F.greatest(n_tok - 1, F.lit(1))
    dup_tok = 1.0 - F.size(F.array_distinct(tok)) / n_tok
    dup_bi = (F.greatest(n_tok - 1, F.lit(0)) - F.size(bi)) / n_bi
    return (
        docs.select(
            "doc_id",
            n_tok.cast("long").alias("n_tokens"),
            stable_round4(dup_tok).alias("dup_token_ratio"),
            stable_round4(dup_bi).alias("dup_bigram_ratio"),
            dup_tok.alias("_raw"),
        )
        .filter(F.col("_raw") > 0.55)
        .drop("_raw")
    )


@register(
    "x_domain_mix",
    oracle="""
    WITH per AS (
      SELECT source, COUNT(*) AS cnt,
             (CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 4) + 1
               AS w
      FROM documents GROUP BY source
    ),
    s AS (SELECT SUM(cnt) AS total, SUM(w) AS sum_w FROM per),
    plan AS (
      -- pure BIGINT arithmetic (// is integer division): no floating
      -- intermediate exists, so both engines compute the identical cutoff
      -- by construction, not by luck
      SELECT source,
             LEAST(10000, (10000 * w * total) // (sum_w * cnt)) AS keep_bp
      FROM per CROSS JOIN s
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN plan USING (source)
    WHERE ('0x' || substr(md5('mix:' || d.doc_id), 1, 15))::BIGINT % 10000
          < plan.keep_bp
    GROUP BY d.source
    """,
)
def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture domain sampling: resample the corpus so each source's
    share approaches a target weight — the data-mixing step of corpus
    assembly (upweight curated domains, downweight crawl).

    Targets here derive deterministically from the source id (weight
    1–4 by source number mod 4 — a stand-in for the mixing config).  The
    per-source keep rate is min(1, target_share × total / count_s),
    quantized to basis points with INTEGER math so both engines compute
    the identical cutoff, and applied via the portable md5-residue idiom
    (x_stratified_sample / q_sample_hash): reproducible across engines,
    runs, and partitionings, and pushes down as a plain predicate.

    Plan: one tiny per-source aggregate (|sources| rows) → one-row
    totals broadcast-crossed back → broadcast-joined to the corpus; the
    corpus itself never shuffles before the audit aggregate.  At 100 TB
    the mixing plan is O(|sources|) metadata, exactly like a real mixing
    config."""
    from data_pipeline_cursor_spark.text.dedup import phash

    docs = load_table(spark, sf_dir, "documents")
    w = (F.regexp_extract("source", r"src(\d+)", 1).cast("int") % 4) + 1
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).withColumn(
        "w", w
    )
    sums = per.agg(
        F.sum("cnt").alias("total"), F.sum("w").alias("sum_w")
    )
    plan = per.crossJoin(F.broadcast(sums)).select(
        "source",
        F.least(
            F.lit(10000).cast("long"),
            F.expr("10000L * w * total div (sum_w * cnt)"),
        ).alias("keep_bp"),
    )
    kept = docs.join(F.broadcast(plan), "source").filter(
        phash(F.col("doc_id").cast("string"), "mix") % 10000
        < F.col("keep_bp")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "x_temperature_mix",
    oracle="""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
               AS isq
      FROM documents GROUP BY source
    ),
    s AS (SELECT SUM(cnt) AS total, SUM(isq) AS sum_isq FROM per),
    plan AS (
      SELECT source,
             LEAST(10000, (10000 * isq * total) // (sum_isq * cnt)) AS keep_bp
      FROM per CROSS JOIN s
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN plan USING (source)
    WHERE ('0x' || substr(md5('tmix:' || d.doc_id), 1, 15))::BIGINT % 10000
          < plan.keep_bp
    GROUP BY d.source
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the mT5/XLM-R multilingual recipe:
    sample source s with probability ∝ n_s^α, α=0.5) — x_domain_mix's
    sibling where the mix follows from corpus statistics instead of an
    explicit target table, flattening the head without starving the tail.

    Determinism: sqrt is IEEE exactly-rounded (bit-identical in both
    engines), quantized to an integer ×10⁶ immediately; every downstream
    step (shares, keep rate in basis points) is pure BIGINT arithmetic, so
    the cutoff is identical by construction.  Keep decisions use the
    portable md5-residue idiom.  At 10¹² docs the 10000·isq·total product
    needs 128-bit math (DECIMAL(38,0)) — noted, not needed at fixture SFs.

    Plan shape is x_domain_mix's: O(sources) aggregate → one-row totals
    broadcast → broadcast-joined keep predicate that pushes down."""
    from data_pipeline_cursor_spark.text.dedup import phash

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    per = per.withColumn(
        "isq", F.floor(F.sqrt(F.col("cnt").cast("double")) * 1000000).cast("long")
    )
    s = per.agg(
        F.sum("cnt").alias("total"), F.sum("isq").alias("sum_isq")
    )
    plan = per.crossJoin(F.broadcast(s)).select(
        "source",
        F.least(
            F.lit(10000).cast("long"),
            F.expr("(10000 * isq * total) div (sum_isq * cnt)"),
        ).alias("keep_bp"),
    )
    kept = docs.join(F.broadcast(plan), "source").filter(
        phash(F.col("doc_id").cast("string"), "tmix") % 10000 < F.col("keep_bp")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "x_benchmark_coverage",
    oracle="""
    WITH tri AS (
      SELECT doc_id, concat_ws(' ', l[i], l[i+1], l[i+2]) AS g
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM documents) x,
           unnest(generate_series(1, len(l) - 2)) AS t(i)
    ),
    bg AS (
      SELECT DISTINCT doc_id, g FROM tri WHERE doc_id % 50 = 0
    ),
    cg AS (SELECT DISTINCT g FROM tri WHERE doc_id % 50 != 0)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(cg.g) AS BIGINT) AS n_covered,
           CAST(ROUND(CAST(COUNT(cg.g) * 1.0 / COUNT(*) AS DECIMAL(28,10)),
                      4) AS DOUBLE) AS coverage
    FROM bg LEFT JOIN cg USING (g)
    GROUP BY bg.doc_id
    """,
)
def benchmark_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark SATURATION — x_contamination's mirror image: for each
    BENCHMARK document, the fraction of its distinct trigrams that occur
    anywhere in the training corpus.  Contamination asks "which training
    docs should be dropped"; coverage asks "how compromised is each eval
    item" — the number an eval-integrity report carries per benchmark
    task, because a 0.9-covered item measures memorization even after
    the offending training docs are gone.

    Plan: corpus trigrams deduplicate once (one hash agg — the only
    corpus-sized shuffle); the benchmark gram table (eval-suite-sized)
    broadcasts into the join from the SMALL side, and the per-item
    aggregate runs over |benchmark grams| rows.  Cost O(corpus grams +
    benchmark grams) — never doc×doc."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    tri = docs.select(
        "doc_id", F.explode(_shingles(tokens_col(), NGRAM)).alias("g")
    )
    bg = tri.filter(F.col("doc_id") % BENCH_MOD == 0).distinct()
    cg = (
        tri.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    covered = cg.join(F.broadcast(bg.select("g").distinct()), "g").select(
        "g", "hit"
    )
    return (
        bg.join(F.broadcast(covered), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_covered"),
            stable_round4(
                F.count("hit") / F.count(F.lit(1))
            ).alias("coverage"),
        )
    )
