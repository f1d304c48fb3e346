"""Sequence packing — the training-data step that concatenates documents
into fixed-capacity token sequences (SURVEY.md §2.E family; not in the
reference — /root/reference has no document processing).

Packing rule: **deterministic next-fit** — docs are sharded by
``doc_id % N_SHARDS``, walked in doc_id order within the shard, and a doc
opens a new sequence whenever it would overflow ``SEQ_LEN`` tokens (a doc
longer than SEQ_LEN gets a sequence of its own; downstream truncates).
Next-fit is stateful-sequential, so it runs per-shard inside
``applyInPandas`` — the shard IS the unit of parallelism, exactly how
production packers shard a corpus across workers.  The DuckDB oracle
replays the same recursion with a recursive CTE, so the assignment is
fully value-checked, not rows-only.

100 TB: one shuffle on the shard key; per-shard state is two integers
(current sequence id + fill), the walk is O(docs/shard).  Shard count is
the knob: more shards = more parallelism, marginally worse packing at
shard boundaries (next-fit never crosses shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table

SEQ_LEN = 1024
N_SHARDS = 8

_ORACLE = f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id % {N_SHARDS} AS shard,
             COALESCE(len(string_split(lower(text), ' ')), 1) AS n_tok,
             row_number() OVER (PARTITION BY doc_id % {N_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack AS (
      SELECT shard, rn, doc_id, n_tok,
             0 AS seq_id, 0 AS seq_offset, n_tok AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.n_tok,
             CASE WHEN p.fill + d.n_tok > {SEQ_LEN}
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.fill + d.n_tok > {SEQ_LEN}
                  THEN 0 ELSE p.fill END,
             CASE WHEN p.fill + d.n_tok > {SEQ_LEN}
                  THEN d.n_tok ELSE p.fill + d.n_tok END
      FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT CAST(doc_id AS BIGINT)     AS doc_id,
           CAST(shard AS BIGINT)      AS shard,
           CAST(seq_id AS BIGINT)     AS seq_id,
           CAST(seq_offset AS BIGINT) AS seq_offset,
           CAST(n_tok AS BIGINT)      AS n_tok
    FROM pack
"""


@register("x_seq_pack", oracle=_ORACLE)
def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ≤1024-token training sequences (module
    docstring).  Output: one row per doc with its (shard, seq_id,
    seq_offset) placement — the manifest a tokenizer/concat stage consumes."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        # NULL text counts as 1 token (= an empty doc), both engines: a
        # NULL n_tok would NaN-crash the pandas walk here and NULL-poison
        # the recursive CTE's running fill in the oracle
        F.coalesce(
            F.size(F.split(F.lower("text"), " ")).cast("bigint"), F.lit(1)
        ).alias("n_tok"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = np.empty(len(pdf), dtype=np.int64)
        offsets = np.empty(len(pdf), dtype=np.int64)
        seq, fill = 0, 0
        for i, n in enumerate(pdf["n_tok"].to_numpy()):
            if fill > 0 and fill + n > SEQ_LEN:
                seq += 1
                fill = 0
            seq_ids[i] = seq
            offsets[i] = fill
            fill += n
        return pdf.assign(seq_id=seq_ids, seq_offset=offsets)[
            ["doc_id", "shard", "seq_id", "seq_offset", "n_tok"]
        ]

    return d.groupBy("shard").applyInPandas(
        pack_shard,
        "doc_id bigint, shard bigint, seq_id bigint, seq_offset bigint, n_tok bigint",
    )


@register(
    "x_pack_manifest",
    oracle=_ORACLE.replace(
        """    SELECT CAST(doc_id AS BIGINT)     AS doc_id,
           CAST(shard AS BIGINT)      AS shard,
           CAST(seq_id AS BIGINT)     AS seq_id,
           CAST(seq_offset AS BIGINT) AS seq_offset,
           CAST(n_tok AS BIGINT)      AS n_tok
    FROM pack""",
        """    SELECT CAST(shard AS BIGINT)  AS shard,
           CAST(seq_id AS BIGINT) AS seq_id,
           list(doc_id ORDER BY seq_offset) AS doc_ids,
           CAST(COUNT(*) AS BIGINT)   AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tok
    FROM pack
    GROUP BY shard, seq_id""",
    ),
)
def pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per PACKED SEQUENCE: the ordered doc list + token total the
    concat/tokenize stage consumes — the aggregated view of x_seq_pack's
    per-doc placement.  array_agg ordered by seq_offset is deterministic
    (offsets are unique within a sequence by construction).

    100 TB: reuses x_seq_pack's one shuffle, then a (shard, seq_id) hash
    agg; sequences are bounded (≤ SEQ_LEN tokens) so no group outgrows a
    task."""
    placed = seq_pack(spark, sf_dir)
    return (
        placed.groupBy("shard", "seq_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seq_offset", "doc_id"))
            ).getField("doc_id").alias("doc_ids"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tok"),
        )
    )


@register(
    "x_shard_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5('shuf:' || doc_id), 1, 15))::BIGINT AS hv
      FROM documents
    )
    SELECT hv % 16 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(hv) AS BIGINT) AS first_hash,
           CAST(MAX(hv) AS BIGINT) AS last_hash
    FROM h GROUP BY 1
    """,
)
def shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic shuffle → shard assignment (E21): the
    shuffle-before-sharding step of training-data assembly.  Each doc's
    position is a portable md5 hash of its id — a reproducible random
    permutation that no engine, run, or partitioning changes — and its
    shard is the hash residue; within a shard the hash IS the read order.
    Emits the per-shard manifest (doc/char counts + hash range) that a
    data loader would consume.

    100 TB: ONE hash-partition shuffle, uniform by construction (md5
    residues can't skew); writing the shards is
    ``repartition(N, shard).sortWithinPartitions(hash)`` — the manifest
    here audits exactly that layout without materializing it.  Contrast
    x_seq_pack's ``doc_id % N`` sharding (locality-preserving for the
    packer) — THIS op is the one that destroys curation-order correlation
    before training reads the corpus sequentially."""
    from data_pipeline_cursor_spark.text.dedup import phash

    docs = load_table(spark, sf_dir, "documents")
    hv = phash(F.col("doc_id").cast("string"), "shuf")
    return (
        docs.select(
            (hv % 16).alias("shard"), F.col("n_chars"), hv.alias("hv")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("hv").alias("first_hash"),
            F.max("hv").alias("last_hash"),
        )
    )


# single source of truth for the 98/1/1 split rule — the Spark column and
# the DuckDB CTE are generated from THESE constants, and x_split_leakage
# builds its split join from the same helpers, so a threshold/seed change
# can never leave the leakage audit checking a stale rule
SPLIT_SEED = "spl"
SPLIT_TRAIN_BELOW = 98  # residues 0..97 -> train, 98 -> val, 99 -> test


def split_col(doc_id_col: str = "doc_id"):
    """The split-label Column for any frame with a doc id column."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from data_pipeline_cursor_spark.text.dedup import phash

    r = phash(F.col(doc_id_col).cast("string"), SPLIT_SEED) % 100
    return (
        F.when(r < SPLIT_TRAIN_BELOW, "train")
        .when(r == SPLIT_TRAIN_BELOW, "val")
        .otherwise("test")
        .alias("split")
    )


def duck_splits_cte(src: str = "documents") -> str:
    """(doc_id, split) SELECT over any relation with doc_id — the DuckDB
    twin of split_col()."""
    return f"""
      SELECT doc_id,
             CASE WHEN r < {SPLIT_TRAIN_BELOW} THEN 'train'
                  WHEN r = {SPLIT_TRAIN_BELOW} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               ('0x' || substr(md5('{SPLIT_SEED}:' || doc_id), 1, 15))::BIGINT
                 % 100 AS r
        FROM {src}
      )
"""


@register("x_split_assign", oracle=duck_splits_cte())
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (98/1/1): each doc's
    split is a pure function of its id via the portable md5 hash — stable
    across engines, runs, partitionings, AND corpus growth (a new doc
    never flips an old doc's split, unlike fraction-based sample()).  The
    standard holdout-carving step before packing/sharding.

    100 TB: a zero-shuffle projection that pushes down as a predicate when
    a consumer filters one split (same plan shape as q_sample_hash);
    stratify by crossing the residue with a grouping column if per-source
    balance matters (x_stratified_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", split_col())


CHUNK_TOKENS = 64  # max tokens per training chunk
CHUNK_STRIDE = 48  # chunk start spacing → 16-token overlap between chunks


@register(
    "x_doc_chunk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tok
      FROM documents
    ),
    s AS (
      SELECT doc_id, tok,
             unnest(range(1, greatest(len(tok), 1) + 1, {CHUNK_STRIDE}))
               AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(tok[start:start + {CHUNK_TOKENS} - 1]) AS INTEGER)
             AS n_tokens,
           md5(array_to_string(tok[start:start + {CHUNK_TOKENS} - 1], ' '))
             AS chunk_md5
    FROM s
    """,
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (context-length prep): split each
    doc's token stream into CHUNK_TOKENS-token windows every CHUNK_STRIDE
    tokens (16-token overlap keeps boundary context in two chunks — the
    standard pre-tokenization chunking for long documents that exceed a
    model's context).  Emits (doc_id, chunk_idx, n_tokens, chunk_md5);
    the md5 pins the exact chunk text cross-engine without shipping it.

    100 TB: zero shuffle — tokenize, start-offset generation (sequence +
    explode) and slicing all run inside the scan's projection, so chunking
    is scan-speed and the output is already partitioned like the input.
    Chunk COUNT per doc is ceil(n/STRIDE) — output rows ≈ corpus tokens /
    STRIDE regardless of skew; one pathological mega-doc still explodes to
    its own rows, not into one task's memory."""
    from data_pipeline_cursor_spark.text.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens_col()
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(tok), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    d = docs.select("doc_id", tok.alias("tok"), F.explode(starts).alias("start"))
    chunk = F.slice(F.col("tok"), F.col("start"), CHUNK_TOKENS)
    return d.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "x_curriculum_order",
    oracle="""
    WITH chars AS (
      SELECT doc_id, c.ch AS ch
      FROM documents, unnest(string_split(text, '')) AS c(ch)
    ),
    per_char AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    ),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(CAST(ln(CAST(SUM(c) AS DOUBLE))
                             - SUM(c * ln(CAST(c AS DOUBLE)))
                               / CAST(SUM(c) AS DOUBLE)
                             AS DECIMAL(28,10)), 4) AS DOUBLE) AS score
      FROM per_char GROUP BY doc_id
    ),
    phased AS (
      SELECT d.doc_id, d.n_chars, s.score,
             ntile(4) OVER (ORDER BY s.score, d.doc_id) AS phase
      FROM documents d JOIN scored s USING (doc_id)
    )
    SELECT phase,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
           ROUND(MIN(score), 4)          AS min_score,
           ROUND(MAX(score), 4)          AS max_score
    FROM phased
    GROUP BY phase
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM phase assignment — training-order prep: documents rank
    by a difficulty proxy (character entropy, reusing x_char_entropy's
    helper: low-entropy repetitive text first, information-dense text
    last) and split into 4 equal phases over the TOTAL order
    (rounded score, doc_id).  The emitted manifest (per-phase doc/char
    totals and score range) is what a staged training run consumes;
    compose with x_shard_shuffle to shard WITHIN each phase.

    SCALE PLAN (round-7 fix of the global single-partition ntile): the
    phase of a row is a pure function of its GLOBAL 0-based rank in
    (score, doc_id) order, and that rank decomposes as
    ``rank = (#rows with smaller score) + (rank among score-ties)``:
    - rank among ties: row_number() over a window PARTITIONED BY score —
      hash-parallel, no global sort (skew note: a single degenerate
      score shared by ~everything would concentrate one partition;
      salt the tie-rank by doc_id ranges if a corpus does that);
    - rows-below count: a per-distinct-score aggregate (vocabulary-
      sized — at most 10^5 rows for round-4 entropy scores) cumulated
      by one window over that TINY summary, then joined back on score;
    - the ntile bucket boundaries come from the corpus row count,
      broadcast as a one-row total (never collect()ed to the driver).
    The phase expression replays ntile(4)'s exact fill rule (first
    n mod 4 buckets get one extra row), so the DuckDB ntile oracle
    still hash-matches.  No stage funnels the corpus through one task;
    the phase aggregate is 4 rows."""
    from data_pipeline_cursor_spark.functions.math_ops import stable_round4
    from data_pipeline_cursor_spark.text.analysis import _char_entropy_df
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = _char_entropy_df(docs).select(
        "doc_id", stable_round4(F.col("ent")).alias("score")
    )
    # cache: the scored corpus feeds the tie-rank window, the per-score
    # summary AND (via per_score) the total — uncached, the char-entropy
    # explode pipeline would run three times
    base = docs.select("doc_id", "n_chars").join(scored, "doc_id").cache()
    wn = Window.partitionBy("score").orderBy("doc_id")
    ranked = base.withColumn("rn", F.row_number().over(wn))
    per_score = base.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    # the cumulative sum runs over the vocabulary-sized per-score summary
    # only (deliberate single-task window; a foldable lit() partition key
    # would be optimized away) — test_plans pins that no unpartitioned
    # window ever touches the doc grain.  The SAME window pass also emits
    # the grand total n (unbounded frame), so no separate global
    # aggregate + crossJoin is needed.
    ws = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_score.select(
        "score",
        F.coalesce(F.sum("c").over(ws), F.lit(0)).alias("cum_below"),
        F.sum("c").over(w_all).alias("n"),
    )
    phased = (
        ranked.join(F.broadcast(cum), "score")
        .withColumn("r0", F.col("cum_below") + F.col("rn") - 1)
        .withColumn("q", F.expr("n div 4"))
        .withColumn("m", F.col("n") % 4)
        .withColumn(
            "phase",
            F.when(
                F.col("r0") < F.col("m") * (F.col("q") + 1),
                F.expr("r0 div (q + 1)") + 1,
            )
            .otherwise(
                F.col("m") + F.expr("(r0 - m * (q + 1)) div greatest(q, 1)") + 1
            )
            .cast("int"),
        )
    )
    return phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.min("score"), 4).alias("min_score"),
        F.round(F.max("score"), 4).alias("max_score"),
    )


WSAMPLE_K = 50  # fixed sample size
WSAMPLE_SEED = "wsamp"
_TWO_60 = float(1 << 60)


@register(
    "x_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5('{WSAMPLE_SEED}:' || doc_id), 1, 15))::BIGINT + 1)
                / {_TWO_60!r}) / n_chars AS k
      FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           ROUND(k, 8) AS es_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {WSAMPLE_K}
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic (E-family
    sampling op): the Efraimidis–Spirakis A-ES scheme — each doc draws
    uniform u and ranks by u^(1/w); the top-k ARE a weighted sample
    without replacement.  Ranking by ln(u)/w is the same order
    (monotone transform) without the overflow-prone power.  u comes from
    the portable md5 hash (the x_shard_shuffle convention), so the sample
    is a pure function of doc_id — reproducible across engines, runs, and
    partitionings, which is what makes a TRAINING subsample auditable.
    Weight = n_chars: longer docs proportionally likelier, the standard
    size-weighted corpus subsample.

    100 TB: zero shuffles — Spark executes orderBy+limit as
    TakeOrderedAndProject (per-partition top-k, tree-merged on the
    driver), so the full corpus is scanned once and only k rows ever
    move.  Contrast q_sample_hash (Bernoulli by hash threshold:
    unweighted, unbounded count) — A-ES gives an EXACT-k weighted draw.
    Determinism caveat (docstring contract): the top-k CUT compares raw
    doubles, so two docs whose keys differ below double precision could
    in principle order differently across engines; with 60-bit hash
    entropy the minimum observed key gap is ~1e-7 at fixture SFs and the
    emitted key is rounded to 8 decimals."""
    docs = load_table(spark, sf_dir, "documents")
    from data_pipeline_cursor_spark.text.dedup import phash

    u = (phash(F.col("doc_id").cast("string"), WSAMPLE_SEED) + 1) / F.lit(
        _TWO_60
    )
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            k.alias("k"),
        )
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WSAMPLE_K)
        .select("doc_id", "weight", F.round("k", 8).alias("es_key"))
    )


QUOTA_CAP = 10  # max docs kept per source
QUOTA_SEED = "quota"
QUOTA_CUT_MARGIN = 4  # pre-cut keeps ~MARGIN*CAP survivors per source
# MARGIN * CAP * 2^60 = 40 * 2^60 = 5 * 2^63 — exactly representable
_QUOTA_CUT_NUM = float(QUOTA_CUT_MARGIN * QUOTA_CAP * (1 << 60))


@register(
    "x_source_quota",
    oracle=f"""
    WITH cnt AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    pre AS (
      SELECT d.source, d.doc_id, d.n_chars, c.n_docs,
             ('0x' || substr(md5('{QUOTA_SEED}:' || d.doc_id), 1, 15))::BIGINT
               AS h
      FROM documents d JOIN cnt c ON d.source = c.source
      WHERE CAST(('0x' || substr(md5('{QUOTA_SEED}:' || d.doc_id), 1, 15))
                   ::BIGINT AS DOUBLE)
              < {_QUOTA_CUT_NUM!r} / c.n_docs
         OR c.n_docs <= {QUOTA_CAP}
    ),
    ranked AS (
      SELECT source, doc_id, n_chars, n_docs,
             row_number() OVER (
               PARTITION BY source ORDER BY h, doc_id
             ) AS rn
      FROM pre
    )
    SELECT source, MIN(n_docs) AS n_docs,
           CAST(COUNT(*) AS BIGINT)    AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM ranked
    WHERE rn <= {QUOTA_CAP}
    GROUP BY source
    """,
)
def source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE QUOTA capping — the cap-based complement of
    x_domain_mix's rate-based sampling: every source keeps AT MOST
    {QUOTA_CAP} documents, chosen by portable md5-hash order (a
    deterministic uniform draw, reproducible across engines, runs and
    partitionings) — the "no single crawl domain may dominate the
    corpus" rule every large-scale curation recipe applies before
    mixing.  Output is the per-source audit: raw count, kept count,
    kept characters.

    Scale shape: the per-source rank never sees the full corpus — the
    same hash-space PRE-CUT as x_kmv_distinct (h < {QUOTA_CUT_MARGIN}
    ·cap·2^60 / n_docs, using the per-source counts the audit computes
    anyway, broadcast) keeps ~{QUOTA_CUT_MARGIN}·cap uniform survivors
    per source before the window, so a 10^9-doc source contributes
    ~{QUOTA_CUT_MARGIN * QUOTA_CAP} rows to the sort, not 10^9; sources
    at-or-under quota skip the cut entirely (OR n_docs <= cap).  The
    cut keeps ≥ cap rows with probability 1 - exp(-Ω(cap)), and both
    engines apply the identical cut, so parity holds by construction
    even in the astronomically-unlikely short case."""
    from data_pipeline_cursor_spark.text.dedup import phash
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    h = phash(F.col("doc_id").cast("string"), QUOTA_SEED)
    pre = (
        docs.select("source", "doc_id", "n_chars")
        .join(F.broadcast(cnt), "source")
        .withColumn("h", h)
        .filter(
            (
                F.col("h").cast("double")
                < F.lit(_QUOTA_CUT_NUM) / F.col("n_docs")
            )
            | (F.col("n_docs") <= QUOTA_CAP)
        )
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        pre.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QUOTA_CAP)
        .groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )
