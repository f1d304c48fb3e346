"""Byte-pair-encoding merge training + application (SURVEY.md §2.E family
— the tokenizer-training step of an LLM data pipeline, distributed).

Not in the reference.  Classic BPE (Sennrich et al. 2016): start from
characters, repeatedly merge the most frequent adjacent symbol pair.  The
distributed formulation here is the standard one — the weighted word-type
table is the state, never the corpus:

- one corpus pass builds (word, count) — vocabulary-sized;
- each merge round is a pair-count aggregate over the word table (explode
  adjacent symbol pairs weighted by word count, one shuffle on the pair)
  plus a broadcast of the single winning pair applied via string replace;
- rounds are lazily chained with per-round caches (LRU-managed,
  text/dedup.py docstring convention) so the plan stays flat.

Determinism (the reason this can carry a full DuckDB oracle, unlike any
float-scored trainer): pair counts are exact integer sums; the argmax
tie-break is the total order (count DESC, left, right); and the merge
application is plain left-to-right non-overlapping string replace on the
space-separated symbol string — verified to behave identically in Spark
and DuckDB including the overlapping-occurrence case (' a a a ' →
' aa a ' in both).  The oracles unroll the same fixed ROUNDS as CTEs.

100 TB: the corpus pass is one token aggregate; everything after runs on
the word-TYPE table (vocabulary-sized — millions of rows at web scale,
not billions), which is why single-machine BPE trainers survive at all;
here even that table is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table
from data_pipeline_cursor_spark.text.dedup import tokens_col

# Width of the REGISTERED queries (fixture-sized so the oracle CTE chain
# stays readable).  Every builder below takes ``rounds`` as a parameter —
# the Spark merge chain AND the generated DuckDB oracle derive from the
# same value, so any width is hash-verifiable (the LSH n_planes pattern);
# tests/test_invariants.py proves width-6 training end to end plus the
# monotonicity law (per-round winning pair counts never increase).
ROUNDS = 3


def _pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of the ' a b c '-form symbol string, weighted
    by word count: one explode + one hash agg (shuffle key = the pair)."""
    arr = F.split(F.trim(F.col("s")), " ")
    n = F.greatest(F.size(arr) - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice(arr, 1, n), F.slice(arr, 2, n))
    return (
        words.select("cnt", F.explode(zipped).alias("p"))
        .select("cnt", F.col("p")["0"].alias("pa"), F.col("p")["1"].alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.sum("cnt").alias("n"))
    )


def _best(pairs: DataFrame) -> DataFrame:
    """The winning pair under the TOTAL order (n DESC, pa, pb)."""
    return pairs.orderBy(F.desc("n"), F.asc("pa"), F.asc("pb")).limit(1)


def _train(docs: DataFrame, rounds: int = ROUNDS):
    """``rounds`` merge rounds over the word-type table.  Returns
    ([best_1..best_rounds], words_after_all_merges); everything lazy —
    winning pairs are broadcast-crossJoined, never collected."""
    wc = (
        docs.select(F.explode(tokens_col()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    words = wc.select(
        "w",
        "cnt",
        F.concat(
            F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" ")
        ).alias("s"),
    ).cache()
    bests = []
    for _ in range(rounds):
        best = _best(_pairs(words)).cache()
        bests.append(best)
        merged = F.replace(
            F.col("s"),
            F.concat(F.lit(" "), F.col("pa"), F.lit(" "), F.col("pb"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("pa"), F.col("pb"), F.lit(" ")),
        )
        words = (
            words.crossJoin(F.broadcast(best.select("pa", "pb")))
            .select("w", "cnt", merged.alias("s"))
            .cache()
        )
    return bests, words


def _duck_round(prev: str, k: int) -> str:
    return f"""
    p{k} AS (
      SELECT arr[g.i] AS pa, arr[g.i + 1] AS pb, CAST(SUM(cnt) AS BIGINT) AS n
      FROM (SELECT cnt, string_split(trim(s), ' ') AS arr FROM {prev}),
           unnest(generate_series(1, len(arr) - 1)) AS g(i)
      GROUP BY 1, 2
    ),
    b{k} AS (SELECT pa, pb, n FROM p{k} ORDER BY n DESC, pa, pb LIMIT 1),
    s{k} AS (
      SELECT w, cnt,
             replace(s, ' ' || b.pa || ' ' || b.pb || ' ',
                        ' ' || b.pa || b.pb || ' ') AS s
      FROM {prev} CROSS JOIN b{k} b
    )"""


def duck_chain(rounds: int = ROUNDS) -> str:
    """The WITH-chain prefix (wc → s0 → p1/b1/s1 → … → s{rounds}) at any
    merge width — the oracle twin of ``_train(docs, rounds)``."""
    return f"""
    WITH wc AS (
      SELECT t.tk AS w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents, unnest(string_split(lower(text), ' ')) AS t(tk)
      GROUP BY t.tk
    ),
    s0 AS (
      SELECT w, cnt,
             ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
      FROM wc
    ),
    {','.join(_duck_round(f's{k - 1}', k) for k in range(1, rounds + 1))}
"""


def bpe_train_oracle(rounds: int = ROUNDS) -> str:
    """Full merge-table oracle at any width (same total tie order)."""
    return f"""
    {duck_chain(rounds)}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {k} AS merge_round, pa AS left_sym, pb AS right_sym, "
          f"n AS pair_count FROM b{k}"
          for k in range(1, rounds + 1))}
    ) ORDER BY merge_round
"""


def bpe_train_df(
    spark: SparkSession, sf_dir: str, rounds: int = ROUNDS
) -> DataFrame:
    """Merge table (merge_round, left_sym, right_sym, pair_count) at any
    width — shared by the registered query and the width-sweep test."""
    docs = load_table(spark, sf_dir, "documents")
    bests, _words = _train(docs, rounds)
    out = None
    for k, best in enumerate(bests, start=1):
        row = best.select(
            F.lit(k).alias("merge_round"),
            F.col("pa").alias("left_sym"),
            F.col("pb").alias("right_sym"),
            F.col("n").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("merge_round")


@register("x_bpe_train", oracle=bpe_train_oracle(ROUNDS))
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train {ROUNDS} BPE merges on the document corpus (module docstring)
    and emit the merge table — (merge_round, left_sym, right_sym,
    pair_count), the artifact a tokenizer ships."""
    return bpe_train_df(spark, sf_dir, ROUNDS)


_BPE_APPLY_ORACLE = f"""
    {duck_chain(ROUNDS)}
    SELECT sym, n_words, n_total FROM (
      SELECT arr[g.i] AS sym,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
             CAST(SUM(cnt) AS BIGINT)          AS n_total
      FROM (SELECT w, cnt, string_split(trim(s), ' ') AS arr FROM s{ROUNDS}),
           unnest(generate_series(1, len(arr))) AS g(i)
      GROUP BY 1
    ) ORDER BY n_total DESC, sym
    LIMIT 20
"""


@register("x_bpe_apply", oracle=_BPE_APPLY_ORACLE)
def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained merges and emit the resulting symbol vocabulary —
    top-20 symbols by corpus frequency with word-type support.  Together
    with x_bpe_train this is the tokenizer round trip: train merges →
    segment the corpus with them → the symbol table a vocab file ships.
    Segmentation is the same broadcast-replace chain (never collected);
    the symbol count explodes the segmented word-type table, weighted by
    word counts — corpus-frequency totals without touching the corpus a
    second time."""
    docs = load_table(spark, sf_dir, "documents")
    _bests, words = _train(docs)
    arr = F.split(F.trim(F.col("s")), " ")
    return (
        words.select("w", "cnt", F.explode(arr).alias("sym"))
        .groupBy("sym")
        .agg(
            F.countDistinct("w").alias("n_words"),
            F.sum("cnt").alias("n_total"),
        )
        .orderBy(F.desc("n_total"), F.asc("sym"))
        .limit(20)
        .select("sym", "n_words", "n_total")
    )


_BPE_ENCODE_ORACLE = f"""
    {duck_chain(ROUNDS)},
    vocab AS (
      SELECT sym, row_number() OVER (ORDER BY n_total DESC, sym) AS id
      FROM (
        SELECT arr[g.i] AS sym, CAST(SUM(cnt) AS BIGINT) AS n_total
        FROM (SELECT w, cnt, string_split(trim(s), ' ') AS arr FROM s{ROUNDS}),
             unnest(generate_series(1, len(arr))) AS g(i)
        GROUP BY 1
      )
    ),
    dt AS (
      SELECT doc_id, t.i AS pos, l[t.i] AS w
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM documents),
           unnest(generate_series(1, len(l))) AS t(i)
    ),
    seg AS (
      SELECT dt.doc_id, dt.pos, string_split(trim(sw.s), ' ') AS syms
      FROM dt JOIN s{ROUNDS} sw ON sw.w = dt.w
    ),
    ids AS (
      SELECT seg.doc_id, seg.pos, g.j AS sidx, v.id
      FROM seg, unnest(generate_series(1, len(syms))) AS g(j)
      JOIN vocab v ON v.sym = syms[g.j]
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ids,
           md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos, sidx))
             AS ids_md5
    FROM ids
    GROUP BY doc_id
"""


@register("x_bpe_encode", oracle=_BPE_ENCODE_ORACLE)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the trained tokenizer — the round trip's
    last leg (train merges → segment word types → map every document to
    its TOKEN-ID SEQUENCE): vocabulary ids are the symbol table ranked
    by (corpus frequency DESC, symbol), each document's tokens look up
    their word type's segmentation, and the per-doc id sequence renders
    md5-canonically (the q_collect_struct convention) so the exact
    ordered ids hash-check without shipping giant arrays.

    Plan shape is the production one: the corpus joins the WORD-TYPE
    segmentation table (vocabulary-sized — broadcast in practice) and
    the symbol→id vocab; positions ride (token pos, symbol idx) so the
    order is total.  Nothing corpus-sized is collected; the id render is
    one hash agg per doc."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    _bests, words = _train(docs)
    arr = F.split(F.trim(F.col("s")), " ")
    vocab = (
        words.select("cnt", F.explode(arr).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("cnt").alias("n_total"))
        .withColumn(
            "id",
            F.row_number().over(
                Window.orderBy(F.desc("n_total"), F.asc("sym"))
            ),
        )
        .select("sym", "id")
    )
    dt = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    seg = dt.join(
        words.select("w", arr.alias("syms")), "w"
    ).select(
        "doc_id", "pos", F.posexplode("syms").alias("sidx0", "sym")
    ).select("doc_id", "pos", (F.col("sidx0") + 1).alias("sidx"), "sym")
    ids = seg.join(vocab, "sym")
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("pos", "sidx", "id"))
        ),
        lambda r: r["id"].cast("string"),
    )
    return ids.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ids"),
        F.md5(F.array_join(ordered, ",")).alias("ids_md5"),
    )


_FERTILITY_ORACLE = f"""
    {duck_chain(ROUNDS)},
    wsyms AS (
      SELECT w, len(string_split(trim(s), ' ')) AS n_syms
      FROM s{ROUNDS}
    ),
    dt AS (
      SELECT lang, t.tk AS w
      FROM documents, unnest(string_split(lower(text), ' ')) AS t(tk)
    )
    SELECT dt.lang,
           CAST(COUNT(*) AS BIGINT)          AS n_tokens,
           CAST(SUM(ws.n_syms) AS BIGINT)    AS n_symbols,
           CAST(SUM(len(dt.w)) AS BIGINT)    AS n_chars,
           ROUND(CAST(SUM(ws.n_syms) AS DOUBLE) / COUNT(*), 4)
             AS fertility,
           ROUND(CAST(SUM(len(dt.w)) AS DOUBLE) / SUM(ws.n_syms), 4)
             AS chars_per_symbol
    FROM dt JOIN wsyms ws ON ws.w = dt.w
    GROUP BY dt.lang
"""


@register("x_tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language — the multilingual-equity table
    (mT5/XLM-R methodology): symbols emitted per word and characters
    compressed per symbol, per language, under the trained BPE merges.
    A language whose fertility is 2x another's pays 2x the context
    budget for the same text — THE number that decides whether a vocab
    is fair across languages, read before x_temperature_mix sets
    sampling rates.

    Plan: the word-type segmentation table (vocabulary-sized) maps each
    type to its symbol count ONCE; the corpus token stream joins that
    table (broadcast in practice) and one hash aggregate per language
    finishes — the corpus is scanned once for the stream and once
    inside the shared training pass, nothing corpus-sized shuffles at
    word grain twice.  100 TB: fertility is exactly the x_bpe_apply
    amortization argument — per-type work at vocab grain, per-token
    work a single broadcast-join scan."""
    docs = load_table(spark, sf_dir, "documents")
    _bests, words = _train(docs)
    wsyms = words.select(
        "w", F.size(F.split(F.trim(F.col("s")), " ")).alias("n_syms")
    )
    dt = docs.select("lang", F.explode(tokens_col()).alias("w"))
    return (
        dt.join(wsyms, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_symbols"),
            F.sum(F.length("w")).alias("n_chars"),
            F.round(
                F.sum("n_syms").cast("double") / F.count(F.lit(1)), 4
            ).alias("fertility"),
            F.round(
                F.sum(F.length("w")).cast("double") / F.sum("n_syms"), 4
            ).alias("chars_per_symbol"),
        )
    )
