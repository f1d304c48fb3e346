"""Deterministic distributed k-means over int8 codes (SURVEY.md §2.E
family — the iterative-algorithm capability an LLM-data pipeline needs for
IVF codebook training / corpus bucketing, x_sim_ivf's missing "train the
cells" step).

Not in the reference (no vector data there).  Designed Spark-first AND
oracle-checkable, which ordinary float k-means is not (float centroid sums
are fold-order-dependent, and a one-ulp centroid wobble flips assignments):

- operates on the int8 codes of x_embed_quantize (similarity.quantized_codes)
  — distances are exact integer sums;
- centroid update is floor(Σq / n): the division is exact in float64 for
  any realistic corpus (|Σq| ≤ 127·n < 2⁵³), so both engines floor the
  same value;
- seeds and tie-breaks are total orders (md5 hash, centroid id) — no RNG,
  no first-seen nondeterminism.

Every step is therefore bit-identical between the Spark plan and the
DuckDB oracle's unrolled-CTE replay: a genuinely ITERATIVE distributed
algorithm with a full hash oracle.

100 TB shape (the standard scalable Lloyd iteration):
- the codebook (K×DIM ints) is the ONLY driver-materialized state per
  round — same bounded-collect contract as x_sim_ivf's codebook;
- assignment broadcasts the codebook in the task closure and scores each
  Arrow batch as vectorized numpy (one (batch × K) distance matrix);
- the update is explode → partial-aggregated groupBy((cid, dim)): each
  task pre-folds to ≤ K·DIM partial cells before the shuffle, so shuffled
  bytes are O(tasks · K · DIM), independent of corpus size;
- each round re-reads the (scan-speed) quantize projection instead of
  deepening one lazy lineage — the iterative-plan blowup localCheckpoint
  would otherwise be needed for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.vectors.similarity import (
    ANN_QUERY_K,
    DIM,
    DUCK_QV_CTE,
    ann_query_draw,
    duck_query_draw,
    quantized_codes,
    round4,
)

K = 8  # codebook size; fixture-sized (≈ sqrt-ish of 6k vectors / cell ~800)
ITERS = 2  # Lloyd rounds; the oracle unrolls the same fixed count


def _duck_assign(src: str, cents: str, rn: str = "= 1", where: str = "") -> str:
    """Assignment CTE body: nearest centroid(s) by exact integer L2², ties
    to the smallest cid — the same (dist, cid) total order as the Spark
    side.  ``rn`` widens to "<= nprobe" for IVF probing; ``where``
    restricts the source (e.g. to the query subset)."""
    return f"""
      SELECT vec_id, qv, cid FROM (
        SELECT h.vec_id, h.qv, s.cid,
               row_number() OVER (
                 PARTITION BY h.vec_id
                 ORDER BY list_sum(list_transform(range(1, {DIM + 1}),
                            i -> CAST((h.qv[i] - s.cv[i])
                                      * (h.qv[i] - s.cv[i]) AS BIGINT))),
                          s.cid
               ) AS rn
        FROM {src} h CROSS JOIN {cents} s {where}
      ) WHERE rn {rn}
    """


def _duck_update(assigned: str) -> str:
    """Per-(cid, dim) integer mean: SUM/COUNT then an exact float64 floor."""
    return f"""
      SELECT cid, d.i AS dim,
             CAST(floor(CAST(SUM(qv[d.i]) AS DOUBLE) / COUNT(*)) AS INT) AS c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {assigned}, range(1, {DIM + 1}) AS d(i)
      GROUP BY 1, 2
    """


_KMEANS_ORACLE = f"""
    WITH {DUCK_QV_CTE},
    h AS (
      SELECT vec_id, qv,
             ('0x' || substr(md5('km:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, qv AS cv
      FROM h ORDER BY hv, vec_id LIMIT {K}
    ),
    a1 AS ({_duck_assign('h', 'seeds')}),
    u1 AS ({_duck_update('a1')}),
    c1 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u1 GROUP BY cid),
    a2 AS ({_duck_assign('h', 'c1')}),
    u2 AS ({_duck_update('a2')})
    SELECT cid, dim, c AS c_val, n AS n_members FROM u2
"""


def _train_codebook(codes: DataFrame, iters: int):
    """md5-seeded seeds + ``iters`` Lloyd rounds; returns the resulting
    codebook as collected rows [(cid, cv)] sorted by cid — K×DIM ints,
    the only driver-materialized state (bounded by contract)."""
    from data_pipeline_cursor_spark.text.dedup import phash

    h = codes.withColumn("hv", phash(F.col("vec_id").cast("string"), "km"))
    w = Window.orderBy("hv", "vec_id")
    seeds = (
        h.orderBy("hv", "vec_id")
        .limit(K)
        .select(
            F.row_number().over(w).cast("int").alias("cid"),
            F.col("qv").alias("cv"),
        )
    )
    cent_rows = sorted(seeds.collect(), key=lambda r: r["cid"])
    for _ in range(iters):
        update = _update(_assign(codes, cent_rows))
        cent_rows = sorted(
            update.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
            .collect(),
            key=lambda r: r["cid"],
        )
    return cent_rows


def _assign(codes: DataFrame, cent_rows) -> DataFrame:
    """Nearest-centroid assignment with the codebook in the task closure:
    one vectorized (batch × K) integer distance matrix per Arrow batch;
    np.argmin's first-minimum rule IS the smallest-cid tie-break because
    the codebook matrix is ordered by cid."""
    import numpy as np
    import pandas as pd

    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.stack(
        [np.asarray(r["cv"], dtype=np.int64) for r in cent_rows]
    )  # (K, DIM), ordered by cid

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            # ‖q−c‖² expanded: exact in int64 (all terms < 2^32)
            d = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            pick = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cids[pick],
                    "qv": pdf["qv"],
                }
            )

    return codes.mapInPandas(gen, "vec_id bigint, cid int, qv array<int>")


def _update(assigned: DataFrame) -> DataFrame:
    """New integer centroids: posexplode → partial-aggregated groupBy on
    (cid, dim) — tasks pre-fold to ≤ K·DIM cells before the shuffle."""
    e = assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
    return e.groupBy("cid", (F.col("pos") + 1).alias("dim")).agg(
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("int")
        .alias("c"),
        F.count(F.lit(1)).alias("n"),
    )


@register("x_kmeans_int8", oracle=_KMEANS_ORACLE)
def kmeans_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means codebook training on the quantized corpus (module
    docstring): md5-seeded, {ITERS} exact-integer Lloyd rounds, emitting
    the final codebook as (cid, dim, c_val) cells with each centroid's
    member count — the artifact an IVF index (x_sim_ivf) or corpus
    bucketing step consumes."""
    codes = quantized_codes(spark, sf_dir)
    # train ITERS-1 rounds eagerly; the LAST round's update is returned
    # lazily — only the K×DIM codebook was ever collected (bounded by
    # contract, like x_sim_ivf's codebook)
    cent_rows = _train_codebook(codes, ITERS - 1)
    update = _update(_assign(codes, cent_rows))
    return update.select(
        "cid",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("c").alias("c_val"),
        F.col("n").alias("n_members"),
    )


_IVF_TRAINED_ORACLE = f"""
    WITH {DUCK_QV_CTE},
    h AS (
      SELECT vec_id, qv,
             ('0x' || substr(md5('km:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, qv AS cv
      FROM h ORDER BY hv, vec_id LIMIT {K}
    ),
    a1 AS ({_duck_assign('h', 'seeds')}),
    u1 AS ({_duck_update('a1')}),
    c1 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u1 GROUP BY cid),
    a2 AS ({_duck_assign('h', 'c1')}),
    u2 AS ({_duck_update('a2')}),
    c2 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u2 GROUP BY cid),
    av AS (SELECT vec_id, cid AS cell FROM ({_duck_assign('h', 'c2')})),
    qp AS (
      SELECT vec_id AS query_id, cid AS cell
      FROM ({_duck_assign('h', 'c2', rn='<= 2',
                          where="WHERE h.vec_id IN (SELECT vec_id FROM ("
                          + duck_query_draw(cols='vec_id') + '))')})
    )
    SELECT query_id, vec_id, cell, score FROM (
      SELECT qp.query_id, av.vec_id, av.cell,
             ROUND(list_cosine_similarity(qe.embedding::DOUBLE[],
                                          ve.embedding::DOUBLE[]), 4) AS score,
             row_number() OVER (PARTITION BY qp.query_id
               ORDER BY ROUND(list_cosine_similarity(qe.embedding::DOUBLE[],
                                                     ve.embedding::DOUBLE[]),
                              4) DESC,
                        av.vec_id) AS rn
      FROM qp
      JOIN av ON av.cell = qp.cell AND av.vec_id <> qp.query_id
      JOIN embeddings qe ON qe.vec_id = qp.query_id
      JOIN embeddings ve ON ve.vec_id = av.vec_id
    ) WHERE rn <= 5
"""


@register("x_sim_ivf_trained", oracle=_IVF_TRAINED_ORACLE)
def sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the TRAINED codebook — the composition x_sim_ivf's
    docstring promises ("a production codebook comes from an offline
    k-means and is swapped in the same way"): train x_kmeans_int8's
    codebook, invert the corpus into its cells, probe each query's
    nprobe=2 nearest cells, exact-cosine re-rank the candidates.

    Cell assignment and probing run in exact INTEGER code space (the same
    (dist, cid) total order as training), so the candidate set is
    bit-reproducible cross-engine; only the final re-rank scores are
    float, rounded like every other score.  100 TB: identical cost shape
    to x_sim_ivf — K×DIM codebook in the closure, one vectorized
    assignment pass, broadcast probes joined to cell-partitioned
    candidates, per-query top-k in one applyInPandas."""
    import numpy as np
    import pandas as pd

    from data_pipeline_cursor_spark.vectors.similarity import quantized_codes

    d = quantized_codes(spark, sf_dir, keep_embedding=True)
    cb = _train_codebook(d.select("vec_id", "qv"), ITERS)
    cids = np.array([r["cid"] for r in cb], dtype=np.int64)
    C = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in cb])
    nprobe = min(2, len(cids))

    def cells(pdf):
        Q = np.stack([np.asarray(v, np.int64) for v in pdf["qv"]])
        return (
            (Q * Q).sum(axis=1)[:, None]
            - 2 * (Q @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )

    def unit(pdf):
        E = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
        return E / np.linalg.norm(E, axis=1)[:, None]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            dist = cells(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "u": list(unit(pdf)),
                    # argmin takes the FIRST min; C ordered by cid →
                    # smallest cid wins ties, as in training
                    "cell": cids[dist.argmin(axis=1)],
                }
            )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            dist = cells(pdf)
            top = np.argsort(dist, axis=1, kind="stable")[:, :nprobe]
            ids = pdf["vec_id"].to_numpy()
            U = unit(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, nprobe),
                    "u_q": [u for u in U for _ in range(nprobe)],
                    "cell": cids[top].ravel(),
                }
            )

    assigned = d.mapInPandas(assign, "vec_id bigint, u array<double>, cell bigint")
    probes = ann_query_draw(d, cols=tuple(d.columns)).mapInPandas(
        probe, "query_id bigint, u_q array<double>, cell bigint"
    )
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack([np.asarray(v, np.float64) for v in pdf["u"]])
        uq = np.asarray(pdf["u_q"].iloc[0], np.float64)
        sc = round4(V @ uq)
        ids = pdf["vec_id"].to_numpy()
        pick = np.lexsort((ids, -sc))[:5]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy()[pick],
                "vec_id": ids[pick],
                "cell": pdf["cell"].to_numpy()[pick],
                "score": sc[pick],
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        topk, "query_id bigint, vec_id bigint, cell bigint, score double"
    )


# SemDeDup threshold: within-cell pairs with ROUND(cosine, 4) >= TAU mark
# the larger vec_id a duplicate.  Fixture-tuned like x_dedup_embed's 0.4
# (within-label cosines top out at ~0.47); production corpora with true
# near-dups run this at ~0.95+.
SEMDEDUP_TAU = 0.35

# Shared k-means replay through the final cell assignment — the CTE chain
# of _IVF_TRAINED_ORACLE up to `av`, reused by composition consumers.
def _duck_km_av_chain() -> str:
    from data_pipeline_cursor_spark.vectors.similarity import DUCK_QV_CTE

    return f"""{DUCK_QV_CTE},
    h AS (
      SELECT vec_id, qv,
             ('0x' || substr(md5('km:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, qv AS cv
      FROM h ORDER BY hv, vec_id LIMIT {K}
    ),
    a1 AS ({_duck_assign('h', 'seeds')}),
    u1 AS ({_duck_update('a1')}),
    c1 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u1 GROUP BY cid),
    a2 AS ({_duck_assign('h', 'c1')}),
    u2 AS ({_duck_update('a2')}),
    c2 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u2 GROUP BY cid),
    av AS (SELECT vec_id, cid AS cell FROM ({_duck_assign('h', 'c2')}))"""


_SEMDEDUP_ORACLE = f"""
    WITH {{chain}},
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]), 4)
            >= {SEMDEDUP_TAU}
    )
    SELECT av.vec_id, av.cell, (d.vec_id IS NULL) AS keep
    FROM av LEFT JOIN drops d ON av.vec_id = d.vec_id
"""


@register("x_semdedup", oracle=_SEMDEDUP_ORACLE.format(chain=_duck_km_av_chain()))
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023's cluster-then-
    dedupe, composed from this module's pieces): train the k-means
    codebook, assign every vector to its cell, and within each cell drop
    any vector that has a SMALLER-id neighbour with cosine ≥ SEMDEDUP_TAU.

    The "exists a smaller similar peer" rule (the witness need not itself
    survive) is a total, order-free criterion — unlike greedy first-seen
    dedup it needs no sequential pass, so it distributes as: one
    `_all_pairs_by_block` matmul per cell (banded above BLOCK_CHUNK_ROWS),
    project the dropped ids, one left join back.

    100 TB: pairwise work is confined to cells (corpus/K per cell in
    expectation; raise K with corpus size exactly like a production
    SemDeDup raises its cluster count).  The oracle replays training,
    assignment, and the EXISTS rule as CTEs — a full hash check over a
    clustered dedup pipeline."""
    import numpy as np
    import pandas as pd

    from data_pipeline_cursor_spark.vectors.similarity import (
        _all_pairs_by_block,
        quantized_codes,
    )

    d = quantized_codes(spark, sf_dir, keep_embedding=True)
    cb = _train_codebook(d.select("vec_id", "qv"), ITERS)
    cids = np.array([r["cid"] for r in cb], dtype=np.int64)
    C = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in cb])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, np.int64) for v in pdf["qv"]])
            dist = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            E = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
            U = E / np.linalg.norm(E, axis=1)[:, None]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "u": list(U),
                    # argmin takes the FIRST min; C ordered by cid →
                    # smallest cid wins ties, as in training
                    "cell": cids[dist.argmin(axis=1)],
                }
            )

    assigned = d.mapInPandas(assign, "vec_id bigint, u array<double>, cell bigint")
    pairs = _all_pairs_by_block(
        assigned,
        "cell",
        SEMDEDUP_TAU,
        "vec_a bigint, vec_b bigint, cell bigint, score double",
    )
    drops = pairs.select(F.col("vec_b").alias("vec_id")).distinct().withColumn(
        "dropped", F.lit(True)
    )
    return assigned.join(drops, "vec_id", "left").select(
        "vec_id", "cell", F.col("dropped").isNull().alias("keep")
    )


# ---- Product quantization (x_ann_pq) ---------------------------------------

M_SUB = 4               # subspaces
SUB = DIM // M_SUB      # dims per subspace (64 / 4 = 16)
K_PQ = 4                # codewords per subspace → code = M_SUB small ints
PQ_TOPK = 5


def _bounded_query_batch(codes: DataFrame):
    """The fixed-K md5-order query draw (similarity.ann_query_draw —
    constant-size at any corpus, round-8 VERDICT item 2), collected under
    x_sim_topk's bounded-batch contract: refuse past MAX_QUERY_BATCH
    instead of silently OOMing the driver — larger query sets belong on
    the distributed paths."""
    from data_pipeline_cursor_spark.vectors.similarity import MAX_QUERY_BATCH

    q = ann_query_draw(codes, cols=tuple(codes.columns))
    rows = q.limit(MAX_QUERY_BATCH + 1).collect()
    if len(rows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"PQ query batch exceeds MAX_QUERY_BATCH={MAX_QUERY_BATCH}; "
            "keep the probe set distributed (x_sim_ivf_trained) or raise "
            "the cap deliberately"
        )
    return sorted(rows, key=lambda r: r["vec_id"])


def _duck_sub(m: int, sub: int = None, k_pq: int = None) -> str:
    """Per-subspace CTE chain: slice → md5 seeds → one Lloyd round →
    codebook c{m} → encoding e{m}(vec_id, cid).  ``sub``/``k_pq`` default
    to the registered x_ann_pq config; the structured-recall variant
    passes its own sizing."""
    sub = SUB if sub is None else sub
    k_pq = K_PQ if k_pq is None else k_pq
    lo, hi = m * sub + 1, (m + 1) * sub
    dist = (
        f"list_sum(list_transform(range(1, {sub + 1}), "
        f"i -> CAST((h{m}.sv[i] - s.cv[i]) * (h{m}.sv[i] - s.cv[i]) "
        f"AS BIGINT)))"
    )

    def assign(cents: str) -> str:
        return f"""
      SELECT vec_id, sv, cid FROM (
        SELECT h{m}.vec_id, h{m}.sv, s.cid,
               row_number() OVER (PARTITION BY h{m}.vec_id
                                  ORDER BY {dist}, s.cid) AS rn
        FROM h{m} CROSS JOIN {cents} s
      ) WHERE rn = 1"""

    return f"""
    h{m} AS (
      SELECT vec_id, qv[{lo}:{hi}] AS sv,
             ('0x' || substr(md5('pq{m}:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    seeds{m} AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, sv AS cv
      FROM h{m} ORDER BY hv, vec_id LIMIT {k_pq}
    ),
    a{m} AS ({assign(f'seeds{m}')}),
    u{m} AS (
      SELECT cid, d.i AS dim,
             CAST(floor(CAST(SUM(sv[d.i]) AS DOUBLE) / COUNT(*)) AS INT) AS c
      FROM a{m}, range(1, {sub + 1}) AS d(i)
      GROUP BY 1, 2
    ),
    c{m} AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u{m} GROUP BY cid),
    e{m} AS ({assign(f'c{m}')})"""


def _duck_lut(m: int, sub: int = None) -> str:
    sub = SUB if sub is None else sub
    lo = m * sub
    return f"""
    lut{m} AS (
      SELECT qs.query_id, c.cid,
             list_sum(list_transform(range(1, {sub + 1}),
               i -> CAST((qs.qv[{lo} + i] - c.cv[i])
                         * (qs.qv[{lo} + i] - c.cv[i]) AS BIGINT))) AS d
      FROM qs CROSS JOIN c{m} c
    )"""


def _duck_pq_body(m_sub: int) -> str:
    """The ADC ranking subquery over e0..e{M-1} codes and lut0..lut{M-1}
    tables, for any subspace count — the join chain _PQ_BODY hardcoded
    for M=4, generated."""
    adist = " + ".join(f"l{m}.d" for m in range(m_sub))
    e_joins = "\n      ".join(
        f"JOIN e{m} ON e{m}.vec_id = e0.vec_id" for m in range(1, m_sub)
    )
    l_joins = "\n      ".join(
        f"JOIN lut{m} l{m} ON l{m}.query_id = qs.query_id"
        f" AND l{m}.cid = e{m}.cid"
        for m in range(m_sub)
    )
    return f"""
      SELECT qs.query_id, e0.vec_id,
             CAST({adist} AS BIGINT) AS adist,
             row_number() OVER (PARTITION BY qs.query_id
                                ORDER BY ({adist}),
                                         e0.vec_id) AS rnk
      FROM qs
      CROSS JOIN e0
      {e_joins}
      {l_joins}
      WHERE e0.vec_id <> qs.query_id
"""


_PQ_ORACLE = (
    f"WITH {DUCK_QV_CTE},\n"
    + ",".join(_duck_sub(m) for m in range(M_SUB))
    + ",\n    qs AS (SELECT vec_id AS query_id, qv FROM q"
    " ORDER BY md5('q:' || CAST(vec_id AS VARCHAR)), vec_id"
    f" LIMIT {ANN_QUERY_K}),"
    + ",".join(_duck_lut(m) for m in range(M_SUB))
    + f"""
    SELECT query_id, rnk, vec_id, adist FROM (
      SELECT qs.query_id, e0.vec_id,
             CAST(l0.d + l1.d + l2.d + l3.d AS BIGINT) AS adist,
             row_number() OVER (PARTITION BY qs.query_id
                                ORDER BY (l0.d + l1.d + l2.d + l3.d),
                                         e0.vec_id) AS rnk
      FROM qs
      CROSS JOIN e0
      JOIN e1 ON e1.vec_id = e0.vec_id
      JOIN e2 ON e2.vec_id = e0.vec_id
      JOIN e3 ON e3.vec_id = e0.vec_id
      JOIN lut0 l0 ON l0.query_id = qs.query_id AND l0.cid = e0.cid
      JOIN lut1 l1 ON l1.query_id = qs.query_id AND l1.cid = e1.cid
      JOIN lut2 l2 ON l2.query_id = qs.query_id AND l2.cid = e2.cid
      JOIN lut3 l3 ON l3.query_id = qs.query_id AND l3.cid = e3.cid
      WHERE e0.vec_id <> qs.query_id
    ) WHERE rnk <= {PQ_TOPK}
"""
)


@register("x_ann_pq", oracle=_PQ_ORACLE)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN (the FAISS-style memory-bound scale path,
    completing the ANN ladder after brute force / LSH / IVF): the vector
    splits into M_SUB subspaces, each trained to its own K_PQ-codeword
    integer codebook (one md5-seeded exact-integer Lloyd round — the
    x_kmeans_int8 machinery per slice), so every corpus vector compresses
    to M_SUB small codes.  A query never touches the vectors again:
    per-subspace lookup tables LUT[m][k] = ‖q_m − c_{m,k}‖² are built
    once per query and the asymmetric distance of ANY corpus vector is
    M_SUB integer table lookups summed — the ADC scan.

    All-integer determinism end to end (sub-distances, floor-mean
    centroids, LUTs, total tie order (adist, vec_id)) makes even this
    three-stage index hash-match the DuckDB unrolled replay.

    100 TB: the corpus lives as M_SUB·log2(K_PQ) bits/vector (here 8 —
    a 64× compression of the int8 codes); training collects only
    M_SUB × K_PQ × SUB ints (bounded codebooks, the x_sim_ivf contract);
    encoding + the ADC scan are one mapInPandas pass each with NO
    shuffle of the corpus; per-partition top-k candidates (Q×k rows per
    task) merge in one tiny window.  Production composes this with the
    IVF cells (scan only probed cells) — the plans are orthogonal."""
    codes = quantized_codes(spark, sf_dir).cache()
    return _pq_topk(codes, M_SUB, SUB, K_PQ, PQ_TOPK)


def _train_pq_books(codes: DataFrame, m_sub: int, sub_dim: int, k_pq: int):
    """Train one integer codebook per subspace (md5-seeded, 1 Lloyd
    round) — the training leg shared by x_ann_pq, the structured-recall
    operating point, and the IVF-PQ composition.  Returns
    [(cids, (k_pq, sub_dim) int64 centroid matrix)] per subspace.

    The m_sub training legs are INDEPENDENT (different hash salt,
    different qv slice, no shared state), but each one is 2 sequential
    driver actions (seed collect + Lloyd-update collect) on a tiny
    table, so a sequential loop serializes 2·m_sub job launches —
    measured ~5 s of the x_pq_recall_structured build (M=8) with the
    cluster idle.  Submitting the legs from a thread pool overlaps the
    job tails (optimization guide §2.6); per-leg math, seeds and
    tie-breaks are byte-identical to the sequential form."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    from data_pipeline_cursor_spark.text.dedup import phash

    def _train_one(m: int):
        sub = codes.select(
            "vec_id", F.slice("qv", m * sub_dim + 1, sub_dim).alias("qv")
        )
        h = sub.withColumn(
            "hv", phash(F.col("vec_id").cast("string"), f"pq{m}")
        )
        w = Window.orderBy("hv", "vec_id")
        seeds = (
            h.orderBy("hv", "vec_id")
            .limit(k_pq)
            .select(
                F.row_number().over(w).cast("int").alias("cid"),
                F.col("qv").alias("cv"),
            )
        )
        cent_rows = sorted(seeds.collect(), key=lambda r: r["cid"])
        upd = _update(_assign(sub, cent_rows))
        cent_rows = sorted(
            upd.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
            .collect(),
            key=lambda r: r["cid"],
        )
        return (
            np.array([r["cid"] for r in cent_rows], dtype=np.int64),
            np.stack(
                [np.asarray(r["cv"], dtype=np.int64) for r in cent_rows]
            ),
        )

    with ThreadPoolExecutor(max_workers=m_sub) as pool:
        return list(pool.map(_train_one, range(m_sub)))


def _pq_luts(Qm, books, m_sub: int, sub_dim: int):
    """Per-subspace query lookup tables: exact integer ‖q_m − c_{m,k}‖²,
    cid-ordered — (n_queries, k_pq) per subspace."""
    luts = []
    for m in range(m_sub):
        _cids, C = books[m]
        qsub = Qm[:, m * sub_dim : (m + 1) * sub_dim]
        luts.append(((qsub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    return luts


def _pq_topk(
    codes: DataFrame, m_sub: int, sub_dim: int, k_pq: int, topk: int
) -> DataFrame:
    """The PQ pipeline of x_ann_pq, parameterized: train one integer
    codebook per subspace (md5-seeded, 1 Lloyd round), encode, ADC-scan,
    per-partition (adist, vec_id) top-k, global window merge.  Shared by
    the registered index (global config) and the structured-recall
    operating point (M=8, K=16)."""
    import numpy as np
    import pandas as pd

    books = _train_pq_books(codes, m_sub, sub_dim, k_pq)

    # -- query LUTs (query batch bounded by the x_sim_topk contract) --
    q_rows = _bounded_query_batch(codes)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Qm = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in q_rows])
    luts = _pq_luts(Qm, books, m_sub, sub_dim)

    # -- encode + ADC scan + per-partition top-k in ONE pass --
    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            vids = pdf["vec_id"].to_numpy()
            adist = np.zeros((len(q_ids), len(vids)), dtype=np.int64)
            for m in range(m_sub):
                _cids, C = books[m]
                sub = V[:, m * sub_dim : (m + 1) * sub_dim]
                d = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2 * (sub @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                code = d.argmin(axis=1)  # first-min = smallest cid
                adist += luts[m][:, code]
            out_q, out_v, out_d = [], [], []
            k = min(topk, len(vids))
            for qi in range(len(q_ids)):
                # lexsort on (adist, vec_id) so the per-partition cut
                # respects the same TOTAL order as the global window and
                # the oracle — argsort alone breaks adist ties by the
                # arbitrary partition row order and can drop the vector
                # the total order would rank inside the top-k.
                order = np.lexsort((vids, adist[qi]))[: k + 1]
                for vi in order:
                    if vids[vi] != q_ids[qi]:
                        out_q.append(q_ids[qi])
                        out_v.append(vids[vi])
                        out_d.append(adist[qi, vi])
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "adist": out_d}
            )

    cand = codes.mapInPandas(
        scan, "query_id bigint, vec_id bigint, adist bigint"
    )
    w = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "rnk", "vec_id", "adist")
    )


_PQ_BODY = f"""
      SELECT qs.query_id, e0.vec_id,
             CAST(l0.d + l1.d + l2.d + l3.d AS BIGINT) AS adist,
             row_number() OVER (PARTITION BY qs.query_id
                                ORDER BY (l0.d + l1.d + l2.d + l3.d),
                                         e0.vec_id) AS rnk
      FROM qs
      CROSS JOIN e0
      JOIN e1 ON e1.vec_id = e0.vec_id
      JOIN e2 ON e2.vec_id = e0.vec_id
      JOIN e3 ON e3.vec_id = e0.vec_id
      JOIN lut0 l0 ON l0.query_id = qs.query_id AND l0.cid = e0.cid
      JOIN lut1 l1 ON l1.query_id = qs.query_id AND l1.cid = e1.cid
      JOIN lut2 l2 ON l2.query_id = qs.query_id AND l2.cid = e2.cid
      JOIN lut3 l3 ON l3.query_id = qs.query_id AND l3.cid = e3.cid
      WHERE e0.vec_id <> qs.query_id
"""

_PQ_RECALL_ORACLE = (
    f"WITH {DUCK_QV_CTE},\n"
    + ",".join(_duck_sub(m) for m in range(M_SUB))
    + ",\n    qs AS (SELECT vec_id AS query_id, qv FROM q"
    " ORDER BY md5('q:' || CAST(vec_id AS VARCHAR)), vec_id"
    f" LIMIT {ANN_QUERY_K}),"
    + ",".join(_duck_lut(m) for m in range(M_SUB))
    + f""",
    pq AS (
      SELECT query_id, vec_id FROM ({_PQ_BODY}) WHERE rnk <= {PQ_TOPK}
    ),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT qs.query_id, c.vec_id,
               row_number() OVER (PARTITION BY qs.query_id ORDER BY
                 list_sum(list_transform(range(1, {DIM + 1}),
                   i -> CAST((qs.qv[i] - c.qv[i]) * (qs.qv[i] - c.qv[i])
                             AS BIGINT))),
                 c.vec_id) AS rn
        FROM qs CROSS JOIN q c
        WHERE c.vec_id <> qs.query_id
      ) WHERE rn <= {PQ_TOPK}
    )
    SELECT t.query_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(p.vec_id) / {PQ_TOPK}.0, 4) AS recall
    FROM truth t
    LEFT JOIN pq p ON p.query_id = t.query_id AND p.vec_id = t.vec_id
    GROUP BY t.query_id
"""
)


@register("x_pq_recall", oracle=_PQ_RECALL_ORACLE)
def pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ index against EXACT L2 ground truth in the same
    code space (x_ann_recall's harness applied to x_ann_pq) — the
    calibration table that sizes M_SUB/K_PQ before the compressed index
    replaces exact search: PQ's approximation error comes from
    quantizing WITHIN subspaces, and recall against the exact scan is
    the direct measurement of that loss.

    Ground truth is the full-dimension integer L2 top-k over the same
    quantized codes (one mapInPandas scan-once pass, per-partition
    candidates, tiny window merge — x_sim_topk's shape in int space);
    the index side is the registered x_ann_pq.  Integer hit counts.

    Expected READING on this fixture: recall ≈ 0.  The synthetic
    embeddings are isotropic random vectors — incompressible by
    construction — and PQ's whole premise is exploiting the low
    intrinsic dimensionality real embedding corpora have (a sweep on
    this fixture tops out near 0.47 even at M=16, K=32, 2 rounds).
    That is precisely what this table is FOR: it reports, with an
    oracle-verified number, that the compressed index must not replace
    exact search on this corpus at this config.  The validated POSITIVE
    operating point lives in x_pq_recall_structured: same machinery on a
    low-intrinsic-dimension corpus, where sized M/K reaches recall 1.0."""
    codes = quantized_codes(spark, sf_dir).cache()
    truth = _exact_topk(codes, PQ_TOPK)
    index = ann_pq(spark, sf_dir)
    return _recall_table(truth, index, PQ_TOPK)


def _exact_topk(codes: DataFrame, topk: int) -> DataFrame:
    """EXACT full-dimension integer-L2 top-k over (vec_id, qv) codes for
    the fixed-K query draw — the ground-truth side of the recall tables.
    One mapInPandas scan-once pass; per-partition candidates cut in the
    (dist, vec_id) total order; tiny window merge."""
    import numpy as np
    import pandas as pd

    q_rows = _bounded_query_batch(codes)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Qm = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in q_rows])

    def exact_scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            vids = pdf["vec_id"].to_numpy()
            d = (
                (Qm * Qm).sum(axis=1)[:, None]
                - 2 * (Qm @ V.T)
                + (V * V).sum(axis=1)[None, :]
            )
            out_q, out_v, out_d = [], [], []
            k = min(topk + 1, d.shape[1])
            for qi in range(len(q_ids)):
                # (dist, vec_id) total order — same boundary-tie fix as
                # the ADC scan above, keeping the cut oracle-consistent.
                order = np.lexsort((vids, d[qi]))[:k]
                for vi in order:
                    if vids[vi] != q_ids[qi]:
                        out_q.append(q_ids[qi])
                        out_v.append(vids[vi])
                        out_d.append(d[qi, vi])
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "dist": out_d}
            )

    cand = codes.mapInPandas(
        exact_scan, "query_id bigint, vec_id bigint, dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "vec_id")
    )


def _recall_table(
    truth: DataFrame, index: DataFrame, topk: int
) -> DataFrame:
    """Per-query hits/recall of an ANN index's (query_id, vec_id) pairs
    against exact ground truth."""
    index = index.select(
        F.col("query_id").alias("pq_query"), F.col("vec_id").alias("pq_vec")
    )
    joined = truth.join(
        index,
        (truth.query_id == index.pq_query) & (truth.vec_id == index.pq_vec),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("pq_vec").alias("n_hits"),
        F.round(F.count("pq_vec") / float(topk), 4).alias("recall"),
    )


# ---- PQ validated operating point (x_pq_recall_structured) -----------------
#
# x_pq_recall documents PQ's failure mode on the isotropic fixture; this
# variant documents the POSITIVE operating point the method exists for.
# The corpus is a deterministic LOW-INTRINSIC-DIMENSION set derived from
# vec_id alone (so both engines construct it bit-identically): clusters of
# ST_CLUSTER vectors share one center, centers are well-separated integer
# points, and within-cluster spread is zero — the limiting case of the
# "real embedding corpora concentrate near a low-dim manifold" premise.
# With K codewords >= distinguishable sub-centers per subspace, the ADC
# ranking reproduces the exact ranking and recall@5 is 1.0 (pinned by
# test_pq_structured_recall_operating_point, threshold 0.8).

ST_M = 8                  # subspaces (vs 4 in the registered index)
ST_SUB = DIM // ST_M      # 8 dims per subspace
ST_K = 16                 # codewords per subspace (vs 4)
ST_CLUSTER = 6            # vectors per cluster (> PQ_TOPK, so ground-truth
#                           top-5 stays within the cluster)
ST_MOD = 1009             # prime modulus for the hashed center values


def structured_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, qv) with qv[j] = (phash(c ‖ j) mod 1009) − 504 and
    c = vec_id // ST_CLUSTER: md5-derived pseudorandom integer centers
    over the embeddings table's ids — no RNG state, SQL-expressible,
    identical in both engines.  Hash-based (not affine in c) on purpose:
    an affine center map makes codeword-basin collisions CORRELATED
    across subspaces (the same Δc shift applies in every slice), and a
    full-tuple collision puts a foreign cluster at the exact same ADC
    sum where vec_id tie-break displaces true neighbors."""
    from data_pipeline_cursor_spark.sources import load_table
    from data_pipeline_cursor_spark.text.dedup import phash

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    c = F.floor(F.col("vec_id") / F.lit(ST_CLUSTER)).cast("long")
    qv = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            phash(F.concat(c.cast("string"), F.lit("_"), j.cast("string")),
                  "stpq")
            % ST_MOD
            - (ST_MOD - 1) // 2
        ).cast("int"),
    )
    return emb.select("vec_id", qv.alias("qv"))


_ST_Q_CTE = f"""q AS (
      SELECT vec_id,
             list_transform(range(0, {DIM}),
               j -> CAST(((('0x' || substr(md5('stpq:' ||
                            (vec_id // {ST_CLUSTER}) || '_' || j), 1, 15)
                          )::BIGINT % {ST_MOD}) - {(ST_MOD - 1) // 2})
                         AS INT)) AS qv
      FROM embeddings
    )"""

_PQ_STRUCTURED_ORACLE = (
    f"WITH {_ST_Q_CTE},\n"
    + ",".join(_duck_sub(m, sub=ST_SUB, k_pq=ST_K) for m in range(ST_M))
    + ",\n    qs AS (SELECT vec_id AS query_id, qv FROM q"
    " ORDER BY md5('q:' || CAST(vec_id AS VARCHAR)), vec_id"
    f" LIMIT {ANN_QUERY_K}),"
    + ",".join(_duck_lut(m, sub=ST_SUB) for m in range(ST_M))
    + f""",
    pq AS (
      SELECT query_id, vec_id FROM ({_duck_pq_body(ST_M)})
      WHERE rnk <= {PQ_TOPK}
    ),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT qs.query_id, c.vec_id,
               row_number() OVER (PARTITION BY qs.query_id ORDER BY
                 list_sum(list_transform(range(1, {DIM + 1}),
                   i -> CAST((qs.qv[i] - c.qv[i]) * (qs.qv[i] - c.qv[i])
                             AS BIGINT))),
                 c.vec_id) AS rn
        FROM qs CROSS JOIN q c
        WHERE c.vec_id <> qs.query_id
      ) WHERE rn <= {PQ_TOPK}
    )
    SELECT t.query_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(p.vec_id) / {PQ_TOPK}.0, 4) AS recall
    FROM truth t
    LEFT JOIN pq p ON p.query_id = t.query_id AND p.vec_id = t.vec_id
    GROUP BY t.query_id
"""
)


@register("x_pq_recall_structured", oracle=_PQ_STRUCTURED_ORACLE)
def pq_recall_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_pq_recall's harness on the structured corpus with SIZED config
    (M={ST_M} subspaces × K={ST_K} codewords vs the registered 4×4): the
    one VALIDATED PQ operating point — recall@{PQ_TOPK} = 1.0 here —
    complementing x_pq_recall's correctly-reported ~0 on the isotropic
    fixture.  Together they are the calibration story: measure recall in
    the target code space, ship PQ only where structure exists.

    Why this corpus compresses: each subspace sees at most |clusters|
    distinct sub-vectors with zero within-cluster spread, so the Lloyd
    round lands codewords on (floor-means of) actual sub-centers and the
    per-subspace assignment of a query equals that of its own cluster —
    the ADC sum is then minimized exactly by same-cluster vectors, and
    (adist, vec_id) tie-break matches the exact scan's (0-distance,
    vec_id) order.  100 TB posture identical to x_ann_pq (bounded
    codebook collects, scan-once encode+ADC, no corpus shuffle)."""
    codes = structured_codes(spark, sf_dir).cache()
    truth = _exact_topk(codes, PQ_TOPK)
    index = _pq_topk(codes, ST_M, ST_SUB, ST_K, PQ_TOPK)
    return _recall_table(truth, index, PQ_TOPK)


# ---- IVF-PQ composition (x_ann_ivf_pq) -------------------------------------

IVF_NPROBE = 2  # probed coarse cells per query (x_sim_ivf_trained's nprobe)

# coarse k-means chain with k-prefixed CTE names — _duck_km_av_chain's
# a1/u1/c1 would collide with _duck_sub(1)'s per-subspace a1/u1/c1
_IVF_PQ_COARSE = f"""{DUCK_QV_CTE},
    kh AS (
      SELECT vec_id, qv,
             ('0x' || substr(md5('km:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    kseeds AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, qv AS cv
      FROM kh ORDER BY hv, vec_id LIMIT {K}
    ),
    ka1 AS ({_duck_assign('kh', 'kseeds')}),
    ku1 AS ({_duck_update('ka1')}),
    kc1 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM ku1 GROUP BY cid),
    ka2 AS ({_duck_assign('kh', 'kc1')}),
    ku2 AS ({_duck_update('ka2')}),
    kc2 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM ku2 GROUP BY cid),
    av AS (SELECT vec_id, cid AS cell FROM ({_duck_assign('kh', 'kc2')}))"""

def _materialize(sql: str, names) -> str:
    """Pin ``name AS MATERIALIZED (`` on the listed CTEs.  DuckDB's
    default inlines a CTE per reference; in the composed IVF-PQ replay
    the coarse chain and the four subspace chains are each referenced by
    several downstream CTEs, and re-inlining turned a 3 s oracle into a
    6-minute one (measured at sf0.01).  Semantics are unchanged —
    MATERIALIZED is an evaluation fence, not a rewrite."""
    import re

    for name in names:
        sql = re.sub(
            rf"(\n\s*{name} AS )\(", r"\1MATERIALIZED (", sql, count=1
        )
    return sql


# the shared CTE prelude (coarse chain, subspace chains, query draw,
# probed cells, LUTs) and ADC body — composed by both the index oracle
# and the recall oracle
_IVF_PQ_PRELUDE = (
    _IVF_PQ_COARSE
    + ",\n"
    + ",".join(_duck_sub(m) for m in range(M_SUB))
    + ",\n    qs AS (SELECT vec_id AS query_id, qv FROM q"
    " ORDER BY md5('q:' || CAST(vec_id AS VARCHAR)), vec_id"
    f" LIMIT {ANN_QUERY_K}),"
    + f"""
    qp AS (
      SELECT vec_id AS query_id, cid AS cell
      FROM ({_duck_assign('kh', 'kc2', rn=f'<= {IVF_NPROBE}',
                          where="WHERE h.vec_id IN (SELECT vec_id FROM ("
                          + duck_query_draw(cols='vec_id') + '))')})
    ),"""
    + ",".join(_duck_lut(m) for m in range(M_SUB))
)

_IVF_PQ_BODY = """
      SELECT qs.query_id, e0.vec_id, av.cell,
             CAST(l0.d + l1.d + l2.d + l3.d AS BIGINT) AS adist,
             row_number() OVER (PARTITION BY qs.query_id
                                ORDER BY (l0.d + l1.d + l2.d + l3.d),
                                         e0.vec_id) AS rnk
      FROM qs
      JOIN qp ON qp.query_id = qs.query_id
      JOIN av ON av.cell = qp.cell AND av.vec_id <> qs.query_id
      JOIN e0 ON e0.vec_id = av.vec_id
      JOIN e1 ON e1.vec_id = e0.vec_id
      JOIN e2 ON e2.vec_id = e0.vec_id
      JOIN e3 ON e3.vec_id = e0.vec_id
      JOIN lut0 l0 ON l0.query_id = qs.query_id AND l0.cid = e0.cid
      JOIN lut1 l1 ON l1.query_id = qs.query_id AND l1.cid = e1.cid
      JOIN lut2 l2 ON l2.query_id = qs.query_id AND l2.cid = e2.cid
      JOIN lut3 l3 ON l3.query_id = qs.query_id AND l3.cid = e3.cid
"""

_IVF_PQ_ORACLE_RAW = (
    "WITH "
    + _IVF_PQ_PRELUDE
    + f"""
    SELECT query_id, rnk, vec_id, cell, adist FROM (
      {_IVF_PQ_BODY}
    ) WHERE rnk <= {PQ_TOPK}
"""
)

_IVF_PQ_ORACLE = _materialize(
    _IVF_PQ_ORACLE_RAW,
    ["q", "kh", "kseeds", "kc1", "kc2", "av", "qp", "qs"]
    + [f"{p}{m}" for m in range(M_SUB) for p in ("h", "seeds", "c", "e", "lut")],
)


@register("x_ann_ivf_pq", oracle=_IVF_PQ_ORACLE)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the composition both parents' docstrings promise
    (x_ann_pq: "production composes this with the IVF cells"; FAISS
    IndexIVFPQ, the standard billion-scale serving shape): the trained
    coarse codebook prunes the corpus to each query's {IVF_NPROBE}
    probed cells, and ONLY those vectors are scored — by the PQ ADC sum,
    never the raw vectors.  Memory = PQ codes; scan work = corpus/K per
    probe instead of corpus.

    Everything stays in the exact integer code space of both parents
    (coarse assignment = x_sim_ivf_trained's (dist, cid) total order; PQ
    codes/LUTs = x_ann_pq's), so the full three-index composition —
    coarse train, PQ train, probe, encode, masked ADC scan — hash-matches
    the DuckDB unrolled replay end to end.

    100 TB: the coarse + PQ codebooks are the only driver state (bounded
    collects); one mapInPandas pass assigns each Arrow batch to cells,
    encodes, and ADC-scores it against the probe mask — no corpus
    shuffle; per-partition (adist, vec_id) top-k candidates merge in a
    tiny global window, exactly the parents' cost shape with the scan
    term divided by K/nprobe."""
    import numpy as np
    import pandas as pd

    codes = quantized_codes(spark, sf_dir).cache()

    # the coarse codebook and the PQ subspace books are trained from the
    # same cached codes but share no state — overlap the two driver-action
    # chains (guide §2.6) instead of serializing ~5 tiny jobs
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        cb_f = pool.submit(_train_codebook, codes.select("vec_id", "qv"), ITERS)
        books_f = pool.submit(_train_pq_books, codes, M_SUB, SUB, K_PQ)
        cb, books = cb_f.result(), books_f.result()
    coarse_cids = np.array([r["cid"] for r in cb], dtype=np.int64)
    Cc = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in cb])

    q_rows = _bounded_query_batch(codes)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Qm = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in q_rows])
    luts = _pq_luts(Qm, books, M_SUB, SUB)

    # probed cells per query: (queries × K) ints, driver-tiny; stable
    # argsort → ties to the smaller cid, the training total order
    dq = (
        (Qm * Qm).sum(axis=1)[:, None]
        - 2 * (Qm @ Cc.T)
        + (Cc * Cc).sum(axis=1)[None, :]
    )
    nprobe = min(IVF_NPROBE, len(coarse_cids))
    probes = coarse_cids[np.argsort(dq, axis=1, kind="stable")[:, :nprobe]]

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            vids = pdf["vec_id"].to_numpy()
            dv = (
                (V * V).sum(axis=1)[:, None]
                - 2 * (V @ Cc.T)
                + (Cc * Cc).sum(axis=1)[None, :]
            )
            cells = coarse_cids[dv.argmin(axis=1)]  # first-min = min cid
            adist = np.zeros((len(q_ids), len(vids)), dtype=np.int64)
            for m in range(M_SUB):
                _cids, C = books[m]
                sub = V[:, m * SUB : (m + 1) * SUB]
                d = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2 * (sub @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                adist += luts[m][:, d.argmin(axis=1)]
            allowed = (cells[None, :, None] == probes[:, None, :]).any(axis=2)
            out_q, out_v, out_c, out_d = [], [], [], []
            k = min(PQ_TOPK, len(vids))
            for qi in range(len(q_ids)):
                idx = np.nonzero(allowed[qi])[0]
                if not len(idx):
                    continue
                order = idx[np.lexsort((vids[idx], adist[qi, idx]))][: k + 1]
                for vi in order:
                    if vids[vi] != q_ids[qi]:
                        out_q.append(q_ids[qi])
                        out_v.append(vids[vi])
                        out_c.append(cells[vi])
                        out_d.append(adist[qi, vi])
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "vec_id": out_v,
                    "cell": out_c,
                    "adist": out_d,
                }
            )

    cand = codes.mapInPandas(
        scan, "query_id bigint, vec_id bigint, cell bigint, adist bigint"
    )
    w = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOPK)
        .select("query_id", "rnk", "vec_id", "cell", "adist")
    )


_IVF_PQ_RECALL_ORACLE = _materialize(
    "WITH "
    + _IVF_PQ_PRELUDE
    + f""",
    ivfpq AS (
      SELECT query_id, vec_id FROM ({_IVF_PQ_BODY}) WHERE rnk <= {PQ_TOPK}
    ),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT qs.query_id, c.vec_id,
               row_number() OVER (PARTITION BY qs.query_id ORDER BY
                 list_sum(list_transform(range(1, {DIM + 1}),
                   i -> CAST((qs.qv[i] - c.qv[i]) * (qs.qv[i] - c.qv[i])
                             AS BIGINT))),
                 c.vec_id) AS rn
        FROM qs CROSS JOIN q c
        WHERE c.vec_id <> qs.query_id
      ) WHERE rn <= {PQ_TOPK}
    )
    SELECT t.query_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(p.vec_id) / {PQ_TOPK}.0, 4) AS recall
    FROM truth t
    LEFT JOIN ivfpq p ON p.query_id = t.query_id AND p.vec_id = t.vec_id
    GROUP BY t.query_id
""",
    ["q", "kh", "kseeds", "kc1", "kc2", "av", "qp", "qs", "ivfpq", "truth"]
    + [f"{p}{m}" for m in range(M_SUB) for p in ("h", "seeds", "c", "e", "lut")],
)


@register("x_ivf_pq_recall", oracle=_IVF_PQ_RECALL_ORACLE)
def ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@{PQ_TOPK} of the composed IVF-PQ index against the exact
    integer-L2 ground truth — the operating-point calibration every
    production IVF-PQ deployment runs before committing to an (nprobe,
    M, K) point.  Extends the x_pq_recall story to the composition: PQ
    quantization error is now COMPOUNDED by cell pruning (a true
    neighbour outside the {IVF_NPROBE} probed cells is unreachable no
    matter how good the codes), so this measures the two losses
    together, which is the number that matters for serving.

    Same harness as x_pq_recall (exact scan-once ground truth,
    per-query LEFT-JOIN hit count); everything integer-deterministic so
    the whole composed calibration carries a full hash oracle.

    Measured honestly: on the isotropic fixture this reads ~0 (mean
    0.025 at sf0.01) — x_pq_recall's documented PQ failure mode, now
    compounded by pruning; x_pq_recall_structured holds the positive
    operating point.  The value of this operator IS the measurement:
    it is the gate that stops an IVF-PQ config from shipping blind.

    100 TB: ground truth is the one brute-force pass (run on a sampled
    query set exactly like this fixed-{ANN_QUERY_K} draw); index and
    truth legs are both scan-once with bounded driver state."""
    codes = quantized_codes(spark, sf_dir).cache()
    truth = _exact_topk(codes, PQ_TOPK)
    index = ann_ivf_pq(spark, sf_dir)
    return _recall_table(truth, index, PQ_TOPK)


# ---------------------------------------------------------------------------
# Cluster-quality evaluation against held-out labels — the validation
# step between "the codebook trained" and "the index/bucketing built on
# it is trustworthy" (the same gate x_ann_recall provides for ANN).
# ---------------------------------------------------------------------------

_PURITY_PRELUDE = f"""{DUCK_QV_CTE},
    h AS (
      SELECT vec_id, qv,
             ('0x' || substr(md5('km:' || vec_id), 1, 15))::BIGINT AS hv
      FROM q
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY hv, vec_id) AS cid, qv AS cv
      FROM h ORDER BY hv, vec_id LIMIT {K}
    ),
    a1 AS ({_duck_assign('h', 'seeds')}),
    u1 AS ({_duck_update('a1')}),
    c1 AS (SELECT cid, list(c ORDER BY dim) AS cv FROM u1 GROUP BY cid),
    a2 AS ({_duck_assign('h', 'c1')})"""


@register(
    "x_cluster_purity",
    oracle=f"""
    WITH {_PURITY_PRELUDE},
    lab AS (
      SELECT a2.cid, e.label FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id
    ),
    cont AS (
      SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM lab GROUP BY cid, label
    ),
    ranked AS (
      SELECT cid, label, n,
             CAST(SUM(n) OVER (PARTITION BY cid) AS BIGINT) AS n_members,
             row_number() OVER (PARTITION BY cid ORDER BY n DESC, label)
               AS rn
      FROM cont
    )
    SELECT cid, n_members, label AS top_label, n AS top_n,
           ROUND(n / CAST(n_members AS DOUBLE), 4) AS purity
    FROM ranked WHERE rn = 1
    """,
)
def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER PURITY against the held-out ``label`` column: run the
    registered k-means training (same seeds, same {ITERS} Lloyd rounds,
    same integer arithmetic as x_kmeans_int8), take the FINAL
    assignment, and report per cluster its size, majority label, and
    purity = majority count / size — the standard external-validation
    metric that decides whether a trained codebook's cells align with
    any real structure before an IVF index or SemDeDup pass is built on
    them.  Ties on the majority label break to the smaller label id in
    both engines.

    Plan/scale: training is x_kmeans_int8's bounded-collect loop (the
    K×DIM codebook is the only driver state); evaluation is one
    closure-broadcast assignment pass over the corpus, an equi-join to
    the label column (vec_id-to-vec_id — AQE broadcasts the smaller
    projection), and contingency aggregation at (K × |labels|) grain —
    nothing pairwise, nothing corpus-sized after the scan.  The DuckDB
    oracle unrolls the identical training chain (the x_kmeans_int8
    prelude) through the final assignment, so the hash match re-proves
    training AND evaluation in one artifact."""
    from data_pipeline_cursor_spark.sources import load_table

    codes = quantized_codes(spark, sf_dir)
    cent_rows = _train_codebook(codes, ITERS - 1)
    assigned = _assign(codes, cent_rows).select("vec_id", "cid")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cont = (
        assigned.join(emb, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrank = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    wtot = Window.partitionBy("cid")
    ranked = cont.select(
        "cid",
        "label",
        "n",
        F.sum("n").over(wtot).alias("n_members"),
        F.row_number().over(wrank).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cid",
        "n_members",
        F.col("label").alias("top_label"),
        F.col("n").alias("top_n"),
        F.round(F.col("n") / F.col("n_members").cast("double"), 4).alias(
            "purity"
        ),
    )
