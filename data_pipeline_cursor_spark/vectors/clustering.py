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
    DIM,
    DUCK_QV_CTE,
    quantized_codes,
)

K = 8  # codebook size; fixture-sized (≈ sqrt-ish of 6k vectors / cell ~800)
ITERS = 2  # Lloyd rounds; the oracle unrolls the same fixed count


def _duck_assign(src: str, cents: str) -> str:
    """Assignment CTE body: nearest centroid by exact integer L2², ties to
    the smallest cid — the same (dist, cid) total order as the Spark side."""
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
        FROM {src} h CROSS JOIN {cents} s
      ) WHERE rn = 1
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
    from data_pipeline_cursor_spark.text.dedup import phash

    codes = quantized_codes(spark, sf_dir)
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
    update = None
    for it in range(ITERS):
        assigned = _assign(codes, cent_rows)
        update = _update(assigned)
        if it < ITERS - 1:  # the last codebook stays lazy in `update`
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
    # the LAST round's update is returned lazily — only the K×DIM codebook
    # was ever collected (bounded by contract, like x_sim_ivf's codebook)
    return update.select(
        "cid",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("c").alias("c_val"),
        F.col("n").alias("n_members"),
    )
