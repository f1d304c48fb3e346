"""Distributed PCA over the embedding corpus (SURVEY.md §2.E family — the
dimensionality-reduction step an LLM-data pipeline runs before clustering /
visualization / cheap ANN, and the classic "sufficient statistics, not
data, to the driver" scale pattern).

Not in the reference (no vector data there).  Shape:

1. ONE distributed pass folds each task's Arrow batches into a partial
   (count, Σq, Σqqᵀ) — integer arithmetic on the x_embed_quantize codes, so
   every partial is exact and fold-order-free (same argument as
   x_embed_gram_int8).  Only O(DIM²) cells shuffle; corpus rows never do.
2. The driver assembles the DIM×DIM covariance from those sufficient
   statistics (the ONLY driver-materialized state — 64×64 here; a 4096-dim
   embedding is 16M floats, still driver-trivial) and eigendecomposes it.
   Eigenvector signs are fixed deterministically (largest-|component|
   entry made positive) — eigh's sign is otherwise arbitrary.
3. A second distributed pass projects every vector onto the top-K
   components with the tiny (K×DIM) matrix in the task closure — one BLAS
   matmul per batch, zero shuffle.

Correctness: eigendecomposition is not SQL-expressible, so this is a
DESIGNED rows-only registry entry (like q_approx_distinct); the hard
checks live in tests/test_invariants.py — orthonormal components,
descending eigenvalues, projection variance matching each eigenvalue, a
zero-mean projection, and bit-identical results across two invocations
(the determinism the integer sufficient statistics buy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.vectors.similarity import (
    DIM,
    quantized_codes,
    round4,
)

N_COMPONENTS = 4


def _sufficient_stats(codes: DataFrame):
    """One pass → (n, Σq [DIM], G=Σqqᵀ [DIM×DIM]) as exact integers.

    Each task emits one partial triple encoded as (i, j, val) cells:
    i=j=0 carries the count, j=0/i≥1 the per-dim sum, i,j≥1 the Gramian's
    upper triangle.  The groupBy folds partials; the driver collect is
    bounded at DIM²/2 + DIM + 1 cells by construction."""
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(DIM)

    def partial(batches):
        G = np.zeros((DIM, DIM), dtype=np.int64)
        s = np.zeros(DIM, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            G += Q.T @ Q
            s += Q.sum(axis=0)
            n += len(Q)
        if n:
            yield pd.DataFrame(
                {
                    "i": np.concatenate(([0], np.arange(1, DIM + 1), iu + 1)),
                    "j": np.concatenate(
                        ([0], np.zeros(DIM, dtype=np.int64), ju + 1)
                    ),
                    "val": np.concatenate(([n], s, G[iu, ju])),
                }
            )

    cells = (
        codes.mapInPandas(partial, "i int, j int, val bigint")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    n = 0
    s = np.zeros(DIM, dtype=np.int64)
    G = np.zeros((DIM, DIM), dtype=np.int64)
    for r in cells:
        if r["i"] == 0:
            n = int(r["val"])
        elif r["j"] == 0:
            s[r["i"] - 1] = r["val"]
        else:
            G[r["i"] - 1, r["j"] - 1] = r["val"]
            G[r["j"] - 1, r["i"] - 1] = r["val"]
    return n, s, G


def fit_pca(codes: DataFrame, k: int = N_COMPONENTS):
    """Covariance eigendecomposition from the integer sufficient stats.

    Returns (mu float64[DIM], components float64[k×DIM], eigvals float64[k])
    with a deterministic sign convention: each component's largest-|x|
    entry (first index on ties) is made positive."""
    import numpy as np

    n, s, G = _sufficient_stats(codes)
    mu = s.astype(np.float64) / n
    cov = (G.astype(np.float64) - n * np.outer(mu, mu)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, DIM)
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1
    return mu, comps, w[order]


@register("x_embed_pca")
def embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every corpus vector onto the top-{N_COMPONENTS}
    principal components of the quantized-code covariance (module
    docstring).  Output: (vec_id, pc1..pc{N_COMPONENTS}) rounded to 4.

    DESIGNED rows-only entry: the eigendecomposition step is not
    SQL-expressible; invariants are pinned in tests/test_invariants.py."""
    import numpy as np
    import pandas as pd

    codes = quantized_codes(spark, sf_dir)
    mu, comps, _ = fit_pca(codes)
    k = comps.shape[0]
    cols = [f"pc{i + 1}" for i in range(k)]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["qv"]])
            P = round4((Q - mu) @ comps.T)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for i, c in enumerate(cols):
                out[c] = P[:, i]
            yield pd.DataFrame(out)

    schema = "vec_id bigint, " + ", ".join(f"{c} double" for c in cols)
    return codes.mapInPandas(project, schema)
