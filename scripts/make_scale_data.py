"""Scale-up fixture generator for empirical scaling runs (round-6 item 1).

Derives sfN data from the driver's read-only sf0.1 fixtures by key-space
replication: copy c of a table offsets every primary/foreign key by
c * (max_key + 1), so join cardinalities and per-key row counts match a
genuinely larger TPC-H-ish instance (each copy is an independent key
universe; dims region/nation stay fixed like real TPC-H).  Content rules:

- documents: per-copy seeded WORD SHUFFLE of each text (copy 0 = original).
  Plain replication would make every doc a 10-way near-duplicate and turn
  the minhash/cluster benchmarks into a pathological all-pairs workload;
  shuffling destroys word-3-shingles, so cross-copy Jaccard ~ 0 and the
  dedup suite sees a corpus with the same near-dup RATE as sf0.1.
- embeddings: per-copy cyclic rotation of the vector (norm-preserving,
  neighbor-structure-changing), copy 0 = original.
- events: ids/users offset, timestamps kept — a denser stream over the
  same window, which is how real traffic scales.

Output: /root/repo/.scaledata/sf{N}/{table}.parquet/ as one parquet file
per copy (Spark reads the directory transparently; memory stays at
one-copy scale while writing).  Deterministic — no RNG state beyond the
per-(doc, copy) seed derived from ids.

Usage: python scripts/make_scale_data.py [copies] [out_dir]
  default: 10 copies (sf1) -> /root/repo/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")

# table -> columns needing a per-copy key offset (offset unit = max+1 of
# the column's own key domain, read once from the source)
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
FIXED = ["region", "nation"]  # dimension tables: one copy, like TPC-H


def _domains() -> dict[str, int]:
    """max_key + 1 for every key domain referenced in KEYED."""
    import duckdb

    con = duckdb.connect()
    dom = {}
    for t, cols in KEYED.items():
        for col, domain in cols.items():
            if domain not in dom and domain == col:
                v = con.sql(
                    f"SELECT max({col}) FROM '{SRC}/{t}.parquet'"
                ).fetchone()[0]
                dom[domain] = int(v) + 1
    return dom


def _shuffle_words(text: str, seed: int) -> str:
    if not text:
        return text
    words = text.split(" ")
    rng = np.random.RandomState(seed % (2**31))
    rng.shuffle(words)
    return " ".join(words)


def make(copies: int, out: str) -> None:
    dom = _domains()
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pq.read_table(f"{SRC}/{t}.parquet"),
            os.path.join(d, "part-000.parquet"),
        )
        print(f"{t}: copied (fixed dim)")
    for t, cols in KEYED.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        base_doc = src.column("text").to_pylist() if t == "documents" else None
        for c in range(copies):
            tbl = src
            for col, domain in cols.items():
                off = c * dom[domain]
                idx = tbl.schema.get_field_index(col)
                arr = pc.add(tbl.column(col), off)
                tbl = tbl.set_column(idx, col, arr)
            if t == "documents" and c > 0:
                ids = tbl.column("doc_id").to_pylist()
                texts = [
                    _shuffle_words(txt, did * 1_000_003 + c)
                    for txt, did in zip(base_doc, ids)
                ]
                ti = tbl.schema.get_field_index("text")
                tbl = tbl.set_column(ti, "text", pa.array(texts))
                ni = tbl.schema.get_field_index("n_chars")
                tbl = tbl.set_column(
                    ni,
                    "n_chars",
                    pa.array([len(x) for x in texts], type=pa.int64()),
                )
            if t == "embeddings" and c > 0:
                vecs = tbl.column("embedding").to_pylist()
                # rotate by c % DIM — np.roll(v, c) aliases to the identity
                # whenever c is a multiple of DIM, so runs with copies > DIM
                # (sf10 uses 100 against DIM=64) would seed bit-identical
                # cross-copy vectors (round-6 ADVICE).  For c >= DIM a
                # second deterministic transform (sign flip on a hashed
                # dim subset) keeps every copy distinct even at equal
                # rotation residues; both transforms are norm-preserving.
                dim = next(
                    (len(v) for v in vecs if v is not None), None
                )
                if dim is None:  # all-null embedding column: pass through
                    pq.write_table(tbl, os.path.join(d, f"part-{c:03d}.parquet"))
                    continue
                rolled = []
                for v in vecs:
                    if v is None:
                        rolled.append(None)
                        continue
                    a = np.roll(np.asarray(v, dtype=np.float32), c % dim)
                    if c >= dim:
                        flip_mask = (
                            np.arange(dim) * 2654435761 + c
                        ) % 97 < 32  # ~1/3 of dims, copy-dependent
                        a = np.where(flip_mask, -a, a).astype(np.float32)
                    rolled.append(a.tolist())
                ei = tbl.schema.get_field_index("embedding")
                tbl = tbl.set_column(
                    ei, "embedding", pa.array(rolled, type=pa.list_(pa.float32()))
                )
            pq.write_table(tbl, os.path.join(d, f"part-{c:03d}.parquet"))
        print(f"{t}: {copies} copies x {src.num_rows} rows")


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/.scaledata/sf{copies / 10:g}"
    )
    make(copies, out)
    print("done:", out)
