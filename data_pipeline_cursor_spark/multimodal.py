"""Multimodal-column operators (SURVEY.md §2.E E8 + driver-mandated
image/audio/video plumbing).

Not in the reference (its only payload is a 3-field JSON event) — this
module establishes how opaque media BLOBs ride through the engine:

- media is an opaque `binary` column + a typed metadata struct
  (media_type/width/height/sample_rate), exactly how a 100 TB lakehouse
  stores it (parquet BINARY + stats-only metadata columns);
- decode / feature-extraction runs as Arrow-batched `mapInPandas` — one
  Python process per partition, one pandas batch at a time, never per-row
  Python.  The actual codec call is stubbed (`_decode_media`) because no
  image/audio library ships in this container; the stub is deterministic
  so the pipeline is testable end-to-end.  The Spark-side plumbing —
  schema, batch iteration, partition mapping — is the real thing;
- the relational join between modalities (documents ⋈ embeddings) is a
  plain equi-join on the shared key; at 100 TB both sides bucket on the
  key so the join co-locates without a shuffle.

The synthetic media payload is derived from `documents.text` (the fixture
has no real media); byte lengths and checksums below are therefore
SQL-verifiable against DuckDB, which is the point: the *plumbing* is
hash-checked even though the codec is a stub.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_cursor_spark.registry import register
from data_pipeline_cursor_spark.sources import load_table

FEATURE_DIM = 8


@register(
    "x_multimodal_join",
    oracle="""
    SELECT d.lang, e.label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(d.n_chars), 4) AS avg_chars,
           ROUND(AVG(e.embedding[1]::DOUBLE), 4) AS avg_e1
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector modality join (E8): equi-join on the shared key,
    then a profile aggregate over (lang, label).

    100 TB: both tables bucketed on doc_id/vec_id makes this a
    co-located join (no shuffle); unbucketed it is one AQE-sized
    shuffle-hash join."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                F.avg(F.element_at("embedding", 1).cast("double")), 4
            ).alias("avg_e1"),
        )
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table recast as a media table: opaque binary payload +
    typed metadata struct — the storage shape for image/audio/video columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "x_media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END          AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(n_chars % 640 AS INTEGER)  AS width,
           CAST(n_chars % 480 AS INTEGER)  AS height
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media metadata projection: binary payload size + struct fields —
    all JVM-side (`length` on binary, struct field access), no decode.

    100 TB: metadata-only scans never touch payload bytes; parquet column
    pruning drops the BLOB column at the reader (verify: ReadSchema in
    .explain excludes `payload`)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def _decode_media(payload: bytes, media_type: str) -> list[float]:
    """STUB decode: the real implementation would call an image/audio codec
    (e.g. Pillow / torchaudio / ffmpeg) — none ship in this container.

    Deterministic fake: FEATURE_DIM moments of the raw byte stream, so the
    pipeline is end-to-end testable and reproducible.  Replace the body
    (only) to plug in a real codec; the schema/batching contract stays."""
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    feats = [float(n), float(payload[0]), float(payload[-1])]
    s = sum(payload)
    feats.append(s / n)
    for k in range(FEATURE_DIM - len(feats)):
        feats.append(float(payload[(k * 97) % n]))
    return feats


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via mapInPandas.

    One iterator of pandas batches per partition; output schema fixed to
    (media_id, media_type, feature array<double>).  The per-batch loop is
    vectorized where possible; the codec boundary (`_decode_media`) is
    per-payload, as any real decoder would be."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_media(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    flat = media.select(
        "media_id", F.col("meta.media_type").alias("media_type"), "payload"
    )
    return flat.mapInPandas(
        batches, "media_id long, media_type string, features array<double>"
    )


@register(
    "x_media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS feat_len,
           ROUND(list_sum(list_transform(
             generate_series(1, octet_length(encode(text))),
             i -> get_bit(encode(text)::BIT, (8*(i-1))::INTEGER)*128
                + get_bit(encode(text)::BIT, (8*(i-1)+1)::INTEGER)*64
                + get_bit(encode(text)::BIT, (8*(i-1)+2)::INTEGER)*32
                + get_bit(encode(text)::BIT, (8*(i-1)+3)::INTEGER)*16
                + get_bit(encode(text)::BIT, (8*(i-1)+4)::INTEGER)*8
                + get_bit(encode(text)::BIT, (8*(i-1)+5)::INTEGER)*4
                + get_bit(encode(text)::BIT, (8*(i-1)+6)::INTEGER)*2
                + get_bit(encode(text)::BIT, (8*(i-1)+7)::INTEGER)
           )) / octet_length(encode(text)), 4) AS mean_byte
    FROM documents
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction (mapInPandas path), verified on its
    SQL-checkable projection: payload length + mean byte value.

    The full feature vector (array<double>, FEATURE_DIM) is exercised by
    tests/test_invariants.py::test_media_features_full_vector; this
    registered query projects the two
    moments DuckDB can recompute from first principles (bit-twiddling the
    BLOB), proving the Arrow round-trip didn't corrupt the payload."""
    feats = extract_media_features(media_table(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        F.element_at("features", 1).cast("bigint").alias("feat_len"),
        # empty payload → NULL mean (the oracle's list_sum([])/0 is NULL;
        # the stub vector's 0.0 placeholder would silently diverge)
        F.when(
            F.element_at("features", 1) > 0,
            F.round(F.element_at("features", 4), 4),
        ).alias("mean_byte"),
    )


FRAME_BYTES = 32
MAX_FRAMES = 4


@register(
    "x_media_frames",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 2
    ),
    p AS (
      SELECT media_id, text, n_bytes,
             greatest((n_bytes // {FRAME_BYTES}) // {MAX_FRAMES}, 1) AS stride
      FROM m
    )
    SELECT media_id, i AS frame_idx,
           CAST(i * stride * {FRAME_BYTES} AS BIGINT) AS frame_offset,
           md5(substring(text, i * stride * {FRAME_BYTES} + 1, {FRAME_BYTES}))
             AS frame_md5
    FROM p, unnest(generate_series(0, {MAX_FRAMES - 1})) AS t(i)
    WHERE i * stride * {FRAME_BYTES} + {FRAME_BYTES} <= n_bytes
    """,
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video media (E8 plumbing): pick up to MAX_FRAMES
    evenly-strided FRAME_BYTES windows of the payload — the byte-level
    shape of 'seek to k evenly spaced frames', with the codec stubbed as
    raw windowing.

    Runs as Arrow-batched mapInPandas exactly like a real extractor
    (frame loop per payload, vectorized batch iteration); emits
    (frame_idx, offset, md5) so the oracle can re-derive every sampled
    window.  The fixture payload is ASCII, so byte slices equal char
    slices and DuckDB's VARCHAR substring+md5 verifies the binary path;
    a real corpus keeps the same Spark code and swaps the oracle for a
    binary-capable engine.

    100 TB: zero shuffle — a narrow per-partition pass emitting ≤
    MAX_FRAMES rows per asset; payload bytes never leave the task."""
    import hashlib

    media = media_table(spark, sf_dir).filter(
        F.col("meta.media_type") == "video"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, digests = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                stride = max((n // FRAME_BYTES) // MAX_FRAMES, 1)
                for i in range(MAX_FRAMES):
                    off = i * stride * FRAME_BYTES
                    if off + FRAME_BYTES > n:
                        break
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    digests.append(
                        hashlib.md5(payload[off : off + FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_md5": digests,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        gen,
        "media_id bigint, frame_idx int, frame_offset bigint, frame_md5 string",
    )


@register(
    "x_media_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, text FROM documents
      UNION ALL
      SELECT doc_id + 20000000 AS media_id, text
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT md5(text) AS checksum,
           CAST(MIN(media_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT)      AS n_copies,
           CAST(MIN(length(text)) AS BIGINT) AS n_bytes
    FROM media
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
)
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup (the image-corpus first pass: identical BYTES,
    before any perceptual hashing): group on md5(payload), keep the min
    media_id.  Grouping on the 32-char checksum, not the BLOB, is the
    load-bearing choice — shuffle keys are 32 bytes instead of megabyte
    payloads, so reducer input stays tiny at any corpus size (the
    md5-key variant x_dedup_exact's docstring promises, realized here
    where payloads are genuinely opaque bytes).

    A deterministic re-keyed copy of every 13th row is unioned in so the
    result is non-vacuous at every SF (x_dedup_exact's fixture
    convention).  Near-dup (perceptual) media hashing plugs into the
    same plan with pHash-over-mapInPandas as the checksum."""
    media = media_table(spark, sf_dir).select("media_id", "payload")
    copies = media.filter(F.col("media_id") % 13 == 0).select(
        (F.col("media_id") + F.lit(20_000_000)).alias("media_id"), "payload"
    )
    return (
        media.unionByName(copies)
        .groupBy(F.md5("payload").alias("checksum"))
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.length("payload")).alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


_PHASH_BITS = 16


def _duck_phash_bytes() -> str:
    """Byte k of the payload via its hex rendering (portable across
    engines; DuckDB blob → hex(encode(text))), at 16 evenly-spaced
    sample positions."""
    byte = (
        "('0x' || substr(h, 2 * CAST(floor({k} * n / 16.0) AS BIGINT) + 1,"
        " 2))::BIGINT"
    )
    cols = ",\n             ".join(
        byte.format(k=k) + f" AS b{k}" for k in range(_PHASH_BITS)
    )
    return f"""
      SELECT media_id, n,
             {cols}
      FROM (
        SELECT doc_id AS media_id,
               hex(encode(text))   AS h,
               octet_length(encode(text)) AS n
        FROM documents
      )
    """


@register(
    "x_media_phash",
    oracle=f"""
    WITH sampled AS ({_duck_phash_bytes()}),
    sig AS (
      SELECT media_id, n,
             {" + ".join(f"b{k}" for k in range(_PHASH_BITS))} AS total,
             {" + ".join(
                 f"(CASE WHEN b{k} * {_PHASH_BITS} > "
                 f"({' + '.join(f'b{j}' for j in range(_PHASH_BITS))}) "
                 f"THEN {1 << k} ELSE 0 END)"
                 for k in range(_PHASH_BITS))} AS signature
      FROM sampled
    )
    SELECT media_id,
           CAST(n AS BIGINT)         AS n_bytes,
           CAST(signature AS BIGINT) AS signature,
           CAST(bit_count(CAST(signature AS BIGINT)) AS INT) AS popcount
    FROM sig
    """,
)
def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-style media SIGNATURE — the near-dup front end for
    opaque payloads (x_media_dedup handles identical bytes; this handles
    near-identical): sample 16 evenly-spaced payload bytes, set bit k
    when sampled byte k exceeds the sample mean (compared as exact
    integers b·16 > Σb — no float), and emit the 16-bit signature.
    Real image pHash replaces byte sampling with DCT-of-decoded-pixels
    in the mapInPandas decode stage (multimodal._decode_media's slot);
    the signature/bucketing plumbing downstream is IDENTICAL.

    Byte access is engine-portable via the payload's hex rendering —
    both engines index the same hex string, so the signature is
    hash-checkable.  Candidate pairs then come from signature-bucket
    equi-joins (the minhash band pattern) + bit_count(a XOR b) Hamming
    verification, never payload×payload.

    Plan: pure projection, zero shuffle; payload bytes never leave the
    scan."""
    media = media_table(spark, sf_dir).select("media_id", "payload")
    d = media.select(
        "media_id",
        F.hex("payload").alias("h"),
        F.length("payload").alias("n"),
    )
    bytes_ = [
        F.conv(
            F.col("h").substr(
                (2 * F.floor(F.lit(k) * F.col("n") / 16.0).cast("bigint") + 1)
                .cast("int"),
                F.lit(2),
            ),
            16,
            10,
        ).cast("bigint")
        for k in range(_PHASH_BITS)
    ]
    total = sum(bytes_[1:], bytes_[0])
    sig = None
    for k in range(_PHASH_BITS):
        bit = F.when(bytes_[k] * _PHASH_BITS > total, 1 << k).otherwise(0)
        sig = bit if sig is None else sig + bit
    return d.select(
        "media_id",
        F.col("n").cast("bigint").alias("n_bytes"),
        sig.cast("bigint").alias("signature"),
        F.bit_count(sig.cast("bigint")).alias("popcount"),
    )


# ---------------------------------------------------------------------------
# Hamming-space near-dup JOIN over perceptual signatures — the operator
# x_media_phash's docstring promises downstream ("signature-bucket
# equi-joins + bit_count(a XOR b) Hamming verification, never
# payload × payload"), now registered.
# ---------------------------------------------------------------------------

_NDP_BITS = 48  # widened signature: 48 sampled bytes -> 48-bit code
_NDP_BANDS = 2  # pigeonhole: radius r needs r+1 exact-match bands
_NDP_BAND_BITS = _NDP_BITS // _NDP_BANDS  # 24 bits -> 16.7M values/band
_NDP_RADIUS = _NDP_BANDS - 1  # Hamming <= 1


def _duck_ndp_sig() -> str:
    """48-bit signature CTE body: byte k (of 48 evenly-spaced samples)
    sets bit k when it exceeds the integer sample mean — the 16-bit
    x_media_phash construction at join width."""
    byte = (
        "('0x' || substr(h, 2 * CAST(floor({k} * n / 48.0) AS BIGINT) + 1,"
        " 2))::BIGINT"
    )
    bs = [byte.format(k=k) for k in range(_NDP_BITS)]
    total = " + ".join(f"b{k}" for k in range(_NDP_BITS))
    cases = " + ".join(
        f"(CASE WHEN b{k} * {_NDP_BITS} > ({total}) THEN {1 << k} "
        f"ELSE 0 END)"
        for k in range(_NDP_BITS)
    )
    cols = ",\n             ".join(f"{b} AS b{k}" for k, b in enumerate(bs))
    return f"""
      SELECT media_id, CAST({cases} AS BIGINT) AS s FROM (
        SELECT media_id, n,
             {cols}
        FROM (
          SELECT doc_id AS media_id,
                 hex(encode(text))   AS h,
                 octet_length(encode(text)) AS n
          FROM documents
        )
      )
    """


@register(
    "x_phash_near_dup",
    oracle=f"""
    WITH sig AS ({_duck_ndp_sig()}),
    bands AS (
      SELECT media_id,
             CAST(b.b AS INT) AS band,
             (s >> (CAST(b.b AS INT) * {_NDP_BAND_BITS}))
               & {(1 << _NDP_BAND_BITS) - 1} AS bv
      FROM sig, range(0, {_NDP_BANDS}) AS b(b)
    ),
    cand AS (
      SELECT a.band, a.media_id AS ida, b.media_id AS idb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id
    ),
    allc AS (SELECT DISTINCT ida, idb FROM cand),
    ver AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM allc c
      JOIN sig x ON x.media_id = c.ida
      JOIN sig y ON y.media_id = c.idb
      WHERE bit_count(xor(x.s, y.s)) <= {_NDP_RADIUS}
    ),
    bstat AS (
      SELECT band, CAST(COUNT(DISTINCT bv) AS BIGINT) AS n_buckets,
             CAST(MAX(cnt) AS BIGINT) AS max_bucket
      FROM (SELECT band, bv, COUNT(*) AS cnt FROM bands GROUP BY 1, 2)
      GROUP BY band
    ),
    bcand AS (
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY band
    )
    SELECT bstat.band, n_buckets, max_bucket,
           COALESCE(bcand.n_candidates, 0) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM allc) AS n_candidates_all,
           (SELECT n FROM ver) AS n_verified
    FROM bstat LEFT JOIN bcand ON bcand.band = bstat.band
    """,
)
def phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMMING-BALL NEAR-DUP JOIN over perceptual signatures — the
    image-dedup-at-scale pattern (pigeonhole blocking): a 48-bit
    payload signature split into {_NDP_BANDS} bands of {_NDP_BAND_BITS}
    bits; any pair within Hamming distance {_NDP_RADIUS} must agree
    EXACTLY on at least one band (pigeonhole over r+1 bands), so
    candidates come from per-band equi-joins and only candidates pay
    the bit_count(a XOR b) verification — never payload × payload.
    Output is the blocking-efficiency report per band (bucket counts,
    max bucket, candidate pairs) plus the distinct candidate union and
    the verified near-dup count — the table that says whether the
    operating point holds before anyone runs the full dedup.

    OPERATING POINT (the derived-width discipline of x_sim_lsh):
    {_NDP_BAND_BITS}-bit bands give 2^{_NDP_BAND_BITS} values per band,
    so expected candidates stay ~n²/2^{_NDP_BAND_BITS} per band —
    negligible up to ~16M media rows; beyond that, widen the signature
    (64 samples → 32-bit bands) rather than letting buckets deepen:
    band width is a function of corpus count, never a constant to tune
    by hand.  Radius {_NDP_RADIUS} with {_NDP_BANDS} bands is the
    tight-dup point (exact payload dups + 1-bit wobble); a radius-3
    deployment uses 4 bands of 16 from a 64-bit signature — same plan,
    different constants.

    Plan: signature is a pure projection (zero shuffle, payload bytes
    never leave the scan); bands explode ×{_NDP_BANDS}; the candidate
    join shuffles on (band, band_value) — bounded buckets by the width
    rule; verification joins the two signature columns back at
    candidate grain."""
    media = media_table(spark, sf_dir).select("media_id", "payload")
    d = media.select(
        "media_id",
        F.hex("payload").alias("h"),
        F.length("payload").alias("n"),
    )
    # ARRAY formulation, not 48 scalar columns: the scalar spelling
    # re-inlines the 48-term mean into every bit's CASE (48x48 codegen
    # subexpressions -> OOMs a 1g driver compiling the stage); the
    # transform/aggregate/zip_with tree stays linear in _NDP_BITS.
    ks = F.sequence(F.lit(0), F.lit(_NDP_BITS - 1))
    arr = F.transform(
        ks,
        lambda k: F.conv(
            F.col("h").substr(
                (
                    2 * F.floor(k * F.col("n") / float(_NDP_BITS))
                    .cast("bigint")
                    + 1
                ).cast("int"),
                F.lit(2),
            ),
            16,
            10,
        ).cast("bigint"),
    )
    d2 = d.select("media_id", arr.alias("bs"))
    total = F.aggregate(
        F.col("bs"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    d3 = d2.select("media_id", "bs", total.alias("total"))
    sig = F.aggregate(
        F.zip_with(
            F.col("bs"),
            ks,
            lambda b, k: F.when(
                b * _NDP_BITS > F.col("total"),
                F.pow(F.lit(2.0), k).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # the signature projection feeds bands (x2 join sides + bucket
    # stats) AND both verification sides — ~9 lazy re-executions of the
    # 48-sample build without a cut; the (media_id, s) frame is tiny, so
    # materialize it once (the x_knn_graph localCheckpoint rule)
    sigs = d3.select("media_id", sig.alias("s")).localCheckpoint(eager=True)

    mask = (1 << _NDP_BAND_BITS) - 1
    bands = sigs.select(
        "media_id",
        "s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("s"), b * _NDP_BAND_BITS)
                            .bitwiseAND(F.lit(mask))
                        ).alias("bv"),
                    )
                    for b in range(_NDP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "s", "bb.band", "bb.bv")

    a = bands.select(
        F.col("band").alias("c_band"),
        F.col("bv").alias("c_bv"),
        F.col("media_id").alias("ida"),
    )
    b = bands.select(
        F.col("band").alias("c_band"),
        F.col("bv").alias("c_bv"),
        F.col("media_id").alias("idb"),
    )
    cand = a.join(b, ["c_band", "c_bv"]).filter(F.col("ida") < F.col("idb"))
    allc = cand.select("ida", "idb").distinct()

    sx = sigs.select(F.col("media_id").alias("ida"), F.col("s").alias("sa"))
    sy = sigs.select(F.col("media_id").alias("idb"), F.col("s").alias("sb"))
    # 1-row global frames broadcast onto the 2-row per-band report —
    # keeps the whole query one lazy plan (no driver-side counts)
    ver1 = (
        allc.join(sx, "ida")
        .join(sy, "idb")
        .filter(
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= _NDP_RADIUS
        )
        .agg(F.count(F.lit(1)).alias("n_verified"))
    )
    all1 = allc.agg(F.count(F.lit(1)).alias("n_candidates_all"))

    bstat = (
        bands.groupBy("band", "bv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("band")
        .agg(
            F.countDistinct("bv").alias("n_buckets"),
            F.max("cnt").alias("max_bucket"),
        )
    )
    bcand = cand.groupBy(F.col("c_band").alias("band")).agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    z = F.lit(0).cast("bigint")
    return (
        bstat.join(bcand, "band", "left")
        .crossJoin(F.broadcast(all1))
        .crossJoin(F.broadcast(ver1))
        .select(
            "band",
            "n_buckets",
            F.col("max_bucket").cast("bigint").alias("max_bucket"),
            F.coalesce("n_candidates", z).alias("n_candidates"),
            "n_candidates_all",
            "n_verified",
        )
    )
