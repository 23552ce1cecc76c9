"""Multimodal inventory — m* entries, ALL hash-checked.

Binary blobs are outside SQL's reach for arbitrary media, but the
synthetic corpus payload is a closed formula
(``(i*31 + j*7) % 251`` — multimodal.synthetic_media), so every m*
oracle REGENERATES the bytes in SQL and recomputes the Python/Arrow
path's output independently — decode (m1/m4), frame sampling (m2) and
numpy feature extraction (m3) all get the full rows+schema+hash gate.
Full behavioral assertions live in tests/test_llmops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import (
    MediaIndex,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)

_N_MEDIA = 200  # the synthetic corpus every m-entry (and oracle) uses

_MINDEXES: dict[tuple[str, str], MediaIndex] = {}
_DECODED: dict[tuple[str, str], DataFrame] = {}
_FEATURES: dict[tuple[str, str], DataFrame] = {}


def media_index(spark: SparkSession, sf_dir: str) -> MediaIndex:
    """The per-(session, corpus) shared perceptual-dedup index — the
    media twin of ``inventory.textops.dedup_index`` (VERDICT r7 #1):
    the Arrow decode + aHash, the verified Hamming-pair set, and the
    component labels are built ONCE per SparkContext × corpus
    (checkpointed; ``MediaIndex.save/load`` is the cross-session
    form), and m6/m7/m9 each read their slice. The DuckDB oracles are
    unchanged — they recompute every substrate from the payload
    formula per query, independently checking the shared build."""
    key = (spark.sparkContext.applicationId, sf_dir)
    idx = _MINDEXES.get(key)
    if idx is None:
        idx = MediaIndex(synthetic_media(spark, _N_MEDIA))
        _MINDEXES[key] = idx
    return idx


def media_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared decode_media frame over the synthetic corpus —
    m1 and m4 both aggregate it; the Arrow decode runs once."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _DECODED.get(key)
    if df is None:
        df = decode_media(synthetic_media(spark, _N_MEDIA)).localCheckpoint()
        _DECODED[key] = df
    return df


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared extract_features(bins=16) frame — m3's summary
    and m5's histogram-embedding retrieval both read it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _FEATURES.get(key)
    if df is None:
        df = extract_features(
            synthetic_media(spark, _N_MEDIA), bins=16
        ).localCheckpoint()
        _FEATURES[key] = df
    return df


def m1_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode of 200 deterministic fake blobs → per-size
    feature aggregation. The group average is computed from exact
    per-blob byte SUMS (mean_byte × payload length reconstructs the
    integer sum), not avg-of-doubles — integer sums are summation-
    order independent, so the rounded result can't flip with
    partitioning (same hazard class as t13)."""
    decoded = media_decoded(spark, sf_dir)
    plen = F.col("width") * F.col("height") * F.col("channels")
    byte_sum = F.round(F.col("mean_byte") * plen).cast("long")
    return (
        decoded.withColumn("byte_sum", byte_sum)
        .groupBy("width", "height", "channels")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(
                F.sum("byte_sum").cast("double") / (F.count(F.lit(1)) * plen),
                6,
            ).alias("avg_mean_byte"),
        )
    )


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: blobs → every-2nd fixed-size frame →
    per-media frame counts."""
    media = synthetic_media(spark, 100, kind="video")
    frames = sample_frames(media, frame_bytes=64, every_n=2)
    return frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))


def m3_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (byte histogram + entropy via numpy over
    Arrow batches) → corpus feature summary. The bin-1 share is POOLED
    (Σ count / Σ bytes — one division over exact integer totals) so the
    rounded value is summation-order independent; entropy averages
    un-quantized irrationals, where boundary collisions can't occur."""
    feats = media_features(spark, sf_dir)
    bin1_count = F.round(F.element_at("hist", 1) * F.col("n_bytes")).cast("long")
    return feats.withColumn("bin1_count", bin1_count).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg("byte_entropy"), 6).alias("avg_entropy"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.round(
            F.sum("bin1_count").cast("double") / F.sum("n_bytes"), 6
        ).alias("hist_bin1_share"),
    )


def m4_decode_vs_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-blob decoded features, hash-checked against a DuckDB oracle
    that regenerates the synthetic payload formula in SQL — the one
    media entry with a full rows+schema+hash gate (blobs themselves
    never leave Spark; only the decode RESULT is compared)."""
    decoded = media_decoded(spark, sf_dir)
    return decoded.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.round("mean_byte", 6).alias("mean_byte"),
    )


M4_SQL = """
WITH m AS (
  SELECT i AS media_id, 16 + (i % 8) AS width, 12 + (i % 5) AS height, 3 AS channels
  FROM (SELECT unnest(generate_series(0, 199)) AS i)
)
SELECT m.media_id, m.width, m.height, m.channels,
       round(avg(((m.media_id * 31 + j.j * 7) % 251)::DOUBLE), 6) AS mean_byte
FROM m, unnest(generate_series(0, m.width * m.height * m.channels - 1)) AS j(j)
GROUP BY m.media_id, m.width, m.height, m.channels
"""


# Shared oracle CTE: the synthetic media headers (w, h, c per id).
def _m_cte(n: int) -> str:
    return f"""
m AS (
  SELECT i AS media_id, 16 + (i % 8) AS width, 12 + (i % 5) AS height, 3 AS channels
  FROM (SELECT unnest(generate_series(0, {n - 1})) AS i)
)
"""


M1_SQL = f"""
WITH {_m_cte(200)},
decoded AS (
  SELECT m.media_id, m.width, m.height, m.channels,
         sum((m.media_id * 31 + j.j * 7) % 251)::BIGINT AS byte_sum
  FROM m, unnest(generate_series(0, m.width * m.height * m.channels - 1)) AS j(j)
  GROUP BY m.media_id, m.width, m.height, m.channels
)
SELECT width, height, channels, count(*) AS n_media,
       round(sum(byte_sum)::DOUBLE / (count(*) * width * height * channels), 6)
         AS avg_mean_byte
FROM decoded GROUP BY width, height, channels
"""

M2_SQL = """
WITH m AS (
  SELECT i AS media_id,
         (16 + (i % 8)) * (12 + (i % 5)) * 3 AS plen
  FROM (SELECT unnest(generate_series(0, 99)) AS i)
)
SELECT media_id, ((plen // 64) + 1) // 2 AS n_frames
FROM m
"""

M3_SQL = f"""
WITH {_m_cte(200)},
bytes AS (
  SELECT m.media_id,
         ((m.media_id * 31 + j.j * 7) % 251) // 16 AS bin,
         m.width * m.height * m.channels AS n
  FROM m, unnest(generate_series(0, m.width * m.height * m.channels - 1)) AS j(j)
),
binc AS (
  SELECT media_id, bin, count(*) AS c, any_value(n) AS n
  FROM bytes GROUP BY media_id, bin
),
per_media AS (
  SELECT media_id,
         -sum((c::DOUBLE / n) * log2(c::DOUBLE / n)) AS entropy,
         any_value(n) AS n_bytes,
         sum(CASE WHEN bin = 0 THEN c ELSE 0 END)::BIGINT AS bin1_count
  FROM binc GROUP BY media_id
)
SELECT count(*) AS n_media,
       round(avg(entropy), 6) AS avg_entropy,
       round(avg(n_bytes), 6) AS avg_bytes,
       round(sum(bin1_count)::DOUBLE / sum(n_bytes), 6) AS hist_bin1_share
FROM per_media
"""


def m5_media_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal composition — media similarity retrieval: blobs →
    Arrow-batched histogram features (extract_features) → the 16-bin
    histogram used as an embedding → exact cosine top-3 per probe
    (vectorops.knn_bruteforce, probes = media_id < 5). This is the
    image-dedup/retrieval topology of a multimodal training pipeline
    with the codec stubbed: feature extraction and the ANN join are
    real; only pixel decoding is fake. The oracle regenerates the
    histograms from the payload formula and recomputes the same
    normalized dot products."""
    from .. import vectorops as V

    emb = media_features(spark, sf_dir).select("media_id", "hist")
    probes = emb.filter(F.col("media_id") < 5)
    return V.knn_bruteforce(emb, probes, 3, id_col="media_id", vec_col="hist")


_HIST_ENTRIES = ", ".join(
    f"sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END)::DOUBLE / any_value(n)"
    for b in range(16)
)

M5_SQL = f"""
WITH {_m_cte(200)},
bytes AS (
  SELECT m.media_id,
         ((m.media_id * 31 + j.j * 7) % 251) // 16 AS bin,
         m.width * m.height * m.channels AS n
  FROM m, unnest(generate_series(0, m.width * m.height * m.channels - 1)) AS j(j)
),
hist AS (
  SELECT media_id, [{_HIST_ENTRIES}] AS h
  FROM bytes GROUP BY media_id
),
e AS (
  SELECT media_id,
         list_transform(h, x -> x / sqrt(list_dot_product(h, h))) AS v
  FROM hist
),
er AS (
  SELECT media_id, h AS nv, sqrt(list_dot_product(h, h)) AS nn FROM hist
),
scored AS (
  SELECT p.media_id AS probe_id, c.media_id AS neighbor_id,
         round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
  FROM e p JOIN er c ON p.media_id < 5 AND c.media_id != p.media_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
"""


def m6_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) dedup buckets over 200 decoded blobs —
    the image near-dup primitive: per-blob 64-bit average hash
    computed all-integer inside the Arrow batch (multimodal._ahash:
    gray = channel sum, 8×8 block grid by y*8//h, bit = cross-
    multiplied mean compare — no float, so the DuckDB oracle
    regenerates the identical bits from the payload formula), then
    one groupBy on the 64-char hash. Blobs never shuffle; only
    (media_id, hash) does. → (phash, n_media, canonical_id)."""
    ph = media_index(spark, sf_dir).phash
    return ph.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.min("media_id").alias("canonical_id"),
    )


# shared CTE chain: regenerate every blob's 64-bit aHash from the
# synthetic payload formula (see m6 docstring for the bit definition)
_PHASH_CTES = """
WITH dims AS (
  SELECT i, 16 + (i % 8) AS w, 12 + (i % 5) AS h
  FROM unnest(generate_series(0, 199)) t(i)
),
px AS (
  SELECT i, w, h, y, x,
         ((i * 31 + ((y * w + x) * 3 + 0) * 7) % 251)
       + ((i * 31 + ((y * w + x) * 3 + 1) * 7) % 251)
       + ((i * 31 + ((y * w + x) * 3 + 2) * 7) % 251) AS gray,
         (y * 8) // h AS r, (x * 8) // w AS cb
  FROM dims,
       unnest(generate_series(0, h - 1)) ty(y),
       unnest(generate_series(0, w - 1)) tx(x)
),
tot AS (SELECT i, sum(gray) AS t_sum, count(*) AS n_px FROM px GROUP BY i),
blocks AS (
  SELECT i, r, cb, sum(gray) AS s_blk, count(*) AS n_blk
  FROM px GROUP BY i, r, cb
),
bits AS (
  SELECT b.i,
         string_agg(CASE WHEN b.s_blk * t.n_px > t.t_sum * b.n_blk
                         THEN '1' ELSE '0' END, '' ORDER BY b.r, b.cb) AS phash
  FROM blocks b JOIN tot t ON t.i = b.i
  GROUP BY b.i
)
"""

M6_SQL = _PHASH_CTES + """
SELECT phash, count(*)::BIGINT AS n_media, min(i)::BIGINT AS canonical_id
FROM bits GROUP BY phash
"""


def m7_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-MISS perceptual dedup pairs (the claim m6 banks on, made
    real): 4-band bit-sampling LSH over the 64-bit hashes — by
    pigeonhole, any pair within Hamming ≤ 3 has at least one
    error-free 16-bit quarter, so exact quarter match is a
    GUARANTEED-recall candidate index at that radius — then exact
    Hamming verification over candidates only (bit_count(xor) over
    the bit string's 32-bit halves — codegen arithmetic; DuckDB
    verifies with its native hamming(), same values). The image twin of v6's
    embedding Hamming prefilter: |media|×4 band rows shuffle, never
    the all-pairs product. Served from the session-shared
    :func:`media_index` (multimodal.MediaIndex) — the mining plan
    (band dedup on ids only, hash re-join for verification) lives in
    ``MediaIndex.pairs``; the oracle below keeps recomputing it from
    the payload formula. → (id_a, id_b, hamming)."""
    return media_index(spark, sf_dir).pairs.select("id_a", "id_b", "hamming")


M7_SQL = _PHASH_CTES + """
, bands AS (
  SELECT i, phash, b, substring(phash, 1 + 16 * b, 16) AS key
  FROM bits, unnest([0, 1, 2, 3]) t(b)
),
cand AS (
  SELECT DISTINCT a.i AS id_a, b.i AS id_b, a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.i < b.i
)
SELECT id_a, id_b, hamming(pa, pb)::BIGINT AS hamming
FROM cand WHERE hamming(pa, pb) <= 3
"""


def m8_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY dedup — the t1 of the blob world: group media by
    md5 over the raw container bytes (one hash-groupBy; blobs never
    shuffle more than their 16-byte digest after the local hash) over
    a corpus with 30 planted byte-identical duplicates. The oracle
    cannot md5 bytes it doesn't have, so it groups by a reconstructed
    content signature instead — content-equality grouping is the same
    partition as digest grouping (the formula payload is
    collision-free: ·31 is invertible mod 251).
    → (canonical_id, n_copies) for groups > 1."""
    media = synthetic_media(spark, 200)
    dups = synthetic_media(spark, 30).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    corpus = media.unionByName(dups)
    return (
        corpus.groupBy(F.md5("data").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("canonical_id"),
        )
        .filter(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


M8_SQL = """
WITH all_rows AS (
  SELECT i, i AS media_id FROM (SELECT unnest(generate_series(0, 199)) AS i)
  UNION ALL
  SELECT i, i + 1000 FROM (SELECT unnest(generate_series(0, 29)) AS i)
),
hdr AS (
  SELECT *, 16 + (i % 8) AS w, 12 + (i % 5) AS h, 3 AS c FROM all_rows
),
content AS (
  SELECT a.media_id,
         a.w::VARCHAR || 'x' || a.h || 'x' || a.c || ':' ||
         string_agg(((a.i * 31 + j.j * 7) % 251)::VARCHAR, ',' ORDER BY j.j) AS sig
  FROM hdr a, unnest(generate_series(0, a.w * a.h * a.c - 1)) AS j(j)
  GROUP BY a.media_id, a.w, a.h, a.c, a.i
)
SELECT min(media_id) AS canonical_id, count(*)::BIGINT AS n_copies
FROM content GROUP BY sig HAVING count(*) > 1
"""


def m9_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dedup CLUSTERS — the media twin of t10/v9, closing
    the image dedup pipeline: connected components over the m7
    near-miss pair set (4-band guaranteed-recall LSH + exact Hamming
    verify) → cluster label and size. After mining, a curation
    pipeline keeps one image per cluster; the component edge list is
    |pairs| ≪ |media|², and the propagation is the same O(log d)
    checkpointed pointer-jumping loop as the text/vector paths.
    Served from the session-shared :func:`media_index` — warm runs
    are one groupBy over the checkpointed labels (VERDICT r7 #1).
    → (cluster, n_media)."""
    lab = media_index(spark, sf_dir).clusters
    return lab.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_media"))


M9_SQL = _PHASH_CTES.replace("WITH dims", "WITH RECURSIVE dims") + """
, bands AS (
  SELECT i, phash, b, substring(phash, 1 + 16 * b, 16) AS key
  FROM bits, unnest([0, 1, 2, 3]) t(b)
),
cand AS (
  SELECT DISTINCT a.i AS id_a, b.i AS id_b, a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.i < b.i
),
pr AS (SELECT id_a, id_b FROM cand WHERE hamming(pa, pb) <= 3),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pr
  UNION
  SELECT id_b, id_a FROM pr
),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
)
SELECT cluster, count(*)::BIGINT AS n_media FROM (
  SELECT u, min(lbl) AS cluster FROM reach GROUP BY u
) c GROUP BY cluster
"""


def m10_incremental_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental perceptual-dedup maintenance
    (multimodal.MediaIndex.update) — the media member of the
    daily-delta gate family (t34 text index, v16 vector index, t38
    substring index): build the index over a BASE media slice
    (media_id % 4 != 3), FORCE the cluster labels (so the update must
    exercise the seeded star-edge relabel path, not a lazy rebuild
    from merged pairs), then absorb the held-out delta with the
    mining params frozen — only the delta is decoded/hashed; new
    candidates come from the delta's bands against the merged band
    view; verification reads stored hashes (never old media bytes);
    labels re-propagate from the old labels as star edges. The
    oracle recomputes the BATCH clusters over all 200 blobs from the
    payload formula — a direct hash gate on `update == rebuild`.
    → (cluster, n_media)."""
    media = synthetic_media(spark, _N_MEDIA)
    base = media.filter(F.col("media_id") % 4 != 3)
    delta = media.filter(F.col("media_id") % 4 == 3)
    idx = MediaIndex(base)
    idx.clusters  # force the base labels: the update must relabel, not rebuild
    idx.update(delta)
    return idx.clusters.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_media"))


# identical batch recomputation over the full corpus: equality with
# the Spark side proves the incremental path reproduced the rebuild
M10_SQL = M9_SQL


def m12_media_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-index DELETION (``MediaIndex.retract``, round 9) —
    the media member of the retraction family (v19 vectors, t41 LM,
    t42 substrings, t43 near-dup text): build a fresh index over the
    synthetic corpus, retract the media_id % 7 == 3 slice (NO media
    bytes touched — the phash stage is content-complete for deletion
    exactly as it is for updates), and summarize the post-retraction
    clusters. Monotone stages filter by broadcast anti-join; the
    cluster stage re-runs components over the affected clusters'
    surviving pairs (a retracted bridge image splits its cluster). The
    oracle recomputes phash → bands → verified pairs → recursive-CTE
    components over the SURVIVING corpus — a direct hash gate on
    retract == rebuild. Builds its own index (retract mutates; the
    session-shared substrate must stay pristine for m6/m7/m9/m10).
    → (cluster, n_media)."""
    media = synthetic_media(spark, _N_MEDIA)
    idx = MediaIndex(media)
    idx.clusters  # force, so retract exercises the relabel path
    idx.retract(
        media.filter(F.col("media_id") % 7 == 3).select(
            F.col("media_id").alias("id")
        )
    )
    return idx.clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_media")
    )


# M9's pipeline with the surviving-corpus filter applied where the
# banded corpus enters (training-free — every stage is per-item or
# pairwise, so the filter placement is exact)
M12_SQL = M9_SQL.replace(
    "FROM bits, unnest([0, 1, 2, 3]) t(b)",
    "FROM bits, unnest([0, 1, 2, 3]) t(b)\n  WHERE i % 7 != 3",
)
assert M12_SQL != M9_SQL  # the anchor must keep matching


def m11_phash_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media skew cap (multimodal.MediaIndex(max_band_size=...)),
    oracle-gated: nine byte-identical blobs (blob 0 plus eight planted
    copies at ids 1000-1007) collide in every band, so with cap=4
    every group containing them is over-cap and yields NOTHING — the
    hot-group admission rule measured in SCALE.md ("Media index under
    structured skew") — while all benign groups (≤ 4 members) still
    yield ALL their pairs. The oracle recomputes the capped definition
    independently: hashes from the payload formula, band groups with
    HAVING count ≤ cap, pairs admitted iff they co-occur in at least
    one under-cap group, exact-Hamming verified. → (id_a, id_b,
    hamming)."""
    dups = synthetic_media(spark, 1).select(
        F.explode(
            F.array(*[F.lit(1000 + d).cast("long") for d in range(8)])
        ).alias("media_id"),
        "kind",
        "data",
        "meta",
    )
    corpus = synthetic_media(spark, _N_MEDIA).unionByName(dups)
    return MediaIndex(corpus, max_band_size=4).pairs


M11_SQL = """
WITH members AS (
  SELECT i, i AS gen FROM unnest(generate_series(0, 199)) t(i)
  UNION ALL
  SELECT 1000 + d, 0 FROM unnest(generate_series(0, 7)) t(d)
),
dims AS (
  SELECT i, gen, 16 + (gen % 8) AS w, 12 + (gen % 5) AS h FROM members
),
px AS (
  SELECT i, w, h, y, x,
         ((gen * 31 + ((y * w + x) * 3 + 0) * 7) % 251)
       + ((gen * 31 + ((y * w + x) * 3 + 1) * 7) % 251)
       + ((gen * 31 + ((y * w + x) * 3 + 2) * 7) % 251) AS gray,
         (y * 8) // h AS r, (x * 8) // w AS cb
  FROM dims,
       unnest(generate_series(0, h - 1)) ty(y),
       unnest(generate_series(0, w - 1)) tx(x)
),
tot AS (SELECT i, sum(gray) AS t_sum, count(*) AS n_px FROM px GROUP BY i),
blocks AS (
  SELECT i, r, cb, sum(gray) AS s_blk, count(*) AS n_blk
  FROM px GROUP BY i, r, cb
),
bits AS (
  SELECT b.i,
         string_agg(CASE WHEN b.s_blk * t.n_px > t.t_sum * b.n_blk
                         THEN '1' ELSE '0' END, '' ORDER BY b.r, b.cb) AS phash
  FROM blocks b JOIN tot t ON t.i = b.i
  GROUP BY b.i
),
bands AS (
  SELECT i, phash, b, substring(phash, 1 + 16 * b, 16) AS key
  FROM bits, unnest([0, 1, 2, 3]) t(b)
),
kept AS (
  SELECT b, key FROM bands GROUP BY b, key HAVING count(*) <= 4
),
cand AS (
  SELECT DISTINCT a.i AS id_a, b.i AS id_b, a.phash AS pa, b.phash AS pb
  FROM bands a
  JOIN kept k ON k.b = a.b AND k.key = a.key
  JOIN bands b ON a.b = b.b AND a.key = b.key AND a.i < b.i
)
SELECT id_a, id_b, hamming(pa, pb)::BIGINT AS hamming
FROM cand WHERE hamming(pa, pb) <= 3
"""


QUERIES = {
    "m1_media_decode": m1_media_decode,
    "m2_frame_sample": m2_frame_sample,
    "m3_media_features": m3_media_features,
    "m4_decode_vs_formula": m4_decode_vs_formula,
    "m5_media_knn": m5_media_knn,
    "m6_phash_buckets": m6_phash_buckets,
    "m7_phash_neardup": m7_phash_neardup,
    "m8_media_exact_dedup": m8_media_exact_dedup,
    "m9_phash_clusters": m9_phash_clusters,
    "m10_incremental_phash_clusters": m10_incremental_phash_clusters,
    "m11_phash_neardup_capped": m11_phash_neardup_capped,
    "m12_media_retraction": m12_media_retraction,
}

ORACLES: dict[str, str] = {
    "m1_media_decode": M1_SQL,
    "m2_frame_sample": M2_SQL,
    "m3_media_features": M3_SQL,
    "m4_decode_vs_formula": M4_SQL,
    "m5_media_knn": M5_SQL,
    "m6_phash_buckets": M6_SQL,
    "m7_phash_neardup": M7_SQL,
    "m8_media_exact_dedup": M8_SQL,
    "m9_phash_clusters": M9_SQL,
    "m10_incremental_phash_clusters": M10_SQL,
    "m11_phash_neardup_capped": M11_SQL,
    "m12_media_retraction": M12_SQL,
}
