"""Similarity-search inventory — v* entries over ``embeddings``.

The DuckDB oracle recomputes cosine with the same left-to-right double
fold (``list_dot_product`` over ``DOUBLE[]`` casts), so scores match to
the 6-decimal rounding used for ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vectorops as V
from ..textops import connected_components
from ..tables import load_table

_K = 3
_PROBE_LIMIT = 10  # vec_id < 10 are the probe set
_BITS = 3


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def v1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 per probe (probes = vec_id < 10), the ANN
    baseline/verifier."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_bruteforce(emb, probes, _K)


_NORM_E = """
  SELECT vec_id,
    list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS v
  FROM embeddings
"""

_RAW_NN = """
  SELECT vec_id, embedding::DOUBLE[] AS nv,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
  FROM embeddings
"""

# Shared scored-pair fragments over CTEs named e (normalized probes,
# optionally with bucket) and er (raw corpus + norm): ONE copy each of
# the exact and bucket-restricted scoring joins and of the per-probe
# ranking — composed by V1/V2 AND by V8, so the recall eval always
# measures exactly the definitions v1/v2 ship.
_SCORED_EXACT_SQL = f"""SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
  FROM e p JOIN er c ON p.vec_id < {_PROBE_LIMIT} AND c.vec_id != p.vec_id"""

_SCORED_BUCKET_SQL = f"""SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
  FROM e p JOIN er c ON p.bucket = c.bucket
  WHERE p.vec_id < {_PROBE_LIMIT} AND c.vec_id != p.vec_id"""

_RANKED_SQL = """SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored"""


def _topk_ids(scored_sql: str) -> str:
    """Rank a scored fragment and keep the top-k (probe, neighbor) ids."""
    return f"""SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM ({scored_sql}) s
  ) r WHERE rank <= {_K}"""


V1_SQL = f"""
WITH e AS ({_NORM_E}),
er AS ({_RAW_NN}),
scored AS (
  {_SCORED_EXACT_SQL}
),
ranked AS (
  {_RANKED_SQL}
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""

def v2_knn_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: sign bits of the first 3 dims partition
    the corpus into 8 buckets; probes search only their bucket."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_bucketed(emb, probes, _K, bits=_BITS)


_NORM_BUCKET_E = """
  SELECT vec_id,
    list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS v,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
"""

_RAW_E = """
  SELECT vec_id, embedding::DOUBLE[] AS nv,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
"""

V2_SQL = f"""
WITH e AS ({_NORM_BUCKET_E}),
er AS ({_RAW_E}),
scored AS (
  {_SCORED_BUCKET_SQL}
),
ranked AS (
  {_RANKED_SQL}
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""

def v3_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + member count (cluster sanity check for
    the embedding space)."""
    return V.label_centroids(_emb(spark, sf_dir))


V3_SQL = """
WITH dims AS (
  SELECT label, g.i - 1 AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
per_dim AS (
  SELECT label, dim, avg(v) AS c FROM dims GROUP BY label, dim
),
norms AS (
  SELECT label, round(sqrt(sum(c * c)), 6) AS centroid_norm FROM per_dim GROUP BY label
)
SELECT e.label, count(*) AS n_vectors, any_value(n.centroid_norm) AS centroid_norm
FROM embeddings e JOIN norms n ON e.label = n.label
GROUP BY e.label
"""


def v4_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: per-label centroids, nearest-centroid reassignment,
    probe searches its coarse list only (nprobe=1)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_ivf(emb, probes, _K)


V4_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, g.i - 1 AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
cent_norm AS (SELECT seed, sum(c * c) AS c2 FROM cent GROUP BY seed),
scored0 AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN cent ct ON ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
assign AS (
  SELECT id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM scored0
  ) t WHERE rn = 1
),
e AS ({_NORM_E}),
er AS ({_RAW_E}),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
  FROM e p
  JOIN assign pa ON pa.id = p.vec_id
  JOIN assign ca ON ca.bucket = pa.bucket
  JOIN er c ON c.vec_id = ca.id AND c.vec_id != p.vec_id
  WHERE p.vec_id < {_PROBE_LIMIT}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


def v7_knn_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-list probing (nprobe=2): each probe searches
    its two nearest coarse lists — the recall/cost knob beyond v4's
    nprobe=1."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_ivf(emb, probes, _K, nprobe=2)


V7_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, g.i - 1 AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
cent_norm AS (SELECT seed, sum(c * c) AS c2 FROM cent GROUP BY seed),
scored0 AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN cent ct ON ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
ranked0 AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
  FROM scored0
),
assign AS (SELECT id, bucket FROM ranked0 WHERE rn = 1),
probe_assign AS (SELECT id, bucket FROM ranked0 WHERE rn <= 2),
e AS ({_NORM_E}),
er AS ({_RAW_E}),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
  FROM e p
  JOIN probe_assign pa ON pa.id = p.vec_id
  JOIN assign ca ON ca.bucket = pa.bucket
  JOIN er c ON c.vec_id = ca.id AND c.vec_id != p.vec_id
  WHERE p.vec_id < {_PROBE_LIMIT}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


_NEARDUP_CACHE: dict[tuple[str, str], dict[str, DataFrame | None]] = {}


def _neardup_index(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame | None]:
    """Vector twin of ``inventory.textops.dedup_index``: the scored
    near-dup pair set (v5) and its connected-component labels (v9) are
    built once per SparkContext × corpus and checkpointed; every
    consumer reads the pinned frames. Keyed by applicationId so a
    restarted context never sees stale checkpoint blocks."""
    key = (spark.sparkContext.applicationId, sf_dir)
    entry = _NEARDUP_CACHE.get(key)
    if entry is None:
        entry = {"pairs": None, "clusters": None}
        _NEARDUP_CACHE[key] = entry
    return entry


def v5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (the dedup family's vector
    member): ordered pairs above a cosine threshold, restricted to
    sign-buckets so the corpus cross-product never forms — the same
    candidates-only discipline as the MinHash-LSH text path. The
    scored pair set is built once per session (checkpointed) and
    shared with v9's clustering."""
    idx = _neardup_index(spark, sf_dir)
    if idx["pairs"] is not None:
        return idx["pairs"]
    emb = _emb(spark, sf_dir)
    # raw vector + ONE scalar norm fold per row — a normalized-array
    # projection (interpreted HOF) costs as much again as the norm
    # fold and doubles the exchange payload; per pair the cosine is
    # one dot fold + one multiply + divide
    side = emb.select(
        "vec_id",
        F.col("embedding").alias("vec"),
        V.norm(F.col("embedding")).alias("nn"),
        V.sign_bucket(F.col("embedding"), _BITS).alias("bucket"),
    )
    # Spread the streamed side across all cores: the embeddings table
    # arrives as few parquet splits, and the per-pair dot fold is the
    # dominant cost — without this the scoring join runs in as many
    # tasks as there are input splits (1 at bench scale).
    par = spark.sparkContext.defaultParallelism
    a = side.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nn").alias("nn_a"), "bucket").repartition(par)
    b = side.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nn").alias("nn_b"), "bucket")
    pairs = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b",
        F.round(
            V.dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nn_a") * F.col("nn_b")), 6
        ).alias("cos"),
    )
    # threshold applies to the ROUNDED score (the published value), so
    # the oracle's boundary behavior is identical
    idx["pairs"] = scored.filter(F.col("cos") >= 0.4).localCheckpoint()
    return idx["pairs"]


V5_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS nv,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.nv, b.nv) / (a.nn * b.nn), 6) AS cos
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.nv, b.nv) / (a.nn * b.nn), 6) >= 0.4
"""


def v6_hamming_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-compressed near-dup prefilter: 64 sign bits per vector
    (8 bytes), bucket-restricted pairs kept when Hamming ≤ 20 —
    XOR+popcount per pair instead of a dot fold, the cheap first pass
    before exact cosine verification. → (id_a, id_b, hamming)."""
    emb = _emb(spark, sf_dir)
    lo, hi = V.pack_sign_bits(F.col("embedding"), 64)
    side = emb.select(
        "vec_id", lo.alias("lo"), hi.alias("hi"),
        V.sign_bucket(F.col("embedding"), _BITS).alias("bucket"),
    )
    par = spark.sparkContext.defaultParallelism
    a = side.select(F.col("vec_id").alias("id_a"), F.col("lo").alias("lo_a"),
                    F.col("hi").alias("hi_a"), "bucket").repartition(par)
    b = side.select(F.col("vec_id").alias("id_b"), F.col("lo").alias("lo_b"),
                    F.col("hi").alias("hi_b"), "bucket")
    pairs = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b",
        V.hamming(F.col("lo_a"), F.col("hi_a"), F.col("lo_b"), F.col("hi_b")).alias("hamming"),
    )
    return out.filter(F.col("hamming") <= 20)


_PACK_LO = " + ".join(
    f"CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(32)
)
_PACK_HI = " + ".join(
    f"CASE WHEN embedding[{i + 1}] > 0 THEN {1 << (i - 32)}::BIGINT ELSE 0 END"
    for i in range(32, 64)
)

V6_SQL = f"""
WITH e AS (
  SELECT vec_id,
    ({_PACK_LO}) AS lo,
    ({_PACK_HI}) AS hi,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::BIGINT AS hamming
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 20
"""


def v8_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the bucketed ANN (v2) against the exact baseline
    (v1) — the self-evaluation every ANN deployment needs before
    trusting its recall knob. Per probe: |approx ∩ exact| / k, probes
    with zero overlap included at 0.0. Joins two already-top-k sets
    (k rows per probe each side) — negligible data movement.
    → (probe_id, recall_at_k)."""
    exact = v1_knn_bruteforce(spark, sf_dir).select("probe_id", "neighbor_id")
    approx = (
        v2_knn_bucketed(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    joined = exact.join(approx, ["probe_id", "neighbor_id"], "left")
    return joined.groupBy("probe_id").agg(
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / F.lit(_K), 6
        ).alias("recall_at_k")
    )


V8_SQL = f"""
WITH e AS ({_NORM_BUCKET_E}),
er AS ({_RAW_E}),
exact AS (
  {_topk_ids(_SCORED_EXACT_SQL)}
),
approx AS (
  {_topk_ids(_SCORED_BUCKET_SQL)}
)
SELECT ex.probe_id,
       round(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / {_K}, 6)
         AS recall_at_k
FROM exact ex
LEFT JOIN approx ap
  ON ap.probe_id = ex.probe_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.probe_id
"""

def v9_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup clusters: connected components over the
    embedding-cosine near-dup pairs (v5's edge set) → cluster sizes.
    The vector twin of t10 — after near-dup mining, keep one item per
    cluster. Same O(log d) pointer-jumping propagation, checkpointed
    lineage, one action per round (textops.connected_components).
    → (cluster, n_vecs). Pairs and labels come from the shared
    per-session index (``_neardup_index``) — the v5 mining never
    re-runs here."""
    idx = _neardup_index(spark, sf_dir)
    if idx["clusters"] is None:
        pairs = v5_embedding_neardup(spark, sf_dir).select("id_a", "id_b")
        idx["clusters"] = connected_components(pairs)
    return idx["clusters"].groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))


V9_SQL = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS nv,
    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
     + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings
),
pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.nv, b.nv) / (a.nn * b.nn), 6) >= 0.4
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pr
  UNION
  SELECT id_b, id_a FROM pr
),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT ed.u, r.lbl FROM edges ed JOIN reach r ON r.u = ed.v
)
SELECT cluster, count(*)::BIGINT AS n_vecs FROM (
  SELECT u, min(lbl) AS cluster FROM reach GROUP BY u
) c GROUP BY cluster
"""


def v10_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration over the IVF coarse lists: seed centroids
    from the label groups, reassign, recompute centroids from the
    ASSIGNED lists, reassign again — so the final partitioning depends
    on the labels only as an initialization (the v4 centroids stop
    being label-tied). Output: per refined list, member count and mean
    squared distance to its centroid (the k-means objective per list).
    avg_dist2 is derived from exact scaled-integer sums of the
    6-rounded distances, so partition summation order cannot move the
    last digit. → (bucket, n_vectors, avg_dist2)."""
    emb = _emb(spark, sf_dir)
    a = V.kmeans_refine(emb, n_iter=1)
    n = F.count(F.lit(1))
    return a.groupBy("bucket").agg(
        n.alias("n_vectors"),
        F.round(
            F.sum(F.round(F.col("dist2") * 1e6).cast("bigint")).cast("double")
            / (n * 1e6),
            6,
        ).alias("avg_dist2"),
    )


V10_SQL = """
WITH dims AS (
  SELECT vec_id AS id, label AS seed, g.i - 1 AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
cent_norm AS (SELECT seed, sum(c * c) AS c2 FROM cent GROUP BY seed),
scored0 AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN cent ct ON ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
assign0 AS (
  SELECT id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM scored0
  ) t WHERE rn = 1
),
cent2 AS (
  SELECT a.bucket AS seed, d.dim, avg(d.v) AS c
  FROM dims d JOIN assign0 a ON a.id = d.id
  GROUP BY a.bucket, d.dim
),
cent2_norm AS (SELECT seed, sum(c * c) AS c2 FROM cent2 GROUP BY seed),
scored1 AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN cent2 ct ON ct.dim = d.dim
  JOIN cent2_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
assign1 AS (
  SELECT id, bucket, dist2 FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM scored1
  ) t WHERE rn = 1
)
SELECT bucket, count(*) AS n_vectors,
       round(sum(round(dist2 * 1000000)::BIGINT)::DOUBLE / (count(*) * 1000000), 6)
         AS avg_dist2
FROM assign1 GROUP BY bucket
"""


def v11_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    4 subspaces × 16 dims, per-label subvector means as codebooks,
    corpus encoded as 4 small codes per vector, probes answered by
    summing 4 broadcast-LUT lookups — raw corpus vectors never move at
    query time (~64× less scan-side data than brute force). The ADC
    sum adds exact scaled integers so partition order cannot flip a
    rank."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_pq(emb, probes, _K, m=4, dims=64)


V11_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, (g.i - 1) AS dim,
         ((g.i - 1) // 16) AS sub, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, sub, dim, avg(v) AS c FROM dims GROUP BY seed, sub, dim),
cent_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent GROUP BY seed, sub),
enc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
codes AS (
  SELECT id AS neighbor_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc
  ) t WHERE rn = 1
),
lut AS (
  SELECT id AS probe_id, sub, code, d2 AS pd2 FROM enc WHERE id < {_PROBE_LIMIT}
),
adc AS (
  SELECT l.probe_id, c.neighbor_id,
         sum(round(l.pd2 * 1000000)::BIGINT)::DOUBLE / 1000000 AS adist2
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
  WHERE l.probe_id != c.neighbor_id
  GROUP BY l.probe_id, c.neighbor_id
)
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
"""


def v12_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the production ANN shape: nprobe=2 coarse lists bound
    WHICH vectors are scored, 4×16 PQ codes + broadcast LUT bound
    WHAT is read per scored vector — candidate volume and scan
    payload shrink multiplicatively."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_ivf_pq(emb, probes, _K, m=4, dims=64, nprobe=2)


V12_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, (g.i - 1) AS dim,
         ((g.i - 1) // 16) AS sub, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
icent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
icent_norm AS (SELECT seed, sum(c * c) AS c2 FROM icent GROUP BY seed),
iscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN icent ct ON ct.dim = d.dim
  JOIN icent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
iranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
  FROM iscored
),
corpus_lists AS (SELECT id AS neighbor_id, bucket FROM iranked WHERE rn = 1),
probe_lists AS (
  SELECT id AS probe_id, bucket FROM iranked WHERE rn <= 2 AND id < {_PROBE_LIMIT}
),
cent AS (SELECT seed, sub, dim, avg(v) AS c FROM dims GROUP BY seed, sub, dim),
cent_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent GROUP BY seed, sub),
enc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
codes AS (
  SELECT id AS neighbor_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc
  ) t WHERE rn = 1
),
lut AS (
  SELECT id AS probe_id, sub, code, d2 AS pd2 FROM enc WHERE id < {_PROBE_LIMIT}
),
cand AS (
  SELECT pl.probe_id, cl.neighbor_id
  FROM corpus_lists cl JOIN probe_lists pl ON pl.bucket = cl.bucket
),
adc AS (
  SELECT c.probe_id, c.neighbor_id,
         sum(round(l.pd2 * 1000000)::BIGINT)::DOUBLE / 1000000 AS adist2
  FROM cand c
  JOIN codes co ON co.neighbor_id = c.neighbor_id
  JOIN lut l ON l.probe_id = c.probe_id AND l.sub = co.sub AND l.code = co.code
  WHERE c.probe_id != c.neighbor_id
  GROUP BY c.probe_id, c.neighbor_id
)
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
"""


def v13_knn_ivf_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with EXTERNAL query vectors (the online-serving case,
    VERDICT r4 #7): probes are out-of-corpus vectors — here a
    deterministic perturbation (x·1.1 + 0.01, IEEE-identical in both
    engines) of the first 10 corpus vectors under a disjoint id
    namespace — assigned to their ``nprobe=2`` nearest coarse lists
    via their OWN vector against the corpus centroids
    (vectorops.knn_ivf(external_probes=True)). No corpus row lookup,
    no raise_error path. → (probe_id, neighbor_id, cos, rank ≤ 3)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.1) + F.lit(0.01),
        ).alias("embedding"),
    )
    return V.knn_ivf(emb, probes, _K, nprobe=2, external_probes=True)


V13_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, g.i - 1 AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
cent_norm AS (SELECT seed, sum(c * c) AS c2 FROM cent GROUP BY seed),
scored0 AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN cent ct ON ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
assign AS (
  SELECT id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM scored0
  ) t WHERE rn = 1
),
probes AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.1 + 0.01) AS pv
  FROM embeddings WHERE vec_id < {_PROBE_LIMIT}
),
pdims AS (
  SELECT vec_id AS id, g.i - 1 AS dim, pv[g.i] AS v
  FROM probes, unnest(generate_series(1, len(pv))) AS g(i)
),
pscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM pdims d
  JOIN cent ct ON ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
probe_fan AS (
  SELECT id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM pscored
  ) t WHERE rn <= 2
),
pe AS (
  SELECT vec_id,
         list_transform(pv, x -> x / sqrt(list_dot_product(pv, pv))) AS nv
  FROM probes
),
er AS (
  SELECT vec_id, embedding::DOUBLE[] AS nv,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nn
  FROM embeddings
),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         round(list_dot_product(p.nv, c.nv) / c.nn, 6) AS cos
  FROM pe p
  JOIN probe_fan pf ON pf.id = p.vec_id
  JOIN assign ca ON ca.bucket = pf.bucket
  JOIN er c ON c.vec_id = ca.id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


def v14_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search (vectorops.range_search): every bucket-restricted
    neighbor with cosine ≥ 0.3 of each probe — the "all this similar"
    retrieval mode, a filter instead of a top-k window (no per-probe
    ranking state; output size is the only scale factor)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.range_search(emb, probes, threshold=0.3, bits=_BITS)


V14_SQL = f"""
WITH e AS ({_NORM_BUCKET_E}),
er AS ({_RAW_E})
SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       round(list_dot_product(p.v, c.nv) / c.nn, 6) AS cos
FROM e p JOIN er c ON p.bucket = c.bucket
WHERE p.vec_id < {_PROBE_LIMIT} AND c.vec_id != p.vec_id
  AND round(list_dot_product(p.v, c.nv) / c.nn, 6) >= 0.3
"""


def v17_knn_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with per-subspace Lloyd-refined codebooks
    (vectorops.knn_pq_refined, one refinement round): assign every
    subvector against the label-seeded codebooks, recompute each
    codeword as the mean of its ASSIGNED subvectors, re-encode corpus
    and probes, answer by ADC — k-means-trained PQ exactly as
    production builds it, deterministic because the seeding is. The
    oracle replays the identical round in SQL (the per-subspace form
    of v10's coarse Lloyd step). The round-8 recall study
    (SCALE.md §ANN recall) showed m — not codeword placement — is the
    binding recall knob on this corpus; this entry gates the training
    machinery itself. → (probe_id, neighbor_id, adist2, rank ≤ 3)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_pq_refined(emb, probes, _K, m=4, dims=64, n_iter=1)


V17_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, (g.i - 1) AS dim,
         ((g.i - 1) // 16) AS sub, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent AS (SELECT seed, sub, dim, avg(v) AS c FROM dims GROUP BY seed, sub, dim),
cent_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent GROUP BY seed, sub),
enc0 AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
assign0 AS (
  SELECT id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc0
  ) t WHERE rn = 1
),
cent2 AS (
  SELECT a.code AS seed, d.sub, d.dim, avg(d.v) AS c
  FROM dims d JOIN assign0 a ON a.id = d.id AND a.sub = d.sub
  GROUP BY a.code, d.sub, d.dim
),
cent2_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent2 GROUP BY seed, sub),
enc2 AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent2 ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent2_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
codes AS (
  SELECT id AS neighbor_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc2
  ) t WHERE rn = 1
),
lut AS (
  SELECT id AS probe_id, sub, code, d2 AS pd2 FROM enc2 WHERE id < {_PROBE_LIMIT}
),
adc AS (
  SELECT l.probe_id, c.neighbor_id,
         sum(round(l.pd2 * 1000000)::BIGINT)::DOUBLE / 1000000 AS adist2
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
  WHERE l.probe_id != c.neighbor_id
  GROUP BY l.probe_id, c.neighbor_id
)
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
"""


_VINDEXES: dict[tuple[str, str, int], V.VectorIndex] = {}


def vector_index(spark: SparkSession, sf_dir: str) -> V.VectorIndex:
    """The per-(session, corpus) shared IVF-PQ serving index — the ANN
    twin of ``inventory.textops.dedup_index``: coarse centroids, PQ
    codebooks, corpus lists, and codes are built ONCE per SparkContext
    × corpus (checkpointed; ``save``/``load`` is the cross-session
    form) and every query against them is index-only — no corpus
    vector is read at search time."""
    key = (spark.sparkContext.applicationId, sf_dir, 4)
    idx = _VINDEXES.get(key)
    if idx is None:
        idx = V.VectorIndex(_emb(spark, sf_dir))
        _VINDEXES[key] = idx
    return idx


def vector_index_production(spark: SparkSession, sf_dir: str) -> V.VectorIndex:
    """The PRODUCTION-configured shared serving index (m=16) — the
    round-8 recall study proved m binds recall on this corpus
    (m=4 → 0.37, m=16 → 0.50 @ sf0.1 external-probe serving,
    SCALE.md §ANN recall); v18 gates this configuration so the
    shipped default is the measured-good one, not the
    oracle-convenient m=4 the earlier entries keep for continuity."""
    key = (spark.sparkContext.applicationId, sf_dir, 16)
    idx = _VINDEXES.get(key)
    if idx is None:
        idx = V.VectorIndex(_emb(spark, sf_dir), m=16)
        _VINDEXES[key] = idx
    return idx


def _external_probes(emb: DataFrame) -> DataFrame:
    """Out-of-corpus query vectors (shared with v13): deterministic
    perturbation (x·1.1 + 0.01, IEEE-identical in both engines) of the
    first 10 corpus vectors under a disjoint id namespace."""
    return emb.filter(F.col("vec_id") < _PROBE_LIMIT).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.1) + F.lit(0.01),
        ).alias("embedding"),
    )


def v0_vector_index_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE SERVING over the persistable IVF-PQ index
    (vectorops.VectorIndex): external query vectors answered purely
    from index artifacts — probe fan-out from the probe's own vector
    vs the stored coarse centroids (nprobe=2), ADC lookup table from
    the stored PQ codebooks, candidates from the stored corpus lists,
    scores from the stored codes. Named ``v0`` so the ONE-TIME index
    build cost lands on this entry in name-ordered bench runs; warm
    searches are index-only and sub-second. The oracle recomputes the
    whole index + search from scratch — a direct hash gate on the
    stored artifacts. → (probe_id, neighbor_id, adist2, rank ≤ 3)."""
    idx = vector_index(spark, sf_dir)
    return idx.search(_external_probes(_emb(spark, sf_dir)), _K, nprobe=2)


V0_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, (g.i - 1) AS dim,
         ((g.i - 1) // 16) AS sub, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
icent AS (SELECT seed, dim, avg(v) AS c FROM dims GROUP BY seed, dim),
icent_norm AS (SELECT seed, sum(c * c) AS c2 FROM icent GROUP BY seed),
iscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN icent ct ON ct.dim = d.dim
  JOIN icent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
corpus_lists AS (
  SELECT id AS neighbor_id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM iscored
  ) t WHERE rn = 1
),
cent AS (SELECT seed, sub, dim, avg(v) AS c FROM dims GROUP BY seed, sub, dim),
cent_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent GROUP BY seed, sub),
enc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
codes AS (
  SELECT id AS neighbor_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc
  ) t WHERE rn = 1
),
probes AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.1 + 0.01) AS pv
  FROM embeddings WHERE vec_id < {_PROBE_LIMIT}
),
pdims AS (
  SELECT vec_id AS id, g.i - 1 AS dim, ((g.i - 1) // 16) AS sub, pv[g.i] AS v
  FROM probes, unnest(generate_series(1, len(pv))) AS g(i)
),
pscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM pdims d
  JOIN icent ct ON ct.dim = d.dim
  JOIN icent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
probe_fan AS (
  SELECT id AS probe_id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM pscored
  ) t WHERE rn <= 2
),
penc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS pd2
  FROM pdims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
cand AS (
  SELECT pf.probe_id, cl.neighbor_id
  FROM corpus_lists cl JOIN probe_fan pf ON pf.bucket = cl.bucket
),
adc AS (
  SELECT c.probe_id, c.neighbor_id,
         sum(round(l.pd2 * 1000000)::BIGINT)::DOUBLE / 1000000 AS adist2
  FROM cand c
  JOIN codes co ON co.neighbor_id = c.neighbor_id
  JOIN penc l ON l.id = c.probe_id AND l.sub = co.sub AND l.code = co.code
  GROUP BY c.probe_id, c.neighbor_id
)
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
"""


def v18_vector_serving_production(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """v0's serving path at the MEASURED production configuration
    (VERDICT r8 #4): the round-8 recall study proved the PQ family's
    recall is bound by m, not codeword placement (SCALE.md §ANN
    recall: m=4 → 0.37, m=16 → 0.50, m=32 → 0.50 external-probe
    recall@3 at sf0.1), so the gated serving default moves to m=16 —
    4-dim subspaces, 4× the code payload of m=4 (16 vs 4 small ints
    per vector), still 16× smaller than the raw floats, at the
    recall knee (m=32 doubles payload for +0.00). Identical plan
    shape to v0 (probe fan-out nprobe=2, stored-codebook ADC,
    index-only candidates); the oracle recomputes index + search from
    scratch at the same m. The recall floor itself is pinned in
    tests/test_vector_index.py::test_compressed_ann_recall_floors.
    → (probe_id, neighbor_id, adist2, rank ≤ 3)."""
    idx = vector_index_production(spark, sf_dir)
    return idx.search(_external_probes(_emb(spark, sf_dir)), _K, nprobe=2)


# V0_SQL with the production subspace width: 64 dims / m=16 → 4 dims
# per subspace (the only difference — training, fan-out, and ADC are
# the same machinery)
V18_SQL = V0_SQL.replace("(g.i - 1) // 16", "(g.i - 1) // 4")


def v19_vector_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-index DELETION lifecycle
    (vectorops.VectorIndex.retract) — the half the append-only add()
    contract was missing, and the vector twin of the text families'
    tombstones (GDPR-style removal, re-crawl supersession): the
    production (m=16) index is saved, a retraction set
    (vec_id % 7 == 3) lands as ONE O(delta) idempotent tombstone
    append (retract_saved — no corpus rewrite, quantizers and stored
    codes untouched), and a re-loaded index answers external probes
    with the retracted vectors filtered from candidates via a
    broadcast anti-join (compact() resolves the log physically on the
    maintenance cadence). The oracle recomputes the full index + the
    search with the retraction as a WHERE on the candidate corpus
    lists — training still sees the WHOLE corpus, exactly the
    frozen-quantizer deletion semantics. → (probe_id, neighbor_id,
    adist2, rank ≤ 3)."""
    import tempfile

    idx = vector_index_production(spark, sf_dir)
    path = f"{tempfile.mkdtemp(prefix='v19_vindex_')}/index"
    idx.save(path)
    loaded = V.VectorIndex.load(spark, path)
    emb = _emb(spark, sf_dir)
    loaded.retract(emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"))
    loaded.retract_saved(path)
    served = V.VectorIndex.load(spark, path)
    return served.search(_external_probes(emb), _K, nprobe=2)


# the retraction filters CANDIDATES only — centroid/codebook training
# and the probe-side CTEs are byte-identical to v18's
V19_SQL = V18_SQL.replace(
    "ON pf.bucket = cl.bucket",
    "ON pf.bucket = cl.bucket\n  WHERE cl.neighbor_id % 7 != 3",
)
assert V19_SQL != V18_SQL  # the anchor must keep matching


_V20_NPROBE = 8
_V20_SHORTLIST = 128


def v20_vector_serving_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE production serving (VERDICT r9 Next #2 —
    ``VectorIndex.search_rerank``): the v18 study left recall@3 at
    0.50 because PQ distortion scrambles the ORDER of an otherwise
    good candidate set (measured: the nprobe=8 candidate ceiling is
    0.93–0.97 while ADC@3 stalls at ~0.43), so the standard serving
    stack answer applies — the m=16 IVF-PQ ADC stage shortlists 128
    candidates per probe, and stored SQ8 refine codes (dims int8 per
    vector, 4× under the floats) re-rank exactly those by
    reconstructed L2. Measured recall@3: 0.97 @ sf0.001, 0.90 @
    sf0.01 (floor ≥ 0.85 pinned in
    tests/test_vector_index.py::test_compressed_ann_recall_floors);
    per-probe refine cost is shortlist × dims int8 reads, corpus-size
    independent. The oracle recomputes BOTH stages from scratch.
    Retraction composes unchanged (stage 1 serves from live_lists —
    v19 semantics untouched). → (probe_id, neighbor_id, rdist2,
    rank ≤ 3)."""
    idx = vector_index_production(spark, sf_dir)
    return idx.search_rerank(
        _external_probes(_emb(spark, sf_dir)),
        _K,
        nprobe=_V20_NPROBE,
        shortlist=_V20_SHORTLIST,
    )


# V18's machinery with (1) the probe fan widened to nprobe=8, (2) the
# final top-k turned into a shortlist CTE, (3) the SQ8 refine stage
# appended — codebook = per-dimension (lo, rng) over the corpus,
# encode/reconstruct exactly as vectorops.sq8_encode (same op order,
# bit-identical codes), re-rank by 1e-6-rounded reconstructed L2²
V20_SQL = V18_SQL.replace(
    "FROM pscored\n  ) t WHERE rn <= 2",
    f"FROM pscored\n  ) t WHERE rn <= {_V20_NPROBE}",
).replace(
    f""")
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
""",
    f"""),
shortlist AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
    FROM adc
  ) r WHERE rank <= {_V20_SHORTLIST}
),
sqrng AS (SELECT dim, min(v) AS lo, max(v) - min(v) AS r FROM dims GROUP BY dim),
sqcodes AS (
  SELECT d.id, d.dim,
         CASE WHEN g.r = 0 THEN 0
              ELSE least(255, greatest(0, floor((d.v - g.lo) / g.r * 256)))::INT END AS q
  FROM dims d JOIN sqrng g USING (dim)
  WHERE d.id IN (SELECT neighbor_id FROM shortlist)
),
sqrecon AS (
  SELECT c.id, c.dim, (c.q * (g.r / 255.0)) + g.lo AS rv
  FROM sqcodes c JOIN sqrng g USING (dim)
),
rescored AS (
  SELECT s.probe_id, s.neighbor_id,
         round(sum((p.v - c.rv) * (p.v - c.rv)), 6) AS rdist2
  FROM shortlist s
  JOIN pdims p ON p.id = s.probe_id
  JOIN sqrecon c ON c.id = s.neighbor_id AND c.dim = p.dim
  GROUP BY s.probe_id, s.neighbor_id
)
SELECT probe_id, neighbor_id, rdist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY rdist2, neighbor_id) AS rank
  FROM rescored
) t WHERE rank <= {_K}
""",
)
assert "sqrecon" in V20_SQL and f"rn <= {_V20_NPROBE}" in V20_SQL


def v15_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) approximate kNN (vectorops.knn_sq8) —
    the compression-family member serving stacks reach for first:
    64 int8 codes per vector (4x less scan payload) against a shared
    per-dimension (lo, step) codebook row, approximate dot = probe x
    reconstructed vector, error bounded by step/2 per dimension with
    NO training iterations and append-only codes under a frozen
    codebook. Complements PQ (v11, codebook lookups) and IVF-PQ (v12,
    list-bounded candidates). -> (probe_id, neighbor_id, adot, rank)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < _PROBE_LIMIT)
    return V.knn_sq8(emb, probes, _K)


V15_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, (g.i - 1) AS dim, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
rng AS (SELECT dim, min(v) AS lo, max(v) - min(v) AS r FROM dims GROUP BY dim),
codes AS (
  SELECT id, dim,
         CASE WHEN r = 0 THEN 0
              ELSE least(255, greatest(0, floor((v - lo) / r * 256)))::INT END AS q
  FROM dims JOIN rng USING (dim)
),
recon AS (
  SELECT id, dim, (q * (r / 255.0)) + lo AS rv
  FROM codes JOIN rng USING (dim)
),
scored AS (
  SELECT p.id AS probe_id, c.id AS neighbor_id,
         round(sum(p.v * c.rv), 6) AS adot
  FROM dims p JOIN recon c ON p.dim = c.dim AND c.id != p.id
  WHERE p.id < {_PROBE_LIMIT}
  GROUP BY p.id, c.id
)
SELECT probe_id, neighbor_id, adot, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adot DESC, neighbor_id) AS rank
  FROM scored
) t WHERE rank <= {_K}
"""


def v16_incremental_vector_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental serving-index maintenance
    (vectorops.VectorIndex.update) — the ANN twin of t34's daily-delta
    gate: build the IVF-PQ index over a BASE corpus slice
    (vec_id %8 != 7), then absorb the held-out delta with the
    quantizers FROZEN — the delta (which drops the training label
    column entirely: deltas are serving-time data, training metadata
    not required) is coarse-assigned and PQ-encoded against the
    stored centroids/codebooks and appended to corpus_lists/codes,
    never a corpus rescan. External probes are then answered from the
    merged index. The oracle recomputes lists + codes over
    base ∪ delta with the BASE-trained quantizers — a direct hash
    gate on `update == fresh encode of the union`, which is exactly
    the FAISS-style add() contract (public literature).
    → (probe_id, neighbor_id, adist2, rank ≤ 3)."""
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 8 != 7)
    delta = emb.filter(F.col("vec_id") % 8 == 7).drop("label")
    idx = V.VectorIndex(base)
    idx.update(delta)
    return idx.search(_external_probes(emb), _K, nprobe=2)


V16_SQL = f"""
WITH dims AS (
  SELECT vec_id AS id, label AS seed, (g.i - 1) AS dim,
         ((g.i - 1) // 16) AS sub, embedding[g.i]::DOUBLE AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
bdims AS (SELECT * FROM dims WHERE id % 8 != 7),
icent AS (SELECT seed, dim, avg(v) AS c FROM bdims GROUP BY seed, dim),
icent_norm AS (SELECT seed, sum(c * c) AS c2 FROM icent GROUP BY seed),
iscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM dims d
  JOIN icent ct ON ct.dim = d.dim
  JOIN icent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
corpus_lists AS (
  SELECT id AS neighbor_id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM iscored
  ) t WHERE rn = 1
),
cent AS (SELECT seed, sub, dim, avg(v) AS c FROM bdims GROUP BY seed, sub, dim),
cent_norm AS (SELECT seed, sub, sum(c * c) AS c2 FROM cent GROUP BY seed, sub),
enc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS d2
  FROM dims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
codes AS (
  SELECT id AS neighbor_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
    FROM enc
  ) t WHERE rn = 1
),
probes AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.1 + 0.01) AS pv
  FROM embeddings WHERE vec_id < {_PROBE_LIMIT}
),
pdims AS (
  SELECT vec_id AS id, g.i - 1 AS dim, ((g.i - 1) // 16) AS sub, pv[g.i] AS v
  FROM probes, unnest(generate_series(1, len(pv))) AS g(i)
),
pscored AS (
  SELECT d.id, ct.seed AS bucket,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS dist2
  FROM pdims d
  JOIN icent ct ON ct.dim = d.dim
  JOIN icent_norm cn ON cn.seed = ct.seed
  GROUP BY d.id, ct.seed
),
probe_fan AS (
  SELECT id AS probe_id, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist2, bucket) AS rn
    FROM pscored
  ) t WHERE rn <= 2
),
penc AS (
  SELECT d.id, d.sub, ct.seed AS code,
         round(sum(d.v * d.v) - 2 * sum(d.v * ct.c) + any_value(cn.c2), 6) AS pd2
  FROM pdims d
  JOIN cent ct ON ct.sub = d.sub AND ct.dim = d.dim
  JOIN cent_norm cn ON cn.seed = ct.seed AND cn.sub = ct.sub
  GROUP BY d.id, d.sub, ct.seed
),
cand AS (
  SELECT pf.probe_id, cl.neighbor_id
  FROM corpus_lists cl JOIN probe_fan pf ON pf.bucket = cl.bucket
),
adc AS (
  SELECT c.probe_id, c.neighbor_id,
         sum(round(l.pd2 * 1000000)::BIGINT)::DOUBLE / 1000000 AS adist2
  FROM cand c
  JOIN codes co ON co.neighbor_id = c.neighbor_id
  JOIN penc l ON l.id = c.probe_id AND l.sub = co.sub AND l.code = co.code
  GROUP BY c.probe_id, c.neighbor_id
)
SELECT probe_id, neighbor_id, adist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adist2, neighbor_id) AS rank
  FROM adc
) r WHERE rank <= {_K}
"""


def v21_vector_asof_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (time-travel) serving for the vector index (round 10):
    ``VectorIndex.load(as_of_id=H)`` serves the index exactly as it
    stood at ingestion high-water ``H`` — the corpus stages are
    monotone-id appends, so historical membership is an intrinsic
    ``id ≤ H`` filter with no extra bookkeeping (the reproducibility
    read a training pipeline needs: "which vectors did run X serve").
    Retractions are deliberately NOT time-travelable: committed
    tombstones apply at every as-of point, so a takedown never
    resurrects in a historical view. Protocol here: build + save over
    the half corpus (vec_id ≤ max/2), stream the rest in via
    update + append_saved, retract the % 13 == 4 slice of the BASE,
    then serve the as-of view AT the original half mark — the oracle
    recomputes the membership the historical point must serve:
    ids ≤ cut minus the retracted slice (deletions included — the
    GDPR stance), never any appended-later id. → (id)."""
    import shutil
    import tempfile

    emb = _emb(spark, sf_dir)
    hi = emb.agg(F.max("vec_id")).first()[0]
    cut = int(hi) // 2
    tmp = tempfile.mkdtemp(prefix="v21_asof_")
    try:
        V.VectorIndex(emb.filter(F.col("vec_id") <= cut)).save(tmp)
        idx = V.VectorIndex.load(spark, tmp)
        idx.update(emb.filter(F.col("vec_id") > cut).drop("label"))
        idx.append_saved(tmp)
        idx = V.VectorIndex.load(spark, tmp)
        idx.retract(
            emb.filter(
                (F.col("vec_id") <= cut) & (F.col("vec_id") % 13 == 4)
            ).select(F.col("vec_id").alias("id"))
        )
        idx.retract_saved(tmp)
        view = V.VectorIndex.load(spark, tmp, as_of_id=cut)
        return view.live_lists().select("id").localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


V21_SQL = """
SELECT vec_id AS id
FROM embeddings, (SELECT max(vec_id) // 2 AS cut FROM embeddings) c
WHERE vec_id <= cut AND NOT (vec_id % 13 = 4)
"""


QUERIES = {
    "v0_vector_index_serving": v0_vector_index_serving,
    "v1_knn_bruteforce": v1_knn_bruteforce,
    "v2_knn_bucketed": v2_knn_bucketed,
    "v3_label_centroids": v3_label_centroids,
    "v4_knn_ivf": v4_knn_ivf,
    "v5_embedding_neardup": v5_embedding_neardup,
    "v6_hamming_prefilter": v6_hamming_prefilter,
    "v7_knn_ivf_nprobe2": v7_knn_ivf_nprobe2,
    "v8_ann_recall": v8_ann_recall,
    "v9_semantic_clusters": v9_semantic_clusters,
    "v10_kmeans_refine": v10_kmeans_refine,
    "v11_knn_pq": v11_knn_pq,
    "v12_knn_ivf_pq": v12_knn_ivf_pq,
    "v13_knn_ivf_external": v13_knn_ivf_external,
    "v14_range_search": v14_range_search,
    "v15_knn_sq8": v15_knn_sq8,
    "v16_incremental_vector_serving": v16_incremental_vector_serving,
    "v17_knn_pq_refined": v17_knn_pq_refined,
    "v18_vector_serving_production": v18_vector_serving_production,
    "v19_vector_retraction": v19_vector_retraction,
    "v20_vector_serving_rerank": v20_vector_serving_rerank,
    "v21_vector_asof_membership": v21_vector_asof_membership,
}

ORACLES = {
    "v0_vector_index_serving": V0_SQL,
    "v1_knn_bruteforce": V1_SQL,
    "v2_knn_bucketed": V2_SQL,
    "v3_label_centroids": V3_SQL,
    "v4_knn_ivf": V4_SQL,
    "v5_embedding_neardup": V5_SQL,
    "v6_hamming_prefilter": V6_SQL,
    "v7_knn_ivf_nprobe2": V7_SQL,
    "v8_ann_recall": V8_SQL,
    "v9_semantic_clusters": V9_SQL,
    "v10_kmeans_refine": V10_SQL,
    "v11_knn_pq": V11_SQL,
    "v12_knn_ivf_pq": V12_SQL,
    "v13_knn_ivf_external": V13_SQL,
    "v14_range_search": V14_SQL,
    "v15_knn_sq8": V15_SQL,
    "v16_incremental_vector_serving": V16_SQL,
    "v17_knn_pq_refined": V17_SQL,
    "v18_vector_serving_production": V18_SQL,
    "v19_vector_retraction": V19_SQL,
    "v20_vector_serving_rerank": V20_SQL,
    "v21_vector_asof_membership": V21_SQL,
}
