"""Large-scale text/dedup operators for training-data pipelines.

Beyond the reference's surface (BASELINE north-star extensions): the
operators a 100 TB web-scale corpus pipeline needs, built so the
candidate set — never the corpus cross-product — is what shuffles:

- exact + bag-of-words fingerprint dedup (hash-groupBy, one shuffle);
- MinHash signatures + banded LSH near-dup candidates: shingle →
  k salted min-hashes → band keys → same-band self-join. Only documents
  sharing a band key ever meet in a join; all-pairs is never formed.
  At 1000 executors the band join is a plain shuffled equi-join whose
  skew (a hot band) AQE splits;
- exact n-gram Jaccard verification over the candidate pairs only;
- SimHash bucketing (majority-bit sketch);
- text analysis: stopword-based language ID, quality scoring, token
  counting, document fingerprinting.

Everything is built from JVM expressions (split/explode/md5/groupBy) —
no Python in the hot path. Hash family: lexicographic MIN over
``md5(salt || shingle)`` hex digests — a valid min-wise family that
both Spark and DuckDB compute identically, which makes every operator
oracle-checkable. A production variant would swap in xxhash64 for
speed; the pipeline shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


class TornStateError(ValueError):
    """A maintenance operation refused to run over torn on-disk state
    (uncommitted update/retraction rows whose writer crashed
    mid-protocol): the rewrite would destroy the very evidence the
    replay repair needs. Raised by every family's ``compact()``;
    ``maintenance.vacuum`` catches exactly this type (never a generic
    ``ValueError``, which would mislabel an unrelated bad argument as
    a torn-state refusal)."""


__all__ = [
    "TornStateError",
    "normalized_words",
    "shingles",
    "exact_dedup",
    "fingerprint",
    "fingerprint_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "band_frame",
    "pairs_from_band_frame",
    "jaccard_over_candidates",
    "doc_shingle_sets",
    "char_ngrams",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "decontaminate",
    "contamination_spans",
    "simhash16",
    "simhash16_df",
    "winnow_fingerprints",
    "connected_components",
    "DedupIndex",
    "lang_id",
    "quality_score",
    "trigram_lm_logprob",
    "TrigramLM",
    "bigram_pmi",
    "token_counts",
    "hash_bucket",
    "quota_sample",
    "weighted_sample",
]


def normalized_words(col: Column | str) -> Column:
    """lower + trim + whitespace split — the shared tokenizer every
    operator (and its DuckDB oracle) agrees on."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(col)), r"\s+")


def shingles(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the
    document has fewer than n words.

    Built as a zip_with fold over n shifted slices of the word array
    rather than ``transform(sequence(...), i -> slice(words, i, n))``:
    a dynamic-index ``slice`` inside a lambda is evaluated interpreted
    per element and re-copies the array — measured ~8x slower than the
    shifted-slice form on the documents corpus."""
    m = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    out = F.slice(words, 1, m)
    for i in range(1, n):
        out = F.zip_with(out, F.slice(words, i + 1, m), lambda a, b: F.concat_ws(" ", a, b))
    return out


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5 over the raw text, one hash-groupBy shuffle.
    → (text_hash, n_docs, canonical_id=min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("canonical_id"))
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct word bag —
    order-insensitive content hash."""
    words = normalized_words(col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words))))


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Bag-of-words dedup: documents with identical word sets collapse
    regardless of word order. → groups with n_docs > 1."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """→ (id, shingle) — the substrate for minhash + verify.

    ``distinct=True`` (set semantics) is required for exact Jaccard
    counting; MinHash can skip it (``min`` is duplicate-insensitive),
    saving the full (id, shingle) shuffle — the signature groupBy then
    aggregates map-side straight off the explode."""
    out = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(normalized_words(text_col), n)).alias("shingle"),
    )
    return out.distinct() if distinct else out


def doc_shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """→ (id, grams array<string>): per-doc DISTINCT word-n-gram sets,
    one row per document — the compact substrate
    :func:`jaccard_over_candidates` verifies against (set semantics
    via ``array_distinct``, no explode, no shuffle)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(normalized_words(text_col), n)).alias("grams"),
    )


def minhash_signatures(
    doc_shingles: DataFrame, k: int, hash_family: str = "md5"
) -> DataFrame:
    """k min-hash slots per document in ONE groupBy (k aggregates,
    map-side partials).

    ``hash_family="md5"`` (default): each md5 digest yields THREE
    independent 40-bit slots (10 hex chars each), so only ceil(k/3)
    digests are computed per shingle — 3× less hashing and 3× smaller
    aggregate state than one digest per slot, with the same min-wise
    property (fixed-width lowercase hex compares as the 40-bit
    integer). md5 is the ORACLE family: DuckDB computes the identical
    digests, so every driver parity gate runs over it.

    ``hash_family="xxhash64"``: one salted 64-bit non-cryptographic
    hash per slot (Spark's built-in xxhash64 — the SCALE.md "md5 →
    xxhash swap" production note, implemented). Cheaper per call than
    md5 and the slots aggregate as 8-byte longs instead of 10-char
    strings; no SQL-engine twin, so it is self-consistency-tested
    (update == rebuild, planted-dup recall) rather than
    oracle-twinned. Same plan shape either way."""
    if hash_family == "xxhash64":
        proj = doc_shingles.select(
            "id",
            *[
                F.xxhash64(F.lit(g), F.col("shingle")).alias(f"d{g}")
                for g in range(k)
            ],
        )
        return proj.groupBy("id").agg(
            *[F.min(F.col(f"d{i}")).alias(f"h{i}") for i in range(k)]
        )
    if hash_family != "md5":
        raise ValueError(
            f"minhash_signatures: unknown hash_family {hash_family!r} "
            "(expected 'md5' or 'xxhash64')"
        )
    n_digests = (k + 2) // 3
    proj = doc_shingles.select(
        "id",
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle"))).alias(f"d{g}")
            for g in range(n_digests)
        ],
    )
    aggs = [
        F.min(F.substring(F.col(f"d{i // 3}"), 1 + 10 * (i % 3), 10)).alias(f"h{i}")
        for i in range(k)
    ]
    return proj.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int, rows: int, max_band_size: int | None = None
) -> DataFrame:
    """Banded LSH: hash each band of ``rows`` signature slots to a band
    key, self-join per (band, key), keep ordered distinct pairs. The
    join input is |docs| × bands rows; only same-key rows pair up.

    Skew control, two layers: a hot band group (boilerplate/empty
    docs all sharing one key) is a fat equi-join key — AQE's skew-join
    handles the *task-level* imbalance for free, but the pair COUNT is
    still O(group²). ``max_band_size`` is the structural knob: band
    groups larger than the cap are dropped from the index entirely
    (the standard overfull-bucket skip in LSH/ANN practice — a group
    of near-identical boilerplate is exact-dedup's job, not near-dup
    mining's), bounding per-group pair expansion at C(cap, 2)
    independent of corpus size — the same argument as the n-gram
    substrate's absolute df cap. Docs paired ONLY through a dropped
    group lose those candidates; mirror the cap in any oracle.
    Default None preserves exact recall semantics."""
    return pairs_from_band_frame(
        band_frame(signatures, bands, rows), max_band_size
    )


def band_frame(
    signatures: DataFrame, bands: int, rows: int, hash_family: str = "md5"
) -> DataFrame:
    """Banded view of a signature frame → (id, band, key): each band of
    ``rows`` signature slots hashed to one key. This is the index's
    JOINABLE form — a corpus delta mines its new candidate pairs by
    banding its own signatures and equi-joining this frame, which is
    what :meth:`DedupIndex.update` persists it for. Under the
    ``xxhash64`` family the key is a salted 64-bit long over the slot
    longs (8-byte join keys instead of 32-char hex strings — smaller
    shuffles, same plan)."""
    if hash_family == "xxhash64":
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b), *[F.col(f"h{b * rows + r}") for r in range(rows)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    else:
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(",", *[F.col(f"h{b * rows + r}") for r in range(rows)])
                ).alias("key"),
            )
            for b in range(bands)
        ]
    return signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "bk.band", "bk.key")


def _cap_band_groups(banded: DataFrame, max_band_size: int | None) -> DataFrame:
    """Drop overfull (band, key) groups — the structural pair-explosion
    bound of :func:`lsh_candidate_pairs`; identity when uncapped."""
    if max_band_size is None:
        return banded
    kept = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_band_size)
        .select("band", "key")
    )
    return banded.join(kept, ["band", "key"], "left_semi")


def pairs_from_band_frame(
    banded: DataFrame, max_band_size: int | None = None
) -> DataFrame:
    """Candidate pairs from a band frame: per-(band, key) self-join,
    ordered distinct pairs — :func:`lsh_candidate_pairs`'s join tail."""
    banded = _cap_band_groups(banded, max_band_size)
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_over_candidates(
    pairs: DataFrame, doc_sets: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard on candidate pairs ONLY, from per-document
    distinct-gram ARRAYS (``doc_sets``: (id, grams array<string>)).

    |A∩B| = ``array_intersect`` inside the projection, |A∪B| =
    |A|+|B|−|A∩B| — two compact equi-joins that move |pairs| + |docs|
    rows instead of the gram-level explode-join (which shuffles the
    full posting list per candidate: measured ~3× slower on the
    documents corpus). The per-pair intersection is O(|A|+|B|) inside
    codegen; gram sets are per-doc bounded, so the join rows stay
    small at any corpus scale.
    → (id_a, id_b, jaccard ≥ threshold)."""
    a = doc_sets.select(F.col("id").alias("id_a"), F.col("grams").alias("ga"))
    b = doc_sets.select(F.col("id").alias("id_b"), F.col("grams").alias("gb"))
    out = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ga", "gb")).alias("i"),
            F.size("ga").alias("na"),
            F.size("gb").alias("nb"),
        )
        .select(
            "id_a",
            "id_b",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character ``n``-grams of ``lower(trim(text))``; empty
    array below ``n`` chars.

    Same shifted-slice construction as :func:`shingles` (split to a
    char array once, zip_with n shifted slices): the obvious
    ``transform(sequence(1, len-n+1), i -> substring(t, i, n))`` form
    re-evaluates ``lower(trim(text))`` per element — O(len²) per doc,
    measured 3× slower on the documents corpus. NULL text coalesces to
    the empty SET (explodes to no rows, sizes to 0 — same as the
    oracle's no-rows-from-NULL unnest)."""
    t = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    chars = F.split(t, "")
    m = F.greatest(F.size(chars) - F.lit(n - 1), F.lit(0))
    out = F.slice(chars, 1, m)
    for i in range(1, n):
        out = F.zip_with(out, F.slice(chars, i + 1, m), lambda a, b: F.concat(a, b))
    return F.coalesce(F.array_distinct(out), F.array().cast("array<string>"))


def hashed_gram_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-doc distinct char-``n``-gram sets in a hashed integer
    space — the persistable inverted-index substrate shared by the
    gram-candidate miners and :class:`incremental.CurationState`.

    ``hash_family="md5"`` (default): md5-derived 32-bit ints — the
    same function on both engines, so any collision merges the same
    gram on both sides (parity by construction); the ORACLE family.
    ``hash_family="xxhash64"``: Spark's built-in non-cryptographic
    64-bit hash — the PRODUCTION family (round 9, completing the
    SCALE.md md5→xxhash swap for the gram substrate): one codegen
    call instead of a crypto digest + hex substring + base-conv
    chain, and 2^64 key space (collision-merge odds vanish vs 2^32).
    Identical plan shape; self-consistency-gated (update == rebuild,
    planted-dup recall) rather than oracle-gated, since DuckDB has no
    xxhash64. → (id, grams array<bigint>) in both families."""
    if hash_family == "xxhash64":
        hashed = F.array_distinct(
            F.transform(char_ngrams(text_col, n), lambda g: F.xxhash64(g))
        )
    elif hash_family == "md5":
        hashed = F.array_distinct(
            F.transform(
                char_ngrams(text_col, n),
                lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
            )
        )
    else:
        raise ValueError(
            f"hashed_gram_sets: unknown hash_family {hash_family!r} "
            "(expected 'md5' or 'xxhash64')"
        )
    return df.select(F.col(id_col).alias("id"), hashed.alias("grams"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_df_frac: float = 0.05,
    threshold: float = 0.65,
    max_df: int = 64,
    substrate: tuple[DataFrame, DataFrame] | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs via an inverted-index
    join with document-frequency pruning — the non-probabilistic
    sibling of MinHash-LSH (t3/t4).

    Plan shape (the 100 TB argument):
    1. inverted index (id, gram), one explode — no shuffle yet;
    2. stop-gram pruning: grams appearing in more than
       ``min(max_df, ceil(max_df_frac * N))`` documents are dropped
       from the INDEX (not from the verify step). The ABSOLUTE cap
       ``max_df`` is the scale guarantee: a posting list is at most
       ``max_df`` ids long, so the in-array pair expansion emits at
       most C(max_df, 2) pairs per gram — a constant, independent of
       corpus size N. (A fraction-only cutoff admits postings of
       length 0.05·N and O((0.05·N)²) pairs — quadratic at 100 TB.)
       The fractional term still governs small corpora, where
       ``ceil(frac·N) < max_df``. The threshold comes from a 1-row
       aggregate broadcast into the plan — no driver action.
       Recall semantics are explicit: pairs whose overlap is entirely
       stop-grams are not candidates (standard df-pruning trade-off,
       mirrored exactly by the oracle);
    3. exact Jaccard verification over candidates only, using the FULL
       gram sets (same candidate-restricted shape as t4).

    Grams live in a HASHED space: md5-derived 32-bit ints, the same
    function on both engines, so collisions (if any) merge the same
    gram pairs on both sides — parity is by construction, like t3/t5's
    hashed sketches. Int sets intersect on the primitive-specialized
    path and the materialized index is ~5× smaller than raw strings —
    measured 2× faster end-to-end.

    Skew: a still-hot rare gram is a fat join group — AQE skew-join
    splits it; the prune threshold is the structural control.
    → (id_a, id_b, jaccard ≥ threshold)."""
    cand, sets = substrate or _pruned_gram_candidates(
        df, text_col, id_col, n, max_df_frac, max_df, hash_family
    )
    return jaccard_over_candidates(cand, sets, threshold=threshold)


def _pruned_gram_candidates(
    df: DataFrame, text_col: str, id_col: str, n: int, max_df_frac: float,
    max_df: int = 64, hash_family: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate substrate for t11/t14/t20: hashed char-n-gram
    sets per doc plus the df-pruned inverted-index candidate pairs.
    Posting lists are bounded by ``min(max_df, max(2, ceil(max_df_frac·N)))``
    — the absolute term makes per-gram pair expansion O(max_df²), a
    constant w.r.t. corpus size (see :func:`ngram_jaccard_pairs`), and
    the floor of 2 removes a small-corpus cliff: below it the
    fractional cutoff could prune to df ≤ 1, where a candidate pair
    (a gram shared by ≥ 2 docs) is PROVABLY impossible and even exact
    duplicates silently stopped matching.
    → (cand: (id_a < id_b), sets: (id, grams array<bigint>))."""
    sets = hashed_gram_sets(
        df, text_col, id_col, n, hash_family
    ).localCheckpoint(eager=True)
    # ^ the substrate is read 4× (dfreq, postings, both verify sides);
    # without truncation each branch re-runs scan+split+zip_with —
    # measured 3× slower. At corpus scale this materialization is the
    # standard "build the index once" step, executor-local, no driver.
    grams = sets.select("id", F.explode("grams").alias("g"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_total"))
    # pass 1 — df counts only (map-side partials), prune to rare grams
    dfreq = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df_g"))
        .join(F.broadcast(n_docs))
        .filter(
            F.col("df_g")
            <= F.least(
                F.lit(max_df),
                F.greatest(F.lit(2), F.ceil(F.lit(max_df_frac) * F.col("n_total"))),
            )
        )
        .select("g")
    )
    # pass 2 — posting lists for RARE grams only (broadcast semi-join
    # prunes before the shuffle, so collect_list state is bounded by
    # the df threshold, never by a hot gram's full posting list)
    postings = (
        grams.join(F.broadcast(dfreq), "g")
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )
    return posting_pairs(postings), sets


def posting_pairs(postings: DataFrame) -> DataFrame:
    """Expand sorted posting lists (``ids`` array column) into the
    distinct ordered candidate pairs (id_a < id_b) they witness — the
    in-array pair expansion shared by the gram miners and the
    incremental decontamination substrate (no self-join; per-list
    output is C(len, 2), bounded by the caller's df cap)."""
    sz = F.size("ids")
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.greatest(sz - i - F.lit(1), F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        postings.select(F.explode(pair_arr).alias("pr"))
        .select("pr.id_a", "pr.id_b")
        .distinct()
    )


def _containment_verified(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Shared array-intersect containment verify over candidate pairs:
    join each side's gram set, score |A∩B| / min(|A|,|B|) on the
    rounded 1e-6 grid, keep pairs at/above ``threshold``. Extra
    columns on ``cand`` (e.g. decontaminate's side flags) pass
    through. One copy of the verify expression — the rounding grid
    and the m>0 guard stay in sync across every consumer."""
    carry = [c for c in cand.columns if c not in ("id_a", "id_b")]
    a = sets.select(F.col("id").alias("id_a"), F.col("grams").alias("ga"))
    b = sets.select(F.col("id").alias("id_b"), F.col("grams").alias("gb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            *carry,
            F.size(F.array_intersect("ga", "gb")).alias("i"),
            F.least(F.size("ga"), F.size("gb")).alias("m"),
        )
        .filter(F.col("m") > 0)
        .select(
            "id_a",
            "id_b",
            *carry,
            F.round(F.col("i").cast("double") / F.col("m"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_df_frac: float = 0.05,
    threshold: float = 0.8,
    max_df: int = 64,
    substrate: tuple[DataFrame, DataFrame] | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-CONTAINMENT detection — the decontamination primitive: find
    documents whose gram set is (nearly) a subset of another's
    (excerpts, quotes, benchmark passages embedded in training text).
    Jaccard misses these when the container is much larger; containment
    |A∩B| / min(|A|,|B|) does not.

    Same candidate substrate and scale arguments as
    :func:`ngram_jaccard_pairs` (df-pruned inverted index, compact
    array-intersect verify).
    → (id_a, id_b, containment ≥ threshold)."""
    cand, sets = substrate or _pruned_gram_candidates(
        df, text_col, id_col, n, max_df_frac, max_df, hash_family
    )
    return _containment_verified(cand, sets, threshold)


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_col: str,
    n: int = 3,
    max_df_frac: float = 0.05,
    threshold: float = 0.8,
    max_df: int = 64,
    substrate: tuple[DataFrame, DataFrame] | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Benchmark-decontamination sweep: ids of non-benchmark docs
    whose gram-set containment with ANY benchmark doc (boolean
    ``bench_col``) reaches ``threshold`` — the eval-leakage primitive.

    Same candidate substrate as :func:`ngram_containment_pairs`, but
    the side classification is pushed BEFORE verification: a
    same-side candidate pair (train×train or bench×bench) can never
    flag a document, so only the mixed pairs reach the
    array-intersect verify — the expensive per-pair step — cutting
    verify work to the mixed fraction of candidates (≈ 2·p·(1−p) of
    all pairs for benchmark share p) with a byte-identical result.
    → (doc_id) — distinct contaminated non-benchmark ids."""
    cand, sets = substrate or _pruned_gram_candidates(
        df, text_col, id_col, n, max_df_frac, max_df, hash_family
    )
    flags = df.select(F.col(id_col).alias("id"), F.col(bench_col).alias("__bench"))
    fa = flags.select(F.col("id").alias("id_a"), F.col("__bench").alias("ba"))
    fb = flags.select(F.col("id").alias("id_b"), F.col("__bench").alias("bb"))
    mixed = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(F.col("ba") != F.col("bb"))
        .drop("bb")
    )
    hits = _containment_verified(mixed, sets, threshold)
    return (
        hits.select(
            F.when(~F.col("ba"), F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id")
        )
        .distinct()
    )


def contamination_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_col: str,
    n: int = 3,
    max_df_frac: float = 0.05,
    threshold: float = 0.8,
    max_df: int = 64,
    substrate: tuple[DataFrame, DataFrame] | None = None,
    span_n: int = 8,
    hash_family: str = "md5",
) -> DataFrame:
    """Span-granular decontamination: :func:`decontaminate` says WHICH
    training docs leak a benchmark; this says WHERE. For every flagged
    mixed (train, bench) pair, slide word-``span_n``-grams over the
    train doc (stride 1, so alignment is free), keep the positions
    whose gram also occurs anywhere in the bench doc, merge
    consecutive positions into maximal runs (gaps-and-islands), and
    emit the pair's shared-gram count plus its LONGEST shared run —
    length, start offset, and the matched text itself (ties break on
    the earliest start).

    Scale: the sliding-gram explode runs only over flagged-pair docs
    (the output of the df-capped candidate mine — a vanishing fraction
    of the corpus), the bench side ships (id, gram) rows — never
    arrays — through a plain equi-join, and the islands window
    partitions per pair, so state is bounded by the longest flagged
    document. Pairs whose leak is sub-``span_n`` words produce no row
    (nothing to locate).
    → (train_id, bench_id, n_shared_grams, span_words, span_start,
    span_text)."""
    cand, sets = substrate or _pruned_gram_candidates(
        df, text_col, id_col, n, max_df_frac, max_df, hash_family
    )
    flags = df.select(F.col(id_col).alias("id"), F.col(bench_col).alias("__bench"))
    fa = flags.select(F.col("id").alias("id_a"), F.col("__bench").alias("ba"))
    fb = flags.select(F.col("id").alias("id_b"), F.col("__bench").alias("bb"))
    mixed = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(F.col("ba") != F.col("bb"))
        .drop("bb")
    )
    hits = _containment_verified(mixed, sets, threshold)
    pairs = hits.select(
        F.when(~F.col("ba"), F.col("id_a")).otherwise(F.col("id_b")).alias("train_id"),
        F.when(F.col("ba"), F.col("id_a")).otherwise(F.col("id_b")).alias("bench_id"),
    )
    words = df.select(F.col(id_col).alias("id"), normalized_words(text_col).alias("ws"))
    spans_src = words.select("id", shingles(F.col("ws"), span_n).alias("sp"))
    train_pos = pairs.join(
        spans_src.withColumnRenamed("id", "train_id"), "train_id"
    ).select("train_id", "bench_id", F.posexplode("sp").alias("pos", "gram"))
    bench_grams = (
        pairs.select("bench_id")
        .distinct()
        .join(spans_src.withColumnRenamed("id", "bench_id"), "bench_id")
        .select("bench_id", F.explode(F.array_distinct("sp")).alias("gram"))
    )
    shared = train_pos.join(bench_grams, ["bench_id", "gram"]).select(
        "train_id", "bench_id", "pos"
    )
    w_isl = W.partitionBy("train_id", "bench_id").orderBy("pos")
    runs = (
        shared.withColumn("island", F.col("pos") - F.row_number().over(w_isl))
        .groupBy("train_id", "bench_id", "island")
        .agg(F.min("pos").alias("start"), F.count(F.lit(1)).alias("k"))
    )
    w_best = W.partitionBy("train_id", "bench_id").orderBy(
        F.col("k").desc(), F.col("start").asc()
    )
    best = runs.withColumn("rn", F.row_number().over(w_best)).filter(F.col("rn") == 1)
    stats = shared.groupBy("train_id", "bench_id").agg(
        F.count(F.lit(1)).alias("n_shared_grams")
    )
    return (
        best.join(stats, ["train_id", "bench_id"])
        .join(words.withColumnRenamed("id", "train_id"), "train_id")
        .select(
            "train_id",
            "bench_id",
            "n_shared_grams",
            (F.col("k") + F.lit(span_n - 1)).cast("bigint").alias("span_words"),
            F.col("start").cast("bigint").alias("span_start"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("ws"),
                    F.col("start") + 1,
                    (F.col("k") + F.lit(span_n - 1)).cast("int"),
                ),
            ).alias("span_text"),
        )
    )


def repeated_substring_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_n: int = 8,
) -> DataFrame:
    """Cross-document repeated-substring detection — the
    exact-substring dedup primitive (the approach of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public
    literature; suffix-array exactness approximated by sliding
    word-``span_n``-grams at stride 1, so any repeated run of
    ≥ span_n words is found with exact word boundaries): a position is
    REPEATED when its gram occurs in at least one OTHER document;
    repeated positions whose coverage overlaps or touches (gap ≤
    span_n−1) merge into maximal covered islands.

    The scale property that makes this the 100 TB-safe member of the
    dedup family: it is PAIRS-FREE. Near-dup mining must bound pair
    expansion (banded LSH, df caps); here the detector needs only each
    gram's distinct-document count — a gram shared by a million docs
    costs ONE count row, not 10¹² pairs — so cost is linear in corpus
    size at ANY duplication level. The islands window partitions per
    document (state bounded by the longest doc), and the covered-word
    arithmetic is exact: islands are coverage-disjoint by
    construction, so ``repeat_words`` never double-counts.

    → (id, n_spans, repeat_words, max_span_words, max_span_start,
    repeat_frac) for documents with ≥ 1 repeated span; positions are
    0-based word offsets (``n_words`` is internal to ``repeat_frac``
    and not emitted — matching the T37 oracle's projection)."""
    words = df.select(
        F.col(id_col).alias("id"), normalized_words(text_col).alias("ws")
    )
    pos = words.select(
        "id",
        F.size("ws").alias("n_words"),
        F.posexplode(shingles(F.col("ws"), span_n)).alias("pos", "gram"),
    )
    rep_g = (
        pos.select("id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gram")
    )
    shared = pos.join(rep_g, "gram").select("id", "n_words", "pos")
    return _island_spans(shared, span_n)


def _island_spans(shared: DataFrame, span_n: int) -> DataFrame:
    """Merge repeated positions (id, n_words, pos) into maximal
    coverage islands and emit the per-doc span stats — the second half
    of :func:`repeated_substring_spans`, shared with
    :class:`RepeatIndex`'s delta-bounded re-evaluation (identical
    arithmetic is what makes ``update == rebuild`` hold row-for-row)."""
    w_ord = W.partitionBy("id").orderBy("pos")
    flagged = shared.withColumn(
        "new_isl",
        F.when(
            F.col("pos") - F.lag("pos").over(w_ord) > span_n - 1, 1
        ).otherwise(F.when(F.lag("pos").over(w_ord).isNull(), 1).otherwise(0)),
    ).withColumn(
        "island",
        F.sum("new_isl").over(
            w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    islands = flagged.groupBy("id", "n_words", "island").agg(
        F.min("pos").alias("start"),
        (F.max("pos") - F.min("pos") + F.lit(span_n)).alias("covered"),
    )
    w_best = W.partitionBy("id").orderBy(
        F.col("covered").desc(), F.col("start").asc()
    )
    return (
        islands.withColumn("rn", F.row_number().over(w_best))
        .groupBy("id", "n_words")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("covered").alias("repeat_words"),
            F.max(F.when(F.col("rn") == 1, F.col("covered"))).alias(
                "max_span_words"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("start"))).alias(
                "max_span_start"
            ),
        )
        .select(
            "id",
            "n_spans",
            "repeat_words",
            "max_span_words",
            "max_span_start",
            F.round(
                F.col("repeat_words").cast("double") / F.col("n_words"), 6
            ).alias("repeat_frac"),
        )
    )


def trim_repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_n: int = 8,
) -> DataFrame:
    """Remove cross-document repeated passages, KEEPING one copy — the
    transform half of :func:`repeated_substring_spans` (find) and the
    exact-substring analog of C4's line dedup: for every repeated gram
    the minimal-id document containing it is the OWNER; positions
    whose gram is owned elsewhere are foreign-repeats, their coverage
    islands are cut from the word sequence, and the text is rebuilt
    from the surviving words. The first document to carry a passage
    keeps it verbatim; later carriers lose exactly the shared words.

    Same pairs-free scale shape as the finder (one distinct-doc
    count + one min-owner aggregate per gram, per-doc windows), plus
    one array rebuild per trimmed doc: the covered ranges ship as a
    per-doc broadcast-free array and the word filter is a single
    JVM-side higher-order expression — no per-row Python.
    → original columns with ``text_col`` rewritten (docs with nothing
    to trim pass through byte-identical)."""
    words = df.select(
        F.col(id_col).alias("id"), normalized_words(text_col).alias("ws")
    )
    pos = words.select(
        "id", F.posexplode(shingles(F.col("ws"), span_n)).alias("pos", "gram")
    )
    owners = (
        pos.select("id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"), F.min("id").alias("owner"))
        .filter(F.col("ndocs") >= 2)
        .select("gram", "owner")
    )
    foreign = (
        pos.join(owners, "gram")
        .filter(F.col("id") != F.col("owner"))
        .select("id", "pos")
        .distinct()
    )
    w_ord = W.partitionBy("id").orderBy("pos")
    flagged = foreign.withColumn(
        "new_isl",
        F.when(
            F.col("pos") - F.lag("pos").over(w_ord) > span_n - 1, 1
        ).otherwise(F.when(F.lag("pos").over(w_ord).isNull(), 1).otherwise(0)),
    ).withColumn(
        "island",
        F.sum("new_isl").over(
            w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    ranges = (
        flagged.groupBy("id", "island")
        .agg(
            F.min("pos").alias("lo"),
            (F.max("pos") + F.lit(span_n - 1)).alias("hi"),
        )
        .groupBy("id")
        .agg(F.collect_list(F.struct("lo", "hi")).alias("cuts"))
    )
    cut = df.join(
        ranges.withColumnRenamed("id", id_col), id_col, "left"
    )
    ws = normalized_words(text_col)
    kept = F.filter(
        ws,
        lambda w, i: ~F.exists(
            F.col("cuts"), lambda r: (i >= r["lo"]) & (i <= r["hi"])
        ),
    )
    return cut.withColumn(
        text_col,
        F.when(F.col("cuts").isNull(), F.col(text_col)).otherwise(
            F.concat_ws(" ", kept)
        ),
    ).drop("cuts")


class RepeatIndex:
    """Persisted, incrementally-updatable exact-substring detector —
    the :func:`repeated_substring_spans` family's daily-delta form,
    closing the last index-family asymmetry (near-dup: DedupIndex;
    vectors: VectorIndex; whole pipeline: incremental.CurationState).

    Why this one is the EASY incremental index: a position is repeated
    iff its gram's distinct-document count is ≥ 2, and over
    id-DISJOINT doc sets those counts are ADDITIVE — no retraction,
    no pair state, and (unlike CurationState's exact-dedup keep-first
    rule) no order dependence, so the contract is plain disjointness
    rather than monotone ingestion; ``update`` verifies it against
    the stored postings with one delta-bounded semi-join. A delta
    changes the repeated status of exactly two groups of grams: its
    own, and the stored grams whose count crosses 1 → ≥2
    (``flipped``). Only documents holding a flipped gram can change
    their spans, so re-evaluation is bounded by the delta plus those
    touched old docs — never a corpus re-scan. ``build(base);
    update(delta)`` equals ``build(base ∪ delta)`` row-for-row on the
    spans view (tested, and hash-gated end-to-end by the t38 oracle).

    Substrates under ``path`` (same merge-on-read pattern as
    ``incremental.CurationState``):

    - ``postings/``  (g, id) distinct gram→doc postings, APPEND-only.
      Grams are stored as their word strings for oracle-exactness;
      a production build swaps a 64-bit hash into the same plan
      (the SCALE.md md5→xxhash note applies).
    - ``spans/``  per-doc span stats as a GENERATION-stamped append
      log with last-wins merge-on-read (a re-evaluated doc's fresh
      row carries a higher ``gen`` and shadows its old one — the LSM
      upsert shape, chosen over a tombstone log because the same doc
      can be re-evaluated by MANY updates and an id-keyed tombstone
      would also kill the replacement row).
    - ``meta/``  (text_col, id_col, span_n, max_doc_id, n_updates);
      batch ``update`` does not gate on ``max_doc_id`` (ids only need
      to be disjoint, not monotone) — it is the replay high-water mark
      for :meth:`foreach_batch_update`, whose streaming form imposes
      the stricter monotone contract.

    ``update(delta, old_docs)`` needs the old TEXTS only for the
    touched docs (a semi-join against the caller's corpus — the one
    thing the index does not persist), mirroring
    ``DedupIndex.update``'s contract."""

    _META_SCHEMA = (
        "text_col string, id_col string, span_n int, "
        "max_doc_id bigint, n_updates int, n_retractions int, "
        "counts_seg int"
    )
    # postings rows carry the update segment that wrote them (seg):
    # build/compact write seg=0, update k appends seg=k. gram_counts
    # (g, c) is the per-gram live document count as of the segment
    # meta's counts_seg covers — valid iff counts_seg IS NOT NULL
    # (compact invalidates it before its rewrites and re-validates
    # after, so every crash prefix falls back to the exact scan path).
    # Explicit-schema reads keep legacy (g, id)-only layouts readable
    # (seg -> NULL, which only ever happens with no gram_counts dir —
    # the fallback branch).
    _POST_SCHEMA = "g string, id bigint, seg bigint"
    _SPAN_COLS = (
        "id", "n_spans", "repeat_words", "max_span_words",
        "max_span_start", "repeat_frac",
    )

    def __init__(self, spark, path: str, meta: dict) -> None:
        self._spark = spark
        self._path = path
        self.meta = meta

    # ------------------------------------------------------------- views

    def _tombstones(self) -> DataFrame | None:
        """Committed retraction set (``retracted`` ledger rows within
        the meta sequence), or None when no retraction ever ran — the
        fast path stays zero-cost."""
        p = f"{self._path}/retracted"
        if not _parquet_dir_exists(p):
            return None
        n_r = int(self.meta.get("n_retractions") or 0)
        return (
            _read_parquet_pinned(self._spark, p)
            .filter(F.col("rseq") <= n_r)
            .select("id")
        )

    def _raw_postings(self) -> DataFrame:
        return self._spark.read.schema(self._POST_SCHEMA).parquet(
            f"{self._path}/postings"
        )

    def postings(self) -> DataFrame:
        out = self._raw_postings().select("g", "id")
        t = self._tombstones()
        if t is not None:
            # retraction sets are deletion-sized — broadcast anti-join,
            # no shuffle added; compact() resolves them physically.
            # (Column re-select: the USING-column join promotes the
            # key to the front.)
            cols = out.columns
            out = out.join(F.broadcast(t), "id", "left_anti").select(*cols)
        return out

    def spans(self) -> DataFrame:
        """Live per-doc repeated-span stats — last-wins over the
        generation-stamped log, exactly
        :func:`repeated_substring_spans` over everything indexed,
        minus retracted docs and minus zero-span DELETE sentinels (a
        re-evaluated doc that lost its last repeat upserts an
        ``n_spans = 0`` row — presence in this view means ≥ 1 span,
        matching the build contract)."""
        log = _read_parquet_pinned(self._spark, f"{self._path}/spans")
        w = W.partitionBy("id").orderBy(F.col("gen").desc())
        out = (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*self._SPAN_COLS)
            .filter(F.col("n_spans") > 0)
        )
        t = self._tombstones()
        if t is not None:
            out = out.join(F.broadcast(t), "id", "left_anti")
        return out

    # ------------------------------------------------------ construction

    @staticmethod
    def _pos(docs: DataFrame, text_col: str, id_col: str, span_n: int) -> DataFrame:
        return docs.select(
            F.col(id_col).alias("id"), normalized_words(text_col).alias("ws")
        ).select(
            "id",
            F.size("ws").alias("n_words"),
            F.posexplode(shingles(F.col("ws"), span_n)).alias("pos", "g"),
        )

    @classmethod
    def build(
        cls,
        spark,
        docs: DataFrame,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        span_n: int = 8,
    ) -> "RepeatIndex":
        meta = {"text_col": text_col, "id_col": id_col, "span_n": span_n}
        st = cls(spark, path, meta)
        # the three build actions are independent (a torn build is
        # rebuilt — no crash contract to preserve), so they overlap
        # from driver threads instead of leaving the cluster idle
        # between jobs (the t36 freed-write-order treatment applied to
        # the t38 gate, VERDICT r8 #3)
        from concurrent.futures import ThreadPoolExecutor

        pos = cls._pos(docs, text_col, id_col, span_n)
        jobs = [
            lambda: docs.agg(F.max(id_col)).first()[0],
            lambda: pos.select("g", "id")
            .distinct()
            .withColumn("seg", F.lit(0).cast("bigint"))
            .write.mode("overwrite")
            .parquet(f"{path}/postings"),
            lambda: repeated_substring_spans(docs, text_col, id_col, span_n)
            .withColumn("gen", F.lit(0))
            .write.mode("overwrite")
            .parquet(f"{path}/spans"),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [pool.submit(j) for j in jobs]
            max_doc_id = futs[0].result()
            futs[1].result()
            futs[2].result()
        # the retraction fast path's count substrate (round 10): live
        # per-gram doc counts, read from the just-sealed postings files
        # (cheaper than re-gramming), valid for seg <= 0
        spark.read.schema(cls._POST_SCHEMA).parquet(
            f"{path}/postings"
        ).groupBy("g").agg(F.count(F.lit(1)).alias("c")).write.mode(
            "overwrite"
        ).parquet(f"{path}/gram_counts")
        meta["max_doc_id"] = -1 if max_doc_id is None else int(max_doc_id)
        meta["n_updates"] = 0
        meta["n_retractions"] = 0
        meta["counts_seg"] = 0
        st._write_meta()
        return st

    @classmethod
    def load(cls, spark, path: str) -> "RepeatIndex":
        meta = _read_control_row(f"{path}/meta")
        # metas written before the retraction protocol lack the field
        meta["n_retractions"] = int(meta.get("n_retractions") or 0)
        # metas written before the counts substrate existed: no valid
        # counts (the retract fast path falls back to exact scans)
        meta["counts_seg"] = meta.get("counts_seg")
        return cls(spark, path, meta)

    def _write_meta(self) -> None:
        m = self.meta
        vals = tuple(m[f.split(" ")[0]] for f in self._META_SCHEMA.split(", "))
        _write_control_parquet(f"{self._path}/meta", [vals], self._META_SCHEMA)

    # ------------------------------------------------------------ update

    def update(self, delta_docs: DataFrame, old_docs: DataFrame) -> dict:
        """Single-writer-fenced entry (see :mod:`..lease`) over
        :meth:`_update_unfenced` — RepeatIndex.update IS the absorb
        write (postings/spans appends + meta), so it takes the
        directory lease a concurrent compact/vacuum would contend
        on."""
        from .lease import dir_lease

        with dir_lease(self._path, role="RepeatIndex.update"):
            return self._update_unfenced(delta_docs, old_docs)

    def _update_unfenced(self, delta_docs: DataFrame, old_docs: DataFrame) -> dict:
        """Absorb a corpus delta; bounded by the delta plus the old
        docs holding a gram the delta flipped to repeated. Raises if a
        delta id is already indexed (id-disjointness contract —
        re-ingesting a doc would double its postings; the check is a
        delta-bounded semi-join over the stored postings, so it covers
        every doc long enough to gram — a reingested sub-``span_n``
        doc has no postings and no possible effect on any count).
        → per-stage metrics."""
        spark, p, m = self._spark, self._path, self.meta
        span_n = m["span_n"]
        stored = self.postings()
        dpos = self._pos(delta_docs, m["text_col"], m["id_col"], span_n)
        d_post = dpos.select("g", "id").distinct().localCheckpoint(eager=False)
        d_ids = delta_docs.select(F.col(m["id_col"]).alias("id")).distinct()

        if _parquet_dir_exists(f"{p}/retracted"):
            led = spark.read.parquet(f"{p}/retracted")
            n_r = int(m.get("n_retractions") or 0)
            if led.filter(F.col("rseq") > n_r).limit(1).count():
                raise ValueError(
                    "RepeatIndex.update: uncommitted retraction ledger rows "
                    "on disk — a previous retract() crashed mid-protocol; "
                    "replay that retraction (retract with the same ids) "
                    "before updating, or its purge would misattribute this "
                    "update's span generation"
                )
            n_dead = (
                led.filter(F.col("rseq") <= n_r)
                .select("id")
                .join(d_ids, "id", "left_semi")
                .count()
            )
            if n_dead:
                raise ValueError(
                    f"RepeatIndex.update: {n_dead} delta id(s) collide with "
                    "retracted ids — a retracted id stays dead (the "
                    "tombstone filter would hide the re-ingested rows); "
                    "allocate fresh ids for re-added content"
                )

        # the three read-only probes — delta bounds/dup check, the
        # id-disjointness contract count, and the d_post-pin +
        # flipped-gram touched set — are mutually independent jobs;
        # they overlap from driver threads (the freed-write-order
        # treatment extended to the read side: serially these left
        # the cluster idle between three small jobs). The contract
        # violations are raised AFTER the join — nothing has been
        # written yet, so a late raise is still a clean refusal.
        def _bounds():
            # one delta pass for bounds + row count + the within-delta
            # duplicate-id check (two texts under one id would merge
            # their gram sets and tie the spans log at one generation)
            return delta_docs.agg(
                F.min(m["id_col"]).alias("lo"),
                F.max(m["id_col"]).alias("hi"),
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(m["id_col"]).alias("nd"),
            ).first()

        def _overlap():
            return stored.join(d_ids, "id", "left_semi").count()

        def _touched():
            # stored counts restricted to the delta's grams (only they
            # can flip) — a semi-join, never a full-postings
            # aggregate. No broadcast hints on these gram-STRING sets:
            # they are delta-PROPORTIONAL (hundreds of millions of
            # 8-word strings for a realistic daily delta), so AQE must
            # stay free to pick a shuffle join when they outgrow
            # broadcast size. The count materializes the LAZY d_post
            # pin and the touched pin inside this one job.
            d_grams = d_post.select("g").distinct()
            c_old = (
                stored.join(d_grams, "g", "left_semi")
                .groupBy("g")
                .agg(F.count(F.lit(1)).alias("c_old"))
            )
            # flipped: stored count 1, any delta occurrence pushes ≥ 2
            flipped = c_old.filter(F.col("c_old") == 1).select("g")
            t = (
                stored.join(flipped, "g", "left_semi")
                .select("id")
                .distinct()
                .localCheckpoint(eager=False)
            )
            return t, t.count()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_b, f_o, f_t = (
                pool.submit(_bounds),
                pool.submit(_overlap),
                pool.submit(_touched),
            )
            bounds, n_overlap, (touched, n_touched) = (
                f_b.result(),
                f_o.result(),
                f_t.result(),
            )
        if bounds["lo"] is None:
            return {"delta_rows": 0, "touched_old": 0, "spans_rewritten": 0}
        if int(bounds["nd"]) != int(bounds["n"]):
            raise ValueError(
                "RepeatIndex.update: delta contains duplicate ids "
                f"({bounds['n']} rows, {bounds['nd']} distinct) — one row "
                "per document id is required"
            )
        if n_overlap:
            raise ValueError(
                "RepeatIndex.update: id-disjointness contract violated — "
                f"{n_overlap} stored posting rows share ids with the delta; "
                "re-ingesting an indexed doc would double its gram counts"
            )

        # re-evaluate: delta docs + touched old docs, repeated status
        # from MERGED counts restricted to the eval docs' grams
        old_eval = old_docs.join(
            touched.withColumnRenamed("id", m["id_col"]), m["id_col"], "left_semi"
        )
        eval_pos = dpos.unionByName(
            self._pos(old_eval, m["text_col"], m["id_col"], span_n)
        ).localCheckpoint(eager=False)
        e_grams = eval_pos.select("g").distinct()
        c_stored = (
            stored.join(e_grams, "g", "left_semi")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cs"))
        )
        c_delta = d_post.groupBy("g").agg(F.count(F.lit(1)).alias("cd"))
        rep_g = (
            c_stored.join(c_delta, "g", "full")
            .filter(
                F.coalesce("cs", F.lit(0)) + F.coalesce("cd", F.lit(0)) >= 2
            )
            .select("g")
        )
        shared = eval_pos.join(rep_g, "g").select("id", "n_words", "pos")
        gen = int(m["n_updates"]) + 1
        new_spans = (
            _island_spans(shared, span_n)
            .withColumn("gen", F.lit(gen))
            .localCheckpoint(eager=False)  # the count below materializes
        )
        n_spans = new_spans.count()

        # persist: postings append + spans upsert (higher-gen append,
        # last-wins at read) — independent appends of already-pinned
        # frames, overlapped from driver threads (the freed-write-order
        # treatment; the crash contract never depended on their order:
        # both are above the meta stamp until the meta write lands)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [
                pool.submit(
                    d_post.withColumn(
                        "seg", F.lit(gen).cast("bigint")
                    ).write.mode("append").parquet,
                    f"{p}/postings",
                ),
                pool.submit(
                    new_spans.write.mode("append").parquet, f"{p}/spans"
                ),
            ]:
                fut.result()
        m["max_doc_id"] = max(int(m["max_doc_id"]), int(bounds["hi"]))
        m["n_updates"] = int(m["n_updates"]) + 1
        self._write_meta()
        return {
            "delta_rows": int(bounds["n"]),
            "touched_old": int(n_touched),
            "spans_rewritten": int(n_spans),
        }

    # ---------------------------------------------------------- retraction

    def retract(self, ids: DataFrame, old_docs: DataFrame) -> dict:
        """Remove indexed documents — :meth:`update`'s flip machinery
        run BACKWARDS: retracting a doc can flip a stored gram's
        distinct-document count 2 → 1, un-repeating positions in the
        single SURVIVING doc that holds it, so exactly those touched
        docs are re-evaluated against the surviving counts (their
        texts come from ``old_docs``, the same caller contract as
        update — the index stores postings, not texts; the RETRACTED
        docs' texts are NOT needed, their postings are stored). Cost
        is bounded by the retracted docs' postings plus the flipped
        grams' survivors — never a corpus re-scan; ``retract(r)``
        equals ``build(corpus ∖ r)`` on the views (oracle-gated, t42).

        Persistence mirrors :class:`TrigramLM`'s retraction-sequence
        commit (the id high-water mark cannot gate deletions): the
        ``retracted`` ledger appends the ids at ``rseq = k+1``, span
        re-evaluations land as ``gen = n_updates+1`` upserts (a doc
        that lost its LAST repeat gets an ``n_spans = 0`` DELETE
        sentinel — the spans view filters it), and meta commits both
        counters last. A replay purges its own uncommitted halves
        (identified by the uncommitted ledger rows) and re-lands; a
        fully-committed replay skips idempotently; retracted ids stay
        dead (update refuses their reuse). Postings/span rows of
        retracted docs stay physical until :meth:`compact` resolves
        them — reads filter via a broadcast anti-join, bounded by the
        maintenance cadence. Single-writer-fenced."""
        from .lease import dir_lease

        with dir_lease(self._path, role="RepeatIndex.retract"):
            return self._retract_unfenced(ids, old_docs)

    def _retract_unfenced(self, ids: DataFrame, old_docs: DataFrame) -> dict:
        spark, p, m = self._spark, self._path, self.meta
        n_u = int(m["n_updates"])
        n_r = int(m.get("n_retractions") or 0)
        r_ids = (
            ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        n_ids = r_ids.count()
        if n_ids == 0:
            return {"retracted": 0, "touched_old": 0, "spans_rewritten": 0}
        hi = r_ids.agg(F.max("id")).first()[0]
        if int(hi) > int(m["max_doc_id"]):
            raise ValueError(
                "RepeatIndex.retract: delta contains id(s) above the indexed "
                f"high-water mark {m['max_doc_id']} — those documents were "
                "never ingested into this index"
            )
        led_path = f"{p}/retracted"
        led = None
        if _parquet_dir_exists(led_path):
            _recover_swapped_dir(led_path)
            led = spark.read.parquet(led_path)
            unc = led.filter(F.col("rseq") > n_r).select("id").distinct()
            if unc.limit(1).count():
                # a previous retraction crashed mid-protocol; only its
                # own replay (identical id set) may purge and re-land
                if (
                    unc.join(r_ids, "id", "left_anti").limit(1).count()
                    or r_ids.join(unc, "id", "left_anti").limit(1).count()
                ):
                    raise ValueError(
                        "RepeatIndex.retract: uncommitted ledger rows from "
                        "a DIFFERENT torn retraction are on disk — replay "
                        "that retraction (same ids) before this one"
                    )
                # ORDER: purge the orphan span generations FIRST and
                # the ledger LAST — the uncommitted ledger rows are
                # the only signal the orphan gens exist, so purging
                # the ledger first would (on a crash in between) leave
                # the orphans to be misread as a torn UPDATE by the
                # gen-check below on the next attempt. Spans-first is
                # idempotent: a crash before the ledger purge re-enters
                # this branch and the gen filter is a no-op.
                _recover_swapped_dir(f"{p}/spans")
                _rewrite_parquet_dir(
                    spark,
                    f"{p}/spans",
                    spark.read.parquet(f"{p}/spans").filter(
                        F.col("gen") <= n_u
                    ),
                    1 << 20,
                )
                _rewrite_parquet_dir(
                    spark, led_path, led.filter(F.col("rseq") <= n_r), 1 << 20
                )
                led = spark.read.parquet(led_path)
        if (
            spark.read.parquet(f"{p}/spans")
            .filter(F.col("gen") > n_u)
            .limit(1)
            .count()
        ):
            raise ValueError(
                "RepeatIndex.retract: span rows beyond the committed "
                "generation with no matching retraction ledger — a torn "
                "UPDATE is on disk; replay that batch (the streaming "
                "absorber's redo) before retracting"
            )
        if led is not None:
            committed = led.filter(F.col("rseq") <= n_r).select("id")
            n_in = r_ids.join(committed, "id", "left_semi").count()
            if n_in == n_ids:
                return {
                    "retracted": 0,
                    "touched_old": 0,
                    "spans_rewritten": 0,
                    "replayed": True,
                }
            if n_in:
                raise ValueError(
                    f"RepeatIndex.retract: {n_in} of {n_ids} id(s) are "
                    "already retracted — a partial overlap would "
                    "re-evaluate against wrong counts; retract only new ids"
                )

        # ---- flips: grams whose surviving distinct-doc count drops
        # to 1. Round 10 (VERDICT r9 Next #3) cut the locate cost from
        # FOUR full postings scans to ONE: with the maintained
        # gram_counts substrate (counts_seg-validated), per-gram live
        # totals come from counts arithmetic — base counts + the
        # post-compact tail segments − tombstoned base rows — instead
        # of postings aggregates, and the flipped-gram locate runs as
        # a literal IN filter over the g-SORTED compacted layout, so
        # parquet file/row-group statistics prune the scan. The one
        # irreducible full scan left is locating the retracted docs'
        # own posting rows (id-keyed against a g-sorted layout). A
        # state without valid counts (pre-compact legacy, or a crash
        # inside compact's invalidate window) takes the exact
        # fused-aggregate fallback — slower, identical rows.
        stored = self.postings()  # committed tombstones already filtered
        r_post = stored.join(
            F.broadcast(r_ids), "id", "left_semi"
        ).localCheckpoint(eager=False)
        r_grams = r_post.select("g").distinct()
        have_counts = m.get("counts_seg") is not None and _parquet_dir_exists(
            f"{p}/gram_counts"
        )
        if have_counts:
            cseg = int(m["counts_seg"])
            raw = self._raw_postings()
            tombs = self._tombstones()

            def _live_counts(G: DataFrame) -> DataFrame:
                """(g, ct) live doc counts for grams in ``G``:
                counts base + post-counts_seg tail − tombstoned base
                rows (stale tombstones self-correct: their rows are
                physically gone, so the correction counts zero)."""
                base = spark.read.parquet(f"{p}/gram_counts").join(
                    G, "g", "left_semi"
                )
                tail = raw.filter(F.col("seg") > cseg).join(
                    G, "g", "left_semi"
                )
                corr = None
                if tombs is not None:
                    tail = tail.join(F.broadcast(tombs), "id", "left_anti")
                    corr = (
                        raw.filter(F.col("seg") <= cseg)
                        .join(F.broadcast(tombs), "id", "left_semi")
                        .join(G, "g", "left_semi")
                        .groupBy("g")
                        .agg(F.count(F.lit(1)).alias("dc"))
                    )
                tailc = tail.groupBy("g").agg(F.count(F.lit(1)).alias("tc"))
                out = base.join(tailc, "g", "full")
                expr = F.coalesce("c", F.lit(0)) + F.coalesce("tc", F.lit(0))
                if corr is not None:
                    out = out.join(corr, "g", "full")
                    expr = expr - F.coalesce("dc", F.lit(0))
                return out.select("g", expr.alias("ct")).filter(
                    F.col("ct") > 0
                )

            cr_g = r_post.groupBy("g").agg(F.count(F.lit(1)).alias("cr"))
            g_counts = _live_counts(r_grams).join(cr_g, "g", "left").select(
                "g", "ct", F.coalesce("cr", F.lit(0)).alias("cr")
            )
        else:
            flag = r_ids.withColumn("__r", F.lit(1))
            g_counts = (
                stored.join(r_grams, "g", "left_semi")
                .join(F.broadcast(flag), "id", "left")
                .groupBy("g")
                .agg(
                    F.count(F.lit(1)).alias("ct"),
                    F.sum(F.coalesce("__r", F.lit(0))).alias("cr"),
                )
            )
        flipped = g_counts.filter(
            F.col("ct") - F.col("cr") == 1
        ).select("g")
        if have_counts:
            # flipped is bounded by the retracted docs' gram set and
            # in practice tiny — collect it and push a LITERAL IN
            # filter so the g-sorted layout's file statistics prune
            # (a semi join cannot prune parquet files); beyond the
            # literal budget, fall back to the join
            f_list = [row["g"] for row in flipped.limit(2049).collect()]
            if len(f_list) <= 2048:
                cand_rows = (
                    stored.filter(F.col("g").isin(f_list))
                    if f_list
                    else stored.filter(F.lit(False))
                )
            else:
                cand_rows = stored.join(flipped, "g", "left_semi")
        else:
            cand_rows = stored.join(flipped, "g", "left_semi")
        affected = (
            cand_rows.join(F.broadcast(r_ids), "id", "left_anti")
            .select("id")
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_affected = affected.count()

        gen = n_u + 1
        upsert = None
        n_upsert = 0
        if n_affected:
            icol, tcol, span_n = m["id_col"], m["text_col"], m["span_n"]
            eval_docs = old_docs.join(
                affected.withColumnRenamed("id", icol), icol, "left_semi"
            ).join(
                r_ids.withColumnRenamed("id", icol), icol, "left_anti"
            )
            eval_pos = self._pos(eval_docs, tcol, icol, span_n).localCheckpoint(
                eager=False
            )
            # completeness from eval_pos itself — one corpus scan, not
            # two: every affected doc HOLDS a flipped-gram posting, so
            # it is ≥ span_n words and must appear in the gram frame;
            # a missing id can only mean old_docs lacks its text
            n_eval = eval_pos.select("id").distinct().count()
            if n_eval != n_affected:
                raise ValueError(
                    "RepeatIndex.retract: old_docs is missing texts for "
                    f"{n_affected - n_eval} of {n_affected} touched docs — "
                    "re-evaluation against partial texts would silently "
                    "under-count surviving repeats"
                )
            e_grams = eval_pos.select("g").distinct()
            if have_counts:
                # survivor counts by ARITHMETIC — live total minus the
                # retracted docs' own rows — replacing the full
                # survivors scan with a counts-substrate read
                cr_e = r_post.groupBy("g").agg(
                    F.count(F.lit(1)).alias("crr")
                )
                c_surv = _live_counts(e_grams).join(cr_e, "g", "left").select(
                    "g",
                    (F.col("ct") - F.coalesce("crr", F.lit(0))).alias("cs"),
                )
            else:
                surv = stored.join(F.broadcast(r_ids), "id", "left_anti")
                c_surv = (
                    surv.join(e_grams, "g", "left_semi")
                    .groupBy("g")
                    .agg(F.count(F.lit(1)).alias("cs"))
                )
            rep_g = c_surv.filter(F.col("cs") >= 2).select("g")
            shared = eval_pos.join(rep_g, "g").select("id", "n_words", "pos")
            new_spans = _island_spans(shared, span_n).withColumn(
                "gen", F.lit(gen)
            )
            # a touched doc that lost its LAST repeat emits no island
            # row — upsert the DELETE sentinel so the stale row stops
            # winning the last-wins merge
            sentinel = affected.join(
                new_spans.select("id"), "id", "left_anti"
            ).select(
                "id",
                *[
                    F.lit(0).cast(new_spans.schema[c].dataType).alias(c)
                    for c in (
                        "n_spans",
                        "repeat_words",
                        "max_span_words",
                        "max_span_start",
                    )
                ],
                F.lit(0.0).cast("double").alias("repeat_frac"),
                F.lit(gen).cast(new_spans.schema["gen"].dataType).alias("gen"),
            )
            upsert = new_spans.unionByName(sentinel).localCheckpoint(
                eager=False
            )
            n_upsert = upsert.count()

        # ---- the commit: ledger (uncommitted until the meta bump),
        # span upserts, then meta — see the crash-window reasoning in
        # the docstring
        r_ids.select(
            "id", F.lit(n_r + 1).cast("bigint").alias("rseq")
        ).write.mode("append").parquet(led_path)
        if upsert is not None:
            upsert.write.mode("append").parquet(f"{p}/spans")
        m["n_updates"] = gen
        m["n_retractions"] = n_r + 1
        self._write_meta()
        return {
            "retracted": int(n_ids),
            "touched_old": int(n_affected),
            "spans_rewritten": int(n_upsert),
        }

    # ---------------------------------------------------------- streaming

    @classmethod
    def foreach_batch_update(cls, spark, index_path: str, corpus_path: str):
        """Structured-Streaming ingestion — the RepeatIndex member of
        the family (`incremental.foreach_batch_update`,
        `vectorops.foreach_batch_add`): a ``(batch_df, batch_id) ->
        None`` function for ``writeStream.foreachBatch`` that appends
        each micro-batch to the corpus parquet log at ``corpus_path``
        AND absorbs it as one :meth:`update`. Because ``update`` needs
        the old TEXTS of touched docs, the helper co-maintains the
        corpus log the index was built from — pass the directory the
        index's ``build`` corpus lives in.

        The STREAMING form imposes the monotone-id contract (batch ids
        strictly above ``meta.max_doc_id`` — this is what the
        otherwise-informational counter is for): a fully replayed
        batch is skipped idempotently, a straddling batch raises. The
        corpus append runs FIRST and is itself replay-guarded against
        the corpus max id, so the crash window between the two writes
        (the engine's documented non-atomic seam) recovers on replay
        instead of duplicating rows."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            idx = cls.load(spark, index_path)
            id_col = idx.meta["id_col"]
            b = batch_df.agg(
                F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
            ).first()
            if b["hi"] is None:
                return
            if b["hi"] <= idx.meta["max_doc_id"]:
                return  # fully-replayed batch — already absorbed
            if b["lo"] <= idx.meta["max_doc_id"]:
                raise ValueError(
                    "RepeatIndex.foreach_batch_update: monotone-id contract "
                    f"violated — batch ids straddle the indexed max "
                    f"{idx.meta['max_doc_id']} (lo={b['lo']}, hi={b['hi']})"
                )
            corpus = spark.read.parquet(corpus_path)
            c_hi = corpus.agg(F.max(id_col)).first()[0]
            if c_hi is None or c_hi < b["lo"]:
                batch_df.write.mode("append").parquet(corpus_path)
            elif c_hi < b["hi"]:
                raise ValueError(
                    "RepeatIndex.foreach_batch_update: corpus log partially "
                    f"overlaps the batch (corpus max {c_hi} inside "
                    f"[{b['lo']}, {b['hi']}]) — torn corpus append; repair "
                    "the corpus log before resuming"
                )
            else:
                # corpus max covers the batch — but a torn MULTI-FILE
                # append can commit the part-file holding the batch's
                # max id while losing others, which satisfies
                # c_hi >= hi with rows in [lo, hi] missing; skipping
                # the append then silently breaks update == rebuild
                # (touched-doc re-eval misses the lost texts). Verify
                # completeness with one aggregate before trusting it.
                n_disk = corpus.filter(
                    F.col(id_col).between(int(b["lo"]), int(b["hi"]))
                ).count()
                n_batch = batch_df.count()
                if n_disk != n_batch:
                    raise ValueError(
                        "RepeatIndex.foreach_batch_update: corpus log max "
                        f"covers the batch but holds {n_disk} rows in "
                        f"[{b['lo']}, {b['hi']}] vs the batch's {n_batch} "
                        "— torn corpus append; repair the corpus log "
                        "before resuming"
                    )
                # corpus holds the whole batch (crash landed between
                # the corpus append and the index update — recover by
                # redoing only the index half)
            idx.update(
                batch_df, old_docs=corpus.filter(F.col(id_col) < b["lo"])
            )

        return absorb

    @classmethod
    def foreach_batch_retract(cls, spark, index_path: str, corpus_path: str):
        """Structured-Streaming DELETION feed — the deletion twin of
        :meth:`foreach_batch_update` (opt-out / takedown streams): a
        ``(batch_df, batch_id) -> None`` function for
        ``writeStream.foreachBatch`` landing each micro-batch of doc
        ids as one :meth:`retract`. At-least-once safety: ids already
        in the committed ledger (a replayed batch, or duplicate
        deletion requests across batches) are pre-filtered, so every
        replay converges and repeats absorb silently; a torn previous
        landing is purged-and-relanded by retract's own protocol (the
        pre-filter makes the replay's fresh set equal the torn
        attempt's, which is what its same-ids rule requires).
        ``corpus_path`` is the co-maintained corpus log — touched
        survivors' texts come from it (the retracted docs' own texts
        are never needed)."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            idx = cls.load(spark, index_path)
            ids = batch_df.select(
                F.col(batch_df.columns[0]).cast("long").alias("id")
            ).distinct()
            t = idx._tombstones()
            if t is not None:
                ids = ids.join(F.broadcast(t), "id", "left_anti")
            ids = ids.localCheckpoint()
            if ids.first() is None:
                return  # fully absorbed already
            icol = idx.meta["id_col"]
            corpus = spark.read.parquet(corpus_path)
            old = corpus.join(
                ids.withColumnRenamed("id", icol), icol, "left_anti"
            )
            if t is not None:
                old = old.join(
                    F.broadcast(t.withColumnRenamed("id", icol)),
                    icol,
                    "left_anti",
                )
            idx.retract(ids, old_docs=old)

        return absorb

    # ------------------------------------------------------------ compact

    def compact(self, *, target_rows_per_file: int = 1 << 20) -> dict:
        """Resolve the last-wins merge once (shadowed span rows
        dropped, ``gen`` preserved so later updates still shadow
        correctly) and re-layout both append logs — the same lifecycle
        operation as ``CurationState.compact`` (views row-identical
        before/after, later updates compose). Single-writer-fenced
        (see :mod:`..lease`): a concurrent absorber on the same
        directory is refused loudly instead of its append being
        dropped by the rename-aside swap."""
        from .lease import dir_lease

        with dir_lease(self._path, role="RepeatIndex.compact"):
            return self._compact_unfenced(
                target_rows_per_file=target_rows_per_file
            )

    def _compact_unfenced(self, *, target_rows_per_file: int = 1 << 20) -> dict:
        spark, p, m = self._spark, self._path, self.meta
        log = spark.read.parquet(f"{p}/spans")
        n_u = int(m["n_updates"])
        n_r = int(m.get("n_retractions") or 0)
        # refuse uncommitted rows of either protocol: resolving the
        # last-wins merge would COMMIT a torn write's shadow row (and
        # destroy the committed row the replay needs) — the same
        # guard class as CurationState.compact's pending-marker refuse
        torn = bool(log.filter(F.col("gen") > n_u).limit(1).count())
        has_led = _parquet_dir_exists(f"{p}/retracted")
        if not torn and has_led:
            torn = bool(
                spark.read.parquet(f"{p}/retracted")
                .filter(F.col("rseq") > n_r)
                .limit(1)
                .count()
            )
        if torn:
            raise TornStateError(
                "RepeatIndex.compact: uncommitted span generations or "
                "ledger rows on disk — a previous update/retraction "
                "crashed before its meta commit; replay that delta before "
                "compacting"
            )
        w = W.partitionBy("id").orderBy(F.col("gen").desc())
        resolved = (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            # DELETE sentinels are safe to drop once the shadowed rows
            # they beat are dropped by the same resolve
            .filter(F.col("n_spans") > 0)
        )
        t = self._tombstones()
        if t is not None:
            resolved = resolved.join(F.broadcast(t), "id", "left_anti")
        # counts protocol (round 10): INVALIDATE counts_seg first —
        # the postings rewrite below folds every segment to 0 and
        # resolves tombstones, which changes exactly what the stored
        # gram_counts cover; a crash after any prefix then leaves the
        # retract fast path disabled (falling back to exact scans)
        # instead of silently wrong. Re-VALIDATE only after both the
        # folded postings and the recounted gram_counts landed.
        m["counts_seg"] = None
        self._write_meta()
        live_post = (
            self.postings()
            .withColumn("seg", F.lit(0).cast("bigint"))
            .localCheckpoint()
        )
        out = {
            "spans": _rewrite_parquet_dir(
                spark, f"{p}/spans", resolved, target_rows_per_file
            ),
            # g-sorted layout: tight per-file min/max on the gram key,
            # so the retraction's flipped-gram locate prunes files
            "postings": _rewrite_parquet_dir(
                spark,
                f"{p}/postings",
                live_post,
                target_rows_per_file,
                order_by=["g"],
            ),
        }
        counts = live_post.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        if _parquet_dir_exists(f"{p}/gram_counts"):
            out["gram_counts"] = _rewrite_parquet_dir(
                spark, f"{p}/gram_counts", counts, target_rows_per_file
            )
        else:
            counts.write.mode("overwrite").parquet(f"{p}/gram_counts")
        if has_led:
            out["retracted"] = _rewrite_parquet_dir(
                spark,
                f"{p}/retracted",
                spark.read.parquet(f"{p}/retracted").filter(
                    F.col("rseq") <= n_r
                ),
                target_rows_per_file,
            )
            _stamp_resolved_retractions(p, n_r)
        m["counts_seg"] = int(m["n_updates"])
        self._write_meta()
        return out


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash over the word bag: per token take the low 16 bits
    of md5, per bit position sum ±1 votes, sign → bit. 16 bits keeps
    the expression oracle-checkable; a 64-bit variant is the same plan
    with a wider loop."""
    words = F.array_distinct(normalized_words(col))
    token_h = F.transform(words, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int"))
    bits = []
    for i in range(16):
        votes = F.aggregate(
            token_h,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, w: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash fingerprinting
    scheme of Schleimer/Wilkerson/Aiken, MOSS): hash every word
    ``n``-gram, slide a window of ``w`` consecutive shingle hashes,
    keep the minimum of each window, dedupe. Guarantees any match of
    length ≥ w+n-1 words shares a fingerprint. Documents with fewer
    than ``w`` shingles keep ONE fingerprint (the min over all their
    hashes — the standard short-document fallback) instead of
    vanishing from the output and never matching anything.

    Plan: posexplode shingles → per-(doc, pos) hash → window MIN
    over [pos, pos+w-1] (rows-frame, partitioned by doc — bounded
    per-doc state, codegen) → distinct. → (id, fp).

    ``hash_family``: "md5" (default, the oracle family — 40-bit hex
    substring, DuckDB-identical) or "xxhash64" (production — one
    codegen call, 8-byte BIGINT fingerprints instead of 10-char
    strings through the window + distinct shuffles; round 9,
    completing the SCALE.md md5→xxhash swap). Same plan shape; the
    winnowing guarantee (any match ≥ w+n-1 words shares a
    fingerprint) is hash-independent and self-consistency-gated."""
    if hash_family == "xxhash64":
        h = F.xxhash64("shingle")
    elif hash_family == "md5":
        h = F.substring(F.md5("shingle"), 1, 10)
    else:
        raise ValueError(
            f"winnow_fingerprints: unknown hash_family {hash_family!r} "
            "(expected 'md5' or 'xxhash64')"
        )
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(shingles(normalized_words(text_col), n)).alias("pos", "shingle"),
    ).select("id", "pos", h.alias("h"))
    win = W.partitionBy("id").orderBy("pos").rowsBetween(W.currentRow, w - 1)
    n_sh = W.partitionBy("id")
    return (
        pos.select(
            "id",
            "pos",
            F.min("h").over(win).alias("fp"),
            F.max("pos").over(n_sh).alias("max_pos"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("max_pos") - (w - 1), F.lit(0)))
        .select("id", "fp")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    prop_rounds: int = 8,
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """Duplicate clusters from a candidate-pair edge list → (id,
    cluster) with cluster = the smallest member id of the component.
    The step after LSH mining in a dedup pipeline — keep one doc per
    cluster.

    ADAPTIVE two-regime design. Regime 1 (the fast path): min-label
    propagation with pointer-jumping compression — the dup-cluster
    graphs real corpora produce are near-cliques / stars of diameter
    1-3, and propagation settles them in 1-3 rounds of ONE scheduled
    job each. Regime 2 (the deep-graph fallback): if propagation has
    not converged after ``prop_rounds`` rounds, the graph has real
    diameter — and label propagation is Θ(diameter) no matter how
    the pointers are compressed when node ids are laid out
    adversarially (local minima act as traps: measured on a
    12.8k-blob structured-media corpus, a 960-node component of
    diameter ≥ 63 needed 52 propagation rounds, and extra jump steps
    per round did not reduce it). The fallback switches to
    alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) —
    O(log² n) rounds INDEPENDENT of diameter (the same graph
    contracts in 7 rounds) — seeded with the labels found so far,
    encoded as extra (label, member) edges so regime-1 progress is
    kept.

    Scale design (each pitfall here was a measured 5-25x at sf0.1):
    - ``localCheckpoint()`` on the edge list AND on every round's
      label frame: truncates lineage so iteration N's job replays
      nothing of rounds 0..N-1 (and the upstream LSH mining runs
      exactly once — the symmetric union is built FROM the
      checkpointed pairs, not by evaluating ``pairs`` twice).
    - ONE action per propagation round: the round's job is the
      checkpoint materialization; the convergence test is then a
      trivial ``agg`` over the checkpointed partitions, not a second
      pass of the join.
    Labels only ever decrease toward the component minimum, so
    duplicate edges are harmless (no ``distinct`` shuffle on the edge
    list in the fast path). Raises after ``max_iter`` star rounds
    without a fixpoint — a runaway backstop only; log²-convergence
    makes 50 unreachable for any real graph.

    SIZE-ADAPTIVE execution (round 9 — the m9/m10 warm-cost trim):
    the edge pin is a LAZY checkpoint materialized by a ``count()``
    on ``p`` itself — one job that both pins the edge list and sizes
    it (the count action runs BEFORE the symmetric union reads ``p``
    twice, so the mining plan still executes exactly once). A graph
    at or under ``small_graph_edges`` (default 100k edges — a
    broadcast-class payload, single-digit MB) is then solved EXACTLY
    on the driver with path-compressed min-root union-find and
    returned as one 1-slice frame: the same size-threshold judgment
    a broadcast hash join makes, applied to the one operator whose
    distributed form pays per-ROUND driver latency (measured on the
    media graph: 0.09 s of execution under 1.3 s of per-round plan
    construction — job scheduling and Catalyst analysis, not
    compute, at any partition count). The result is identical by
    construction — the Hypothesis property test compares BOTH
    regimes against union-find. Above the threshold nothing changes:
    the propagation loop + star-contraction fallback run exactly as
    before, which is the only shape that works when the edge list is
    1000 executors wide."""
    p = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).localCheckpoint(
        eager=False
    )
    n_edges = p.count()  # pins AND sizes in one job
    if n_edges <= small_graph_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in p.collect():
            u, v = r["u"], r["v"]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru  # larger root under smaller → root = min
        t = p.schema["u"].dataType.simpleString()
        return _single_partition_df(
            p.sparkSession,
            sorted((x, find(x)) for x in parent),
            f"id {t}, cluster {t}",
        )
    edges = p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # fused round 0: starting from identity labels, the first
    # neighbor-min round reduces to min(self, min neighbor) — ONE
    # groupBy instead of a full join+jump round. Still a valid
    # monotone state (every label is a member id ≥ the component
    # min), so the loop's invariants and termination are unchanged;
    # for the star/pair shapes dup clusters actually take, the loop
    # then converges in its first confirming round. LAZY checkpoint:
    # the first convergence agg materializes it in the same job (its
    # consumers meet at this groupBy's shuffle boundary, so nothing
    # upstream is recomputed); a dedicated round-0 job bought nothing.
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least(F.col("u"), F.col("__mv")).alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(prop_rounds):
        neighbor_min = (
            edges.join(labels.select(F.col("u").alias("v"), "lbl"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        prop = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.least("lbl", "nlbl").alias("lbl"),
            (F.col("nlbl") < F.col("lbl")).alias("chg"),
        )
        jump = prop.select(F.col("u").alias("j_u"), F.col("lbl").alias("j_lbl"))
        new_labels = (
            prop.join(jump, prop["lbl"] == jump["j_u"], "left")
            .select(
                "u",
                F.least("lbl", "j_lbl").alias("lbl"),
                (F.col("chg") | (F.col("j_lbl") < F.col("lbl"))).alias("chg"),
            )
            # LAZY checkpoint: the convergence agg below is the round's
            # ONE action — it materializes the round's join DAG and
            # checkpoints it in the same job (eager + separate agg was
            # two scheduled jobs per round for the same work; the
            # next round then reads the truncated lineage either way)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum(F.col("chg").cast("int"))).first()[0] or 0
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    else:
        # deep graph: contract with large-star/small-star, keeping the
        # propagation progress as (label, member) edges — label ≤
        # member by the monotone invariant, so they are already
        # canonical; the final star roots ARE the component minima
        canon = p.filter(F.col("u") != F.col("v")).select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        aug = canon.unionByName(
            labels.filter(F.col("lbl") != F.col("u")).select(
                F.col("lbl").alias("u"), F.col("u").alias("v")
            )
        )
        star = _star_contract(aug.distinct().localCheckpoint(), max_iter)
        labels = (
            labels.select("u")
            .join(
                star.select(F.col("v").alias("u"), F.col("u").alias("root")),
                "u",
                "left",
            )
            .select("u", F.coalesce("root", F.col("u")).alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("u").alias("id"), F.col("lbl").alias("cluster"))


def _star_contract(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction over a canonical
    (u < v, deduplicated) edge frame → the star-forest fixpoint
    (u = component-minimum root, v = member), in O(log² n) rounds
    regardless of graph diameter (Kiveris et al., SoCC 2014 — public
    algorithm, original implementation).

    Large-star step: every edge (u, v) is rewritten to (m, v) where m
    is the minimum of u's CLOSED symmetric neighborhood (m ≤ u < v
    keeps the pair canonical and self-edge-free). Small-star step:
    each node v with smaller-neighbor set Ns attaches them all — and
    itself — to min(Ns). Convergence flags are EMISSION-level and
    quiesce exactly at the star-forest fixpoint: a large-star group
    whose closed-neighborhood min is not itself, or a small-star
    group with more than one smaller neighbor, each mean the edge set
    can still move; when neither fires, every smaller endpoint is its
    own closed-neighborhood min and every larger endpoint has exactly
    one smaller neighbor — a star forest rooted at component minima.
    Each phase eager-checkpoints its emissions (flat lineage; the
    per-phase flag agg then reads checkpointed partitions), and the
    emission count never exceeds |edges| + |distinct larger
    endpoints|, so no phase can blow the edge set up."""
    for _ in range(max_iter):
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("u", "__mn").alias("m"))
        )
        ls = (
            edges.join(mins, "u")
            .select(
                F.col("m").alias("nu"),
                F.col("v").alias("nv"),
                (F.col("m") != F.col("u")).alias("chg"),
            )
            .localCheckpoint()
        )
        chg_large = bool(ls.agg(F.max("chg")).first()[0])
        edges = (
            ls.select(F.col("nu").alias("u"), F.col("nv").alias("v"))
            .distinct()
            .localCheckpoint()
        )

        smins = edges.groupBy("v").agg(
            F.min("u").alias("m"), F.count(F.lit(1)).alias("__deg")
        )
        ss = (
            smins.select(
                F.col("m").alias("nu"),
                F.col("v").alias("nv"),
                (F.col("__deg") > 1).alias("chg"),
            )
            .unionByName(
                edges.join(smins, "v")
                .filter(F.col("u") != F.col("m"))
                .select(
                    F.col("m").alias("nu"),
                    F.col("u").alias("nv"),
                    F.lit(True).alias("chg"),
                )
            )
            .localCheckpoint()
        )
        chg_small = bool(ss.agg(F.max("chg")).first()[0])
        edges = (
            ss.select(F.col("nu").alias("u"), F.col("nv").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        if not chg_large and not chg_small:
            return edges
    raise RuntimeError(
        f"_star_contract: no star-forest fixpoint in {max_iter} rounds"
    )


def _local_path(path: str) -> str:
    """Strip a ``file:`` scheme for driver-side filesystem operations
    (compaction's delete+rename swap). This engine targets the local
    filesystem; an object-store deployment fronts the same directories
    with a transactional table format and gets compaction's swap as a
    metadata commit instead."""
    return path[len("file:"):] if path.startswith("file:") else path


def _same_dir(a: str, b: str) -> bool:
    """True when two directory paths resolve to the same filesystem
    location — the as-of branch guard's equality test (``save`` from a
    historical view must refuse its own source; a relative spelling or
    a symlink must not slip past the check)."""
    import os

    return os.path.realpath(os.path.abspath(_local_path(a))) == os.path.realpath(
        os.path.abspath(_local_path(b))
    )


def _single_partition_df(spark, rows: list, schema: str) -> DataFrame:
    """1-slice ``createDataFrame`` for control-plane frames (meta rows,
    empty log initializers). The default path parallelizes a tiny
    Python list into ``defaultParallelism`` slices, and a downstream
    ``coalesce(1)`` then evaluates ALL of them serially inside one
    task — every empty slice still pays a Python-worker round trip
    (~150 ms × 32 slices ≈ 5 s per 1-row meta write, measured on
    local[32]). One slice from the start writes the same single file
    in ~0.5 s and keeps state-maintenance wall time out of the
    scheduler."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _write_control_parquet(path: str, rows: list, schema: str) -> None:
    """Driver-side overwrite of a CONTROL-PLANE parquet directory (meta
    rows, empty log initializers) via pyarrow — no Spark job at all.

    The Spark path for a 1-row meta write costs a full scheduled job
    (~0.4 s on local[32]: py4j round trips + task launch + commit
    protocol) and the state-maintenance gates (t0/t34/t36/t38/v16)
    each pay it up to three times. The bytes are the same parquet any
    engine reads back (``spark.read.parquet`` infers the identical
    schema from the footer; asserted by the round-trip tests that
    cover every meta consumer). Driver-local filesystem only — the
    same constraint as compaction's rename swap (:func:`_local_path`);
    an object-store deployment fronts these directories with a table
    format whose commit IS a metadata write."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    arrow_schema = to_arrow_schema(_parse_datatype_string(schema))
    cols = [
        [row[i] for row in rows] for i in range(len(arrow_schema.names))
    ]
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
        schema=arrow_schema,
    )
    local = _local_path(path)
    tmp = local + ".__meta__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
    if os.path.isdir(local):
        old = local + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(local, old)
        os.rename(tmp, local)
        shutil.rmtree(old)
    else:
        os.rename(tmp, local)


def _append_control_parquet(
    path: str, rows: list, schema: str, name: str | None = None
) -> None:
    """Driver-side APPEND of control-plane rows: one parquet file
    added to ``path`` via pyarrow — the append-log twin of
    :func:`_write_control_parquet`, with the same no-Spark-job
    rationale (a 1-row manifest append must not cost a scheduled job
    per commit) and the same driver-local-filesystem constraint. The
    write is atomic for readers (dot-prefixed temp + rename — Spark
    ignores dotfiles). A DETERMINISTIC ``name`` makes the append
    physically idempotent: a crash-replay re-landing the same logical
    row overwrites the same file instead of duplicating it, keeping
    file-level snapshots byte-identical across replays (the chaos
    suite's convergence standard)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    arrow_schema = to_arrow_schema(_parse_datatype_string(schema))
    cols = [
        [row[i] for row in rows] for i in range(len(arrow_schema.names))
    ]
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
        schema=arrow_schema,
    )
    local = _local_path(path)
    os.makedirs(local, exist_ok=True)
    if name is None:
        name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(local, f".{name}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(local, name))


def _stamp_resolved_retractions(path: str, resolved_rseq: int) -> None:
    """Sidecar resolution stamp (round 10) written by every family
    ``compact()`` that physically resolves committed retractions
    while RETAINING the ledger as its audit / replay-refusal record:
    rows with ``rseq <= resolved_rseq`` are already folded into the
    substrates (their anti-joins are no-ops), rows above it are
    committed-but-unresolved and still carry a real per-read tax.
    :func:`maintenance._tombstone_pressure` counts only the latter,
    so the tombstone-threshold compaction trigger can't re-fire
    forever on an already-resolved ledger. One control-plane row;
    consumers clamp to the meta's current ``n_retractions`` so a
    stale stamp from a previous state incarnation (sequence restart
    at a fresh ``save()``) can never hide live rows."""
    _write_control_parquet(
        f"{path}/retracted_resolved",
        [(int(resolved_rseq),)],
        "resolved_rseq bigint",
    )


def _read_parquet_pinned(spark, path: str) -> DataFrame:
    """``spark.read.parquet`` with the schema pre-read DRIVER-SIDE from
    one footer (pyarrow) — Spark 4's schema inference launches a small
    Spark job per bare read (~0.1–0.2 s of fixed scheduling on
    local[32], measured), and the index ``load()`` paths open 5–8
    stage directories each, so inference jobs alone out-cost the
    actual reads (round 12, guide §1/§2: driver-job cadence). Reads
    the FIRST data file's footer, matching what inference samples with
    mergeSchema off (substrate directories are schema-uniform by
    construction; sites with cross-round schema growth already pass
    explicit DDL schemas). Falls back to the bare read when no data
    file exists (same behavior either way: inference over an empty
    directory raises in both paths)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    local = _local_path(path)
    for root, _, files in os.walk(local):
        for f in sorted(files):
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            arrow = pq.read_schema(os.path.join(root, f))
            return spark.read.schema(from_arrow_schema(arrow)).parquet(path)
    return spark.read.parquet(path)


def _read_control_row(path: str) -> dict:
    """Driver-side read of a 1-row control-plane parquet directory
    (the meta tables every index family writes) via pyarrow — the
    read twin of :func:`_write_control_parquet`: a Spark
    ``read.parquet(...).first()`` costs a scheduled job (~0.2 s on
    local[32]) per index ``load``, for one row of configuration.
    Reads whatever engine wrote the files (Spark- and pyarrow-written
    metas are both plain parquet). Returns the first row as a dict;
    raises if the directory holds no rows."""
    import os

    import pyarrow.parquet as pq

    local = _local_path(path)
    for root, _, files in os.walk(local):
        for f in sorted(files):
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            t = pq.read_table(os.path.join(root, f))
            if t.num_rows:
                return {c: t.column(c)[0].as_py() for c in t.column_names}
    raise ValueError(f"_read_control_row: no rows under {path}")


def _parquet_dir_exists(path: str) -> bool:
    import os

    return os.path.isdir(_local_path(path))


def _count_data_files(path: str) -> int:
    """Data files under a parquet directory (recursive; skips Spark's
    ``_SUCCESS``/metadata and hidden files)."""
    import os

    n = 0
    for _, _, files in os.walk(_local_path(path)):
        n += sum(1 for f in files if not f.startswith(("_", "."))
                 and not f.endswith(".crc"))
    return n


def _rewrite_parquet_dir(
    spark,
    path: str,
    frame: DataFrame,
    target_rows_per_file: int,
    n_rows: int | None = None,
    order_by: list[str] | None = None,
) -> dict:
    """Replace ``path``'s parquet contents with ``frame`` laid out as
    ``ceil(rows / target_rows_per_file)`` files: write the new layout
    COMPLETELY into a sibling temp directory (this executes any read
    of the old files), then swap via rename-aside — the old directory
    is renamed to ``path.__old__`` BEFORE the new one is renamed in,
    so a COMPLETE copy of the data exists on disk at every instant.
    Crash contract: a crash during the new-layout write or before the
    first rename leaves the old layout live (plus a temp dir); a
    crash between the two renames leaves NO directory at ``path`` but
    BOTH complete copies beside it — recovery is a single rename of
    either surviving copy (``path.__compact__`` = new or
    ``path.__old__`` = old) back to ``path``; a crash after the
    second rename leaves the new layout live plus at most a leftover
    ``.__old__`` dir, which the next rewrite clears. The frame is
    persisted (memory-and-disk, the maintenance-job norm) across the
    row count and the write so merge-on-read views (tombstone
    anti-joins) compute ONCE, not once per action. Returns
    ``{"rows", "files_before", "files_after"}``."""
    import math
    import os
    import shutil

    def _laid_out(fr: DataFrame, parts: int) -> DataFrame:
        if order_by:
            # range-partitioned + sorted layout: per-file min/max
            # column statistics become TIGHT on the order keys, so a
            # later literal/IN pushdown prunes files and row groups
            # (the retraction locate-scan treatment — SCALE.md)
            return fr.repartitionByRange(parts, *order_by).sortWithinPartitions(
                *order_by
            )
        return fr.repartition(parts)

    if n_rows is not None:
        # caller already knows the count (e.g. update()'s fused metrics
        # job counted the checkpointed frame) — skip the persist+count
        # job; the write is then the single action over the frame
        n = int(n_rows)
        parts = max(1, math.ceil(n / max(target_rows_per_file, 1)))
        local = _local_path(path)
        tmp = local + ".__compact__"
        shutil.rmtree(tmp, ignore_errors=True)
        _laid_out(frame, parts).write.mode("overwrite").parquet(tmp)
    else:
        frame = frame.persist()
        try:
            n = frame.count()
            parts = max(1, math.ceil(n / max(target_rows_per_file, 1)))
            local = _local_path(path)
            tmp = local + ".__compact__"
            shutil.rmtree(tmp, ignore_errors=True)
            _laid_out(frame, parts).write.mode("overwrite").parquet(tmp)
        finally:
            frame.unpersist()
    files_before = _count_data_files(path)
    old_aside = local + ".__old__"
    shutil.rmtree(old_aside, ignore_errors=True)
    os.rename(local, old_aside)
    os.rename(tmp, local)
    shutil.rmtree(old_aside)
    return {
        "rows": int(n),
        "files_before": files_before,
        "files_after": _count_data_files(path),
    }


def _recover_swapped_dir(path: str) -> bool:
    """Recover a :func:`_rewrite_parquet_dir` swap that crashed between
    its two renames (the one window that leaves NO live directory at
    ``path`` — but BOTH complete copies beside it): rename a surviving
    complete copy back, preferring the new layout (``.__compact__`` —
    complete by the write-before-swap contract) over the old
    (``.__old__``). A live ``path`` is left untouched (leftover
    sibling dirs are cleared by the next rewrite). Returns True if a
    rename was performed; raises if ``path`` is missing and no
    complete copy survives."""
    import os

    local = _local_path(path)
    if os.path.isdir(local):
        return False
    for cand in (local + ".__compact__", local + ".__old__"):
        if os.path.isdir(cand):
            os.rename(cand, local)
            return True
    raise FileNotFoundError(
        f"_recover_swapped_dir: {path} is missing and neither "
        f"{path}.__compact__ nor {path}.__old__ survives"
    )


class DedupIndex:
    """Build-once, share-everywhere near-duplicate index.

    The dedup pipeline's expensive substrates — LSH candidate pairs,
    exact-Jaccard-verified pairs, and connected-component cluster
    labels — are consumed by several downstream operators (cluster
    rollups, canonical selection, cross-source contamination,
    decontamination). Rebuilding them per consumer multiplies the
    dominant cost of the whole pipeline; at 100 TB a production run
    materializes the index ONCE and every consumer reads it.

    Each stage is built lazily on first access and pinned with
    ``localCheckpoint`` (storage-backed in a real deployment via
    ``write.parquet`` — the access pattern is identical), so:

    - an operator that only needs candidates pays for candidates only;
    - the second consumer of any stage gets it for free — the blocks
      are already materialized and lineage is truncated;
    - iterative consumers (components) never re-trigger the mining.

    Stage DAG: ``pairs`` → (``verified``, ``clusters``) and
    ``verified`` → ``verified_clusters``; ``verified`` additionally
    scans the corpus once for per-doc distinct gram sets.

    Two cluster views, two contracts: ``clusters`` labels components
    of the raw CANDIDATE pairs (t3's output — what the t10/t26
    oracle-twinned queries mirror), while ``verified_clusters`` labels
    components of the Jaccard-VERIFIED pairs only. Deletion decisions
    (canonical selection in a curation pipeline) must use
    ``verified_clusters``: a banded-LSH candidate pair has a per-band
    false-positive probability ≈ s^rows, so collapsing candidate
    components would silently drop non-duplicates.
    """

    def __init__(
        self,
        df: DataFrame,
        text_col: str,
        id_col: str,
        *,
        shingle_n: int = 3,
        k: int = 12,
        bands: int = 6,
        rows: int = 2,
        threshold: float = 0.8,
        max_band_size: int | None = None,
        hash_family: str = "md5",
    ) -> None:
        self._df = df
        self._text_col = text_col
        self._id_col = id_col
        self._shingle_n = shingle_n
        self._k = k
        self._n_bands = bands
        self._rows = rows
        self._threshold = threshold
        self._max_band_size = max_band_size
        # "md5" (default) is the ORACLE family — DuckDB recomputes the
        # identical signatures, so every driver parity gate uses it;
        # "xxhash64" is the production family (cheaper non-crypto
        # hashing, 8-byte slots/keys instead of hex strings) —
        # self-consistency-tested, persisted in meta so update()
        # hashes deltas identically to the original build
        self._hash_family = hash_family
        self._bands: DataFrame | None = None
        self._pairs: DataFrame | None = None
        self._verified: DataFrame | None = None
        self._clusters: DataFrame | None = None
        self._verified_clusters: DataFrame | None = None
        # stage-build counters — lets tests (and ops dashboards) assert
        # the build-once contract instead of trusting it
        self.builds: dict[str, int] = dict.fromkeys(self._STAGES, 0)
        self.updates = 0
        self.max_doc_id: int | None = None  # stamped by save()/load()
        # retraction state (round 9): committed retraction count, the
        # in-memory ledger (double-retraction refusal), the pending
        # retract_saved delta
        self.n_retractions = 0
        self._retracted_ids: DataFrame | None = None
        self._tomb_delta: DataFrame | None = None

    @property
    def bands(self) -> DataFrame:
        """The joinable index form (id, band, key) — every document's
        LSH band keys. The substrate a corpus DELTA joins to find its
        new candidate pairs (:meth:`update`), so it persists alongside
        the derived stages."""
        if self._bands is None:
            if self._df is None:
                raise ValueError(
                    "DedupIndex.bands: stage was excluded at save(stages=...) "
                    "time and a load()-ed index has no corpus to rebuild it "
                    "from - re-save including 'bands', or rebuild the index "
                    "over the corpus"
                )
            self.builds["bands"] += 1
            sh = _doc_shingles(
                self._df, self._text_col, self._id_col, self._shingle_n, distinct=False
            )
            # EAGER: the pair mining self-joins this frame — its two
            # exchange stages run concurrently, and a lazy checkpoint
            # would be computed twice (shingle+minhash duplicated, a
            # measured ~2x on the pairs build)
            self._bands = band_frame(
                minhash_signatures(sh, self._k, self._hash_family),
                self._n_bands,
                self._rows,
                self._hash_family,
            ).localCheckpoint()
        return self._bands

    @property
    def pairs(self) -> DataFrame:
        """LSH candidate pairs (id_a, id_b), id_a < id_b — t3's output."""
        if self._pairs is None:
            self.builds["pairs"] += 1
            self._pairs = pairs_from_band_frame(
                self.bands, self._max_band_size
            ).localCheckpoint(eager=False)
        return self._pairs

    @property
    def verified(self) -> DataFrame:
        """Exact-Jaccard-verified pairs (id_a, id_b, jaccard ≥ threshold)."""
        if self._verified is None:
            if self._df is None:
                raise ValueError(
                    "DedupIndex.verified: stage was excluded at "
                    "save(stages=...) time and a load()-ed index has no "
                    "corpus to rebuild it from - re-save including "
                    "'verified', or rebuild the index over the corpus"
                )
            self.builds["verified"] += 1
            sets = doc_shingle_sets(
                self._df, self._text_col, self._id_col, self._shingle_n
            )
            self._verified = jaccard_over_candidates(
                self.pairs, sets, self._threshold
            ).localCheckpoint(eager=False)
        return self._verified

    _STAGES = ("bands", "pairs", "verified", "clusters", "verified_clusters")
    _META_SCHEMA = (
        "text_col string, id_col string, shingle_n int, k int, bands int, "
        "rows int, threshold double, max_band_size int, max_doc_id bigint, "
        "hash_family string, n_retractions int"
    )

    @property
    def clusters(self) -> DataFrame:
        """Connected-component labels (id, cluster) over the CANDIDATE
        pairs — checkpointed by construction (every round of
        :func:`connected_components` checkpoints). Analysis view
        (what the t10/t26 oracles mirror); for deletion decisions use
        :attr:`verified_clusters`."""
        if self._clusters is None:
            self.builds["clusters"] += 1
            self._clusters = connected_components(self.pairs)
        return self._clusters

    @property
    def verified_clusters(self) -> DataFrame:
        """Connected-component labels (id, cluster) over the
        Jaccard-VERIFIED pairs only — the view a curation pipeline
        collapses, so LSH band false positives never delete a
        non-duplicate document."""
        if self._verified_clusters is None:
            self.builds["verified_clusters"] += 1
            self._verified_clusters = connected_components(
                self.verified.select("id_a", "id_b")
            )
        return self._verified_clusters

    def save(self, path: str, stages: tuple[str, ...] | None = None) -> None:
        """Persist the substrates as parquet under ``path`` —
        the cross-SESSION form of the build-once pattern (the
        in-session form is the localCheckpoint): a 100 TB pipeline
        materializes the dedup index once per corpus snapshot and
        every later job (and every later run) reads it. Forces any
        not-yet-built stage. A ``meta`` table records the build
        parameters so :meth:`load` + :meth:`update` hash corpus
        deltas identically to the original build.

        ``stages`` restricts which substrates are materialized and
        written (default: all). A consumer that never reads a stage —
        e.g. a curation state, which collapses VERIFIED clusters only
        — skips paying for it entirely; :meth:`load` maps the missing
        directories to not-yet-built stages, which lazily derive from
        the loaded ones where possible (clusters from pairs) and raise
        where the corpus itself would be needed (bands/verified)."""
        from concurrent.futures import ThreadPoolExecutor

        # force the stage frames IN DEPENDENCY ORDER on this thread
        # (bands → pairs → verified → [verified_]clusters — each
        # getattr builds lazily from the previous), then run the
        # writes CONCURRENTLY from driver threads: the frames are
        # checkpoint-pinned by construction, so each write is an
        # independent dump job that otherwise leaves local[N] idle
        # (guide §2.6 — round 12; was a serial per-stage loop).
        frames = [(s, getattr(self, s)) for s in (stages or self._STAGES)]

        def _write(stage: str, frame: "DataFrame") -> None:
            frame.write.mode("overwrite").parquet(f"{path}/{stage}")

        # the indexed-id high-water mark — the idempotence anchor for
        # foreach_batch_update's streamed ingestion. Stamped from the
        # CORPUS ids when the corpus is attached: bands only cover
        # shingle-able docs (≥ shingle_n words), so a corpus whose
        # max-id doc is short would understate the mark and leave that
        # batch permanently redo-replaying (the round-9 TrigramLM
        # property test found this bug class — same fix here). The
        # agg is one more independent job — overlapped with the writes.
        src = self._df if self._df is not None else None

        def _hi():
            if src is not None:
                return src.agg(F.max(self._id_col)).first()[0]
            return self.bands.agg(F.max("id")).first()[0]

        with ThreadPoolExecutor(max_workers=len(frames) + 1) as pool:
            f_hi = pool.submit(_hi)
            for fut in [pool.submit(_write, s, fr) for s, fr in frames]:
                fut.result()
            hi = f_hi.result()
        if self.max_doc_id is not None:
            # never shrink: retraction may have removed the max-id doc
            # from the corpus view, but its id stays allocated
            hi = self.max_doc_id if hi is None else max(int(hi), self.max_doc_id)
        self.max_doc_id = None if hi is None else int(hi)
        if self._retracted_ids is not None:
            # the stages above are already retraction-filtered, but
            # the ledger must survive the snapshot so reuse keeps
            # being refused; rseq 0 is always committed
            self._retracted_ids.select(
                "id", F.lit(0).cast("bigint").alias("rseq")
            ).write.mode("overwrite").parquet(f"{path}/retracted")
        elif _parquet_dir_exists(f"{path}/retracted"):
            import shutil

            shutil.rmtree(_local_path(f"{path}/retracted"))
        # the snapshot's stages carry no retracted rows — the sequence
        # restarts
        self.n_retractions = 0
        self._write_meta(path)

    def _write_meta(self, path: str) -> None:
        _write_control_parquet(
            f"{path}/meta",
            [
                (
                    self._text_col,
                    self._id_col,
                    self._shingle_n,
                    self._k,
                    self._n_bands,
                    self._rows,
                    float(self._threshold),
                    self._max_band_size,
                    self.max_doc_id,
                    self._hash_family,
                    int(self.n_retractions),
                )
            ],
            self._META_SCHEMA,
        )

    @classmethod
    def load(cls, spark, path: str) -> "DedupIndex":
        """Re-open a :meth:`save`-d index: the returned object serves
        the parquet-backed frames directly (no corpus scan, no
        rebuild); the stage-build counters stay at 0 because nothing
        is built. Build parameters come back from the ``meta`` table,
        so the loaded index accepts :meth:`update` deltas."""
        idx = cls.__new__(cls)
        idx._df = None
        m = _read_control_row(f"{path}/meta")
        idx._text_col = m["text_col"]
        idx._id_col = m["id_col"]
        idx._shingle_n = m["shingle_n"]
        idx._k = m["k"]
        idx._n_bands = m["bands"]
        idx._rows = m["rows"]
        idx._threshold = m["threshold"]
        idx._max_band_size = m["max_band_size"]
        # metas saved before the family option existed are md5 (the
        # only family that existed)
        idx._hash_family = m.get("hash_family") or "md5"
        # metas written before the high-water mark existed load as
        # unknown (None) — the next save()/append_saved() stamps it
        hi = m.get("max_doc_id")
        idx.max_doc_id = None if hi is None else int(hi)
        from pyspark.errors.exceptions.captured import AnalysisException

        for stage in cls._STAGES:
            try:
                setattr(idx, f"_{stage}", _read_parquet_pinned(spark, f"{path}/{stage}"))
            except AnalysisException:
                # stage was excluded at save time (save(stages=...))
                setattr(idx, f"_{stage}", None)
        idx.builds = dict.fromkeys(cls._STAGES, 0)
        idx.updates = 0
        idx.n_retractions = int(m.get("n_retractions") or 0)
        idx._retracted_ids = None
        idx._tomb_delta = None
        if _parquet_dir_exists(f"{path}/retracted"):
            t = (
                _read_parquet_pinned(spark, f"{path}/retracted")
                .filter(F.col("rseq") <= idx.n_retractions)
                .select("id")
                .distinct()
            )
            if t.first() is not None:
                # committed retractions filter the monotone stages at
                # load (broadcast anti-joins — deletion-sized sets);
                # the label stages were rewritten by retract_saved and
                # already exclude them. compact() resolves physically.
                t = t.localCheckpoint()
                idx._retracted_ids = t
                if idx._bands is not None:
                    idx._bands = idx._bands.join(
                        F.broadcast(t), "id", "left_anti"
                    )
                for s in ("pairs", "verified"):
                    fr = getattr(idx, f"_{s}")
                    if fr is not None:
                        setattr(
                            idx,
                            f"_{s}",
                            fr.join(
                                F.broadcast(
                                    t.withColumnRenamed("id", "id_a")
                                ),
                                "id_a",
                                "left_anti",
                            ).join(
                                F.broadcast(
                                    t.withColumnRenamed("id", "id_b")
                                ),
                                "id_b",
                                "left_anti",
                            ).select(*fr.columns),
                        )
        return idx

    def update(self, new_docs: DataFrame, old_docs: DataFrame | None = None) -> "DedupIndex":
        """Merge a corpus delta into the index WITHOUT a full rebuild —
        the daily-delta pattern a production 100 TB pipeline runs:
        only the delta is shingled/minhashed; new candidate pairs come
        from banding the delta's signatures and equi-joining the
        persisted :attr:`bands` frame (new×all — old×old pairs cannot
        change); Jaccard verification touches only the delta plus the
        OLD documents that actually appear in a new pair (a semi-join,
        bounded by candidate fan-in, never an old-corpus scan); and
        components re-run seeded from the stored labels — each old
        cluster collapses to STAR edges (member → label), so the
        propagation pays O(log delta-diameter) rounds over
        |stars| + |new pairs| edges instead of replaying the full old
        edge list. ``load(path).update(delta)`` equals a full rebuild
        over old ∪ delta stage-for-stage (test-asserted).

        ``old_docs`` is the full pre-update corpus; required for a
        :meth:`load`-ed index (verification needs touched old TEXTS —
        the one thing the index does not persist), optional when the
        index was built in-session. Delta ids must be disjoint from
        indexed ids (append-only contract; re-ingesting an id would
        duplicate its band rows). With ``max_band_size`` set, the cap
        re-evaluates over the MERGED band groups for new pairs, but
        already-mined pairs are never retracted — the index is
        monotone; a group that outgrew the cap stops yielding NEW
        pairs. Mutates and returns ``self``; stages never built (and
        not loaded) stay lazy and will derive from the merged state."""
        if self._retracted_ids is not None:
            n_dead = (
                new_docs.select(F.col(self._id_col).alias("id"))
                .join(F.broadcast(self._retracted_ids), "id", "left_semi")
                .count()
            )
            if n_dead:
                raise ValueError(
                    f"DedupIndex.update: {n_dead} delta id(s) collide with "
                    "retracted ids — a retracted id stays dead (the "
                    "tombstone filter would hide the re-ingested rows); "
                    "allocate fresh ids for re-added content"
                )
        old = old_docs if old_docs is not None else self._df
        # old state FIRST — after the merge below, the lazy properties
        # would rebuild from merged inputs instead
        old_bands = self.bands
        old_pairs = self.pairs
        sh = _doc_shingles(
            new_docs, self._text_col, self._id_col, self._shingle_n, distinct=False
        )
        # eager for the same concurrent-consumer reason as .bands
        new_bands = band_frame(
            minhash_signatures(sh, self._k, self._hash_family),
            self._n_bands,
            self._rows,
            self._hash_family,
        ).localCheckpoint()
        merged_bands = old_bands.unionByName(new_bands).localCheckpoint(eager=False)
        capped = _cap_band_groups(merged_bands, self._max_band_size)
        delta_side = (
            new_bands.join(
                capped.select("band", "key").distinct(), ["band", "key"], "left_semi"
            )
            if self._max_band_size is not None
            else new_bands
        )
        new_pairs = (
            delta_side.alias("a")
            .join(
                capped.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )

        def _star(labels: DataFrame) -> DataFrame:
            # an old cluster as diameter-1 edges (member → label): same
            # connectivity as the old pair list, logarithmically fewer
            # propagation rounds when new edges bridge old clusters
            return labels.select(
                F.col("id").alias("id_a"), F.col("cluster").alias("id_b")
            )

        if self._verified is not None:
            new_ids = new_docs.select(
                F.col(self._id_col).alias("id")
            ).distinct()
            # no distinct: consumed only through a left_semi join below,
            # which tolerates duplicate keys
            touched_old = (
                new_pairs.select(F.col("id_a").alias("id"))
                .unionByName(new_pairs.select(F.col("id_b").alias("id")))
                .join(new_ids, "id", "left_anti")
            )
            if old is None:
                raise ValueError(
                    "DedupIndex.update: verification of new candidate pairs "
                    "needs the old documents' text — pass old_docs (the full "
                    "pre-update corpus) when updating a load()-ed index"
                )
            sets = doc_shingle_sets(
                new_docs, self._text_col, self._id_col, self._shingle_n
            ).unionByName(
                doc_shingle_sets(
                    old.join(
                        touched_old.withColumnRenamed("id", self._id_col),
                        self._id_col,
                        "left_semi",
                    ),
                    self._text_col,
                    self._id_col,
                    self._shingle_n,
                )
            )
            new_verified = jaccard_over_candidates(
                new_pairs, sets, self._threshold
            ).localCheckpoint(eager=False)
            old_verified = self._verified
            if self._verified_clusters is not None:
                self._verified_clusters = connected_components(
                    _star(self._verified_clusters).unionByName(
                        new_verified.select("id_a", "id_b")
                    )
                )
            self._verified = old_verified.unionByName(new_verified).localCheckpoint(eager=False)
        if self._clusters is not None:
            self._clusters = connected_components(
                _star(self._clusters).unionByName(new_pairs)
            )
        self._bands = merged_bands
        self._pairs = old_pairs.unionByName(new_pairs).localCheckpoint(eager=False)
        self._df = old.unionByName(new_docs) if old is not None else None
        # the delta frames, kept for append_saved. ACCUMULATED across
        # chained update() calls (round 9): append_saved previously
        # landed only the LAST delta, so update();update();append_saved()
        # silently dropped the first delta from disk while the meta
        # stamp covered its ids — a replay then skipped the batch and
        # the rows were gone. The legs are monotone, so accumulation is
        # a plain union.
        prev = getattr(self, "_delta", None)
        new_v = new_verified if self._verified is not None else None
        if prev:
            new_bands = prev["bands"].unionByName(new_bands)
            new_pairs = prev["pairs"].unionByName(new_pairs)
            if prev["verified"] is not None and new_v is not None:
                new_v = prev["verified"].unionByName(new_v)
            elif new_v is None:
                new_v = prev["verified"]
        self._delta = {
            "bands": new_bands,
            "pairs": new_pairs,
            "verified": new_v,
        }
        self.updates += 1
        return self

    def retract(self, ids: DataFrame) -> "DedupIndex":
        """Remove documents from the index — the deletion half of the
        append-only contract, needing NO document text (unlike
        :meth:`update`): the monotone stages are per-doc/per-pair rows
        (filtered by a broadcast anti-join), and the cluster stages
        are re-derived for exactly the AFFECTED components — a cluster
        containing a retracted doc can SPLIT when that doc was the
        bridge, so its surviving members re-run connected components
        over the surviving edge subgraph (bounded by the affected
        clusters, never the corpus), while every untouched cluster
        keeps its stored label. ``retract(r)`` equals
        ``build(corpus ∖ r)`` stage-for-stage under the default
        (uncapped) configuration — oracle-gated (t43). With
        ``max_band_size`` set the index keeps its documented MONOTONE
        cap semantics: already-mined pairs touching survivors stay,
        but a band group that a retraction shrinks back under the cap
        does not retro-mine (exactly mirroring update's
        never-retract-mined-pairs rule).

        Ids must not be already retracted (double deletion is refused
        — in memory and against the saved ledger); :meth:`update`
        refuses their reuse afterwards. Mutates and returns ``self``;
        :meth:`retract_saved` lands the delta on a saved directory."""
        t = (
            ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        n_t = t.count()
        if n_t == 0:
            # mirror RepeatIndex._retract_unfenced's n_ids==0 branch:
            # an empty delta is a no-op, not an int(None) TypeError
            # from the high-water-mark aggregate below
            return self
        if self._retracted_ids is not None:
            n_dead = t.join(
                F.broadcast(self._retracted_ids), "id", "left_semi"
            ).count()
            if n_dead == n_t:
                # full replay of an already-retracted set — idempotent:
                # no mutation, and NOT unioned into the pending
                # _tomb_delta (those ids are committed; unioning them
                # would make a later retract_saved see a partial
                # overlap with the on-disk ledger and refuse when a
                # DIFFERENT retract() in the same session left genuine
                # new ids pending). The flag lets retract_saved skip
                # idempotently when the replay is the ONLY thing
                # pending.
                self._tomb_replayed = True
                return self
            if n_dead:
                raise ValueError(
                    f"DedupIndex.retract: {n_dead} id(s) were already "
                    "retracted — double deletion would re-filter and "
                    "re-label against wrong state"
                )
        if self.max_doc_id is not None:
            hi = t.agg(F.max("id")).first()[0]
            if int(hi) > int(self.max_doc_id):
                raise ValueError(
                    "DedupIndex.retract: delta contains id(s) above the "
                    f"indexed high-water mark {self.max_doc_id} — those "
                    "documents were never ingested into this index"
                )
        elif self._df is not None:
            # pin the allocation mark BEFORE the corpus view shrinks —
            # retraction never un-allocates an id
            row = self._df.agg(F.max(self._id_col)).first()
            self.max_doc_id = None if row[0] is None else int(row[0])
        if self._bands is not None:
            self._bands = self._bands.join(F.broadcast(t), "id", "left_anti")
        for s in ("pairs", "verified"):
            fr = getattr(self, f"_{s}")
            if fr is not None:
                # the USING-column anti-joins promote the join key to
                # the front — restore the stage's column order
                setattr(
                    self,
                    f"_{s}",
                    fr.join(
                        F.broadcast(t.withColumnRenamed("id", "id_a")),
                        "id_a",
                        "left_anti",
                    ).join(
                        F.broadcast(t.withColumnRenamed("id", "id_b")),
                        "id_b",
                        "left_anti",
                    ).select(*fr.columns),
                )
        # affected-cluster relabel: components are closed under their
        # edges, so restricting the (already-filtered) edge set to the
        # affected clusters' surviving members captures every edge
        # that can influence their new labels
        for stage, edges in (
            ("clusters", self._pairs),
            ("verified_clusters", self._verified),
        ):
            lbl = getattr(self, f"_{stage}")
            if lbl is None:
                continue  # excluded stage, or dropped-to-rederive: the
                # lazy property re-derives from the filtered edges
            if edges is None:
                raise ValueError(
                    f"DedupIndex.retract: the {stage} stage is loaded but "
                    "its edge stage was excluded at save time — the "
                    "affected clusters cannot be re-labeled; re-save the "
                    "index including the edge stage"
                )
            aff = (
                lbl.join(F.broadcast(t), "id", "left_semi")
                .select("cluster")
                .distinct()
            )
            keepers = lbl.join(aff, "cluster", "left_anti").select(
                "id", "cluster"
            )
            aff_members = lbl.join(aff, "cluster", "left_semi").select("id")
            sub_edges = edges.select("id_a", "id_b").join(
                aff_members.withColumnRenamed("id", "id_a"),
                "id_a",
                "left_semi",
            )
            relabeled = connected_components(sub_edges)
            setattr(
                self,
                f"_{stage}",
                keepers.unionByName(relabeled).localCheckpoint(eager=False),
            )
        if self._df is not None:
            self._df = self._df.join(
                t.withColumnRenamed("id", self._id_col),
                self._id_col,
                "left_anti",
            )
        self._retracted_ids = (
            t
            if self._retracted_ids is None
            else self._retracted_ids.unionByName(t).localCheckpoint(
                eager=False
            )
        )
        self._tomb_delta = (
            t
            if self._tomb_delta is None
            else self._tomb_delta.unionByName(t).localCheckpoint(eager=False)
        )
        return self

    def retract_saved(self, path: str) -> None:
        """Land the pending :meth:`retract` delta on a :meth:`save`-d
        index directory under the retraction-sequence commit protocol
        (the family form — :class:`TrigramLM`/:class:`RepeatIndex`):
        ledger rows land first at ``rseq = k+1`` (uncommitted until
        meta), the relabeled cluster stages overwrite (bounded by the
        clustered subset — the same wholesale rewrite
        :meth:`append_saved` already performs for them), and meta
        commits ``n_retractions = k+1`` last. Readers filter by the
        COMMITTED ledger only, so a crash after any prefix leaves the
        monotone views exactly pre-retract (a torn label overwrite is
        identifiable by the uncommitted ledger rows and re-derived by
        the replay — the ``rollback_unstamped`` drop-don't-trust rule).
        A fully-committed replay skips idempotently; a different torn
        retraction is refused. Single-writer-fenced."""
        if self._tomb_delta is None:
            if getattr(self, "_tomb_replayed", False):
                # the only pending retract() was a full replay of
                # already-committed ids — idempotent skip
                self._tomb_replayed = False
                return
            raise ValueError(
                "DedupIndex.retract_saved: no retract() delta to land — "
                "call retract(ids) first"
            )
        from .lease import dir_lease

        with dir_lease(path, role="DedupIndex.retract_saved"):
            self._retract_saved_unfenced(path)
        self._tomb_replayed = False

    def _retract_saved_unfenced(self, path: str) -> None:
        spark = self._tomb_delta.sparkSession
        m = _read_control_row(f"{path}/meta")
        stamp = m.get("max_doc_id")
        if stamp is None:
            raise ValueError(
                "DedupIndex.retract_saved: the saved index has no "
                "max_doc_id high-water mark (meta predates it) — re-save() "
                "the index (which stamps it) before retracting"
            )
        n_r = int(m.get("n_retractions") or 0)
        ids = self._tomb_delta
        row = ids.agg(F.count(F.lit(1)).alias("n"), F.max("id").alias("hi")).first()
        if row["hi"] is None:
            self._tomb_delta = None
            return
        if int(row["hi"]) > int(stamp):
            raise ValueError(
                "DedupIndex.retract_saved: delta contains id(s) above the "
                f"saved high-water mark {stamp} — never ingested"
            )
        led_path = f"{path}/retracted"
        replay_torn = False
        committed_full = None
        if _parquet_dir_exists(led_path):
            _recover_swapped_dir(led_path)
            led = spark.read.parquet(led_path)
            unc = led.filter(F.col("rseq") > n_r).select("id").distinct()
            if unc.limit(1).count():
                if (
                    unc.join(ids, "id", "left_anti").limit(1).count()
                    or ids.join(unc, "id", "left_anti").limit(1).count()
                ):
                    raise ValueError(
                        "DedupIndex.retract_saved: uncommitted ledger rows "
                        "from a DIFFERENT torn retraction are on disk — "
                        "replay that retraction (same ids) before this one"
                    )
                replay_torn = True
            committed_full = led.filter(F.col("rseq") <= n_r)
            n_in = ids.join(
                committed_full.select("id"), "id", "left_semi"
            ).count()
            if n_in == int(row["n"]):
                self._tomb_delta = None
                return  # fully-committed replay — already landed
            if n_in:
                raise ValueError(
                    f"DedupIndex.retract_saved: {n_in} of {row['n']} delta "
                    "id(s) are already retracted on disk — a partial "
                    "overlap relabels against wrong state; retract only "
                    "new ids"
                )
        fresh = ids.select(
            "id", F.lit(n_r + 1).cast("bigint").alias("rseq")
        )
        if replay_torn:
            # the crashed attempt may have torn a label overwrite — the
            # drop-don't-trust rule: re-derive the label stages from
            # the (retract()-filtered) edge frames rather than trusting
            # anything retract() read from disk. Only stages the index
            # actually CARRIES: a stage excluded at save time
            # (save(stages=...) — e.g. CurationState's index has no
            # candidate-pair clusters) must not be materialized by the
            # repair, or the replay invents a directory the clean run
            # never wrote
            for stage, edges in (
                ("clusters", self._pairs),
                ("verified_clusters", self._verified),
            ):
                if edges is not None and getattr(self, f"_{stage}") is not None:
                    setattr(
                        self,
                        f"_{stage}",
                        connected_components(edges.select("id_a", "id_b")),
                    )
        else:
            # fresh landing: the uncommitted ledger rows go down FIRST
            # — they are the signal that a crash tore the label
            # overwrites below
            fresh.write.mode("append").parquet(led_path)
        for stage in ("clusters", "verified_clusters"):
            frame = getattr(self, f"_{stage}")
            if frame is not None:
                # EAGER pin before the overwrite: the relabel plan
                # reads this very directory (keepers come from the
                # loaded stage), and mode("overwrite") deletes the
                # input files before the lazy plan would evaluate
                frame = frame.localCheckpoint()
                setattr(self, f"_{stage}", frame)
                frame.write.mode("overwrite").parquet(f"{path}/{stage}")
        if replay_torn:
            # replay: the torn attempt's uncommitted rows already
            # signal the tear, so the labels were repaired FIRST
            # (above) and the ledger rewrites LAST — one atomic swap
            # to committed ∪ fresh, replacing the torn rows. Purging
            # the torn rows any earlier would erase the only signal
            # while the torn labels persist (the round-9 ADVICE
            # crash window).
            _rewrite_parquet_dir(
                spark,
                led_path,
                committed_full.unionByName(fresh),
                1 << 20,
            )
        self.max_doc_id = int(stamp)
        self.n_retractions = n_r + 1
        self._write_meta(path)
        self._tomb_delta = None

    def rollback_unstamped(self, stamp: int) -> tuple[str, ...]:
        """Drop landed-but-unstamped rows (ids beyond ``stamp``, the
        meta high-water mark) from the LOADED monotone stages, and
        unload the label stages so they re-derive from the repaired
        pair sets — the in-memory half of replaying a crashed
        multi-stage append (:meth:`append_saved`'s ``repair`` mode is
        the disk half; :meth:`foreach_batch_update`'s redo branch and
        ``CurationState.update``'s repair mode both drive the pair).
        Monotone ids make the unstamped rows identifiable: bands by
        ``id``, pairs/verified by ``id_b`` (a delta pair's greater
        endpoint is always a new doc). The label stages are rewritten
        WHOLESALE by append_saved, and a torn overwrite is
        indistinguishable from a complete one — so they are dropped
        rather than trusted. Returns the label stages that were
        loaded; callers force them after ``update()`` so append_saved
        rewrites them."""
        if self._bands is not None:
            self._bands = self._bands.filter(F.col("id") <= stamp)
        if self._pairs is not None:
            self._pairs = self._pairs.filter(F.col("id_b") <= stamp)
        if self._verified is not None:
            self._verified = self._verified.filter(F.col("id_b") <= stamp)
        had = tuple(
            s
            for s in ("clusters", "verified_clusters")
            if getattr(self, f"_{s}") is not None
        )
        for s in had:
            setattr(self, f"_{s}", None)
        return had

    def append_saved(self, path: str, *, repair: bool = False) -> None:
        """Single-writer-fenced entry (see :mod:`..lease`) over
        :meth:`_append_saved_unfenced` — a concurrent compact/vacuum
        on the same directory is refused loudly instead of racing the
        crash contract."""
        from .lease import dir_lease

        with dir_lease(path, role="DedupIndex.append_saved"):
            return self._append_saved_unfenced(path, repair=repair)

    def _append_saved_unfenced(self, path: str, *, repair: bool = False) -> None:
        """Merge the LAST :meth:`update`'s delta into a :meth:`save`-d
        index directory WITHOUT rewriting the whole index: ``bands``,
        ``pairs``, and ``verified`` are append-only under the
        append-only corpus contract, so only the delta rows are
        written (O(delta), not O(index)); the two cluster-label
        stages are NOT append-only (a delta bridge relabels merged
        components), so they are rewritten — bounded by the clustered
        subset, the one non-monotone piece of state. Call order:
        pairs → verified → bands, so each lazy delta materializes
        before the files its plan reads are appended to. The
        in-memory object must be considered STALE after this call
        (its merged frames captured the pre-append file listings);
        re-``load`` to keep using the index.

        ``repair=True`` is the REDO form for a crash inside a previous
        append (some stage appends landed, the meta stamp did not):
        each monotone delta is anti-joined against its on-disk stage
        first, so rows that already landed — including a torn partial
        append — are not duplicated, and the append converges to
        exactly the clean-append state (test-asserted). Costs one
        delta-vs-stage anti-join per monotone stage, so the streaming
        absorber pays it only on the crash-replay branch, never in
        steady state.

        The stage writes run CONCURRENTLY from driver threads: every
        delta plan reads file LISTINGS pinned when the index was
        loaded (so a sibling append cannot leak into it), the label
        frames are checkpoint-pinned from update(), and the crash
        contract never depended on write order — the redo machinery
        (stamp rollback + anti-join guards) reconstructs from an
        arbitrary landed subset. Serially these were up to five small
        jobs that each left the cluster idle."""
        if not getattr(self, "_delta", None):
            raise ValueError(
                "DedupIndex.append_saved: no update() delta to append — "
                "call update(new_docs) first"
            )
        if _parquet_dir_exists(f"{path}/retracted"):
            # the trailing meta rewrite re-writes every field — sync
            # the retraction sequence from disk so an in-session
            # object never clobbers committed retractions back to
            # uncommitted; and refuse to interleave with a torn
            # retraction (its replay owns the purge)
            m = _read_control_row(f"{path}/meta")
            self.n_retractions = int(m.get("n_retractions") or 0)
            spark = self._delta["bands"].sparkSession
            if (
                spark.read.parquet(f"{path}/retracted")
                .filter(F.col("rseq") > self.n_retractions)
                .limit(1)
                .count()
            ):
                raise ValueError(
                    "DedupIndex.append_saved: uncommitted retraction "
                    "ledger rows on disk — a previous retract_saved "
                    "crashed mid-protocol; replay that retraction (same "
                    "ids) before appending"
                )

        def _append(delta: "DataFrame", stage: str, keys: list) -> None:
            if repair:
                spark = delta.sparkSession
                delta = delta.join(
                    spark.read.parquet(f"{path}/{stage}"), keys, "left_anti"
                ).localCheckpoint()  # materialize before appending to the read dir
            delta.write.mode("append").parquet(f"{path}/{stage}")

        writes = [
            lambda: _append(self._delta["pairs"], "pairs", ["id_a", "id_b"]),
            lambda: _append(self._delta["bands"], "bands", ["id", "band"]),
        ]
        if self._delta["verified"] is not None:
            writes.append(
                lambda: _append(
                    self._delta["verified"], "verified", ["id_a", "id_b"]
                )
            )
        for stage in ("clusters", "verified_clusters"):
            frame = getattr(self, f"_{stage}")
            if frame is not None:
                writes.append(
                    lambda f=frame, s=stage: f.write.mode("overwrite").parquet(
                        f"{path}/{s}"
                    )
                )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            for fut in [pool.submit(w) for w in writes]:
                fut.result()
        hi = self._delta["bands"].agg(F.max("id")).first()[0]
        if hi is not None:
            old_hi = self.max_doc_id
            self.max_doc_id = (
                int(hi) if old_hi is None else max(int(hi), int(old_hi))
            )
        self._write_meta(path)
        self._delta = None

    @classmethod
    def foreach_batch_update(cls, spark, index_path: str, corpus_path: str):
        """Structured-Streaming ingestion into a saved standalone
        dedup index — completing the streaming-absorber family
        (`incremental.foreach_batch_update` for the full pipeline,
        `vectorops.foreach_batch_add`, `RepeatIndex.
        foreach_batch_update`, `multimodal.foreach_batch_add`): a
        ``(batch_df, batch_id) -> None`` function for
        ``writeStream.foreachBatch`` that appends each micro-batch to
        the corpus parquet log at ``corpus_path`` AND absorbs it as
        one :meth:`update` + O(delta) :meth:`append_saved`. Like
        RepeatIndex, the absorber co-maintains the corpus log because
        ``update`` verifies new pairs against touched old TEXTS — the
        one thing the index does not persist.

        At-least-once safety: meta's ``max_doc_id`` is the high-water
        mark (a pre-mark save must be re-``save``-d first — refused
        loudly), a fully replayed batch is skipped idempotently, a
        straddling batch raises, and the corpus append is
        replay-guarded with the row-count completeness check (a torn
        multi-file append satisfying the max-id probe alone is
        detected, not silently skipped). The index half's multi-stage
        append (pairs → verified → bands → clusters → meta) is
        non-atomic, but a crash INSIDE it now REPAIRS on replay
        instead of corrupting: the meta stamp trails every stage
        write, so a replayed batch whose corpus half already landed
        takes the redo branch — landed-but-unstamped rows (ids beyond
        the stamp) are dropped from the loaded monotone stages, the
        label stages (whose wholesale overwrite could itself have
        torn) are re-derived from the repaired pair sets, and
        :meth:`append_saved` runs in ``repair`` mode, anti-joining
        each monotone delta against disk so nothing lands twice. The
        replayed absorb converges to exactly the clean-absorb state
        regardless of which prefix of the stage writes the crash
        preserved (test-asserted across the crash windows)."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            idx = cls.load(spark, index_path)
            id_col = idx._id_col
            redo = False  # set when the corpus half already landed
            b = batch_df.agg(
                F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
            ).first()
            if b["hi"] is None:
                return
            if idx.max_doc_id is None:
                raise ValueError(
                    "DedupIndex.foreach_batch_update: the saved index has "
                    "no max_doc_id high-water mark (meta predates it) — "
                    "re-save() the index (which stamps it) before attaching "
                    "streamed ingestion"
                )
            if b["hi"] <= idx.max_doc_id:
                return  # fully-replayed batch — already absorbed
            if b["lo"] <= idx.max_doc_id:
                raise ValueError(
                    "DedupIndex.foreach_batch_update: monotone-id contract "
                    f"violated — batch ids straddle the indexed max "
                    f"{idx.max_doc_id} (lo={b['lo']}, hi={b['hi']})"
                )
            corpus = spark.read.parquet(corpus_path)
            c_hi = corpus.agg(F.max(id_col)).first()[0]
            if c_hi is None or c_hi < b["lo"]:
                batch_df.write.mode("append").parquet(corpus_path)
            elif c_hi < b["hi"]:
                raise ValueError(
                    "DedupIndex.foreach_batch_update: corpus log partially "
                    f"overlaps the batch (corpus max {c_hi} inside "
                    f"[{b['lo']}, {b['hi']}]) — torn corpus append; repair "
                    "the corpus log before resuming"
                )
            else:
                n_disk = corpus.filter(
                    F.col(id_col).between(int(b["lo"]), int(b["hi"]))
                ).count()
                n_batch = batch_df.count()
                if n_disk != n_batch:
                    raise ValueError(
                        "DedupIndex.foreach_batch_update: corpus log max "
                        f"covers the batch but holds {n_disk} rows in "
                        f"[{b['lo']}, {b['hi']}] vs the batch's {n_batch} "
                        "— torn corpus append; repair the corpus log "
                        "before resuming"
                    )
                # corpus holds the whole batch (crash between the
                # corpus append and the index meta stamp — redo the
                # index half in repair mode: the crash may have landed
                # any prefix of the stage appends, so each monotone
                # delta anti-joins its on-disk stage instead of
                # appending blindly)
                redo = True
            # on redo, the crashed append may have landed any prefix of
            # the stage writes — roll the loaded stages back to the meta
            # stamp (a landed bands append would otherwise double-count
            # the delta's rows in update()'s merged band groups,
            # inflating _cap_band_groups sizes past the cap; landed
            # pairs/verified would seed the merged views with
            # duplicates; torn label overwrites cannot be trusted)
            had_labels = idx.rollback_unstamped(idx.max_doc_id) if redo else ()
            idx.update(
                batch_df, old_docs=corpus.filter(F.col(id_col) < b["lo"])
            )
            for s in had_labels:
                getattr(idx, s)  # force rebuild so append_saved rewrites it
            idx.append_saved(index_path, repair=redo)
            # append_saved stamps from the delta's BANDED ids; a batch
            # whose max-id doc is too short to shingle would understate
            # the mark and replay this batch through the redo branch
            # forever — lift the stamp to the batch max (the absorber
            # knows it; same bug class the TrigramLM property found)
            if idx.max_doc_id is None or idx.max_doc_id < int(b["hi"]):
                idx.max_doc_id = int(b["hi"])
                idx._write_meta(index_path)

        return absorb

    @classmethod
    def foreach_batch_retract(cls, spark, index_path: str):
        """Structured-Streaming DELETION feed — the deletion twin of
        :meth:`foreach_batch_update` (opt-out / takedown streams): each
        micro-batch of doc ids lands as one :meth:`retract` +
        :meth:`retract_saved`. At-least-once safety: committed-ledger
        ids are pre-filtered (replays and duplicate requests absorb
        silently), and a torn previous landing is purged-and-relanded
        by retract_saved's own protocol — the pre-filter makes the
        replay's fresh set equal the torn attempt's. Needs no corpus:
        the index stores its own edges."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            idx = cls.load(spark, index_path)
            ids = batch_df.select(
                F.col(batch_df.columns[0]).cast("long").alias("id")
            ).distinct()
            if idx._retracted_ids is not None:
                ids = ids.join(
                    F.broadcast(idx._retracted_ids), "id", "left_anti"
                )
            ids = ids.localCheckpoint()
            if ids.first() is None:
                return  # fully absorbed already
            idx.retract(ids)
            idx.retract_saved(index_path)

        return absorb

    @classmethod
    def compact(
        cls, spark, path: str, *, target_rows_per_file: int = 1 << 20
    ) -> dict:
        """Single-writer-fenced entry (see :mod:`..lease`) over
        :meth:`_compact_unfenced` — a concurrent absorber append on
        the same directory is refused loudly instead of being silently
        dropped by the rename-aside swap."""
        from .lease import dir_lease

        with dir_lease(path, role="DedupIndex.compact"):
            return cls._compact_unfenced(
                spark, path, target_rows_per_file=target_rows_per_file
            )

    @classmethod
    def _compact_unfenced(
        cls, spark, path: str, *, target_rows_per_file: int = 1 << 20
    ) -> dict:
        """Rewrite a :meth:`save`-d index directory to size-targeted
        files — the maintenance half of :meth:`append_saved`: every
        delta merge appends O(delta) SMALL files to the monotone
        stages, so a year of daily deltas leaves ~365 file appends per
        substrate and every later scan pays the per-file open/footer
        cost (read amplification grows with update count, not data).
        Compaction re-partitions each stage to
        ``ceil(rows / target_rows_per_file)`` files; the index is
        append-only (no tombstones), so this is a pure file re-layout
        — row content is untouched and ``load`` serves identical
        frames (equality-tested in tests/test_dedup_index.py).

        Each stage is fully materialized into a sibling temp directory
        BEFORE the original is replaced, and the swap renames the old
        directory aside before renaming the new one in — a complete
        copy exists on disk at every instant, and the one bad crash
        window (between the two renames) recovers with a single
        rename of either surviving copy (see
        :func:`_rewrite_parquet_dir`'s crash contract;
        :func:`_recover_swapped_dir` performs that rename). A
        production deployment fronts these directories with a
        transactional table format. Any in-memory object over ``path``
        is STALE afterwards (its plans captured the old file
        listings); re-``load`` to keep using the index.

        With a committed retraction ledger present, the rewrite also
        RESOLVES it: bands/pairs/verified drop rows touching retracted
        ids (the label stages were already rewritten by
        ``retract_saved``), and the ledger re-lays to its committed
        subset — retained so id reuse keeps being refused. Refuses
        (ValueError) on UNCOMMITTED ledger rows: resolving around a
        torn retraction would race its replay.

        → ``{stage: {"rows": n, "files_before": b, "files_after": a}}``
        for the stages present on disk."""
        tombs = None
        led_path = f"{path}/retracted"
        if _parquet_dir_exists(led_path):
            n_r = int(
                _read_control_row(f"{path}/meta").get("n_retractions") or 0
            )
            led = spark.read.parquet(led_path)
            if led.filter(F.col("rseq") > n_r).limit(1).count():
                raise TornStateError(
                    "DedupIndex.compact: uncommitted retraction ledger "
                    "rows on disk — a previous retract_saved crashed "
                    "mid-protocol; replay that retraction (same ids) "
                    "before compacting"
                )
            t = led.filter(F.col("rseq") <= n_r).select("id").distinct()
            if t.first() is not None:
                tombs = t.localCheckpoint()
        out: dict[str, dict] = {}
        for stage in cls._STAGES:
            if not _parquet_dir_exists(f"{path}/{stage}"):
                continue
            df = spark.read.parquet(f"{path}/{stage}")
            if tombs is not None and stage == "bands":
                df = df.join(F.broadcast(tombs), "id", "left_anti")
            elif tombs is not None and stage in ("pairs", "verified"):
                cols = df.columns
                df = df.join(
                    F.broadcast(tombs.withColumnRenamed("id", "id_a")),
                    "id_a",
                    "left_anti",
                ).join(
                    F.broadcast(tombs.withColumnRenamed("id", "id_b")),
                    "id_b",
                    "left_anti",
                ).select(*cols)
            out[stage] = _rewrite_parquet_dir(
                spark, f"{path}/{stage}", df, target_rows_per_file
            )
        if _parquet_dir_exists(led_path):
            out["retracted"] = _rewrite_parquet_dir(
                spark,
                led_path,
                spark.read.parquet(led_path),
                target_rows_per_file,
            )
            _stamp_resolved_retractions(path, n_r)
        return out


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): the
    first 8 hex chars of md5 over the value's string form, mod n.
    The split/sampling hash for train/val/test assignment — content-
    addressed, so assignment survives repartitioning, re-ingestion,
    and engine changes (DuckDB twin:
    ``('0x' || substring(md5(x), 1, 8))::BIGINT % n``). Narrow
    expression, no shuffle."""
    col = F.col(col) if isinstance(col, str) else col
    word = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
    return word % n_buckets


def pack_bins(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy sequence packing into fixed-capacity context windows —
    the pretraining batch-prep step (concat-and-split): documents are
    laid out in ``id_col`` order, each document starts at the running
    token offset of its predecessors, and its bin is
    ``start_offset // capacity``. A document may straddle a bin
    boundary; it belongs to the bin where it STARTS — exactly the
    GPT-style "concatenate and cut at context length" layout.

    Scale design: packing is an inherently sequential prefix sum, so
    it is SHARDED — ``shard = hash_bucket(id, n_shards)`` and the
    cumulative-sum window partitions by (group, shard). Every shard
    packs independently and in parallel (precisely how a production
    run packs per input shard; bins are shard-local), so there is no
    global window and no single-task stage; per-shard state is one
    running BIGINT. Token counts use the shared
    :func:`normalized_words` splitter, so the DuckDB oracle agrees
    token-for-token. → one row per document:
    (group, shard, bin, id, toks, start_offset)."""
    w = W.partitionBy(group_col, "__shard").orderBy(F.col("id").asc())
    return (
        df.select(
            F.col(group_col),
            F.col(id_col).alias("id"),
            hash_bucket(id_col, n_shards).alias("__shard"),
            F.size(normalized_words(text_col)).cast("bigint").alias("toks"),
        )
        .withColumn(
            "start_offset",
            F.coalesce(
                F.sum("toks").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0).cast("bigint"),
            ),
        )
        .select(
            group_col,
            F.col("__shard").alias("shard"),
            # integer `div`, not a double divide-and-truncate: a
            # double round-trip can misplace a document one bin off
            # once offsets grow large, and the oracle's `//` is exact
            F.expr(f"start_offset div {int(capacity)}").alias("bin"),
            "id",
            "toks",
            "start_offset",
        )
    )


# Canonical RE2-compatible scrub patterns — ONE definition shared by
# the t33 inventory query and the curation pipeline's redact stage so
# the Spark sides can never drift (the DuckDB oracle necessarily
# carries its own literal copy of the same strings).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"


def denylist_pattern(terms: tuple[str, ...] | list[str]) -> str:
    """``\\b``-anchored alternation over literal denylist terms.

    Terms must be word-character-only (``[A-Za-z0-9_]+``): a regex
    metacharacter would be interpolated into the pattern (``C++`` is a
    PatternSyntaxException at action time; ``node.js`` silently
    matches ``nodeXjs``), and ``\\b`` itself misfires on terms that
    start/end with non-word characters — so anything else is refused
    loudly here, at build time."""
    import re

    bad = [t for t in terms if not re.fullmatch(r"\w+", t)]
    if bad:
        raise ValueError(
            f"denylist_pattern: terms must be word characters only, got {bad!r}"
        )
    return r"\b(" + "|".join(terms) + r")\b"


def redact_text(col: Column | str, rules: list[tuple[str, str]]) -> Column:
    """Sequential regex redaction — the PII / denylist scrub step of a
    curation pipeline: ``rules`` is an ordered list of (pattern,
    replacement) applied left to right with global replacement.
    Patterns must stay in the RE2-compatible subset (character
    classes, alternation, ``\\b`` word boundaries — no lookaround) so
    the DuckDB oracle (``regexp_replace(..., 'g')``) and Spark's Java
    regex agree byte-for-byte. Replacements must be LITERAL strings:
    ``$`` and ``\\`` are group references in Java's replacement
    grammar but not in RE2's (which uses ``\\1``), so a replacement
    containing either would silently mean different things per engine
    — refused loudly here. Narrow expression, no shuffle, JVM-side."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, repl in rules:
        if "$" in repl or "\\" in repl:
            raise ValueError(
                "redact_text: replacement must be a literal string "
                f"(no '$' or backslash), got {repl!r}"
            )
        out = F.regexp_replace(out, pattern, repl)
    return out


def quota_sample(df: DataFrame, group_col: str, id_col: str, k: int) -> DataFrame:
    """Deterministic per-group quota sample (stratified sampling for
    data mixing): the ``k`` members with the smallest
    ``(md5(id), id)`` rank within each group, with the rank attached
    as ``sample_rank``. Content-addressed order → the same ids are
    chosen on every run, cluster size, and engine.

    Scale design — two-phase top-k so a dominant group cannot pile
    onto one reducer: phase 1 ranks within (group, input partition),
    spreading a hot group over every partition and keeping at most
    ``k`` survivors from each; phase 2 ranks the ≤ k×P survivors per
    group exactly. The global per-group top-k is always contained in
    the union of per-partition top-ks, so the result is identical to
    a single global window — asserted in tests/test_scale.py."""
    reserved = {"__pid", "__rk", "sample_rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"quota_sample: input columns {sorted(reserved)} collide with "
            "reserved working/output column names"
        )
    h = F.md5(F.col(id_col).cast("string"))
    pre = df.withColumn("__pid", F.spark_partition_id())
    w1 = W.partitionBy(group_col, "__pid").orderBy(h.asc(), F.col(id_col).asc())
    pruned = (
        pre.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__pid", "__rk")
    )
    w2 = W.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def bigram_pmi(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-``k`` word-bigram collocations by pointwise mutual
    information — the classic corpus-statistics op for phrase mining
    and tokenizer/vocabulary construction. PMI(a,b) =
    log2(P(ab) / (P(a)·P(b))) over OCCURRENCE counts (not document
    frequencies), with a ``min_count`` support floor to kill
    one-off pairings.

    Scale shape: two explode+groupBy count passes (map-side
    partials) — the ONLY corpus scans; the (n_uni, n_bi) totals are
    aggregated from the vocab-sized count frames, never by
    re-scanning the corpus — corpus totals as a 1-row broadcast,
    unigram lookups as two joins on the (≤ vocab-sized) bigram
    table, and a global TakeOrdered for the top-k — k rows per
    partition reach the merge, never the counts. Parity: each count is an exact 64-bit
    integer widened to double BEFORE the products (a double chain is
    IEEE-identical in both engines at any magnitude, and exact below
    2^53 — whereas a 64-bit integer product of c_ab·n_uni² would
    silently wrap in Spark once n_uni reaches ~1.4e9, while DuckDB's
    BIGINT multiply errors: loud-vs-silent divergence); then one
    division, log2 and the 1e-6 rounding. Ties break on the bigram
    string. → (bigram, n_pairs, pmi), k rows."""
    words = df.select(F.explode(normalized_words(text_col)).alias("w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bigrams = df.select(
        F.explode(shingles(normalized_words(text_col), 2)).alias("bg")
    )
    bi_all = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab"))
    bi = bi_all.filter(F.col("c_ab") >= min_count)
    # totals from the count frames (n_uni = Σ uni counts, n_bi = Σ ALL
    # bigram counts incl. below-floor) — identical values, and the
    # count-frame aggregates reuse the groupBy exchanges instead of
    # scanning + exploding the corpus twice more
    totals = F.broadcast(
        uni.agg(F.sum("c").alias("n_uni")).crossJoin(
            bi_all.agg(F.sum("c_ab").alias("n_bi"))
        )
    )
    parts = F.split(F.col("bg"), " ", 2)
    scored = (
        bi.withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .join(totals)
        .select(
            "bg",
            F.col("c_ab").alias("n_pairs"),
            F.round(
                F.log2(
                    (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_bi").cast("double") * F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), F.col("bg").asc()).limit(k).select(
        F.col("bg").alias("bigram"), "n_pairs", "pmi"
    )


def trigram_lm_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-trained character-trigram language-model score — the
    statistical quality signal beyond t7's rule ratios: docs whose
    trigram distribution diverges from the corpus (mojibake, binary
    spill, wrong-language fragments) score low. One-shot form of
    :class:`TrigramLM` (train on ``df``, score ``df``); use the class
    directly to train once and score many frames/sessions.
    → (id, doc_lp)."""
    return TrigramLM(df, text_col, id_col).score()


class TrigramLM:
    """Trainable char-trigram LM substrate — the
    :class:`DedupIndex`/``VectorIndex`` build-once pattern applied to
    the statistical quality model (VERDICT r5 #5): the expensive parts
    (corpus gram explode, count aggregation) are lazy, checkpointed,
    and ``save``/``load``-able, so one training pass serves every
    scoring consumer in this session and — via parquet — every later
    one. The model is add-one smoothed over per-document DISTINCT
    trigrams (document-frequency LM — duplicate-insensitive, so a
    boilerplate flood cannot distort it).

    Scoring is corpus-linear: one join of the scored frame's grams
    against the (vocab-sized) count table, the (total, vocab)
    normalizer as a 1-row broadcast, one per-doc aggregate. Unseen
    grams in a scored frame take the smoothed floor count 0 (the
    add-one numerator 1) — identical to the training-corpus path for
    grams that ARE in vocabulary, so scoring the training corpus is
    bit-identical to the one-shot form.

    Determinism: per-gram log2 probabilities are rounded to the 1e-6
    grid (both engines take log2 of bit-identical doubles; a 1-ulp
    libm divergence sits ~6 orders below the grid), and the per-doc
    mean sums exact scaled integers. Docs shorter than n chars have no
    grams and are absent from score output (mirrored by the oracle's
    unnest)."""

    _META_SCHEMA = (
        "n int, text_col string, id_col string, max_id bigint, "
        "n_retractions int"
    )

    def __init__(
        self,
        df: DataFrame,
        text_col: str,
        id_col: str,
        n: int = 3,
        checkpoint: bool = True,
    ) -> None:
        """``checkpoint=False`` keeps grams/counts as plain Catalyst
        plans: required when the training frame carries ``observe``
        nodes a caller still needs attributed (``localCheckpoint``
        truncates the logical plan AT CALL TIME, silently detaching
        upstream Observations — the curation LM gate hit this), at the
        cost of re-running the explode per consumer action."""
        self._df = df
        self._text_col = text_col
        self._id_col = id_col
        self._n = n
        self._checkpoint = checkpoint
        self._grams: DataFrame | None = None
        self._counts: DataFrame | None = None
        # the id high-water mark — the idempotence anchor for streamed
        # ingestion (None until save() stamps it or load() reads it)
        self.max_id: int | None = None
        # the last update()'s delta, kept for append_saved
        self._delta: dict | None = None
        self.builds: dict[str, int] = {"grams": 0, "counts": 0}
        self.updates = 0
        # retraction state (round 9): committed retraction count (the
        # negative-segment commit protocol's sequence), the ledger of
        # retracted doc ids (double-retraction refusal), and the
        # pending delta retract_saved lands
        self.n_retractions = 0
        self._retracted_ids: DataFrame | None = None
        self._retract_delta: dict | None = None
        # a load(as_of_id=...) historical view is read-only against
        # the original log (round 10); None everywhere else
        self._as_of: int | None = None

    def _gram_frame(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(char_ngrams(text_col, self._n)).alias("g"),
        )

    @property
    def grams(self) -> DataFrame:
        """(id, gram) over the TRAINING corpus — lazy checkpoint
        (materializes with the first action), shared by the count
        groupBy and the self-scoring join."""
        if self._grams is None:
            if self._df is None:
                raise ValueError(
                    "TrigramLM: no training corpus attached (load()-ed "
                    "model) - pass the frame to score(df, ...)"
                )
            self.builds["grams"] += 1
            g = self._gram_frame(self._df, self._text_col, self._id_col)
            self._grams = g.localCheckpoint(eager=False) if self._checkpoint else g
        return self._grams

    @property
    def counts(self) -> DataFrame:
        """(g, c) document-frequency counts — THE model (vocab-sized),
        checkpointed; the normalizer derives from it."""
        if self._counts is None:
            self.builds["counts"] += 1
            c = self.grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
            self._counts = c.localCheckpoint(eager=False) if self._checkpoint else c
        return self._counts

    @property
    def totals(self) -> DataFrame:
        """1-row (n_total, v) normalizer — aggregated from the count
        table (never by re-scanning the corpus)."""
        return self.counts.agg(
            F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
        )

    def score(
        self,
        df: DataFrame | None = None,
        text_col: str | None = None,
        id_col: str | None = None,
    ) -> DataFrame:
        """Per-doc mean log2 probability under the trained model →
        (id, doc_lp). With no arguments, scores the training corpus
        from the SHARED gram checkpoint (no second explode); pass a
        frame to score held-out/new documents — their unseen grams hit
        the add-one floor."""
        if df is None:
            grams = self.grams
        else:
            grams = self._gram_frame(
                df, text_col or self._text_col, id_col or self._id_col
            )
        logp = F.round(
            F.log2(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("n_total") + F.col("v"))
            ),
            6,
        )
        scored = (
            grams.join(self.counts, "g", "left")
            .join(F.broadcast(self.totals))
            .select("id", logp.alias("logp"))
        )
        n = F.count(F.lit(1))
        return scored.groupBy("id").agg(
            F.round(
                F.sum(F.round(F.col("logp") * 1e6).cast("bigint")).cast("double")
                / (n * 1e6),
                6,
            ).alias("doc_lp")
        )

    def update(
        self,
        new_docs: DataFrame,
        text_col: str | None = None,
        id_col: str | None = None,
    ) -> "TrigramLM":
        """Absorb a corpus delta WITHOUT retraining — the LM leg of
        the incremental-substrate family (DedupIndex.update /
        VectorIndex.update / CurationState.update): the model is a
        document-frequency count table over per-doc DISTINCT grams,
        which is ADDITIVE over disjoint document sets, so
        ``counts(old) ⊕ counts(delta)`` EQUALS retraining on
        old ∪ delta exactly (test-asserted) — one delta-sized explode
        plus a vocab-sized outer merge, never an old-corpus scan. The
        caller owns the disjointness contract (re-ingesting a doc
        would double its grams' df, same as DedupIndex). Works on a
        ``load``-ed model (no training corpus needed). Mutates and
        returns ``self``; the merged counts re-checkpoint and
        ``save`` rewrites the vocab-sized table (the one substrate
        whose persisted form is cheap to rewrite by construction)."""
        icol = id_col or self._id_col
        dg = self._gram_frame(new_docs, text_col or self._text_col, icol)
        # checkpoint-shared by the merge below AND append_saved's
        # segment write (without it each consumer re-runs the explode)
        dc = (
            dg.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__dc"))
            .localCheckpoint(eager=False)
        )
        merged = (
            self.counts.join(dc, "g", "full")
            .select(
                "g",
                (
                    F.coalesce("c", F.lit(0)) + F.coalesce("__dc", F.lit(0))
                ).alias("c"),
            )
        )
        self._counts = (
            merged.localCheckpoint(eager=False) if self._checkpoint else merged
        )
        if self._df is not None:
            self._df = self._df.unionByName(
                new_docs.select(*self._df.columns)
            )
            self._grams = None  # re-derive lazily over the merged corpus
        # delta bookkeeping for append_saved: the partial counts and
        # the delta's id bounds (computed eagerly only when the model
        # is stamped — in-session builds that never persist pay no
        # extra job; a stamped model must track the mark so a later
        # save()/append_saved() stamps correctly)
        bounds: tuple[int, int] | None = None
        if self.max_id is not None:
            b = new_docs.agg(
                F.min(icol).alias("lo"), F.max(icol).alias("hi")
            ).first()
            if b["hi"] is not None:
                bounds = (int(b["lo"]), int(b["hi"]))
                self.max_id = max(self.max_id, bounds[1])
        seg = dc.select("g", F.col("__dc").alias("c"))
        ids = new_docs.select(F.col(icol).alias("id"))
        # ACCUMULATE across chained update() calls (round 9, family-wide
        # fix): append_saved lands ONE segment — landing only the last
        # delta would silently drop earlier ones while the stamp covers
        # their ids. Counts are additive, so the combined segment is an
        # additive merge of the pending ones.
        prev = self._delta
        if prev is not None:
            seg = (
                prev["counts"].unionByName(seg)
                .groupBy("g")
                .agg(F.sum("c").alias("c"))
                .localCheckpoint(eager=False)
            )
            ids = prev["ids"].unionByName(ids)
            pb = prev["bounds"]
            if pb is not None and bounds is not None:
                bounds = (min(pb[0], bounds[0]), max(pb[1], bounds[1]))
            else:
                # one side unknown (empty delta / unstamped model) —
                # append_saved recomputes from the combined ids, which
                # is always correct
                bounds = None
        self._delta = {"counts": seg, "ids": ids, "bounds": bounds}
        self.updates += 1
        return self

    def retract(
        self,
        docs: DataFrame,
        text_col: str | None = None,
        id_col: str | None = None,
    ) -> "TrigramLM":
        """Remove previously-ingested documents from the model — the
        deletion half :meth:`update`'s additivity gives for free
        mathematically (``counts(corpus) ⊖ counts(retracted)`` EQUALS
        retraining on ``corpus ∖ retracted`` exactly, because the
        document-frequency table is additive over disjoint doc sets;
        oracle-gated as t41), landed as a NEGATIVE per-doc-distinct
        gram segment: one retracted-delta-sized explode plus a
        vocab-sized merge, never a corpus rescan. A gram whose merged
        count reaches zero leaves the vocabulary (and the smoothing
        normalizer), exactly as a rebuild would drop it.

        The caller passes the documents WITH their original text (the
        model stores no corpus, so the subtraction needs the texts —
        the same contract as the reference deletion flow of any
        count-based sketch). Ids already retracted are refused loudly
        (double subtraction would corrupt counts — the in-memory
        ledger mirrors the saved one); :meth:`retract_saved` lands the
        delta on a persisted model under the retraction-sequence
        commit protocol. Mutates and returns ``self``."""
        icol = id_col or self._id_col
        tcol = text_col or self._text_col
        ids = (
            docs.select(F.col(icol).cast("long").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        if self._retracted_ids is not None:
            n_dead = ids.join(self._retracted_ids, "id", "left_semi").count()
            if n_dead == ids.count():
                # full replay of a committed retraction — idempotent:
                # no subtraction, and retract_saved's ledger check
                # skips the landing (the lazy delta is never evaluated)
                self._retract_delta = self._retract_delta or {
                    "counts": ids.sparkSession.createDataFrame(
                        [], "g string, c bigint"
                    ),
                    "ids": ids,
                }
                return self
            if n_dead:
                raise ValueError(
                    f"TrigramLM.retract: {n_dead} id(s) were already "
                    "retracted — subtracting a document twice corrupts "
                    "the document-frequency counts"
                )
        if self.max_id is None and self._df is not None:
            # pin the allocation high-water mark BEFORE the corpus
            # view shrinks: retraction never un-allocates an id (the
            # absorber's monotone contract relies on that)
            row = self._df.agg(F.max(self._id_col)).first()
            self.max_id = None if row[0] is None else int(row[0])
        neg = (
            self._gram_frame(docs, tcol, icol)
            .groupBy("g")
            .agg((-F.count(F.lit(1))).alias("__dc"))
            .localCheckpoint(eager=False)
        )
        merged = (
            self.counts.join(neg, "g", "full")
            .select(
                "g",
                (
                    F.coalesce("c", F.lit(0)) + F.coalesce("__dc", F.lit(0))
                ).alias("c"),
            )
            .filter(F.col("c") != 0)
        )
        self._counts = (
            merged.localCheckpoint(eager=False) if self._checkpoint else merged
        )
        if self._df is not None:
            self._df = self._df.join(
                ids.withColumnRenamed("id", self._id_col),
                self._id_col,
                "left_anti",
            )
            self._grams = None  # re-derive lazily over the shrunk corpus
        seg = neg.select("g", F.col("__dc").alias("c"))
        prev = self._retract_delta
        if prev is not None:
            # ACCUMULATE across chained retract() calls (the same
            # family-wide rule update() follows): retract_saved lands
            # ONE combined segment
            seg = (
                prev["counts"].unionByName(seg)
                .groupBy("g")
                .agg(F.sum("c").alias("c"))
                .localCheckpoint(eager=False)
            )
            ids = prev["ids"].unionByName(ids)
        self._retract_delta = {"counts": seg, "ids": ids}
        self._retracted_ids = (
            ids
            if self._retracted_ids is None
            else self._retracted_ids.unionByName(ids).localCheckpoint(
                eager=False
            )
        )
        return self

    def retract_saved(self, path: str) -> None:
        """Land the pending :meth:`retract` delta on a :meth:`save`-d
        model directory under the RETRACTION-SEQUENCE commit protocol
        (the negative mirror of :meth:`append_saved`'s high-water
        stamp, which cannot gate retractions — retracted ids sit at or
        below the mark by definition):

        1. the negative segment lands stamped ``src = -(k+1)`` where
           ``k`` is meta's committed ``n_retractions``;
        2. the ledger (``retracted``: doc_id, rseq) appends the ids at
           ``rseq = k+1``;
        3. meta commits ``n_retractions = k+1``.

        Readers serve only committed rows (positive ``src`` ≤ the id
        stamp, negative ``src`` with ``-src`` ≤ ``n_retractions``), so
        a crash after any prefix of {segment, ledger, meta} leaves the
        served counts EXACTLY the pre-retract state; the replay purges
        the uncommitted rows (rename-aside rewrite of the committed
        subset) and re-lands. A replay that finds its ids fully in the
        COMMITTED ledger skips idempotently; a partial overlap is a
        caller bug, raised. Single-writer-fenced (see :mod:`..lease`)."""
        self._refuse_if_as_of("retract_saved")
        if self._retract_delta is None:
            raise ValueError(
                "TrigramLM.retract_saved: no retract() delta to land — "
                "call retract(docs) first"
            )
        from .lease import dir_lease

        with dir_lease(path, role="TrigramLM.retract_saved"):
            self._retract_saved_unfenced(path)

    def _retract_saved_unfenced(self, path: str) -> None:
        _recover_swapped_dir(f"{path}/counts")
        m = _read_control_row(f"{path}/meta")
        stamp = m.get("max_id")
        if stamp is None:
            raise ValueError(
                "TrigramLM.retract_saved: the saved model has no max_id "
                "high-water mark — re-save() from the corpus (which "
                "stamps it) before retracting"
            )
        n_r = int(m.get("n_retractions") or 0)
        spark = self._retract_delta["counts"].sparkSession
        raw = self._raw_counts(spark, path)
        # both torn-state probes in ONE pass over the count log (were
        # two limit(1) jobs): unstamped update rows show as src above
        # the stamp, uncommitted negative segments as src below -n_r
        src_bounds = raw.agg(
            F.max("src").alias("hi"), F.min("src").alias("lo")
        ).first()
        if src_bounds["hi"] is not None and int(src_bounds["hi"]) > int(stamp):
            raise ValueError(
                "TrigramLM.retract_saved: unstamped UPDATE segment rows on "
                "disk — a previous append crashed before its meta stamp; "
                "replay that delta (append_saved(repair=True) via the "
                "absorber) before retracting"
            )
        ledger_path = f"{path}/retracted"
        has_ledger = _parquet_dir_exists(ledger_path)
        if has_ledger:
            _recover_swapped_dir(ledger_path)
        if src_bounds["lo"] is not None and int(src_bounds["lo"]) < -n_r:
            # a previous retract_saved crashed between its segment
            # append and its meta commit — purge the uncommitted
            # segment rows (they are self-describing: src < -n_r),
            # then land fresh
            _rewrite_parquet_dir(
                spark,
                f"{path}/counts",
                self._committed(raw, stamp, n_r),
                1 << 20,
            )
        if has_ledger:
            # the ledger purge runs on its OWN condition (not nested
            # under the segment check): a crash between the segment
            # purge above and this purge on a previous replay leaves
            # uncommitted ledger rows with clean counts, and the
            # fresh re-land below would otherwise duplicate them at
            # the same rseq
            led = spark.read.parquet(ledger_path)
            if led.filter(F.col("rseq") > n_r).limit(1).count():
                _rewrite_parquet_dir(
                    spark,
                    ledger_path,
                    led.filter(F.col("rseq") <= n_r),
                    1 << 20,
                )
        ids = self._retract_delta["ids"]
        row = ids.agg(
            F.count(F.lit(1)).alias("n"), F.max("id").alias("hi")
        ).first()
        if row["hi"] is None:
            self._retract_delta = None
            return  # empty delta — nothing to land
        if int(row["hi"]) > int(stamp):
            raise ValueError(
                "TrigramLM.retract_saved: delta contains id(s) above the "
                f"saved high-water mark {stamp} — those documents were "
                "never ingested into this model"
            )
        if has_ledger:
            committed_led = spark.read.parquet(ledger_path).filter(
                F.col("rseq") <= n_r
            )
            n_in = ids.join(
                committed_led.select("id"), "id", "left_semi"
            ).count()
            if n_in == int(row["n"]):
                self._retract_delta = None
                return  # fully-committed replay — already landed
            if n_in:
                raise ValueError(
                    f"TrigramLM.retract_saved: {n_in} of {row['n']} delta "
                    "id(s) are already retracted on disk — a partial "
                    "overlap double-subtracts; retract only new ids"
                )
        rseq = n_r + 1
        self._retract_delta["counts"].select(
            "g", "c", F.lit(-rseq).cast("bigint").alias("src")
        ).write.mode("append").parquet(f"{path}/counts")
        ids.select(
            "id", F.lit(rseq).cast("bigint").alias("rseq")
        ).write.mode("append").parquet(ledger_path)
        self.max_id = int(stamp)
        self.n_retractions = rseq
        self._write_meta(path)
        self._retract_delta = None

    @staticmethod
    def _committed(raw: DataFrame, stamp, n_retractions: int) -> DataFrame:
        """The committed subset of the segment log: unstamped legacy
        rows, positive segments within the id high-water mark, and
        negative (retraction) segments within the committed retraction
        sequence."""
        if stamp is None:
            return raw
        return raw.filter(
            F.col("src").isNull()
            | ((F.col("src") >= 0) & (F.col("src") <= int(stamp)))
            | ((F.col("src") < 0) & (-F.col("src") <= int(n_retractions)))
        )

    def save(self, path: str) -> None:
        """Persist the count table + meta as parquet — the LM twin of
        ``DedupIndex.save``: train once per corpus snapshot, score
        from any session.

        On-disk form (round 9): an ADDITIVE SEGMENT LOG
        ``(g, c, src)`` — ``src`` stamps every row with the id
        high-water mark of the write that produced it. A full save is
        one segment; :meth:`append_saved` appends O(delta-vocab)
        segments; :meth:`load` serves committed rows (``src`` ≤ the
        meta stamp) merged by an additive groupBy — exactly the
        merge :meth:`update` performs in memory, resolved at read.
        The stamp is what makes a torn append IDENTIFIABLE (rows
        beyond the meta mark are uncommitted) — the same src-stamp
        repair contract as ``CurationState``'s hash log.

        From an as-of view, saving to a NEW path branches the
        historical state (deliberate); saving to the view's own SOURCE
        directory refuses — it would overwrite the live segment log
        with the boundary-filtered view, destroying every post-``H``
        segment and resetting the retraction sequence."""
        src = getattr(self, "_as_of_src", None)
        if src is not None and _same_dir(src, path):
            raise ValueError(
                f"TrigramLM.save: this model is an as-of view of {src} — "
                "overwriting its own source would destroy every segment "
                f"past the as-of boundary (as_of_id={self._as_of}); "
                "save(new_path) to branch the historical state instead"
            )
        hi = self.max_id
        if hi is None and self._df is not None:
            # the stamp covers DOC ids, not gram rows — a corpus of
            # sub-n-char docs has an empty gram frame but still needs
            # its high-water mark (the Hypothesis lifecycle property
            # found exactly this edge)
            row = self._df.agg(F.max(self._id_col)).first()
            hi = None if row[0] is None else int(row[0])
        self.max_id = hi
        self.counts.select(
            "g", "c", F.lit(hi).cast("bigint").alias("src")
        ).write.mode("overwrite").parquet(f"{path}/counts")
        if self._retracted_ids is not None:
            # the counts above are already retraction-merged (one
            # positive segment), but the ledger must survive the
            # snapshot so later retractions keep refusing re-deletes;
            # rseq 0 ≤ any n_retractions — always committed
            self._retracted_ids.select(
                "id", F.lit(0).cast("bigint").alias("rseq")
            ).write.mode("overwrite").parquet(f"{path}/retracted")
        elif _parquet_dir_exists(f"{path}/retracted"):
            # a retraction-free snapshot over a directory that had a
            # ledger: a stale ledger would refuse legitimate ids
            import shutil

            shutil.rmtree(_local_path(f"{path}/retracted"))
        # the snapshot holds ONE positive segment (retractions already
        # merged in) — the retraction sequence restarts
        self.n_retractions = 0
        self._write_meta(path)

    def _write_meta(self, path: str) -> None:
        # column config persists alongside n (mirroring
        # DedupIndex._META_SCHEMA) so a model trained on nonstandard
        # column names scores/updates the right columns after load()
        _write_control_parquet(
            f"{path}/meta",
            [(
                self._n,
                self._text_col,
                self._id_col,
                self.max_id,
                int(self.n_retractions),
            )],
            self._META_SCHEMA,
        )

    @staticmethod
    def _raw_counts(spark, path: str) -> DataFrame:
        """The segment log with the compat ``src`` column (models
        saved before the segmented form have none — all rows are
        base/committed)."""
        raw = _read_parquet_pinned(spark, f"{path}/counts")
        if "src" not in raw.columns:
            raw = raw.withColumn("src", F.lit(None).cast("bigint"))
        return raw

    @classmethod
    def load(cls, spark, path: str, *, as_of_id: int | None = None) -> "TrigramLM":
        """Re-open a :meth:`save`-d model; scoring needs no training
        corpus (build counters stay 0). ``score()`` with no frame is
        unavailable on a loaded model — pass the frame to score.
        Serves the COMMITTED segments (rows stamped ≤ the meta
        high-water mark) merged on read; a torn append's unstamped
        rows are invisible, so a crashed absorber never skews
        scores.

        ``as_of_id`` (round 10) serves the HISTORICAL view at an
        ingestion high-water mark ``H``: positive segments with
        ``src ≤ H`` — i.e. the model exactly as it stood after the
        last commit at or below ``H`` — with the segment log itself as
        the time axis (no extra bookkeeping: every committed write is
        already a stamped segment). Two deliberate refusals:

        - the history FLOOR is the oldest positive segment — a
          :meth:`save` or :meth:`compact` merges history into one
          segment, so earlier points are gone (the Delta-style trade:
          time travel is bounded by the maintenance cadence);
        - RETRACTIONS are never time-travelable. Committed negative
          segments apply at every as-of point (a takedown must erase
          the doc from historical views too — serving a pre-deletion
          snapshot would resurrect it), and because negative segments
          are batch-granular, an as-of point that predates a
          retracted doc's ingestion cannot apply its batch and is
          REFUSED rather than served wrong (``H`` must cover the
          retraction ledger's id high-water).

        An as-of model is READ-ONLY against its SOURCE directory: the
        ``*_saved`` mutation entries refuse, and :meth:`save` refuses
        the source path itself (overwriting the live log with the
        boundary-filtered view would destroy every post-``H`` segment
        — the round-10 advice gap). ``save(new_path)`` is the
        deliberate escape hatch: it BRANCHES the historical view into
        a fresh directory, leaving the source untouched."""
        lm = cls.__new__(cls)
        lm._df = None
        m = _read_control_row(f"{path}/meta")
        # models saved before the meta gained column config (n-only
        # schema) fall back to the historical defaults
        lm._text_col = m.get("text_col", "text")
        lm._id_col = m.get("id_col", "id")
        lm._n = m["n"]
        lm._grams = None
        lm._checkpoint = True
        hi = m.get("max_id")
        lm.max_id = None if hi is None else int(hi)
        lm.n_retractions = int(m.get("n_retractions") or 0)
        lm._as_of = None
        if as_of_id is not None:
            return cls._load_as_of(spark, path, lm, int(as_of_id))
        raw = cls._committed(
            cls._raw_counts(spark, path), lm.max_id, lm.n_retractions
        )
        lm._counts = (
            raw.groupBy("g")
            .agg(F.sum("c").alias("c"))
            # a fully-retracted gram merges to 0 — out of the
            # vocabulary (and the smoothing normalizer), as a rebuild
            # would have it
            .filter(F.col("c") != 0)
            .localCheckpoint(eager=False)
        )
        lm._retracted_ids = None
        lm._retract_delta = None
        if _parquet_dir_exists(f"{path}/retracted"):
            led = spark.read.parquet(f"{path}/retracted").filter(
                F.col("rseq") <= lm.n_retractions
            )
            lm._retracted_ids = led.select("id")
        lm._delta = None
        lm.builds = {"grams": 0, "counts": 0}
        lm.updates = 0
        return lm

    @classmethod
    def _load_as_of(cls, spark, path: str, lm: "TrigramLM", h: int) -> "TrigramLM":
        """The :meth:`load` ``as_of_id`` leg — see load's docstring
        for the semantics and the two refusal rules it implements."""
        raw = cls._raw_counts(spark, path)
        stamp = lm.max_id if lm.max_id is not None else h
        cut = min(h, int(stamp))
        # legacy probe + boundary + floor in ONE pass over the count
        # log (were up to three driver jobs)
        probe = raw.agg(
            F.max(F.col("src").isNull().cast("int")).alias("has_null"),
            F.max(
                F.when(
                    (F.col("src") >= 0) & (F.col("src") <= cut), F.col("src")
                )
            ).alias("b"),
            F.min(F.when(F.col("src") >= 0, F.col("src"))).alias("floor"),
        ).first()
        if probe["has_null"]:
            raise ValueError(
                "TrigramLM.load(as_of_id=...): the count log predates "
                "the stamped segment form (null src rows) — no history "
                "axis exists; re-save() to stamp a base segment"
            )
        pos = raw.filter((F.col("src") >= 0) & (F.col("src") <= cut))
        if probe["b"] is None:
            raise ValueError(
                f"TrigramLM.load(as_of_id={h}): no committed segment at "
                f"or below that mark — the history floor is {probe['floor']} "
                "(save()/compact() merge earlier history away)"
            )
        boundary = int(probe["b"])
        neg = raw.filter(
            (F.col("src") < 0) & (-F.col("src") <= int(lm.n_retractions))
        )
        lm._retracted_ids = None
        if _parquet_dir_exists(f"{path}/retracted"):
            led = spark.read.parquet(f"{path}/retracted").filter(
                F.col("rseq") <= int(lm.n_retractions)
            )
            led_hi = led.agg(F.max("id")).first()[0]
            if led_hi is not None and int(led_hi) > boundary:
                raise ValueError(
                    f"TrigramLM.load(as_of_id={h}): the committed "
                    f"retraction ledger reaches doc id {int(led_hi)}, "
                    f"beyond the served boundary {boundary} — deletions "
                    "are not time-travelable (a historical view must "
                    "not resurrect a retracted doc), and negative "
                    "segments are batch-granular, so this point cannot "
                    "be served; pass as_of_id >= the ledger high-water"
                )
            lm._retracted_ids = led.select("id")
        lm._counts = (
            pos.unionByName(neg)
            .groupBy("g")
            .agg(F.sum("c").alias("c"))
            .filter(F.col("c") != 0)
            .localCheckpoint(eager=False)
        )
        lm.max_id = boundary
        lm._as_of = h
        lm._as_of_src = path  # save() refuses this target (see load)
        lm._retract_delta = None
        lm._delta = None
        lm.builds = {"grams": 0, "counts": 0}
        lm.updates = 0
        return lm

    def _refuse_if_as_of(self, op: str) -> None:
        if getattr(self, "_as_of", None) is not None:
            raise ValueError(
                f"TrigramLM.{op}: this model is a READ-ONLY historical "
                f"view (load(as_of_id={self._as_of})) — mutating it "
                "would fork the linear segment log; load() the current "
                "state to mutate"
            )

    def append_saved(self, path: str, *, repair: bool = False) -> None:
        """Single-writer-fenced entry (see :mod:`..lease`) over
        :meth:`_append_saved_unfenced`."""
        self._refuse_if_as_of("append_saved")
        from .lease import dir_lease

        with dir_lease(path, role="TrigramLM.append_saved"):
            return self._append_saved_unfenced(path, repair=repair)

    def _append_saved_unfenced(self, path: str, *, repair: bool = False) -> None:
        """Merge the LAST :meth:`update`'s delta into a :meth:`save`-d
        model directory WITHOUT rewriting the vocab table: the model
        is an additive count log, so the delta's partial counts land
        as ONE O(delta-vocab) segment stamped with the delta's max id,
        and the meta stamp trails the write (the family commit
        protocol: a crash between segment and stamp leaves the rows
        identifiable as uncommitted — readers ignore them, the replay
        repairs them). Monotone-id contract enforced against the DISK
        stamp, mirroring ``DedupIndex.append_saved``.

        ``repair=True`` is the REDO form for a crash inside a previous
        append (segment rows landed — possibly torn mid-multi-file —
        the meta stamp did not): the unstamped rows are purged by a
        rename-aside rewrite of the committed subset, then the fresh
        segment lands. Unlike DedupIndex's anti-join redo, purge is
        the correct primitive here because identical ``(g, c)`` rows
        across segments are LEGITIMATE — only the stamp identifies
        the crashed write. Costs one vocab-sized rewrite, paid only on
        the crash-replay branch."""
        if not self._delta:
            raise ValueError(
                "TrigramLM.append_saved: no update() delta to append — "
                "call update(new_docs) first"
            )
        m = _read_control_row(f"{path}/meta")
        stamp = m.get("max_id")
        # the trailing meta rewrite re-writes EVERY field — sync the
        # retraction sequence from disk so an in-session object never
        # clobbers committed retractions back to uncommitted
        self.n_retractions = int(m.get("n_retractions") or 0)
        if stamp is None:
            raise ValueError(
                "TrigramLM.append_saved: the saved model has no max_id "
                "high-water mark (meta predates it, or it was saved "
                "without a training corpus) — re-save() from the corpus "
                "(which stamps it) before appending deltas"
            )
        b = self._delta["bounds"]
        if b is None:
            row = self._delta["ids"].agg(
                F.min("id").alias("lo"), F.max("id").alias("hi")
            ).first()
            if row["hi"] is None:
                self._delta = None
                return  # empty delta — nothing to land
            b = (int(row["lo"]), int(row["hi"]))
        if b[0] <= int(stamp):
            raise ValueError(
                "TrigramLM.append_saved: monotone-id contract violated — "
                f"delta min id {b[0]} <= saved max_id {stamp}; appending "
                "a re-ingested doc would double its grams' document "
                "frequency"
            )
        if repair:
            # the crashed append may itself have died inside THIS
            # purge's rename-aside swap — recover the surviving copy
            _recover_swapped_dir(f"{path}/counts")
            spark = self._delta["counts"].sparkSession
            committed = self._committed(
                self._raw_counts(spark, path),
                stamp,
                int(m.get("n_retractions") or 0),
            )
            _rewrite_parquet_dir(spark, f"{path}/counts", committed, 1 << 20)
        self._delta["counts"].select(
            "g", "c", F.lit(b[1]).cast("bigint").alias("src")
        ).write.mode("append").parquet(f"{path}/counts")
        self.max_id = max(int(stamp), b[1])
        self._write_meta(path)
        self._delta = None

    @classmethod
    def foreach_batch_update(cls, spark, lm_path: str):
        """Structured-Streaming ingestion into a saved LM — the last
        index family to join the streaming-absorber set
        (`incremental.foreach_batch_update`, `DedupIndex.
        foreach_batch_update`, `RepeatIndex.foreach_batch_update`,
        `vectorops.foreach_batch_add`, `multimodal.foreach_batch_add`):
        a ``(batch_df, batch_id) -> None`` function for
        ``writeStream.foreachBatch`` that absorbs each micro-batch as
        one O(delta) :meth:`update` + :meth:`append_saved`. No corpus
        log is co-maintained — the LM's additive math never needs old
        TEXTS (the one structural simplification vs DedupIndex's
        absorber).

        At-least-once safety: meta's ``max_id`` is the high-water mark
        (a pre-mark save is refused loudly), a fully replayed batch is
        skipped idempotently, a straddling batch raises, and a replay
        that finds landed-but-unstamped segment rows (the crash-inside
        -append signature) takes the redo branch — purge + fresh
        append via ``append_saved(repair=True)``. The replayed absorb
        converges to exactly the clean-absorb state regardless of
        which prefix of {segment files, meta stamp} the crash
        preserved (test-asserted across the crash windows)."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            # a prior repair purge may have died between its swap's two
            # renames — recover the surviving complete copy first
            _recover_swapped_dir(f"{lm_path}/counts")
            lm = cls.load(spark, lm_path)
            if lm.max_id is None:
                raise ValueError(
                    "TrigramLM.foreach_batch_update: the saved model has "
                    "no max_id high-water mark — re-save() from the "
                    "corpus before attaching streamed ingestion"
                )
            b = batch_df.agg(
                F.min(lm._id_col).alias("lo"), F.max(lm._id_col).alias("hi")
            ).first()
            if b["hi"] is None:
                return
            if int(b["hi"]) <= lm.max_id:
                return  # fully-replayed batch — already absorbed
            if int(b["lo"]) <= lm.max_id:
                raise ValueError(
                    "TrigramLM.foreach_batch_update: monotone-id contract "
                    f"violated — batch ids straddle the saved max "
                    f"{lm.max_id} (lo={b['lo']}, hi={b['hi']})"
                )
            # redo detection: unstamped segment rows mean the previous
            # attempt at SOME batch crashed between its segment append
            # and the meta stamp — one vocab-sized existence probe,
            # paid per batch (the corpus-log completeness check other
            # absorbers pay is the same cost class)
            redo = bool(
                cls._raw_counts(spark, lm_path)
                .filter(F.col("src") > lm.max_id)
                .limit(1)
                .count()
            )
            lm.update(batch_df)
            lm.append_saved(lm_path, repair=redo)

        return absorb

    @classmethod
    def foreach_batch_retract(cls, spark, lm_path: str):
        """Structured-Streaming DELETION feed — the LM member of the
        deletion-absorber family: each micro-batch carries the
        documents to retract WITH their original texts (the model
        stores no corpus, and the negative segment needs the grams),
        landing as one :meth:`retract` + :meth:`retract_saved`.
        At-least-once safety: docs whose ids sit in the committed
        ledger are pre-filtered (replays and duplicate deletion
        requests absorb silently — never a double subtraction), and a
        torn previous landing is purged-and-relanded by
        retract_saved's protocol."""

        def absorb(batch_df: "DataFrame", batch_id: int) -> None:
            lm = cls.load(spark, lm_path)
            docs = batch_df
            if lm._retracted_ids is not None:
                docs = docs.join(
                    F.broadcast(
                        lm._retracted_ids.withColumnRenamed(
                            "id", lm._id_col
                        )
                    ),
                    lm._id_col,
                    "left_anti",
                )
            docs = docs.localCheckpoint()
            if docs.first() is None:
                return  # fully absorbed already
            lm.retract(docs)
            lm.retract_saved(lm_path)

        return absorb

    @classmethod
    def compact(
        cls, spark, path: str, *, target_rows_per_file: int = 1 << 20
    ) -> dict:
        """Rewrite a :meth:`save`-d model's segment log into its
        steady-state form — the maintenance half of
        :meth:`append_saved`: every streamed delta appends an
        O(delta-vocab) segment, so the merge-on-read groupBy and the
        per-file open cost grow with UPDATE COUNT, not data.
        Compaction resolves the additive merge once (one row per gram,
        stamped at the current high-water mark) and re-partitions to
        ``ceil(rows / target_rows_per_file)`` files. The served
        COUNTS VIEW is row-identical before and after
        (equality-tested); the swap is the same rename-aside contract
        as every other family's compact.

        Refuses (ValueError) while unstamped segment rows show a
        crashed append: resolving them into the merged table would
        commit a torn write — replay the delta first
        (``append_saved(repair=True)`` via the absorber).
        Single-writer-fenced (see :mod:`..lease`)."""
        from .lease import dir_lease

        with dir_lease(path, role="TrigramLM.compact"):
            return cls._compact_unfenced(
                spark, path, target_rows_per_file=target_rows_per_file
            )

    @classmethod
    def _compact_unfenced(
        cls, spark, path: str, *, target_rows_per_file: int = 1 << 20
    ) -> dict:
        m = _read_control_row(f"{path}/meta")
        stamp = m.get("max_id")
        n_r = int(m.get("n_retractions") or 0)
        raw = cls._raw_counts(spark, path)
        if stamp is not None and raw.filter(
            (F.col("src") > int(stamp)) | (F.col("src") < -n_r)
        ).limit(1).count():
            raise TornStateError(
                "TrigramLM.compact: uncommitted segment rows on disk — a "
                "previous append (or retraction) crashed before its meta "
                "stamp; replay that delta (append_saved(repair=True) via "
                "the absorber, or retract_saved with the same ids) before "
                "compacting"
            )
        merged = (
            raw.groupBy("g")
            .agg(F.sum("c").alias("c"))
            # fully-retracted grams merge to 0 — resolved out, exactly
            # as the committed read view drops them
            .filter(F.col("c") != 0)
            .select("g", "c", F.lit(stamp).cast("bigint").alias("src"))
        )
        out = {
            "counts": _rewrite_parquet_dir(
                spark, f"{path}/counts", merged, target_rows_per_file
            )
        }
        if _parquet_dir_exists(f"{path}/retracted"):
            out["retracted"] = _rewrite_parquet_dir(
                spark,
                f"{path}/retracted",
                spark.read.parquet(f"{path}/retracted").filter(
                    F.col("rseq") <= n_r
                ),
                target_rows_per_file,
            )
            _stamp_resolved_retractions(path, n_r)
        return out


def weighted_sample(
    df: DataFrame, group_col: str, id_col: str, weight: Column, k: int
) -> DataFrame:
    """Deterministic per-group WEIGHTED sample without replacement —
    the data-mixing step when documents should be drawn proportional
    to a quality/length weight rather than uniformly. The classic
    Efraimidis–Spirakis reservoir scheme (public literature): each row
    draws a uniform u ∈ (0, 1] and the k largest ``u^(1/w)`` win; here
    u is CONTENT-ADDRESSED (md5 of the id → (0,1]), so the sample is
    reproducible across runs, cluster sizes, and engines, and the key
    is compared in log space (``ln(u)/w``, monotone in u^(1/w))
    rounded to the 1e-6 grid for oracle parity.

    Two-phase top-k exactly like :func:`quota_sample`: phase 1 ranks
    within (group, input partition) so a dominant group spreads over
    every partition and contributes ≤ k survivors each; phase 2 ranks
    the ≤ k×P survivors exactly. → input columns + ``sample_rank``."""
    reserved = {"__pid", "__rk", "__wkey", "sample_rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"weighted_sample: input columns {sorted(reserved)} collide with "
            "reserved working/output column names"
        )
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (h + 1) / F.lit(4294967296.0)
    key = F.round(F.log(u) / weight, 6)
    pre = df.withColumn("__wkey", key).withColumn("__pid", F.spark_partition_id())
    w1 = W.partitionBy(group_col, "__pid").orderBy(
        F.col("__wkey").desc(), F.col(id_col).asc()
    )
    pruned = (
        pre.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__pid", "__rk")
    )
    w2 = W.partitionBy(group_col).orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
        .drop("__wkey")
    )


def simhash16_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """DataFrame-level SimHash — the scale path: explode distinct words,
    one groupBy(id) with 16 codegen SUM aggregates (map-side partials),
    then assemble the 16-bit sketch from the vote signs. Identical
    values to :func:`simhash16`, but the per-bit vote loop runs inside
    whole-stage codegen instead of 16 interpreted ``aggregate`` lambda
    passes (~5x faster measured). → (id, simhash).

    Note: ``normalized_words`` never yields an empty array (an empty
    text splits to [""]), so every document survives the explode."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(normalized_words(text_col))).alias("w"),
    )
    tok = words.select("id", F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    votes = tok.groupBy("id").agg(*aggs)
    sim = None
    for i in range(16):
        b = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = b if sim is None else sim + b
    return votes.select("id", sim.alias("simhash"))


_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "y", "es"),
}


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic: count stopword hits per
    language, argmax with a deterministic tie-break (lexicographically
    LAST language code wins a hit tie — struct-max semantics); no hits
    → 'unknown'."""
    words = normalized_words(col)
    scores = []
    for code in sorted(_STOPWORDS):
        hits = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS[code])))
        scores.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("unknown"))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length saturation, stopword
    ratio, mean-word-length proximity to prose (~4.5 chars). Pure
    integer-derived double arithmetic → bit-stable across engines."""
    col = F.col(col) if isinstance(col, str) else col
    words = normalized_words(col)
    n_words = F.size(words)
    n_chars = F.length(col)
    stop_hits = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and", "to")))
    stop_ratio = stop_hits.cast("double") / n_words
    mean_wlen = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / n_words
    length_term = F.least(F.lit(1.0), n_chars.cast("double") / F.lit(300.0))
    prose_term = F.lit(1.0) - F.least(F.lit(1.0), F.abs(mean_wlen - F.lit(4.5)) / F.lit(10.0))
    return F.round(
        F.lit(0.4) * length_term + F.lit(0.3) * stop_ratio + F.lit(0.3) * prose_term, 6
    )


def token_counts(col: Column | str) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count): words plus
    standalone punctuation — the pre-tokenizer split most BPE vocabs
    use."""
    col = F.col(col) if isinstance(col, str) else col
    ws = F.size(normalized_words(col))
    bpe = F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), 0))
    return ws, bpe
