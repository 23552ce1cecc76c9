"""Deterministic corpus inflation for scaling measurements.

The 100 TB claims in SCALE.md are design arguments (bounded posting
lists, banded LSH, candidate-only verification); this module provides
the measurement side: blow a corpus up 8×/64× with a DETERMINISTIC
transform whose duplicate/near-dup STRUCTURE scales the way a real
larger corpus does — more clusters, not bigger clusters — then time
the operators and fit the growth exponent (scripts/scaling_curve.py
writes the table into SCALE.md).

Why not plain replication: R copies of every document collapse into
R-sized duplicate clusters, so pairwise operators (LSH candidates,
components) would grow Ω(R²) BY CONSTRUCTION of the test corpus — a
measurement artifact, not an engine property. Instead each replica k
prefixes every word with ``r<k>x``: replica WORD vocabularies are
disjoint, so no word-level shingle (the MinHash/LSH/Jaccard-verify
family, t3/t4/t10/t26) ever matches across replicas and that family's
dup structure is exactly R independent copies of the original.

CHAR n-grams are different: the prefix only perturbs grams near each
word boundary, so interior char-grams (e.g. ``ame`` inside
``r3xgamename``-style tokens) remain shared across replicas — their
document frequency multiplies ≈ R× while the absolute ``max_df=64``
cap stays fixed, so at 8×/64× the gram family (t11/t14) measures an
increasingly PRUNED candidate workload, not R independent copies of
the 1× workload. That is the cap doing at small scale exactly what it
does at 100 TB (ubiquitous grams carry no dedup signal and are
dropped), but it means the fitted exponents for t11/t14 understate a
workload-preserving scale-up — SCALE.md's caveat (c) states this next
to the numbers. Embeddings are circularly rotated by k dimensions per
replica: norms are preserved, and rotated random vectors decorrelate,
so near-dup/ANN candidate structure grows ≈ R×, not R²."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["inflate_documents", "inflate_embeddings"]


def inflate_documents(docs: DataFrame, factor: int) -> DataFrame:
    """→ ``factor`` replicas per document under disjoint vocabularies;
    doc_id' = doc_id·factor + k keeps ids unique and deterministic."""
    rep = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__k")
    )
    tag = F.concat(F.lit("r"), F.col("__k").cast("string"), F.lit("x"))
    words = F.split(F.col("text"), r"\s+")
    new_text = F.concat_ws(
        " ", F.transform(words, lambda w: F.concat(tag, w))
    )
    return rep.select(
        (F.col("doc_id") * factor + F.col("__k")).alias("doc_id"),
        new_text.alias("text"),
        "lang",
        "source",
        F.length(new_text).alias("n_chars"),
    )


def inflate_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    """→ ``factor`` replicas per vector, replica k circularly rotated
    by k % dims positions (norm-preserving, decorrelating);
    vec_id' = vec_id·factor + k."""
    rep = emb.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__k")
    )
    dims = F.size("embedding")
    s = F.col("__k") % dims
    rotated = F.concat(
        F.slice(F.col("embedding"), s + 1, dims - s),
        F.slice(F.col("embedding"), 1, s),
    )
    return rep.select(
        (F.col("vec_id") * factor + F.col("__k")).alias("vec_id"),
        rotated.alias("embedding"),
        "label",
    )
