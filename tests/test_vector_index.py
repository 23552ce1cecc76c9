"""The persistable IVF-PQ serving index (VERDICT r5 #3).

A production vector store builds once per corpus snapshot, persists,
and serves external queries from the loaded artifacts with no corpus
scan. These tests assert the artifact contract: build-once counters,
save/load round trip, and — the serving guarantee — a LOADED index
answering external-probe kNN identically to the in-session build.
"""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from lp_etl_plugins_spark.vectorops import VectorIndex
from lp_etl_plugins_spark.inventory import vectorops as IV


def _probes(emb):
    return IV._external_probes(emb)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stages_build_exactly_once(spark):
    emb = IV._emb(spark, SF_SMOKE)
    idx = VectorIndex(emb)
    for _ in range(2):
        idx.search(_probes(emb), 3).collect()
    assert idx.builds == dict.fromkeys(VectorIndex._STAGES, 1)
    assert idx.codes is idx.codes


def test_loaded_index_serves_identically(spark, tmp_path):
    """The serving path: save → load → search must return exactly the
    in-session build's neighbors, with zero stage builds on the loaded
    side (everything reads the parquet artifacts)."""
    emb = IV._emb(spark, SF_SMOKE)
    probes = _probes(emb)
    built = VectorIndex(emb)
    want = _rows(built.search(probes, 3, nprobe=2))
    assert want  # non-degenerate

    path = str(tmp_path / "vindex")
    built.save(path)
    loaded = VectorIndex.load(spark, path)
    got = _rows(loaded.search(probes, 3, nprobe=2))
    assert got == want
    assert loaded.builds == dict.fromkeys(VectorIndex._STAGES, 0)
    # a second nprobe setting still agrees between built and loaded
    assert _rows(loaded.search(probes, 2, nprobe=1)) == _rows(
        built.search(probes, 2, nprobe=1)
    )


def test_update_appends_under_frozen_quantizers(spark, tmp_path):
    """The serving-index add() contract: update(delta) encodes the
    delta against the FROZEN centroids/codebooks and appends — equal,
    stage-for-stage and search-for-search, to an index whose
    quantizers trained on the base corpus but whose codes/lists cover
    base ∪ delta. Works on a loaded index (the daily-delta pattern)."""
    from pyspark.sql import functions as F

    emb = IV._emb(spark, SF_SMOKE)
    base = emb.filter(F.col("vec_id") % 7 != 3)
    delta = emb.filter(F.col("vec_id") % 7 == 3).drop("label")
    assert delta.count() > 0
    probes = _probes(emb)

    # reference: quantizers from base, codes/lists over base ∪ delta —
    # constructed by encoding the full frame against the base index's
    # stored quantizer stages
    ref = VectorIndex(base)
    want_lists = ref.corpus_lists
    want_codes = ref.codes

    path = str(tmp_path / "vindex_base")
    ref.save(path)
    loaded = VectorIndex.load(spark, path)
    loaded.update(delta)
    assert loaded.builds == dict.fromkeys(VectorIndex._STAGES, 0)

    # appended stages = base stages ∪ delta encodings, ids disjoint
    got_ids = {r["id"] for r in loaded.corpus_lists.select("id").collect()}
    assert got_ids == {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert loaded.codes.count() == emb.count() * 4  # m codes per vector

    # base rows kept their original assignment/codes
    base_lists = {(r["id"], r["bucket"]) for r in want_lists.collect()}
    assert base_lists <= {(r["id"], r["bucket"]) for r in loaded.corpus_lists.collect()}
    base_codes = {tuple(r) for r in want_codes.collect()}
    assert base_codes <= {tuple(r) for r in loaded.codes.collect()}

    # a probe that IS a delta vector (perturbed) finds delta neighbors
    res = loaded.search(probes, 5, nprobe=2)
    delta_ids = {r["vec_id"] for r in delta.select("vec_id").collect()}
    hit_delta = {r["neighbor_id"] for r in res.collect()} & delta_ids
    assert hit_delta, "updated index never serves delta vectors"

    # in-session update agrees with the loaded-index update
    insess = VectorIndex(base).update(delta)
    assert _rows(insess.search(probes, 5, nprobe=2)) == _rows(res)


def test_session_index_cached_and_matches_query_path(spark):
    idx1 = IV.vector_index(spark, SF_SMOKE)
    idx2 = IV.vector_index(spark, SF_SMOKE)
    assert idx1 is idx2
    out = IV.v0_vector_index_serving(spark, SF_SMOKE)
    assert out.filter(F.col("rank") > 3).count() == 0
    assert out.count() > 0
