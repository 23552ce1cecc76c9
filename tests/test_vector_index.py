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


def test_session_index_cached_and_matches_query_path(spark):
    idx1 = IV.vector_index(spark, SF_SMOKE)
    idx2 = IV.vector_index(spark, SF_SMOKE)
    assert idx1 is idx2
    out = IV.v0_vector_index_serving(spark, SF_SMOKE)
    assert out.filter(F.col("rank") > 3).count() == 0
    assert out.count() > 0
