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
            ("dcat_to_dkan", {"metadata": "metadata", "lang": "en"}),
        ],
    )
    nodes = ctx["dcat_to_dkan.nodes"]
    assert nodes.count() == 4  # 2 dataset nodes + 2 resource nodes (shared distro per dataset)


def test_duplicate_registration_rejected():
    registry.components()  # force builtin registration regardless of test order
    with pytest.raises(ValueError, match="already registered"):
        registry.register("fdp_to_cube", "dup")(lambda spark: None)
