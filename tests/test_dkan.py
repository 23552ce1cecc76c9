"""dcat_to_dkan golden tests (Drupal form-field encoding) on input.ttl."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from lp_etl_plugins_spark import dcat, model
from lp_etl_plugins_spark.catalog import dkan_form_encode
from lp_etl_plugins_spark.util import observe_rows

INPUT_TTL = "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl"


@pytest.fixture(scope="module")
def nodes(spark):
    meta = model.triples_from_turtle(spark, INPUT_TTL)
    out = dcat.dcat_to_dkan(spark, meta, lang="en")
    return {(r["kind"], r["node_key"]): json.loads(r["form_json"]) for r in out.collect()}


def test_dataset_node_fields(nodes):
    ds2 = nodes[("dataset", "test100")]
    assert ds2["type"] == "dataset"
    assert ds2["title"] == "Dataset2 title"
    assert ds2["body[und][0][value]"] == "Dataset description"
    assert ds2["created"] == "2016-07-12"
    assert ds2["changed"] == "2016-07-25"
    assert ds2["field_tags[und][value_field]"] == '""data"" ""open"" '
    assert ds2["field_maintainer_email[und][0][value]"] == "opendata@cssz.cz"
    assert ds2["field_publisher_uri[und][0][value]"] == "https://cssz.cz"
    assert "field_publisher_name[und][0][value]" not in ds2  # cs-only name, en load
    assert ds2["field_frequency_ods[und][0][value]"].endswith("/frequency/ANNUAL_3")
    assert ds2["field_temporal_start[und][0][value]"] == "2016-07-04"
    # spatial present but not RÚIAN → mandatory defaults ST / 1
    assert ds2["field_spatial[und][0][value]"] == "http://spatialX.cz"
    assert ds2["field_ruian_type[und][0][value]"] == "ST"
    assert ds2["field_ruian_code[und][0][value]"] == "1"
    assert ds2["field_theme[und][0][value]"].endswith("TECH ")
    # ds1 has NO spatial → defaults still mandatory
    ds1 = nodes[("dataset", "test99")]
    assert "field_spatial[und][0][value]" not in ds1
    assert ds1["field_ruian_type[und][0][value]"] == "ST"
    assert ds1["field_ruian_code[und][0][value]"] == "1"


def test_resource_node_fields(nodes):
    res = nodes[("resource", "http://real.dataset.iri/distribution")]
    assert res["type"] == "resource"
    assert res["title"] == "English title"
    assert res["body[und][0][value]"] == "English desc"
    assert res["field_link_remote_file[und][0][filemime]"] == "application/trig"
    assert res["field_link_remote_file[und][0][filefield_remotefile][url]"] == "http://download1.cz"
    assert res["field_described_by[und][0][value]"] == "http://schema1.iri"
    assert res["field_licence[und][0][value]"] == "http://my.license.url"
    assert res["field_mimetype[und][0][value]"] == "application/trig"


def test_ruian_recode_and_defaults(spark):
    ttl = """
    @prefix ckan: <http://linked.opendata.cz/ontology/ckan/> .
    @prefix dct: <http://purl.org/dc/terms/> .
    <urn:d1> a <http://www.w3.org/ns/dcat#Dataset> ;
        ckan:datasetID "r1" ;
        dct:title "T"@cs ;
        dct:spatial <http://ruian.linked.opendata.cz/resource/obce/554782> .
    <urn:d2> a <http://www.w3.org/ns/dcat#Dataset> ;
        ckan:datasetID "r2" ;
        dct:title "U"@cs ;
        dct:spatial <http://ruian.linked.opendata.cz/resource/vusc/19> .
    """
    meta = model.triples_from_turtle(spark, ttl)
    out = {r["node_key"]: json.loads(r["form_json"])
           for r in dcat.dcat_to_dkan(spark, meta, lang="cs").collect()}
    assert out["r1"]["field_ruian_type[und][0][value]"] == "OB"
    assert out["r1"]["field_ruian_code[und][0][value]"] == "554782"
    assert out["r2"]["field_ruian_type[und][0][value]"] == "VC"
    # missing description in NKOD falls back to the title (mandatory)
    assert out["r1"]["body[und][0][value]"] == "T"
    # missing frequency gets the mandatory UNKNOWN default
    assert out["r1"]["field_frequency_ods[und][0][value]"].endswith("/frequency/UNKNOWN")


def test_form_encode_passthrough_for_expanded_keys():
    body = dkan_form_encode({"title": "T", "body[und][0][value]": "B", "field_x": "v"})
    assert "body%5Bund%5D%5B0%5D%5Bvalue%5D=B" in body
    assert "field_x%5Bund%5D%5B0%5D%5Bvalue%5D=v" in body


def test_observe_rows_progress(spark):
    df = spark.range(1000)
    observed, obs = observe_rows(df, "p")
    assert observed.count() == 1000
    assert obs.get["rows"] == 1000


def test_cube_input_guard(spark):
    from lp_etl_plugins_spark import cube

    desc = model.triples_from_turtle(spark, "tests/fixtures/fdp/descriptor.ttl")
    with pytest.raises(ValueError, match="at most one CSV"):
        cube.fdp_to_cube(
            spark, desc,
            {"a.csv": "tests/fixtures/fdp/budget.csv", "b.csv": "tests/fixtures/fdp/budget.csv"},
        )
