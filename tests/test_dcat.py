"""dcat_to_ckan golden tests against the reference fixture input.ttl.

Expected values are hand-derived from
`l-dcatAp11ToCkanBatch/src/test/resources/input.ttl` (2 datasets, one
organizationID override, shared distribution) and `filetypes-skos.ttl`
(RDF_TRIG → "RDF TriG"). JSON is compared as parsed dicts —
key-order-insensitive, exactly as CKAN consumes it.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lp_etl_plugins_spark import dcat, model

INPUT_TTL = "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl"
SKOS_TTL = "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/filetypes-skos.ttl"

DISTRO = {
    "name": "English title",
    "description": "English desc",
    "format": "RDF TriG",
    "url": "http://download1.cz",
    "distro_url": "http://real.dataset.iri/distribution",
    "resource_type": "file",
    "created": "2016-07-12",
    "last_modified": "2016-07-25",
    "describedBy": "http://schema1.iri",
    "license_link": "http://my.license.url",
    "mimetype": "application/trig",
}

EXPECTED_DS1 = {
    "tags": [{"name": "data"}, {"name": "open"}],
    "name": "test99",
    "title": "Dataset title",
    "notes": "Dataset description",
    "maintainer_email": "opendata@cssz.cz",
    "maintainer": "Ing. Šunka",
    "publisher_uri": "https://cssz.cz",
    "real_issued": "2016-07-12",
    "real_modified": "2016-07-25",
    "nkod_link": "http://iri.on.pvs",
    "frequency": "http://publications.europa.eu/resource/authority/frequency/ANNUAL_3",
    "theme": "http://publications.europa.eu/resource/authority/data-theme/TECH ",
    "resources": [DISTRO],
}

EXPECTED_DS2 = {
    "tags": [{"name": "data"}, {"name": "open"}],
    "name": "test100",
    "title": "Dataset2 title",
    "notes": "Dataset description",
    "maintainer_email": "opendata@cssz.cz",
    "maintainer": "Ing. Šunka",
    "owner_org": "ooo2",
    "publisher_uri": "https://cssz.cz",
    "real_issued": "2016-07-12",
    "real_modified": "2016-07-25",
    "frequency": "http://publications.europa.eu/resource/authority/frequency/ANNUAL_3",
    "temporal_start": "2016-07-04",
    "temporal_end": "2016-07-16",
    "spatial_uri": "http://spatialX.cz",
    "theme": "http://publications.europa.eu/resource/authority/data-theme/TECH ",
    "resources": [DISTRO],
}


@pytest.fixture(scope="module")
def graphs(spark):
    meta = model.triples_from_turtle(spark, INPUT_TTL).cache()
    codes = model.triples_from_turtle(spark, SKOS_TTL).cache()
    meta.count(), codes.count()
    return meta, codes


def _payloads(spark, graphs, **kw):
    meta, codes = graphs
    out = dcat.dcat_to_ckan(spark, meta, codelists=codes, lang="en", **kw)
    return {r["dataset_id"]: json.loads(r["payload"]) for r in out.collect()}


def test_golden_nkod(spark, graphs):
    got = _payloads(spark, graphs)
    assert set(got) == {"test99", "test100"}
    assert got["test99"] == EXPECTED_DS1
    assert got["test100"] == EXPECTED_DS2


def test_ckan_profile_omits_nkod_fields(spark, graphs):
    got = _payloads(spark, graphs, profile=dcat.PROFILE_CKAN)
    for payload in got.values():
        for key in ("publisher_uri", "theme", "frequency", "real_issued", "spatial_uri"):
            assert key not in payload
        assert "name" in payload and "tags" in payload
        for res in payload["resources"]:
            assert "mimetype" not in res and "license_link" not in res


def test_language_filter(spark, graphs):
    meta, codes = graphs
    out = dcat.dcat_to_ckan(spark, meta, codelists=codes, lang="cs")
    got = {r["dataset_id"]: json.loads(r["payload"]) for r in out.collect()}
    # Czech: titles/descriptions are @en only → absent; ds2 has cs keywords
    assert "title" not in got["test99"]
    assert got["test99"]["tags"] == []
    assert got["test100"]["tags"] == [{"name": "data"}, {"name": "otevřená"}]
    assert got["test100"]["publisher_name"] == "ČSSZ"
    # distribution has cs title/desc
    assert got["test99"]["resources"][0]["name"] == "Český titul"


def test_merge_with_existing_state(spark, graphs):
    meta, codes = graphs
    existing = spark.createDataFrame(
        [
            # matched by distro_url for ds1 → id reused
            Row(dataset="http://real.dataset.iri", id="res-1",
                url="http://other.url", distro_url="http://real.dataset.iri/distribution",
                raw_json='{"id":"res-1","url":"http://other.url"}'),
            # matched by url fallback for ds2
            Row(dataset="http://real.dataset.iri/2", id="res-2",
                url="http://download1.cz", distro_url=None,
                raw_json='{"id":"res-2","url":"http://download1.cz"}'),
            # unmatched → preserved verbatim
            Row(dataset="http://real.dataset.iri", id="res-3",
                url="http://legacy.example/x", distro_url=None,
                raw_json='{"id":"res-3","url":"http://legacy.example/x","custom":"kept"}'),
        ]
    )
    out = dcat.dcat_to_ckan(spark, meta, codelists=codes, lang="en", existing=existing)
    got = {r["dataset_id"]: json.loads(r["payload"]) for r in out.collect()}
    ds1_res = got["test99"]["resources"]
    assert [r.get("id") for r in ds1_res] == ["res-1", "res-3"]
    assert ds1_res[1] == {"id": "res-3", "url": "http://legacy.example/x", "custom": "kept"}
    assert [r.get("id") for r in got["test100"]["resources"]] == ["res-2"]


def test_organization_payloads(spark, graphs):
    meta, _ = graphs
    datasets = dcat.extract_datasets(spark, meta, lang="cs")
    orgs = {r["publisher_uri"]: (r["title"], r["name"])
            for r in dcat.organization_payloads(datasets).collect()}
    # only ds1 lacks an organizationID override; ČSSZ slugifies to cssz
    assert orgs == {"https://cssz.cz": ("ČSSZ", "cssz")}


def test_write_jsonl(spark, graphs, tmp_path):
    meta, codes = graphs
    out = dcat.dcat_to_ckan(spark, meta, codelists=codes, lang="en")
    path = str(tmp_path / "ckan.jsonl")
    dcat.write_jsonl(out, path)
    import glob

    [part] = glob.glob(path + "/part-*")
    lines = [json.loads(line) for line in open(part, encoding="utf-8")]
    assert [d["name"] for d in lines] == ["test100", "test99"]  # sorted by id
    assert lines[1] == EXPECTED_DS1


def test_dkan_ckan_profile_runs(spark, graphs):
    """dcat_to_dkan with the ckan profile must not crash on the
    nkod-only columns (issued/modified/media_type) absent from the
    ckan pivot — regression for an UNRESOLVED_COLUMN failure."""
    meta, _ = graphs
    nodes = dcat.dcat_to_dkan(spark, meta, lang="en", profile=dcat.PROFILE_CKAN)
    rows = nodes.collect()
    assert len(rows) > 0
    forms = [json.loads(r["form_json"]) for r in rows if r["kind"] == "dataset"]
    assert forms and all(f["type"] == "dataset" for f in forms)


def test_merge_duplicate_live_keys_pick_one(spark):
    """Two live resources sharing a url key must not multiply the
    distribution into two payload rows — one (min id) is matched, the
    other falls through to preserved."""
    distros = spark.createDataFrame(
        [("d1", "http://distro/1", "http://u1")],
        "dataset string, distribution string, url string",
    )
    existing = spark.createDataFrame(
        [
            ("d1", "r2", "http://u1", None, "{}"),
            ("d1", "r1", "http://u1", None, "{}"),
        ],
        "dataset string, id string, url string, distro_url string, raw_json string",
    )
    merged, preserved = dcat.merge_existing_resources(distros, existing)
    mrows = merged.collect()
    assert len(mrows) == 1
    assert mrows[0]["matched_id"] == "r1"  # deterministic min
    assert [r["id"] for r in preserved.collect()] == ["r2"]
