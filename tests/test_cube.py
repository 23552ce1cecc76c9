"""fdp_to_cube tests on the committed fixture (tests/fixtures/fdp/)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lp_etl_plugins_spark import cube, model

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fdp")
DESCRIPTOR = os.path.join(FIX, "descriptor.ttl")
CSV = os.path.join(FIX, "budget.csv")

SKOS = "http://www.w3.org/2004/02/skos/core#"


@pytest.fixture(scope="module")
def spec(spark):
    return cube.extract_spec(spark, model.triples_from_turtle(spark, DESCRIPTOR))


@pytest.fixture(scope="module")
def triples(spark):
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    return cube.fdp_to_cube(spark, desc, {"budget.csv": CSV}).cache()


def test_spec_extraction(spec):
    assert spec.dataset_iri == "urn:fx/dataset"
    assert spec.package_name == "testpkg"
    assert spec.currency_as_dimension is True
    assert {d.kind for d in spec.dimensions} == set(cube._DIM_KINDS)
    assert spec.dialects["budget.csv"].delimiter == ";"
    [m] = spec.measures
    assert (m.factor, m.decimal_sep, m.group_sep) == (2.0, ",", " ")
    prog = next(d for d in spec.dimensions if d.name == "prog")
    # label folding removed the label attribute and attached its column
    assert [(a.source_column, a.label_column) for a in prog.attributes] == [
        ("prog_code", "prog_label")
    ]
    tree = next(d for d in spec.dimensions if d.name == "tree")
    assert [a.name for a in tree.attributes] == ["dept", "division"]  # child→parent


def test_measure_values(triples):
    amounts = {
        r["s"]: (r["o_value"], r["o_datatype"])
        for r in triples.filter(
            F.col("p") == "http://data.openbudgets.eu/ontology/dsd/measure/amount"
        ).collect()
    }
    dec = "http://www.w3.org/2001/XMLSchema#decimal"
    assert amounts == {
        "urn:fx/dataset/observation/1/for-amount": ("2469.12", dec),
        "urn:fx/dataset/observation/2/for-amount": ("157.80", dec),
        # parse failure → raw string passthrough (FdpMeasure.java:96-100)
        "urn:fx/dataset/observation/3/for-amount": ("not-a-number", None),
        "urn:fx/dataset/observation/4/for-amount": ("4000.00", dec),
    }


def test_dimension_links_row1(triples):
    row1 = {
        (r["p"], r["o_value"])
        for r in triples.filter(F.col("s") == "urn:fx/dataset/observation/1/for-amount").collect()
    }
    assert ("urn:fx/dim/pair", "urn:fx/dataset/pair/x1-y1") in row1
    assert ("urn:fx/dim/org", "urn:fx/dataset/org/Acme-Corp") in row1
    assert (
        "urn:fx/dim/date",
        "http://reference.data.gov.uk/id/gregorian-day/2016-07-12",
    ) in row1
    assert ("urn:fx/dim/tree", "urn:fx/dataset/dept/D1") in row1


def test_label_folding_emissions(triples):
    # P1/P2 carry labels → prefLabel + notation; P3 has no label →
    # value via the attribute's own property + merged-key prefLabel
    p3 = {
        (r["p"], r["o_value"])
        for r in triples.filter(F.col("s") == "urn:fx/dataset/prog/P3").collect()
    }
    assert (SKOS + "prefLabel", "P3") in p3
    assert ("urn:fx/p/progcode", "P3") in p3
    assert not any(p == SKOS + "notation" for p, _ in p3)
    p1 = {
        (r["p"], r["o_value"])
        for r in triples.filter(F.col("s") == "urn:fx/dataset/prog/P1").collect()
    }
    assert (SKOS + "prefLabel", "Program One") in p1
    assert (SKOS + "notation", "P1") in p1


def test_hierarchy_broader_edges(triples):
    broader = {
        (r["s"], r["o_value"])
        for r in triples.filter(F.col("p") == SKOS + "broader").collect()
    }
    assert broader == {
        ("urn:fx/dataset/dept/D1", "urn:fx/dataset/division/Div-A"),
        ("urn:fx/dataset/dept/D2", "urn:fx/dataset/division/Div-A"),
        ("urn:fx/dataset/dept/D3", "urn:fx/dataset/division/Div-B"),
    }
    # hasTopConcept points at the TOP (parent-most) level only
    tops = {
        r["o_value"]
        for r in triples.filter(
            (F.col("p") == SKOS + "hasTopConcept")
            & (F.col("s") == "http://data.openbudgets.eu/resource/testpkg/codelist/tree")
        ).collect()
    }
    assert tops == {"urn:fx/dataset/division/Div-A", "urn:fx/dataset/division/Div-B"}


def test_codelist_dedup_default_vs_raw(spark):
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    dedup = cube.fdp_to_cube(spark, desc, {"budget.csv": CSV})
    raw = cube.fdp_to_cube(spark, desc, {"budget.csv": CSV}, dedup_codelists=False)
    # bag mode re-emits codelist triples per row (reference behavior);
    # the SET of triples is identical (SURVEY §4)
    assert raw.count() > dedup.count()
    assert raw.distinct().count() == dedup.distinct().count()


def test_strict_dates_raises(spark, tmp_path):
    bad = tmp_path / "bad.csv"
    header = open(CSV, encoding="utf-8").readline()
    bad.write_text(header + '"1,0";d;catA;12-07-2016;a;b;P1;L;D1;Div A;Org\n')
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    # strict mode aborts in-plan (raise_error) when the job executes
    with pytest.raises(Exception, match="12-07-2016"):
        cube.fdp_to_cube(spark, desc, {"budget.csv": str(bad)}).count()
    # non-strict mode: row survives, date triple absent
    out = cube.fdp_to_cube(spark, desc, {"budget.csv": str(bad)}, strict_dates=False)
    assert out.filter(F.col("p") == "urn:fx/dim/date").count() == 0
    # and no NULL-subject codelist triple leaks either (the time:Interval
    # object is a constant, so the guard must be on the subject)
    assert out.filter(F.col("s").isNull()).count() == 0


def test_null_date_cell_emits_nothing(spark, tmp_path):
    """DateDimension.java:64-81 parity: an EMPTY date cell (null after
    the all-string CSV read) emits no date triple and no time:Interval
    codelist triple — in both strict and non-strict mode."""
    empty = tmp_path / "empty_date.csv"
    header = open(CSV, encoding="utf-8").readline()
    empty.write_text(header + '"1,0";d;catA;;a;b;P1;L;D1;Div A;Org\n')
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    for strict in (True, False):
        out = cube.fdp_to_cube(spark, desc, {"budget.csv": str(empty)}, strict_dates=strict)
        rows = out.cache()
        assert rows.filter(F.col("p") == "urn:fx/dim/date").count() == 0
        assert rows.filter(F.col("s").isNull()).count() == 0
        # the observation itself still exists
        assert rows.filter(F.col("o_value") == "http://purl.org/linked-data/cube#Observation").count() == 1
        rows.unpersist()


def test_auto_routing_by_suffix(spark, tmp_path):
    """F11 endsWith dispatch: .nt passthrough vs CSV, routed by name."""
    import shutil

    nt = tmp_path / "extra.nt"
    nt.write_text('<urn:auto/s> <urn:auto/p> "v" .\n')
    csv_copy = tmp_path / "budget.csv"  # basename must match fdp:name
    shutil.copy(CSV, csv_copy)
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    out = cube.fdp_to_cube_auto(spark, desc, [str(csv_copy), str(nt)])
    assert out.filter(F.col("s") == "urn:auto/s").count() == 1
    assert out.filter(F.col("p").endswith("amount")).count() == 4


def test_nt_passthrough_union(spark, tmp_path):
    nt = tmp_path / "extra.nt"
    nt.write_text('<urn:pre/s> <urn:pre/p> "v" .\n')
    desc = model.triples_from_turtle(spark, DESCRIPTOR)
    out = cube.fdp_to_cube(spark, desc, {"budget.csv": CSV}, nt_paths=[str(nt)])
    extra = out.filter(F.col("s") == "urn:pre/s").collect()
    assert [(r["p"], r["o_value"], r["o_type"]) for r in extra] == [("urn:pre/p", "v", "literal")]


def test_write_cube_roundtrip(spark, triples, tmp_path):
    out = str(tmp_path / "cube.nt")
    model.write_ntriples(triples, out, single_file=True)
    back = model.triples_from_ntriples(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in triples.collect()}


def test_hierarchy_cycle_raises():
    """A parentAttribute cycle in the descriptor must fail fast, not
    hang the driver walking the loop forever."""
    attrs = [
        cube.CubeAttribute("i:a", "ca", "f", True, "p:a", name="a", parent_name="b"),
        cube.CubeAttribute("i:b", "cb", "f", True, "p:b", name="b", parent_name="c"),
        cube.CubeAttribute("i:c", "cc", "f", True, "p:c", name="c", parent_name="b"),
    ]
    with pytest.raises(ValueError, match="cycle"):
        cube._order_hierarchy(attrs)


def test_input_guard_rejects_two_nt_inputs(spark):
    with pytest.raises(ValueError, match="at most one CSV"):
        cube.fdp_to_cube(spark, None, csv_paths={}, nt_paths=["a.nt", "b.nt"])


def test_multi_csv_extension(spark, tmp_path):
    """allow_multiple_csvs=True (engine extension): two CSVs compile
    through per-file plans with file-scoped row numbering and
    resource-scoped observation IRIs — no cross-file collisions, row
    triples = the sum of the per-file compiles. Default mode still
    refuses two CSVs (reference L2 guard) and keeps the single-file
    IRIs byte-identical (c1's golden/oracle unchanged)."""
    lines = open(CSV).read().splitlines()
    a, b = tmp_path / "part_a.csv", tmp_path / "part_b.csv"
    a.write_text("\n".join(lines[:3]) + "\n")          # header + rows 1-2
    b.write_text("\n".join([lines[0]] + lines[3:]) + "\n")  # header + rest
    desc = model.triples_from_turtle(spark, DESCRIPTOR)

    with pytest.raises(ValueError, match="allow_multiple_csvs"):
        cube.fdp_to_cube(spark, desc, {"part_a.csv": str(a), "part_b.csv": str(b)})

    multi = cube.fdp_to_cube(
        spark,
        desc,
        {"part_a.csv": str(a), "part_b.csv": str(b)},
        allow_multiple_csvs=True,
    ).cache()
    # observation IRIs are namespaced per resource and disjoint
    obs = (
        multi.filter(F.col("p") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        .filter(F.col("o_value").endswith("Observation"))
        .select("s")
    )
    subs = [r["s"] for r in obs.collect()]
    assert subs and all("/observation/part_" in s for s in subs)
    assert len(subs) == len(set(subs))
    n_a = sum("/observation/part_a.csv/" in s for s in subs)
    n_b = sum("/observation/part_b.csv/" in s for s in subs)
    assert n_a == 2 and n_b == 2  # file-scoped rows: 2 data rows each

    # single-file mode unchanged: same triples as the pinned fixture run
    single = cube.fdp_to_cube(spark, desc, {"budget.csv": CSV})
    one = cube.fdp_to_cube(
        spark, desc, {"budget.csv": CSV}, allow_multiple_csvs=True
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, single.collect()))


def test_bag_parity_multimeasure_codelists(spark, spec):
    """Bag mode (dedup_codelists=False) mirrors the reference's
    per-(dimension, measure) processRow loop (Mapper.java:98-100):
    with two measures every codelist triple is emitted twice per row;
    the default dedup mode still collapses to multiplicity 1."""
    import dataclasses

    m = spec.measures[0]
    spec2 = dataclasses.replace(
        spec, measures=[m, dataclasses.replace(m, name=m.name + "2")]
    )
    csv_df = cube.read_csv_with_dialect(spark, CSV, spec.dialects["budget.csv"])
    pred = (F.col("s") == "urn:fx/dataset/prog/P1") & (
        F.col("p") == SKOS + "prefLabel"
    )
    bag1 = cube.compile_cube(spark, spec, csv_df, dedup_codelists=False)
    bag2 = cube.compile_cube(spark, spec2, csv_df, dedup_codelists=False)
    n1 = bag1.filter(pred).count()
    assert n1 > 0
    assert bag2.filter(pred).count() == 2 * n1
    dd2 = cube.compile_cube(spark, spec2, csv_df, dedup_codelists=True)
    assert dd2.filter(pred).count() == 1
