"""Tests for the triples data model + graph query layer.

Golden assertions come from reading the reference fixture
`l-dcatAp11ToCkanBatch/src/test/resources/input.ttl` by hand (2 datasets,
one organizationID override, Czech publisher name, multilingual keywords,
an inverse-path CatalogRecord link).
"""

from __future__ import annotations

import pytest

from lp_etl_plugins_spark import graphq, model

INPUT_TTL = "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/input.ttl"
SKOS_TTL = "/root/reference/l-dcatAp11ToCkanBatch/src/test/resources/filetypes-skos.ttl"

DCAT = "http://www.w3.org/ns/dcat#"
DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
CKAN = "http://linked.opendata.cz/ontology/ckan/"


@pytest.fixture(scope="module")
def fixture_triples(spark):
    tr = model.triples_from_turtle(spark, INPUT_TTL)
    tr.cache().count()
    return tr


def test_parse_turtle_literals():
    triples = model.parse_turtle(
        '@prefix ex: <urn:ex/> .\n'
        'ex:s ex:plain "v" ; ex:lang "cs"@cs ; ex:typed "1"^^ex:t ; ex:int 42 ; '
        'ex:dec 4.5 ; ex:bool true .'
    )
    by_p = {t.p.rsplit("/", 1)[-1]: t for t in triples}
    assert by_p["plain"].o_lang is None and by_p["plain"].o_datatype is None
    assert by_p["lang"].o_lang == "cs"
    assert by_p["typed"].o_datatype == "urn:ex/t"
    assert by_p["int"].o_datatype == model.XSD + "integer"
    assert by_p["dec"].o_datatype == model.XSD + "decimal"
    assert by_p["bool"].o_value == "true"


def test_parse_turtle_escapes_and_bnodes():
    triples = model.parse_turtle(
        '<urn:s> <urn:p> "a\\"b\\\\c\\nd\\u00e9" ; <urn:q> [ <urn:r> "x" ] .'
    )
    lit = next(t for t in triples if t.p == "urn:p")
    assert lit.o_value == 'a"b\\c\ndé'
    anon = next(t for t in triples if t.p == "urn:q")
    assert anon.o_type == "bnode"
    inner = next(t for t in triples if t.s == anon.o_value)
    assert inner.p == "urn:r" and inner.o_value == "x"


def test_parse_turtle_collections():
    """RDF collections expand to the rdf:first/rdf:rest/rdf:nil chain;
    an empty collection is rdf:nil itself."""
    triples = model.parse_turtle(
        '<urn:s> <urn:p> ( "a" "b"@cs 3 ) ; <urn:q> ( ) .'
    )
    nil = model.RDF_NS + "nil"
    empty = next(t for t in triples if t.p == "urn:q")
    assert (empty.o_value, empty.o_type) == (nil, "iri")
    head = next(t for t in triples if t.p == "urn:p")
    assert head.o_type == "bnode"
    firsts, node, order = {}, head.o_value, []
    rests = {t.s: t for t in triples if t.p == model.RDF_NS + "rest"}
    for t in triples:
        if t.p == model.RDF_NS + "first":
            firsts[t.s] = t
    while node != nil:
        order.append(firsts[node])
        node = rests[node].o_value
    assert [(t.o_value, t.o_lang, t.o_datatype) for t in order] == [
        ("a", None, None),
        ("b", "cs", None),
        ("3", None, model.XSD + "integer"),
    ]
    assert rests[order[-1].s].o_type == "iri"


def test_fixture_parse_counts(fixture_triples):
    # hand-counted facts from input.ttl
    datasets = fixture_triples.filter(
        f"p = '{model.RDF_TYPE}' and o_value = '{DCAT}Dataset'"
    )
    assert datasets.count() == 2
    kw = fixture_triples.filter(f"p = '{DCAT}keyword'")
    # dataset1: 2 @en; dataset2: 2 @en + 2 @cs
    assert kw.count() == 6
    assert kw.filter("o_lang = 'cs'").count() == 2


def test_skos_fixture_parses(spark):
    sk = model.triples_from_turtle(spark, SKOS_TTL)
    pref = sk.filter(
        "p = 'http://www.w3.org/2004/02/skos/core#prefLabel' and o_lang = 'en'"
    )
    assert pref.count() > 100  # EU file-type authority table


def test_ntriples_roundtrip(spark, fixture_triples, tmp_path):
    nasty = spark.createDataFrame(
        [("urn:x", "urn:p", 'q" b\\ n\n t\t.', "literal", None, None)],
        model.TRIPLES_SCHEMA,
    )
    both = fixture_triples.unionByName(nasty)
    out = str(tmp_path / "rt.nt")
    model.write_ntriples(both, out, single_file=True)
    back = model.triples_from_ntriples(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in both.collect()}


def test_both_reference_fixtures_roundtrip_exactly(spark, fixture_triples, tmp_path):
    """parse_turtle ∘ format_ntriples is the identity, triple for
    triple (as a multiset), on BOTH reference fixtures — the guarantee
    the .nt passthrough path rests on (FdpToRdf.java:306-311)."""
    from collections import Counter

    for name, df in (
        ("input", fixture_triples),
        ("skos", model.triples_from_turtle(spark, SKOS_TTL)),
    ):
        out = str(tmp_path / f"{name}.nt")
        model.write_ntriples(df, out, single_file=True)
        back = model.triples_from_ntriples(spark, out)
        assert Counter(map(tuple, back.collect())) == Counter(
            map(tuple, df.collect())
        ), name


def test_bgp_and_paths(spark, fixture_triples):
    tr = fixture_triples
    ds = graphq.bgp(tr, [("?d", graphq.RDF_TYPE, DCAT + "Dataset")])
    assert sorted(r["d"] for r in ds.collect()) == [
        "http://real.dataset.iri",
        "http://real.dataset.iri/2",
    ]
    # publisher/name 2-hop (DcatAp11ToCkanBatch.java:259)
    pn = graphq.path(tr, "?d", [DCT + "publisher", FOAF + "name"], "?name")
    rows = {(r["d"], r["name"], r["name__lang"]) for r in pn.collect()}
    assert rows == {
        ("http://real.dataset.iri", "ČSSZ", "cs"),
        ("http://real.dataset.iri/2", "ČSSZ", "cs"),
    }
    # inverse path ^foaf:primaryTopic/dcterms:source (:372)
    inv = graphq.path(tr, "?d", ["^" + FOAF + "primaryTopic", DCT + "source"], "?src")
    assert [(r["d"], r["src"]) for r in inv.collect()] == [
        ("http://real.dataset.iri", "http://iri.on.pvs")
    ]


def test_optional_and_not_exists(spark, fixture_triples):
    tr = fixture_triples
    base = graphq.bgp(tr, [("?d", graphq.RDF_TYPE, DCAT + "Dataset")])
    opt = graphq.optional(base, tr, [("?d", CKAN + "organizationID", "?org")])
    assert sorted((r["d"], r["org"]) for r in opt.collect()) == [
        ("http://real.dataset.iri", None),
        ("http://real.dataset.iri/2", "ooo2"),
    ]
    ne = graphq.not_exists(base, tr, [("?d", DCT + "spatial", "?sp")])
    assert [r["d"] for r in ne.collect()] == ["http://real.dataset.iri"]


def test_values_undef_and_lang_filter(spark, fixture_triples):
    tr = fixture_triples
    ds = graphq.bgp(tr, [("?d", graphq.RDF_TYPE, DCAT + "Dataset")])
    v = graphq.values(
        ds, spark, ["?d", "?tag"], [("http://real.dataset.iri", "one"), (None, "any")]
    )
    assert sorted((r["d"], r["tag"]) for r in v.collect()) == [
        ("http://real.dataset.iri", "any"),
        ("http://real.dataset.iri", "one"),
        ("http://real.dataset.iri/2", "any"),
    ]
    kw = graphq.bgp(tr, [("?d", DCAT + "keyword", "?k")])
    cs = graphq.lang_filter(kw, "?k", "cs")
    assert sorted(r["k"] for r in cs.collect()) == ["data", "otevřená"]


def test_scalar_and_group_count(spark, fixture_triples):
    tr = fixture_triples
    kw = graphq.bgp(tr, [("?d", DCAT + "keyword", "?k")])
    counts = {
        r["d"]: r["n"]
        for r in graphq.group_count(kw, ["?d"], "?k", "n", distinct=True).collect()
    }
    assert counts == {"http://real.dataset.iri": 2, "http://real.dataset.iri/2": 3}
    first = graphq.scalar(kw, ["?d"], "?k", "first_kw")
    assert {(r["d"], r["first_kw"]) for r in first.collect()} == {
        ("http://real.dataset.iri", "data"),
        ("http://real.dataset.iri/2", "data"),
    }


def test_triples_repo_sink_batches_and_roundtrips(spark, fixture_triples, tmp_path):
    """S7: repo sink round-trips exactly and every flushed batch file
    respects the statement bound (BufferedOutput's 50k-flush contract,
    here exercised with a tiny bound to force multiple batches)."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "repo")
    model.write_triples_repo(fixture_triples, out, batch_statements=20)
    back = model.read_triples_repo(spark, out)
    key = lambda r: (r["s"], r["p"], r["o_value"], r["o_type"], r["o_lang"], r["o_datatype"])
    assert sorted(map(key, back.collect())) == sorted(map(key, fixture_triples.collect()))
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in glob.glob(out + "/*.parquet")]
    assert sizes and max(sizes) <= 20


def test_path_plus_depth_and_cycles(spark):
    """Transitive closure (p+) on a constructed graph: a 4-node chain
    (depth 3 — deeper than any driver-table hierarchy) and a 2-cycle;
    the semi-naive loop must reach every depth and terminate on the
    cycle instead of re-deriving pairs forever."""
    def trip(s, o):
        return (s, "urn:next", o, "iri", None, None)

    tr = spark.createDataFrame(
        [trip("a", "b"), trip("b", "c"), trip("c", "d"),
         trip("x", "y"), trip("y", "x")],
        model.TRIPLES_SCHEMA,
    )
    got = {(r["s2"], r["o2"]) for r in
           graphq.path_plus(tr, ["urn:next"], "?s2", "?o2").collect()}
    chain = {("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d")}
    cycle = {("x", "y"), ("y", "x"), ("x", "x"), ("y", "y")}
    assert got == chain | cycle


def _tiny_graph(spark, rows):
    return spark.createDataFrame(rows, model.TRIPLES_SCHEMA)


def test_repeated_variable_in_one_pattern(spark):
    """(?x, p, ?x) must bind consistently — only s == o rows match."""
    g = _tiny_graph(
        spark,
        [
            ("urn:a", "urn:p", "urn:a", "iri", None, None),  # s == o
            ("urn:a", "urn:p", "urn:b", "iri", None, None),  # s != o
        ],
    )
    sols = graphq.bgp(g, [("?x", "urn:p", "?x")])
    assert [r["x"] for r in sols.collect()] == ["urn:a"]

    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": "urn:a", "p": "urn:p", "o_value": "urn:a",
             "o_type": "iri", "o_lang": None, "o_datatype": None},
            {"s": "urn:a", "p": "urn:p", "o_value": "urn:b",
             "o_type": "iri", "o_lang": None, "o_datatype": None},
        ]
    )
    lsols = gl.bgp(lg, [("?x", "urn:p", "?x")])
    assert [r["x"] for r in lsols.rows] == ["urn:a"]


def test_disjoint_variable_optional_and_not_exists(spark):
    """OPTIONAL/NOT EXISTS over a block sharing no variable with the
    base is legal SPARQL: existence decides, not a crash."""
    g = _tiny_graph(
        spark,
        [
            ("urn:a", "urn:p", "lit", "literal", None, None),
            ("urn:z", "urn:flag", "on", "literal", None, None),
        ],
    )
    base = graphq.bgp(g, [("?s", "urn:p", "?v")])
    # the flag pattern matches → NOT EXISTS removes every base row
    assert graphq.not_exists(base, g, [("urn:z", "urn:flag", "on")]).count() == 0
    # a non-matching constant pattern → base rows survive
    assert graphq.not_exists(base, g, [("urn:z", "urn:flag", "off")]).count() == 1
    # OPTIONAL with a disjoint variable extends rather than crashes
    opt = graphq.optional(base, g, [("?other", "urn:flag", "on")])
    rows = opt.collect()
    assert len(rows) == 1 and rows[0]["other"] == "urn:z"


def test_lang_filter_matches_region_subtags(spark):
    g = _tiny_graph(
        spark,
        [
            ("urn:a", "urn:t", "color", "literal", "en-US", None),
            ("urn:b", "urn:t", "colour", "literal", "en", None),
            ("urn:c", "urn:t", "couleur", "literal", "fr", None),
        ],
    )
    sols = graphq.bgp(g, [("?s", "urn:t", "?t")])
    got = {r["s"] for r in graphq.lang_filter(sols, "?t", "en").collect()}
    assert got == {"urn:a", "urn:b"}


def test_repeated_variable_sameterm_literal_collision(spark):
    """(?x, p, ?x) where the object is a LITERAL whose lexical form
    equals the subject IRI must NOT match — SPARQL sameTerm compares
    the term, not the lexical form (both engines)."""
    rows = [
        ("urn:a", "urn:p", "urn:a", "literal", None, None),  # collision
        ("urn:b", "urn:p", "urn:b", "iri", None, None),      # true sameTerm
    ]
    g = _tiny_graph(spark, rows)
    sols = graphq.bgp(g, [("?x", "urn:p", "?x")])
    assert [r["x"] for r in sols.collect()] == ["urn:b"]

    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": s, "p": p, "o_value": o, "o_type": t, "o_lang": None,
             "o_datatype": None}
            for s, p, o, t, _, _ in rows
        ]
    )
    assert [r["x"] for r in gl.bgp(lg, [("?x", "urn:p", "?x")]).rows] == ["urn:b"]


def test_strict_terms_join_option(spark):
    """Cross-pattern joins compare lexical forms by default (documented
    contract, fine for the reference's graphs); strict_terms=True
    upgrades to sameTerm — an IRI-position binding never matches a
    literal with a colliding lexical form."""
    rows = [
        ("urn:s1", "urn:p1", "urn:x", "literal", None, None),  # literal "urn:x"
        ("urn:s2", "urn:p1", "urn:y", "iri", None, None),
        ("urn:x", "urn:p2", "v1", "literal", None, None),
        ("urn:y", "urn:p2", "v2", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    pats = [("?s", "urn:p1", "?d"), ("?d", "urn:p2", "?v")]
    lex = {(r["s"], r["d"], r["v"]) for r in graphq.bgp(g, pats).collect()}
    assert lex == {("urn:s1", "urn:x", "v1"), ("urn:s2", "urn:y", "v2")}
    strict = {
        (r["s"], r["d"], r["v"])
        for r in graphq.bgp(g, pats, strict_terms=True).collect()
    }
    assert strict == {("urn:s2", "urn:y", "v2")}
    # salted + strict compose
    salted = {
        (r["s"], r["d"], r["v"])
        for r in graphq.bgp(g, pats, n_salts=4, strict_terms=True).collect()
    }
    assert salted == strict


def test_strict_terms_compare_lang_and_datatype(spark):
    """sameTerm also requires identical language tag and datatype for
    literal-literal joins: "2020"@en vs "2020"^^xsd:gYear share a
    lexical form but are different terms; plain literals with null
    lang/datatype on both sides must still MATCH (null meta compares
    equal under sameTerm, unlike SQL null join keys)."""
    gy = "http://www.w3.org/2001/XMLSchema#gYear"
    rows = [
        ("urn:a", "urn:q1", "2020", "literal", "en", None),
        ("urn:b", "urn:q2", "2020", "literal", None, gy),
        ("urn:e", "urn:q2", "2020", "literal", "fr", None),
        ("urn:c", "urn:q1", "ok", "literal", None, None),
        ("urn:d", "urn:q2", "ok", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    pats = [("?x", "urn:q1", "?v"), ("?y", "urn:q2", "?v")]
    lex = {(r["x"], r["y"], r["v"]) for r in graphq.bgp(g, pats).collect()}
    assert lex == {
        ("urn:a", "urn:b", "2020"),
        ("urn:a", "urn:e", "2020"),
        ("urn:c", "urn:d", "ok"),
    }
    strict = {
        (r["x"], r["y"], r["v"])
        for r in graphq.bgp(g, pats, strict_terms=True).collect()
    }
    assert strict == {("urn:c", "urn:d", "ok")}

    # the driver-local twin mirrors both modes
    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": s, "p": p, "o_value": o, "o_type": t, "o_lang": la,
             "o_datatype": dt}
            for s, p, o, t, la, dt in rows
        ]
    )
    assert {(r["x"], r["y"], r["v"]) for r in gl.bgp(lg, pats).rows} == lex
    assert {
        (r["x"], r["y"], r["v"])
        for r in gl.bgp(lg, pats, strict_terms=True).rows
    } == strict


def test_union_pads_and_keeps_multiset(spark):
    """SPARQL UNION: branch-exclusive variables are NULL in the other
    branch's rows, duplicates are kept (multiset), and the local twin
    agrees with the Spark layer."""
    rows = [
        ("urn:a", "urn:p", "1", "literal", None, None),
        ("urn:a", "urn:p", "1", "literal", None, None),  # dup solution
        ("urn:b", "urn:q", "2", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    left = graphq.bgp(g, [("?x", "urn:p", "?v")])
    right = graphq.bgp(g, [("?x", "urn:q", "?w")])
    got = [
        (r["x"], r["v"], r["w"])
        for r in graphq.union(left, right).orderBy("x", "v").collect()
    ]
    assert got == [
        ("urn:a", "1", None),
        ("urn:a", "1", None),
        ("urn:b", None, "2"),
    ]

    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": s, "p": p, "o_value": o, "o_type": t, "o_lang": la,
             "o_datatype": dt}
            for s, p, o, t, la, dt in rows
        ]
    )
    lsols = gl.union(
        gl.bgp(lg, [("?x", "urn:p", "?v")]), gl.bgp(lg, [("?x", "urn:q", "?w")])
    )
    lgot = sorted((r["x"], r.get("v"), r.get("w")) for r in lsols.rows)
    assert lgot == sorted(got, key=lambda t: (t[0], t[1] or "", t[2] or ""))


def test_unbound_compatible_join(spark):
    """SPARQL 1.1 Join(μ1, μ2): a shared variable unbound on one side
    is COMPATIBLE and takes the bound side's value. Default joins keep
    SQL NULL semantics (branch-exclusive variables drop the unbound
    branch); unbound_compat=True opts into the algebra rule. Both
    layers, metadata follows the bound side."""
    rows = [
        ("urn:a", "urn:p", "urn:v1", "iri", None, None),   # branch 1 binds ?v
        ("urn:b", "urn:q", "w1", "literal", None, None),   # branch 2 binds ?w only
        ("urn:v1", "urn:r", "m1", "literal", "en", None),
        ("urn:v2", "urn:r", "m2", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    u = graphq.union(
        graphq.bgp(g, [("?x", "urn:p", "?v")]),
        graphq.bgp(g, [("?x", "urn:q", "?w")]),
    )
    block = graphq.bgp(g, [("?v", "urn:r", "?m")])
    # default: the ?w branch (v unbound) is discarded — documented SQL
    # NULL semantics
    strict_sql = graphq.join_solutions(u, block)
    assert sorted((r["x"], r["v"], r["m"]) for r in strict_sql.collect()) == [
        ("urn:a", "urn:v1", "m1"),
    ]
    # compat: the unbound branch is compatible with EVERY ?v binding
    compat = graphq.join_solutions(u, block, unbound_compat=True)
    got = sorted((r["x"], r["v"], r.get("w"), r["m"]) for r in
                 (row.asDict() for row in compat.collect()))
    assert got == [
        ("urn:a", "urn:v1", None, "m1"),
        ("urn:b", "urn:v1", "w1", "m1"),
        ("urn:b", "urn:v2", "w1", "m2"),
    ]
    # metadata follows the bound side: ?v from the block is an IRI
    # subject (no meta) on the right, object-typed on the union's left
    meta = {(r["v"], r["v__type"]) for r in compat.collect()}
    assert meta == {("urn:v1", "iri"), ("urn:v2", "iri")}

    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": s, "p": p, "o_value": o, "o_type": t, "o_lang": la,
             "o_datatype": dt}
            for s, p, o, t, la, dt in rows
        ]
    )
    lu = gl.union(
        gl.bgp(lg, [("?x", "urn:p", "?v")]), gl.bgp(lg, [("?x", "urn:q", "?w")])
    )
    lblock = gl.bgp(lg, [("?v", "urn:r", "?m")])
    lcompat = gl.join_solutions(lu, lblock, unbound_compat=True)
    lgot = sorted((r["x"], r["v"], r.get("w"), r["m"]) for r in lcompat.rows)
    assert lgot == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unbound_compat"):
        graphq.join_solutions(u, block, how="left", unbound_compat=True)


def test_path_mixed_alternation_meta_alignment(spark):
    """A mixed forward/^inverse alternation step binds the hop variable
    in OBJECT position on the forward branch (meta companions present)
    and SUBJECT position on the inverse branch (none). The branch union
    must materialize the inverse branch's term as ('iri', null, null)
    — NULL-padded meta would make a downstream strict_terms join read
    those rows as ('','','') and silently drop them (ADVICE r5)."""
    rows = [
        ("urn:a", "urn:p", "urn:m1", "iri", None, None),   # forward hop a -p-> m1
        ("urn:m2", "urn:q", "urn:a", "iri", None, None),   # inverse hop a -^q-> m2
        ("urn:m1", "urn:r", "k1", "literal", None, None),
        ("urn:m2", "urn:r", "k2", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    sols = graphq.path(g, "?x", [["urn:p", "^urn:q"]], "?m")
    # both branches present, and the inverse branch's meta is the IRI term
    meta = {(r["m"], r["m__type"]) for r in sols.collect()}
    assert meta == {("urn:m1", "iri"), ("urn:m2", "iri")}
    joined = graphq.join_solutions(
        sols, graphq.bgp(g, [("?m", "urn:r", "?k")]), strict_terms=True
    )
    assert sorted((r["m"], r["k"]) for r in joined.collect()) == [
        ("urn:m1", "k1"),
        ("urn:m2", "k2"),
    ]


def test_union_meta_alignment_survives_strict_join(spark):
    """A variable bound in SUBJECT position in one branch and OBJECT
    position in the other must carry ('iri', null, null) meta after
    the union — NULL-padded meta would make a downstream strict_terms
    join read the subject-position rows' term as ('','','') and drop
    valid sameTerm matches. Both layers."""
    rows = [
        ("urn:d1", "urn:p", "x", "literal", None, None),   # binds ?d subject-pos
        ("urn:s", "urn:q", "urn:d2", "iri", None, None),   # binds ?d object-pos
        ("urn:d1", "urn:r", "m1", "literal", None, None),
        ("urn:d2", "urn:r", "m2", "literal", None, None),
    ]
    g = _tiny_graph(spark, rows)
    u = graphq.union(
        graphq.bgp(g, [("?d", "urn:p", "?v")]),
        graphq.bgp(g, [("?s", "urn:q", "?d")]),
    )
    joined = graphq.join_solutions(
        u, graphq.bgp(g, [("?d", "urn:r", "?m")]), strict_terms=True
    )
    got = sorted((r["d"], r["m"]) for r in joined.collect())
    assert got == [("urn:d1", "m1"), ("urn:d2", "m2")]

    from lp_etl_plugins_spark import graphq_local as gl

    lg = gl.LocalGraph(
        [
            {"s": s, "p": p, "o_value": o, "o_type": t, "o_lang": la,
             "o_datatype": dt}
            for s, p, o, t, la, dt in rows
        ]
    )
    lu = gl.union(
        gl.bgp(lg, [("?d", "urn:p", "?v")]), gl.bgp(lg, [("?s", "urn:q", "?d")])
    )
    ljoined = gl.join_solutions(
        lu, gl.bgp(lg, [("?d", "urn:r", "?m")]), strict_terms=True
    )
    assert sorted((r["d"], r["m"]) for r in ljoined.rows) == got


def test_minus_vs_not_exists_semantics(spark):
    """The three SPARQL 1.1 §8.3 splits between MINUS and FILTER NOT
    EXISTS: (1) a disjoint-domain right pattern removes nothing under
    MINUS but everything under NOT EXISTS; (2) a shared bound variable
    removes compatible solutions under both; (3) a solution whose
    shared variable is UNBOUND (NULL from a UNION branch) survives
    MINUS — no common bound variable means no compatibility."""
    g = _tiny_graph(
        spark,
        [
            ("urn:a", "urn:type", "urn:Doc", "iri", None, None),
            ("urn:b", "urn:type", "urn:Doc", "iri", None, None),
            ("urn:a", "urn:flag", "1", "literal", None, None),
            ("urn:n", "urn:type", "urn:Other", "iri", None, None),
        ],
    )
    base = graphq.bgp(g, [("?d", "urn:type", "urn:Doc")])
    # (1) disjoint: MINUS keeps both docs, NOT EXISTS keeps none
    assert graphq.minus(base, g, [("?x", "urn:type", "urn:Other")]).count() == 2
    assert (
        graphq.not_exists(base, g, [("?x", "urn:type", "urn:Other")]).count() == 0
    )
    # (2) shared var: flagged doc removed under both
    m = graphq.minus(base, g, [("?d", "urn:flag", "?f")])
    assert sorted(r["d"] for r in m.collect()) == ["urn:b"]
    # (3) unbound shared var survives MINUS: a union branch that never
    # binds ?d is incompatible with every right solution
    from pyspark.sql import functions as F

    other = graphq.bgp(g, [("?x", "urn:type", "urn:Other")])
    u = graphq.union(base, other)  # ?d unbound on the other branch
    m2 = graphq.minus(u, g, [("?d", "urn:flag", "?f")])
    got = sorted((r["d"] or "-") for r in m2.collect())
    assert got == ["-", "urn:b"]  # unbound row survives, urn:a removed
