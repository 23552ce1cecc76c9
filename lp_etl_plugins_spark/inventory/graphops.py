"""Graph query layer inventory (SURVEY §2.3/§7.2) — g* entries.

Each entry exercises one graphq construct over a *real triples
DataFrame* built by unpivoting the driver parquet tables through
:func:`lp_etl_plugins_spark.model.table_to_triples` (branched form —
predicate filters prune unused branches out of the physical plan).
The DuckDB oracle rebuilds the identical triples relation with
a UNION-ALL CTE and re-expresses the SPARQL construct as plain SQL —
so the graph layer's join semantics (not just its shape) are
hash-checked.

Reference parity: the constructs mirror the SPARQL the reference runs —
BGP joins (FdpMeasure.java:34-48), OPTIONAL (FdpMeasure.java:49-56),
FILTER NOT EXISTS (MultiAttributeDimension.java:56), VALUES with UNDEF
(MultiAttributeDimension.java:38-43), property paths incl. inverse
(DcatAp11ToCkanBatch.java:259,372), LANGMATCHES filters
(DcatAp11ToCkanBatch.java:254), grouped counts
(MultiAttributeDimension.java:93-99) and scalar lookups
(DcatAp11ToCkanBatch.java:627-641).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import graphq
from ..model import TripleMapping, table_to_triples
from ..tables import load_table

_T = "urn:type"
_NAME = "urn:name"
_REGION = "urn:region"
_NATION = "urn:nation"
_SEG = "urn:segment"
_PREMIUM = "urn:premium"
_TITLE = "urn:title"
_SOURCE = "urn:source"


def _graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared test graph: region/nation/supplier/customer/documents
    unpivoted to triples — BRANCHED form, so each g-query's predicate
    filters constant-fold away the branches (tables, columns) it never
    touches; only the needed parquet scans survive in the physical
    plan."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    documents = load_table(spark, sf_dir, "documents")

    t_region = table_to_triples(
        region,
        F.concat(F.lit("urn:region/"), F.col("r_regionkey")),
        [
            TripleMapping(_T, F.lit("urn:Region"), "iri"),
            TripleMapping(_NAME, "r_name"),
        ],
        branched=True,
    )
    t_nation = table_to_triples(
        nation,
        F.concat(F.lit("urn:nation/"), F.col("n_nationkey")),
        [
            TripleMapping(_T, F.lit("urn:Nation"), "iri"),
            TripleMapping(_NAME, "n_name"),
            TripleMapping(_REGION, F.concat(F.lit("urn:region/"), F.col("n_regionkey")), "iri"),
        ],
        branched=True,
    )
    t_supplier = table_to_triples(
        supplier,
        F.concat(F.lit("urn:supplier/"), F.col("s_suppkey")),
        [
            TripleMapping(_T, F.lit("urn:Supplier"), "iri"),
            TripleMapping(_NAME, "s_name"),
            TripleMapping(_NATION, F.concat(F.lit("urn:nation/"), F.col("s_nationkey")), "iri"),
        ],
        branched=True,
    )
    t_customer = table_to_triples(
        customer,
        F.concat(F.lit("urn:customer/"), F.col("c_custkey")),
        [
            TripleMapping(_T, F.lit("urn:Customer"), "iri"),
            TripleMapping(_NAME, "c_name"),
            TripleMapping(_NATION, F.concat(F.lit("urn:nation/"), F.col("c_nationkey")), "iri"),
            TripleMapping(_SEG, "c_mktsegment"),
            # sparse property: only high-balance customers carry it
            # (exercises OPTIONAL's null leg)
            TripleMapping(_PREMIUM, F.when(F.col("c_acctbal") > 5000.0, F.lit("true"))),
        ],
        branched=True,
    )
    t_documents = table_to_triples(
        documents,
        F.concat(F.lit("urn:doc/"), F.col("doc_id")),
        [
            TripleMapping(_TITLE, F.substring("text", 1, 40), lang="lang"),
            TripleMapping(_SOURCE, "source"),
        ],
        branched=True,
    )
    out = t_region
    for t in (t_nation, t_supplier, t_customer, t_documents):
        out = out.unionByName(t)
    return out


# The DuckDB twin of _graph() — must produce the identical relation.
_CTE = """
WITH triples AS (
  SELECT 'urn:region/' || r_regionkey AS s, 'urn:type' AS p, 'urn:Region' AS o_value,
         'iri' AS o_type, NULL AS o_lang FROM region
  UNION ALL
  SELECT 'urn:region/' || r_regionkey, 'urn:name', r_name, 'literal', NULL FROM region
  UNION ALL
  SELECT 'urn:nation/' || n_nationkey, 'urn:type', 'urn:Nation', 'iri', NULL FROM nation
  UNION ALL
  SELECT 'urn:nation/' || n_nationkey, 'urn:name', n_name, 'literal', NULL FROM nation
  UNION ALL
  SELECT 'urn:nation/' || n_nationkey, 'urn:region', 'urn:region/' || n_regionkey, 'iri', NULL FROM nation
  UNION ALL
  SELECT 'urn:supplier/' || s_suppkey, 'urn:type', 'urn:Supplier', 'iri', NULL FROM supplier
  UNION ALL
  SELECT 'urn:supplier/' || s_suppkey, 'urn:name', s_name, 'literal', NULL FROM supplier
  UNION ALL
  SELECT 'urn:supplier/' || s_suppkey, 'urn:nation', 'urn:nation/' || s_nationkey, 'iri', NULL FROM supplier
  UNION ALL
  SELECT 'urn:customer/' || c_custkey, 'urn:type', 'urn:Customer', 'iri', NULL FROM customer
  UNION ALL
  SELECT 'urn:customer/' || c_custkey, 'urn:name', c_name, 'literal', NULL FROM customer
  UNION ALL
  SELECT 'urn:customer/' || c_custkey, 'urn:nation', 'urn:nation/' || c_nationkey, 'iri', NULL FROM customer
  UNION ALL
  SELECT 'urn:customer/' || c_custkey, 'urn:segment', c_mktsegment, 'literal', NULL FROM customer
  UNION ALL
  SELECT 'urn:customer/' || c_custkey, 'urn:premium', 'true', 'literal', NULL FROM customer
  WHERE c_acctbal > 5000.0
  UNION ALL
  SELECT 'urn:doc/' || doc_id, 'urn:title', substring(text, 1, 40), 'literal', lang FROM documents
  UNION ALL
  SELECT 'urn:doc/' || doc_id, 'urn:source', source, 'literal', NULL FROM documents
)
"""


def g1_bgp_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 as a real graph query: supplier→nation→region BGP chain,
    suppliers counted per region name."""
    tr = _graph(spark, sf_dir)
    sols = graphq.bgp(
        tr,
        [
            ("?s", _T, "urn:Supplier"),
            ("?s", _NATION, "?n"),
            ("?n", _REGION, "?r"),
            ("?r", _NAME, "?rname"),
        ],
    )
    return graphq.group_count(sols, ["?rname"], "?s", "n_suppliers", distinct=True)


G1_SQL = _CTE + """
SELECT rn.o_value AS rname, count(DISTINCT st.s) AS n_suppliers
FROM triples st
JOIN triples sn ON sn.s = st.s AND sn.p = 'urn:nation'
JOIN triples nr ON nr.s = sn.o_value AND nr.p = 'urn:region'
JOIN triples rn ON rn.s = nr.o_value AND rn.p = 'urn:name'
WHERE st.p = 'urn:type' AND st.o_value = 'urn:Supplier'
GROUP BY rn.o_value
"""


def g2_optional_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/OPTIONAL: customers per segment with the count of those
    carrying the sparse urn:premium property (null leg preserved)."""
    tr = _graph(spark, sf_dir)
    base = graphq.bgp(tr, [("?c", _T, "urn:Customer"), ("?c", _SEG, "?seg")])
    sols = graphq.optional(base, tr, [("?c", _PREMIUM, "?prem")])
    return sols.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count("prem").alias("n_premium"),
    )


G2_SQL = _CTE + """
SELECT cs.o_value AS seg, count(*) AS n_customers, count(pr.o_value) AS n_premium
FROM triples ct
JOIN triples cs ON cs.s = ct.s AND cs.p = 'urn:segment'
LEFT JOIN triples pr ON pr.s = ct.s AND pr.p = 'urn:premium'
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
GROUP BY cs.o_value
"""


def g3_not_exists_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/FILTER NOT EXISTS: customers that do NOT carry the sparse
    urn:premium property, counted per segment (non-empty at every sf,
    unlike a nations-without-suppliers anti join)."""
    tr = _graph(spark, sf_dir)
    base = graphq.bgp(tr, [("?c", _T, "urn:Customer"), ("?c", _SEG, "?seg")])
    sols = graphq.not_exists(base, tr, [("?c", _PREMIUM, "?p")])
    return sols.groupBy("seg").agg(F.count(F.lit(1)).alias("n_regular"))


G3_SQL = _CTE + """
SELECT cs.o_value AS seg, count(*) AS n_regular
FROM triples ct
JOIN triples cs ON cs.s = ct.s AND cs.p = 'urn:segment'
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
  AND NOT EXISTS (SELECT 1 FROM triples x WHERE x.p = 'urn:premium' AND x.s = ct.s)
GROUP BY cs.o_value
"""


def g4_values_undef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/VALUES with UNDEF: segment→tier inline table where the UNDEF
    row matches every binding (SPARQL multiset join semantics)."""
    tr = _graph(spark, sf_dir)
    base = graphq.bgp(tr, [("?c", _T, "urn:Customer"), ("?c", _SEG, "?seg")])
    sols = graphq.values(
        base,
        spark,
        ["?seg", "?tier"],
        [
            ("AUTOMOBILE", "consumer"),
            ("MACHINERY", "industrial"),
            (None, "any"),
        ],
    )
    return sols.groupBy("tier").agg(F.count(F.lit(1)).alias("n_rows"))


G4_SQL = _CTE + """
SELECT v.tier, count(*) AS n_rows
FROM triples ct
JOIN triples cs ON cs.s = ct.s AND cs.p = 'urn:segment'
JOIN (VALUES ('AUTOMOBILE', 'consumer'), ('MACHINERY', 'industrial'), (NULL, 'any'))
     AS v(seg, tier)
  ON v.seg IS NULL OR v.seg = cs.o_value
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
GROUP BY v.tier
"""


def g5_path_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 property path with an inverse step
    (?c urn:nation/^urn:nation ?peer): customer–supplier same-nation
    pairs, counted per customer segment."""
    tr = _graph(spark, sf_dir)
    # supplier restriction pushed INTO the path's final hop: customers
    # also point at nations, so without the pushdown the ^nation hop
    # materializes every same-nation pair (~16x the answer) before
    # filtering — end_filter keeps the hop at supplier cardinality
    pairs = graphq.path(
        tr, "?c", [_NATION, "^" + _NATION], "?peer",
        end_filter=(_T, "urn:Supplier"),
    )
    segs = graphq.bgp(tr, [("?c", _T, "urn:Customer"), ("?c", _SEG, "?seg")])
    sols = graphq.join_solutions(segs, pairs)
    return sols.groupBy("seg").agg(F.count(F.lit(1)).alias("n_pairs"))


G5_SQL = _CTE + """
SELECT cs.o_value AS seg, count(*) AS n_pairs
FROM triples ct
JOIN triples cs ON cs.s = ct.s AND cs.p = 'urn:segment'
JOIN triples cn ON cn.s = ct.s AND cn.p = 'urn:nation'
JOIN triples sn ON sn.o_value = cn.o_value AND sn.p = 'urn:nation'
JOIN triples st ON st.s = sn.s AND st.p = 'urn:type' AND st.o_value = 'urn:Supplier'
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
GROUP BY cs.o_value
"""


def g6_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 LANGMATCHES: documents per source whose title is English."""
    tr = _graph(spark, sf_dir)
    sols = graphq.bgp(tr, [("?d", _TITLE, "?t"), ("?d", _SOURCE, "?src")])
    en = graphq.lang_filter(sols, "?t", "en")
    return en.groupBy("src").agg(F.count(F.lit(1)).alias("n_docs"))


G6_SQL = _CTE + """
SELECT sr.o_value AS src, count(*) AS n_docs
FROM triples tt
JOIN triples sr ON sr.s = tt.s AND sr.p = 'urn:source'
WHERE tt.p = 'urn:title'
  AND (lower(tt.o_lang) = 'en' OR lower(tt.o_lang) LIKE 'en-%')
GROUP BY sr.o_value
"""


def g7_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 on the graph: distinct suppliers per nation IRI."""
    tr = _graph(spark, sf_dir)
    sols = graphq.join_solutions(
        graphq.bgp(tr, [("?s", _T, "urn:Supplier")]),
        graphq.bgp(tr, [("?s", _NATION, "?n")]),
    )
    return graphq.group_count(sols, ["?n"], "?s", "n_suppliers", distinct=True)


G7_SQL = _CTE + """
SELECT sn.o_value AS n, count(DISTINCT sn.s) AS n_suppliers
FROM triples st
JOIN triples sn ON sn.s = st.s AND sn.p = 'urn:nation'
WHERE st.p = 'urn:type' AND st.o_value = 'urn:Supplier'
GROUP BY sn.o_value
"""


def g8_scalar_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 scalar per group with the engine's deterministic min-by-value
    contract: first customer name per nation IRI."""
    tr = _graph(spark, sf_dir)
    sols = graphq.bgp(
        tr,
        [("?c", _T, "urn:Customer"), ("?c", _NATION, "?n"), ("?c", _NAME, "?cname")],
    )
    return graphq.scalar(sols, ["?n"], "?cname", "first_name")


G8_SQL = _CTE + """
SELECT cn.o_value AS n, min(nm.o_value) AS first_name
FROM triples ct
JOIN triples cn ON cn.s = ct.s AND cn.p = 'urn:nation'
JOIN triples nm ON nm.s = ct.s AND nm.p = 'urn:name'
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
GROUP BY cn.o_value
"""


def g9_path_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-depth property path ``(urn:nation|urn:region)+``
    (graphq.path_plus): the full located-in reachability set —
    supplier/customer→nation, nation→region, and the transitive
    supplier/customer→region pairs. Semi-naive iteration with
    checkpointed deltas; the recursive-CTE oracle recomputes the
    identical closure."""
    tr = _graph(spark, sf_dir)
    return graphq.path_plus(tr, [_NATION, _REGION], "?start", "?reached")


G9_SQL = _CTE.replace("WITH triples", "WITH RECURSIVE triples", 1) + """
, edges AS (
  SELECT s, o_value AS o FROM triples WHERE p IN ('urn:nation', 'urn:region')
),
reach(s, o) AS (
  SELECT DISTINCT s, o FROM edges
  UNION
  SELECT r.s, e.o FROM reach r JOIN edges e ON e.s = r.o
)
SELECT s AS start, o AS reached FROM reach
"""


def g10_path_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-or-more path ``(urn:nation|urn:region)*``
    (graphq.path_star): g9's transitive closure plus the identity
    pair for every node in the located-in edge domain — SPARQL ``*``
    semantics over the predicates' node universe."""
    tr = _graph(spark, sf_dir)
    return graphq.path_star(tr, [_NATION, _REGION], "?start", "?reached")


G10_SQL = _CTE.replace("WITH triples", "WITH RECURSIVE triples", 1) + """
, edges AS (
  SELECT s, o_value AS o FROM triples WHERE p IN ('urn:nation', 'urn:region')
),
nodes AS (SELECT s AS n FROM edges UNION SELECT o FROM edges),
reach(s, o) AS (
  SELECT DISTINCT s, o FROM edges
  UNION
  SELECT r.s, e.o FROM reach r JOIN edges e ON e.s = r.o
)
SELECT s AS start, o AS reached FROM reach
UNION
SELECT n AS start, n AS reached FROM nodes
"""


def g11_path_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL alternation inside a sequence path:
    ``?e (urn:nation|urn:region)/urn:name ?loc`` — each entity's
    located-in name, whichever edge kind it has (suppliers/customers
    hop via urn:nation, nations via urn:region). The alternation hop
    is a union of the two pattern branches; the name hop joins once
    over the union (graphq.path with a list step)."""
    tr = _graph(spark, sf_dir)
    sols = graphq.path(tr, "?e", [(_NATION, _REGION), _NAME], "?loc")
    return sols.select("e", "loc")


G11_SQL = _CTE + """
SELECT hop.s AS e, nm.o_value AS loc
FROM triples hop
JOIN triples nm
  ON nm.s = hop.o_value AND nm.p = 'urn:name'
WHERE hop.p IN ('urn:nation', 'urn:region')
"""


def g12_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION of two differently-shaped branches
    (:func:`graphq.union`): premium customers (binding ?flag) UNION
    suppliers with their nation edge (binding ?nat) — each branch's
    exclusive variable is NULL in the other's rows, the multiset is
    NOT deduped, and the aggregate proves both the padding and the
    row arithmetic. Plan: two branch scans concatenated — a union is
    shuffle-free; only the final 1-row aggregate exchanges."""
    tr = _graph(spark, sf_dir)
    prem = graphq.bgp(tr, [("?e", _PREMIUM, "?flag"), ("?e", _NAME, "?name")])
    sup = graphq.bgp(
        tr,
        [("?e", _T, "urn:Supplier"), ("?e", _NAME, "?name"), ("?e", _NATION, "?nat")],
    )
    sols = graphq.union(prem, sup)
    return sols.agg(
        F.count(F.lit(1)).alias("n_solutions"),
        F.count("flag").alias("n_flagged"),
        F.count("nat").alias("n_with_nation"),
        F.min("name").alias("first_name"),
    )


G12_SQL = _CTE + """
, u AS (
  SELECT pf.s AS e, pf.o_value AS flag, nm.o_value AS name, NULL AS nat
  FROM triples pf
  JOIN triples nm ON nm.s = pf.s AND nm.p = 'urn:name'
  WHERE pf.p = 'urn:premium'
  UNION ALL
  SELECT t.s, NULL, nm.o_value, nt.o_value
  FROM triples t
  JOIN triples nm ON nm.s = t.s AND nm.p = 'urn:name'
  JOIN triples nt ON nt.s = t.s AND nt.p = 'urn:nation'
  WHERE t.p = 'urn:type' AND t.o_value = 'urn:Supplier'
)
SELECT count(*)::BIGINT AS n_solutions,
       count(flag)::BIGINT AS n_flagged,
       count(nat)::BIGINT AS n_with_nation,
       min(name) AS first_name
FROM u
"""


def g13_union_compat_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 unbound-compatible join over a mixed-binding UNION
    (:func:`graphq.join_solutions` ``unbound_compat=True``): suppliers
    bind ?nat (their nation edge), premium customers leave ?nat
    unbound; joining the union against the nation block {?nat a
    urn:Nation; urn:name ?nname} under the algebra rule keeps BOTH
    branches — supplier rows join their own nation, unbound-?nat rows
    are compatible with every nation binding (25 rows each) and take
    it from the block. The default SQL-NULL join would silently drop
    the whole premium branch (g12 documents that contract). The compat
    condition is a theta join → broadcast nested loop against the
    25-row nation block — the documented metadata-scale shape.
    → (n_solutions, n_flagged, n_nations, first_nation_name)."""
    tr = _graph(spark, sf_dir)
    sup = graphq.bgp(tr, [("?e", _T, "urn:Supplier"), ("?e", _NATION, "?nat")])
    prem = graphq.bgp(tr, [("?e", _PREMIUM, "?flag")])
    u = graphq.union(sup, prem)
    blk = graphq.bgp(tr, [("?nat", _T, "urn:Nation"), ("?nat", _NAME, "?nname")])
    sols = graphq.join_solutions(u, blk, unbound_compat=True)
    return sols.agg(
        F.count(F.lit(1)).alias("n_solutions"),
        F.count("flag").alias("n_flagged"),
        F.countDistinct("nat").alias("n_nations"),
        F.min("nname").alias("first_nation_name"),
    )


G13_SQL = _CTE + """
, u AS (
  SELECT t.s AS e, nt.o_value AS nat, NULL AS flag
  FROM triples t
  JOIN triples nt ON nt.s = t.s AND nt.p = 'urn:nation'
  WHERE t.p = 'urn:type' AND t.o_value = 'urn:Supplier'
  UNION ALL
  SELECT pf.s, NULL, pf.o_value
  FROM triples pf WHERE pf.p = 'urn:premium'
),
blk AS (
  SELECT ty.s AS nat, nm.o_value AS nname
  FROM triples ty JOIN triples nm ON nm.s = ty.s AND nm.p = 'urn:name'
  WHERE ty.p = 'urn:type' AND ty.o_value = 'urn:Nation'
),
j AS (
  SELECT coalesce(u.nat, b.nat) AS nat, u.flag, b.nname
  FROM u JOIN blk b ON u.nat IS NULL OR u.nat = b.nat
)
SELECT count(*)::BIGINT AS n_solutions, count(flag)::BIGINT AS n_flagged,
       count(DISTINCT nat)::BIGINT AS n_nations, min(nname) AS first_nation_name
FROM j
"""




def g14_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 MINUS (:func:`graphq.minus`) vs FILTER NOT EXISTS —
    the algebra split in one result: the shared-variable leg (?c
    urn:premium ?p shares ?c) removes premium customers exactly like
    g3's NOT EXISTS, while the DISJOINT leg ({?x a urn:Nation} shares
    no variable with the base) removes NOTHING under MINUS's
    disjoint-domain rule — where NOT EXISTS with the same non-empty
    pattern would empty the result. The oracle encodes each leg by its
    semantics: an anti join for the shared leg, a plain count for the
    disjoint leg. -> (seg, n_minus_premium, n_minus_disjoint)."""
    tr = _graph(spark, sf_dir)
    base = graphq.bgp(tr, [("?c", _T, "urn:Customer"), ("?c", _SEG, "?seg")])
    shared_leg = graphq.minus(base, tr, [("?c", _PREMIUM, "?p")])
    disjoint_leg = graphq.minus(base, tr, [("?x", _T, "urn:Nation")])
    a = shared_leg.groupBy("seg").agg(F.count(F.lit(1)).alias("n_minus_premium"))
    b = disjoint_leg.groupBy("seg").agg(F.count(F.lit(1)).alias("n_minus_disjoint"))
    return a.join(b, "seg")


G14_SQL = _CTE + """
, base AS (
  SELECT ct.s AS c, cs.o_value AS seg
  FROM triples ct
  JOIN triples cs ON cs.s = ct.s AND cs.p = 'urn:segment'
  WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
),
shared_leg AS (
  SELECT seg, count(*) AS n_minus_premium
  FROM base
  WHERE NOT EXISTS (SELECT 1 FROM triples x WHERE x.p = 'urn:premium' AND x.s = base.c)
  GROUP BY seg
),
disjoint_leg AS (
  SELECT seg, count(*) AS n_minus_disjoint FROM base GROUP BY seg
)
SELECT seg, n_minus_premium, n_minus_disjoint
FROM shared_leg JOIN disjoint_leg USING (seg)
"""


def g15_path_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded path quantifier ``(urn:nation|urn:region){2,2}``
    (:func:`graphq.path_repeat`) — the bounded member of the
    path-closure family on the same edge machinery as g9's ``+`` and
    g10's ``*``: exactly-two-hop located-in pairs, i.e. the
    supplier/customer → region reachability WITHOUT the one-hop pairs
    the closure also returns. The oracle joins the edge list to
    itself once — a bounded quantifier needs no recursion."""
    tr = _graph(spark, sf_dir)
    return graphq.path_repeat(tr, [_NATION, _REGION], 2, 2, "?start", "?reached")


G15_SQL = _CTE + """
, edges AS (
  SELECT DISTINCT s, o_value AS o FROM triples
  WHERE p IN ('urn:nation', 'urn:region')
)
SELECT DISTINCT a.s AS start, b.o AS reached
FROM edges a JOIN edges b ON b.s = a.o
"""


def g16_negated_property_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated property set ``!(urn:type|urn:name|urn:segment|
    urn:premium)`` as a path step (SPARQL 1.1 §9.1, graphq.path's
    ``!`` step): each customer's edges OUTSIDE the listed predicates
    — which leaves exactly the located-in edge — composed with a
    forward urn:name hop, so the negation's bindings flow through a
    normal sequence path. → (c, loc) customer IRI × nation name."""
    tr = _graph(spark, sf_dir)
    cust = graphq.bgp(tr, [("?c", _T, "urn:Customer")])
    hop = graphq.path(
        tr,
        "?c",
        [f"!({_T}|{_NAME}|{_SEG}|{_PREMIUM})", _NAME],
        "?loc",
    )
    return graphq.join_solutions(cust, hop).select("c", "loc")


G16_SQL = _CTE + """
SELECT ct.s AS c, nm.o_value AS loc
FROM triples ct
JOIN triples hop
  ON hop.s = ct.s
 AND hop.p NOT IN ('urn:type', 'urn:name', 'urn:segment', 'urn:premium')
JOIN triples nm ON nm.s = hop.o_value AND nm.p = 'urn:name'
WHERE ct.p = 'urn:type' AND ct.o_value = 'urn:Customer'
"""


QUERIES = {
    "g1_bgp_star": g1_bgp_star,
    "g2_optional_premium": g2_optional_premium,
    "g3_not_exists_premium": g3_not_exists_premium,
    "g4_values_undef": g4_values_undef,
    "g5_path_inverse": g5_path_inverse,
    "g6_lang_filter": g6_lang_filter,
    "g7_group_count": g7_group_count,
    "g8_scalar_min": g8_scalar_min,
    "g9_path_closure": g9_path_closure,
    "g10_path_star": g10_path_star,
    "g11_path_alt": g11_path_alt,
    "g12_union": g12_union,
    "g13_union_compat_join": g13_union_compat_join,
    "g14_minus": g14_minus,
    "g15_path_repeat": g15_path_repeat,
    "g16_negated_property_set": g16_negated_property_set,
}

ORACLES = {
    "g1_bgp_star": G1_SQL,
    "g2_optional_premium": G2_SQL,
    "g3_not_exists_premium": G3_SQL,
    "g4_values_undef": G4_SQL,
    "g5_path_inverse": G5_SQL,
    "g6_lang_filter": G6_SQL,
    "g7_group_count": G7_SQL,
    "g8_scalar_min": G8_SQL,
    "g9_path_closure": G9_SQL,
    "g10_path_star": G10_SQL,
    "g11_path_alt": G11_SQL,
    "g12_union": G12_SQL,
    "g13_union_compat_join": G13_SQL,
    "g14_minus": G14_SQL,
    "g15_path_repeat": G15_SQL,
    "g16_negated_property_set": G16_SQL,
}
