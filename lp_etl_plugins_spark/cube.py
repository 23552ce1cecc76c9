"""Fiscal-Data-Package descriptor → RDF Data Cube compiler (``fdp_to_cube``).

Re-expresses the reference's flagship transformer ``t-fdpToRdf``
(FdpToRdf.java:266-323) Spark-first:

1. **Spec extraction** (driver-local; metadata graphs are KBs, same
   locality decision as the reference's in-memory RDF4J repo): the 7
   dimension-kind queries, the measure query, per-dimension attribute +
   label queries (FdpToRdf.java:134-263) run through
   :mod:`lp_etl_plugins_spark.graphq_local` — the pure-Python twin of
   the ``graphq`` layer — over the once-collected descriptor, producing
   :class:`CubeSpec` dataclasses without per-query Spark jobs.
2. **Compilation**: the spec compiles into ONE ``select`` producing,
   per CSV row × measure, an array of conditional (s,p,o) structs —
   then a single ``explode`` yields the triples DataFrame. All
   per-row work the reference does in interpreted Java loops
   (Mapper.java:97-111) runs inside whole-stage codegen; the only
   shuffles are the tiny partition-offset exchange for row numbering
   and the optional ``distinct()`` on the codelist subplan.
3. **Sinks**: the triples DF unions with ``.nt`` passthrough files
   (FdpToRdf.java:306-311) and serializes via
   :func:`lp_etl_plugins_spark.model.write_ntriples` (S6).

Documented deviations from the reference:

- observation numbering is 1-based in file order, computed scale-safely
  (per-partition offsets, no global sort) — identical to the reference
  on a single input file;
- attributes are ordered by attribute IRI (the reference inherits
  RDF4J's unspecified result order — a deterministic contract is
  required for merged-key IRIs to be stable under parallelism);
- ``skos:broader`` edges are emitted only when the parent level's value
  is non-null (the reference would build an IRI ending in the string
  "null" — HierarchicalDimension.java:119-123 with a null parent cell);
- codelist/concept triples are ``distinct()``-ed by default (the
  reference re-emits them per row and relies on downstream RDF set
  semantics — SURVEY §4); pass ``dedup_codelists=False`` for bag parity;
- invalid date shapes yield no triple instead of aborting the job
  (DateDimension.java:73); ``strict_dates=True`` (the default)
  restores the hard error via an in-plan ``raise_error`` branch — no
  extra validation pass.
- measure rounding uses Spark/BigDecimal.valueOf semantics, see
  ``functions.numeric.money_round``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import graphq_local as gl
from .functions.numeric import money_round, parse_localized_number
from .functions.text import iri_encode
from .model import RDF_TYPE, XSD

# Descriptor vocabulary (FdpMeasure.java:28-33 and the dimension queries)
FDPRDF = "http://data.openbudgets.eu/fdptordf#"
FDP = "http://schemas.frictionlessdata.io/fiscal-data-package#"
QB = "http://purl.org/linked-data/cube#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SCHEMA = "http://schema.org/"
ORG = "http://www.w3.org/ns/org#"
TIME = "http://www.w3.org/2006/time#"

# Output vocabulary (FdpToRdfVocabulary.java:3-52)
OBEU_DIMENSION = "http://data.openbudgets.eu/ontology/dsd/dimension/"
OBEU_ATTRIBUTE = "http://data.openbudgets.eu/ontology/dsd/attribute/"
OBEU_MEASURE = "http://data.openbudgets.eu/ontology/dsd/measure/"
OBEU_AMOUNT = OBEU_MEASURE + "amount"
CODELIST_BASE = "http://data.openbudgets.eu/resource/"
GREGORIAN = "http://reference.data.gov.uk/id/gregorian-"

_DIM_KINDS = (
    "multi",
    "skos",
    "hierarchical",
    "single_object",
    "single_literal",
    "date",
    "single_skos",
)


@dataclass
class CubeAttribute:
    """FdpAttribute.java:26-32 (+ FdpHierarchicalAttribute.java:12-22)."""

    iri: str
    source_column: str
    source_file: str
    is_key: bool
    value_property: str
    name: str | None = None
    label_column: str | None = None  # set by label folding (FdpDimension.java:47-54)
    parent_name: str | None = None  # hierarchical chain link


@dataclass
class CubeDimension:
    """One of the 7 dimension kinds (FdpToRdf.java:134-185)."""

    kind: str  # element of _DIM_KINDS
    value_property: str
    name: str
    rdf_type: str | None = None  # valueType (FdpToRdf.java:262)
    attributes: list[CubeAttribute] = field(default_factory=list)

    def codelist_iri(self, package_name: str) -> str:
        # FdpDimension.java:89
        return f"{CODELIST_BASE}{package_name}/codelist/{self.name}"


@dataclass
class CubeMeasure:
    """FdpMeasure.java:60-76. ``measure_property`` in the descriptor is
    overridden by the reference to the constant obeu-measure:amount
    (FdpMeasure.java:62) — mirrored here."""

    name: str
    source_column: str
    source_file: str
    factor: float = 1.0
    decimal_sep: str = "."
    group_sep: str = " "
    currency: str | None = None
    operation_char: str | None = None
    budget_phase: str | None = None


@dataclass
class CsvDialect:
    """HeaderParser.java:39-42 defaults."""

    delimiter: str = ","
    quote: str = '"'


@dataclass
class CubeSpec:
    dataset_iri: str
    package_name: str
    currency_as_dimension: bool = False
    dimensions: list[CubeDimension] = field(default_factory=list)
    measures: list[CubeMeasure] = field(default_factory=list)
    dialects: dict[str, CsvDialect] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Spec extraction (the reference's metadata phase, FdpToRdf.java:111-263)
#
# Runs driver-local over the collected descriptor (graphq_local): the
# reference holds metadata in an in-memory RDF4J repo and queries it on
# the control thread; launching Spark jobs for KB-sized plan-time
# metadata would pay ~1s of scheduling+optimization per query for
# microseconds of work. The data phase below never collects.
# ---------------------------------------------------------------------------


def _measure_base(tr: gl.LocalGraph) -> gl.Solutions:
    """FdpMeasure.query (FdpMeasure.java:27-57)."""
    base = gl.bgp(
        tr,
        [
            ("?dsd", RDF_TYPE, QB + "DataStructureDefinition"),
            ("?dsd", FDPRDF + "component", "?component"),
            ("?component", FDPRDF + "measure", "?measureProperty"),
            ("?component", FDPRDF + "factor", "?measureFactor"),
            ("?component", FDPRDF + "sourceColumn", "?sourceColumn"),
            ("?component", FDPRDF + "sourceFile", "?sourceFile"),
            ("?dataset", RDF_TYPE, QB + "DataSet"),
            ("?dataset", FDPRDF + "datasetShortName", "?packageName"),
            ("?dataset", QB + "structure", "?dsd"),
            ("?measureProperty", FDPRDF + "name", "?measureName"),
        ],
    )
    for pat in (
        [("?component", FDPRDF + "decimalChar", "?decimalChar")],
        [("?component", FDPRDF + "groupChar", "?groupChar")],
        [("?measureProperty", FDPRDF + "operationCharacter", "?operationCharacter")],
        [("?measureProperty", FDPRDF + "budgetPhase", "?budgetPhase")],
        [("?measureProperty", FDPRDF + "currency", "?currency")],
        # OPTIONAL { ?dsd qb:component/qb:dimension obeu-dimension:currency }
        [("?dsd", QB + "component", "?curComponent"),
         ("?curComponent", QB + "dimension", OBEU_DIMENSION + "currency")],
    ):
        base = gl.optional(base, tr, pat)
    return base


def _non_hierarch_counts(tr: gl.LocalGraph, distinct: bool) -> gl.Solutions:
    """The nonHierarchCount subquery (MultiAttributeDimension.java:93-99 /
    SkosDimension.java:40-46)."""
    attrs = gl.bgp(tr, [("?component", FDPRDF + "attribute", "?attribute")])
    attrs = gl.not_exists(attrs, tr, [("?attribute", FDPRDF + "isHierarchical", "true")])
    return gl.group_count(attrs, ["?component"], "?attribute", "nonHierarchCount", distinct=distinct)


def _dim_rows(tr: gl.LocalGraph, kind: str) -> list[dict]:
    """One dimension-kind discovery query → binding rows."""
    multi_count = gl.bgp(tr, [("?component", FDPRDF + "attributeCount", "?attrCount")])
    if kind in ("multi", "skos", "hierarchical"):
        base = multi_count.filter(lambda r: int(r["attrCount"]) > 1)
    else:
        base = multi_count.filter(lambda r: int(r["attrCount"]) == 1)
    base = gl.join_solutions(
        base,
        gl.bgp(
            tr,
            [
                ("?dsd", RDF_TYPE, QB + "DataStructureDefinition"),
                ("?dsd", QB + "component", "?component"),
                ("?dataset", RDF_TYPE, QB + "DataSet"),
                ("?dataset", FDPRDF + "datasetShortName", "?packageName"),
                ("?dataset", QB + "structure", "?dsd"),
            ],
        ),
    )
    if kind == "multi":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", "?componentProperty", "?dimensionProp"),
                    ("?component", FDPRDF + "valueType", "?valueType"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = gl.values(
            sols,
            ["?valueType", "?rdfType", "?componentProperty"],
            [
                (FDPRDF + "organization", SCHEMA + "Organization", QB + "dimension"),
                (FDPRDF + "location", SCHEMA + "Location", QB + "attribute"),
                (FDPRDF + "unknown", None, QB + "dimension"),
                (FDPRDF + "fact", None, QB + "componentProperty"),
            ],
        )
        sols = gl.join_solutions(sols, _non_hierarch_counts(tr, distinct=True))
        sols = sols.filter(lambda r: int(r["attrCount"]) == r["nonHierarchCount"])
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset", "rdfType").distinct()
    elif kind == "skos":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", QB + "dimension", "?dimensionProp"),
                    ("?component", FDPRDF + "attribute", "?attribute"),
                    ("?component", FDPRDF + "valueType", FDPRDF + "skos"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                    ("?attribute", FDPRDF + "source", "?sourceProperty"),
                    ("?attribute", FDPRDF + "valueProperty", "?attributeValueProperty"),
                ],
            ),
        )
        sols = gl.join_solutions(sols, _non_hierarch_counts(tr, distinct=False))
        sols = sols.filter(lambda r: int(r["attrCount"]) == r["nonHierarchCount"])
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset").distinct()
    elif kind == "hierarchical":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", QB + "dimension", "?dimensionProp"),
                    ("?component", FDPRDF + "attribute", "?attribute"),
                    ("?component", FDPRDF + "valueType", FDPRDF + "skos"),
                    ("?attribute", FDPRDF + "isHierarchical", "true"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset").distinct()
    elif kind == "single_object":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", "?componentProperty", "?dimensionProp"),
                    ("?component", FDPRDF + "attribute", "?attribute"),
                    ("?component", FDPRDF + "valueType", "?valueType"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = gl.values(
            sols,
            ["?valueType", "?rdfType", "?componentProperty", "?attrValueProperty"],
            [
                (FDPRDF + "organization", SCHEMA + "Organization", QB + "dimension", SCHEMA + "name"),
                (FDPRDF + "location", SCHEMA + "Location", QB + "attribute", SCHEMA + "name"),
            ],
        )
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset", "rdfType").distinct()
    elif kind == "single_literal":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", "?componentProperty", "?dimensionProp"),
                    ("?component", FDPRDF + "attribute", "?attribute"),
                    ("?component", FDPRDF + "valueType", "?valueType"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = gl.values(
            sols,
            ["?componentProperty", "?valueType"],
            [
                (QB + "dimension", FDPRDF + "unknown"),
                (QB + "attribute", FDPRDF + "unknown"),
                (QB + "componentProperty", FDPRDF + "fact"),
            ],
        )
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset").distinct()
    elif kind == "date":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", QB + "dimension", "?dimensionProp"),
                    ("?component", FDPRDF + "valueType", FDPRDF + "dateTime"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset").distinct()
    elif kind == "single_skos":
        sols = gl.join_solutions(
            base,
            gl.bgp(
                tr,
                [
                    ("?component", QB + "dimension", "?dimensionProp"),
                    ("?component", FDPRDF + "attribute", "?attribute"),
                    ("?component", FDPRDF + "valueType", FDPRDF + "skos"),
                    ("?dimensionProp", FDPRDF + "name", "?dimensionName"),
                ],
            ),
        )
        sols = sols.select("dimensionProp", "dimensionName", "packageName", "dataset").distinct()
    else:  # pragma: no cover
        raise ValueError(kind)
    return sols.rows


def _attr_rows(tr: gl.LocalGraph, dim_prop: str, kind: str) -> list[dict]:
    """Per-dimension attribute query (the kind-specific attributeQuery
    templates with ``_dimensionProp_`` substituted)."""
    pats = [
        ("?component", "?componentProperty", dim_prop),
        ("?component", FDPRDF + "attribute", "?attribute"),
        ("?attribute", FDPRDF + "sourceColumn", "?sourceColumn"),
        ("?attribute", FDPRDF + "sourceFile", "?sourceFile"),
        ("?attribute", FDPRDF + "iskey", "?iskey"),
        ("?attribute", FDPRDF + "valueProperty", "?attributeValueProperty"),
    ]
    if kind in ("skos", "hierarchical"):
        pats.append(("?attribute", FDPRDF + "name", "?attributeName"))
    if kind == "hierarchical":
        pats.append(("?attribute", FDPRDF + "isHierarchical", "true"))
    sols = gl.bgp(tr, pats)
    if kind in ("multi", "skos", "single_object", "single_literal"):
        sols = gl.not_exists(sols, tr, [("?attribute", FDPRDF + "isHierarchical", "true")])
    if kind == "hierarchical":
        sols = gl.optional(
            sols,
            tr,
            [
                ("?attribute", FDPRDF + "parentAttribute", "?pa"),
                ("?pa", FDPRDF + "name", "?parentName"),
            ],
        )
        sols = gl.not_exists(sols, tr, [("?attribute", FDPRDF + "labelfor", "?lf")])
    keep = [c for c in sols.columns if "__" not in c and c not in ("component", "componentProperty", "pa")]
    return sols.select(*keep).distinct().rows


def _label_rows(tr: gl.LocalGraph, dim_prop: str) -> list[dict]:
    """FdpDimension.labelQuery (FdpDimension.java:25-41)."""
    sols = gl.bgp(
        tr,
        [
            ("?component", QB + "dimension", dim_prop),
            ("?component", FDPRDF + "attribute", "?attribute"),
            ("?component", FDPRDF + "valueType", FDPRDF + "skos"),
            ("?attribute", FDPRDF + "sourceColumn", "?sourceColumn"),
            ("?attribute", FDPRDF + "labelfor", "?labelForName"),
        ],
    )
    return sols.select("labelForName", "sourceColumn").distinct().rows


def _fold_labels(attributes: list[CubeAttribute], labels: list[dict]) -> list[CubeAttribute]:
    """FdpDimension.addLabel (FdpDimension.java:47-54): point the named
    attribute at its label column, then drop the label attribute itself
    from value emission."""
    out = list(attributes)
    for row in labels:
        for a in out:
            if a.name == row["labelForName"]:
                a.label_column = row["sourceColumn"]
        out = [a for a in out if a.source_column != row["sourceColumn"]]
    return out


def _order_hierarchy(attributes: list[CubeAttribute]) -> list[CubeAttribute]:
    """HierarchicalDimension.setAttributes (:81-103): find the lowest
    (child-most) attribute — one that has a parent and is nobody's
    parent — then follow the parent chain upward."""
    by_name = {a.name: a for a in attributes}
    lowest = None
    for a in attributes:
        if a.parent_name is not None and not any(x.parent_name == a.name for x in attributes):
            lowest = a
            break
    ordered: list[CubeAttribute] = []
    seen: set[str] = set()
    while lowest is not None:
        if lowest.name in seen:
            # malformed descriptor: the parent chain loops (b→c→b) —
            # fail fast instead of walking the cycle forever
            raise ValueError(
                f"hierarchical dimension has a parentAttribute cycle at "
                f"{lowest.name!r}: {' -> '.join(a.name for a in ordered)}"
            )
        seen.add(lowest.name)
        ordered.append(lowest)
        lowest = by_name.get(lowest.parent_name) if lowest.parent_name else None
    return ordered


def extract_dialect(tr: gl.LocalGraph, resource_name: str) -> CsvDialect:
    """HeaderParser.resourceQuery (HeaderParser.java:8-24) + defaults
    ``,`` / ``"`` (:39-42)."""
    base = gl.bgp(tr, [("?resource", FDP + "name", resource_name)])
    base = gl.optional(
        base, tr,
        [("?resource", FDP + "dialect", "?d1"), ("?d1", FDP + "delimiter", "?delimiter")],
    )
    base = gl.optional(
        base, tr,
        [("?resource", FDP + "dialect", "?d2"), ("?d2", FDP + "quoteChar", "?quoteChar")],
    )
    rows = base.rows
    dialect = CsvDialect()
    if rows:
        if rows[0].get("delimiter"):
            dialect.delimiter = rows[0]["delimiter"][0]
        if rows[0].get("quoteChar"):
            dialect.quote = rows[0]["quoteChar"][0]
    return dialect


def extract_spec(spark: SparkSession, descriptor: DataFrame | gl.LocalGraph) -> CubeSpec:
    """Descriptor triples (DF or pre-collected :class:`LocalGraph`) →
    :class:`CubeSpec` (FdpToRdf.java:111-263, same query order: measure
    first, then the 7 dimension kinds, then attributes + labels per
    dimension).

    The descriptor is metadata (KBs). It is collected ONCE (one tiny
    job) and the ~30 extraction queries run driver-local through
    :mod:`graphq_local` — the same control-plane locality as the
    reference's in-memory RDF4J repo. The data-phase plan never
    collects."""
    if isinstance(descriptor, gl.LocalGraph):
        tr = descriptor
    else:
        tr = gl.LocalGraph([r.asDict() for r in descriptor.collect()])

    measure_rows = _measure_base(tr).rows
    if not measure_rows:
        raise ValueError("fdp_to_cube: dataset IRI not found in metadata")
    kind_rows = {kind: _dim_rows(tr, kind) for kind in _DIM_KINDS}

    first = measure_rows[0]
    spec = CubeSpec(
        dataset_iri=first["dataset"],
        package_name=first["packageName"],
        currency_as_dimension=first.get("curComponent") is not None,
    )

    for row in measure_rows:
        spec.measures.append(
            CubeMeasure(
                name=row["measureName"],
                source_column=row["sourceColumn"],
                source_file=row["sourceFile"],
                factor=float(row["measureFactor"]),
                decimal_sep=(row.get("decimalChar") or ".")[0],
                group_sep=(row.get("groupChar") or " ")[0],
                currency=row.get("currency"),
                operation_char=row.get("operationCharacter"),
                budget_phase=row.get("budgetPhase"),
            )
        )
        if row["sourceFile"] not in spec.dialects:
            spec.dialects[row["sourceFile"]] = extract_dialect(tr, row["sourceFile"])

    for kind in _DIM_KINDS:
        for row in kind_rows[kind]:
            dim = CubeDimension(
                kind=kind,
                value_property=row["dimensionProp"],
                name=row["dimensionName"],
                rdf_type=row.get("rdfType"),
            )
            attrs = [
                CubeAttribute(
                    iri=a["attribute"],
                    source_column=a["sourceColumn"],
                    source_file=a["sourceFile"],
                    is_key=str(a["iskey"]).lower() == "true",
                    value_property=a["attributeValueProperty"],
                    name=a.get("attributeName"),
                    parent_name=a.get("parentName"),
                )
                for a in _attr_rows(tr, dim.value_property, kind)
            ]
            # deterministic contract: order by attribute IRI (the
            # reference inherits RDF4J result order)
            attrs.sort(key=lambda a: a.iri)
            if kind in ("skos", "single_skos", "hierarchical"):
                attrs = _fold_labels(attrs, _label_rows(tr, dim.value_property))
            if kind == "hierarchical":
                attrs = _order_hierarchy(attrs)
            dim.attributes = attrs
            spec.dimensions.append(dim)
    return spec


# ---------------------------------------------------------------------------
# Compilation (the reference's data phase, Mapper.java:83-114, as one plan)
# ---------------------------------------------------------------------------

_T_SCHEMA = "s string, p string, o_value string, o_type string, o_lang string, o_datatype string"


def _triple(s: Column, p: str | Column, o: Column, o_type: str = "iri",
            datatype: str | None = None, when: Column | None = None) -> Column:
    """One conditional (s,p,o) struct; NULL when ``when`` is false (the
    explode output filters NULL structs)."""
    p_col = F.lit(p) if isinstance(p, str) else p
    st = F.struct(
        s.alias("s"),
        p_col.alias("p"),
        o.cast("string").alias("o_value"),
        F.lit(o_type).alias("o_type"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(datatype).cast("string").alias("o_datatype"),
    )
    cond = o.isNotNull() if when is None else (when & o.isNotNull())
    return F.when(cond, st)


def with_row_numbers(df: DataFrame, colname: str = "__rownum") -> DataFrame:
    """1-based row numbers in input-file order without a global sort:
    per-partition ranks plus an exchanged map of partition offsets (the
    partition-count job is tiny). Matches the reference's sequential
    ``rowNumber++`` (Mapper.java:32,85) on a single input file; across
    multiple splits the order is split order, which for one file equals
    byte order.

    PRECONDITION: ``df`` must be a deterministic scan (file source, no
    upstream shuffle/repartition). The offsets job and the main plan
    execute the input twice; only a deterministic scan guarantees both
    see the same partitioning and per-partition row order. For a
    post-shuffle input, numbers would silently misassign — cache or
    checkpoint such an input first (not done here: the sole caller
    feeds a raw CSV scan, and the extra materialization would cost more
    than it buys)."""
    d = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    counts = {r["__pid"]: r["cnt"] for r in
              d.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    pairs = [x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    off_col = F.element_at(F.create_map(*pairs), F.col("__pid"))
    rn = F.row_number().over(W.partitionBy("__pid").orderBy("__mid"))
    return d.withColumn(colname, (off_col + rn).cast("long")).drop("__pid", "__mid")


def _merged_key(df: DataFrame, attrs: list[CubeAttribute]) -> Column:
    """FdpDimension.mergedPrimaryKey (:91-104): '-'-joined urlEncoded key
    attribute values (spaces → '-' first, FdpDimension.java:106-115)."""
    parts = [iri_encode(_cell(df, a.source_column)) for a in attrs if a.is_key]
    if not parts:
        return F.lit("")
    return F.concat_ws("-", *parts)


def _cell(df: DataFrame, column: str | None) -> Column:
    """row.get(column) semantics: absent column → NULL (the reference's
    HashMap lookup misses for columns of other source files)."""
    if column is not None and column in df.columns:
        return F.col(column)
    return F.lit(None).cast("string")


def _dimension_structs(
    df: DataFrame, spec: CubeSpec, dim: CubeDimension, obs: Column,
    strict: bool = False,
) -> tuple[list[Column], list[Column]]:
    """→ (row-scoped structs, codelist-scoped structs). Codelist-scoped
    triples are keyed by dimension *value*, not by row — they duplicate
    across rows and deduplicate in the codelist subplan."""
    row_out: list[Column] = []
    code_out: list[Column] = []
    codelist = F.lit(dim.codelist_iri(spec.package_name))
    vp = dim.value_property
    dim_val = F.concat(
        F.lit(spec.dataset_iri + "/" + dim.name + "/"), _merged_key(df, dim.attributes)
    )

    def scheme_triples(top_concept: Column, top_when: Column) -> list[Column]:
        # SkosDimension.java:95-104 tail (shared by skos kinds)
        return [
            _triple(codelist, RDF_TYPE, F.lit(SKOS + "ConceptScheme"), "iri", when=top_when),
            _triple(codelist, SKOS + "hasTopConcept", top_concept, "iri", when=top_when),
            _triple(codelist, RDFS + "label", F.lit(dim.name), "literal", when=top_when),
            _triple(F.lit(vp), QB + "codeList", codelist, "iri", when=top_when),
        ]

    if dim.kind == "single_literal":
        # SingleAttributeLiteralDimension.java:76-81
        for a in dim.attributes:
            row_out.append(_triple(obs, vp, _cell(df, a.source_column), "literal"))
    elif dim.kind == "single_object":
        # SingleAttributeObjectDimension.java:81-95
        some = None
        for a in dim.attributes:
            v = _cell(df, a.source_column)
            code_out.append(_triple(dim_val, SCHEMA + "name", v, "literal"))
            some = v.isNotNull() if some is None else (some | v.isNotNull())
        if some is not None:
            if dim.rdf_type:
                code_out.append(_triple(dim_val, RDF_TYPE, F.lit(dim.rdf_type), "iri", when=some))
            row_out.append(_triple(obs, vp, dim_val, "iri", when=some))
    elif dim.kind == "single_skos":
        # SingleAttributeSkosDimension.java:60-73
        v = _cell(df, dim.attributes[0].source_column) if dim.attributes else F.lit(None)
        nn = v.isNotNull()
        row_out.append(_triple(obs, vp, dim_val, "iri", when=nn))
        code_out += [
            _triple(dim_val, RDF_TYPE, F.lit(SKOS + "Concept"), "iri", when=nn),
            _triple(dim_val, SKOS + "prefLabel", v, "literal"),
            _triple(dim_val, SKOS + "inScheme", codelist, "iri", when=nn),
            *scheme_triples(dim_val, nn),
        ]
    elif dim.kind == "multi":
        # MultiAttributeDimension.java:108-119: type + observation link
        # emitted unconditionally, per-attribute values when non-null
        if dim.rdf_type:
            code_out.append(_triple(dim_val, RDF_TYPE, F.lit(dim.rdf_type), "iri"))
        for a in dim.attributes:
            code_out.append(_triple(dim_val, a.value_property, _cell(df, a.source_column), "literal"))
        row_out.append(_triple(obs, vp, dim_val, "iri"))
    elif dim.kind == "skos":
        # SkosDimension.java:78-105 — order-sensitive label folding:
        # weHaveLabel is the running OR of label emissions; the final
        # codelist block keys on the LAST attribute's value.
        have_label_before: Column = F.lit(False)
        for a in dim.attributes:
            v = _cell(df, a.source_column)
            label = _cell(df, a.label_column)
            emits_label = v.isNotNull() & label.isNotNull() if a.label_column else F.lit(False)
            code_out.append(_triple(dim_val, SKOS + "prefLabel", label, "literal", when=v.isNotNull()))
            have_here = have_label_before | emits_label
            code_out.append(_triple(dim_val, SKOS + "notation", v, "literal", when=have_here))
            code_out.append(_triple(dim_val, a.value_property, v, "literal", when=~have_here))
            have_label_before = have_here
        last_v = _cell(df, dim.attributes[-1].source_column) if dim.attributes else F.lit(None)
        nn = last_v.isNotNull()
        row_out.append(_triple(obs, vp, dim_val, "iri", when=nn))
        code_out += [
            _triple(dim_val, RDF_TYPE, F.lit(SKOS + "Concept"), "iri", when=nn),
            _triple(dim_val, SKOS + "prefLabel", _merged_key(df, dim.attributes), "literal",
                    when=nn & ~have_label_before),
            _triple(dim_val, SKOS + "inScheme", codelist, "iri", when=nn),
            *scheme_triples(dim_val, nn),
        ]
    elif dim.kind == "hierarchical":
        # HierarchicalDimension.java:107-140 (child→parent order)
        ordered = dim.attributes
        vals = [_cell(df, a.source_column) for a in ordered]
        iris = [
            F.concat(F.lit(f"{spec.dataset_iri}/{a.name}/"), iri_encode(v))
            for a, v in zip(ordered, vals)
        ]
        # observation links to the FIRST non-null level
        prior_null: Column = F.lit(True)
        for v, iri in zip(vals, iris):
            row_out.append(_triple(obs, vp, iri, "iri", when=prior_null & v.isNotNull()))
            prior_null = prior_null & v.isNull()
        for i, (a, v, iri) in enumerate(zip(ordered, vals, iris)):
            nn = v.isNotNull()
            if i < len(ordered) - 1:
                parent_nn = vals[i + 1].isNotNull()
                code_out.append(
                    _triple(iri, SKOS + "broader", iris[i + 1], "iri", when=nn & parent_nn)
                )
            code_out += [
                _triple(iri, SKOS + "notation", v, "literal"),
                _triple(iri, RDF_TYPE, F.lit(SKOS + "Concept"), "iri", when=nn),
                _triple(iri, SKOS + "inScheme", codelist, "iri", when=nn),
                _triple(codelist, RDF_TYPE, F.lit(SKOS + "ConceptScheme"), "iri", when=nn),
                _triple(codelist, RDFS + "label", F.lit(dim.name), "literal", when=nn),
                _triple(F.lit(vp), QB + "codeList", codelist, "iri", when=nn),
            ]
            if i == len(ordered) - 1:
                code_out.append(_triple(codelist, SKOS + "hasTopConcept", iri, "iri", when=nn))
            if a.label_column:
                code_out.append(
                    _triple(iri, SKOS + "prefLabel", _cell(df, a.label_column), "literal", when=nn)
                )
    elif dim.kind == "date":
        # DateDimension.java:64-81: 4-shape regex → gregorian IRI; a
        # non-null cell matching no shape aborts the job in-plan
        # (strict mode) — no separate validation scan
        v = _cell(df, dim.attributes[0].source_column) if dim.attributes else F.lit(None)
        date_iri = (
            F.when(v.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.concat(F.lit(GREGORIAN + "day/"), v))
            .when(v.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"),
                  F.concat(F.lit(GREGORIAN + "interval/"), v))
            .when(v.rlike(r"^\d{4}-\d{2}$"), F.concat(F.lit(GREGORIAN + "month/"), v))
            .when(v.rlike(r"^\d{4}$"), F.concat(F.lit(GREGORIAN + "year/"), v))
        )
        if strict:
            date_iri = date_iri.when(
                v.isNotNull(),
                F.raise_error(
                    F.concat(
                        F.lit(f"date value '"), v,
                        F.lit(f"' in dimension {dim.name!r} is not in "
                              "xs:date/xs:dateTime format"),
                    )
                ),
            )
        row_out.append(_triple(obs, vp, date_iri, "iri"))
        # guard on the SUBJECT: the object is a constant (never null), so
        # without this a null/unclassifiable date cell would emit a
        # NULL-subject triple — DateDimension.java:64-81 emits nothing
        code_out.append(
            _triple(date_iri, RDF_TYPE, F.lit(TIME + "Interval"), "iri",
                    when=date_iri.isNotNull())
        )
    else:  # pragma: no cover
        raise ValueError(dim.kind)
    return row_out, code_out


def _measure_structs(df: DataFrame, spec: CubeSpec, m: CubeMeasure, obs: Column) -> list[Column]:
    """FdpMeasure.processRow (:87-120) + the three observation
    declaration triples (Mapper.java:102-111)."""
    out: list[Column] = []
    raw = _cell(df, m.source_column)
    nn = raw.isNotNull()
    parsed = parse_localized_number(raw, m.decimal_sep, m.group_sep)
    rounded = money_round(parsed, m.factor).cast("decimal(38,2)")
    # numeric parse OK → typed decimal literal; else raw string passthrough
    out.append(_triple(obs, OBEU_AMOUNT, rounded, "literal", datatype=XSD + "decimal",
                       when=nn & parsed.isNotNull()))
    out.append(_triple(obs, OBEU_AMOUNT, raw, "literal", when=nn & parsed.isNull()))
    if m.budget_phase:
        out.append(_triple(obs, OBEU_DIMENSION + "budgetPhase", F.lit(m.budget_phase), "iri", when=nn))
    if m.operation_char:
        out.append(_triple(obs, OBEU_DIMENSION + "operationCharacter", F.lit(m.operation_char), "iri", when=nn))
    if m.currency:
        out.append(_triple(obs, OBEU_ATTRIBUTE + "currency", F.lit(m.currency), "iri", when=nn))
        if spec.currency_as_dimension:
            out.append(_triple(obs, OBEU_DIMENSION + "currency", F.lit(m.currency), "iri", when=nn))
    # unconditional declaration triples (Mapper.java:102-111)
    ds = F.lit(spec.dataset_iri)
    out.append(_triple(ds, QB + "observation", obs, "iri"))
    out.append(_triple(obs, RDF_TYPE, F.lit(QB + "Observation"), "iri"))
    out.append(_triple(obs, QB + "dataSet", ds, "iri"))
    return out


def read_csv_with_dialect(spark: SparkSession, path: str, dialect: CsvDialect) -> DataFrame:
    """S1: header row, data-driven delimiter/quote, all-string schema
    (Parser.java:32-65; dialect FdpToRdf.java:123-132). Spark strips the
    UTF-8 BOM natively (Parser.java:88-94 parity)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("delimiter", dialect.delimiter)
        .option("quote", dialect.quote)
        .option("encoding", "UTF-8")
        .csv(path)
    )


def compile_cube(spark: SparkSession, spec: CubeSpec, csv_df: DataFrame,
                 dedup_codelists: bool = True, strict_dates: bool = True,
                 iri_scope: str | None = None) -> DataFrame:
    """CSV DataFrame + spec → triples DataFrame: one select building
    every conditional (s,p,o) struct, one explode, null-filter. The
    codelist-scoped subplan is ``distinct()``-ed (SURVEY §4).
    ``strict_dates`` aborts on malformed date cells via an in-plan
    ``raise_error`` branch (no extra validation scan). ``iri_scope``
    namespaces observation IRIs (``…/observation/<scope>/<rownum>/…``)
    — required in the multi-CSV extension, where per-file row numbers
    restart at 1 and unscoped IRIs would collide across files; None
    (the default, single-file reference semantics) leaves the IRIs
    byte-identical to the reference's."""
    df = with_row_numbers(csv_df)
    row_structs: list[Column] = []
    code_structs: list[Column] = []
    obs_base = spec.dataset_iri + "/observation/" + (
        f"{iri_scope}/" if iri_scope is not None else ""
    )
    for mi, m in enumerate(spec.measures):
        obs = F.concat(
            F.lit(obs_base),
            F.col("__rownum"),
            F.lit("/for-" + m.name),
        )
        for dim in spec.dimensions:
            r, c = _dimension_structs(df, spec, dim, obs, strict=strict_dates)
            row_structs += r
            # codelist structs are keyed by dimension VALUE, not obs —
            # measure-independent, so in the default dedup mode one
            # copy suffices (per-measure copies are wasted codegen
            # ahead of the distinct()). In bag-parity mode
            # (dedup_codelists=False) the reference emits them once
            # per (dimension, measure) per row (Mapper.java:98-100;
            # PlainTextTripleWriter never dedups), so keep the
            # per-measure copies there to preserve multiplicities.
            if mi == 0 or not dedup_codelists:
                code_structs += c
        row_structs += _measure_structs(df, spec, m, obs)

    def explode_branch(structs: list[Column]) -> DataFrame:
        exploded = df.select(F.explode(F.array(*structs)).alias("t"))
        return exploded.filter(F.col("t").isNotNull()).select(
            "t.s", "t.p", "t.o_value", "t.o_type", "t.o_lang", "t.o_datatype"
        )

    out = explode_branch(row_structs)
    if code_structs:
        codes = explode_branch(code_structs)
        out = out.unionByName(codes.distinct() if dedup_codelists else codes)
    return out


def fdp_to_cube(
    spark: SparkSession,
    descriptor: DataFrame,
    csv_paths: dict[str, str],
    nt_paths: list[str] | None = None,
    dedup_codelists: bool = True,
    strict_dates: bool = True,
    allow_multiple_csvs: bool = False,
) -> DataFrame:
    """End-to-end §2.8 component op: descriptor triples + CSV file(s)
    (+ optional ``.nt`` passthrough, FdpToRdf.java:306-311) → triples
    DataFrame. ``csv_paths`` maps resource name (the descriptor's
    ``fdp:name`` / ``fdprdf:sourceFile``) → filesystem path.

    ``allow_multiple_csvs=True`` relaxes the reference's one-CSV L2
    guard (an engine extension): each file compiles through its OWN
    per-file plan with file-scoped row numbering and the observation
    IRIs namespaced by resource name
    (``…/observation/<resource>/<rownum>/…``) so rows from different
    files can never collide; the per-file plans union. Codelist
    dedup stays per-file in this mode (cross-file repeats of a
    codelist triple survive the union — a multiset, distinct()
    downstream for set semantics). Default False = reference-strict,
    IRIs byte-identical to the single-file form."""
    from .model import triples_from_ntriples

    # L2 input-size guard (FdpToRdf.java:297: "Only one CSV file is
    # supported at the moment" — fail when more than 2 inputs arrive)
    n_inputs = len(csv_paths) + len(nt_paths or [])
    if (len(csv_paths) > 1 and not allow_multiple_csvs) or len(nt_paths or []) > 1:
        raise ValueError(
            f"fdp_to_cube: at most one CSV (+ one .nt) input is supported, got "
            f"{len(csv_paths)} CSV + {len(nt_paths or [])} .nt ({n_inputs} total); "
            "pass allow_multiple_csvs=True for the multi-CSV extension"
        )
    spec = extract_spec(spark, descriptor)
    scoped = len(csv_paths) > 1
    out: DataFrame | None = None
    for resource_name, path in csv_paths.items():
        dialect = spec.dialects.get(resource_name, CsvDialect())
        csv_df = read_csv_with_dialect(spark, path, dialect)
        part = compile_cube(spark, spec, csv_df,
                            dedup_codelists=dedup_codelists, strict_dates=strict_dates,
                            iri_scope=resource_name if scoped else None)
        out = part if out is None else out.unionByName(part)
    for path in nt_paths or []:
        nt = triples_from_ntriples(spark, path)
        out = nt if out is None else out.unionByName(nt)
    if out is None:
        raise ValueError("fdp_to_cube: no input files")
    return out


def fdp_to_cube_auto(
    spark: SparkSession,
    descriptor: DataFrame,
    paths: list[str],
    **kwargs,
) -> DataFrame:
    """F11 endsWith dispatch (FdpToRdf.java:302-306): route each input
    by filename suffix — ``.nt`` files pass through, everything else is
    the CSV resource (resource name = basename, matching the
    descriptor's ``fdp:name``/``fdprdf:sourceFile``)."""
    import os

    csv_paths = {
        os.path.basename(p): p for p in paths if not p.endswith(".nt")
    }
    nt_paths = [p for p in paths if p.endswith(".nt")]
    return fdp_to_cube(spark, descriptor, csv_paths, nt_paths=nt_paths, **kwargs)
