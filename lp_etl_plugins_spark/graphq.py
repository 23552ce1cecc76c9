"""Graph (SPARQL-shaped) query layer over the triples DataFrame (SURVEY §7.2).

The reference queries every metadata graph with SPARQL SELECT strings
(FdpToRdf.java:82-109, DcatAp11ToCkanBatch.java:627-679). This module
replaces that with ~8 composable functions over the triples schema of
:mod:`lp_etl_plugins_spark.model`; each SPARQL construct the reference
uses maps to exactly one function:

    basic graph pattern (joins)       -> bgp            (J1)
    OPTIONAL                          -> optional       (J2)
    FILTER NOT EXISTS                 -> not_exists     (J3)
    VALUES incl. UNDEF                -> values         (J4)
    property paths incl. inverse ^p   -> path           (J5)
    FILTER(LANGMATCHES(LANG(?x),l))   -> lang_filter    (P4)
    COUNT(DISTINCT …) GROUP BY        -> group_count    (A1)
    QueryResults.singleResult scalar  -> scalar         (A3)

Binding representation: a *solution DataFrame* whose columns are variable
names (without the ``?``). An object-position variable additionally
carries companion metadata columns ``<var>__type`` / ``<var>__lang`` /
``<var>__dt`` so language/datatype filters stay expressible after the
join. Joins between patterns compare ``o_value`` lexical forms —
sufficient for the reference's graphs, where no IRI collides with a
literal's lexical form.

Scale: metadata graphs are tiny (KBs) and every pattern filter prunes by
predicate first; at 100 TB triples (the `.nt` path) these are plain
shuffled hash joins on bounded-cardinality keys, with AQE choosing
broadcast when one side is small. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import RDF_TYPE

__all__ = [
    "bgp",
    "optional",
    "not_exists",
    "union",
    "values",
    "path",
    "path_plus",
    "lang_filter",
    "group_count",
    "scalar",
    "join_solutions",
    "RDF_TYPE",
]

UNDEF = None  # SPARQL UNDEF marker inside values() rows


def _is_var(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var(term: str) -> str:
    return term[1:]


def _meta_cols(var: str) -> tuple[str, str, str]:
    return f"{var}__type", f"{var}__lang", f"{var}__dt"


def _pattern_df(triples: DataFrame, pattern: tuple[str, str, str]) -> DataFrame:
    """One (s, p, o) pattern → solution DF. Terms starting with ``?`` are
    variables; everything else is a constant (IRI for s/p, lexical match
    for o). A variable REPEATED within the pattern (e.g. ``(?x, p,
    ?x)``) binds once and adds the SPARQL-required equality filter —
    naively aliasing both positions would emit two columns of the same
    name and match rows whose positions differ."""
    s, p, o = pattern
    df = triples
    cols: list[Column] = []
    bound: dict[str, str] = {}  # var -> source column of first binding

    def bind(term: str, src: str) -> None:
        nonlocal df
        v = _var(term)
        if v in bound:
            cond = F.col(src) == F.col(bound[v])
            if src == "o_value":
                # sameTerm, not lexical equality: the first occurrence
                # sits in subject/predicate position (always an IRI),
                # so a literal object whose lexical form equals that
                # IRI must NOT satisfy the repeated variable
                cond = cond & (F.col("o_type") == "iri")
            df = df.filter(cond)
            return
        bound[v] = src
        cols.append(F.col(src).alias(v))
        if src == "o_value":
            t, l, d = _meta_cols(v)
            cols.extend(
                [
                    F.col("o_type").alias(t),
                    F.col("o_lang").alias(l),
                    F.col("o_datatype").alias(d),
                ]
            )

    if _is_var(s):
        bind(s, "s")
    else:
        df = df.filter(F.col("s") == s)
    if _is_var(p):
        bind(p, "p")
    else:
        df = df.filter(F.col("p") == p)
    if _is_var(o):
        bind(o, "o_value")
    else:
        df = df.filter(F.col("o_value") == o)
    if not cols:
        cols = [F.lit(1).alias("__matched")]
    return df.select(*cols)


def _plain_vars(df: DataFrame) -> set[str]:
    return {c for c in df.columns if "__" not in c}


def _compat_join(left: DataFrame, right: DataFrame, shared: list[str]) -> DataFrame:
    """SPARQL 1.1 unbound-compatible join (the algebra's Join(μ1, μ2)
    rule): solutions are compatible when every shared variable is
    EQUAL OR UNBOUND ON EITHER SIDE; the joined solution takes the
    bound value. This is what a plain SQL equi-join gets wrong for
    union results — NULL (unbound) never matches, silently discarding
    the branch that leaves a variable unbound.

    Plan shape: a theta join (v IS NULL OR v' IS NULL OR v = v') is
    not hash-partitionable, so Spark executes it as a broadcast
    nested-loop — correct for the metadata-scale graphs this layer
    serves; for bulk triples keep variables bound in both branches
    (the default join's documented contract) instead of opting in.
    Metadata companions follow the bound side (left preferred when
    both bind, matching the default join's left-keeps-meta rule); a
    side that binds a variable without companions contributes the IRI
    term, exactly as :func:`union` materializes it."""
    rname = {c: f"__r_{c}" for v in shared for c in (v, *_meta_cols(v)) if c in right.columns}
    r = right
    for c, rc in rname.items():
        r = r.withColumnRenamed(c, rc)
    cond = None
    for v in shared:
        lcol, rcol = F.col(v), F.col(rname[v])
        c = lcol.isNull() | rcol.isNull() | (lcol == rcol)
        cond = c if cond is None else (cond & c)
    # broadcast the right (block) side: without the hint Spark falls
    # back to a two-sided-shuffle CartesianProduct for the theta
    # condition; the compat join's contract is small-block metadata
    # scale, so the block is broadcast-sized by construction
    joined = left.join(F.broadcast(r), cond, "inner")

    def _meta_of(side_has: bool, cols: tuple[str, str, str], from_right: bool):
        t, l, d = cols
        if side_has:
            pre = (lambda c: F.col(rname[c])) if from_right else F.col
            return pre(t), pre(l), pre(d)
        none = F.lit(None).cast("string")
        return F.lit("iri"), none, none

    out: list[Column] = []
    for c in left.columns:
        v = c.split("__")[0]
        if v in shared:
            continue  # shared vars + meta handled below
        out.append(F.col(c))
    for c in right.columns:
        v = c.split("__")[0]
        if v not in shared and c not in left.columns:
            out.append(F.col(rname.get(c, c)))
    for v in shared:
        t_l = _meta_cols(v)
        l_has = t_l[0] in left.columns
        r_has = t_l[0] in right.columns
        out.append(F.coalesce(F.col(v), F.col(rname[v])).alias(v))
        if l_has or r_has:
            lmeta = _meta_of(l_has, t_l, from_right=False)
            rmeta = _meta_of(r_has, t_l, from_right=True)
            for name, lm, rm in zip(t_l, lmeta, rmeta):
                out.append(F.when(F.col(v).isNotNull(), lm).otherwise(rm).alias(name))
    return joined.select(*out)


def join_solutions(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    n_salts: int | None = None,
    strict_terms: bool = False,
    unbound_compat: bool = False,
) -> DataFrame:
    """Join two solution DFs on their shared variables (SPARQL-compatible
    join). Metadata columns of shared variables are kept from the left
    side only; disjoint variable sets produce a cross join (SPARQL
    cartesian product).

    ``unbound_compat=True`` opts into the SPARQL 1.1 algebra's
    unbound-is-compatible rule for shared variables (inner joins
    only; see :func:`_compat_join`) — use it when joining a
    :func:`union` result on a branch-exclusive variable, where the
    default SQL NULL semantics would discard the unbound branch.

    ``strict_terms=True`` joins shared variables on the full RDF term
    — (lexical value, term type, language tag, datatype) — instead of
    the lexical form only: sameTerm semantics, so an IRI never matches
    a literal whose lexical form collides with it, and ``"2020"@en``
    never matches ``"2020"^^xsd:gYear`` or ``"2020"@fr``. A variable
    bound in subject or predicate position is an IRI by construction
    (its effective term is ``('iri', no lang, no datatype)``). Default
    off: the reference's graphs have no such collisions and the
    lexical join costs one key column less.

    ``n_salts`` enables the salted skew join for hot shared-variable
    values (e.g. the rdf:type object on a 100 TB triples table —
    SCALE.md): the left side gets a random salt in [0, n_salts), the
    right side is replicated once per salt value, and the equi-join key
    becomes (shared vars, salt) — a single hot binding spreads over
    ``n_salts`` reducers instead of one, at the cost of an n_salts×
    replication of the (smaller) right side. Correct for inner/left/
    left_anti: every left row sees the full right side within its salt.
    Opt-in — leave None unless a key is known-hot (AQE handles moderate
    skew on its own)."""
    shared = sorted(_plain_vars(left) & _plain_vars(right))
    if unbound_compat:
        if how != "inner" or n_salts or strict_terms:
            raise ValueError(
                "join_solutions: unbound_compat supports plain inner joins "
                "only (no n_salts/strict_terms)"
            )
        if not shared:
            return left.crossJoin(right)
        return _compat_join(left, right, shared)
    term_keys: list[str] = []
    if strict_terms:
        # materialize each side's effective (type, lang, datatype)
        # BEFORE the right-side meta columns are dropped below;
        # s/p-position bindings (no meta companions) are plain IRIs by
        # construction. Folded into ONE key column with \x01 separators
        # and null→'' coalescing: null lang/datatype must compare
        # EQUAL (sameTerm), while a bare equi-join key of null would
        # drop the row under SQL null semantics.
        def _term_key(df: DataFrame, v: str) -> Column:
            t, l, d = _meta_cols(v)
            if t not in df.columns:
                return F.lit("iri\x01\x01")
            return F.concat_ws(
                "\x01",
                F.coalesce(F.col(t), F.lit("")),
                F.coalesce(F.col(l), F.lit("")),
                F.coalesce(F.col(d), F.lit("")),
            )

        for v in shared:
            key = f"__term_{v}"
            left = left.withColumn(key, _term_key(left, v))
            right = right.withColumn(key, _term_key(right, v))
            term_keys.append(key)
    drop = [c for v in shared for c in _meta_cols(v) if c in right.columns and c in left.columns]
    right = right.drop(*drop)
    if not shared:
        if how == "inner":
            return left.crossJoin(right)
        # disjoint variables are legal SPARQL for OPTIONAL / NOT EXISTS
        # too: join on a constant key — OPTIONAL extends every base row
        # per right solution (nulls when the block is empty), NOT EXISTS
        # keeps base rows iff the block has no solution
        lj = left.withColumn("__j", F.lit(1))
        rj = right.withColumn("__j", F.lit(1))
        return lj.join(rj, on="__j", how=how).drop("__j")
    if n_salts and n_salts > 1:
        l = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
        r = right.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
        return l.join(r, on=shared + term_keys + ["__salt"], how=how).drop(
            "__salt", *term_keys
        )
    return left.join(right, on=shared + term_keys, how=how).drop(*term_keys)


def bgp(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    n_salts: int | None = None,
    strict_terms: bool = False,
) -> DataFrame:
    """Basic graph pattern: conjunction of triple patterns joined on
    shared variables (the SPARQL WHERE block of e.g.
    FdpMeasure.java:34-48). ``n_salts`` applies the salted skew join to
    every pattern join; ``strict_terms`` upgrades every pattern join to
    sameTerm (value, type) semantics — see :func:`join_solutions`."""
    if not patterns:
        raise ValueError("bgp needs at least one pattern")
    out = _pattern_df(triples, patterns[0])
    for pat in patterns[1:]:
        out = join_solutions(
            out, _pattern_df(triples, pat), n_salts=n_salts, strict_terms=strict_terms
        )
    return out


def optional(
    base: DataFrame,
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> DataFrame:
    """OPTIONAL { patterns }: left join the base solutions against the
    pattern block's solutions (FdpMeasure.java:49-56)."""
    return join_solutions(base, bgp(triples, patterns), "left")


def not_exists(
    base: DataFrame,
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> DataFrame:
    """FILTER NOT EXISTS { patterns }: anti join on the shared variables
    (MultiAttributeDimension.java:56)."""
    return join_solutions(base, bgp(triples, patterns), "left_anti")


def minus(
    base: DataFrame,
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> DataFrame:
    """SPARQL 1.1 MINUS (§8.3) — the algebra member NOT EXISTS cannot
    emulate: remove a solution only when some right solution is
    COMPATIBLE with it AND the two share at least one bound variable.
    The observable splits from :func:`not_exists`:

    - a right pattern with NO variables in common removes NOTHING
      (the disjoint-domain rule; NOT EXISTS with a non-empty disjoint
      pattern removes everything) — detected statically, the base
      returns unchanged, no join at all;
    - a base row whose shared variable is UNBOUND (NULL from an
      OPTIONAL/UNION upstream) has no common bound variable with any
      right solution and therefore SURVIVES.

    One shared variable (the overwhelmingly common shape) is a plain
    anti equi-join — NULL never matches in SQL equality, which is
    exactly the unbound-survives rule, so the fast path IS the
    semantics and stays hash-joinable. The multi-variable general
    case needs per-row compatibility (every shared var NULL on a side
    or equal, plus ≥1 bound-equal pair) — a non-equi anti join whose
    right side is a bounded BGP result (broadcast); like the default
    join layer this compares object bindings lexically (o_value)."""
    right = bgp(triples, patterns)
    shared = sorted(_plain_vars(base) & _plain_vars(right))
    if not shared:
        return base
    if len(shared) == 1:
        v = shared[0]
        return base.join(
            right.select(v).distinct(), v, "left_anti"
        )
    l, r = base.alias("l"), right.alias("r")
    compat = F.lit(True)
    bound_eq = F.lit(False)
    for v in shared:
        lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
        compat = compat & (lv.isNull() | rv.isNull() | (lv == rv))
        bound_eq = bound_eq | (lv.isNotNull() & rv.isNotNull() & (lv == rv))
    return l.join(
        F.broadcast(r.select(*shared).distinct()), compat & bound_eq, "left_anti"
    ).select(*[F.col(f"l.{c}").alias(c) for c in base.columns])


def union(left: DataFrame, right: DataFrame) -> DataFrame:
    """SPARQL UNION: multiset union of two solution sets — no dedup
    (SPARQL 1.1 multiset semantics; wrap in ``.distinct()`` for the
    DISTINCT projection form). Variables bound in only one branch are
    unbound (NULL) in the other branch's rows; schema aligns by
    variable name. Narrow, shuffle-free plan — a union is a scan
    concatenation.

    Metadata alignment: a variable bound in subject/predicate
    position on one side (no ``__type`` companion) but object
    position on the other gets its companions materialized as
    ``('iri', NULL, NULL)`` BEFORE the union — NULL-padding them
    would make a later ``strict_terms`` join read the IRI rows' term
    as ``('', '', '')`` and silently drop valid sameTerm matches.

    Join caveat: this layer's DEFAULT joins follow SQL
    NULL-never-matches semantics, so joining a union result ON A
    BRANCH-EXCLUSIVE VARIABLE discards the branch that leaves it
    unbound. Either bind the shared variables in both branches (the
    scale-safe shape — the default join stays a hash equi-join), or
    opt into SPARQL 1.1's unbound-is-compatible rule with
    ``join_solutions(..., unbound_compat=True)``."""
    def _with_iri_meta(df: DataFrame, v: str) -> DataFrame:
        t, l, d = _meta_cols(v)
        return (
            df.withColumn(t, F.lit("iri"))
            .withColumn(l, F.lit(None).cast("string"))
            .withColumn(d, F.lit(None).cast("string"))
        )

    for v in sorted(_plain_vars(left) & _plain_vars(right)):
        t = _meta_cols(v)[0]
        if t not in left.columns and t in right.columns:
            left = _with_iri_meta(left, v)
        elif t in left.columns and t not in right.columns:
            right = _with_iri_meta(right, v)
    return left.unionByName(right, allowMissingColumns=True)


def values(
    base: DataFrame,
    spark: SparkSession,
    columns: list[str],
    rows: list[tuple],
) -> DataFrame:
    """SPARQL VALUES block: join base solutions against an inline
    constant table; ``None`` cells are UNDEF and match any binding
    (MultiAttributeDimension.java:38-43). The constant table is
    broadcast — it is bounded by construction."""
    vars_ = [_var(c) if _is_var(c) else c for c in columns]
    aliased = [f"v__{v}" for v in vars_]
    const = spark.createDataFrame(rows, ", ".join(f"{a} string" for a in aliased))
    cond = None
    for v, a in zip(vars_, aliased):
        if v in base.columns:
            c = F.col(a).isNull() | (F.col(a) == F.col(v))
        else:
            c = F.lit(True)
        cond = c if cond is None else (cond & c)
    joined = base.join(F.broadcast(const), cond, "inner")
    # VALUES also *binds* variables not already bound in base
    select: list[Column] = [base[c] for c in base.columns]
    for v, a in zip(vars_, aliased):
        if v not in base.columns:
            select.append(F.col(a).alias(v))
    return joined.select(*select)


def path(
    triples: DataFrame,
    start: str,
    steps: list[str | list[str] | tuple[str, ...]],
    end: str,
    end_filter: tuple[str, str] | None = None,
) -> DataFrame:
    """Property path ``start step1/step2/… end``; a ``^``-prefixed step
    traverses the edge inversely (DcatAp11ToCkanBatch.java:372:
    ``^foaf:primaryTopic/dcterms:source``), a step given as a
    LIST/TUPLE of predicates is a SPARQL alternation ``(p1|p2)`` —
    the union of the alternatives' bindings at that hop (each
    alternative may itself carry the ``^`` prefix) — and a
    ``!``-prefixed step ``!(p1|p2|…)`` is a NEGATED property set
    (SPARQL 1.1 §9.1): the hop traverses any forward edge whose
    predicate is outside the set. Returns a 2-column solution DF
    [start, end] (+ object metadata for the final forward step).

    ``end_filter=(predicate, object)`` restricts the END variable to
    subjects matching that constant pattern, pushed INTO the final hop
    (semi-restriction before the hop joins the accumulated path) — the
    selective-pattern pushdown a SPARQL optimizer applies. On a dense
    path step (e.g. an inverse hop through a small-cardinality node
    like a nation) this keeps the intermediate pair set at its filtered
    size instead of materializing every same-node pair first."""
    if not steps:
        raise ValueError("path needs at least one step")
    cur = _var(start)
    out: DataFrame | None = None
    for idx, step in enumerate(steps):
        last = idx == len(steps) - 1
        # intermediate hop vars: single leading underscore so they still
        # count as plain variables for the shared-var join (double
        # underscore marks metadata columns); dropped before returning.
        nxt = _var(end) if last else f"_hop{idx}"

        def one_alt(pred: str) -> DataFrame:
            if pred.startswith("^"):
                h = _pattern_df(triples, (f"?{nxt}", pred[1:], f"?{cur}"))
                # inverse edge: `cur` sits in object position here, but
                # the path already bound it — strip duplicate metadata.
                return h.drop(*[c for c in h.columns if c.startswith(f"{cur}__")])
            if pred.startswith("!"):
                # negated property set !(p1|p2|…) — SPARQL 1.1 §9.1:
                # the hop traverses any FORWARD edge whose predicate
                # is NOT in the set (the ^-inside-negation form is not
                # supported; spell it as an explicit inverse step).
                # Same output shape as a forward _pattern_df hop —
                # object metadata included — so downstream
                # join_solutions / filters are oblivious to negation.
                negs = [p for p in pred[1:].lstrip("(").rstrip(")").split("|") if p]
                if not negs:
                    raise ValueError("path: empty negated property set")
                t, l, d = _meta_cols(nxt)
                return triples.filter(~F.col("p").isin(negs)).select(
                    F.col("s").alias(cur),
                    F.col("o_value").alias(nxt),
                    F.col("o_type").alias(t),
                    F.col("o_lang").alias(l),
                    F.col("o_datatype").alias(d),
                )
            return _pattern_df(triples, (f"?{cur}", pred, f"?{nxt}"))

        alts = list(step) if isinstance(step, (list, tuple)) else [step]
        hop = one_alt(alts[0])
        for pred in alts[1:]:
            # union(), not bare unionByName: a mixed forward/^inverse
            # alternation binds the hop variable in object position on
            # one branch (meta companions present) and subject position
            # on the other (none) — union() materializes the
            # subject-position branch's term as ('iri', NULL, NULL), so
            # a downstream strict_terms join or lang/datatype filter
            # reads inverse-branch rows correctly instead of ('','','')
            hop = union(hop, one_alt(pred))
        if last and end_filter is not None:
            keep = _pattern_df(triples, (f"?{nxt}", end_filter[0], end_filter[1]))
            hop = join_solutions(hop, keep)
        out = hop if out is None else join_solutions(out, hop)
        cur = nxt
    assert out is not None
    return out.drop(*[c for c in out.columns if c.startswith("_hop")])


def _path_edges(triples: DataFrame, preds: list[str]) -> DataFrame:
    """Distinct (s, o) edge list of a predicate alternation,
    localCheckpoint-ed once — shared by the +/* closures so the
    triples scan and the distinct shuffle happen exactly once per
    query, not once per consumer."""
    return (
        triples.filter(F.col("p").isin(list(preds)))
        .select("s", F.col("o_value").alias("o"))
        .distinct()
        .localCheckpoint()
    )


def path_plus(
    triples: DataFrame,
    preds: list[str],
    start: str = "?s",
    end: str = "?o",
    max_iter: int = 30,
    _edges: DataFrame | None = None,
) -> DataFrame:
    """One-or-more property path ``(p1|p2|…)+``: every (start, end)
    pair connected by ≥ 1 hop over the predicate alternation — the
    SPARQL path operator beyond :func:`path`'s fixed-length chains
    (the reference's paths are all fixed-length,
    DcatAp11ToCkanBatch.java:259,372; this is the engine's extension
    for variable-depth hierarchies such as skos:broader chains).

    Semi-naive transitive closure: each round joins only the FRONTIER
    (pairs discovered last round) against the edge set, anti-joins
    away already-known pairs, and stops when nothing new appears —
    O(graph depth) rounds, each shuffling |frontier| + |edges| rows,
    never the full closure re-derived. Cycle-safe (the anti join drops
    revisits). Edge list and every round's delta are
    ``localCheckpoint``-ed so round N replays nothing of rounds
    0..N-1 — the same discipline as
    :func:`lp_etl_plugins_spark.textops.connected_components`.
    Raises after ``max_iter`` rounds without a fixpoint."""
    edges = _edges if _edges is not None else _path_edges(triples, preds)
    # explicit renames, not Dataset.alias: eager localCheckpoint of an
    # alias-resolved self-join plan trips an analyzer attribute-lookup
    # error (key not found) on Spark 4.1; renamed columns sidestep the
    # alias resolution entirely
    hop_edges = edges.select(F.col("s").alias("__es"), F.col("o").alias("__eo"))
    reach = edges
    frontier = edges
    for _ in range(max_iter):
        hop = (
            frontier.join(hop_edges, F.col("o") == F.col("__es"))
            .select("s", F.col("__eo").alias("o"))
            .distinct()
        )
        new = hop.join(reach, ["s", "o"], "left_anti").localCheckpoint()
        if new.agg(F.count(F.lit(1))).first()[0] == 0:
            break
        reach = reach.unionByName(new).localCheckpoint()
        frontier = new
    else:
        raise RuntimeError(
            f"path_plus: no fixpoint after max_iter={max_iter} rounds — the "
            f"graph has a (+)-path longer than {max_iter} hops over {preds}; "
            "pass a larger max_iter (rounds cost O(|frontier|+|edges|) each, "
            "so raising it is safe on acyclic-depth grounds)"
        )
    return reach.select(
        F.col("s").alias(_var(start)), F.col("o").alias(_var(end))
    )


def path_star(
    triples: DataFrame,
    preds: list[str],
    start: str = "?s",
    end: str = "?o",
    max_iter: int = 30,
) -> DataFrame:
    """Zero-or-more property path ``(p1|p2|…)*``: :func:`path_plus`'s
    one-or-more closure unioned with the identity pair for every node
    in the alternation's edge domain (subjects ∪ objects of the
    matching edges) — the standard SPARQL ``*`` semantics restricted
    to the predicates' node universe, which is the only domain a
    distributed engine can enumerate without a full-graph term scan.
    One extra distinct over |closure| + |nodes| rows beyond
    :func:`path_plus` (the edge list is built and checkpointed ONCE
    and shared with the + closure — no second triples scan)."""
    edges = _path_edges(triples, preds)
    plus = path_plus(triples, preds, start, end, max_iter, _edges=edges)
    nodes = (
        edges.select(F.col("s").alias("n"))
        .union(edges.select(F.col("o").alias("n")))
        .distinct()
    )
    ident = nodes.select(
        F.col("n").alias(_var(start)), F.col("n").alias(_var(end))
    )
    return plus.unionByName(ident).distinct()


def path_repeat(
    triples: DataFrame,
    preds: list[str],
    n: int,
    m: int,
    start: str = "?s",
    end: str = "?o",
    _edges: DataFrame | None = None,
) -> DataFrame:
    """Bounded path quantifier ``(p1|p2|…){n,m}``: every (start, end)
    pair connected by SOME path of length k with n ≤ k ≤ m over the
    predicate alternation — the bounded member of the path-closure
    family on the same :func:`_path_edges` machinery as ``+``/``*``
    (the quantifier appeared in the SPARQL 1.1 drafts and survives in
    several engines as an extension; the reference's paths are all
    fixed-length, which is the {k,k} special case).

    Plan: the exact-k pair set iterates k = 1..m (each round one
    equi-join of the previous round against the checkpointed edge
    list + a distinct — |pairs| ≤ |nodes|² keeps cyclic graphs
    terminating), unioned into the result for k ≥ n. ``n = 0`` adds
    the identity pair over the alternation's node universe, exactly
    :func:`path_star`'s domain convention. Rounds are checkpointed so
    round k replays nothing of rounds 1..k-1."""
    if n < 0 or m < n:
        raise ValueError(f"path_repeat: need 0 <= n <= m, got {{{n},{m}}}")
    edges = _edges if _edges is not None else _path_edges(triples, preds)
    out: DataFrame | None = None
    if m >= 1:
        hop_edges = edges.select(
            F.col("s").alias("__es"), F.col("o").alias("__eo")
        )
        cur = edges  # pairs connected by a path of length exactly k=1
        for k in range(1, m + 1):
            if k >= max(n, 1):
                out = cur if out is None else out.unionByName(cur)
            if k < m:
                cur = (
                    cur.join(hop_edges, F.col("o") == F.col("__es"))
                    .select("s", F.col("__eo").alias("o"))
                    .distinct()
                    .localCheckpoint(eager=False)
                )
    if n == 0:
        nodes = (
            edges.select(F.col("s").alias("n"))
            .union(edges.select(F.col("o").alias("n")))
            .distinct()
        )
        ident = nodes.select(F.col("n").alias("s"), F.col("n").alias("o"))
        out = ident if out is None else out.unionByName(ident)
    assert out is not None
    return out.distinct().select(
        F.col("s").alias(_var(start)), F.col("o").alias(_var(end))
    )


def lang_filter(df: DataFrame, var: str, lang: str) -> DataFrame:
    """FILTER(LANGMATCHES(LANG(?var), lang)) with SPARQL basic
    language-range semantics: the range ``en`` matches ``en`` AND
    region-subtagged forms like ``en-US`` (prefix-at-a-subtag-boundary,
    RFC 4647 §3.3.1); ``*`` matches any tagged literal. The reference's
    graphs only carry primary tags (DcatAp11ToCkanBatch.java:254,340),
    where this reduces to the exact match it previously implemented —
    but region-tagged corpora no longer silently lose bindings."""
    v = _var(var) if _is_var(var) else var
    lf = F.lower(F.col(f"{v}__lang"))
    if lang == "*":
        return df.filter(lf.isNotNull() & (lf != ""))
    want = lang.lower()
    return df.filter((lf == want) | lf.startswith(want + "-"))


def group_count(
    df: DataFrame,
    group: list[str],
    var: str,
    alias: str,
    distinct: bool = True,
) -> DataFrame:
    """SELECT group (COUNT([DISTINCT] ?var) AS alias) GROUP BY group
    (MultiAttributeDimension.java:93-99)."""
    v = _var(var) if _is_var(var) else var
    agg = F.countDistinct(v) if distinct else F.count(v)
    return df.groupBy(*[_var(g) if _is_var(g) else g for g in group]).agg(agg.alias(alias))


def scalar(
    df: DataFrame,
    group: list[str],
    var: str,
    alias: str | None = None,
) -> DataFrame:
    """Scalar subquery semantics (QueryResults.singleResult,
    DcatAp11ToCkanBatch.java:627-641): one value per group. The
    reference takes the first result in query order — nondeterministic
    under parallelism — so the engine's documented contract is
    min-by-value, which is stable and parallel-safe."""
    v = _var(var) if _is_var(var) else var
    keys = [_var(g) if _is_var(g) else g for g in group]
    return df.groupBy(*keys).agg(F.min(v).alias(alias or v))
