"""Driver-local twin of :mod:`lp_etl_plugins_spark.graphq` for metadata graphs.

The reference runs every spec-extraction SPARQL query against an
in-memory RDF4J repository on the control thread (FdpToRdf.java:82-109)
— plan-time work never touches the data plane. The Spark-first
equivalent of that locality decision is this module: the same
solution-set semantics as ``graphq`` (bgp / optional / not_exists /
values incl. UNDEF / natural join / group_count), evaluated over a
plain Python triple list in microseconds, instead of ~30 multi-join
Spark jobs against a KB-sized DataFrame.

Use this for *metadata* (descriptor graphs, codelists small enough to
collect); use ``graphq`` for data-scale triples. Semantics are kept
aligned with ``graphq`` — see the join/null rules on
:func:`join_solutions` there: shared variables join on equality with
NULL never matching, metadata columns of shared variables are kept from
the left side, disjoint variable sets produce a cartesian product.

A solution set is a :class:`Solutions`: an explicit column list (so
empty results still know their schema, as a DataFrame would) plus rows
as dicts. Object-position variables carry ``<var>__type`` /
``<var>__lang`` / ``<var>__dt`` companions, exactly like ``graphq``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = [
    "LocalGraph",
    "Solutions",
    "bgp",
    "optional",
    "not_exists",
    "union",
    "values",
    "join_solutions",
    "group_count",
]


def _is_var(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var(term: str) -> str:
    return term[1:]


def _meta_cols(var: str) -> tuple[str, str, str]:
    return f"{var}__type", f"{var}__lang", f"{var}__dt"


class LocalGraph:
    """An indexed driver-local triple store (rows: dicts with keys
    ``s p o_value o_type o_lang o_datatype``)."""

    def __init__(self, triples: list[dict]):
        self.triples = triples
        self._by_p: dict[str, list[dict]] = {}
        for t in triples:
            self._by_p.setdefault(t["p"], []).append(t)

    def candidates(self, p: str | None) -> list[dict]:
        if p is None:
            return self.triples
        return self._by_p.get(p, [])


@dataclass
class Solutions:
    columns: list[str]
    rows: list[dict] = field(default_factory=list)

    def plain_vars(self) -> set[str]:
        return {c for c in self.columns if "__" not in c}

    def filter(self, fn) -> "Solutions":
        return Solutions(list(self.columns), [r for r in self.rows if fn(r)])

    def select(self, *cols: str) -> "Solutions":
        return Solutions(list(cols), [{c: r.get(c) for c in cols} for r in self.rows])

    def distinct(self) -> "Solutions":
        seen: set[tuple] = set()
        out: list[dict] = []
        for r in self.rows:
            key = tuple(r.get(c) for c in self.columns)
            if key not in seen:
                seen.add(key)
                out.append(r)
        return Solutions(list(self.columns), out)


def _pattern_solutions(g: LocalGraph, pattern: tuple[str, str, str]) -> Solutions:
    """One (s, p, o) pattern → solutions; mirrors graphq._pattern_df —
    including a variable repeated within the pattern (``(?x, p, ?x)``),
    which binds ONCE with the SPARQL-required consistency check
    (rows whose positions disagree are dropped, never overwritten)."""
    s, p, o = pattern
    first: dict[str, str] = {}  # var -> position of first binding
    for term, posn in ((s, "s"), (p, "p"), (o, "o")):
        if _is_var(term) and _var(term) not in first:
            first[_var(term)] = posn
    cols: list[str] = []
    for v, posn in first.items():
        cols.append(v)
        if posn == "o":
            cols += list(_meta_cols(v))
    rows: list[dict] = []
    for t in g.candidates(None if _is_var(p) else p):
        if not _is_var(s) and t["s"] != s:
            continue
        if not _is_var(o) and t["o_value"] != o:
            continue
        values = {"s": t["s"], "p": t["p"], "o": t["o_value"]}
        if any(
            values[posn] != values[first[_var(term)]]
            # sameTerm: a repeat in object position against a
            # subject/predicate first binding (always an IRI) also
            # requires the object to BE an IRI, not a literal whose
            # lexical form merely collides (mirrors graphq._pattern_df)
            or (posn == "o" and first[_var(term)] != "o" and t["o_type"] != "iri")
            for term, posn in ((s, "s"), (p, "p"), (o, "o"))
            if _is_var(term)
        ):
            continue  # repeated variable bound inconsistently
        r: dict = {}
        for v, posn in first.items():
            r[v] = values[posn]
            if posn == "o":
                mt, ml, md = _meta_cols(v)
                r[mt] = t["o_type"]
                r[ml] = t["o_lang"]
                r[md] = t["o_datatype"]
        rows.append(r)
    if not cols:
        cols = ["__matched"]
        rows = [{"__matched": 1} for _ in rows]
    return Solutions(cols, rows)


def _term_key(row: dict, v: str):
    """Effective RDF term of ``v`` in ``row`` — mirrors
    graphq.join_solutions' strict key: (type, lang, datatype) with
    null meta comparing EQUAL; s/p-position bindings (no meta
    companions) are plain IRIs by construction."""
    t, l, d = _meta_cols(v)
    if t not in row:
        return ("iri", "", "")
    return (row.get(t) or "", row.get(l) or "", row.get(d) or "")


def join_solutions(
    left: Solutions,
    right: Solutions,
    how: str = "inner",
    strict_terms: bool = False,
    unbound_compat: bool = False,
) -> Solutions:
    """Natural join on shared plain variables; NULL keys never match
    (Spark join semantics). ``how`` in inner/left/left_anti.
    ``strict_terms=True`` joins on the full RDF term — (value, type,
    lang, datatype) — mirroring ``graphq.join_solutions`` sameTerm
    semantics. ``unbound_compat=True`` mirrors the Spark layer's
    SPARQL 1.1 unbound-is-compatible inner join: a shared variable
    unbound on either side is compatible, the bound value wins, and
    metadata follows the bound side (left preferred)."""
    shared = sorted(left.plain_vars() & right.plain_vars())
    if unbound_compat:
        if how != "inner" or strict_terms:
            raise ValueError(
                "join_solutions: unbound_compat supports plain inner joins only"
            )
        out_cols = list(left.columns) + [
            c for c in right.columns if c not in left.columns
        ]
        rows = []
        for lr in left.rows:
            for rr in right.rows:
                if any(
                    lr.get(v) is not None
                    and rr.get(v) is not None
                    and lr[v] != rr[v]
                    for v in shared
                ):
                    continue
                merged = dict(rr)
                merged.update({k: v for k, v in lr.items() if v is not None})
                # meta follows the bound side: where the left binds v,
                # left meta (or the implicit IRI term) overrides
                for v in shared:
                    mt, ml, md = _meta_cols(v)
                    if lr.get(v) is not None:
                        if mt in left.columns:
                            merged[mt], merged[ml], merged[md] = lr.get(mt), lr.get(ml), lr.get(md)
                        elif mt in out_cols or mt in right.columns:
                            merged[mt], merged[ml], merged[md] = "iri", None, None
                    elif rr.get(v) is not None and mt not in right.columns and (
                        mt in out_cols
                    ):
                        merged[mt], merged[ml], merged[md] = "iri", None, None
                rows.append({c: merged.get(c) for c in out_cols})
        return Solutions(out_cols, rows)
    # metadata columns of shared vars come from the LEFT side only
    drop = {c for v in shared for c in _meta_cols(v) if c in right.columns and c in left.columns}
    r_cols = [c for c in right.columns if c not in drop]
    add_cols = [c for c in r_cols if c not in left.columns]
    out_cols = list(left.columns) + add_cols

    if not shared:
        if how == "inner":
            rows = [
                {**lr, **{c: rr.get(c) for c in add_cols}}
                for lr in left.rows
                for rr in right.rows
            ]
            return Solutions(out_cols, rows)
        # mirrors graphq.join_solutions: OPTIONAL over a disjoint block
        # extends every base row per right solution (nulls when empty);
        # NOT EXISTS keeps base rows iff the block has no solution
        if how == "left_anti":
            return Solutions(
                list(left.columns),
                [dict(lr) for lr in left.rows] if not right.rows else [],
            )
        if not right.rows:
            rows = [{**lr, **{c: None for c in add_cols}} for lr in left.rows]
        else:
            rows = [
                {**lr, **{c: rr.get(c) for c in add_cols}}
                for lr in left.rows
                for rr in right.rows
            ]
        return Solutions(out_cols, rows)

    def _key(row: dict) -> tuple:
        if strict_terms:
            return tuple((row.get(v), _term_key(row, v)) for v in shared)
        return tuple(row.get(v) for v in shared)

    def _has_null(row: dict) -> bool:
        return any(row.get(v) is None for v in shared)

    index: dict[tuple, list[dict]] = {}
    for rr in right.rows:
        if _has_null(rr):
            continue
        index.setdefault(_key(rr), []).append(rr)

    rows = []
    for lr in left.rows:
        matches = [] if _has_null(lr) else index.get(_key(lr), [])
        if how == "left_anti":
            if not matches:
                rows.append(dict(lr))
        elif matches:
            for rr in matches:
                rows.append({**lr, **{c: rr.get(c) for c in add_cols}})
        elif how == "left":
            rows.append({**lr, **{c: None for c in add_cols}})
    if how == "left_anti":
        out_cols = list(left.columns)
    return Solutions(out_cols, rows)


def bgp(
    g: LocalGraph,
    patterns: list[tuple[str, str, str]],
    strict_terms: bool = False,
) -> Solutions:
    if not patterns:
        raise ValueError("bgp needs at least one pattern")
    out = _pattern_solutions(g, patterns[0])
    for pat in patterns[1:]:
        out = join_solutions(
            out, _pattern_solutions(g, pat), strict_terms=strict_terms
        )
    return out


def union(left: Solutions, right: Solutions) -> Solutions:
    """SPARQL UNION — mirrors :func:`graphq.union`: multiset union,
    NULL-padding variables the other branch doesn't bind. A variable
    bound in s/p position on one side but object position on the
    other gets its meta companions materialized as ('iri', None,
    None) — see the Spark twin's strict_terms rationale; the same
    join caveat on branch-exclusive variables applies."""

    def _iri_meta(sols: Solutions, v: str) -> Solutions:
        mt, ml, md = _meta_cols(v)
        rows = [{**r, mt: "iri", ml: None, md: None} for r in sols.rows]
        return Solutions(list(sols.columns) + [mt, ml, md], rows)

    for v in sorted(left.plain_vars() & right.plain_vars()):
        mt = _meta_cols(v)[0]
        if mt not in left.columns and mt in right.columns:
            left = _iri_meta(left, v)
        elif mt in left.columns and mt not in right.columns:
            right = _iri_meta(right, v)
    cols = list(left.columns) + [c for c in right.columns if c not in left.columns]
    rows = [{c: r.get(c) for c in cols} for r in left.rows] + [
        {c: r.get(c) for c in cols} for r in right.rows
    ]
    return Solutions(cols, rows)


def optional(base: Solutions, g: LocalGraph, patterns: list[tuple[str, str, str]]) -> Solutions:
    return join_solutions(base, bgp(g, patterns), "left")


def not_exists(base: Solutions, g: LocalGraph, patterns: list[tuple[str, str, str]]) -> Solutions:
    return join_solutions(base, bgp(g, patterns), "left_anti")


def values(base: Solutions, columns: list[str], rows: list[tuple]) -> Solutions:
    """SPARQL VALUES incl. UNDEF (None matches any binding); binds
    variables not already bound in base — mirrors graphq.values."""
    vars_ = [_var(c) if _is_var(c) else c for c in columns]
    bound = [v for v in vars_ if v in base.columns]
    unbound = [v for v in vars_ if v not in base.columns]
    out_cols = list(base.columns) + unbound
    out: list[dict] = []
    for lr in base.rows:
        for vr in rows:
            cells = dict(zip(vars_, vr))
            if all(cells[v] is None or cells[v] == lr.get(v) for v in bound):
                out.append({**lr, **{v: cells[v] for v in unbound}})
    return Solutions(out_cols, out)


def group_count(
    sols: Solutions,
    group: list[str],
    var: str,
    alias: str,
    distinct: bool = True,
) -> Solutions:
    """COUNT([DISTINCT] ?var) GROUP BY — counts non-null values, like
    Spark's count/countDistinct."""
    v = _var(var) if _is_var(var) else var
    keys = [_var(g_) if _is_var(g_) else g_ for g_ in group]
    acc: dict[tuple, list] = {}
    for r in sols.rows:
        key = tuple(r.get(k) for k in keys)
        acc.setdefault(key, []).append(r.get(v))
    out = []
    for key, vals in acc.items():
        nn = [x for x in vals if x is not None]
        n = len(set(nn)) if distinct else len(nn)
        out.append({**dict(zip(keys, key)), alias: n})
    return Solutions(keys + [alias], out)
