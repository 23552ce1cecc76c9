"""RDF triples-as-DataFrame data model (SURVEY §1.1).

The reference keeps every metadata input as a named graph in an RDF4J
repository and queries it with SPARQL (FdpToRdf.java:82-109,
DcatAp11ToCkanBatch.java:627-679). Here a graph is a plain DataFrame with
the fixed schema :data:`TRIPLES_SCHEMA`:

    s           subject IRI (or blank-node label ``_:…``)
    p           predicate IRI
    o_value     object — IRI, bnode label, or the literal's lexical form
    o_type      'iri' | 'literal' | 'bnode'
    o_lang      language tag for lang-tagged literals, else NULL
    o_datatype  datatype IRI for typed literals, else NULL
                (plain literals carry NULL, i.e. implicit xsd:string)

Three loaders produce it:

- :func:`triples_from_turtle` — driver-side parse of a Turtle *subset*
  (exactly the features the reference fixtures use); metadata graphs are
  KBs, matching the reference's own in-memory handling, so driver-side
  parsing is the right scale trade-off.
- :func:`triples_from_ntriples` — **distributed** line-wise N-Triples
  parse via `spark.read.text` + regexp extraction: the 100 TB path. The
  reference's only large RDF flow is `.nt` passthrough
  (FdpToRdf.java:306-311).
- :func:`table_to_triples` — unpivot a relational DataFrame into triples
  with a single scan (explode of a per-row triple array, no UNION of N
  scans).

And one sink: :func:`format_ntriples` / :func:`write_ntriples` (S6,
PlainTextTripleWriter.java:27-57).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLES_COLUMNS = ("s", "p", "o_value", "o_type", "o_lang", "o_datatype")
TRIPLES_SCHEMA = (
    "s string, p string, o_value string, o_type string, o_lang string, o_datatype string"
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"

# Well-known prefixes used by the reference fixtures without declaration
# (input.ttl uses `dcat:` while only declaring `ckan:`). Declared
# @prefix directives always win over these fallbacks.
_COMMON_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
    "dcat": "http://www.w3.org/ns/dcat#",
    "dcterms": "http://purl.org/dc/terms/",
    "dct": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "adms": "http://www.w3.org/ns/adms#",
    "schema": "http://schema.org/",
    "owl": "http://www.w3.org/2002/07/owl#",
}


@dataclass(frozen=True)
class Triple:
    s: str
    p: str
    o_value: str
    o_type: str  # 'iri' | 'literal' | 'bnode'
    o_lang: str | None = None
    o_datatype: str | None = None


# ---------------------------------------------------------------------------
# Turtle subset parser (driver-side; metadata graphs only)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"\s]*>)
    | (?P<string3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<prefixdecl>@prefix\b|@base\b)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<dtsep>\^\^)
    | (?P<pname>(?:[A-Za-z_][\w\-]*)?:[\w\-%~/#.]*)
    | (?P<bnode>_:[\w\-]+)
    | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<punct>[;,.\[\]\(\)])
    | (?P<bare>[A-Za-z]+)
    """,
    re.X,
)

_STR_ESCAPES = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape(lex: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(lex):
        c = lex[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = lex[i + 1]
        if e == "u":
            out.append(chr(int(lex[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(lex[i + 2 : i + 10], 16)))
            i += 10
        else:
            out.append(_STR_ESCAPES.get(e, e))
            i += 2
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"turtle: unexpected character at offset {pos}: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind in ("ws", "comment"):
            continue
        # a pname token can swallow the statement-terminating '.', e.g.
        # `skos:Concept .` tokenizes fine but `ckan:x.` would not — split it.
        if kind == "pname" and val.endswith("."):
            val = val[:-1]
            tokens.append((kind, val))
            tokens.append(("punct", "."))
            continue
        tokens.append((kind, val))
    return tokens


class _TurtleParser:
    """Recursive-descent parser for the Turtle subset the reference
    fixtures exercise: @prefix/@base, `a`, `;`/`,` object lists, IRIs,
    prefixed names, plain/lang/typed literals, numeric and boolean
    shorthand, blank-node labels, and anonymous blank-node property
    lists ``[ p o ; … ]`` (filetypes-skos.ttl uses them for mapped
    codes), and RDF collections ``( … )`` (expanded to the standard
    rdf:first/rdf:rest/rdf:nil list encoding)."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[Triple] = []
        self._bnode_n = 0

    def _peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def _expect(self, kind: str, val: str | None = None) -> str:
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"turtle: expected {kind} {val or ''}, got {k} {v!r}")
        return v

    def _resolve_pname(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        ns = self.prefixes.get(pfx) or _COMMON_PREFIXES.get(pfx)
        if ns is None:
            raise ValueError(f"turtle: undeclared prefix {pfx!r} in {pname!r}")
        return ns + local

    def _term(self, tok: tuple[str, str]) -> tuple[str, str, str | None, str | None]:
        """→ (value, type, lang, datatype)."""
        kind, val = tok
        if kind == "iriref":
            iri = val[1:-1]
            if self.base and not re.match(r"^[A-Za-z][\w+.\-]*:", iri):
                iri = self.base + iri
            return iri, "iri", None, None
        if kind == "pname":
            return self._resolve_pname(val), "iri", None, None
        if kind == "bnode":
            return val, "bnode", None, None
        if kind in ("string", "string3"):
            lex = val[3:-3] if kind == "string3" else val[1:-1]
            lex = _unescape(lex)
            nxt = self._peek()
            if nxt and nxt[0] == "langtag":
                self._next()
                return lex, "literal", nxt[1][1:].lower(), None
            if nxt and nxt[0] == "dtsep":
                self._next()
                dt_kind, dt_val = self._next()
                if dt_kind == "iriref":
                    return lex, "literal", None, dt_val[1:-1]
                if dt_kind == "pname":
                    return lex, "literal", None, self._resolve_pname(dt_val)
                raise ValueError(f"turtle: bad datatype token {dt_val!r}")
            return lex, "literal", None, None
        if kind == "number":
            if "e" in val.lower():
                dt = XSD + "double"
            elif "." in val:
                dt = XSD + "decimal"
            else:
                dt = XSD + "integer"
            return val, "literal", None, dt
        if kind == "bare" and val in ("true", "false"):
            return val, "literal", None, XSD + "boolean"
        if kind == "punct" and val == "[":
            label = f"_:anon{self._bnode_n}"
            self._bnode_n += 1
            if self._peek() != ("punct", "]"):
                self._pred_obj_list(label)
            self._expect("punct", "]")
            return label, "bnode", None, None
        if kind == "punct" and val == "(":
            # RDF collection → rdf:first/rdf:rest chain; () is rdf:nil
            items: list[tuple[str, str, str | None, str | None]] = []
            while self._peek() != ("punct", ")"):
                if self._peek() is None:
                    raise ValueError("turtle: unterminated collection '('")
                items.append(self._term(self._next()))
            self._next()  # ')'
            if not items:
                return RDF_NS + "nil", "iri", None, None
            labels = []
            for _ in items:
                labels.append(f"_:anon{self._bnode_n}")
                self._bnode_n += 1
            for idx, (label, (ov, ot, ol, od)) in enumerate(zip(labels, items)):
                self.triples.append(Triple(label, RDF_NS + "first", ov, ot, ol, od))
                rest = labels[idx + 1] if idx + 1 < len(labels) else RDF_NS + "nil"
                rest_type = "bnode" if idx + 1 < len(labels) else "iri"
                self.triples.append(Triple(label, RDF_NS + "rest", rest, rest_type))
            return labels[0], "bnode", None, None
        raise ValueError(f"turtle: unexpected term token {kind} {val!r}")

    def parse(self) -> list[Triple]:
        while self._peek() is not None:
            kind, val = self._peek()
            if kind == "prefixdecl":
                self._next()
                if val == "@prefix":
                    pname = self._expect("pname")
                    iri = self._expect("iriref")
                    self.prefixes[pname.rstrip(":").split(":")[0]] = iri[1:-1]
                else:  # @base
                    iri = self._expect("iriref")
                    self.base = iri[1:-1]
                self._expect("punct", ".")
                continue
            self._statement()
        return self.triples

    def _statement(self) -> None:
        subj, s_type, _, _ = self._term(self._next())
        if s_type == "literal":
            raise ValueError("turtle: literal subject")
        self._pred_obj_list(subj)
        self._expect("punct", ".")

    def _pred_obj_list(self, subj: str) -> None:
        """predicate-object list; stops *before* the terminating '.' or
        ']' (the caller consumes it)."""
        while True:
            kind, val = self._next()
            if kind == "bare" and val == "a":
                pred = RDF_TYPE
            elif kind == "iriref":
                pred = val[1:-1]
            elif kind == "pname":
                pred = self._resolve_pname(val)
            else:
                raise ValueError(f"turtle: bad predicate token {kind} {val!r}")
            while True:
                o_value, o_type, o_lang, o_dt = self._term(self._next())
                self.triples.append(Triple(subj, pred, o_value, o_type, o_lang, o_dt))
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            nxt = self._peek()
            if nxt == ("punct", ";"):
                self._next()
                # tolerate dangling ';' before the block terminator
                if self._peek() in (("punct", "."), ("punct", "]")):
                    return
                continue
            if nxt in (("punct", "."), ("punct", "]")):
                return
            raise ValueError(f"turtle: expected ';' ',' '.' or ']', got {nxt!r}")


def parse_turtle(text: str) -> list[Triple]:
    """Parse Turtle text (subset, see :class:`_TurtleParser`) → triples."""
    return _TurtleParser(text).parse()


def triples_from_turtle(spark: SparkSession, path_or_text: str) -> DataFrame:
    """Driver-side Turtle → triples DataFrame (metadata graphs are KBs —
    same locality decision as the reference's in-memory RDF4J repo)."""
    import os

    text = (
        open(path_or_text, encoding="utf-8").read()
        if os.path.exists(path_or_text)
        else path_or_text
    )
    rows = [(t.s, t.p, t.o_value, t.o_type, t.o_lang, t.o_datatype) for t in parse_turtle(text)]
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


# ---------------------------------------------------------------------------
# Distributed N-Triples parse (the scale path)
# ---------------------------------------------------------------------------

# <s> <p> o .   where o = <iri> | _:bnode | "lexical"(@lang | ^^<dt>)?
# (?s) because Java regex treats U+0085/U+2028/U+2029 as line terminators
# that `.` will not match by default — a literal containing a raw NEL/LS/PS
# (legal per the NT grammar) must still match, or the row is silently lost.
_NT_LINE = r'(?s)^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$'


def _escape_raw_controls(col: Column) -> Column:
    """Rewrite raw C0 control chars to their \\u00XX escape JVM-side.

    The NT grammar only forbids `" \\ LF CR` raw, so the rest of the C0
    range may appear unescaped in a literal — but those bytes are illegal
    raw inside JSON strings (and hostile to downstream line tooling).
    One regexp_replace per code point, all inside whole-stage codegen.
    """
    for c in range(0x20):
        # pattern is the Java-regex hex escape \xHH (no raw control byte
        # in the pattern); replacement emits the literal text \u00HH
        col = F.regexp_replace(col, "\\x%02X" % c, "\\\\u%04X" % c)
    return col


def _json_unescape(col: Column) -> Column:
    """Unescape an N-Triples literal lexical form JVM-side.

    N-Triples string escapes (\\\\ \\" \\n \\r \\t \\uXXXX) are a subset of
    JSON string escapes, so wrapping the raw lexical form as a one-element
    JSON array and parsing it decodes them without any Python-side row
    code (Spark 4's from_json requires a container schema). Raw C0
    controls — legal in NT strings, illegal in JSON — are pre-escaped so
    from_json can't silently null the row. (\\UXXXXXXXX 8-hex escapes are
    not JSON; they do not occur in the reference's outputs, which never
    escape beyond the BMP.)
    """
    col = _escape_raw_controls(col)
    return F.from_json(F.concat(F.lit('["'), col, F.lit('"]')), "array<string>")[0]


def triples_from_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed N-Triples reader: one task per input split, pure
    regexp extraction (whole-stage codegen, no shuffle, no UDF).

    Malformed / comment / blank lines are dropped, matching the
    reference's passthrough tolerance (FdpToRdf.java:306-311 copies
    bytes without validating).
    """
    raw = spark.read.text(path)
    m = F.regexp_extract("value", _NT_LINE, 1).alias("s_raw")
    p = F.regexp_extract("value", _NT_LINE, 2).alias("p")
    o = F.regexp_extract("value", _NT_LINE, 3).alias("o_raw")
    parsed = raw.select(m, p, o).filter((F.col("p") != "") & (F.col("o_raw") != ""))
    s = F.when(
        F.col("s_raw").startswith("<"),
        F.expr("substring(s_raw, 2, length(s_raw) - 2)"),
    ).otherwise(F.col("s_raw"))
    is_iri = F.col("o_raw").startswith("<")
    is_bnode = F.col("o_raw").startswith("_:")
    # (?s): see _NT_LINE — `\\.` must match an escaped U+0085/U+2028/U+2029
    lex = F.regexp_extract("o_raw", r'(?s)^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract("o_raw", r'(?s)^"(?:[^"\\]|\\.)*"@([A-Za-z][A-Za-z0-9\-]*)\s*$', 1)
    dtype = F.regexp_extract("o_raw", r'(?s)^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>\s*$', 1)
    return parsed.select(
        s.alias("s"),
        F.col("p"),
        F.when(is_iri, F.expr("substring(o_raw, 2, length(o_raw) - 2)"))
        .when(is_bnode, F.col("o_raw"))
        .otherwise(_json_unescape(lex))
        .alias("o_value"),
        F.when(is_iri, F.lit("iri")).when(is_bnode, F.lit("bnode")).otherwise(F.lit("literal")).alias("o_type"),
        F.when(~is_iri & ~is_bnode & (lang != ""), F.lower(lang)).alias("o_lang"),
        F.when(~is_iri & ~is_bnode & (dtype != ""), dtype).alias("o_datatype"),
    )


# ---------------------------------------------------------------------------
# N-Triples sink (S6 — PlainTextTripleWriter.java:27-57)
# ---------------------------------------------------------------------------


def _nt_escape(col: Column) -> Column:
    """Escape a literal lexical form for N-Triples output. Order matters:
    backslash first, then quote/newline/CR/tab, then the remaining C0
    controls as \\u00XX (legal raw per the grammar, but raw controls
    break line-oriented consumers and the JSON-decode read path) —
    all JVM-side. U+0085/U+2028/U+2029 are also escaped: Java regex (and
    many line-oriented tools) treat them as line terminators, so leaving
    them raw makes the written line unreadable by the distributed reader."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    for cp in (0x85, 0x2028, 0x2029):
        out = F.regexp_replace(out, "\\x{%04X}" % cp, "\\\\u%04X" % cp)
    return _escape_raw_controls(out)


def format_ntriples(triples: DataFrame, column_name: str = "line") -> DataFrame:
    """Triples DF → single-column DF of N-Triples lines.

    Literal formatting parity with PlainTextTripleWriter.java:31-40:
    quoted lexical form, then ``@lang`` or ``^^<datatype>`` when present.
    """
    obj = (
        F.when(F.col("o_type") == "iri", F.concat(F.lit("<"), F.col("o_value"), F.lit(">")))
        .when(F.col("o_type") == "bnode", F.col("o_value"))
        .otherwise(
            F.concat(
                F.lit('"'),
                _nt_escape(F.col("o_value")),
                F.lit('"'),
                # lang tags are lowercased on parse (RDF 1.1 value space);
                # lowercase on write too so format∘parse is the identity
                F.when(
                    F.col("o_lang").isNotNull(),
                    F.concat(F.lit("@"), F.lower(F.col("o_lang"))),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("o_datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("o_datatype"), F.lit(">")),
                ).otherwise(F.lit("")),
            )
        )
    )
    subj = F.when(F.col("s").startswith("_:"), F.col("s")).otherwise(
        F.concat(F.lit("<"), F.col("s"), F.lit(">"))
    )
    return triples.select(
        F.concat(subj, F.lit(" <"), F.col("p"), F.lit("> "), obj, F.lit(" .")).alias(column_name)
    )


def write_ntriples(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """Write triples as ``.nt``. ``single_file=True`` mirrors the
    reference's one-output-file behavior (coalesce(1) — only for small
    outputs; the distributed default writes one part per partition)."""
    lines = format_ntriples(triples, "value")
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def write_triples_repo(
    triples: DataFrame, path: str, batch_statements: int = 50_000
) -> None:
    """S7 — buffered RDF-repo sink, Spark-first.

    The reference buffers statements and flushes them into an RDF
    repository in bounded batches (50,000 statements, flush at 90%
    fill on row end, flush at file end — ``BufferedOutput.java:19,
    41-45,52-55,63-68``; dead code behind ``StatementConsumer.java:
    12-25``, re-expressed here so the surface is complete). In this
    engine the repo substrate IS the triples table, so the batching
    semantics map onto the writer, not a driver-side buffer:

    - one flushed batch = one parquet file of at most
      ``batch_statements`` rows (``maxRecordsPerFile`` — executors
      roll files at the bound, the distributed equivalent of the
      flush-at-90%-fill row loop);
    - flush-at-file-end = the write job's commit protocol (no
      partial batch is ever visible — stronger than the reference,
      whose partial flushes were non-transactional).

    Read back with :func:`read_triples_repo`."""
    (
        triples.select("s", "p", "o_value", "o_type", "o_lang", "o_datatype")
        .write.option("maxRecordsPerFile", batch_statements)
        .mode("overwrite")
        .parquet(path)
    )


def read_triples_repo(spark: SparkSession, path: str) -> DataFrame:
    """Load a triples table written by :func:`write_triples_repo`."""
    return spark.read.parquet(path).select(
        "s", "p", "o_value", "o_type", "o_lang", "o_datatype"
    )


# ---------------------------------------------------------------------------
# Relational → triples unpivot (single scan, explode of a triple array)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TripleMapping:
    """One emitted predicate per input row: object drawn from ``column``
    (already a string Column or column name), typed as iri/literal."""

    predicate: str
    column: Column | str
    o_type: str = "literal"  # 'iri' | 'literal'
    lang: Column | str | None = None
    datatype: str | None = None


def table_to_triples(
    df: DataFrame,
    subject: Column,
    mappings: list[TripleMapping],
    branched: bool = False,
) -> DataFrame:
    """Unpivot a relational DataFrame into the triples schema.

    Two physical strategies with the same result:

    - default (``branched=False``): ONE scan, per row an array of
      (p, o_value, …) structs, explode, drop nulls — the right shape
      for materializing a triples table (narrow, no repeated scans);
    - ``branched=True``: one column-pruned select per mapping unioned
      together. Each branch carries its predicate as a LITERAL, so a
      downstream ``filter(p == '…')`` constant-folds contradictory
      branches to empty relations — queries over the unpivot then scan
      only the tables/columns they actually touch. The right shape when
      querying the unpivot directly instead of materializing it.

    Empty ``mappings`` is rejected up front — the two strategies would
    otherwise disagree (IndexError vs an empty explode)."""
    if not mappings:
        raise ValueError("table_to_triples: mappings must be non-empty")
    if branched:
        branches = []
        for m in mappings:
            obj = F.col(m.column) if isinstance(m.column, str) else m.column
            lang = (
                F.lit(None).cast("string")
                if m.lang is None
                else (F.col(m.lang) if isinstance(m.lang, str) else m.lang)
            )
            branches.append(
                df.select(
                    subject.alias("s"),
                    F.lit(m.predicate).alias("p"),
                    obj.cast("string").alias("o_value"),
                    F.lit(m.o_type).alias("o_type"),
                    lang.cast("string").alias("o_lang"),
                    F.lit(m.datatype).cast("string").alias("o_datatype"),
                ).filter(F.col("o_value").isNotNull())
            )
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out
    structs = []
    for m in mappings:
        obj = F.col(m.column) if isinstance(m.column, str) else m.column
        lang = (
            F.lit(None).cast("string")
            if m.lang is None
            else (F.col(m.lang) if isinstance(m.lang, str) else m.lang)
        )
        structs.append(
            F.struct(
                F.lit(m.predicate).alias("p"),
                obj.cast("string").alias("o_value"),
                F.lit(m.o_type).alias("o_type"),
                lang.cast("string").alias("o_lang"),
                F.lit(m.datatype).cast("string").alias("o_datatype"),
            )
        )
    exploded = df.select(
        subject.alias("s"), F.explode(F.array(*structs)).alias("t")
    )
    return exploded.select(
        "s", "t.p", "t.o_value", "t.o_type", "t.o_lang", "t.o_datatype"
    ).filter(F.col("o_value").isNotNull())
