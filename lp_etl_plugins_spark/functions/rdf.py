"""N-Triples serialization expressions (PlainTextTripleWriter.java:27-57).

Formats triples rows into N-Triples lines entirely with JVM expressions
(``format_string`` + ``when``) so a 100 TB triples DataFrame serializes
inside whole-stage codegen with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    r"""N-Triples literal escaping: backslash, quote, newline, CR, tab."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def format_literal(
    value: Column,
    lang: Column | None = None,
    datatype: Column | None = None,
) -> Column:
    """``"value"``, ``"value"@lang`` or ``"value"^^<datatype>`` —
    lang wins over datatype when both present (RDF 1.1 semantics)."""
    base = F.concat(F.lit('"'), _escape_literal(value), F.lit('"'))
    result = base
    if datatype is not None:
        result = F.when(
            datatype.isNotNull(), F.concat(base, F.lit("^^<"), datatype, F.lit(">"))
        ).otherwise(result)
    if lang is not None:
        result = F.when(lang.isNotNull(), F.concat(base, F.lit("@"), lang)).otherwise(result)
    return result


def format_ntriple(
    s: Column,
    p: Column,
    o_value: Column,
    o_kind: Column | None = None,
    o_lang: Column | None = None,
    o_datatype: Column | None = None,
) -> Column:
    """One N-Triples line ``<s> <p> o .`` — object rendered as IRI when
    ``o_kind == 'iri'``, blank node when ``'bnode'``, else literal."""
    literal = format_literal(o_value, o_lang, o_datatype)
    if o_kind is None:
        obj = literal
    else:
        obj = (
            F.when(o_kind == "iri", F.concat(F.lit("<"), o_value, F.lit(">")))
            .when(o_kind == "bnode", o_value)
            .otherwise(literal)
        )
    return F.format_string("<%s> <%s> %s .", s, p, obj)
