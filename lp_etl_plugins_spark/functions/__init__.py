"""Scalar function library (SURVEY §2.6).

Every function here returns a Column expression built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen; the
single exception is :func:`text.slugify` (Unicode NFD normalization has
no JVM builtin) which is an Arrow-batched pandas UDF — the only
Python-row-level code in the engine.
"""

from .dates import DATE_SHAPES, classify_date_shape
from .numeric import money_round, parse_localized_number
from .rdf import format_literal, format_ntriple
from .text import fix_keyword, iri_encode, slugify

__all__ = [
    "DATE_SHAPES",
    "classify_date_shape",
    "money_round",
    "parse_localized_number",
    "format_literal",
    "format_ntriple",
    "fix_keyword",
    "iri_encode",
    "slugify",
]
