"""String/text scalar functions.

Reference parity:
- fix_keyword  — DcatAp11ToCkanBatch.java:75-82 (strip ``,.``; map
  ``/:;`` → ``-``; ``§`` → ``paragraf``)
- slugify      — DcatAp11ToCkanBatch.java:273-277 (NFD normalize, strip
  non-ASCII, whitespace/dot → ``-``, lowercase)
- iri_encode   — FdpDimension.java:106-115 (space → ``-`` then URL-encode)
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def fix_keyword(col: Column | str) -> Column:
    """Sanitize a keyword: delete ``,`` and ``.``, map ``/ : ;`` to ``-``,
    spell out ``§`` as ``paragraf``. Pure ``translate``/``replace`` chain —
    JVM-side, codegen-friendly."""
    col = F.col(col) if isinstance(col, str) else col
    # translate: positional mapping; chars in `matching` beyond the length
    # of `replace` are deleted → "/:;" → "-", ",." deleted.
    return F.replace(F.translate(col, "/:;,.", "---"), F.lit("§"), F.lit("paragraf"))


def iri_encode(col: Column | str) -> Column:
    """URL-encode a key value for IRI construction, spaces first mapped
    to ``-`` (FdpDimension.java:106-115). ``url_encode`` is JVM-side."""
    col = F.col(col) if isinstance(col, str) else col
    return F.url_encode(F.replace(col, F.lit(" "), F.lit("-")))


# StringType() instance (not a DDL string) so the UDF can be defined at
# import time without an active SparkSession.
@pandas_udf(StringType())
def _slugify_udf(s: pd.Series) -> pd.Series:
    def one(v: str | None) -> str | None:
        if v is None:
            return None
        # NFD-decompose, drop combining marks / non-ASCII, then kebab-case.
        decomposed = unicodedata.normalize("NFD", v)
        ascii_only = "".join(c for c in decomposed if ord(c) < 128 and not unicodedata.combining(c))
        out = []
        for c in ascii_only:
            out.append("-" if c.isspace() or c == "." else c)
        return "".join(out).lower()

    return s.map(one)


def slugify(col: Column | str) -> Column:
    """Unicode slug (organization-name slugify). Arrow-batched pandas UDF —
    the engine's only Python-side scalar (no JVM NFD builtin exists)."""
    col = F.col(col) if isinstance(col, str) else col
    return _slugify_udf(col)
