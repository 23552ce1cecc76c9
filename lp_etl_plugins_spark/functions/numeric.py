"""Numeric scalar functions.

Reference parity:
- parse_localized_number — FdpAttribute.java:48-65 (DecimalFormat with
  configurable decimal/group separators; parse failure → null)
- money_round — FdpMeasure.java:91-92 (multiply by factor in double,
  then fixed-point HALF_UP rounding to 2 places)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_localized_number(
    col: Column | str,
    decimal_sep: str = ".",
    group_sep: str = " ",
) -> Column:
    """Parse a locale-formatted number string into a double.

    Strips every group separator, swaps the decimal separator to ``.``,
    then try_cast → double; any unparseable input yields NULL (matching
    the reference's catch-and-null at FdpAttribute.java:59-61) even when
    the session runs in ANSI mode.
    """
    col = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(col, re.escape(group_sep), "")
    if decimal_sep != ".":
        cleaned = F.replace(cleaned, F.lit(decimal_sep), F.lit("."))
    return cleaned.try_cast("double")


def money_round(col: Column | str, factor: float = 1.0) -> Column:
    """``round(value * factor, 2)`` with HALF_UP ties.

    Deviation from the reference (documented, deliberate): FdpMeasure.java:91
    rounds ``new BigDecimal(v * factor)`` — the exact binary expansion of the
    double — while Spark's ``round(double)`` uses the shortest decimal
    representation (``BigDecimal.valueOf`` semantics). They differ on
    tie-adjacent values whose shortest form reads as a tie but whose binary
    expansion sits just below it (e.g. 2.675: reference → 2.67, here → 2.68).
    The engine keeps Spark semantics: it is the common decimal-grid intent,
    stays in whole-stage codegen, and matches the DuckDB oracle."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col * F.lit(float(factor)), 2)
