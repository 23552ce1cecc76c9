"""Date-shape classification (DateDimension.java:64-81).

The reference classifies a raw CSV date string into one of four shapes
by regex and errors on anything else; the engine returns NULL for the
error shape so callers can route invalid rows to a validation report
instead of crashing mid-job (SURVEY §1.2)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shape name → regex, in reference evaluation order (DateDimension.java:69-73)
DATE_SHAPES: tuple[tuple[str, str], ...] = (
    ("interval", r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"),
    ("day", r"^\d{4}-\d{2}-\d{2}$"),
    ("month", r"^\d{4}-\d{2}$"),
    ("year", r"^\d{4}$"),
)


def classify_date_shape(col: Column | str) -> Column:
    """4-way regex cascade → shape label; non-matching input → NULL."""
    col = F.col(col) if isinstance(col, str) else col
    expr = None
    for name, pattern in DATE_SHAPES:
        expr = (F if expr is None else expr).when(col.rlike(pattern), F.lit(name))
    return expr.otherwise(F.lit(None))
