"""Small pipeline utilities.

``observe_rows`` is the engine's A6 (progress counting,
DcatAp11ToCkanBatch.java:192,608 / CkanPurger.java:45): Spark's
Observation API attaches a metric to the plan that materializes with
the action — progress without a second pass or an accumulator UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_rows(df: DataFrame, name: str = "progress") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation; read ``obs.get['rows']`` after
    the first action on the returned frame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
