"""Typed view over the all-string staging layer (SURVEY.md §1.2).

The reference keeps every cell a string and lets declared ``datatype``
metadata drive downstream conversion. The Spark engine mirrors that: raw
scans are StringType; this module builds the typed view by casting each
column to the Spark type of its declared XSD datatype, with a fail-fast
guard (non-castable non-blank cell -> raise_error naming column and value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from table2qb_spark.config.columns import DATATYPE_TO_SPARK
from table2qb_spark.config.cube import CubeConfig


def typed_cast(c: Column, datatype: str | None, title: str, strict: bool = True) -> Column:
    spark_type = DATATYPE_TO_SPARK.get(datatype or "string", "string")
    if spark_type == "string":
        return c
    # try_cast, not cast: ANSI mode (Spark 4 default) would throw its own
    # error before our reference-shaped message could fire
    casted = c.try_cast(spark_type)
    if not strict:
        return casted
    blank = c.isNull() | (F.trim(c) == "")
    bad = casted.isNull() & ~blank
    msg = F.concat(
        F.lit(f'Invalid cell in column "{title}": cannot cast '),
        F.coalesce(c, F.lit("")),
        F.lit(f" to {datatype}"),
    )
    return F.when(bad, F.raise_error(msg)).otherwise(casted)


def typed_view(obs_df: DataFrame, cube_config: CubeConfig, strict: bool = True) -> DataFrame:
    """Cast transformed observations by each column's declared datatype."""
    exprs = []
    for comp in cube_config.ordered_columns():
        c = F.col(comp.name)
        exprs.append(typed_cast(c, comp.datatype, comp.title, strict).alias(comp.name))
    return obs_df.select(*exprs)
