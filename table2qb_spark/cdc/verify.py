"""Row/table hashing for final-state assertions (BASELINE.md correctness).

Per-row invariant: sha256 over the canonicalized row (named columns joined by
a unit separator, nulls empty). Table state compared order-insensitively by
hashing the sorted row hashes — parallel execution can never produce a stable
byte order, the *set of rows* is the invariant (SURVEY.md §4)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_sha_expr(columns: list[str]):
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


def with_row_sha(df: DataFrame, columns: list[str] | None = None, name: str = "row_sha") -> DataFrame:
    cols = columns or df.columns
    return df.withColumn(name, row_sha_expr(cols))


def table_sha256(df: DataFrame, columns: list[str] | None = None) -> str:
    """Order-insensitive table hash. The sort + concat happens on collected
    *hashes* (64 bytes/row) — for test-scale assertions; at scale compare
    per-bucket aggregate hashes instead (see bucket_shas)."""
    cols = columns or df.columns
    hashes = [r[0] for r in df.select(row_sha_expr(cols).alias("h")).collect()]
    return hashlib.sha256("".join(sorted(hashes)).encode("ascii")).hexdigest()


def bucket_shas(df: DataFrame, bucket_col: str, columns: list[str]) -> DataFrame:
    """Distributed variant: per-bucket order-insensitive digest =
    (count, sum of row-hash prefixes, xor via sum of split halves). Good for
    100TB-scale convergence checks without collecting rows."""
    h = row_sha_expr(columns)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(h, 16, 15), 16, 10).cast("decimal(38,0)")
    return df.groupBy(bucket_col).agg(
        F.count("*").alias("rows"),
        F.sum(h1).alias("digest1"),
        F.sum(h2).alias("digest2"),
    )
