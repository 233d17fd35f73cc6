"""Row/table hashing for final-state assertions (BASELINE.md correctness).

Per-row invariant: sha256 over the canonicalized row (named columns joined by
a unit separator, nulls empty). Table state compared order-insensitively —
parallel execution can never produce a stable byte order, the *set of rows*
is the invariant (SURVEY.md §4).

The table digest is fully distributed (round-3 verdict #7): instead of
collecting every row hash and sorting (a driver bottleneck on a 10^10-row
state), each row's sha256 is split into four 15-hex-digit chunks whose
per-chunk SUMS (order-insensitive, commutative) are aggregated JVM-side; the
digest is the sha256 of ``count|sum1|sum2|sum3|sum4``. Sums use
decimal(38,0): a chunk is < 16^15 ≈ 1.2e18, so even 10^19 rows stay within
38 digits — no overflow at any realistic scale. Driver memory is O(1).
The single-threaded Python oracle (datagen/oracle.py) computes the identical
digest, so distributed state and oracle state remain directly comparable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4 chunks x 15 hex digits = 240 of the 256 hash bits feed the digest
_N_CHUNKS = 4
_CHUNK_HEX = 15


def row_sha_expr(columns: list[str]):
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


def with_row_sha(df: DataFrame, columns: list[str] | None = None, name: str = "row_sha") -> DataFrame:
    cols = columns or df.columns
    return df.withColumn(name, row_sha_expr(cols))


def _chunk_sum_exprs(h):
    return [
        F.sum(
            F.conv(F.substring(h, 1 + _CHUNK_HEX * i, _CHUNK_HEX), 16, 10).cast(
                "decimal(38,0)"
            )
        ).alias(f"s{i}")
        for i in range(_N_CHUNKS)
    ]


def digest_of_sums(count: int, sums: list[int]) -> str:
    """sha256 over the aggregate tuple — shared by the Spark path here and
    the Python oracle (datagen/oracle.py)."""
    payload = "|".join([str(count)] + [str(s) for s in sums])
    return hashlib.sha256(payload.encode("ascii")).hexdigest()


def table_sha256(df: DataFrame, columns: list[str] | None = None) -> str:
    """Order-insensitive table digest, computed with ONE distributed
    aggregate (partial map-side combine, O(1) driver memory)."""
    cols = columns or df.columns
    h = row_sha_expr(cols)
    r = df.agg(F.count("*").alias("n"), *_chunk_sum_exprs(h)).first()
    sums = [int(r[f"s{i}"]) if r[f"s{i}"] is not None else 0 for i in range(_N_CHUNKS)]
    return digest_of_sums(r["n"], sums)


def bucket_shas(df: DataFrame, bucket_col: str, columns: list[str]) -> DataFrame:
    """Per-bucket variant of the same digest — localizes a divergence to the
    bucket(s) whose sums differ without re-reading the whole table."""
    h = row_sha_expr(columns)
    return df.groupBy(bucket_col).agg(
        F.count("*").alias("rows"), *_chunk_sum_exprs(h)
    )
