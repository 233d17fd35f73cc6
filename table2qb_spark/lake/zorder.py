"""Z-order (Morton-curve) clustering for MULTI-column file skipping.

Sorted compaction (``compact(sort_by=[...])``) gives file-granularity
pruning on its leading sort column only: a predicate on the second column
hits every file. Z-ordering interleaves the bits of each row's per-column
quantile ranks into one clustering key, so a range predicate on ANY of the
z-ordered columns maps to a bounded region of the curve — every file's
manifest min/max (lake/skipping.py) stays tight on every participating
column at once. This is Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's z-order
rewrite strategy re-expressed over this lake format (public technique:
Morton 1966; the rank-then-interleave form is the one Delta documents).

Scale shape:

- ranks come from ``percentile_approx`` boundaries (2^bits - 1 per column,
  one map-side-combined aggregate over ONLY the z-order columns — a narrow
  column-pruned pass; GK sketch state is O(boundaries/accuracy), never
  O(rows)). Quantile ranks, not (value-min)/(max-min) scaling: a skewed
  column would otherwise collapse almost all rows into one rank and the
  curve would degenerate to a linear sort on the other columns;
- the boundary arrays land in the plan as literals (ncols x 255 doubles at
  the default 8 bits — a few KB, driver-safe by construction);
- the z-value itself is one pure Catalyst integer expression per row
  (rank lookup = filter over the sorted literal array, then bit
  interleave); the actual clustering reuses ``write_data_files``'s
  per-task ``sortWithinPartitions`` under the existing bucket exchange —
  z-ordering adds NO shuffle to the compaction rewrite.

Reference analog: none (table2qb rewrites whole CSVs); this layer exists
because a 100 TB table is read through predicates, not whole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 13 hex digits = 52 bits: the longest utf-8 big-endian prefix whose value
# is exact in a double (the percentile sketch works in doubles)
_STR_PREFIX_HEX = 13


def _order_surrogate(col: Column, dtype: T.DataType) -> Column:
    """An order-preserving DOUBLE image of the column (rank source). Strings
    map through their utf-8 prefix read as a big-endian integer —
    lexicographic order of the first 6.5 bytes survives, which is what a
    range predicate needs; equal prefixes tie (same rank: harmless, files
    just share a z-range)."""
    if isinstance(dtype, T.StringType):
        return F.conv(
            F.rpad(
                F.substring(F.hex(F.encode(col, "UTF-8")), 1, _STR_PREFIX_HEX),
                _STR_PREFIX_HEX,
                "0",
            ),
            16,
            10,
        ).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("double")  # epoch seconds
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.NumericType):
        return col.cast("double")
    raise ValueError(f"z-order does not support column type {dtype.simpleString()}")


def _rank_expr(surrogate: Column, bounds: list[float]) -> Column:
    """Quantile rank in [0, len(bounds)] — the count of boundaries strictly
    below the value. NULLs rank 0 (parquet min/max ignore nulls, so their
    placement never misleads the skipping layer)."""
    if not bounds:
        return F.lit(0)
    lit_bounds = F.array(*[F.lit(float(b)) for b in bounds])
    return F.coalesce(
        F.size(F.filter(lit_bounds, lambda b: surrogate > b)), F.lit(0)
    )


def interleave_bits(ranks: list[Column], bits_per_col: int) -> Column:
    """Morton interleave: bit j of rank k lands at position
    j * ncols + k. Total width bits_per_col * ncols <= 32 by validation in
    ``zorder_value``; returned as long."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for k, r in enumerate(ranks):
        rl = r.cast("long")
        for j in range(bits_per_col):
            z = z + F.shiftleft(F.shiftright(rl, j).bitwiseAND(F.lit(1)), j * n + k)
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    accuracy: int = 10000,
) -> Column:
    """The z-order clustering key for ``df``'s rows over ``cols``.

    Runs ONE small aggregate over the z-order columns to fit the per-column
    quantile boundaries (this is the only action; everything else is a pure
    expression). Duplicate boundaries from skewed columns are collapsed —
    heavy values then share a rank, which only widens their z-run, never
    breaks ordering."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * bits_per_col > 32:
        raise ValueError(
            f"{len(cols)} columns x {bits_per_col} bits = "
            f"{len(cols) * bits_per_col} z-bits (max 32: keep the literal "
            "boundary arrays and the per-row expression small)"
        )
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns not in DataFrame: {missing}")
    surrogates = {c: _order_surrogate(F.col(c), dtypes[c]) for c in cols}

    n_bounds = (1 << bits_per_col) - 1
    pcts = F.array(*[F.lit((i + 1) / (n_bounds + 1)) for i in range(n_bounds)])
    agg_row = df.select(
        *[
            F.percentile_approx(surrogates[c], pcts, accuracy).alias(c)
            for c in cols
        ]
    ).first()
    ranks = []
    for c in cols:
        raw = agg_row[c] or []
        # collapse skew ties; drop the Nones an all-null column yields
        bounds = sorted({float(b) for b in raw if b is not None})
        ranks.append(_rank_expr(surrogates[c], bounds))
    return interleave_bits(ranks, bits_per_col)
