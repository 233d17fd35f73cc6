"""Data-quality surface: column profiling and declarative constraint checks
(``cdc-profile`` / ``cdc-check``) — the Deequ/Great-Expectations shape over
any DataFrame, wired to the lake's masked, time-travelable ``read()``.

An ingest pipeline at 100 TB needs BOTH: profiles to see what the data IS
(null rates, cardinalities, ranges — per snapshot, so drift between two
snapshots is two profile calls and a join), and checks to assert what it
MUST BE (keys unique, columns non-null, domains closed) before a snapshot
is published — the natural companion to write-audit-publish: stage, run
``cdc-check``, publish iff everything passed.

Scale shape:
- ``profile_columns``: ONE full-scan aggregate computing every column's
  stats together (count/nulls/min/max are all partial-aggregatable;
  distinct uses HLL ``approx_count_distinct`` by default, which partial-
  aggregates in the same map-side pass — no per-column scans, no Expand).
  ``exact_distinct=True`` switches to exact ``count_distinct`` (Catalyst
  plans multi-distinct via Expand: one extra shuffle per distinct column
  group — the oracle/small-table mode, documented trade-off). The long
  (one-row-per-column) shape comes from unpivoting the single aggregate
  row with ``stack`` — a 1-row transform, never a driver loop.
- ``check_constraints``: every row-local rule (not_null / accepted /
  check) compiles to an indicator summed in the SAME single aggregate
  pass; each ``unique`` rule needs its own keyed aggregate (that is what
  uniqueness costs — one shuffle on the checked key, map-side combined).
  Results union into one tiny (n_rules)-row frame.

Rule grammar (one string per rule, engine-agnostic):
- ``not_null:col``                 — col must never be NULL
- ``unique:col1,col2``             — the tuple must be unique table-wide
- ``accepted:col:v1|v2|v3``        — col's non-null values in a closed set
- ``check:<sql boolean expr>``     — arbitrary row predicate must hold
  (NULL predicate result counts as a violation — unknown is not proof)

Reference analog: the reference validates per-cell during transform
(SURVEY.md §2 P2-P6); this is the table-level counterpart the north rule's
operational surface needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile in one scan.

    Output (one row per profiled column):
    ``column_name, n_rows, n_null, null_frac (4dp), n_distinct,
    min_value, max_value`` — min/max cast to string so every column type
    fits one schema (NULL for all-null columns).
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no such column(s): {missing}")
    distinct_of = F.count_distinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(distinct_of(F.col(c)).alias(f"__nd_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{i}"))
    one = df.agg(*aggs)

    # unpivot the single aggregate row: stack is a row-local generator, so
    # the long shape never touches the driver
    parts = ", ".join(
        f"'{c}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {parts}) AS "
            "(column_name, __nn, n_distinct, min_value, max_value)"
        ),
        F.col("__n"),
    ).select(
        "column_name",
        F.col("__n").cast("bigint").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("bigint").alias("n_null"),
        F.round(
            F.when(F.col("__n") > 0, (F.col("__n") - F.col("__nn")) / F.col("__n"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("null_frac"),
        F.col("n_distinct").cast("bigint"),
        "min_value",
        "max_value",
    )


def _parse_rule(rule: str) -> tuple[str, str]:
    kind, _, body = rule.partition(":")
    if kind not in ("not_null", "unique", "accepted", "check") or not body:
        raise ValueError(
            f"bad rule {rule!r}: expected not_null:col | unique:cols | "
            "accepted:col:v1|v2 | check:<expr>"
        )
    return kind, body


def check_constraints(df: DataFrame, rules: list[str]) -> DataFrame:
    """Evaluate declarative rules; one result row per rule:
    ``rule, violations (bigint), passed (boolean)``.

    For ``unique`` rules the violation count is rows in excess of one per
    key tuple (so 3 copies of one key = 2 violations)."""
    if not rules:
        raise ValueError("no rules given")
    row_indicators: list[tuple[str, Column]] = []
    unique_rules: list[tuple[str, list[str]]] = []
    for rule in rules:
        kind, body = _parse_rule(rule)
        if kind == "not_null":
            row_indicators.append((rule, F.col(body).isNull()))
        elif kind == "accepted":
            col, _, vals = body.partition(":")
            if not vals:
                raise ValueError(f"bad rule {rule!r}: accepted:col:v1|v2")
            allowed = [v for v in vals.split("|")]
            row_indicators.append(
                (rule, F.col(col).isNotNull() & ~F.col(col).cast("string").isin(allowed))
            )
        elif kind == "check":
            # NULL predicate = violation: unknown does not satisfy a check
            row_indicators.append((rule, ~F.coalesce(F.expr(body), F.lit(False))))
        else:  # unique
            unique_rules.append((rule, [c.strip() for c in body.split(",")]))

    results: list[DataFrame] = []
    if row_indicators:
        one = df.agg(
            *[
                F.sum(cond.cast("long")).alias(f"__v_{i}")
                for i, (_, cond) in enumerate(row_indicators)
            ]
        )
        parts = ", ".join(
            # escape single quotes so a check expr containing them survives
            "'{}', __v_{}".format(r.replace("'", "\\'"), i)
            for i, (r, _) in enumerate(row_indicators)
        )
        results.append(
            one.select(
                F.expr(
                    f"stack({len(row_indicators)}, {parts}) AS (rule, violations)"
                )
            )
        )
    for rule, key_cols in unique_rules:
        results.append(
            df.groupBy(*[F.col(c) for c in key_cols])
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.sum(F.col("__c") - 1).alias("violations"))
            .select(F.lit(rule).alias("rule"), "violations")
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0)).cast("bigint").alias("violations"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )
