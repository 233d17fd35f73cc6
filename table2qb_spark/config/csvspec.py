"""Column-spec-driven CSV reading — the reference's ``csv.clj`` re-expressed.

Reference semantics:
- header validation (duplicates / missing-required / unknown):
  src/table2qb/csv.clj:77-109 (``validate-header``)
- per-cell validate + transform: csv.clj:115-140 — validators run for their
  side effect only (return values discarded); the optional ``transform``
  produces the effective value
- optional-column defaults (literal or derived from the partial row):
  csv.clj:60-75, 111-113
- validators: csv.clj:179-214 (not-blank, optional, one-of, mapping)
- BOM stripping: csv.clj:33-35

Two execution paths, chosen by data size (this mirrors the reference's own
split between eagerly-read config CSVs and lazily-streamed observation CSVs,
csv.clj:37-41 vs csv.clj:142-163):

* **Driver path** (``read_records``): plain-Python parse of *small* inputs —
  columns configs, codelists, components. Exact fail-fast error messages with
  row numbers, message-parity with the reference. These tables are
  subsequently broadcast, so driver-side parsing is the idiomatic Spark
  design, not a shortcut.

* **Distributed path** (``records_df`` / ``build_select_exprs``): for big
  tables the specs compile to ONE generated ``select()`` of Catalyst
  expressions — validators become ``F.when(bad, F.raise_error(...))`` guards,
  transforms become column expressions, defaults become literals/derived
  expressions. No per-row Python anywhere.
"""

from __future__ import annotations

import csv as _csv
import io
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from table2qb_spark.errors import (
    CellValidationError,
    HeaderValidationError,
    cell_enum_validation_message,
    cell_validation_message,
    throw_cell_validation_error,
)

# ---------------------------------------------------------------------------
# Validators (check-only) — paired driver (py) + Catalyst (expr) forms
# ---------------------------------------------------------------------------


def _is_blank(s: str | None) -> bool:
    return s is None or s.strip() == ""


def blank_expr(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


ROW_ORDINAL = "__row_ordinal"


def row_ordinal_col() -> Column:
    """Distributed 1-based data-row ordinal for fail-fast cell errors —
    row-context parity with the reference's driver-side messages
    (csv.clj:166-177, "row N, column T").

    Derived from ``monotonically_increasing_id`` (partition id in the upper
    bits, row-in-partition in the lower 33): exact for single-split scans
    (split 0 follows the header line, so ordinal == the reference's 1-based
    data row number — true for every config CSV and all bundled examples);
    a multi-split scan reports the within-split ordinal plus the split id,
    which still pins the failing line without any extra pass over the data.

    MUST be materialized as its own column (withColumn) BEFORE the validating
    select — referenced directly inside the raise_error branch it would only
    evaluate (and increment) on bad rows, counting errors instead of rows.
    Being nondeterministic, the extra projection is protected from
    CollapseProject, so the ordinal is evaluated exactly once per row."""
    pid = F.spark_partition_id()
    k = (F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)) + 1).cast(
        "string"
    )
    return F.when(pid == 0, k).otherwise(
        F.concat(k, F.format_string(" (split %d)", pid))
    )


def _msg_col(title: str, msg, row: Column | None) -> Column:
    """Error-message column in the reference's cell-message shape
    (csv.clj:166-168): 'Invalid cell in column "T", row N: msg'. Without row
    context the row clause is omitted. ``msg`` may be a str or a Column."""
    msg_c = msg if isinstance(msg, Column) else F.lit(msg)
    if row is None:
        return F.concat(F.lit(f'Invalid cell in column "{title}": '), msg_c)
    return F.concat(
        F.lit(f'Invalid cell in column "{title}", row '), row, F.lit(": "), msg_c
    )


@dataclass(frozen=True)
class Validator:
    """py(row_number, title, value): raise CellValidationError on bad cell.
    expr(col, title, row=None): pass-through Column guarded with raise_error;
    ``row`` is an optional row-ordinal Column for the error message."""

    name: str
    py: Callable
    expr: Callable


def _not_blank_py(row_num, title, s):
    if _is_blank(s):
        throw_cell_validation_error(row_num, title, "Value cannot be blank")


def _not_blank_expr(c: Column, title: str, row: Column | None = None) -> Column:
    msg = _msg_col(title, "Value cannot be blank", row)
    return F.when(blank_expr(c), F.raise_error(msg)).otherwise(c)


validate_not_blank = Validator("not-blank", _not_blank_py, _not_blank_expr)


def validate_one_of(options: set[str]) -> Validator:
    opts = sorted(options)

    def py(row_num, title, s):
        if s not in options:
            raise CellValidationError(
                cell_enum_validation_message(row_num, title, opts), {"options": opts}
            )

    def expr(c: Column, title: str, row: Column | None = None) -> Column:
        msg = _msg_col(title, "Expected one of: " + ", ".join(opts), row)
        return F.when(c.isin(opts), c).otherwise(F.raise_error(msg))

    return Validator("one-of", py, expr)


def validate_integer() -> Validator:
    """Parseable integer; value kept as string (codelist.clj:100-104)."""

    def py(row_num, title, s):
        try:
            int(s)
        except (TypeError, ValueError):
            throw_cell_validation_error(
                row_num, title, f"Invalid integer {s}", {"value": s}
            )

    def expr(c: Column, title: str, row: Column | None = None) -> Column:
        bad = c.cast("long").isNull()
        msg = _msg_col(
            title, F.concat(F.lit("Invalid integer "), F.coalesce(c, F.lit(""))), row
        )
        return F.when(bad, F.raise_error(msg)).otherwise(c)

    return Validator("integer", py, expr)


def optional(v: Validator) -> Validator:
    """Blank cells skip validation (csv.clj:186-195)."""

    def py(row_num, title, s):
        if not _is_blank(s):
            v.py(row_num, title, s)

    def expr(c: Column, title: str, row: Column | None = None) -> Column:
        return F.when(blank_expr(c), c).otherwise(v.expr(c, title, row))

    return Validator(f"optional({v.name})", py, expr)


# ---------------------------------------------------------------------------
# Transforms (value-resolving) — paired forms
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Transform:
    """py(row_number, title, value) -> value;
    expr(col, title, row=None) -> Column."""

    name: str
    py: Callable
    expr: Callable


def mapping_transform(mapping: dict, names: dict | None = None) -> Transform:
    """Cell must be a key of the map; resolves to the mapped value
    (csv.clj:206-214, used as a transform at configuration/column.clj:109-111).
    ``names`` optionally maps keys to representable values for the expr form
    (when mapped values are functions, the expr form keeps the key name)."""
    keys = list(mapping)

    def py(row_num, title, s):
        if s not in mapping:
            raise CellValidationError(
                cell_enum_validation_message(row_num, title, keys), {"options": keys}
            )
        return mapping[s]

    def expr(c: Column, title: str, row: Column | None = None) -> Column:
        msg = _msg_col(title, "Expected one of: " + ", ".join(keys), row)
        reps = names or {k: str(mapping[k]) for k in keys}
        mapped = F.create_map(*[x for k in keys for x in (F.lit(k), F.lit(reps[k]))])
        return F.when(c.isin(keys), F.element_at(mapped, c)).otherwise(
            F.raise_error(msg)
        )

    return Transform("mapping", py, expr)


def optional_transform(t: Transform, default=None) -> Transform:
    """Blank -> default; else apply transform (csv.clj:186-195)."""

    def py(row_num, title, s):
        if _is_blank(s):
            return default
        return t.py(row_num, title, s)

    def expr(c: Column, title: str, row: Column | None = None) -> Column:
        return F.when(blank_expr(c), F.lit(default)).otherwise(t.expr(c, title, row))

    return Transform(f"optional({t.name})", py, expr)


def fn_transform(name: str, py_fn: Callable, expr_fn: Callable) -> Transform:
    """Lift plain (str)->str / (Column)->Column functions to a Transform."""
    return Transform(
        name,
        lambda row_num, title, s: py_fn(s),
        lambda c, title, row=None: expr_fn(c),
    )


def check_transform(name: str, py_fn: Callable, expr_fn: Callable) -> Transform:
    """Lift (row_num, title, value)->value / (Column, title, row)->Column
    checks."""
    return Transform(name, py_fn, expr_fn)


# ---------------------------------------------------------------------------
# Column specification
# ---------------------------------------------------------------------------


@dataclass
class ColumnSpec:
    """One input-CSV column (reference ::Column spec, csv.clj:43-50)."""

    title: str
    key: str
    required: bool = False
    validators: list[Validator] = field(default_factory=list)
    transform: Transform | None = None
    # default when the column is absent from the input: literal string, plus
    # optional derived forms (row-dict -> str / col-dict -> Column)
    default: str | None = None
    default_py: Callable | None = None
    default_expr: Callable | None = None

    @property
    def has_default(self) -> bool:
        return (
            self.default is not None
            or self.default_py is not None
            or self.default_expr is not None
        )


def validate_header(header_row: list[str], specs: list[ColumnSpec]) -> None:
    """Duplicates / missing-required / unknown — csv.clj:77-109."""
    titles = {s.title for s in specs}
    required = {s.title for s in specs if s.required}
    declared = set(header_row)

    seen: set[str] = set()
    dupes = []
    for h in header_row:
        if h in seen and h not in dupes:
            dupes.append(h)
        seen.add(h)
    if dupes:
        raise HeaderValidationError(
            "Duplicate column headers: " + ", ".join(dupes),
            {"type": "duplicate-csv-columns", "duplicate_columns": dupes},
        )

    missing = required - declared
    if missing:
        quoted = ",".join(f'"{h}"' for h in header_row)
        raise HeaderValidationError(
            f"Missing required columns: {', '.join(sorted(missing))}.\nFound columns: {quoted}",
            {"type": "missing-csv-columns", "missing_columns": missing},
        )

    unknown = declared - titles
    if unknown:
        quoted = ",".join(f'"{h}"' for h in sorted(unknown))
        raise HeaderValidationError(
            "Unexpected columns: " + quoted,
            {"type": "unknown-csv-columns", "unknown_columns": unknown},
        )


# ---------------------------------------------------------------------------
# Driver path (small configs; exact row-numbered errors)
# ---------------------------------------------------------------------------


def _open_csv_text(source: str) -> io.TextIOBase:
    """source is a filesystem path or literal CSV content; BOM stripped."""
    if "\n" not in source and os.path.exists(source):
        return open(source, "r", encoding="utf-8-sig", newline="")
    return io.StringIO(source.lstrip("﻿"))


def read_records(source: str, specs: list[ColumnSpec]) -> list[dict]:
    """Eager, validated read of a small CSV (csv.clj:142-163 semantics).

    ``source``: path to a CSV file, or literal CSV text.
    """
    f = _open_csv_text(source)
    with f:
        rows = list(_csv.reader(f))
    if not rows:
        raise HeaderValidationError("No header row found")
    header, data = rows[0], rows[1:]
    validate_header(header, specs)
    by_title = {s.title: s for s in specs}
    ordered = [by_title[h] for h in header]
    missing_optional = [s for s in specs if s.title not in set(header) and s.has_default]

    out: list[dict] = []
    for i, cells in enumerate(data):
        if not cells:
            cells = [""]  # blank line parses as one empty cell (clojure.data.csv)
        row_num = i + 1  # reference numbers data rows from 1 (csv.clj:131-136)
        rec: dict = {}
        for spec, raw in zip(ordered, cells):
            for v in spec.validators:
                v.py(row_num, spec.title, raw)
            rec[spec.key] = (
                spec.transform.py(row_num, spec.title, raw) if spec.transform else raw
            )
        for spec in missing_optional:
            if spec.default_py is not None:
                rec[spec.key] = spec.default_py(rec)
            else:
                rec[spec.key] = spec.default
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# Distributed path (one generated select(); no per-row Python)
# ---------------------------------------------------------------------------


def build_select_exprs(
    header: list[str], specs: list[ColumnSpec], row: Column | None = None
) -> list[Column]:
    """Compile specs into aliased Catalyst expressions, header order first,
    then defaulted absent-optional columns (csv.clj:155-160). ``row``: an
    optional row-ordinal Column threaded into fail-fast error messages."""
    by_title = {s.title: s for s in specs}
    exprs: list[Column] = []
    declared_cols: dict[str, Column] = {}
    for h in header:
        spec = by_title[h]
        c: Column = F.col(f"`{h}`")
        for v in spec.validators:
            c = v.expr(c, spec.title, row)
        if spec.transform is not None:
            c = spec.transform.expr(c, spec.title, row)
        declared_cols[spec.key] = c
        exprs.append(c.alias(spec.key))
    declared_titles = set(header)
    for spec in specs:
        if spec.title in declared_titles or not spec.has_default:
            continue
        if spec.default_expr is not None:
            c = spec.default_expr(declared_cols)
        else:
            c = F.lit(spec.default)
        exprs.append(c.alias(spec.key))
    return exprs


def read_csv_header(spark: SparkSession, path: str) -> list[str]:
    """First line of the file, BOM-stripped, CSV-parsed. Reads one partition
    (``limit(1)`` on a text scan), never the whole file."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        raise HeaderValidationError("No header row found")
    line = first[0][0].lstrip("﻿")
    return next(_csv.reader(io.StringIO(line)))


def records_df(spark: SparkSession, path: str, specs: list[ColumnSpec]) -> DataFrame:
    """Distributed validated read: header checked on the driver, then one
    ``select()`` over a string-typed CSV scan."""
    header = read_csv_header(spark, path)
    validate_header(header, specs)
    df = spark.read.option("header", True).option("inferSchema", False).csv(path)
    df = df.withColumn(ROW_ORDINAL, row_ordinal_col())
    return df.select(*build_select_exprs(header, specs, row=F.col(ROW_ORDINAL)))


def apply_specs(df: DataFrame, specs: list[ColumnSpec]) -> DataFrame:
    """Same compilation applied to an existing DataFrame whose column names
    are the spec titles (for data already in the lake rather than CSV)."""
    validate_header(df.columns, specs)
    return df.select(*build_select_exprs(df.columns, specs))
