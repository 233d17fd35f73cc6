"""Column-diff reconciler (north rule: schema evolution from change payloads).

Change events may carry a ``payload_json`` column: a JSON object of extra
column values (ADD COLUMN when a new key appears), or a rename directive
``{"__rename__": {"old": "new"}}``. Per batch the reconciler:

1. collects the distinct payload keys in the batch (one tiny distinct job
   over exploded map keys — map-side combined);
2. diffs them against the table's current schema;
3. issues metadata-only schema commits (LakeTable.evolve_schema — the
   equivalent of Iceberg ``ALTER TABLE ADD/RENAME COLUMN``);
4. returns the batch with payload columns materialized as real columns so the
   MERGE sees a flat row.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table2qb_spark.lake.table import LakeTable

RENAME_KEY = "__rename__"


def payload_keys(batch_df: DataFrame, payload_col: str = "payload_json") -> list[str]:
    if payload_col not in batch_df.columns:
        return []
    rows = (
        batch_df.where(F.col(payload_col).isNotNull())
        .select(
            F.explode(
                F.map_keys(F.from_json(F.col(payload_col), "map<string,string>"))
            ).alias("k")
        )
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def extract_renames(batch_df: DataFrame, payload_col: str = "payload_json") -> dict[str, str]:
    """Rename directives are rare control events — collect just those rows."""
    if payload_col not in batch_df.columns:
        return {}
    rows = (
        batch_df.where(F.col(payload_col).contains(RENAME_KEY))
        .select(payload_col)
        .collect()
    )
    renames: dict[str, str] = {}
    for r in rows:
        try:
            d = json.loads(r[0])
        except (TypeError, ValueError):
            continue
        renames.update(d.get(RENAME_KEY, {}))
    return renames


def reconcile_and_flatten(
    table: LakeTable,
    batch_df: DataFrame,
    batch_commit_id: str,
    payload_col: str = "payload_json",
) -> DataFrame:
    """Evolve the table schema to cover this batch's payload, then return the
    batch with payload keys as real columns (string-typed; absent -> null)."""
    renames = extract_renames(batch_df, payload_col)
    if renames:
        table.evolve_schema(rename_columns=renames, commit_id=f"{batch_commit_id}-rename")

    keys = [k for k in payload_keys(batch_df, payload_col) if k != RENAME_KEY]
    schema_names = {c["name"] for c in table.snapshot().current_schema()}
    new_cols = [k for k in keys if k not in schema_names]
    if new_cols:
        table.evolve_schema(
            add_columns=[(k, "string") for k in new_cols],
            commit_id=f"{batch_commit_id}-addcols",
        )

    if payload_col not in batch_df.columns or not keys:
        return batch_df.drop(payload_col) if payload_col in batch_df.columns else batch_df

    pm = F.from_json(F.col(payload_col), "map<string,string>")
    out = batch_df
    for k in keys:
        out = out.withColumn(k, F.element_at(pm, F.lit(k)))
    return out.drop(payload_col)
