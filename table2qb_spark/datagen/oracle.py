"""Single-threaded Python oracle for CDC replay (FIXTURES.md §7).

Applies base rows + change events in strict seq order, last-writer-wins per
(repo, path), deletes removing the key — the ground truth the distributed
replayer must converge to. Only usable at small scale (sf0.001/sf0.01 tests).
"""

from __future__ import annotations

import hashlib
import json


def replay_oracle(base_rows: list[dict], event_rows: list[dict]) -> dict[tuple, dict]:
    """base_rows: dicts with repo/path/commit/lang/content.
    event_rows: dicts with seq/op/repo/path/commit/lang/content/payload_json.
    Returns {(repo, path): final_row_dict} including evolved payload columns."""
    state: dict[tuple, dict] = {}
    for r in base_rows:
        state[(r["repo"], r["path"])] = {
            k: r.get(k) for k in ("repo", "path", "commit", "lang", "content")
        }
    for e in sorted(event_rows, key=lambda x: x["seq"]):
        key = (e["repo"], e["path"])
        if e["op"] == "D":
            state.pop(key, None)
            continue
        row = {k: e.get(k) for k in ("repo", "path", "commit", "lang", "content")}
        if e.get("payload_json"):
            row.update(json.loads(e["payload_json"]))
        state[key] = row
    return state


def row_sha256(row: dict, columns: list[str]) -> str:
    """Canonical per-row hash: named columns joined by unit separator in the
    given order, null as empty. Mirrors the Spark-side hash in
    table2qb_spark.cdc.verify."""
    payload = "\x1f".join(
        "" if row.get(c) is None else str(row.get(c)) for c in columns
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def table_sha256(rows: list[dict], columns: list[str]) -> str:
    """Order-insensitive table digest — the exact single-threaded mirror of
    the distributed digest in table2qb_spark.cdc.verify: each row hash is
    split into four 15-hex chunks, the per-chunk sums plus the row count are
    hashed. Commutative sums make it order-insensitive without collecting and
    sorting every hash."""
    from table2qb_spark.cdc.verify import _CHUNK_HEX, _N_CHUNKS, digest_of_sums

    sums = [0] * _N_CHUNKS
    n = 0
    for r in rows:
        h = row_sha256(r, columns)
        n += 1
        for i in range(_N_CHUNKS):
            sums[i] += int(h[_CHUNK_HEX * i : _CHUNK_HEX * (i + 1)], 16)
    return digest_of_sums(n, sums)
