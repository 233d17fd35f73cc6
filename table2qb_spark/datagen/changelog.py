"""Deterministic synthetic source-code CDC fixtures (FIXTURES.md §7).

Everything is a pure function of (seed, id) built from Catalyst expressions —
``spark.range`` + hash mixing — so generation is distributed, reproducible,
and never materializes driver-side state. No external data.

Shapes:
- **base table** ``repos(repo, path, commit, lang, content)`` keyed
  (repo, path), with hot-repo skew: repo index drawn from a power-law so a
  few repos own a large share of paths (exercises salting/AQE skew paths).
- **change log** ``events(seq, op, repo, path, commit, lang, content,
  payload_json)`` ordered by seq with:
  - op mix I/U/D,
  - exact-duplicate deliveries (same seq re-delivered),
  - out-of-order arrival within files (shuffled write order),
  - schema-evolution payloads: events past a threshold carry extra JSON
    columns (e.g. license) to drive the column-diff reconciler.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "clojure", "rust", "go", "java", "scala", "sql", "js"]


def _u(col, salt: int):
    """uniform [0,1) from a hashed column (deterministic)."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)


def _repo_expr(idc, n_repos: int, seed: int, skew: float):
    """Power-law repo index: floor(n * u^skew) — skew>1 concentrates mass on
    low indices (hot repos)."""
    u = _u(idc, seed + 11)
    return F.floor(F.lit(n_repos) * F.pow(u, F.lit(skew))).cast("long")


def _content_expr(repo, path, seq):
    """Deterministic fake source text ~ f(repo, path, seq). Built from sha2
    chunks so it's incompressible-ish and unique per (key, version)."""
    h1 = F.sha2(F.concat_ws("|", repo, path, seq.cast("string"), F.lit("a")), 256)
    h2 = F.sha2(F.concat_ws("|", repo, path, seq.cast("string"), F.lit("b")), 256)
    return F.concat(
        F.lit("def f_"), F.substring(h1, 1, 8), F.lit("():\n    return '"),
        h1, F.lit("' + '"), h2, F.lit("'\n"),
    )


def gen_base_table(
    spark: SparkSession,
    n_rows: int,
    n_repos: int | None = None,
    seed: int = 42,
    skew: float = 2.0,
) -> DataFrame:
    """Base lake table content (repo, path, commit, lang, content) with
    unique (repo, path) keys and skewed repo sizes."""
    n_repos = n_repos or max(8, n_rows // 200)
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    ic = F.col("i")
    repo_idx = _repo_expr(ic, n_repos, seed, skew)
    repo = F.concat(F.lit("org/repo-"), F.lpad(repo_idx.cast("string"), 5, "0"))
    # unique path per i: directory from hash, filename from i itself
    d1 = F.pmod(F.xxhash64(ic, F.lit(seed + 21)), F.lit(17))
    path = F.concat(
        F.lit("src/dir"), d1.cast("string"), F.lit("/file_"), ic.cast("string"),
        F.element_at(
            F.array(*[F.lit(x) for x in [".py", ".clj", ".rs", ".go", ".java"]]),
            F.pmod(F.xxhash64(ic, F.lit(seed + 22)), F.lit(5)).cast("int") + 1,
        ),
    )
    seq0 = F.lit(0).cast("long")
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat_ws("|", repo, path, F.lit(seed)), 256), 1, 40).alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            F.pmod(F.xxhash64(ic, F.lit(seed + 23)), F.lit(len(LANGS))).cast("int") + 1,
        ).alias("lang"),
        _content_expr(repo, path, seq0).alias("content"),
    )


def gen_change_log(
    spark: SparkSession,
    n_events: int,
    n_repos: int,
    paths_per_repo: int,
    seed: int = 42,
    skew: float = 2.0,
    dup_rate: float = 0.02,
    delete_rate: float = 0.05,
    insert_rate: float = 0.35,
    schema_evolution_after: float | None = 0.6,
    n_partitions: int | None = None,
) -> DataFrame:
    """Ordered change log. seq = 1..n_events (strictly increasing, unique
    except injected duplicate deliveries).

    Key choice: (repo power-law, path uniform within repo) — hot repos
    receive proportionally more churn. Op: I/U/D by hash. Duplicates: a
    dup_rate sample of events is emitted twice (same seq, same payload).
    After ``schema_evolution_after``·n_events, payload_json carries a
    ``license`` field (new column for the reconciler)."""
    rng = spark.range(1, n_events + 1, 1, n_partitions or spark.sparkContext.defaultParallelism)
    df = rng.select(F.col("id").alias("seq"))
    sc = F.col("seq")
    repo_idx = _repo_expr(sc, n_repos, seed, skew)
    path_idx = F.pmod(F.xxhash64(sc, F.lit(seed + 31)), F.lit(paths_per_repo))
    repo = F.concat(F.lit("org/repo-"), F.lpad(repo_idx.cast("string"), 5, "0"))
    path = F.concat(
        F.lit("src/f"), path_idx.cast("string"), F.lit(".py")
    )
    u_op = _u(sc, seed + 41)
    op = (
        F.when(u_op < delete_rate, F.lit("D"))
        .when(u_op < delete_rate + insert_rate, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    payload = (
        F.when(
            F.lit(schema_evolution_after is not None)
            & (sc > F.lit(int((schema_evolution_after or 1.0) * n_events))),
            F.concat(
                F.lit('{"license": "'),
                F.element_at(
                    F.array(F.lit("mit"), F.lit("apache-2.0"), F.lit("gpl-3.0")),
                    F.pmod(F.xxhash64(sc, F.lit(seed + 51)), F.lit(3)).cast("int") + 1,
                ),
                F.lit('"}'),
            ),
        ).otherwise(F.lit(None).cast("string"))
    )
    events = df.select(
        sc.alias("seq"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat_ws("|", repo, path, sc.cast("string")), 256), 1, 40).alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            F.pmod(F.xxhash64(sc, F.lit(seed + 61)), F.lit(len(LANGS))).cast("int") + 1,
        ).alias("lang"),
        _content_expr(repo, path, sc).alias("content"),
        payload.alias("payload_json"),
    )
    # duplicate deliveries: re-emit a deterministic sample with the same seq
    dups = events.where(_u(F.col("seq"), seed + 71) < dup_rate)
    return events.unionAll(dups)


def write_change_log(df: DataFrame, path: str, n_files: int = 32) -> None:
    """Materialize the log as parquet. Files are written from hash-shuffled
    partitions, so physical order within the log is NOT seq order —
    exercising the out-of-order tolerance of the replayer (seq ranges are
    selected by filter, never by file order)."""
    df.repartition(n_files, F.xxhash64("seq", F.lit(7))).write.mode("overwrite").parquet(path)
