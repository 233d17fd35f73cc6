"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting, document fingerprinting. Each has an exact
ANSI-SQL twin registered in the driver oracle (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (n-gram heuristic). Deterministic
# and SQL-twin-able; not a real langid model.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "y", "de"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def tokens_expr(c: Column) -> Column:
    """Whitespace tokenization of lowercased text (empty tokens dropped)."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


# shared alphanumeric tokenization — retrieval (BM25) and decontamination
# must agree exactly (and with the DuckDB oracles) on what a word is
ALNUM_TOKEN_SPLIT = "[^a-z0-9]+"


def alnum_tokens_expr(c: Column) -> Column:
    """Alphanumeric-word tokenization of lowercased text (empty dropped)."""
    return F.filter(F.split(F.lower(c), ALNUM_TOKEN_SPLIT), lambda t: t != "")


def token_count(c: Column) -> Column:
    return F.size(tokens_expr(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish subword proxy: count of maximal runs of word chars plus
    punctuation marks (the classic GPT-style pre-tokenizer regex shape)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def _marker_hits(c: Column, words: list[str]) -> Column:
    alt = "|".join(words)
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(rf"\b({alt})\b"), 0))


def lang_id_expr(c: Column) -> Column:
    """Marker-word-ratio argmax across LANG_MARKERS; 'und' when no marker
    hits at all. Ties broken by language code order (deterministic)."""
    scores = [(lang, _marker_hits(c, words)) for lang, words in sorted(LANG_MARKERS.items())]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def line_units_expr(c: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )


def word_ngrams_expr(c: Column, n: int) -> Column:
    """Array of space-joined alphanumeric word n-grams (empty when the doc
    has fewer than n tokens — guarded: Spark's sequence(0, negative) yields
    a DESCENDING range)."""
    toks = alnum_tokens_expr(c)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def repetition_metrics_exprs(units: Column, prefix: str) -> list[Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1) over
    an array of repetition units (lines via ``line_units_expr``, or word
    n-grams via ``word_ngrams_expr``), each a pure per-row expression — NO
    shuffle, the whole gate is a projection + filter over the corpus scan:

    - {prefix}_dup_frac:      1 - distinct(units)/units
    - {prefix}_dup_char_frac: share of CHARACTERS in duplicate unit
                              occurrences (beyond each unit's first)

    Fractions round to 4 decimals for cross-engine oracle stability."""
    n = F.size(units).cast("double")
    n_dist = F.size(F.array_distinct(units)).cast("double")
    total_chars = F.aggregate(
        units, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
    )
    dist_chars = F.aggregate(
        F.array_distinct(units), F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
    )
    safe = n > 0
    return [
        F.round(F.when(safe, (n - n_dist) / n).otherwise(0.0), 4).alias(
            f"{prefix}_dup_frac"
        ),
        F.round(
            F.when(safe & (total_chars > 0), (total_chars - dist_chars) / total_chars)
            .otherwise(0.0), 4,
        ).alias(f"{prefix}_dup_char_frac"),
    ]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Fixed-size token chunking with overlap (stride < chunk_tokens) — the
    standard RAG/embedding preprocessing step. One explode per document, no
    shuffle, no Python: token positions come from ``sequence`` stepped by
    ``stride`` and each chunk is a ``slice`` + join over the token array.
    Whitespace runs normalize to single spaces in the chunk text (tokens are
    re-joined); case is preserved. The final chunk may be shorter; empty
    documents yield no chunks."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c = F.col(text_col)
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), starts.alias("__starts"))
        .select(
            id_col,
            F.posexplode("__starts").alias("chunk_id", "__start"),
            F.col("__toks"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens).alias(
                "__chunk"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").alias("chunk_n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_line_df: int = 50,
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every LINE that appears in more
    than ``max_line_df`` distinct documents (nav bars, headers, cookie
    banners — the lines shared across a whole site), keeping each doc's
    remaining lines in their original order.

    Scale shape: posexplode lines -> count distinct docs per line (two-phase
    distinct agg, map-side combined) -> anti-join against the hot set ->
    one groupBy(doc) rebuilding the text via a sorted struct collect. Two
    shuffles total (line agg, doc rebuild); no all-pairs anything.
    Documents whose every line is boilerplate drop out of the result
    entirely.

    The hot-set anti-join strategy is deliberately left to AQE (same policy
    as ``prep.py``'s corpus-sized keeper sets): total_lines / max_line_df is
    NOT a broadcast-safe bound — a 100 TB corpus has ~10^11 line
    occurrences, so at max_line_df=50 it admits ~10^9-10^10 distinct hot
    lines, far past any driver broadcast limit. AQE broadcasts the hot set
    at runtime when its measured size fits (the common case — truly hot
    lines are few) and falls back to a shuffled anti-join when it doesn't,
    instead of OOMing the driver on a forced hint."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(line_units_expr(F.col(text_col))).alias("pos", "line"),
    )
    hot = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") > max_line_df)
        .select("line")
    )
    kept = lines.join(hot, "line", "left_anti")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
    )
    return kept.groupBy(id_col).agg(
        F.array_join(ordered, "\n").alias("text"),
        F.count("*").cast("int").alias("n_lines_kept"),
    )


def clean_lines_exprs(
    c: Column, min_words: int = 5, banned_words: list[str] | None = None
) -> list[Column]:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2 — distinct from
    the page-level gates in ``web_quality_exprs``): keep only lines that end
    in a terminal punctuation mark, contain at least ``min_words``
    whitespace words, and mention no banned word (C4 drops lines containing
    "javascript"). Returns ``[clean_text, n_lines_kept, n_lines_total]``.

    Pure per-row Catalyst expressions (array filter + join) — the whole op
    is one projection over the corpus scan, ZERO shuffle, unlike the
    corpus-level ``remove_boilerplate_lines`` which must aggregate line
    document-frequencies. Documents whose every line is dropped yield an
    empty string (callers gate on n_lines_kept).

    Reference analog: none (the reference is a stats-cube transformer);
    this op is part of the training-data surface, modeled on C4's public
    recipe."""
    banned = banned_words if banned_words is not None else ["javascript"]
    lines = line_units_expr(c)

    def keep(line: Column) -> Column:
        words_ok = F.size(F.filter(F.split(line, r"\s+"), lambda t: t != "")) >= min_words
        punct_ok = line.rlike('[.!?"]$')
        ban_ok = F.lit(True)
        for w in banned:
            ban_ok = ban_ok & ~F.lower(line).contains(w.lower())
        return words_ok & punct_ok & ban_ok

    kept = F.filter(lines, keep)
    return [
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        F.size(lines).cast("int").alias("n_lines_total"),
    ]


def token_entropy_expr(c: Column) -> Column:
    """Per-document unigram Shannon entropy in bits/token — a classic
    noise/repetition quality signal (low entropy = highly repetitive
    keyboard-mash or template text; used alongside the Gopher gates).

    Scale shape: ONE per-row expression, zero shuffle. Token counts come
    from run lengths of the SORTED token array (O(n log n) per row), not a
    distinct×tokens nested loop (O(n·d) — quadratic on pathological docs):
    run boundaries are the positions where sorted[i] != sorted[i+1]; run
    lengths are adjacent differences of the boundary positions; entropy is
    a fold over the run lengths. Rounded to 4 decimals for cross-engine
    oracle stability; empty docs score 0.0."""
    sorted_toks = F.array_sort(tokens_expr(c))
    n = F.size(sorted_toks)
    # 1-indexed end position of every run: i where t[i] != t[i+1], plus n
    ends = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n)
        # try_element_at: i+1 is out of bounds at i==n and ANSI mode is on —
        # OR does short-circuit, but don't bet the job on eval order
        | (F.try_element_at(sorted_toks, i) != F.try_element_at(sorted_toks, i + 1)),
    )
    # run lengths = ends[j] - ends[j-1] (ends[0] diffs against 0)
    lens = F.zip_with(
        ends,
        F.concat(F.array(F.lit(0)), F.slice(ends, 1, F.greatest(F.size(ends) - 1, F.lit(0)))),
        lambda e, p: e - p,
    )
    nd = n.cast("double")
    h = F.aggregate(
        lens,
        F.lit(0.0),
        lambda acc, l: acc - (l.cast("double") / nd) * F.log2(l.cast("double") / nd),
    )
    return F.round(F.when(n > 0, h).otherwise(F.lit(0.0)), 4)


def web_quality_exprs(c: Column) -> list[Column]:
    """C4 + Gopher web-quality gate signals (Raffel et al. 2020 §2.2;
    Rae et al. 2021 §A1.1) as pure per-row Catalyst expressions — the whole
    gate is a projection + filter over the corpus scan, zero shuffle:

    - terminal_punct_line_frac: lines ending in . ! ? or a closing quote
      (C4 keeps only such lines)
    - bullet_line_frac / ellipsis_line_frac: Gopher drops docs with > 90%
      bullet lines or > 30% ellipsis lines
    - mean_word_length: Gopher keeps 3..10
    - symbol_word_ratio: (#hashes + ellipses) / words, Gopher drops > 0.1
    - alpha_word_frac: words containing >= 1 alphabetic char, Gopher
      drops < 0.8
    - has_lorem_ipsum / has_curly_brace: C4 page-level drops

    Fractions round to 4 decimals for cross-engine oracle stability."""
    lines = line_units_expr(c)
    n_lines = F.size(lines).cast("double")

    def line_frac(pred) -> Column:
        hit = F.size(F.filter(lines, pred)).cast("double")
        return F.round(F.when(n_lines > 0, hit / n_lines).otherwise(0.0), 4)

    toks = tokens_expr(c)
    n_tok = F.size(toks).cast("double")
    tok_chars = F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x))
    n_hash = (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))).cast(
        "double"
    )
    n_ellipsis = F.size(
        F.regexp_extract_all(c, F.lit(r"(\.\.\.|…)"), 0)
    ).cast("double")
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
    return [
        line_frac(lambda x: x.rlike('[.!?"]$')).alias("terminal_punct_line_frac"),
        line_frac(lambda x: x.rlike(r"^([-*]|•)")).alias("bullet_line_frac"),
        line_frac(lambda x: x.rlike(r"(\.\.\.|…)$")).alias("ellipsis_line_frac"),
        F.round(F.when(n_tok > 0, tok_chars / n_tok).otherwise(0.0), 4).alias(
            "mean_word_length"
        ),
        F.round(
            F.when(n_tok > 0, (n_hash + n_ellipsis) / n_tok).otherwise(0.0), 4
        ).alias("symbol_word_ratio"),
        F.round(F.when(n_tok > 0, alpha_words / n_tok).otherwise(0.0), 4).alias(
            "alpha_word_frac"
        ),
        F.lower(c).contains("lorem ipsum").alias("has_lorem_ipsum"),
        c.contains("{").alias("has_curly_brace"),
    ]


def quality_score_expr(c: Column) -> Column:
    """Composite quality heuristic in [0,1]:
    0.4·stopword-ratio-score + 0.3·length-score + 0.3·alpha-ratio.
    Rounded to 4 decimals for cross-engine stability."""
    toks = tokens_expr(c)
    n_tok = F.size(toks).cast("double")
    stop_hits = _marker_hits(c, EN_STOPWORDS).cast("double")
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio * 2.5, F.lit(1.0))
    length_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(
        F.length(c) > 0, n_alpha.cast("double") / F.length(c).cast("double")
    ).otherwise(F.lit(0.0))
    return F.round(
        stop_score * 0.4 + length_score * 0.3 + alpha_ratio * 0.3, 4
    )


def fingerprint_expr(c: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set —
    whitespace/order/duplication-insensitive content identity (the cheap
    cousin of winnowing; stable across engines)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens_expr(c))), " ")
    return F.md5(canon)


def analyze_documents(
    df: DataFrame, text_col: str = "text", keep_input: bool = False
) -> DataFrame:
    """Per-document metrics as ONE Catalyst projection. ``keep_input`` keeps
    the input columns alongside (same single scan — callers must not join
    the metrics back on doc_id, which would re-scan and shuffle)."""
    c = F.col(text_col)
    metrics = [
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        lang_id_expr(c).alias("pred_lang"),
        quality_score_expr(c).alias("quality"),
        fingerprint_expr(c).alias("fingerprint"),
    ]
    if keep_input:
        return df.select("*", *metrics)
    return df.select("doc_id", *metrics)


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level duplicate-paragraph removal (the CCNet/RefinedWeb prep
    stage): every paragraph that occurs more than once ACROSS THE CORPUS
    keeps only its first occurrence — ordered by (doc id, position) — and
    each document's text is rebuilt from its surviving paragraphs in their
    original order. Unlike ``remove_boilerplate_lines`` (drop EVERY copy of
    lines hotter than a df threshold) this keeps exactly one copy of each
    duplicated span, df-agnostic — the exact-substring-dedup semantics at
    paragraph granularity.

    Output: ``(id, text, n_paras, n_kept)`` — a document whose EVERY
    paragraph first appeared in a lower-id document is fully redundant and
    vanishes from the output entirely (the paragraph-granular analog of
    dropping a duplicate document).

    Scale shape: posexplode paragraphs → groupBy md5(paragraph) computing
    ``min(struct(id, idx))`` (map-side combinable — a boilerplate paragraph
    shared by 10^9 docs partially aggregates inside each map task, unlike a
    row_number window, which would sort the entire hot key in ONE task) →
    equi-join back on the hash (AQE co-partitions both sides of the
    self-shaped join) → one ordered rebuild agg per doc. Nothing is
    collected or broadcast."""
    arr = F.split(F.col(text_col), sep)
    paras = df.select(
        F.col(id_col),
        F.size(arr).alias("n_paras"),
        F.posexplode(arr).alias("idx", "para"),
    )
    first = (
        paras.groupBy(F.md5(F.col("para")).alias("h"))
        .agg(F.min(F.struct(id_col, "idx")).alias("first"))
    )
    kept = paras.join(
        first,
        (F.md5(F.col("para")) == F.col("h"))
        & (F.col(id_col) == F.col("first")[id_col])
        & (F.col("idx") == F.col("first")["idx"]),
        "left_semi",
    )
    return (
        kept.groupBy(id_col, "n_paras")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select(id_col, "text", F.col("n_paras").cast("long"), F.col("n_kept"))
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary report: the top-k tokens by corpus term frequency,
    with document frequency — the first aggregate anyone runs before
    building a tokenizer or a stopword list over a new corpus.

    Output: ``(token, tf, df)`` ordered by (tf desc, df desc, token asc) —
    a TOTAL order, so the k-boundary is deterministic and oracle-stable.

    Scale shape: explode tokens → groupBy (token, doc) — the first partial
    aggregate collapses within-document repeats map-side, so the shuffle
    carries one row per (token, doc), not per occurrence → groupBy token
    (again map-side combined) → global top-k via orderBy+limit, which
    Catalyst executes as TakeOrderedAndProject (per-partition heaps of k
    rows; only n_partitions * k rows ever move). Two map-side-combined
    shuffles, no expand (count + count_distinct in ONE agg would expand
    every row 2x pre-shuffle)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("token")
    )
    per_doc = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    agg = per_doc.groupBy("token").agg(
        F.sum("tf").alias("tf"), F.count(F.lit(1)).alias("df")
    )
    return agg.orderBy(F.desc("tf"), F.desc("df"), F.asc("token")).limit(k)


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 5000,
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-fit bigram language-model quality proxy — the shape of
    CCNet's perplexity filter (Wenzek et al. 2020 §3.3: docs are bucketed
    by LM perplexity and the worst tail dropped) with the external wiki LM
    replaced by a bigram model fit on the corpus itself, so the operator is
    self-contained and exactly reproducible.

    Model: top-``vocab_k`` unigrams form the vocabulary (ties broken by
    token so the vocab is deterministic); everything else maps to
    ``<unk>``. Add-alpha smoothing:

        P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V),  V = vocab+1

    Score per doc: mean -log2 P over its (mapped) bigrams, rounded to 4
    (``bits_per_bigram``; higher = less corpus-like). Docs with < 2 tokens
    score NULL.

    Scale shape — fit and score are both corpus-bounded joins, never a
    collect or a forced broadcast of model tables:
    - unigram counts: one map-side-combined agg over exploded tokens; the
      vocab is TakeOrderedAndProject(k) of it (per-partition heaps);
    - the vocab (k rows) IS broadcast-safe by construction — an explicit
      k-row bound, unlike a corpus-derived set — and joins the token
      stream to apply the <unk> mapping;
    - bigram counts: second map-side-combined agg; up to vocab_k^2 rows,
      NOT broadcast — scoring joins doc bigrams to the count table as a
      plain equi-join (AQE picks the strategy);
    - per-doc score: one final agg keyed on the doc id.
    """
    if vocab_k <= 0:
        raise ValueError("vocab_k must be > 0")
    v = vocab_k + 1  # + <unk>
    toks = df.select(
        F.col(id_col), F.posexplode(tokens_expr(F.col(text_col))).alias("pos", "tok")
    )
    uni_all = toks.groupBy("tok").agg(F.count("*").alias("c_tok"))
    vocab = uni_all.orderBy(F.desc("c_tok"), "tok").limit(vocab_k).select("tok")
    mapped = (
        toks.join(F.broadcast(vocab.withColumn("__in_v", F.lit(1))), "tok", "left")
        .select(
            id_col,
            "pos",
            F.when(F.col("__in_v").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<unk>"))
            .alias("w"),
        )
    )
    # adjacent-pair join on (doc, pos+1): partitioned by doc id, positions
    # are dense from posexplode, so this is a co-partitioned self-join
    nxt = mapped.select(
        F.col(id_col), (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    bigrams = mapped.join(nxt, [id_col, "pos"]).select(
        id_col, F.col("w").alias("w1"), "w2"
    )
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_big"))
    # last token of every doc never opens a bigram; c(w1) must count only
    # bigram openers or the conditional P would not normalize — derive it
    # from the bigram table itself (sum over w2), keeping both engines and
    # the math consistent
    opener_counts = big_counts.groupBy("w1").agg(F.sum("c_big").alias("c_w1"))
    scored = (
        bigrams.join(big_counts, ["w1", "w2"])
        .join(opener_counts, "w1")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    -F.log2(
                        (F.col("c_big") + F.lit(float(alpha)))
                        / (F.col("c_w1") + F.lit(float(alpha * v)))
                    )
                ),
                4,
            ).alias("bits_per_bigram"),
            F.count("*").alias("n_bigrams"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left")


def repeated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 20,
    stride: int | None = None,
    min_df: int = 2,
) -> DataFrame:
    """Repeated-substring detection (the window-hash approximation of Lee et
    al., "Deduplicating Training Data Makes Language Models Better", ACL'22
    — their suffix-array exact-substring pass re-expressed for Spark): slide
    a ``window_tokens``-token window with ``stride`` over every document,
    hash each window, and return every window whose hash occurs in at least
    ``min_df`` DISTINCT documents — the boilerplate/license-header/quoted
    spans that exact doc-level dedup misses because the surrounding text
    differs.

    Output: (id_col, win_start, win_hash, doc_df) — token-offset window
    starts; feed through ``merge_token_spans`` for strip-ready [start, end)
    spans. Documents shorter than one window emit nothing.

    Scale shape: one explode (the windows ARE the workload, same as
    minhash's shingles) -> one two-phase count-distinct agg on the hash ->
    one equi-join back. The hot-hash side is corpus-sized in the worst
    case, so its join strategy is deliberately left to AQE — the same
    policy (and for the same reason) as ``remove_boilerplate_lines``'s hot
    set. Stride trades recall for cost: stride == window_tokens//2
    (default) guarantees any repeated run of >= 1.5x window_tokens shares
    at least one aligned window between copies ONLY when copies start at
    aligned offsets; Lee et al.'s suffix array is exact where this is
    probabilistic — the standard large-scale tradeoff."""
    if stride is None:
        stride = max(1, window_tokens // 2)
    if window_tokens <= 0 or stride <= 0:
        raise ValueError("window_tokens and stride must be positive")
    c = F.col(text_col)
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    starts = F.when(
        n >= window_tokens,
        F.sequence(F.lit(0), n - window_tokens, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    wins = (
        df.select(F.col(id_col), toks.alias("__toks"), starts.alias("__starts"))
        .select(
            id_col,
            F.explode("__starts").alias("win_start"),
            F.col("__toks"),
        )
        .select(
            id_col,
            "win_start",
            F.md5(
                F.array_join(
                    F.slice(F.col("__toks"), F.col("win_start") + 1, window_tokens),
                    " ",
                )
            ).alias("win_hash"),
        )
    )
    hot = (
        wins.groupBy("win_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("doc_df"))
        .where(F.col("doc_df") >= min_df)
    )
    return wins.join(hot, "win_hash").select(
        id_col, "win_start", "win_hash", "doc_df"
    )


def merge_token_spans(
    spans: DataFrame,
    id_col: str = "doc_id",
    window_tokens: int = 20,
) -> DataFrame:
    """Fold ``repeated_window_spans`` output into per-document merged
    [span_start, span_end) token intervals (overlapping/adjacent windows
    coalesce) — the strip-ready shape. Standard gaps-and-islands: a window
    opens a new island when its start exceeds the running max end of every
    earlier window, the island index is the running count of such opens,
    and each island aggregates to one span. ONE shuffle on the doc id —
    both window functions and the final groupBy share the same hash
    partitioning. SQL-expressible, so the ``repeated_spans`` oracle gates
    the merge too."""
    from pyspark.sql.window import Window

    w = F.lit(window_tokens)
    order = Window.partitionBy(id_col).orderBy("win_start")
    prev_max_end = F.max(F.col("win_start") + w).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col("win_start") > prev_max_end), 1
    ).otherwise(0)
    # distinct first: repeated_window_spans emits one row per (doc, start)
    # per hot hash; identical starts must not double-count islands
    return (
        spans.select(id_col, "win_start")
        .distinct()
        .withColumn("__open", opens)
        .withColumn("__island", F.sum("__open").over(order))
        .groupBy(id_col, "__island")
        .agg(
            F.min("win_start").cast("int").alias("span_start"),
            (F.max("win_start") + w).cast("int").alias("span_end"),
        )
        .drop("__island")
    )
