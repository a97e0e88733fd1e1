"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Not in the reference's surface (its documents arrive pre-curated in the
vector store, /root/reference/app.py:36); required by the north-star
extension scope (BASELINE.json). All pure Column expressions — built-in
string/array/higher-order functions, no Python UDFs — so a 100 TB corpus
scan stays entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: ColumnOrName) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.trim(_c(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: ColumnOrName) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


# A BPE-ish segmentation: runs of letters are split into chunks of <=4
# chars (approximating subword merges), digit runs and single punctuation
# marks are their own tokens. Deliberately regex-only so the count is
# reproducible in any engine.
BPE_ISH_PATTERN = r"[A-Za-zÀ-ɏ]{1,4}|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: ColumnOrName) -> Column:
    # idx=0 → whole-match extraction (the pattern has no capture groups)
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


# ---------------------------------------------------------------- quality
# Stopword profiles per language. Tiny on purpose: they are broadcast as
# plan literals, and the mechanism (profile hit-rate scoring) is what a
# production pipeline would scale up with a real list.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "auf", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"),
}

PUNCT_CLASS = r"""[!-/:-@\[-`{-~]"""  # ASCII punctuation ranges


def punct_ratio(col: ColumnOrName) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    t = _c(col)
    n = F.length(t)
    p = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio_of(toks: Column, lang: str = "en") -> Column:
    """Stopword hit-rate over an already-tokenized array column — stage
    ``tokens(text)`` once as a real column and reuse it across metrics;
    inlining ``tokens()`` into several metric expressions re-splits the
    text once per metric."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, F.lower(x))))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def stopword_ratio(col: ColumnOrName, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    return stopword_ratio_of(tokens(col), lang)


def avg_token_length_of(toks: Column) -> Column:
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n)


def avg_token_length(col: ColumnOrName) -> Column:
    return avg_token_length_of(tokens(col))


def quality_score_of(toks: Column, text: ColumnOrName, lang: str = "en") -> Column:
    """Composite quality over a staged token column (see quality_score)."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / 50.0, F.lit(1.0))  # saturates at 50 tokens
    sw = stopword_ratio_of(toks, lang)
    sw_score = F.lit(1.0) - F.least(F.abs(sw - 0.4) / 0.4, F.lit(1.0))
    pr = punct_ratio(text)
    punct_score = F.lit(1.0) - F.least(pr / 0.2, F.lit(1.0))
    awl = avg_token_length_of(toks)
    awl_score = F.lit(1.0) - F.least(F.abs(awl - 5.0) / 5.0, F.lit(1.0))
    return F.round(
        0.3 * len_score + 0.3 * sw_score + 0.2 * punct_score + 0.2 * awl_score, 6
    )


def quality_score(col: ColumnOrName, lang: str = "en") -> Column:
    """Composite document-quality heuristic in [0,1]: favors texts with a
    healthy length, a natural stopword rate, moderate punctuation, and
    plausible mean word length. The shape follows published quality-filter
    recipes (C4/Gopher-style rules); the exact weights are ours."""
    return quality_score_of(tokens(col), col, lang)


# ---------------------------------------------------------------- lang id
def language_scores(col: ColumnOrName) -> dict[str, Column]:
    """Per-language stopword hit-rate scores (n-gram-profile style
    heuristic). On real multilingual text the profile with the highest
    hit rate wins; ties resolve alphabetically for determinism."""
    return {lang: stopword_ratio(col, lang) for lang in sorted(STOPWORDS)}


def language_id(col: ColumnOrName, default: str = "und") -> Column:
    """argmax over language profiles; 'und' (undetermined) when no
    profile scores above zero."""
    scores = language_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit(default)
    # alphabetical order + strict '==' makes the first max win deterministically
    for lang in sorted(scores, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0.0, F.lit(default)).otherwise(expr)


# ---------------------------------------------------------------- fingerprint
FP_MULTIPLIER = 1_000_003
FP_MODULUS = 2_147_483_647  # 2^31 - 1


def doc_fingerprint(col: ColumnOrName) -> Column:
    """Order-sensitive rolling-hash fingerprint over whitespace tokens:
    ``acc = (acc * 1000003 + tok_val) mod (2^31-1)`` with
    ``tok_val = 37*len(tok) + ascii(first) + 101*ascii(last)``.

    Deliberately engine-portable (no xxhash): the same fold is
    expressible in ANSI SQL, so the oracle can verify it. Intermediate
    values stay far below int64 overflow."""
    def tok_val(x: Column) -> Column:
        return (
            F.lit(37) * F.length(x)
            + F.ascii(x)
            + F.lit(101) * F.ascii(F.substring(x, -1, 1))
        ).cast("bigint")

    return F.aggregate(
        tokens(col),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * FP_MULTIPLIER + tok_val(x), F.lit(FP_MODULUS)),
    )


def word_shingles(col: ColumnOrName, n: int = 3) -> Column:
    """Contiguous n-token shingles (strings joined with a space) — the
    dedup primitives' input. Texts shorter than n tokens yield a single
    shingle of the whole text so no document silently disappears.

    Built as a sliding-window ``zip_with`` over n shifted slices of the
    token array. Every reference to the token array sits in ARGUMENT
    position (evaluated once per row); the earlier formulation indexed
    it from inside a per-shingle lambda, which re-tokenized the document
    once per shingle — O(tokens²) splitting."""
    toks = tokens(col)
    cnt = F.size(toks)
    m = F.greatest(cnt - (n - 1), F.lit(1))
    sh = F.slice(toks, 1, m)
    for k in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(toks, k + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(cnt <= n, F.array(F.array_join(toks, " "))).otherwise(sh)


# ---------------------------------------------------------------- repetition


def repetition_stats(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """Gopher-style repetition quality signals (Rae et al. 2021, table
    A1) per document: top-token fraction, distinct-token ratio, and
    duplicate-line fraction — the boilerplate/spam indicators that
    document-level dedup cannot see and per-token stats miss.

    Implemented RELATIONALLY (explode → two keyed aggregations) rather
    than as per-row quadratic array expressions: the shuffles are keyed
    by (doc, token)/(doc, line) — map-side partial aggregation collapses
    them to per-doc distinct counts, so at 100 TB this costs two
    combine-heavy aggregations, not O(tokens²) per document.

    Returns (id, n_tokens, n_distinct_tokens, top_token_fraction,
    distinct_token_ratio, n_lines, dup_line_fraction); empty documents
    report zero counts and 0.0 fractions."""
    from pyspark.sql import functions as F

    # deliberately NO fan_out here (unlike duplicated_ngram_spans):
    # the map side is a cheap tokenize+explode feeding a partial agg,
    # and an interleaved A/B at sf0.1 showed the round-robin shuffle
    # of full text rows costs more than the single-file serialization
    # it removes (min 0.62 s plain vs 0.94 s fanned; BASELINE.md r4)
    tok_rows = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    tf = tok_rows.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    tok_agg = tf.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("_c").alias("_maxc"),
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda x: x != "",
    )
    ln_rows = df.select(F.col(id_col), F.explode(lines).alias("_l"))
    lf = ln_rows.groupBy(id_col, "_l").agg(F.count(F.lit(1)).alias("_c"))
    ln_agg = lf.groupBy(id_col).agg(
        F.sum("_c").alias("n_lines"),
        F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(0)).alias("_dupl"),
    )
    return (
        df.select(id_col)
        .join(tok_agg, on=id_col, how="left")
        .join(ln_agg, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct_tokens", F.lit(0)).alias("n_distinct_tokens"),
            F.round(
                F.coalesce("_maxc", F.lit(0))
                / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)),
                6,
            ).alias("top_token_fraction"),
            F.round(
                F.coalesce("n_distinct_tokens", F.lit(0))
                / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)),
                6,
            ).alias("distinct_token_ratio"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(
                F.coalesce("_dupl", F.lit(0))
                / F.greatest(F.coalesce("n_lines", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_line_fraction"),
        )
    )
