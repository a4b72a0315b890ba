"""Text-analysis column expressions for large-scale training-data pipelines.

All of these are NATIVE Spark column expressions (JVM-side, whole-stage
codegen) — no Python in the hot path — and each has a DuckDB-SQL-expressible
twin so the driver's oracle can verify values bit-for-bit:

  - tokenization + token counts (whitespace + alnum-normalized)
  - quality scoring (length / punctuation / stopword ratios)
  - language ID (stopword-hit heuristic over a tiny per-language lexicon)
  - document fingerprinting (md5 of the normalized token stream)
  - word n-gram shingles (the dedup family's input)

The reference crawler's text analysis surface is thinner (title/description
extraction + DOM counts, /root/reference/src/engine/crawler.rs:901-937); this
module is the training-data superset the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny, deterministic stopword lexicons (heuristic language ID only)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "zh": ["de5", "shi4", "zai4", "le5", "he2", "you3", "wo3", "ta1", "zhe4", "men5"],
}


def norm_tokens(col) -> Column:
    """Lowercased alnum tokens: non-alnum -> space, split, drop empties."""
    cleaned = F.lower(F.regexp_replace(col, "[^a-zA-Z0-9]+", " "))
    return F.filter(F.split(F.trim(cleaned), " "), lambda t: t != "")


def _let(value, body) -> Column:
    """Let-bind `value` so `body` can reference it many times while it is
    EVALUATED ONCE per row: Catalyst skips subexpression elimination for
    expressions containing higher-order-function lambdas (they fall back to
    interpreted eval), so every textual reference to e.g. norm_tokens(col)
    re-runs the whole regexp+split tokenization. Binding it as the element
    of a single-element transform() makes every inner reference a value
    lookup — the same measured 3-6.7x win as word_shingles/word_grams.
    `body` gets the bound Column and returns one Column; nested _let calls
    compose (bind a struct to let-bind several values at once)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def token_count(col) -> Column:
    return F.size(norm_tokens(col))


def char_count(col) -> Column:
    return F.length(col)


# GPT-2-style pre-tokenizer (public pattern family): contractions, an
# optional leading space glued to letter/digit/symbol runs. The reference
# lookahead variant (`\s+(?!\S)`) is dropped so the same pattern runs under
# Java regex (Spark) AND RE2 (DuckDB oracle) — whitespace runs merge into
# the following token's leading space either way.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def subword_token_count(col) -> Column:
    """BPE-ish token estimate: pre-tokenizer match count plus one extra
    subword per started 4-char block beyond the first in each pre-token —
    the split pressure a byte-pair vocabulary applies to long words.
    Deterministic, tokenizer-file-free, and fully native (regexp + one
    array aggregate). The pre-token array is _let-bound: size() and the
    aggregate otherwise each re-run the regexp extraction."""

    def build(toks):
        extras = F.aggregate(
            toks,
            F.lit(0),
            lambda a, t: a
            + F.greatest(
                F.ceil(F.length(F.trim(t)) / 4).cast("int") - 1, F.lit(0)
            ),
        )
        return F.size(toks) + extras

    return _let(F.regexp_extract_all(col, F.lit(f"({BPE_PRETOKEN_RE})"), 1), build)


def punct_ratio(col) -> Column:
    """Fraction of characters that are not alnum/space."""
    stripped = F.length(F.regexp_replace(col, "[a-zA-Z0-9 ]", ""))
    return F.when(F.length(col) > 0, stripped / F.length(col)).otherwise(F.lit(0.0))


def stopword_hits(col, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(norm_tokens(col), lambda t: t.isin(*words)))


def stopword_ratio(col, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, lang) / n).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: rewards reasonable length and
    stopword presence, penalizes punctuation soup. Weights are arbitrary but
    fixed — the value of the operator is the vectorized plumbing. The token
    array is _let-bound (3 tokenizations per row otherwise); the arithmetic
    is unchanged expression-for-expression, so values stay bit-identical."""

    def build(toks):
        n_tok = F.size(toks)
        len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
        words = STOPWORDS["en"]
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        sw_ratio = F.when(n_tok > 0, hits / n_tok).otherwise(F.lit(0.0))
        sw_score = F.least(sw_ratio * 5.0, F.lit(1.0))
        punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
        return F.round(0.4 * len_score + 0.3 * sw_score + 0.3 * punct_pen, 6)

    return _let(norm_tokens(col), build)


def lang_guess(col) -> Column:
    """argmax over per-language stopword hit counts; ties -> lexicographic
    language order; zero hits everywhere -> 'und'. Two _let levels: the
    token array (one tokenization per row instead of four) and the hit
    counts (the when-chain references each count up to three times)."""

    def hit_filter(words):
        # factory closure: HOF lambdas must be single-parameter
        return lambda t: t.isin(*words)

    def pick(hs):
        hits = {lang: hs[lang] for lang in STOPWORDS}
        best = None
        best_lang = F.lit("und")
        for lang in sorted(STOPWORDS):  # deterministic tie-break
            h = hits[lang]
            if best is None:
                best = F.when(h > 0, h).otherwise(F.lit(0))
                best_lang = F.when(h > 0, F.lit(lang)).otherwise(F.lit("und"))
            else:
                better = h > best
                best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
                best = F.when(better, h).otherwise(best)
        return best_lang

    return _let(
        norm_tokens(col),
        lambda toks: _let(
            F.struct(
                *[
                    F.size(F.filter(toks, hit_filter(words))).alias(lang)
                    for lang, words in STOPWORDS.items()
                ]
            ),
            pick,
        ),
    )


def fingerprint(col) -> Column:
    """Normalized-content fingerprint: md5 over the space-joined token stream
    (whitespace/punct/case-insensitive duplicate detector)."""
    return F.md5(F.concat_ws(" ", norm_tokens(col)))


def _shingles_of(tk, n: int) -> Column:
    """n-word shingles over an ALREADY-BOUND token array (a _let lambda
    variable — never pass a raw norm_tokens(col) expression here, each
    slice would re-tokenize). Uses slice() (bounds-safe) so the dead
    branch of the `when` can never throw under ANSI mode (Spark evaluates
    both branches)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))
    return F.when(
        F.size(tk) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(tk, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(col, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), [] when fewer than n tokens.

    The token array is LET-BOUND (_let): Catalyst skips subexpression
    elimination inside higher-order-function lambdas, so slicing
    `norm_tokens(col)` directly in the per-index lambda re-runs the whole
    regexp+split tokenization once per shingle POSITION — ~O(doc tokens)
    re-tokenizations per row (the same measured 6.7x cost as
    operators/dsir.word_grams). A lambda variable is evaluated once."""
    return _let(norm_tokens(col), lambda tk: _shingles_of(tk, n))


def ngram_repetition(col, n: int = 3) -> Column:
    """Gopher-style duplicate n-gram fraction: 1 - distinct/total over the
    word n-gram shingles; 0.0 for docs with fewer than n tokens. High values
    flag boilerplate / machine-looped text a training pipeline should drop.

    Per-row native arithmetic — no shuffle, no UDF, and bit-identical across
    engines, so the DuckDB oracle twin needs no rounding slack. ONE _let
    binds the token array for both the shingle build and the total count
    (previously two independent tokenizations per row); the shingle array
    itself is still referenced exactly once — the total comes from
    size(tokens)-(n-1), which equals size(shingles) whenever positive."""

    def build(tk):
        n_total = F.size(tk) - (n - 1)
        return F.when(
            n_total > 0,
            (n_total - F.size(F.array_distinct(_shingles_of(tk, n))))
            .cast("double")
            / n_total,
        ).otherwise(F.lit(0.0))

    return _let(norm_tokens(col), build)


# Gopher document-quality rules (Rae et al., "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", 2021, §A1.1 — public).
# Thresholds as published; every rule is a per-row native expression (no
# shuffle, no UDF), so the filter runs scan-side at any corpus scale.
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(col) -> "Column":
    """Struct of the Gopher §A1.1 quality signals + the composite keep flag.

    Fields: word_count, mean_word_len, alpha_word_ratio, symbol_word_ratio,
    bullet_line_ratio, ellipsis_line_ratio, stop_hits, keep. Ratios are
    rounded to 6 dp BEFORE the threshold comparisons so the keep flag is
    bit-stable across engines (an unrounded 0.1-vs-0.1+1e-17 boundary would
    flip between float sum orders); the same rounding is documented for the
    DuckDB oracle twin."""
    r6 = lambda c: F.round(c, 6)  # noqa: E731 — local shorthand

    def metrics(b):
        # b: _let-bound struct(t: token array, l: line array) — every rule
        # reads the bound arrays instead of re-tokenizing (the naive form
        # tokenizes ~6x and re-splits lines 2x per row)
        toks, lines = b["t"], b["l"]
        n = F.size(toks)
        nd = n.cast("double")
        mean_wl = r6(
            F.when(
                n > 0, F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / nd
            ).otherwise(F.lit(0.0))
        )
        alpha_ratio = r6(
            F.when(n > 0, F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / nd)
            .otherwise(F.lit(0.0))
        )
        # '#' and '...' occurrences per word (non-overlapping leftmost count
        # via replace-length delta — identical semantics in DuckDB)
        n_hash = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
        n_ellipsis = (
            F.length(col) - F.length(F.regexp_replace(col, r"\.\.\.", ""))
        ) / 3
        symbol_ratio = r6(
            F.when(n > 0, (n_hash + n_ellipsis) / nd).otherwise(F.lit(0.0))
        )
        n_lines = F.size(lines).cast("double")
        bullet_ratio = r6(
            F.size(
                F.filter(
                    lines,
                    lambda l: l.startswith("- ")
                    | l.startswith("* ")
                    | l.startswith("•"),
                )
            )
            / n_lines
        )
        ellipsis_line_ratio = r6(
            F.size(F.filter(lines, lambda l: l.endswith("..."))) / n_lines
        )
        stop_hits = F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPS]),
            )
        )
        return F.struct(
            n.alias("word_count"),
            mean_wl.alias("mean_word_len"),
            alpha_ratio.alias("alpha_word_ratio"),
            symbol_ratio.alias("symbol_word_ratio"),
            bullet_ratio.alias("bullet_line_ratio"),
            ellipsis_line_ratio.alias("ellipsis_line_ratio"),
            stop_hits.alias("stop_hits"),
        )

    def with_keep(m):
        # second _let level: the keep rule reads the ROUNDED metric values
        # from the bound struct instead of re-evaluating each metric tree
        keep = (
            (m["word_count"] >= 50)
            & (m["word_count"] <= 100_000)
            & (m["mean_word_len"] >= 3.0)
            & (m["mean_word_len"] <= 10.0)
            & (m["symbol_word_ratio"] <= 0.1)
            & (m["bullet_line_ratio"] <= 0.9)
            & (m["ellipsis_line_ratio"] <= 0.3)
            & (m["alpha_word_ratio"] >= 0.8)
            & (m["stop_hits"] >= 2)
        )
        return F.struct(
            m["word_count"].alias("word_count"),
            m["mean_word_len"].alias("mean_word_len"),
            m["alpha_word_ratio"].alias("alpha_word_ratio"),
            m["symbol_word_ratio"].alias("symbol_word_ratio"),
            m["bullet_line_ratio"].alias("bullet_line_ratio"),
            m["ellipsis_line_ratio"].alias("ellipsis_line_ratio"),
            m["stop_hits"].alias("stop_hits"),
            keep.alias("keep"),
        )

    bound = F.struct(norm_tokens(col).alias("t"), F.split(col, "\n").alias("l"))
    return _let(bound, lambda b: _let(metrics(b), with_keep))
