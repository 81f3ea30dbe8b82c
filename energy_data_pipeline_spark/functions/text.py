"""Text-analysis expression library for the training-data pipeline surface.

All JVM-side (built-in functions only) so they scale to 100 TB of
documents without a Python round-trip: language-ID (stopword-marker
heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting, and word n-gram shingling used by the near-dup
operators in operators/neardup.py.

Expression-level note: higher-order-function trees get neither
whole-stage codegen nor subexpression elimination, so a subexpression
referenced N times is evaluated N times per row. ``_let`` binds a value
once as a HOF lambda variable (transform over a one-element array), so
multi-reference expressions like shingling (which indexes the word array
~3·|shingles| times) stay linear instead of quadratic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import rnd

# Tiny per-language marker lexicons (public-knowledge function words).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("的", "是", "了", "在", "我"),
}

# BPE-ish token pattern: letter runs, digit runs, single other glyphs.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` once and evaluate ``body`` against the binding.

    transform() evaluates its input array a single time and exposes the
    element as a lambda variable — references inside ``body`` are
    variable lookups, not re-evaluations of the value's expression tree.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def words(col: Column | str) -> Column:
    """Whitespace tokenization (empty tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def token_count_ws(col: Column | str) -> Column:
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens — proxy for subword token cost."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def _marker_hits(wcol: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(wcol, lambda w: F.array_contains(arr, F.lower(w))))


def lang_id_from_words(w: Column) -> Column:
    """lang_id over an already-tokenized word array — the
    tokenized-silver path (no re-split of the raw text)."""

    def _pick(scored: Column) -> Column:
        best = F.array_max(
            F.transform(
                scored,
                lambda s: F.struct(s["hits"].alias("hits"), F.lit(0).alias("z")),
            )
        )
        first_best = F.filter(scored, lambda s: s["hits"] == best["hits"])[0]["lang"]
        return F.when(best["hits"] > 0, first_best).otherwise(F.lit("und"))

    return _let(
        F.array(
            *[
                F.struct(
                    _marker_hits(w, LANG_MARKERS[lang]).alias("hits"),
                    F.lit(lang).alias("lang"),
                )
                for lang in sorted(LANG_MARKERS)
            ]
        ),
        _pick,
    )


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword-marker language heuristic.

    Scores each language by marker-word hit count; returns the argmax
    (ties broken by language code order), 'und' when no marker hits.
    """
    return _let(words(col), lang_id_from_words)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation = not letter/digit/underscore/whitespace, Unicode-aware
    (ASCII \\w would classify every CJK character as punctuation and
    zero the quality score of zh documents lang_id supports)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}_\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    return _let(
        words(col),
        lambda w: F.when(
            F.size(w) > 0, _marker_hits(w, stopwords) / F.size(w)
        ).otherwise(F.lit(0.0)),
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:
    rewards moderate length, low punctuation density, presence of
    function words — the standard cheap pre-filter for training corpora.

    The word array is bound once (``_let``) — the inlined form split
    the text twice (token count + stopword ratio); values identical."""
    c = F.col(col) if isinstance(col, str) else col

    def over_words(w: Column) -> Column:
        n_tok = F.size(w)
        len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
        punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5)
        stop_raw = F.when(
            n_tok > 0, _marker_hits(w, LANG_MARKERS["en"]) / n_tok
        ).otherwise(F.lit(0.0))
        stop_score = F.least(stop_raw * 5, F.lit(1.0))
        return rnd((len_score * 0.5 + punct_pen * 0.25 + stop_score * 0.25), 6)

    return _let(words(c), over_words)


# the C4/Gopher-style admission thresholds shared by the
# txt_quality_filtered_corpus catalog query and the corpus ingest job
MIN_TOKENS = 10
MAX_PUNCT_RATIO = 0.3
MIN_QUALITY = 0.4
MAX_DUP_WORD_RATIO = 0.6


def quality_metrics(col: Column | str = "text") -> Column:
    """All quality gate inputs as ONE struct over a single word-split
    and a single punctuation pass:
    (n_tokens int, punct_raw double, stop_raw double, quality rounded,
    dup_raw double). Each field is the identical expression the
    standalone helpers produce — consumers (txt_quality_scores, the
    filter funnel) previously re-split the text once per metric because
    HOF trees get no subexpression elimination under interpreted
    evaluation."""
    c = F.col(col) if isinstance(col, str) else col

    def over_words(w: Column) -> Column:
        def over_punct(pr: Column) -> Column:
            n_tok = F.size(w)
            stop_raw = F.when(
                n_tok > 0, _marker_hits(w, LANG_MARKERS["en"]) / n_tok
            ).otherwise(F.lit(0.0))
            len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
            punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - pr * 5)
            stop_score = F.least(stop_raw * 5, F.lit(1.0))
            quality = rnd(
                (len_score * 0.5 + punct_pen * 0.25 + stop_score * 0.25), 6
            )
            return F.struct(
                n_tok.alias("n_tokens"),
                pr.alias("punct_raw"),
                stop_raw.alias("stop_raw"),
                quality.alias("quality"),
                dup_word_ratio_from_words(w).alias("dup_raw"),
            )

        return _let(punct_ratio(c), over_punct)

    return _let(words(c), over_words)


def quality_keep(col: Column | str = "text") -> Column:
    """The standard pre-training keep/drop cascade as one predicate:
    drop too-short, punctuation-heavy, low-quality, or self-repeating
    documents. Thresholds compare ROUNDED values (rnd, the
    DuckDB-parity half-up) so keep/drop decisions at the boundaries are
    engine-portable — an oracle recomputing the ratios with a different
    FP summation order lands on the same side.

    Round-13: the word array and the punctuation ratio are bound ONCE
    (``_let``) and every gate reads the bindings — the inlined form
    re-split the text four times and re-ran the punctuation
    regexp_replace twice per row (HOF trees do not get subexpression
    elimination under interpreted evaluation). Every gate's VALUE is
    the identical expression over the bound array, so keep/drop
    decisions are unchanged (oracle green at all three SFs)."""
    c = F.col(col) if isinstance(col, str) else col

    def over_words(w: Column) -> Column:
        n_tok = F.size(w)

        def over_punct(pr: Column) -> Column:
            len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
            punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - pr * 5)
            stop_raw = F.when(
                n_tok > 0, _marker_hits(w, LANG_MARKERS["en"]) / n_tok
            ).otherwise(F.lit(0.0))
            stop_score = F.least(stop_raw * 5, F.lit(1.0))
            quality = rnd(
                (len_score * 0.5 + punct_pen * 0.25 + stop_score * 0.25), 6
            )
            return (
                (n_tok >= MIN_TOKENS)
                & (rnd(pr, 6) <= MAX_PUNCT_RATIO)
                & (quality >= MIN_QUALITY)
                & (rnd(dup_word_ratio_from_words(w), 6) <= MAX_DUP_WORD_RATIO)
            )

        return _let(punct_ratio(c), over_punct)

    return _let(words(c), over_words)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: lowercase, distinct
    whitespace tokens, sorted, md5 — the classic 'fingerprint' key for
    clustering near-identical documents."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_sort(F.array_distinct(words(F.lower(c))))
    return F.md5(F.array_join(toks, " "))


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-bound word-array column.

    Built as a right-fold of zip_with(concat) over n shifted slices —
    linear array passes, measured ~2× faster than per-index element_at
    under interpreted HOF evaluation.
    """
    sz = F.size(w)
    m = sz - F.lit(n - 1)  # number of shingles
    slices = [F.slice(w, j + 1, m) for j in range(n)]

    def _zip_concat(a: Column, b: Column) -> Column:
        return F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y))

    grams = slices[-1]
    for s in reversed(slices[:-1]):
        grams = _zip_concat(s, grams)
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def dup_word_ratio_from_words(w: Column) -> Column:
    """dup_word_ratio over an already-tokenized word array — the
    tokenized-silver path (no re-split of the raw text)."""
    return F.when(
        F.size(w) > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w),
    ).otherwise(F.lit(0.0))


def dup_word_ratio(col: Column | str) -> Column:
    """Share of words that are repeats of an earlier word — the cheap
    repetition signal used to filter degenerate/boilerplate documents
    from training corpora (1 - distinct/total; 0.0 for empty text)."""
    return _let(words(col), dup_word_ratio_from_words)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct not applied).

    Texts with fewer than ``n`` words yield an empty array (guarded:
    Spark's ``sequence(1, 0)`` would DESCEND, not return empty). The
    word array is let-bound so the tokenizer runs once per row, not once
    per element_at reference.
    """
    return _let(words(col), lambda w: shingles_from_words(w, n))


# ---------------------------------------------------------------- PII scrub
# Patterns chosen from the regex subset Java (Spark) and RE2 (DuckDB,
# Go/Rust scanners) interpret IDENTICALLY — char classes, bounded
# quantifiers, \b word boundaries; no lookaround, no backrefs — so the
# engine and any SQL oracle redact byte-for-byte the same. Order
# matters and is part of the contract: emails are scrubbed before IPs
# (an email's host part may itself look like an IPv4 literal).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,}\d", "<PHONE>"),
]


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrence count of one PII pattern (pre-redaction text)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.regexp_count(c, F.lit(pat))


def redact_pii(col: Column | str) -> Column:
    """All PII patterns replaced by their placeholder tags, applied in
    PII_PATTERNS order. Pure JVM regexp_replace chain — codegen, no
    UDF, linear single pass per pattern."""
    c = F.col(col) if isinstance(col, str) else col
    for _kind, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c
