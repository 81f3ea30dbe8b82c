"""Text-analysis expression library for the training-data pipeline surface.

All JVM-side (built-in functions only) so they scale to 100 TB of
documents without a Python round-trip: language-ID (stopword-marker
heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting, and word n-gram shingling used by the near-dup
operators in operators/neardup.py.
"""

from __future__ import annotations

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


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword-marker language heuristic.

    Scores each language by marker-word hit count; returns the argmax
    (ties broken by language code order), 'und' when no marker hits.
    """
    w = words(col)
    scored = F.array(
        *[
            F.struct(
                _marker_hits(w, LANG_MARKERS[lang]).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # max over (hits, lang-desc) then flip: pick highest hits, lowest code.
    best = F.array_max(
        F.transform(
            scored,
            lambda s: F.struct(
                s["hits"].alias("hits"),
                # invert lexicographic order of lang so array_max prefers
                # the alphabetically-first code on hit ties
                F.lit(0).alias("z"),
                s["lang"].alias("lang"),
            ),
        )
    )
    first_best = F.filter(
        scored, lambda s: s["hits"] == best["hits"]
    )[0]["lang"]
    return F.when(best["hits"] > 0, first_best).otherwise(F.lit("und"))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    w = words(col)
    return F.when(F.size(w) > 0, _marker_hits(w, stopwords) / F.size(w)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:
    rewards moderate length, low punctuation density, presence of
    function words — the standard cheap pre-filter for training corpora.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count_ws(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5)
    stop_score = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    return rnd((len_score * 0.5 + punct_pen * 0.25 + stop_score * 0.25), 6)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: lowercase, distinct
    whitespace tokens, sorted, md5 — the classic 'fingerprint' key for
    clustering near-identical documents."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_sort(F.array_distinct(words(F.lower(c))))
    return F.md5(F.array_join(toks, " "))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct not applied).

    Texts with fewer than ``n`` words yield an empty array (guarded:
    Spark's ``sequence(1, 0)`` would DESCEND, not return empty).
    """
    w = words(col)
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
