"""Distributed BPE tokenizer training (Sennrich et al. 2016, arXiv
1508.07909) — the iterative companion of the one-round
``txt_bpe_merge_candidates`` catalog statistic.

Driver-coordinated loop, the engine's established iterative-algorithm
shape (operators/ivf.kmeans_lloyd): the VOCABULARY (word, freq,
symbol-array) lives distributed; each merge round runs ONE aggregate
over it (adjacent-pair counts, map-side combined, weighted by word
frequency), collects exactly ONE row (the argmax pair — count desc,
pair asc tie-break, deterministic across runs), and applies the merge
as a pure expression fold over the symbol arrays. Work per round is
|vocab| × avg_symbols — independent of corpus size; the corpus is
touched once, to build the word-frequency table.

Convention: words symbolize to plain characters (no end-of-word
marker); a deployment wanting Sennrich's ``</w>`` appends it to the
word strings before calling. Merged symbols are concatenations, so a
merge's output can never re-trigger the same round's pair (it is
strictly longer than either part) — the expression fold therefore
implements the leftmost non-overlapping scan exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def symbolize(vocab: DataFrame, word_col: str = "w") -> DataFrame:
    """(word, freq) → (word, freq, syms): initial character split."""
    w = F.col(word_col)
    syms = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.substring(w, i, F.lit(1)),
    )
    return vocab.withColumn("syms", syms)


def _pair_counts(vocab: DataFrame, freq_col: str) -> DataFrame:
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.col(freq_col).alias("_f"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("_f").alias("c"))
    )


def _merge_expr(a: str, b: str) -> Column:
    """Leftmost non-overlapping merge of adjacent (a, b) in ``syms``
    as an expression fold: append each symbol, but when the running
    tail is ``a`` and the next symbol is ``b``, replace the tail with
    the merged token."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges over a (word, freq) vocabulary.

    Returns (merges, final_vocab) where merges is the ordered list of
    (a, b) pairs learned and final_vocab carries the symbolized words
    after all merges. Stops early when no pair occurs at least twice
    (merging a count-1 pair memorizes a single word — the standard
    trainer cutoff). Every ``checkpoint_every`` rounds the symbol
    frame is localCheckpointed: the fold expression nests per round,
    and an unbounded expression tree would blow analysis time long
    before data size matters (the kmeans_lloyd lineage rule)."""
    cur = symbolize(vocab, word_col).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[str, str]] = []
    try:
        for r in range(n_merges):
            top = (
                _pair_counts(cur, freq_col)
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = cur.withColumn("syms", _merge_expr(a, b))
            if (r + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()  # materialize before dropping the parent
            cur.unpersist(blocking=False)
            cur = nxt
        return merges, cur
    except Exception:
        cur.unpersist(blocking=False)
        raise


def apply_merges(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize a (word, ...) frame with an ALREADY-TRAINED merge list
    (the inference half: apply merges in training order). Same fold
    and lineage rules as training, no aggregates."""
    cur = symbolize(vocab, word_col)
    for r, (a, b) in enumerate(merges):
        cur = cur.withColumn("syms", _merge_expr(a, b))
        if (r + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur
