"""C4-style line-level deduplication — drop repeated boilerplate LINES
across the whole corpus, keeping each line's first occurrence, and
rebuild every document from its surviving lines.

This is the intra-document complement of the document-level near-dup
family (operators/neardup.py): near-dup removes whole documents;
line dedup strips the navigation bars / cookie banners / license
footers that repeat across millions of otherwise-unique pages (the C4
paper's "discard repeated lines" rule, also used by Gopher/RefinedWeb).

Semantics:
- a line is ELIGIBLE for dedup when it has >= ``min_words`` words —
  short lines (headings, list bullets, blank separators) repeat
  naturally and are always kept, which also prevents the corpus's
  blank lines from being deduped into a single survivor;
- the kept occurrence of an eligible line is the lexicographic minimum
  (doc_id, line_idx) — deterministic across engines and runs;
- documents are reassembled from surviving lines in original order;
  a document whose every line was a known boilerplate line keeps a row
  with n_lines_kept = 0 (the caller decides whether to drop it).

Scale shape (100 TB posture):
- First-occurrence is ``min(struct(doc_id, idx))`` grouped by line —
  a codegen'd aggregate with map-side partial combine, NOT a window:
  a row_number window partitioned by line would sort every viral
  line's million-row group on one reducer; the min-struct aggregate
  reduces the same group to one row map-side before the shuffle.
- The exploded line table is persisted (two consumers: the firsts
  aggregate and the join-back) — ``pins_out`` exposes the pin for the
  catalog's prepared-plan memo.
- The join-back is a plain shuffled join keyed on the line text; per-
  key volume equals the line's document frequency (linear, never
  quadratic — only one side carries duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import words
from ..sources.tables import fan_out

LINE_DEDUP_MIN_WORDS = 5


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = LINE_DEDUP_MIN_WORDS,
    pins_out: list | None = None,
) -> DataFrame:
    """Returns one row per document: ``<id_col>, n_lines, n_lines_kept,
    text_hash`` where text_hash = md5 of the surviving lines re-joined
    with newlines (carrying the hash instead of the rebuilt text keeps
    the result compact while still proving byte-identical reassembly
    cross-engine)."""
    lines = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        .withColumn("_elig", F.size(words(F.col("line"))) >= min_words)
        # first-occurrence identity travels as an 8-byte xxhash64
        # fingerprint: the groupBy + join below shuffle on this key,
        # and a full line as the shuffle key is unbounded (collision
        # P ≈ n²/2⁶⁵; the string-keyed DuckDB oracle would fail the
        # gate loudly on one). The line TEXT stays in this pinned
        # frame for the reassembly hash only.
        .withColumn("_lh", F.xxhash64("line"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if pins_out is not None:
        pins_out.append((lines, StorageLevel.MEMORY_AND_DISK))

    firsts = (
        lines.filter(F.col("_elig"))
        .groupBy("_lh")
        .agg(F.min(F.struct(id_col, "idx")).alias("_first"))
    )
    # eligibility is a pure function of the line text, so an ineligible
    # line can never match `firsts` (which holds only eligible lines) —
    # the left join leaves its `_first` NULL and the keep rule below
    # admits it unconditionally
    marked = lines.join(firsts, "_lh", "left").withColumn(
        "_keep",
        (~F.col("_elig"))
        | (F.col("_first") == F.struct(F.col(id_col), F.col("idx"))),
    )
    kept_struct = F.when(F.col("_keep"), F.struct("idx", "line"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_keep").cast("bigint")).alias("n_lines_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
                "\n",
            )
        ).alias("text_hash"),
    )
