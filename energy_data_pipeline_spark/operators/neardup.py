"""Near-duplicate detection for training corpora.

Three scale paths, all deterministic and engine-portable (hashing is
md5-based so a SQL oracle can reproduce results bit-for-bit):

- n-gram Jaccard (exact): explode distinct shingles, self-join on
  shingle, count overlaps. Quadratic only within shingle buckets —
  correct baseline, used to verify the approximate paths.
- MinHash + LSH: per-doc signature of NUM_HASHES minima of affine
  permutations of an md5-derived base hash per shingle; band signatures
  bucket candidate pairs, exact Jaccard verifies. At 100 TB this is the
  standard shuffle-light path: the only wide exchange is on
  (band_idx, band_sig) buckets.
- SimHash: 64-bit sign-aggregated fingerprint from per-word md5 bits
  (carried as 4x16-bit block ints so every engine's signed-64 arithmetic
  stays exact); near-dups = Hamming distance <= threshold on
  pigeonhole-block-joined candidates.

Spark-first: everything is built-in JVM expressions — codegen'd
explode/min aggregates for the minhash signatures, higher-order
functions (transform / array_intersect) elsewhere — no Python UDFs.

Execution note: the signature stages are persist()ed (MEMORY_AND_DISK)
before any self-join. Two reasons, both structural:
1. CollapseProject would otherwise inline the heavy HOF expression trees
   (split → shingle → k× md5-min) into every downstream consumer, and
   higher-order functions get neither whole-stage codegen nor
   subexpression elimination — the work multiplies instead of pipelining.
2. A self-join recomputes its whole upstream lineage on both branches;
   an InMemoryRelation makes the signature table compute-once, exactly
   like Spark ML's own MinHashLSH does internally. Signature tables are
   tiny relative to the corpus (k hashes/doc), so this holds at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.rounding import rnd

from ..functions.text import shingles_from_words, words
from ..sources.tables import fan_out

# MinHash layout: 96 hash functions banded as 32 bands x 3 rows.
# Candidate-recall S-curve: P(candidate | jaccard=j) = 1 - (1 - j^3)^32,
# which is 98.6% at the engine's declared JACCARD_THRESHOLD=0.5 (99.97%
# at j=0.6, ~100% above). The S-curve midpoint (~0.32) sits BELOW the
# threshold on purpose: candidate generation errs toward recall and the
# exact-Jaccard verify stage removes the sub-threshold candidates, so
# false positives cost only verify time while false negatives are
# unrecoverable. Measured-recall regression test:
# tests/test_operators_unit.py::TestMinHashRecall.
NUM_HASHES = 96
BAND_ROWS = 3  # 32 bands of 3 hashes

# The k hash functions are affine permutations (a*h + b) mod P of ONE
# md5-derived 31-bit base hash per shingle — the standard MinHash
# construction. One md5 per shingle instead of k: at 96 hashes the
# md5-per-(shingle,k) scheme would cost 8x the old 12-hash version;
# this costs ~1/12th of it in hashing and 96 cheap integer passes.
# P = 2^31 - 1 (prime): products a*h < 2^62 stay exact in any engine's
# signed-64 arithmetic, so the DuckDB oracle reproduces bit-for-bit.
MINHASH_PRIME = 2_147_483_647


def _perm_params(k: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash function ``k`` — derived from md5
    so they are reproducible constants, not RNG state."""
    a = int(hashlib.md5(f"mh-a:{k}".encode()).hexdigest()[:8], 16) % (
        MINHASH_PRIME - 1
    ) + 1
    b = int(hashlib.md5(f"mh-b:{k}".encode()).hexdigest()[:8], 16) % MINHASH_PRIME
    return a, b


MINHASH_PERMS: list[tuple[int, int]] = [_perm_params(k) for k in range(NUM_HASHES)]
SIMHASH_BITS = 64  # 16 md5 nibbles x 4 bits — one bit-vote per bit
SIMHASH_BLOCKS = 4  # pigeonhole blocks for max_hamming=3 (d+1 blocks)
SIMHASH_BITS_PER_BLOCK = SIMHASH_BITS // SIMHASH_BLOCKS
# df cap for the exact inverted-index path: shingles present in more
# documents than this are dropped from the index (Gopher/C4-style hot
# n-gram removal) — one viral shingle would otherwise make its bucket
# quadratic in corpus size. Sizes n1/n2 stay full-set, so capped-index
# Jaccard is a lower bound that only affects pairs sharing hot shingles.
NGRAM_MAX_DF = 256


def _pin(
    df: DataFrame,
    memory_only: bool = False,
    pins_out: list | None = None,
) -> DataFrame:
    """Materialization barrier: stops CollapseProject from inlining the
    expensive expressions upstream of this point and makes the result
    compute-once across self-join branches.

    ``memory_only`` for tables with a hard small-size guarantee (band
    signatures: k BIGINTs per doc) — skips the spill-accounting path;
    MEMORY_ONLY evicts instead of spilling, and recompute of a dropped
    block is cheap for these.

    ``pins_out`` (if given) collects (frame, level) so a caller that
    memoizes the finished plan (plans/plan_cache.py) can re-register
    the pins after a cache clear."""
    level = (
        StorageLevel.MEMORY_ONLY if memory_only else StorageLevel.MEMORY_AND_DISK
    )
    out = df.persist(level)
    if pins_out is not None:
        pins_out.append((out, level))
    return out


def _word_array(df: DataFrame, text_col: str) -> Column:
    """Word array for ``text_col``: passed through when the column is
    ALREADY a tokenized array (the tokenized-silver path — the catalog
    pins one corpus-wide word-array frame and every shingling operator
    reads it), split from the raw string otherwise."""
    from pyspark.sql.types import ArrayType

    if isinstance(df.schema[text_col].dataType, ArrayType):
        return F.col(text_col)
    return words(F.col(text_col))


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingle set per document (array column).
    ``text_col`` may be raw text OR an already-tokenized word array."""
    return df.select(
        F.col(id_col),
        F.array_distinct(
            shingles_from_words(_word_array(df, text_col), n)
        ).alias("shingle_set"),
    ).filter(F.size("shingle_set") > 0)


def shingle_base_hash(s: Column) -> Column:
    """31-bit base hash of a shingle: first 8 md5 hex digits as an
    integer, mod MINHASH_PRIME — identical in DuckDB as
    ``('0x' || substr(md5(x),1,8))::UBIGINT % P``."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % F.lit(
        MINHASH_PRIME
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(id, mh_0..mh_{n-1}) signature table: min over shingles of the
    k-th affine permutation of the md5-derived base hash
    (``shingle_set`` column required — see doc_shingles).

    Explode + k plain ``min`` aggregates rather than k
    array_min(transform) passes: higher-order functions are interpreted
    (no whole-stage codegen, no CSE), so k HOF passes cost k interpreted
    walks of every shingle array, and even the per-shingle md5 would run
    interpreted inside a ``transform``. The exploded form computes md5 +
    base hash once per (doc, shingle) row inside whole-stage codegen and
    keeps all k permutations inside one codegen'd aggregate with
    map-side partial aggregation — the shuffle carries only the k
    partial minima per doc per partition, and the doc-id clustering it
    produces feeds the banding stage anyway.
    """
    if num_hashes > len(MINHASH_PERMS):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_PERMS)} "
            "precomputed permutations (extend NUM_HASHES / MINHASH_PERMS)"
        )
    exploded = sh.select(F.col(id_col), F.explode("shingle_set").alias("_s")).select(
        F.col(id_col), shingle_base_hash(F.col("_s")).alias("h")
    )
    return exploded.groupBy(id_col).agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
                f"mh_{k}"
            )
            for k, (a, b) in enumerate(MINHASH_PERMS[:num_hashes])
        ]
    )


def _banded(
    sigs: DataFrame, id_col: str, num_hashes: int, band_rows: int
) -> DataFrame:
    """(id, band_idx, r0..r{band_rows-1}) band rows for a signature
    table — the LSH INDEX representation: persist/write this table and
    new batches can probe it without re-minhashing the corpus
    (``band_signature_table`` / ``probe_index_near_dups``)."""
    n_bands = num_hashes // band_rows
    row_cols = [f"r{j}" for j in range(band_rows)]
    bands = []
    for b in range(n_bands):
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                *[
                    F.col(f"mh_{b * band_rows + j}").alias(row_cols[j])
                    for j in range(band_rows)
                ],
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.*")


def band_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """The writable LSH index for a corpus: one row per (doc, band)
    with the band's minhash tuple as plain BIGINT columns. Maintaining
    this table is what makes near-dup detection INCREMENTAL at 100 TB —
    a new batch minhashes only itself and equi-joins the index on
    (band_idx, r*), instead of re-signaturing the whole corpus per
    ingest. Write it partitioned/bucketed by (band_idx, r0) so probe
    joins co-locate."""
    sh = doc_shingles(fan_out(df), id_col, text_col, n)
    return _banded(minhash_signatures(sh, id_col, num_hashes), id_col, num_hashes, band_rows)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    pins_out: list | None = None,
) -> DataFrame:
    """Band the signature, bucket-join to produce candidate (id1, id2).

    The band signature is the raw tuple of its ``band_rows`` minhash
    values, joined directly as equi-join keys — an md5/concat digest of
    the tuple would add millions of string hashes per corpus pass purely
    to rename a join key the engine hashes again anyway (and the SQL
    oracle would have to reproduce the digest byte-for-byte). All keys
    stay BIGINT inside whole-stage codegen.
    """
    row_cols = [f"r{j}" for j in range(band_rows)]
    # Explicit repartition on the bucket key before the pin, for two
    # reasons: (1) AQE coalesces the upstream signature aggregate to a
    # handful of partitions (its output is tiny — k longs per doc), and
    # without this the band explode, the cache build AND the self-join
    # would all run at that crippled parallelism; (2) hash-partitioning
    # by the join key makes the cached table co-partitioned with itself,
    # so the bucket self-join needs no further exchange.
    try:
        n_part = int(
            sigs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        # platforms that set this to a non-numeric value (e.g. "auto"
        # under auto-optimized shuffle) — fall back to cluster default
        n_part = sigs.sparkSession.sparkContext.defaultParallelism
    exploded = _pin(
        _banded(sigs, id_col, num_hashes, band_rows).repartition(
            n_part, "band_idx", *row_cols
        ),
        memory_only=True,  # k BIGINTs per doc — bounded tiny
        pins_out=pins_out,
    )
    a = exploded.alias("a")
    b_ = exploded.alias("b")
    key_eq = (F.col("a.band_idx") == F.col("b.band_idx"))
    for rc in row_cols:
        key_eq = key_eq & (F.col(f"a.{rc}") == F.col(f"b.{rc}"))
    return (
        a.join(b_, key_eq & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        # Dedup pairs (a pair collides in up to n_bands bands) WITHOUT a
        # dedicated (id1,id2) exchange: hash-partition by id1 alone —
        # HashPartitioning(id1) satisfies the dropDuplicates aggregate's
        # ClusteredDistribution(id1,id2) (same id1 → same partition), so
        # EnsureRequirements inserts no further exchange, AND the output
        # arrives already partitioned on id1 for the verify stage's
        # first shingle join. One exchange now does the work of two.
        .repartition(n_part, "id1")
        .dropDuplicates(["id1", "id2"])
    )


def jaccard_on_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for candidate pairs via array_intersect on the
    (broadcastable at verify-stage cardinality) shingle sets."""
    s1 = sh.select(F.col(id_col).alias("id1"), F.col("shingle_set").alias("_s1"))
    s2 = sh.select(F.col(id_col).alias("id2"), F.col("shingle_set").alias("_s2"))
    j = (
        pairs.join(s1, "id1").join(s2, "id2")
        .withColumn("n_common", F.size(F.array_intersect("_s1", "_s2")))
        .withColumn(
            "jaccard",
            rnd(
                F.col("n_common")
                / (F.size("_s1") + F.size("_s2") - F.col("n_common")),
                6,
            ),
        )
    )
    return j.select("id1", "id2", "jaccard")


def minhash_lsh_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    pins_out: list | None = None,
) -> DataFrame:
    """MinHash→LSH→verify pipeline; returns (id1, id2, jaccard) pairs.

    ``pins_out`` collects the internally persisted sub-frames (shingle
    sets, band table) with their storage levels so the catalog layer
    can memoize the finished plan and re-register the pins after a
    cache clear (plans/plan_cache.py)."""
    sh = _pin(doc_shingles(fan_out(df), id_col, text_col, n), pins_out=pins_out)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_rows, pins_out)
    return jaccard_on_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


def probe_index_near_dups(
    batch: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    pins_out: list | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and an already-indexed corpus
    — the incremental ingest path: the batch is shingled/minhashed
    (batch-sized work), its band rows equi-join the persisted
    ``band_signature_table`` index on (band_idx, r*), and the exact
    Jaccard verify re-shingles ONLY the corpus docs that surfaced as
    candidates (semi-join before shingling — the corpus text is never
    scanned beyond the candidate set's rows at any corpus size).
    Returns (batch_id, corpus_id, jaccard) with jaccard >= threshold.

    ``pins_out`` collects the internal batch-shingle pin so the caller
    can unpersist it once the probe's consumers have run — per-batch
    ingest jobs would otherwise register one never-released cache entry
    per batch (jobs/neardup_ingest.py releases it in its finally).
    """
    row_cols = [f"r{j}" for j in range(band_rows)]
    sh_batch = _pin(
        doc_shingles(fan_out(batch), id_col, text_col, n), pins_out=pins_out
    )
    bands_batch = _banded(
        minhash_signatures(sh_batch, id_col, num_hashes), id_col, num_hashes, band_rows
    )
    cand = (
        bands_batch.withColumnRenamed(id_col, "batch_id")
        .join(index.withColumnRenamed(id_col, "corpus_id"), ["band_idx", *row_cols])
        .select("batch_id", "corpus_id")
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    cand_corpus = corpus.join(
        cand.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sh_corpus = doc_shingles(cand_corpus, id_col, text_col, n)
    s1 = sh_batch.select(
        F.col(id_col).alias("batch_id"), F.col("shingle_set").alias("_s1")
    )
    s2 = sh_corpus.select(
        F.col(id_col).alias("corpus_id"), F.col("shingle_set").alias("_s2")
    )
    return (
        cand.join(s1, "batch_id")
        .join(s2, "corpus_id")
        .withColumn("n_common", F.size(F.array_intersect("_s1", "_s2")))
        .withColumn(
            "jaccard",
            rnd(
                F.col("n_common")
                / (F.size("_s1") + F.size("_s2") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def _pair_overlap_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_doc_freq: int | None,
    pins_out: list | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared skeleton of the exact set-overlap scorers: shingle
    inverted index → df-capped self-join → per-pair overlap counts.

    Returns ``(common, sizes)`` where ``common`` is (id1, id2,
    n_common) over id1 < id2 and ``sizes`` is (id_col, n_sh) — the
    FULL shingle-set sizes (the df cap thins the index, not the
    denominators, so capped pairs get a score lower bound).
    """
    sh = _pin(doc_shingles(fan_out(df), id_col, text_col, n), pins_out=pins_out)
    # the inverted index carries xxhash64 FINGERPRINTS, not shingle
    # strings: the window + self-join below shuffle on this key, and a
    # ~45-byte gram string as the shuffle key measured superlinear at
    # 1M docs (round-10 span probe — 8-byte keys were 7.8x faster on
    # the analogous audit). Collision P ≈ n²/2⁶⁵; pair counts only
    # ever reference doc ids, never the gram text.
    inv = sh.select(
        id_col, F.explode("shingle_set").alias("_s")
    ).select(id_col, F.xxhash64("_s").alias("sh"))
    if max_doc_freq is not None:
        wdf = Window.partitionBy("sh")
        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    sizes = sh.select(id_col, F.size("shingle_set").alias("n_sh"))
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return common, sizes


def pair_overlap_scored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int | None = NGRAM_MAX_DF,
    pins_out: list | None = None,
) -> DataFrame:
    """(id1, id2, n_common, n1, n2) — the one frame EVERY exact
    set-overlap scorer derives from (Jaccard and containment differ
    only in a final scalar). Callers that run more than one scorer on
    the same corpus should build this once, persist it, and apply
    their scalars to the shared frame: the inverted-index self-join is
    the entire cost, the scalars are free."""
    common, sizes = _pair_overlap_counts(
        df, id_col, text_col, n, max_doc_freq, pins_out
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"))
    return common.join(F.broadcast(s1), "id1").join(F.broadcast(s2), "id2")


def jaccard_from_overlap(scored: DataFrame, threshold: float) -> DataFrame:
    """Jaccard scalar over a ``pair_overlap_scored`` frame."""
    return (
        scored.withColumn(
            "jaccard",
            rnd(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def containment_from_overlap(scored: DataFrame, threshold: float) -> DataFrame:
    """Broder containment scalar over a ``pair_overlap_scored`` frame."""
    return (
        scored.withColumn(
            "containment",
            rnd(F.col("n_common") / F.least("n1", "n2"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("id1", "id2", "containment")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    max_doc_freq: int | None = NGRAM_MAX_DF,
    pins_out: list | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via shingle inverted index.

    The self-join is on individual shingles, so cost is bounded by
    shingle-bucket sizes. Bucket sizes are document frequencies, and a
    single viral shingle (a boilerplate phrase across millions of pages)
    makes its bucket quadratic — so shingles with df > ``max_doc_freq``
    are dropped from the index before the self-join, the standard hot
    n-gram cap. Set sizes stay full, so affected pairs get a Jaccard
    lower bound (near-dup pairs share mostly NON-viral shingles and are
    unaffected in practice).

    The df filter is a count window partitioned by shingle: one shuffle
    that also pre-partitions both self-join sides on the join key.
    """
    return jaccard_from_overlap(
        pair_overlap_scored(df, id_col, text_col, n, max_doc_freq, pins_out),
        threshold,
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 3,
    max_doc_freq: int | None = NGRAM_MAX_DF,
    pins_out: list | None = None,
) -> DataFrame:
    """Broder set CONTAINMENT on shingle sets: |A∩B| / min(|A|, |B|).

    Jaccard misses the quote/superset case — a short document wholly
    embedded in a much longer one scores |A|/|B| ≈ 0 on Jaccard but
    1.0 on containment of the smaller side. This is the signal web
    dedup uses to catch boilerplate-wrapped reposts and doc-in-doc
    inclusion (Broder 1997's "containment", AltaVista dedup). Output is
    (id1, id2, containment) over id1 < id2; the score is symmetric in
    the pair because the denominator is the SMALLER set.

    Same inverted-index skeleton (and hot-shingle df cap, hence the
    same lower-bound caveat) as :func:`ngram_jaccard_pairs`; cost is
    identical — only the final scalar differs.
    """
    return containment_from_overlap(
        pair_overlap_scored(df, id_col, text_col, n, max_doc_freq, pins_out),
        threshold,
    )


def _nibble_votes(h: Column, i: Column) -> Column:
    """±1 votes for the 4 bits (MSB first) of md5-hex nibble ``i`` of
    ``h`` — the nibble value is bound once via _let so the conv/substring
    tree evaluates once per nibble, not once per bit (interpreted HOFs
    get no CSE)."""
    from ..functions.text import _let

    return _let(
        F.conv(F.substring(h, i.cast("int"), 1), 16, 10).cast("int"),
        lambda v: F.array(
            *[
                F.shiftright(v, k).bitwiseAND(F.lit(1)) * 2 - 1
                for k in (3, 2, 1, 0)
            ]
        ),
    )


def simhash_sigs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, blk_0..blk_3) 64-bit SimHash signatures as four 16-bit block
    ints (block j = signature bits [16j, 16j+16), MSB first) — exact in
    any engine's signed arithmetic and directly usable for pigeonhole
    blocking.

    Single aggregate pass: one md5 per word (not per word×bit), with an
    array-of-votes accumulator folded via zip_with — measured ~2.5×
    faster than per-bit aggregate expressions under interpreted HOF eval.

    Zero-word documents are excluded (mirroring doc_shingles): they have
    no content to fingerprint, and the shared all-zero signature would
    otherwise emit a quadratic hamming-0 clique of meaningless pairs.
    """
    bits = SIMHASH_BITS
    hx = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.transform(_word_array(df, text_col), F.md5).alias("_hx"),
        )
        .filter(F.size("_hx") > 0)
    )
    votes = F.aggregate(
        F.col("_hx"),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(bits // 4)),
                    lambda i: _nibble_votes(h, i),
                )
            ),
            lambda a, v: a + v,
        ),
    )
    sig_bits = F.transform(
        votes, lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0))
    )
    bpb = SIMHASH_BITS_PER_BLOCK
    blocks = [
        F.aggregate(
            F.slice(sig_bits, j * bpb + 1, bpb),
            F.lit(0),
            lambda acc, x: acc * 2 + x,
        ).alias(f"blk_{j}")
        for j in range(SIMHASH_BLOCKS)
    ]
    return hx.select(F.col(id_col), *blocks)


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs with pigeonhole blocking: the 64-bit
    signature is split into ``max_hamming + 1`` bit-blocks, candidates
    are pairs sharing ANY block exactly, then integer bit_count(xor)
    verifies. A pair within Hamming distance d cannot differ in more
    than d blocks, so with d+1 blocks at least one matches — FULL
    recall, unlike half-signature bucketing which misses pairs whose
    differing bits fall in the blocking half.

    At 64 bits a random doc pair collides on a 16-bit block with
    p ~= 4/65536, so candidate buckets stay tiny and hamming <= 3 keeps
    only genuinely near-identical texts (16 bits flagged ~28% of all
    pairs at sf0.01 — semantically meaningless)."""
    if max_hamming + 1 != SIMHASH_BLOCKS:
        raise ValueError(
            f"pigeonhole recall needs max_hamming + 1 == {SIMHASH_BLOCKS} blocks"
        )
    sigs = _pin(simhash_sigs(df, id_col, text_col))
    blk_cols = [f"blk_{j}" for j in range(SIMHASH_BLOCKS)]
    blocks = _pin(
        sigs.select(
            id_col,
            *blk_cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("b"), F.col(f"blk_{j}").alias("blk")
                        )
                        for j in range(SIMHASH_BLOCKS)
                    ]
                )
            ).alias("_bb"),
        ).select(id_col, *blk_cols, "_bb.b", "_bb.blk")
    )
    a = blocks.alias("a")
    b_ = blocks.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.blk_{j}").bitwiseXOR(F.col(f"b.blk_{j}")))
        for j in range(SIMHASH_BLOCKS)
    )
    return (
        a.join(
            b_,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            "hamming",
        )
        .distinct()
    )
