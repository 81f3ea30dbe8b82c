"""Distributed Bloom filter over string keys — the scale path for
membership prefilters (n-gram decontamination, URL blocklists, seen-key
checks) where the reference set is too large to broadcast raw but its
BITMAP is tiny.

Everything is engine-portable by construction: positions are affine
permutations of the same md5-derived 31-bit base hash the MinHash stage
uses (operators/neardup.shingle_base_hash), so a SQL oracle could
reproduce the exact bitmap — no dependence on Spark's internal hash
functions. Products stay < 2^62, exact in any signed-64 arithmetic.

Build is fully distributed: explode each key to its k bit positions,
reduce to a (word_idx, 64-bit word) table with a map-side-combining
``bit_or`` aggregate, and collect the m/64-word bitmap to the driver
(1 Mbit default = 16 K longs = 128 KB — index-sized, not data-sized).
Membership tests densify the bitmap into one broadcast array<boolean>
row and evaluate ``forall`` over each key's position array — a pure
expression with O(1) lookups, no explode, no shuffle, JVM-side end to
end, no UDF.

A Bloom test admits false positives (never false negatives), so
callers that need exact semantics re-verify the survivors against the
true set — the verify join then runs on the prefiltered minority
instead of the full stream. ``false_positive_rate`` gives the expected
FP rate for sizing: with n keys, m bits, k hashes it is
(1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .neardup import MINHASH_PRIME, shingle_base_hash

BLOOM_M_BITS = 1 << 20  # 1 Mbit bitmap = 16 K longs = 128 KB broadcast
BLOOM_K = 5  # hash functions; ~0.1% FP at n = m/10 keys


def _bloom_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash — md5-derived constants, disjoint
    from the MinHash permutation family by namespace."""
    out = []
    for i in range(k):
        a = int(hashlib.md5(f"bloom-a:{i}".encode()).hexdigest()[:8], 16) % (
            MINHASH_PRIME - 1
        ) + 1
        b = int(hashlib.md5(f"bloom-b:{i}".encode()).hexdigest()[:8], 16) % (
            MINHASH_PRIME
        )
        out.append((a, b))
    return out


def bit_positions(
    key: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """array<long> of the k bit positions for a string key."""
    h = shingle_base_hash(key)
    return F.array(
        *[
            ((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)) % F.lit(m_bits)
            for a, b in _bloom_params(k)
        ]
    )


def build_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(word_idx: long, bits: long) bitmap table — m_bits/64 rows max.

    One explode + one ``bit_or`` aggregate: the map-side partial
    combine collapses each partition's positions into at most
    m_bits/64 words before the shuffle, so shuffle volume is bounded by
    the BITMAP size times partitions, never the key count."""
    pos = keys.select(
        F.explode(bit_positions(F.col(key_col), m_bits, k)).alias("_p")
    )
    return (
        pos.select(
            (F.col("_p") / 64).cast("long").alias("word_idx"),
            # F.shiftleft's Python wrapper only accepts a literal shift
            # count; the underlying SQL expression takes columns
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def might_contain(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    flag_col: str = "_bloom_hit",
) -> DataFrame:
    """Adds ``flag_col``: True iff all k bits for ``key_col`` are set.

    Pure-expression membership test: the (word_idx, bits) bitmap table
    is collected (it is index-sized by construction — at most m_bits/64
    rows) and densified into ONE row holding an array<boolean> of all
    m_bits bits; that row rides in on a broadcast nested-loop cross
    join, and the flag is ``forall`` over the key's position array with
    an O(1) array index per position. No explode, no re-group, no
    shuffle — so duplicate input rows pass through unchanged (the old
    explode+regroup silently collapsed them), arbitrary payload columns
    cost nothing, and a NULL key yields NULL positions → flag False
    (a NULL gram is a member of no set). The only reserved name is
    ``flag_col`` itself plus one internal column, both asserted free."""
    bits_col = "_bloom_bits_arr"
    for reserved in (flag_col, bits_col):
        if reserved in df.columns:
            raise ValueError(
                f"might_contain: input already has a {reserved!r} column"
            )
    dense = [False] * m_bits
    for row in bitmap.collect():
        base = int(row["word_idx"]) * 64
        # bits is a SIGNED 64-bit long; mask to unsigned so a set bit 63
        # (negative value) cannot make the arithmetic right-shift loop
        # spin on -1 forever
        word = int(row["bits"]) & ((1 << 64) - 1)
        j = 0
        while word:
            if word & 1:
                dense[base + j] = True
            word >>= 1
            j += 1
    spark = df.sparkSession
    bits_row = spark.createDataFrame(
        [(dense,)], schema=f"{bits_col} array<boolean>"
    )
    member = F.forall(
        bit_positions(F.col(key_col), m_bits, k),
        lambda p: F.coalesce(F.get(bits_col, p.cast("int")), F.lit(False)),
    )
    return (
        df.crossJoin(F.broadcast(bits_row))
        .withColumn(flag_col, F.coalesce(member, F.lit(False)))
        .drop(bits_col)
    )


def false_positive_rate(n_keys: int, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> float:
    """Expected FP rate for sizing decisions: (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
