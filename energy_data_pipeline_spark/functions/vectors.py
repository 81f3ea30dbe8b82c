"""Vector math over array<float>/array<double> embedding columns.

Pure Spark SQL expressions (F.zip_with / F.aggregate) so dot products and
cosine similarity run inside codegen, JVM-side — the brute-force ANN path
stays shuffle-free except for the final top-k.

Elements are cast to double before accumulation so results are
reproducible against a double-precision oracle regardless of the stored
element type (the test embeddings are float32).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column
) -> Column:
    """cosine(a, b) with the norms supplied as PRECOMPUTED columns.

    Inside a pair join, ``cosine`` re-folds each side's norm aggregate
    for every candidate PAIR; materializing norms once per ROW (in the
    pre-join projection, where a persist or broadcast caches them)
    leaves only the dot-product fold as per-pair work. Value-identical:
    the per-row norm is the same ``sqrt(fold(x*x))`` expression, just
    evaluated at the projection instead of inside the join condition.
    """
    return dot(a, b) / (norm_a * norm_b)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def quantize_int8(a: Column | str, norm_col: Column) -> Column:
    """Unit-normalize by a PRECOMPUTED L2 norm and quantize each element
    to int8 range [-127, 127] — the storage format an ANN index keeps
    vectors in (4x smaller than float32, dot products in integer SIMD).

    Rounding is the explicit half-up ``floor(x + 0.5)`` so the DuckDB
    oracle reproduces each quantized element bit-for-bit (both engines
    evaluate (x / norm) * 127 + 0.5 in double, left-associated). The
    norm is taken as a column so callers evaluate the O(dim) norm fold
    once per row, not once per element."""
    return F.transform(
        _dbl(a), lambda x: quantize_int8_elem(x, norm_col)
    )


def quantize_int8_elem(x: Column, norm_col: Column) -> Column:
    """Single-element int8 quantization — the scalar core of
    ``quantize_int8``, exposed so long-form (exploded) plans share the
    exact same arithmetic and rounding as the array form."""
    return F.floor(x.cast("double") / norm_col * 127.0 + 0.5).cast("int")
