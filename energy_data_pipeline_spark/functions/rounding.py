"""Engine-portable rounding.

Spark's ``F.round`` on doubles goes through the shortest decimal
representation (BigDecimal HALF_UP), while DuckDB rounds the binary
value as ``sign(x) * floor(|x| * 10^k + 0.5) / 10^k`` — verified
bit-identical against ``round(x, k)`` over 2M random doubles plus
crafted boundary cases. At exact .5 boundaries the two differ
(36.75375 → 36.7538 vs 36.7537).

``rnd`` reproduces DuckDB's formula with plain IEEE ops so every
rounded value in the query catalog hashes identically under the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, k: int = 4) -> Column:
    """Round half-away-from-zero on the binary double value — DuckDB's
    ``round(x, k)`` semantics, expressed in IEEE ops that evaluate
    identically in both engines (verified bit-identical over 2M random
    doubles plus boundary cases in the |x·10^k| < 2^63 range).

    Spark's F.floor(double) returns BIGINT, so without a guard any
    |x·10^k| >= 2^63 would SATURATE and silently mangle large aggregates
    (e.g. big SUMs rounded to ~9.2e14 at k=4). Such values are integral
    doubles (ulp >= 2^11), so they pass through unrounded; DuckDB's own
    output there is x·10^k/10^k, which can differ from x by 1 ulp — a
    representation artifact outside any meaningful rounding contract."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    p = F.lit(float(10**k))
    pos = F.floor(c * p + F.lit(0.5)) / p
    neg = -(F.floor((-c) * p + F.lit(0.5)) / p)
    rounded = F.when(c >= 0, pos).otherwise(neg)
    return F.when(F.abs(c) * p >= F.lit(float(2**63)), c).otherwise(rounded)
