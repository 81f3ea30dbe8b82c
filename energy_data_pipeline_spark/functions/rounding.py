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
    identically in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    p = F.lit(float(10**k))
    pos = F.floor(c * p + F.lit(0.5)) / p
    neg = -(F.floor((-c) * p + F.lit(0.5)) / p)
    return F.when(c >= 0, pos).otherwise(neg)
