"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting handles most skew at runtime; explicit salting
is the plan-level guarantee for the pathological case — a join key whose
hot value is so large that even a split partition exceeds executor
memory (the "celebrity key" problem). The big side spreads each hot key
over ``n_salts`` deterministic salt buckets; the small side is exploded
×``n_salts`` so every (key, salt) pair still finds its match. Results
are identical to the unsalted join — only the shuffle distribution
changes.

Reference parity: none (the reference delegates joins to Postgres);
this is part of the 100 TB operating envelope (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side
    salted into ``n_salts`` buckets.

    ``salt_source`` must be a big-side column (or expression) that is
    (near-)unique per row — the salt is ``pmod(xxhash64(src), n_salts)``
    so the hot key's rows spread uniformly and deterministically (no
    RNG: re-runs and retried tasks salt identically, which speculative
    execution requires). The small side is exploded ×``n_salts`` BEFORE
    the join; it must be dimension-sized (the explosion multiplies it).

    The joined output drops the salt column — downstream operators see
    exactly the unsalted join result.
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    b = big.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(n_salts)))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
