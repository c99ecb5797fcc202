"""Candidate-pruned exact heavy hitters (frequent items) with bounded
shuffle.

Problem shape: find every key whose global frequency is at least a
fraction ``s`` of all rows. The naive `groupBy(key).count()` shuffles
one row per DISTINCT key — at 100 TB with billions of keys that is the
dominant exchange even though only a handful of keys can possibly
qualify (at most 1/s of them, by definition).

Two passes, both exact:

1. **Local candidate scan** (mapInPandas, zero shuffle): each scan
   partition counts its own keys in memory and emits only keys with
   local_count * denom >= num * local_rows. Pigeonhole guarantees no
   false negatives: if sum(c_i) >= s * sum(n_i) then c_i >= s * n_i in
   at least one partition i. Each partition emits at most 1/s keys, so
   the candidate set is <= partitions/s rows REGARDLESS of key
   cardinality — that is the scale bound.
2. **Exact recount** of candidates only: semi-join the fact rows down
   to candidate keys (broadcast — the candidate set is tiny by the
   bound above), one hash aggregate whose shuffle carries only
   candidate keys, then the exact global threshold test.

The result is deterministic and partitioning-independent (pass 1 only
widens the candidate superset; pass 2 is exact), which is why the
DuckDB oracle can hash-check it with plain HAVING SQL.

The threshold is a rational num/denom compared in integer arithmetic on
both passes — no float boundary can flip a key in one engine only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key: str,
    num: int = 1,
    denom: int = 100,
) -> DataFrame:
    """Keys of ``df`` with count(*) * denom >= num * total_rows, with
    exact counts and integer ppm share. Columns: key, n_rows, share_ppm.
    """
    keyed = df.select(key)
    key_type = keyed.schema[key].dataType.simpleString()

    def local_candidates(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for k, c in pdf[key].value_counts().items():
                counts[k] = counts.get(k, 0) + int(c)
        cand = [k for k, c in counts.items() if c * denom >= num * n]
        yield pd.DataFrame({key: pd.Series(cand, dtype="object")})

    candidates = keyed.mapInPandas(
        local_candidates, schema=f"{key} {key_type}"
    ).distinct()
    total = keyed.agg(F.count("*").alias("__total"))
    hits = (
        keyed.join(F.broadcast(candidates), key, "left_semi")
        .groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * denom >= F.lit(num) * F.col("__total"))
    )
    return hits.select(
        key,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.expr("n_rows * 1000000 div __total").alias("share_ppm"),
    )
