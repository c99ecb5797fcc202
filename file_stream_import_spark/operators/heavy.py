"""Candidate-pruned exact heavy hitters (frequent items) with bounded
shuffle.

Problem shape: find every key whose global frequency is at least a
fraction ``s`` of all rows. The naive `groupBy(key).count()` shuffles
one row per DISTINCT key — at 100 TB with billions of keys that is the
dominant exchange even though only a handful of keys can possibly
qualify (at most 1/s of them, by definition).

Two fact-table passes, both exact:

1. **Local candidate scan** (mapInArrow, zero shuffle): each scan
   partition counts its own keys in memory and emits only keys with
   local_count * denom >= num * local_rows, plus ONE marker row
   carrying the partition's row count (so the grand total needs no
   extra scan). Pigeonhole guarantees no false negatives: if
   sum(c_i) >= s * sum(n_i) then c_i >= s * n_i in at least one
   partition i. Each partition emits at most 1/s candidate keys, so the
   candidate set is <= partitions/s rows REGARDLESS of key cardinality
   — that is the scale bound. The tiny output is localCheckpoint-ed so
   its two consumers (candidate set, total) don't re-run the scan.
2. **Exact recount** of candidates only: semi-join the fact rows down
   to candidate keys (broadcast — the candidate set is tiny by the
   bound above), one hash aggregate whose shuffle carries only
   candidate keys, then the exact global threshold test.

NULL is a key like any other (groupBy/HAVING semantics): pass 1 counts
the column's null mask explicitly and pass 2 joins null-safely, so a
frequent NULL group surfaces instead of silently vanishing. Pass 1 is
mapInArrow, not mapInPandas, deliberately: Arrow keeps an int64 column
with nulls as int64 + validity mask, whereas the pandas conversion
would widen it to float64 and silently round keys above 2^53 — a
rounded candidate would never match in the exact recount (a false
negative on the one guarantee this operator makes).

The result is deterministic and partitioning-independent (pass 1 only
widens the candidate superset; pass 2 is exact), which is why the
DuckDB oracle can hash-check it with plain HAVING SQL.

The threshold is a rational num/denom compared in integer arithmetic on
both passes — no float boundary can flip a key in one engine only.
"""

from __future__ import annotations

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

    def local_scan(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        counts: dict = {}
        null_count = 0
        n = 0
        arrow_type = None
        for batch in batches:
            col = batch.column(0)
            arrow_type = col.type
            n += len(col)
            null_count += col.null_count
            for entry in pc.value_counts(col.drop_null()):
                k = entry["values"].as_py()
                counts[k] = counts.get(k, 0) + entry["counts"].as_py()
        cand = [k for k, c in counts.items() if n and c * denom >= num * n]
        # NULL is a key too (Arrow's value_counts skips the null mask,
        # so threshold the mask count separately); n > 0 guards an
        # empty partition from emitting a spurious NULL candidate
        if n and null_count * denom >= num * n:
            cand.append(None)
        key_vals = cand + [None]
        local_ns = [None] * len(cand) + [n]  # marker row: partition size
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(key_vals, type=arrow_type or pa.int64()),
                pa.array(local_ns, type=pa.int64()),
            ],
            names=[key, "__local_n"],
        )

    # tiny by the pigeonhole bound; checkpoint so candidate-set and
    # total don't each re-run the fact scan
    scan = keyed.mapInArrow(
        local_scan, schema=f"{key} {key_type}, __local_n long"
    ).localCheckpoint()
    candidates = (
        scan.filter(F.col("__local_n").isNull()).select(key).distinct()
    )
    total = scan.agg(F.sum("__local_n").alias("__total"))
    cand_keyed = candidates.select(F.col(key).alias("__cand_key"))
    hits = (
        keyed.join(
            F.broadcast(cand_keyed),
            F.col(key).eqNullSafe(F.col("__cand_key")),
            "left_semi",
        )
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
