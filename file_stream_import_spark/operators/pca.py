"""Top principal component by distributed power iteration — the PCA
primitive an embedding pipeline runs before whitening, drift probes, or
picking projection axes for ANN partitioning.

Shape: matrix-free power iteration v <- A^T (A v) over the CENTERED
embedding matrix, expressed as two join+aggregate rounds per iteration
on the exploded (vec_id, dim, value) frame — the standard distributed
matvec. Nothing materializes the dim x dim Gram matrix; per iteration
the shuffles carry |rows| partial dots then |dim| partial sums. The
direction vector is a dim-row frame, always broadcast.

Exactness (the property that makes the 3-iteration result hash-equal
across engines): values snap to a 1e-6 integer grid up front; centering
multiplies through by N (xc = N*x_q - sum_d, still integer — scaling
never changes eigenvectors); every dot/accumulate is exact BIGINT /
DECIMAL(38,0) (HUGEINT on the DuckDB side); between iterations v is
renormalized by MAX-ABS (not L2 — no sqrt, and the single division is
one double op on identical exact integers, snapped back to the 1e6
grid). Fixed iteration count, fixed init (all-ones) — fully
deterministic, sign convention included.

At 100 TB: the exploded frame is (rows x dim) and feeds TWO matvecs per
iteration — it is materialized once (localCheckpoint) so the 3
iterations run 6 matvecs against the materialized frame instead of
re-exploding and re-centering the source 6 times; the checkpoint also
truncates the compounding iteration lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

GRID = 1_000_000


def top_pc_power_iteration(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 3,
) -> DataFrame:
    """Returns (dim int [1-based], pc1_ppm bigint): the dominant
    principal component of the centered corpus, each coordinate in
    parts-per-million of the max-abs coordinate."""
    x = embeddings.select(
        id_col, F.posexplode(vec_col).alias("pos", "val")
    ).select(
        F.col(id_col).alias("vec_id"),
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * GRID + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    n = x.agg(F.countDistinct("vec_id").alias("n"))
    col_sums = x.groupBy("dim").agg(F.sum("xq").alias("sd"))
    xc = (
        x.join(F.broadcast(col_sums), "dim")
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "dim",
            (F.col("n") * F.col("xq") - F.col("sd")).alias("xc"),
        )
        # materialize: every iteration's two matvecs re-read this frame;
        # without the cut, 3 iterations re-scan the source lineage 6x
        .localCheckpoint(eager=True)
    )

    v = col_sums.select(
        "dim", F.lit(GRID).cast("bigint").alias("v")
    )
    for _ in range(iterations):
        s = (
            xc.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            # widened: xc scales with N (centering multiplies through by
            # the corpus size), so the raw BIGINT product overflows
            # int64 around N ~ 1e5 vectors; DECIMAL(38,0) carries the
            # exact value to N ~ 1e6 (beyond that, drop the grid a
            # decade per 100x rows — eigenvectors are scale-invariant)
            .agg(
                F.sum(
                    F.col("xc").cast("decimal(38,0)") * F.col("v")
                ).alias("s")
            )
        )
        w = (
            xc.join(s, "vec_id")
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("xc").cast("decimal(38,0)") * F.col("s")
                ).alias("w")
            )
        )
        m = F.max(F.abs(F.col("w"))).over(W.partitionBy())
        v = w.select(
            "dim",
            F.floor(
                F.col("w").cast("double") / m.cast("double") * GRID
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("v"),
        )
    return v.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("v").alias("pc1_ppm"),
    )
