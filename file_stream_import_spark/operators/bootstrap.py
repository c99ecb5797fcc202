"""Poisson bootstrap: replicate totals for any additive metric in ONE
scan, no row duplication — the distributed-bootstrap technique for
attaching confidence intervals to corpus-level metrics.

Sampling WITH replacement is uncoordinatable across executors (a global
draw needs global state); the Poisson bootstrap replaces the multinomial
replicate with independent per-row Poisson(1) weights, which converge to
the same distribution for large n. Replicate b's total is
``sum(w_bi * x_i)`` — so ALL B replicates are just B map-side-combinable
aggregate columns over one pass of the fact table. At 100 TB nothing
shuffles but B partial sums per task.

RNG modes (the bootstrap needs a per-(row, replicate) uniform that is
deterministic across retries/partitionings):

* ``rng="md5"`` — engine-portable: one md5 per (row, replicate-GROUP)
  sliced into four 32-bit uniforms (md5 yields 128 bits, so B uniforms
  cost ceil(B/4) hashes/row, the hash floor). DuckDB reproduces every
  weight bit-for-bit, which is what makes the registered query
  hash-checkable. Measured at sf0.1 (150k orders, B=32, local[32]):
  ~4.0s steady-state.
* ``rng="xxhash64"`` — production: JVM-native single hash per
  (row, replicate), ~2x faster end-to-end (measured 2.0s steady-state,
  same shape), not reproducible outside Spark.

Weights come from summing threshold comparisons against the Poisson(1)
CDF (w = #{t : u >= P(X<=t)}), not a nested CASE chain: the flat
comparison sum keeps the 32-aggregate expression tree small enough for
whole-stage codegen — the CASE-chain form measured 9.1s steady-state
(2.3x slower) purely on expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Poisson(1) CDF: P(X<=k) for k=0..6; tail mass 8.3e-5 -> weight 7 cap.
# Exact double literals so both engines compare identical doubles.
POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _weight_from_uniform(u: Column) -> Column:
    w = F.lit(0)
    for t in POIS1_CDF:
        w = w + (u >= F.lit(t)).cast("int")
    return w


def _uniform_md5(key: Column, k: int) -> Column:
    """Portable uniform for replicate k: slice 32 bits out of the md5 of
    (replicate-group, key). Group g = k // 4 shares one hash across the
    four replicates it feeds; slot k % 4 picks the 8-hex-digit slice."""
    g, slot = divmod(k, 4)
    h = F.md5(F.concat(F.lit(f"boot:{g}:"), key.cast("string")))
    return F.conv(F.substring(h, 1 + 8 * slot, 8), 16, 10).cast(
        "bigint"
    ) / F.lit(4294967296.0)


def _uniform_xxhash(key: Column, k: int) -> Column:
    return F.xxhash64(key, F.lit(k)) / F.lit(2.0**64) + F.lit(0.5)


def poisson_bootstrap_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicates: int = 32,
    rng: str = "md5",
) -> DataFrame:
    """One row per replicate: (replicate bigint, bt bigint) plus the
    observed total ``oc`` repeated on every row. ``value_col`` must be
    an exact integer column (cents) so replicate totals are exact."""
    uniform = {"md5": _uniform_md5, "xxhash64": _uniform_xxhash}[rng]
    key = F.col(key_col)
    aggs = [
        F.sum(_weight_from_uniform(uniform(key, k)) * F.col(value_col)).alias(
            f"bt_{k}"
        )
        for k in range(n_replicates)
    ]
    row = df.agg(*aggs, F.sum(value_col).alias("oc"))
    stack_args = ", ".join(f"{k}, bt_{k}" for k in range(n_replicates))
    return row.select(
        F.expr(
            f"stack({n_replicates}, {stack_args}) AS (replicate, bt)"
        ),
        F.col("oc"),
    )
