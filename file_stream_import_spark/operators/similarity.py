"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, and a random-hyperplane LSH bucketed
variant as the scale path.

All vector math uses built-in higher-order functions (zip_with /
aggregate) over arrays cast to double — JVM-side, no Python in the hot
loop, and bit-identical to an oracle computing in double precision.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, as a zip_with/aggregate
    fold.

    The fold form is deliberate (r16, tools/ab_vecmath.py): unrolling
    the statically-known 64-dim chain into ``a[0]*b[0] + ...`` pushes
    the whole-stage method past the JVM/codegen size limits, the stage
    silently drops to interpreted evaluation, and the boxed ~1.5k-node
    expression tree measured 3.7-7.7x SLOWER than this compact
    CodegenFallback fold across every vector query. What IS cheap is
    evaluating folds less often — hoist per-row norms out of per-pair
    expressions (see cosine_neardup_dedup / the knn operators)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cos_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine given precomputed L2 norms — bit-identical to
    :func:`cosine` (same dot fold, same division; the norms are the
    same expressions evaluated once per ROW instead of once per PAIR,
    which removes two of the three interpreted folds from every pair:
    measured 0.48x on the all-pairs dedup shape)."""
    return _dot(a, b) / (na * nb)


def _q6(col) -> Column:
    """Floor-quantize onto the 1e-6 grid with the -0.0 guard — the
    cross-engine-exact alternative to ROUND(double, 6) (engine rounding
    of doubles is half-even-edge sensitive across builds; FLOOR of the
    shifted value folds identically everywhere)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) + F.lit(0.0)


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the full
    vector table, rank per query.

    Scale: the query side is broadcast (no shuffle of the 100 TB vector
    side for the join); the only shuffle is the per-query top-k window,
    which carries |queries|·|vectors| scored pairs — when that product
    is too large use knn_topk_partial (same exact results, shuffle
    bounded to k·batches survivors) or the LSH/IVF variants.
    """
    # norms hoisted once per row (r16): the scored-pair expression then
    # runs one dot fold instead of three
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vv"),
    ).withColumn("nv", _norm(F.col("vv")))
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            _cos_with_norms(
                F.col("qv"), F.col("vv"), F.col("nq"), F.col("nv")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _q6("cos").alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def knn_topk_partial(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k with a BOUNDED shuffle — the treeAggregate
    shape: score JVM-side, reduce each Arrow batch to its local top-k
    per query (lossless: a row outside a batch's top-k under the total
    order (cos desc, neighbor_id) cannot be in the global top-k), then
    rank only the survivors.

    Identical output to knn_bruteforce, but the per-query window never
    sees |queries|·|vectors| rows: the one hash shuffle carries at most
    |queries|·k·n_batches survivor rows, so the operator holds when the
    scored-pair product is too large to shuffle (the 100 TB path for
    EXACT kNN; LSH/IVF trade exactness for even less scoring work).

    Scoring stays in whole-stage codegen (broadcast join + zip_with/
    aggregate); only the bounded k-selection crosses into Python, as an
    Arrow-batched mapInPandas.

    Note: Spark ≥3.5's rank pushdown (WindowGroupLimit) already prunes
    the plain-window form to k rows per (partition, query) before the
    exchange — this operator makes the bound EXPLICIT in the plan shape
    (asserted in tests/test_plans.py), so it survives optimizer-rule or
    engine-version changes rather than depending on them.

    Measured (r5, 2026-08-14, tools/ab_topk.py — 5 interleaved passes,
    one session, sf0.1 local[32]): this form median 0.655s vs the pure
    window form 0.671s — a tie within host noise. The pandas form is
    kept because the explicit bound is the operator's point: at true
    scale the scored-pair stream is too large to trust to an optimizer
    rule, and the A/B shows the crossing costs nothing here.
    """
    # norms hoisted once per row (r16), as in knn_bruteforce
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vv"),
    ).withColumn("nv", _norm(F.col("vv")))
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            _cos_with_norms(
                F.col("qv"), F.col("vv"), F.col("nq"), F.col("nv")
            ),
        )
        .select("query_id", "neighbor_id", "cos")
    )

    def local_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["query_id", "cos", "neighbor_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    survivors = scored.mapInPandas(local_topk, scored.schema)
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _q6("cos").alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def _hyperplane_signs(
    num_planes: int, dim: int, offset: int = 0
) -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplanes from md5 — valid signed
    random projections for cosine LSH, reproducible across runs/cluster
    sizes with no RNG state. ``offset`` shifts the absolute plane index,
    giving independent plane sets for multi-table OR-amplification."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p + offset}:{d}".encode()).digest()
            row.append(1.0 if h[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_col(v: Column, planes: list[list[float]]) -> Column:
    """Pack the sign bits of the plane projections into one long."""
    bucket = None
    for p, signs in enumerate(planes):
        proj = _dot(v, F.array(*[F.lit(s) for s in signs]))
        bit = (
            F.when(proj > 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Adds a ``bucket`` column: the sign pattern of ``num_planes``
    random-hyperplane projections packed into a long. Vectors with equal
    buckets are cosine-similar with high probability."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        "bucket", _bucket_col(v, _hyperplane_signs(num_planes, dim))
    )


def _table_buckets(num_tables: int, num_planes: int, dim: int, v: Column) -> Column:
    """array<struct<t,b>>: one bucket per independent plane set — the
    OR-amplification tables. Table t uses absolute plane indices
    [t*num_planes, (t+1)*num_planes), so table 0 reproduces the
    single-table bucketing exactly."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                _bucket_col(
                    v, _hyperplane_signs(num_planes, dim, offset=t * num_planes)
                ).alias("b"),
            )
            for t in range(num_tables)
        ]
    )


def ann_lsh_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    min_cos: float = 0.5,
    dim: int = 64,
) -> DataFrame:
    """Approximate near-neighbor PAIRS: bucket by hyperplane signature,
    score only within-bucket pairs exactly.

    With p planes, a pair at angle θ collides with probability
    (1-θ/π)^p — at 100 TB you run multiple plane-sets (OR-amplification)
    and union; one set suffices for the fixture demo.
    """
    b = lsh_bucket(
        vectors.select(id_col, vec_col), vec_col, num_planes, dim
    ).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        "bucket",
    # norm hoisted to once per ROW: inside the bucket join it would
    # re-fold per candidate pair (2 of the 3 interpreted HOF folds)
    ).withColumn("nv", _norm(F.col("v")))
    left = b.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), "bucket",
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            _cos_with_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ),
        )
        .filter(F.col("cos") >= min_cos)
        .select("id_a", "id_b", _q6("cos").alias("cos_sim"))
        .distinct()
    )


def ann_lsh_knn(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: probe only the query's bucket (IVF-style
    candidate restriction), then exact-rank within candidates.

    Fewer planes ⇒ bigger buckets ⇒ better recall, more work.
    ``num_tables`` > 1 is the OR-amplification axis: each table hashes
    with an independent plane set and a pair is a candidate if it
    collides in ANY table — per-table miss probability multiplies, so
    T tables turn per-table recall q into 1-(1-q)^T at T× bucket-join
    cost. That (not bigger buckets) is how production LSH reaches a
    recall target while keeping buckets small; recall@5 floors are
    asserted in tests/test_llm_ops.py::TestAnnRecall. The bucket join
    replaces the full cross product of knn_bruteforce with
    |bucket|-sized candidate sets; table 0 hashes identically to the
    single-table form, so num_tables=1 reproduces it exactly.
    """
    vv = F.col(vec_col).cast("array<double>")
    # norms hoisted to once per input row (before the bucket explode);
    # scoring then pays one dot fold per candidate instead of three
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        vv.alias("vv"),
        _norm(vv).alias("nv"),
        F.explode(_table_buckets(num_tables, num_planes, dim, vv)).alias("tb"),
    ).select("neighbor_id", "vv", "nv", "tb.t", "tb.b")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vv.alias("qv"),
        _norm(vv).alias("nq"),
        F.explode(_table_buckets(num_tables, num_planes, dim, vv)).alias("tb"),
    ).select("query_id", "qv", "nq", "tb.t", "tb.b")
    scored = (
        v.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair colliding in several tables must score once, not T times
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos",
            _cos_with_norms(
                F.col("qv"), F.col("vv"), F.col("nq"), F.col("nv")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _q6("cos").alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def _neardup_match_mask(C, den, idm, min_cos):
    """Match mask for the exact-dedup kernel, mirroring the JVM
    condition ``(id_a < id_b) AND cosine >= min_cos`` cell by cell:

    * Spark treats NaN as LARGER than every number, so a NaN cosine
      (NaN element, or Inf/Inf shapes) satisfies ``>= min_cos`` — hence
      the ``isnan`` OR-leg (verified against the JVM path in
      tests/test_r17_optimizations.py).
    * Under ANSI mode (Spark 4 default) a zero divisor RAISES
      DIVIDE_BY_ZERO; the JVM join's And short-circuits, so only cells
      with id_a < id_b evaluate the division — mirror exactly that.
    """
    import numpy as np

    if bool(np.any(idm & (den == 0.0))):
        raise ArithmeticError(
            "[DIVIDE_BY_ZERO] zero-norm vector in cosine_neardup_dedup "
            "(ANSI division by zero, matching the JVM fold's behavior)"
        )
    with np.errstate(divide="ignore", invalid="ignore"):
        C = C / den
    return (np.greater_equal(C, min_cos) | np.isnan(C)) & idm


def _make_neardup_exact_fn(min_cos: float, id_col: str):
    """Cogrouped-kernel body for the exact cosine dedup: for each
    cogroup (a hash slice of the rows × the FULL pool), decide which
    slice rows have a smaller-id near-duplicate, fully vectorized.

    Bit-identity with the JVM zip_with/aggregate fold: the dot and the
    squared-norm accumulate with one vectorized numpy op PER DIMENSION
    IN INDEX ORDER — the identical IEEE add/multiply sequence
    ``acc = (acc + x_d*y_d)`` the fold performs, so every cosine (and
    therefore every threshold decision) is the same double, not merely
    close. Rows/pool entries are grouped by vector length first: the
    JVM zip_with NULL-pads unequal lengths, which NULLs the whole dot
    (never a match), so only equal-length pairs are ever compared."""

    def fn(_key, left, right):
        import numpy as np
        import pandas as pd

        if len(left) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64")}
            )
        b_ids = left["_id"].to_numpy()
        survivors = np.ones(len(left), dtype=bool)
        # pool grouped by vector length; norms via the sequential fold
        pools: dict = {}
        if len(right):
            a_ids = right["_id"].to_numpy()
            by_len: dict = {}
            for i, vec in enumerate(right["_v"]):
                arr = np.asarray(vec, dtype=np.float64)
                by_len.setdefault(arr.shape[0], []).append((a_ids[i], arr))
            for L, entries in by_len.items():
                aid = np.asarray([e[0] for e in entries], dtype=np.int64)
                A = (
                    np.vstack([e[1] for e in entries])
                    if L
                    else np.zeros((len(entries), 0))
                )
                an = np.zeros(len(entries))
                for d in range(L):
                    an = an + A[:, d] * A[:, d]
                pools[L] = (aid, A, np.sqrt(an))
        if pools:
            b_by_len: dict = {}
            for i, vec in enumerate(left["_v"]):
                arr = np.asarray(vec, dtype=np.float64)
                b_by_len.setdefault(arr.shape[0], []).append((i, arr))
            for L, entries in b_by_len.items():
                if L not in pools:
                    continue
                aid, A, an = pools[L]
                idx = np.asarray([e[0] for e in entries])
                Bm = (
                    np.vstack([e[1] for e in entries])
                    if L
                    else np.zeros((len(entries), 0))
                )
                bn = np.zeros(len(entries))
                for d in range(L):
                    bn = bn + Bm[:, d] * Bm[:, d]
                bn = np.sqrt(bn)
                bid = b_ids[idx]
                # chunk the slice rows so the pair matrix stays bounded
                step = max(1, 4_000_000 // max(1, len(aid)))
                for s in range(0, len(idx), step):
                    Bc = Bm[s : s + step]
                    acc = np.zeros((Bc.shape[0], len(aid)))
                    for d in range(L):
                        # same IEEE sequence as the zip_with fold:
                        # acc = (acc + x_d * y_d), d ascending
                        acc = acc + np.multiply.outer(
                            Bc[:, d], A[:, d]
                        )
                    # JVM denominator is na * nb (pool-norm × row-norm)
                    den = np.multiply.outer(bn[s : s + step], an)
                    idm = aid[None, :] < bid[s : s + step, None]
                    doomed = _neardup_match_mask(
                        acc, den, idm, min_cos
                    ).any(axis=1)
                    survivors[idx[s : s + step][doomed]] = False
        return pd.DataFrame(
            {id_col: pd.Series(b_ids[survivors], dtype="int64")}
        )

    return fn


def _neardup_exact_kernel(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
) -> DataFrame:
    """Exact O(n²) cosine dedup evaluated as a vectorized numpy kernel
    instead of one interpreted zip_with fold per candidate pair.

    Shape (guide §4.2 / §8 decide-with-small-rows): ship ROWS across
    the Arrow boundary, never pairs — the rows are hash-sliced into P
    groups, the candidate pool rides to each slice via a broadcast
    replicate (P × pool bytes, the same broadcast-fit precondition the
    BNLJ form had), and each task scores its slice × pool as numpy
    matrix ops. The r16 rejection of "Arrow for the dot" shipped both
    vectors PER PAIR (~2 GB at sf0.1); this ships each vector P+1
    times (~30 MB) and does the pairing inside the kernel.

    Value-identical to the JVM fold (see _make_neardup_exact_fn), with
    the JVM path kept for A/B under SPARK_GRAFT_COSINE_KERNEL=jvm.
    Rows the JVM condition could never match — NULL id, NULL vector, a
    NULL element anywhere (zip_with's NULL poisons the whole fold) —
    bypass the kernel entirely and survive, exactly as the anti join
    leaves them."""
    spark = vectors.sparkSession
    idc = F.col(id_col)
    v = F.col(vec_col).cast("array<double>")
    ok = (
        idc.isNotNull()
        & v.isNotNull()
        & ~F.exists(v, lambda x: x.isNull())
    )
    base = vectors.select(
        idc.alias("_id"), v.alias("_v"), ok.alias("_ok")
    )
    clean = base.filter(F.col("_ok")).select("_id", "_v")
    # rows no pair can ever match: NULL cosine / NULL id comparisons
    # are never >= threshold, so they all survive
    passthrough = base.filter(~F.col("_ok")).select(
        F.col("_id").alias(id_col)
    )
    n_slices = int(
        os.environ.get("SPARK_GRAFT_COSINE_SLICES", "0")
    ) or spark.sparkContext.defaultParallelism
    sliced = clean.withColumn(
        "_g", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_slices))
    )
    # fresh projection (new attribute ids) so the cogroup's two sides
    # don't trip the ambiguous-self-join check
    pool = (
        vectors.select(idc.alias("_id"), v.alias("_v"), ok.alias("_ok"))
        .filter(F.col("_ok"))
        .select("_id", "_v")
        .crossJoin(
            F.broadcast(
                spark.range(n_slices).select(F.col("id").alias("_g"))
            )
        )
    )
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [StructField(id_col, vectors.schema[id_col].dataType, True)]
    )
    survivors = (
        sliced.groupBy("_g")
        .cogroup(pool.groupBy("_g"))
        .applyInPandas(
            _make_neardup_exact_fn(float(min_cos), id_col), out_schema
        )
    )
    return survivors.unionByName(passthrough)


def cosine_neardup_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.4,
    exact: bool = True,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: drop every row that has a
    near-duplicate (cosine ≥ min_cos) with a smaller id; the smallest id
    in each near-dup neighborhood survives.

    ``exact=True`` scores all O(n²) pairs — the oracle-checkable form,
    viable when the vector set fits a broadcast (queries, candidate pools).
    At 100 TB set ``exact=False``: hyperplane-LSH buckets generate the
    candidate pairs first (ann_lsh_pairs), so only colliding pairs are
    scored; same keep-smallest-id rule applied to the approximate pair set.

    The exact path (r16) runs as ONE broadcast nested-loop LEFT ANTI
    join whose condition is the thresholded cosine — the literal NOT
    EXISTS shape. Three wins over the old inner-join → distinct →
    anti-join form, none changing the result: the anti join
    SHORT-CIRCUITS each row at its first qualifying smaller-id
    neighbor (the inner join scored every pair); the norms fold once
    per ROW instead of once per PAIR (hoisted columns, bit-identical —
    see _cos_with_norms); and the doomed-set distinct + second join
    disappear. Measured sf0.1 (2,000 vectors): 63s → 10.6s.
    """
    ids = vectors.select(id_col, vec_col)
    if exact:
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType,
        )

        id_type = vectors.schema[id_col].dataType
        use_kernel = os.environ.get(
            "SPARK_GRAFT_COSINE_KERNEL", "pandas"
        ) != "jvm" and isinstance(
            id_type, (ByteType, ShortType, IntegerType, LongType)
        )
        if use_kernel:
            return _neardup_exact_kernel(
                vectors, id_col, vec_col, min_cos
            )
        a = ids.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).cast("array<double>").alias("va"),
        ).withColumn("na", _norm(F.col("va")))
        b = ids.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).cast("array<double>").alias("vb"),
        ).withColumn("nb", _norm(F.col("vb")))
        # survives ⟺ no smaller-id row with cosine ≥ min_cos exists
        cond = (F.col("id_a") < F.col("id_b")) & (
            _cos_with_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            )
            >= F.lit(min_cos)
        )
        return b.join(F.broadcast(a), cond, "left_anti").select(
            F.col("id_b").alias(id_col)
        )
    dup_pairs = ann_lsh_pairs(
        vectors, id_col, vec_col, num_planes=num_planes,
        min_cos=min_cos, dim=dim,
    )
    # any id_b appearing in a pair has a smaller near-dup → drop it
    doomed = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(doomed, id_col, "left_anti").select(id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse-quantizer variant of the scale path.
# ---------------------------------------------------------------------------


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer centroids: the ``n_centroids``
    vectors that sort first by ``md5(id)`` — a uniform pseudo-random
    sample that is reproducible across runs, cluster sizes, AND engines
    (DuckDB's md5 of the same string agrees), so the whole IVF pipeline
    stays oracle-checkable. Sampled-vector centroids are the classic
    cheap init for IVF (k-means refinement would improve balance but
    breaks cross-engine determinism; see module docstring).

    The TopK sort is a per-partition prune + driver merge of
    ``n_centroids`` rows — no global sort, and only C rows ever reach
    the driver, so this scales to any vector count.
    """
    rows = (
        vectors.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy(
            F.md5(F.concat(F.lit(salt), F.col("cid").cast("string"))), "cid"
        )
        .limit(n_centroids)
        .collect()
    )
    return [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in rows]


def _py_norm(cv: list[float]) -> float:
    """The centroid's L2 norm computed at plan-build time — bit-identical
    to the :func:`_norm` fold: Python floats ARE IEEE doubles, the
    accumulation below is the same left-to-right order as the fold's
    0.0-seeded aggregate, and math.sqrt is the same correctly-rounded
    IEEE sqrt, so lit(_py_norm(cv)) == _norm(lit(cv)) exactly."""
    import math

    acc = 0.0
    for x in cv:
        acc = acc + x * x
    return math.sqrt(acc)


def _centroid_lit(cents: list[tuple[int, list[float]]]):
    """Centroid table as a literal array<struct<cid,cv,cn>> (cn = the
    plan-time L2 norm, see _py_norm) — broadcast in the task closure, so
    centroid scoring is a pure projection (no join, no shuffle). For C
    beyond ~10k switch to a broadcast DataFrame + Pandas UDF; at the
    classic IVF sweet spot (C ≈ sqrt(N)) the closure form holds well
    past 10^8 vectors."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).cast("bigint").alias("cid"),
                F.array(*[F.lit(x) for x in cv]).alias("cv"),
                F.lit(_py_norm(cv)).alias("cn"),
            )
            for cid, cv in cents
        ]
    )


def _centroid_scores(cent_lit, v: Column, v_norm: Column | None = None):
    """array<struct<negcos,cid>> — negated cosine so ascending struct
    order ranks best-first with ties broken by smallest cid.

    ``v_norm`` is the hoisted per-row norm of ``v``; without it the norm
    fold would run once per CENTROID per row (the centroid's own norm is
    always the plan-time literal ``cn``). The lambda variable ``c`` is a
    bound value, so field access per centroid is O(1), not a subtree
    re-evaluation."""
    vn = v_norm if v_norm is not None else _norm(v)
    return F.transform(
        cent_lit,
        lambda c: F.struct(
            (-_cos_with_norms(c.getField("cv"), v, c.getField("cn"), vn))
            .alias("negcos"),
            c.getField("cid").alias("cid"),
        ),
    )


def ivf_assign(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cid",
    keep_norm_col: str | None = None,
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid — the
    inverted-list key. Pure projection: zero shuffle at any scale; write
    the result partitioned by ``out_col`` to get on-disk inverted lists.

    ``keep_norm_col`` keeps the per-row L2 norm (computed here anyway
    for the centroid scoring) under that name so callers that need the
    norm afterwards (ivf_knn's candidate scoring) don't fold it twice."""
    v = F.col(vec_col).cast("array<double>")
    norm_col = keep_norm_col or "_ivf_vn"
    if norm_col in df.columns:
        # withColumn REPLACES an existing column of the same name —
        # guard instead of silently clobbering caller data
        raise ValueError(
            f"ivf_assign: column {norm_col!r} already exists on the "
            "input (reserved for the hoisted vector norm)"
        )
    hoisted = df.withColumn(norm_col, _norm(v))
    scores = _centroid_scores(_centroid_lit(cents), v, F.col(norm_col))
    out = hoisted.withColumn(
        out_col, F.array_min(scores).getField("cid")
    )
    return out if keep_norm_col else out.drop(norm_col)


def ivf_knn(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose inverted list is
    among the query's ``nprobe`` nearest centroids. Pass ``cents`` (e.g.
    from ivf_train_kmeans) to override the default md5-sampled
    quantizer with trained centroids.

    Scale: candidate generation touches ~nprobe/C of the corpus per query
    instead of all of it; queries (exploded to one row per probed list)
    broadcast into the assigned-vector side, so the only data-sized cost
    is the scan + the per-query top-k window over candidates. Same output
    contract as knn_bruteforce.
    """
    if cents is None:
        cents = ivf_centroids(vectors, n_centroids, id_col, vec_col)
    lit = _centroid_lit(cents)
    # norms hoisted once per row on both sides (r16): the corpus norm
    # rides next to the list assignment, the query norm feeds both the
    # probe ranking and the candidate scoring
    # keep_norm_col: ivf_assign already folds the corpus norm for its
    # centroid scoring — reuse it as nv instead of folding again
    # (ADVICE r16: one redundant O(dim) aggregate per corpus row)
    v = ivf_assign(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("vv"),
        ),
        cents,
        vec_col="vv",
        out_col="vcid",
        keep_norm_col="nv",
    )
    probe_cids = F.slice(
        F.array_sort(_centroid_scores(lit, F.col("qv"), F.col("nq"))),
        1,
        nprobe,
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("nq", _norm(F.col("qv")))
        .withColumn("pcid", F.explode(F.transform(probe_cids, lambda s: s.getField("cid"))))
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("vcid") == F.col("pcid"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn(
            "cos",
            _cos_with_norms(
                F.col("qv"), F.col("vv"), F.col("nq"), F.col("nv")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _q6("cos").alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def ivf_train_kmeans(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means refinement of the md5-sampled IVF centroids —
    closes the 'sampled init, no training' quality gap while keeping
    determinism (fixed init, fixed iteration count, no RNG).

    Each Lloyd round is one codegen assignment projection (ivf_assign —
    zero shuffle) plus one element-wise mean aggregate (posexplode →
    (cid, pos) avg → rebuild arrays), so per-iteration cost is two
    linear passes; only C centroid rows ever reach the driver, exactly
    like ivf_centroids. Because cosine() normalizes both sides, using
    the un-normalized cluster mean IS spherical k-means (the mean's
    direction maximizes the summed cosine for a fixed assignment), so
    the summed-cosine objective is monotonically non-decreasing —
    asserted in tests/test_llm_ops.py. Empty clusters keep their
    previous centroid.

    Refined centroids are engine-local (the oracle-checked
    ann_cosine_ivf_knn keeps the cross-engine-reproducible sampled
    init); pass the result to ivf_knn(..., cents=...) for the
    quality-over-parity production mode.
    """
    cents = ivf_centroids(vectors, n_centroids, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vv"),
    )
    for _ in range(iters):
        assigned = ivf_assign(v, cents, vec_col="vv", out_col="cid")
        mean_rows = (
            assigned.select("cid", F.posexplode("vv").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ),
                    lambda s: s["m"],
                ).alias("mv")
            )
            .collect()
        )
        means = {int(r["cid"]): [float(x) for x in r["mv"]] for r in mean_rows}
        cents = [(cid, means.get(cid, cv)) for cid, cv in cents]
    return cents


def ivf_quantization_cosine(
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean cosine between each vector and its assigned centroid — the
    (higher-is-better) spherical k-means objective, used to measure
    training quality."""
    v = vectors.select(
        F.col(vec_col).cast("array<double>").alias("vv")
    ).withColumn("nv", _norm(F.col("vv")))
    scores = _centroid_scores(_centroid_lit(cents), F.col("vv"), F.col("nv"))
    best = F.array_min(scores)["negcos"]
    return float(v.agg(F.avg(-best)).first()[0])


# ---------------------------------------------------------------------------
# IVF-PQ — the full compressed ANN index read path: IVF list restriction
# composed with product-quantization asymmetric-distance ranking.
# ---------------------------------------------------------------------------


def _sub_d2(a: Column, b: Column, start: Column | int, width: int) -> Column:
    """Exact squared L2 between aligned slices — the fixed-order fold
    both the PQ write side (embedding_pq_codes) and ADC read side use."""
    return F.aggregate(
        F.zip_with(
            F.slice(a, start, width),
            F.slice(b, start, width),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_encode(
    df: DataFrame,
    codebook: list[tuple[int, list[float]]],
    vec_col: str = "v",
    m_subvectors: int = 8,
    out_col: str = "codes",
) -> DataFrame:
    """Append the m-byte PQ code array: per subvector, the POSITION
    (0-based index into the codebook list) of the nearest sub-codeword —
    positional codes are what let the ADC read path address a
    precomputed distance table by element_at instead of searching the
    codebook per candidate. Pure projection over the literal codebook —
    zero shuffle; this is the write side of the index (the corpus then
    persists codes, not vectors: m bytes instead of 8*dim). Ties break
    toward the lower position (codebook list order)."""
    dim = len(codebook[0][1])
    if dim % m_subvectors:
        raise ValueError(
            f"dim={dim} not divisible by m_subvectors={m_subvectors}: "
            "trailing dimensions would silently drop from every distance"
        )
    cb = _centroid_lit(codebook)
    width = dim // m_subvectors

    def best(si: int) -> Column:
        return F.array_min(
            F.transform(
                cb,
                lambda c, i: F.struct(
                    _sub_d2(
                        F.col(vec_col), c.getField("cv"), si * width + 1, width
                    ).alias("d"),
                    i.alias("pos"),
                ),
            )
        ).getField("pos")

    return df.withColumn(
        out_col, F.array(*[best(si) for si in range(m_subvectors)])
    )


def ivfpq_knn(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m_subvectors: int = 8,
    n_codes: int = 16,
    cents: list[tuple[int, list[float]]] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """Full IVF-PQ top-k: candidates come only from the query's
    ``nprobe`` nearest inverted lists (IVF), and candidate ranking reads
    only the m-byte PQ codes via asymmetric distance (exact
    query-subvector → sub-codeword L2, summed in fixed order) — the
    architecture of every production billion-vector index (FAISS
    IVFx,PQy) as one declarative lineage.

    Scale: the corpus side carries (list id + m bytes)/vector; the query
    side (queries × probed lists × codebook distance table) folds into
    the broadcast; scoring is a codegen projection and the only shuffle
    is the per-query top-k window over candidates — ~nprobe/C of the
    corpus per query. The PQ codebook is md5-salt-sampled (decorrelated
    from the coarse quantizer's sample) for cross-engine determinism;
    swap in ivf_train_kmeans output via ``cents`` for trained lists.

    Ranking is by ADC distance ascending (id tiebreak): the compressed
    index deliberately trades exact cosine order for 64x less candidate
    I/O — measured on planted clusters, pure ADC recall@5 is ~0.3
    because 16 codewords cannot resolve WITHIN-cluster order. That is
    why every production deployment runs two stages: pass ``rerank=R``
    to take the PQ top-R shortlist per query and re-rank just those R
    by exact cosine (fetching full vectors only for the shortlist — a
    candidate-sized join, not a corpus scan); output columns then
    include cos_sim instead of adc_dist. Recall floors for both modes
    are asserted in tests/test_llm_ops.py.
    """
    if cents is None:
        cents = ivf_centroids(vectors, n_centroids, id_col, vec_col)
    codebook = ivf_centroids(vectors, n_codes, id_col, vec_col, salt="pq:")
    dim = len(codebook[0][1])
    if dim % m_subvectors:
        raise ValueError(
            f"dim={dim} not divisible by m_subvectors={m_subvectors}: "
            "trailing dimensions would silently drop from every distance"
        )
    width = dim // m_subvectors

    v = ivf_assign(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("vv"),
        ),
        cents,
        vec_col="vv",
        out_col="vcid",
    )
    coded = pq_encode(v, codebook, "vv", m_subvectors).select(
        "neighbor_id", "vcid", "codes"
    )

    lit = _centroid_lit(cents)
    probe_cids = F.slice(
        F.array_sort(_centroid_scores(lit, F.col("qv"))), 1, nprobe
    )
    # the per-query ADC DISTANCE TABLE (m x n_codes), computed ONCE per
    # query row before the candidate join: dtab[si][pos] = exact d2 of
    # the query's si-th subvector to codeword pos — each candidate then
    # costs m table lookups, never a codebook search
    dtab = F.array(
        *[
            F.array(
                *[
                    _sub_d2(
                        F.col("qv"),
                        F.array(*[F.lit(x) for x in cv]),
                        si * width + 1,
                        width,
                    )
                    for _cid, cv in codebook
                ]
            )
            for si in range(m_subvectors)
        ]
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("dtab", dtab)
        .withColumn(
            "pcid",
            F.explode(F.transform(probe_cids, lambda s: s.getField("cid"))),
        )
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_subvectors - 1)),
            lambda code, si: F.struct(code.alias("code"), si.alias("si")),
        ),
        F.lit(0.0),
        lambda acc, z: acc
        + F.element_at(
            F.element_at(F.col("dtab"), (z.getField("si") + 1).cast("int")),
            (z.getField("code") + 1).cast("int"),
        ),
    )
    scored = (
        coded.join(
            F.broadcast(q),
            (F.col("vcid") == F.col("pcid"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("adc", adc)
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc"), F.col("neighbor_id"))
    ranked = scored.withColumn("rk", F.row_number().over(w))
    if rerank is None:
        return ranked.filter(F.col("rk") <= k).select(
            "query_id",
            "neighbor_id",
            _q6("adc").alias("adc_dist"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    shortlist = ranked.filter(F.col("rk") <= rerank).select(
        "query_id", "neighbor_id", "qv"
    )
    full = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vv"),
    )
    rescored = shortlist.join(full, "neighbor_id").withColumn(
        "cos", cosine(F.col("qv"), F.col("vv"))
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _q6("cos").alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )
