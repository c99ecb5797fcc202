"""Incremental materialized-view maintenance over the versioned lake.

An aggregate MV (GROUP BY + SUM/COUNT) kept in its own VersionedTable
and refreshed from the SOURCE table's row-level change-data-feed —
never by rescanning the source. Each refresh reads only the CDF of the
versions since the MV's watermark (``table_changes_rows`` per-pair
snapshot_diff: O(delta) via the manifest shared-group skip), folds the
rows into SIGNED grouped deltas (+1 for insert/update_postimage, -1
for delete/update_preimage — an update that MOVES a row between groups
decomposes naturally into -1 old group / +1 new group), and MERGEs
them into the MV keyed on the group columns. At 100 TB this is the
difference between a nightly full rescan and a seconds-long delta
fold — the Delta Live Tables / classic incremental-view-maintenance
design, built from parts this engine already has.

The SOURCE-version watermark rides the MV's manifest ``txn`` map
ATOMICALLY with each refresh commit (the Delta transactional-writer
idea, same as make_idempotent_table_writer): a crashed or replayed
refresh can never double-apply a delta, and two concurrent refreshers
race through expected_parent — the loser re-reads the watermark and
skips. SUM/COUNT/SUMSQ are self-maintainable under deletes; AVG =
SUM/COUNT and VAR/STD from SUMSQ at read time. MIN/MAX (``min_cols``/``max_cols``) use the standard
IVM remedy for their non-self-maintainability: inserts fold with
LEAST/GREATEST, and only groups whose stored extreme was TOUCHED by a
delete are exact-recomputed from the source — group-pruned, O(delta +
endangered-group rows), never a full rescan (see _fold_stored).

Contract: group columns must be NON-NULL (MERGE matches keys by
equality, and a NULL group key would never match its MV row) and the
source must satisfy the CDF contract (key-unique on ``key``,
merge/apply_changes-maintained).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..io.versioned import (
    _CDF_PLAN_CHUNK,
    CommitConflictError,
    VersionedTable,
    merge_into,
    table_changes_cdf,
    table_signed_rows,
)

_ROWS = "n_rows"

# Signed direct fold (r16 optimization 2): when every maintained
# aggregate is LINEAR in the row multiset over EXACT arithmetic
# (integral/decimal SUMs, the row count, signed histogram buckets —
# no min/max/HLL/exact-distinct, no double sums, no sumsq), the
# refresh folds table_signed_rows directly by the GROUP columns: the
# keyed CDF's per-key shuffle and pair join disappear (unchanged rows
# cancel exactly). "0" restores the keyed-CDF fold for A/Bs. Ranges
# past _CDF_PLAN_CHUNK pairs keep the CDF path (its chunked
# evaluation bounds Catalyst analysis; the signed fold has no chunk
# machinery).
import os as _os

_SIGNED_FOLD = _os.environ.get("SPARK_GRAFT_MV_SIGNED_FOLD", "1")

# endangered-group keys are collected driver-side only up to this cap
# (to drive the group-pruned exact read); a larger set falls back to a
# distributed semi join — same bounded-driver discipline as
# io/versioned.py's _MAX_DRIVER_ROWS
_MAX_EXACT_KEYS = 8192


def _derived_names(
    group_cols: list[str],
    sum_cols: list[str],
    rows_col: str,
    min_cols: list[str],
    max_cols: list[str],
    sumsq_cols: list[str],
    distinct_cols: list[str],
    approx_distinct_cols: list[str],
    percentile_cols: list[str] | None = None,
) -> tuple[list[str], list[str], list[str], list[str], list[str]]:
    """Shared column validation + derived-name derivation for BOTH the
    batch refresher and the streaming maintainer (review r14: the
    maintainer had drifted - no collision checks), so the two paths
    raise the same clear ValueError at call time instead of an opaque
    ambiguous-column failure mid-refresh."""
    percentile_cols = list(percentile_cols or [])
    ext_names = [f"{c}_min" for c in min_cols] + [
        f"{c}_max" for c in max_cols
    ]
    sq_names = [f"{c}_sumsq" for c in sumsq_cols]
    nd_names = [f"{c}_nd" for c in distinct_cols]
    hll_names = [f"{c}_hll" for c in approx_distinct_cols]
    hist_names = [f"{c}_hist" for c in percentile_cols]
    taken = {*group_cols, *sum_cols, rows_col}
    if rows_col in group_cols or rows_col in sum_cols:
        raise ValueError(
            f"rows_col {rows_col!r} collides with a group/sum column "
            "- pass rows_col=<other name> (an MV-over-MV rollup that "
            "groups by the lower MV's count column hits this)"
        )
    for c in [
        *min_cols, *max_cols, *sumsq_cols, *distinct_cols,
        *approx_distinct_cols, *percentile_cols,
    ]:
        if c in group_cols:
            raise ValueError(
                f"derived-aggregate column {c!r} is a group column"
            )
    for n in [*ext_names, *sq_names, *nd_names, *hll_names, *hist_names]:
        if n in taken:
            raise ValueError(f"derived column name {n!r} collides")
    return ext_names, sq_names, nd_names, hll_names, hist_names


def _sweep_zero_groups(mv: VersionedTable, spark, rows_col: str) -> None:
    """Sweep zero-count groups (MERGE leaves them; deleting inside the
    MERGE would break the signed-fold algebra). The sweep commits
    OUTSIDE the refresh's retry loop, so a concurrent refresher can
    land between the MERGE and the sweep — a conflict here is
    SWALLOWED, not raised (r13 advice): the sweep is self-healing by
    design (every refresh re-runs it, and zero-touch sweeps commit
    nothing), while a raise would fail a streaming batch whose MERGE
    had already committed and crash the stream avoidably."""
    try:
        mv.delete_where(spark, F.col(rows_col) == 0, prune_where="auto")
    except CommitConflictError:
        pass  # next refresh's sweep converges the residue


def _pin_deltas(df):
    """Materialize a delta pipeline ONCE before merge_into consumes it:
    the merge runs at least two actions over its source (touch test +
    group write), and without a persist each action re-executes the
    whole upstream CDF diff + aggregation — measured 3x the per-refresh
    cost on the bench cycle (guide §1/§2: don't recompute). Deltas are
    aggregate-sized (one row per touched group), so MEMORY_AND_DISK is
    bounded; lineage is kept (unlike localCheckpoint) so executor loss
    recomputes. Callers unpersist right after the merge commits."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)


def _sign_col():
    """+1 for insert/update_postimage, -1 for delete/update_preimage —
    THE signed-multiset convention every MV fold in this module uses
    (refresh_mv, refresh_join_mv via _signed_cdf, make_mv_maintainer).
    One definition so the folds can never drift."""
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"),
        F.lit(1),
    ).otherwise(F.lit(-1))


def _sum_fold_types(schema, sum_cols: list[str]) -> dict[str, str]:
    """Per-column fold type for SUM aggregates — review finding (r13
    continuation): the old unconditional bigint cast silently
    TRUNCATED fractional sums, so each incremental fold drifted from a
    full recompute with no error. Integrals fold exactly as bigint;
    float/double fold as double (FP addition error is inherent to
    incremental maintenance of float sums — re-bootstrap to squash
    accumulated error); decimals (r14, replacing the r13 loud
    rejection) fold EXACTLY as decimal(38, s) — the same max-precision
    widening Spark's own SUM uses (precision + 10, capped at 38), so
    the incremental +-fold can never drift from a full recompute while
    the true sum fits 38 digits; past that the fold overflows to NULL
    loudly rather than silently wrapping."""
    types = {f.name: f.dataType for f in schema.fields}
    out: dict[str, str] = {}
    for c in sum_cols:
        if c not in types:
            raise ValueError(f"sum column {c!r} not in source schema")
        name = types[c].typeName()
        if name in ("byte", "short", "integer", "long"):
            out[c] = "bigint"
        elif name in ("float", "double"):
            out[c] = "double"
        elif name == "decimal":
            out[c] = f"decimal(38,{types[c].scale})"
        else:
            raise ValueError(
                f"sum column {c!r} has type "
                f"{types[c].simpleString()}: only integral (exact "
                "bigint fold), float/double, and decimal (exact "
                "decimal(38,s) fold) columns are maintainable"
            )
    return out


# -- MV spec self-description (r16, VERDICT #2) -------------------------
#
# refresh_mv / refresh_join_mv / make_mv_maintainer used to TRUST the
# caller to re-state the MV's spec on every call — a wrong
# group_cols/measure mapping silently re-aggregated garbage (only
# schema-missing columns failed loudly). The spec is now RECORDED in a
# sidecar ``_mv_spec.json`` at the MV root when the MV bootstraps
# (vacuum never touches files outside data/ and _manifests/, and a
# re-bootstrap overwrites it): every later refresh VALIDATES its
# kwargs against the recorded spec and raises with a remedy on any
# drift, and rewrite_with_mv can be called with just (group_cols,
# measures) — the MV describes itself. The spec also pins
# ``hist_encoding`` so histograms stored under an older bucket
# encoding fail loudly instead of decoding garbage. MVs bootstrapped
# before the spec existed adopt the caller's kwargs once on their
# next refresh — unless they maintain percentile columns, whose
# stored maps may predate encoding 2; those must re-bootstrap.

_SPEC_FILE = "_mv_spec.json"
_SPEC_VERSION = 1


def _norm_key(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _spec_path(mv: VersionedTable) -> str:
    import os

    return os.path.join(mv.path, _SPEC_FILE)


def load_mv_spec(mv: VersionedTable) -> dict | None:
    """The MV's recorded self-description (grouping, measure families,
    CDF key, rel_err, histogram encoding), written at bootstrap.
    Returns None for MVs bootstrapped before the spec existed (they
    adopt a spec on their next refresh)."""
    import json

    try:
        with open(_spec_path(mv)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _store_spec(mv: VersionedTable, spec: dict) -> None:
    import json
    import os
    import uuid

    os.makedirs(mv.path, exist_ok=True)
    p = _spec_path(mv)
    tmp = f"{p}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(spec, f, sort_keys=True)
    os.replace(tmp, p)


def rename_in_spec(mv: VersionedTable, renames: dict[str, str]) -> None:
    """Lockstep companion to rename_column for spec-recorded MVs: the
    documented rename recipe (rename the source column and the MV's
    column together, then refresh under the NEW name) now has a third
    step — rewrite the recorded spec's column references so the
    new-name kwargs validate. Maps every column-list field plus
    rows_col/key/on; no-op when the MV has no recorded spec."""
    spec = load_mv_spec(mv)
    if spec is None:
        return
    sw = spec.get("source_where")
    if sw and any(old in sw for old in renames):
        # the predicate is an opaque SQL string — rewriting column
        # references inside it safely would need a parser; a
        # conservative substring hit refuses rather than recording a
        # spec whose predicate silently references a dead name
        raise ValueError(
            f"MV at {mv.path} has source_where={sw!r} which may "
            "reference a renamed column — re-bootstrap the MV with "
            "the updated predicate instead of renaming in place"
        )
    for f in (
        "group_cols", "sum_cols", "min_cols", "max_cols",
        "sumsq_cols", "distinct_cols", "approx_distinct_cols",
        "percentile_cols", "key", "key_a", "key_b", "on",
    ):
        if isinstance(spec.get(f), list):
            spec[f] = [renames.get(x, x) for x in spec[f]]
    if isinstance(spec.get("rows_col"), str):
        spec["rows_col"] = renames.get(spec["rows_col"], spec["rows_col"])
    _store_spec(mv, spec)


def _validate_spec(mv: VersionedTable, spec: dict) -> None:
    """Incremental-refresh gate: the caller's canonicalized kwargs
    must equal the recorded spec field for field. A missing spec file
    (pre-spec MV) adopts the caller's kwargs once — except when
    percentile columns are declared, where the stored maps may predate
    the current bucket encoding and only a re-bootstrap is safe."""
    stored = load_mv_spec(mv)
    if stored is None:
        if spec.get("percentile_cols"):
            raise ValueError(
                f"MV at {mv.path} predates the recorded spec and "
                "maintains percentile histograms — their stored maps "
                "may use an older bucket encoding. Re-bootstrap the "
                "MV (delete it or refresh after a source overwrite) "
                "to adopt a spec"
            )
        _store_spec(mv, spec)
        return
    if stored.get("percentile_cols") and (
        stored.get("hist_encoding") != _HIST_ENCODING
    ):
        raise ValueError(
            f"MV at {mv.path} stores percentile histograms under "
            f"bucket encoding {stored.get('hist_encoding')} but this "
            f"build writes encoding {_HIST_ENCODING} — the maps are "
            "not interoperable; re-bootstrap the MV"
        )
    if stored != spec:
        diff = sorted(
            k
            for k in {*stored, *spec}
            if stored.get(k) != spec.get(k)
        )
        raise ValueError(
            f"MV spec mismatch at {mv.path}: field(s) {diff} differ "
            "from the spec recorded at bootstrap — a mismatched "
            "refresh would fold wrong aggregates. Pass the recorded "
            "spec (load_mv_spec(mv) returns it), re-bootstrap the MV "
            "to change it, or — after a lockstep column rename — "
            "rename_in_spec(mv, {old: new})"
        )


# -- approx-percentile measures: signed log-bucket histograms (r15) -----
#
# Unlike MIN/MAX (endangered-group recompute) and HLL sketches (cannot
# forget), a LOG-BUCKET HISTOGRAM is fully self-maintainable under
# BOTH inserts and deletes: the MV stores, per group, a
# map<bucket, signed count> where bucket = sign-mirrored
# floor(log_base |v|). Delta folds add signed per-bucket counts and a
# map merge in the MERGE clause keeps the state exact — O(delta)
# always, no endangered recompute, no aux table. Percentile estimates
# read the histogram per-row (array_sort + aggregate, JVM-side): the
# value at rank ceil(q*n) lies in a known bucket whose geometric
# midpoint is within ``rel_err`` of it (base = (1+rel_err)^2, so the
# half-bucket ratio sqrt(base) = 1+rel_err). Contract: finite values;
# NaN/Inf are ignored like NULLs (their bucket is NULL); bucket ids
# fit int comfortably (|id| <= ~75k at rel_err=0.01 across the whole
# double range). The estimator and the refresher must use the SAME
# rel_err (it is the bucket geometry, like rows_col is a name).
#
# ENCODING (r16, fixes the r15 sign/fraction bug): the magnitude index
# mag = floor(log_base |v|) is NEGATIVE for |v| < 1, so a raw
# sign-mirrored ``±(mag+1)`` id collides positive fractions with the
# negative mirror range (at 1%: +0.5 → id −34, the same id a negative
# value near −1.95 gets — decoded percentiles came back with the wrong
# sign and magnitude). The fix is DDSketch's two-store idea flattened
# into one keyspace: shift
# magnitudes by an OFFSET deeper than the deepest representable double
# exponent, so every positive value maps to a strictly POSITIVE id and
# every negative value to its strictly NEGATIVE mirror:
#     id = 0                      for v == 0
#     id = +(OFFSET + mag + 1)    for v > 0
#     id = −(OFFSET + mag + 1)    for v < 0
# OFFSET = ceil(745 / ln(base)) + 2 > |mag| for any finite double
# (|ln 4.9e−324| ≈ 744.44), so id order == value order across the
# whole signed double line, fractions included. Stored maps written by
# the r15 encoder are incompatible — re-bootstrap the MV (the spec
# records hist_encoding, so a mismatch fails loudly rather than
# decoding garbage).

_DEFAULT_PCT_ERR = 0.01
_HIST_ENCODING = 2  # bump when the bucket↔value mapping changes


def _hist_base(rel_err: float) -> float:
    if not (0 < rel_err < 1):
        raise ValueError(f"percentile_rel_err must be in (0,1): {rel_err}")
    return (1.0 + float(rel_err)) ** 2


def _hist_offset(base: float) -> int:
    """Magnitude shift that makes bucket ids sign-pure: strictly larger
    than |floor(log_base |v|)| for every finite nonzero double (the
    deepest denormal is 4.9e−324, |ln| ≈ 744.44). Guarded so twice the
    id range still fits int32 — rel_err below ~7e−7 would overflow the
    stored map's int key (and be absurd precision for a sketch)."""
    import math

    off = int(math.ceil(745.0 / math.log(base))) + 2
    if 2 * off + 4 > 2**31 - 1:
        raise ValueError(
            "percentile_rel_err too small: bucket ids would overflow "
            f"int32 (offset {off}); use rel_err >= 1e-6"
        )
    return off


def _hist_bucket(col, base: float):
    """Offset sign-mirrored log bucket id (see the module notes): 0 for
    0, +(OFFSET + floor(log_base v) + 1) for v>0, the negated mirror
    for v<0 — positive values occupy a strictly positive id range, so
    ids are ordered by value across fractions and mixed signs, and
    percentile scans walk them ascending. NULL (and non-finite, whose
    log/cast degenerates to NULL) values get a NULL id and are
    ignored."""
    import math

    v = F.col(col).cast("double") if isinstance(col, str) else col
    off = _hist_offset(base)
    mag = (F.floor(F.log(F.abs(v)) / F.lit(math.log(base)))).cast("int")
    non_finite = (
        v.isNull() | F.isnan(v) | (F.abs(v) == F.lit(float("inf")))
    )
    shifted = mag + F.lit(off + 1)
    return (
        F.when(non_finite, F.lit(None).cast("int"))
        .when(v == 0, F.lit(0))
        .when(v > 0, shifted)
        .otherwise(-shifted)
    )


_HIST_TYPE = "map<int,bigint>"


def _hist_map(df, group_cols: list[str], col: str, base: float, sign):
    """Per-group signed histogram of ``col``: (group, bucket) counts
    folded with ``sign`` (+1 literal for bootstraps, the CDF sign for
    deltas), zero buckets dropped, packed as one map per group. Two
    narrow shuffles over the delta only."""
    b = _hist_bucket(col, base).alias("__hb")
    per_bucket = (
        df.select(*group_cols, b, sign.alias("__hs"))
        .filter(F.col("__hb").isNotNull())
        .groupBy(*group_cols, "__hb")
        .agg(F.sum("__hs").cast("bigint").alias("__hc"))
        .filter(F.col("__hc") != 0)
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("__hb"), F.col("__hc")))
            )
        )
        .cast(_HIST_TYPE)
        .alias(f"{col}_hist")
    )


def _hist_merge_expr(name: str):
    """MERGE when_matched combiner for a histogram column: union-keyed
    signed add via map_zip_with, zero buckets dropped — the stored map
    stays exactly the histogram a full recompute would build."""
    empty = F.expr(f"cast(map() as {_HIST_TYPE})")
    return F.map_filter(
        F.map_zip_with(
            F.coalesce(F.col(f"t.{name}"), empty),
            F.coalesce(F.col(f"s.{name}"), empty),
            lambda k, a, b: F.coalesce(a, F.lit(0).cast("bigint"))
            + F.coalesce(b, F.lit(0).cast("bigint")),
        ),
        lambda k, v: v != 0,
    )


def _attach_hists(deltas, df, group_cols, percentile_cols, base, sign):
    """Join each percentile column's histogram (built from ``df``, the
    bootstrap snapshot or the CDF window) onto the grouped delta rows;
    groups with no non-null values get an empty map, so the MV column
    is never NULL."""
    empty = F.expr(f"cast(map() as {_HIST_TYPE})")
    for c in percentile_cols:
        h = _hist_map(df, group_cols, c, base, sign)
        deltas = deltas.join(h, on=group_cols, how="left").withColumn(
            f"{c}_hist", F.coalesce(F.col(f"{c}_hist"), empty)
        )
    return deltas


def _attach_merged_hists(deltas, df, group_cols, hist_names, sign):
    """Rollup twin of _attach_hists: ``df``'s ``hist_names`` columns
    are ALREADY log-bucket histogram maps (a fine MV's ``<col>_hist``),
    so the per-group fold is a pure signed MAP MERGE — explode the
    entries, scale each bucket count by ``sign`` (+1 literal for
    bootstraps, the CDF sign for deltas: an update-preimage subtracts
    the fine group's old histogram exactly), sum per (group, bucket),
    drop zero buckets, repack. Because bucketing is deterministic, the
    merged map is byte-identical to the histogram a full rebuild from
    the BASE table would produce. Two narrow shuffles over the delta
    only; groups with no entries get an empty map (never NULL)."""
    empty = F.expr(f"cast(map() as {_HIST_TYPE})")
    for name in hist_names:
        per_bucket = (
            df.select(
                *group_cols,
                sign.alias("__hs"),
                F.explode(F.map_entries(F.col(name))).alias("__e"),
            )
            .groupBy(*group_cols, F.col("__e.key").alias("__hb"))
            .agg(
                F.sum(F.col("__hs") * F.col("__e.value"))
                .cast("bigint")
                .alias("__hc")
            )
            .filter(F.col("__hc") != 0)
        )
        h = per_bucket.groupBy(*group_cols).agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__hb"), F.col("__hc"))
                    )
                )
            )
            .cast(_HIST_TYPE)
            .alias(name)
        )
        deltas = deltas.join(h, on=group_cols, how="left").withColumn(
            name, F.coalesce(F.col(name), empty)
        )
    return deltas


def hist_percentile(
    name, q: float, rel_err: float = _DEFAULT_PCT_ERR
):
    """Read-time percentile estimate from a stored ``<col>_hist``
    histogram column — a per-row JVM expression (no shuffle): the
    bucket containing the value at rank ceil(q*n) (percentile_disc
    semantics), represented by its geometric midpoint, within
    ``rel_err`` of the true value. Pass the SAME rel_err the refresher
    used. q=0 returns the lowest bucket's representative."""
    import math

    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0,1]: {q}")
    base = _hist_base(rel_err)
    lb = math.log(base)
    hist = F.col(name) if isinstance(name, str) else name
    entries = F.array_sort(F.map_entries(hist))
    total = F.aggregate(
        entries,
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e["value"],
    )
    target = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(total.cast("double") * F.lit(float(q))).cast("bigint"),
    )
    picked = F.aggregate(
        entries,
        F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(None).cast("int").alias("bid"),
        ),
        lambda a, e: F.struct(
            (a["cum"] + e["value"]).alias("cum"),
            F.when(a["bid"].isNotNull(), a["bid"])
            .otherwise(
                F.when(a["cum"] + e["value"] >= target, e["key"])
            )
            .alias("bid"),
        ),
    )
    bid = picked["bid"]
    # invert the offset encoding: |id| = OFFSET + mag + 1, the bucket
    # covers (base^mag, base^(mag+1)], geometric midpoint exponent
    # mag + 0.5 = |id| − OFFSET − 0.5
    off = _hist_offset(base)
    mid = F.exp(
        (F.abs(bid).cast("double") - F.lit(float(off) + 0.5)) * F.lit(lb)
    )
    return (
        F.when(total == 0, F.lit(None).cast("double"))
        .when(bid == 0, F.lit(0.0))
        .when(bid > 0, mid)
        .otherwise(-mid)
    )


def _where_conjuncts(spark: SparkSession, sql: str) -> list[str]:
    """Top-level AND conjuncts of a SQL predicate, each normalized to
    the parser's canonical ``.sql()`` rendering — so matching is
    whitespace/keyword-case/conjunct-order insensitive, but makes NO
    attempt at deeper logical equivalence (``a >= 3`` does not match a
    view's ``a >= 2``; the rewrite stays conservative and returns
    None)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    parser = spark._jsparkSession.sessionState().sqlParser()

    def flat(e):
        if e.getClass().getSimpleName() == "And":
            return flat(e.left()) + flat(e.right())
        return [e.sql()]

    try:
        return flat(parser.parseExpression(sql))
    except (Py4JJavaError, AnalysisException) as e:
        # the gateway surfaces Java ParseException as pyspark's
        # captured ParseException (an AnalysisException subclass)
        raise ValueError(f"unparseable predicate {sql!r}: {e}") from e


def rewrite_with_mv(
    mv: VersionedTable,
    spark: SparkSession,
    *,
    group_cols: list[str],
    measures: dict[str, tuple],
    where: str | None = None,
    having: str | None = None,
    mv_group_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    rows_col: str | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    approx_distinct_cols: list[str] | None = None,
    percentile_cols: list[str] | None = None,
    percentile_rel_err: float | None = None,
):
    """MV QUERY REWRITE — the read side of IVM (r15 VERDICT #5): answer
    a source-form ``GROUP BY group_cols`` aggregate FROM the MV when
    the requested grouping/measure set is subsumed by what the MV
    maintains, and return ``None`` otherwise so the caller falls back
    to the source. The returned plan scans ONLY the MV — on a 100 TB
    source that is the difference between a full scan and reading a
    few thousand pre-aggregated rows.

    ``measures`` maps output column name -> measure tuple:
      ("count",)                   <- rows_col (COUNT(*))
      ("sum", c) / ("avg", c)      <- c in sum_cols (avg needs rows too)
      ("min", c) / ("max", c)      <- c in min_cols / max_cols
      ("var_pop", c) /
      ("stddev_pop", c)            <- c in sumsq_cols AND sum_cols
                                      (assumes c non-null, the sumsq
                                      contract)
      ("count_distinct", c)        <- c in distinct_cols: exact
                                      grouping reads <c>_nd; a SUBSET
                                      grouping is answered EXACTLY
                                      from the aux support table
                                      (distinct (group, value) rows
                                      re-count at any coarser
                                      grouping — still no source IO)
      ("approx_count_distinct", c) <- c in approx_distinct_cols (HLL
                                      sketches re-aggregate by union)
      ("percentile", c, q)         <- c in percentile_cols (histogram
                                      maps re-aggregate by signed
                                      bucket union — collect_list +
                                      map_zip_with fold, JVM-side)

    Subsumption: set(group_cols) must be a subset of the MV's grouping.
    EXACT grouping (equal sets) answers with a pure projection — zero
    shuffle; a strict subset re-aggregates the MV's rows (SUM/COUNT/
    SUMSQ re-add, MIN/MAX re-extremize, HLL re-unions), one shuffle
    over MV-sized input.

    Spec (r16, VERDICT #2): the MV DESCRIBES ITSELF — when a recorded
    spec exists (every MV bootstrapped since r16 has one), call with
    just (group_cols, measures) and the grouping/measure families/
    rows_col/rel_err are read from the record; any explicitly-passed
    field is VALIDATED against it and a mismatch raises (a wrong
    re-statement would silently re-aggregate garbage). Pre-spec MVs
    fall back to the caller's full re-statement (mv_group_cols
    required).

    ``where`` (r16) is the query's WHERE clause, subsumption-checked
    against the view (conjunct-based, conservative):

    * every conjunct of the view's recorded ``source_where`` must
      appear verbatim (parser-normalized) among the query's conjuncts
      — the query then syntactically implies the view's predicate, so
      every qualifying row is IN the view;
    * the RESIDUAL query conjuncts must reference only the MV's
      GROUPING columns (a group-column filter commutes with the
      grouping, so it applies directly to MV rows — and to the aux
      support table for coarse exact count_distinct); a residual
      touching a measure column returns None (post-aggregation rows
      cannot re-derive a row-level filter);
    * an unfiltered query (``where=None``) over a FILTERED MV returns
      None — the view is missing rows the query needs.

    Same trust contract as ``source_where``: deterministic row-level
    predicates. Matching is syntactic per-conjunct; a logically-but-
    not-syntactically implied predicate (query ``a >= 3`` vs the
    view's ``a >= 2``) conservatively falls back to the source.

    ``having`` (r16) is a post-aggregation predicate applied to the
    ANSWERED frame — HAVING pushed to the MV. It may reference the
    requested measure output names and grouping columns (and, for
    exact groupings, the MV's stored measure columns — SQL's "HAVING
    can reference aggregates not in SELECT"); one that resolves
    against none of those returns None (fallback), and unparseable
    SQL raises ValueError.

    Consistency: the MV and (for coarse count_distinct) its aux
    support table are each read at their own LATEST — under a racing
    refresher the aux may momentarily be one window ahead of the MV
    snapshot, the same read-latest convergence choice _fold_distinct
    documents; refresh once with no concurrent writers for a
    version-consistent view."""
    stored = load_mv_spec(mv)
    if stored is not None:
        if stored.get("percentile_cols") and (
            stored.get("hist_encoding") != _HIST_ENCODING
        ):
            raise ValueError(
                f"MV at {mv.path} stores percentile histograms under "
                f"bucket encoding {stored.get('hist_encoding')} but "
                f"this build reads encoding {_HIST_ENCODING} — "
                "re-bootstrap the MV before rewriting through it"
            )

        def rec(field, default):
            v = stored.get(field)
            return default if v is None else v

        resolved = {
            "mv_group_cols": list(stored["group_cols"]),
            "sum_cols": rec("sum_cols", []),
            "rows_col": rec("rows_col", _ROWS),
            "min_cols": rec("min_cols", []),
            "max_cols": rec("max_cols", []),
            "sumsq_cols": rec("sumsq_cols", []),
            "distinct_cols": rec("distinct_cols", []),
            "approx_distinct_cols": rec("approx_distinct_cols", []),
            "percentile_cols": rec("percentile_cols", []),
            "percentile_rel_err": rec(
                "percentile_rel_err", _DEFAULT_PCT_ERR
            ),
        }
        passed = {
            "mv_group_cols": mv_group_cols,
            "sum_cols": sum_cols,
            "rows_col": rows_col,
            "min_cols": min_cols,
            "max_cols": max_cols,
            "sumsq_cols": sumsq_cols,
            "distinct_cols": distinct_cols,
            "approx_distinct_cols": approx_distinct_cols,
            "percentile_cols": percentile_cols,
            "percentile_rel_err": percentile_rel_err,
        }
        drift = sorted(
            k
            for k, v in passed.items()
            if v is not None and (
                float(v) != float(resolved[k])
                if k == "percentile_rel_err"
                else list(v) != list(resolved[k])
                if isinstance(v, (list, tuple))
                else v != resolved[k]
            )
        )
        if drift:
            raise ValueError(
                f"rewrite spec mismatch at {mv.path}: field(s) "
                f"{drift} differ from the MV's recorded spec — drop "
                "the argument(s) (the MV describes itself) or pass "
                "the recorded values (load_mv_spec(mv))"
            )
        mv_group_cols = resolved["mv_group_cols"]
        sum_cols = resolved["sum_cols"]
        rows_col = resolved["rows_col"]
        min_cols = resolved["min_cols"]
        max_cols = resolved["max_cols"]
        sumsq_cols = resolved["sumsq_cols"]
        distinct_cols = resolved["distinct_cols"]
        approx_distinct_cols = resolved["approx_distinct_cols"]
        percentile_cols = resolved["percentile_cols"]
        percentile_rel_err = resolved["percentile_rel_err"]
    elif mv_group_cols is None:
        raise ValueError(
            f"MV at {mv.path} has no recorded spec (pre-spec "
            "bootstrap) — pass mv_group_cols and the measure "
            "families explicitly, or refresh it once to adopt a spec"
        )
    sum_cols = list(sum_cols or [])
    rows_col = rows_col or _ROWS
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    distinct_cols = list(distinct_cols or [])
    approx_distinct_cols = list(approx_distinct_cols or [])
    percentile_cols = list(percentile_cols or [])
    if percentile_rel_err is None:
        percentile_rel_err = _DEFAULT_PCT_ERR
    view_where = (
        stored.get("source_where") if stored is not None else None
    )
    residual: list[str] = []
    if where is None:
        if view_where:
            # the MV holds only its predicate's rows; an unfiltered
            # query needs rows the view never saw
            return None
    else:
        residual = _where_conjuncts(spark, where)
        for c in (
            _where_conjuncts(spark, view_where) if view_where else []
        ):
            if c in residual:
                residual.remove(c)
            else:
                return None  # query does not imply the view predicate
    if not set(group_cols) <= set(mv_group_cols):
        return None
    exact = set(group_cols) == set(mv_group_cols)

    def measure_expr(spec: tuple):
        kind = spec[0]
        if kind == "count":
            return F.col(rows_col) if exact else F.sum(rows_col)
        c = spec[1] if len(spec) > 1 else None
        if kind == "sum" and c in sum_cols:
            return F.col(c) if exact else F.sum(c)
        if kind == "avg" and c in sum_cols:
            if exact:
                return F.col(c) / F.col(rows_col)
            return F.sum(c) / F.sum(rows_col)
        if kind == "min" and c in min_cols:
            n = f"{c}_min"
            return F.col(n) if exact else F.min(n)
        if kind == "max" and c in max_cols:
            n = f"{c}_max"
            return F.col(n) if exact else F.max(n)
        if kind in ("var_pop", "stddev_pop") and (
            c in sumsq_cols and c in sum_cols
        ):
            sq = F.col(f"{c}_sumsq") if exact else F.sum(f"{c}_sumsq")
            s = F.col(c) if exact else F.sum(c)
            n = F.col(rows_col) if exact else F.sum(rows_col)
            n = n.cast("double")
            var = sq / n - F.pow(s.cast("double") / n, F.lit(2))
            # FP rounding can push a zero-variance group epsilon-negative
            var = F.greatest(var, F.lit(0.0))
            return var if kind == "var_pop" else F.sqrt(var)
        if kind == "count_distinct" and c in distinct_cols and exact:
            return F.col(f"{c}_nd")
        if kind == "approx_count_distinct" and c in approx_distinct_cols:
            h = F.col(f"{c}_hll")
            if exact:
                return F.hll_sketch_estimate(h)
            return F.hll_sketch_estimate(F.hll_union_agg(h))
        if kind == "percentile" and c in percentile_cols:
            h = F.col(f"{c}_hist")
            if not exact:
                # merge the finer groups' histograms: fold the
                # collected maps with the same signed bucket union the
                # MERGE clause uses — per coarse group the list holds
                # at most the MV's finer-group count, folded JVM-side
                empty = F.expr(f"cast(map() as {_HIST_TYPE})")
                h = F.aggregate(
                    F.collect_list(h),
                    empty,
                    lambda acc, m: F.map_filter(
                        F.map_zip_with(
                            acc,
                            m,
                            lambda k, a, b: F.coalesce(
                                a, F.lit(0).cast("bigint")
                            )
                            + F.coalesce(b, F.lit(0).cast("bigint")),
                        ),
                        lambda k, v: v != 0,
                    ),
                )
            return hist_percentile(h, float(spec[2]), percentile_rel_err)
        return None

    exprs = []
    aux_nd: dict[str, str] = {}
    for out_name, spec in measures.items():
        spec = tuple(spec)
        if (
            spec[0] == "count_distinct"
            and not exact
            and len(spec) > 1
            and spec[1] in distinct_cols
        ):
            # the per-group nd numbers cannot re-aggregate (a value in
            # two finer groups must count once), but the aux SUPPORT
            # TABLE holds exactly the distinct (group, value) pairs —
            # re-counting those at the coarser grouping is exact
            aux_nd[out_name] = spec[1]
            continue
        e = measure_expr(spec)
        if e is None:
            return None  # not subsumed -> caller computes from source
        exprs.append(e.alias(out_name))
    df = mv.read(spark)
    resid_expr = None
    if residual:
        # each conjunct is already parenthesized by the parser's .sql()
        resid_sql = " AND ".join(residual)
        from pyspark.errors import AnalysisException
        from pyspark.sql.types import StructType

        gset = set(mv_group_cols)
        probe = spark.createDataFrame(
            [], StructType([f for f in df.schema.fields if f.name in gset])
        )
        try:
            # a frame holding ONLY the grouping columns: analysis fails
            # iff the residual references anything else (a plain
            # select+filter probe would not — Spark resolves missing
            # filter references through a projection)
            probe.filter(F.expr(resid_sql)).schema
        except AnalysisException:
            return None  # residual needs row-level (measure) columns
        resid_expr = F.expr(resid_sql)
        df = df.filter(resid_expr)
    if exact:
        out = df.select(*group_cols, *exprs)
    else:
        out = df.groupBy(*group_cols).agg(*exprs)
    for out_name, c in aux_nd.items():
        nd = nd_aux_table(mv, c).read(spark)
        if resid_expr is not None:
            # the aux support table carries the MV's grouping columns,
            # so the same group-column residual applies
            nd = nd.filter(resid_expr)
        nd = (
            nd
            .filter(F.col("cnt") > 0)
            .groupBy(*group_cols)
            .agg(F.count_distinct(F.col(c)).cast("bigint").alias(out_name))
        )
        out = out.join(nd, on=group_cols, how="left").withColumn(
            out_name,
            F.coalesce(F.col(out_name), F.lit(0).cast("bigint")),
        )
    if having is not None:
        # post-aggregation predicate over the ANSWERED frame. Names
        # resolve against the output (requested measures + grouping);
        # in the exact-grouping case resolution may also reach the
        # MV's stored measure columns through the projection — which
        # is precisely SQL's "HAVING may reference aggregates not in
        # SELECT" (the stored columns ARE group aggregates). A
        # predicate that resolves against neither (subset grouping
        # referencing an unrequested measure) conservatively falls
        # back. Garbage SQL raises like `where` does.
        from pyspark.errors import AnalysisException

        _where_conjuncts(spark, having)  # parse gate: ValueError
        try:
            out = out.filter(F.expr(having))
            out.schema  # force analysis now, not at the caller
        except AnalysisException:
            return None
    return out


def _watermark(
    mv: VersionedTable, tag: str
) -> tuple[int | None, int | None]:
    """(mv_version, source_watermark) read from ONE manifest, so the
    stored extremes the incremental arm joins against are the exact
    state the watermark describes (reads pin version=mv_version, the
    merge pins expected_parent=mv_version — a racing refresher forces
    CommitConflictError and a clean re-read)."""
    latest = mv.latest_version()
    if latest is None:
        return None, None
    wm = (mv._load_manifest(latest).get("txn") or {}).get(tag)
    return latest, (None if wm is None else int(wm))


def refresh_mv(
    source: VersionedTable,
    mv: VersionedTable,
    spark: SparkSession,
    *,
    name: str,
    group_cols: list[str],
    sum_cols: list[str],
    key: str | list[str],
    rows_col: str = _ROWS,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    approx_distinct_cols: list[str] | None = None,
    percentile_cols: list[str] | None = None,
    percentile_rel_err: float = _DEFAULT_PCT_ERR,
    source_where: str | None = None,
    pin_watermark: bool = False,
) -> int:
    """Bring ``mv`` up to the source's latest version; returns the
    source version the MV now reflects. First call BOOTSTRAPS (one
    full aggregate of the source — the only full scan the MV ever
    costs); every later call folds the CDF delta since the watermark.
    Groups whose row count reaches zero are swept (a crash between the
    merge and the sweep leaves a zero-count row; the sweep runs every
    refresh, so the next call converges it — zero-touch sweeps commit
    nothing).

    ``min_cols`` / ``max_cols`` (r13, continued) add MIN/MAX to the MV
    as ``<col>_min`` / ``<col>_max`` — the aggregates classic IVM
    excludes because they are not self-maintainable under deletes.
    The standard remedy is implemented instead of the exclusion:
    inserts fold with LEAST/GREATEST (always safe); a delete (or
    update-preimage) whose value TOUCHES the group's stored extreme
    makes the group ENDANGERED, and exactly those groups are
    recomputed from the source snapshot — group-pruned through the
    manifest stats (single group column, ≤ _MAX_EXACT_KEYS endangered
    keys) or a semi join otherwise. Cost stays O(delta + rows of
    endangered groups), never a full rescan; the exact values ride the
    SAME single MERGE commit, so crash/replay atomicity is unchanged.

    ``sumsq_cols`` adds ``<col>_sumsq`` (sum of squares, folded as
    double — a large integral's square overflows bigint), making
    VAR/STDDEV derivable at read time: VAR = sumsq/n - (sum/n)^2.
    Like SUM it is fully self-maintainable under deletes.

    ``distinct_cols`` (r14) adds EXACT COUNT DISTINCT as ``<col>_nd``
    — not self-maintainable in the MV row alone (an insert only grows
    the count if the value is NEW to the group; a delete only shrinks
    it if it removed the LAST occurrence), so each column keeps the
    classic exact-IVM support table (see nd_aux_table): a sibling
    VersionedTable keyed (group..., value) holding the signed
    occurrence count, folded O(delta) from the SAME CDF walk, with
    its own watermark in its own txn map (crash between the aux
    commit and the MV merge replays safely — the aux fold skips, the
    nd recompute still runs). nd per touched group is then COUNT of
    live aux rows, group-pruned to the delta's keys. NULLs are
    ignored (SQL COUNT(DISTINCT ...) semantics). Renaming a distinct
    column is not auto-tracked — re-bootstrap (or rename the aux
    column in lockstep).

    ``approx_distinct_cols`` (r14) adds APPROX COUNT DISTINCT as a
    mergeable HLL sketch ``<col>_hll`` (estimate at read time with
    F.hll_sketch_estimate): inserts fold by sketch UNION with no aux
    state at all; ANY delete in a group endangers it (a sketch cannot
    forget) and exactly those groups re-sketch from the source
    snapshot, group-pruned (see _fold_stored). Choose it for
    insert-mostly corpora; choose ``distinct_cols`` for exact values
    or delete-heavy workloads.

    ``percentile_cols`` (r15) adds APPROX PERCENTILES as a signed
    log-bucket histogram ``<col>_hist`` (map<bucket, count>; see the
    module-level histogram notes). Unlike MIN/MAX and HLL it is fully
    self-maintainable under deletes — O(delta) always, no endangered
    recompute, no aux state. Estimate at read time with
    ``hist_percentile(f"{col}_hist", q, rel_err)`` using the SAME
    ``percentile_rel_err`` (default 1%) — the estimate is within that
    relative error of the exact percentile_disc value.

    ``pin_watermark=True`` tags the source at each new watermark
    (``mvpin-<name>-<v>``, previous pin swept), so an aggressive
    vacuum() can never expire the manifests the next refresh's CDF
    walk needs — without it, a vacuum past the watermark forces an MV
    re-bootstrap (the documented remedy). Main-chain sources only
    (tags live on main).

    Spec self-description (r16): the bootstrap RECORDS these kwargs
    in ``_mv_spec.json`` at the MV root; every later refresh
    validates against the record and a mismatched re-statement
    raises instead of folding wrong aggregates (see _validate_spec;
    load_mv_spec reads the record, rewrite_with_mv serves itself
    from it).

    ``source_where`` (r16) makes this a FILTERED (partial) MV — the
    classic partial-view maintenance: a SQL predicate string over
    source columns restricts the view's universe. The bootstrap
    filters the snapshot; every delta fold filters the CDF's ROW
    IMAGES independently, so an UPDATE that moves a row ACROSS the
    filter boundary decomposes correctly (pre-image inside the view
    folds −1, post-image outside contributes nothing — a net delete;
    the mirror case is a net insert). The endangered-group recompute
    and the distinct aux fold apply the same predicate to their
    source reads. Contract: deterministic row-level predicate over
    source columns only (no aggregates/windows/nondeterminism — same
    trust level as rows_col); recorded in the spec, so changing it
    requires a re-bootstrap."""
    tag = f"mv:{name}"
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    distinct_cols = list(distinct_cols or [])
    approx_distinct_cols = list(approx_distinct_cols or [])
    percentile_cols = list(percentile_cols or [])
    hist_base = _hist_base(percentile_rel_err)
    ext_names, sq_names, nd_names, hll_names, hist_names = _derived_names(
        group_cols, sum_cols, rows_col, min_cols, max_cols,
        sumsq_cols, distinct_cols, approx_distinct_cols,
        percentile_cols,
    )
    cur = source.latest_version()
    if cur is None:
        raise FileNotFoundError(f"source has no snapshots: {source.path}")
    from ..io.versioned import _schema_from_json

    src_schema = _schema_from_json(source._load_manifest(cur)["schema"])
    ftypes = _sum_fold_types(src_schema, sum_cols)
    _sum_fold_types(src_schema, sumsq_cols)  # numeric-family check
    src_names = {f.name for f in src_schema.fields}
    for c in [*distinct_cols, *approx_distinct_cols]:
        if c not in src_names:
            raise ValueError(
                f"distinct column {c!r} not in source schema"
            )
    _sum_fold_types(src_schema, percentile_cols)  # numeric-family check
    spec = {
        "spec_version": _SPEC_VERSION,
        "kind": "agg",
        "name": name,
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        "key": _norm_key(key),
        "rows_col": rows_col,
        "min_cols": min_cols,
        "max_cols": max_cols,
        "sumsq_cols": sumsq_cols,
        "distinct_cols": distinct_cols,
        "approx_distinct_cols": approx_distinct_cols,
        "percentile_cols": percentile_cols,
        "percentile_rel_err": (
            float(percentile_rel_err) if percentile_cols else None
        ),
        "hist_encoding": _HIST_ENCODING if percentile_cols else None,
        "source_where": source_where,
    }
    where_expr = (
        None if source_where is None else F.expr(source_where)
    )
    while True:
        mv_v, wm = _watermark(mv, tag)
        if wm is None:
            _store_spec(mv, spec)  # bootstrap (re)defines the spec
        else:
            _validate_spec(mv, spec)
        if wm is not None and cur <= wm:
            # converged (or a replay of an applied refresh): still run
            # the zero-group sweep so a crashed predecessor's residue
            # heals
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                # converged replays still pin: a caller switching an
                # unpinned MV to pin_watermark=True must be protected
                # from the NEXT vacuum even when no delta folds
                _pin_watermark(source, name, wm)
            return wm
        try:
            if wm is None:
                boot_src = source.read(spark, version=cur)
                if where_expr is not None:
                    boot_src = boot_src.filter(where_expr)
                agg = (
                    boot_src
                    .groupBy(*group_cols)
                    .agg(
                        # 0, not NULL, for an all-null group: the
                        # incremental arm folds with + and must agree
                        # with the bootstrap on the empty-sum identity
                        *[
                            F.coalesce(F.sum(c), F.lit(0))
                            .cast(ftypes[c])
                            .alias(c)
                            for c in sum_cols
                        ],
                        F.count("*").cast("bigint").alias(rows_col),
                        # sum of squares folds as DOUBLE always: the
                        # square of a large integral overflows bigint
                        *[
                            F.coalesce(
                                F.sum(
                                    F.col(c).cast("double")
                                    * F.col(c).cast("double")
                                ),
                                F.lit(0.0),
                            ).alias(f"{c}_sumsq")
                            for c in sumsq_cols
                        ],
                        *[F.min(c).alias(f"{c}_min") for c in min_cols],
                        *[F.max(c).alias(f"{c}_max") for c in max_cols],
                        *[
                            F.count_distinct(F.col(c))
                            .cast("bigint")
                            .alias(f"{c}_nd")
                            for c in distinct_cols
                        ],
                        *[
                            F.hll_sketch_agg(F.col(c)).alias(
                                f"{c}_hll"
                            )
                            for c in approx_distinct_cols
                        ],
                    )
                )
                if percentile_cols:
                    agg = _attach_hists(
                        agg, boot_src, group_cols, percentile_cols,
                        hist_base, F.lit(1),
                    )
                for c in distinct_cols:
                    _fold_aux(
                        nd_aux_table(mv, c), source, spark,
                        group_cols=group_cols, col=c, key=key,
                        tag=tag, cur=cur, source_where=source_where,
                    )
                mv.commit(
                    agg,
                    mode="overwrite",
                    txn={tag: cur},
                    expected_parent=mv_v,
                )
            elif (
                _SIGNED_FOLD != "0"
                and not ext_names
                and not nd_names
                and not hll_names
                and not sumsq_cols
                and all(ftypes[c] != "double" for c in sum_cols)
                and cur - wm <= _CDF_PLAN_CHUNK
            ):
                # DIRECT SIGNED FOLD (see module knob note): every
                # maintained aggregate here is linear in the row
                # multiset over exact arithmetic, so folding ALL rows
                # of the differing groups (±) equals folding the keyed
                # CDF delta — unchanged rows cancel exactly — with no
                # per-key shuffle and no pair join.
                needed = (
                    None
                    if source_where is not None
                    else sorted({
                        *group_cols, *sum_cols, *percentile_cols,
                    })
                )
                srows = table_signed_rows(
                    source, spark, wm, cur, columns=needed
                )
                if where_expr is not None:
                    # each side's rows filter independently — same
                    # partial-view identity as the CDF row images
                    srows = srows.filter(where_expr)
                s = F.col("__sign")
                deltas = srows.groupBy(*group_cols).agg(
                    *[
                        F.coalesce(F.sum(s * F.col(c)), F.lit(0))
                        .cast(ftypes[c])
                        .alias(c)
                        for c in sum_cols
                    ],
                    F.sum(s).cast("bigint").alias(rows_col),
                )
                if percentile_cols:
                    deltas = _attach_hists(
                        deltas, srows, group_cols, percentile_cols,
                        hist_base, s,
                    )
                # drop pure-cancel groups (all-zero delta, empty hist
                # deltas): merging them is the identity, so skipping
                # the touch spares group rewrites — the compaction /
                # moved-rows case where every read row cancels
                nonzero = F.col(rows_col) != 0
                for c in sum_cols:
                    nonzero = nonzero | (F.col(c) != 0)
                for n in hist_names:
                    nonzero = nonzero | (F.size(F.col(n)) > 0)
                deltas = _pin_deltas(deltas.filter(nonzero).select(
                    *group_cols, *sum_cols, rows_col, *hist_names,
                ))
                try:
                    merge_into(
                        mv,
                        spark,
                        deltas,
                        key=group_cols,
                        when_matched={
                            **{
                                c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                                + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                                for c in [*sum_cols, rows_col]
                            },
                            **{
                                n: _hist_merge_expr(n)
                                for n in hist_names
                            },
                        },
                        txn={tag: cur},
                        expected_parent=mv_v,
                        source_unique=True,  # groupBy(group_cols) out
                    )
                finally:
                    deltas.unpersist()
            else:
                sign = _sign_col()
                is_add = sign == 1
                # project the CDF to the columns the fold consumes
                # (guide §2.3): ± pairs over untracked columns cancel
                # in every signed aggregate, so dropping them changes
                # nothing downstream while the diff aggregate shuffles only
                # the tracked bytes. source_where may reference any
                # source column, so filtered MVs keep the full row.
                needed = (
                    None
                    if source_where is not None
                    else sorted({
                        *group_cols, *sum_cols, *sumsq_cols,
                        *min_cols, *max_cols, *distinct_cols,
                        *approx_distinct_cols, *percentile_cols,
                    })
                )
                cdf_df = table_changes_cdf(
                    source, spark, wm + 1, cur, key=key,
                    dup_probe="lazy", columns=needed,
                )
                if where_expr is not None:
                    # each ROW IMAGE filters independently: an update
                    # moving a row across the boundary nets to a pure
                    # insert/delete of the view row
                    cdf_df = cdf_df.filter(where_expr)
                deltas = (
                    cdf_df
                    .groupBy(*group_cols)
                    .agg(
                        *[
                            F.coalesce(F.sum(sign * F.col(c)), F.lit(0))
                            .cast(ftypes[c])
                            .alias(c)
                            for c in sum_cols
                        ],
                        F.sum(sign).cast("bigint").alias(rows_col),
                        *[
                            F.coalesce(
                                F.sum(
                                    sign
                                    * F.col(c).cast("double")
                                    * F.col(c).cast("double")
                                ),
                                F.lit(0.0),
                            ).alias(f"{c}_sumsq")
                            for c in sumsq_cols
                        ],
                        # extreme candidates, split by side: the +1
                        # side folds with LEAST/GREATEST; the -1 side
                        # only ARMS the endangerment test
                        *[
                            F.min(F.when(is_add, F.col(c))).alias(
                                f"__ins_min_{c}"
                            )
                            for c in min_cols
                        ],
                        *[
                            F.min(F.when(~is_add, F.col(c))).alias(
                                f"__del_min_{c}"
                            )
                            for c in min_cols
                        ],
                        *[
                            F.max(F.when(is_add, F.col(c))).alias(
                                f"__ins_max_{c}"
                            )
                            for c in max_cols
                        ],
                        *[
                            F.max(F.when(~is_add, F.col(c))).alias(
                                f"__del_max_{c}"
                            )
                            for c in max_cols
                        ],
                        # approx-distinct: insert-side sketch + the
                        # shared any-delete endangerment flag (a
                        # sketch cannot forget a value)
                        *[
                            F.hll_sketch_agg(
                                F.when(is_add, F.col(c))
                            ).alias(f"__ins_hll_{c}")
                            for c in approx_distinct_cols
                        ],
                        *(
                            [
                                F.max(
                                    F.when(~is_add, F.lit(1))
                                ).alias("__any_del")
                            ]
                            if approx_distinct_cols
                            else []
                        ),
                    )
                )
                if percentile_cols:
                    deltas = _attach_hists(
                        deltas, cdf_df, group_cols, percentile_cols,
                        hist_base, _sign_col(),
                    )
                if ext_names or hll_names:
                    deltas = _fold_stored(
                        source, mv, spark, deltas,
                        cur=cur, mv_v=mv_v, group_cols=group_cols,
                        min_cols=min_cols, max_cols=max_cols,
                        approx_cols=approx_distinct_cols,
                        source_where=source_where,
                    )
                for c in distinct_cols:
                    _fold_aux(
                        nd_aux_table(mv, c), source, spark,
                        group_cols=group_cols, col=c, key=key,
                        tag=tag, cur=cur, source_where=source_where,
                    )
                if distinct_cols:
                    deltas = _fold_distinct(
                        mv, spark, deltas,
                        group_cols=group_cols,
                        distinct_cols=distinct_cols,
                    )
                deltas = _pin_deltas(deltas.select(
                    *group_cols, *sum_cols, rows_col, *sq_names,
                    *ext_names, *nd_names, *hll_names, *hist_names,
                ))
                try:
                    merge_into(
                        mv,
                        spark,
                        deltas,
                        key=group_cols,
                        when_matched={
                            **{
                                c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                                + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                                for c in [*sum_cols, rows_col, *sq_names]
                            },
                            # the source row already carries the FINAL
                            # extreme (folded against the stored value /
                            # exact-recomputed for endangered groups) —
                            # and the FINAL distinct count from the aux
                            **{
                                n: F.col(f"s.{n}")
                                for n in [
                                    *ext_names, *nd_names, *hll_names
                                ]
                            },
                            # histograms MERGE-combine: signed
                            # per-bucket add, zero buckets dropped
                            **{
                                n: _hist_merge_expr(n)
                                for n in hist_names
                            },
                        },
                        txn={tag: cur},
                        expected_parent=mv_v,
                        source_unique=True,  # groupBy(group_cols) out
                    )
                finally:
                    deltas.unpersist()
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                _pin_watermark(source, name, cur)
            return cur
        except CommitConflictError:
            continue  # racing refresher landed: re-read the watermark


def _pin_watermark(t: VersionedTable, name: str, v: int) -> None:
    """Tag the watermark snapshot so vacuum() can never expire the
    manifests the NEXT refresh's CDF walk needs (vacuum retains the
    contiguous suffix from the oldest tag forward). Create-new-then-
    delete-old on version-suffixed names: a crash mid-move only
    OVER-retains (an extra pin, swept by the next refresh), never
    leaves the watermark unprotected."""
    import re

    safe = re.sub(r"[^A-Za-z0-9._-]", "-", name)
    prefix = f"mvpin-{safe}-"
    try:
        t.create_tag(f"{prefix}{v}", v)
    except ValueError:
        pass  # replayed refresh: the pin already exists
    for tag_name, tv in t.tags().items():
        if tag_name.startswith(prefix) and int(tv) < v:
            try:
                t.delete_tag(tag_name)
            except KeyError:
                pass  # racing refresher swept it


def nd_aux_table(mv: VersionedTable, col: str) -> VersionedTable:
    """The COUNT DISTINCT support table for ``col`` — a VersionedTable
    SIBLING of the MV (``<mv path>_nd/<col>``, never inside it: the
    MV's vacuum would mistake a nested table's data for orphan
    groups), keyed (group_cols..., col) with a signed occurrence count
    ``cnt``. The classic exact-IVM "support count" structure: distinct
    count per group = number of aux rows with cnt > 0, and the aux
    itself folds O(delta) from the same CDF walk as the sums. Callers
    that drop the MV should drop ``<mv path>_nd`` too."""
    import os

    return VersionedTable(
        os.path.join(f"{mv.path.rstrip('/')}_nd", col)
    )


def _fold_aux(
    aux: VersionedTable,
    source: VersionedTable,
    spark,
    *,
    group_cols: list[str],
    col: str,
    key,
    tag: str,
    cur: int,
    source_where: str | None = None,
) -> None:
    """Bring the support table up to source version ``cur``: bootstrap
    (one grouped count of the snapshot) when the aux is empty, else
    fold the CDF since the AUX'S OWN watermark into signed per-(group,
    value) count deltas. The aux watermark rides its manifest txn map
    exactly like the MV's, so the aux commit and the MV merge being
    two separate commits is crash-safe: a crash between them leaves
    the aux ahead, and the replayed refresh skips the fold (watermark
    check) while still recomputing the MV's nd from the aux. A
    filtered MV's predicate (``source_where``) applies to both the
    bootstrap snapshot and the CDF row images, so the aux counts
    exactly the view's universe."""
    where_expr = (
        None if source_where is None else F.expr(source_where)
    )
    while True:
        a_v, a_wm = _watermark(aux, tag)
        if a_wm is not None and a_wm >= cur:
            return  # replay / racing refresher already folded
        try:
            if a_wm is None:
                snap = source.read(spark, version=cur)
                if where_expr is not None:
                    snap = snap.filter(where_expr)
                counts = (
                    snap
                    .filter(F.col(col).isNotNull())
                    .groupBy(*group_cols, col)
                    .agg(F.count("*").cast("bigint").alias("cnt"))
                )
                aux.commit(
                    counts,
                    mode="overwrite",
                    txn={tag: cur},
                    expected_parent=a_v,
                )
            else:
                sign = _sign_col()
                cdf = table_changes_cdf(
                    source, spark, a_wm + 1, cur, key=key,
                    dup_probe="lazy",
                    columns=(
                        None
                        if source_where is not None
                        else sorted({*group_cols, col})
                    ),
                )
                if where_expr is not None:
                    cdf = cdf.filter(where_expr)
                deltas = _pin_deltas(
                    cdf
                    .filter(F.col(col).isNotNull())
                    .groupBy(*group_cols, col)
                    .agg(F.sum(sign).cast("bigint").alias("cnt"))
                )
                try:
                    merge_into(
                        aux,
                        spark,
                        deltas,
                        key=[*group_cols, col],
                        when_matched={
                            "cnt": F.coalesce(F.col("t.cnt"), F.lit(0))
                            + F.coalesce(F.col("s.cnt"), F.lit(0))
                        },
                        txn={tag: cur},
                        expected_parent=a_v,
                        source_unique=True,  # groupBy(key) output
                    )
                finally:
                    deltas.unpersist()
            _sweep_zero_groups(aux, spark, "cnt")
            return
        except CommitConflictError:
            continue  # racing refresher: re-read the aux watermark


def _fold_distinct(
    mv: VersionedTable,
    spark,
    deltas,
    *,
    group_cols: list[str],
    distinct_cols: list[str],
):
    """Join each touched group's FINAL distinct count (``<col>_nd``)
    onto the grouped delta rows: the aux table, group-pruned to the
    delta's keys (_pruned_snapshot's IN-set probe / semi join — never
    a full aux rescan), counts its live (cnt > 0) rows per group. A
    group whose values all vanished gets nd = 0 and is then swept by
    the zero-rows sweep."""
    for c in distinct_cols:
        aux = nd_aux_table(mv, c)
        # read the aux LATEST — guaranteed >= cur after _fold_aux.
        # Reading a version pinned at exactly cur would be WRONG under
        # concurrent refreshers (review r14): a racer may have folded
        # PAST cur in one commit, so no aux version at cur exists and
        # a walk-back lands BEFORE this refresh's own window. Latest
        # is convergent instead: a group's aux state at any version
        # >= cur differs from its cur-state only by OTHER windows'
        # changes, and whichever refresher owns those windows
        # recomputes the group again on its conflict retry (or already
        # folded this window's rows into its own deltas).
        live = _pruned_snapshot(
            aux, spark, aux.latest_version(), group_cols, deltas,
        )
        nd = (
            live.filter(F.col("cnt") > 0)
            .groupBy(*group_cols)
            .agg(F.count("*").cast("bigint").alias(f"{c}_nd"))
        )
        deltas = deltas.join(nd, on=group_cols, how="left").withColumn(
            f"{c}_nd",
            F.coalesce(F.col(f"{c}_nd"), F.lit(0).cast("bigint")),
        )
    return deltas


def _fold_stored(
    source: VersionedTable,
    mv: VersionedTable,
    spark: SparkSession,
    deltas,
    *,
    cur: int,
    mv_v: int | None,
    group_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
    approx_cols: list[str],
    source_where: str | None = None,
    rollup_src: bool = False,
):
    """Resolve each delta group's FINAL stored-state measures — MIN/MAX
    extremes and APPROX-DISTINCT HLL sketches — in ONE pass over the
    stored MV snapshot and at most ONE group-pruned source read (r15
    VERDICT #4: the two families used to read/probe the snapshot once
    EACH, doubling the refresh's metadata+scan cost on views that
    declare both).

    Extremes: non-endangered groups fold insert-side candidates with
    LEAST/GREATEST (null-skipping); a delete/update-preimage that
    TOUCHES the stored extreme (<= min, >= max) — or deletes in a
    group absent from the MV — endangers the group.

    HLL (r14): inserts fold by sketch UNION (registers only grow); ANY
    delete endangers the group (a sketch cannot forget).

    The union of both endangered key sets drives a single recompute
    against source@cur (group-pruned via manifest stats when the key
    set fits the driver cap, AQE semi join otherwise); each family
    then masks with ITS OWN endangerment flag, so results are
    identical to the former two-pass fold.

    ``rollup_src=True`` (r16, refresh_rollup_mv): the source is itself
    an aggregate MV, so the endangered recompute reads the FINE MV's
    derived columns — ``MIN(c_min)`` / ``MAX(c_max)`` instead of the
    raw column, and ``hll_union_agg(c_hll)`` (sketch union) instead of
    re-sketching raw values. The caller's delta candidate columns
    (``__ins_*``/``__del_*``) already carry the fine-level derived
    values, so everything else is unchanged."""
    if mv_v is None:
        # streaming maintainer's first batches: no MV yet — every
        # group is new, so the stored side is an EMPTY frame typed
        # from the delta's own candidate columns
        stored = deltas.select(
            *group_cols,
            *[
                F.col(f"__ins_min_{c}").alias(f"__st_min_{c}")
                for c in min_cols
            ],
            *[
                F.col(f"__ins_max_{c}").alias(f"__st_max_{c}")
                for c in max_cols
            ],
            *[
                F.col(f"__ins_hll_{c}").alias(f"__st_hll_{c}")
                for c in approx_cols
            ],
            F.lit(True).alias("__in_mv"),
        ).limit(0)
    else:
        stored = mv.read(spark, version=mv_v).select(
            *group_cols,
            *[
                F.col(f"{c}_min").alias(f"__st_min_{c}")
                for c in min_cols
            ],
            *[
                F.col(f"{c}_max").alias(f"__st_max_{c}")
                for c in max_cols
            ],
            *[
                F.col(f"{c}_hll").alias(f"__st_hll_{c}")
                for c in approx_cols
            ],
            F.lit(True).alias("__in_mv"),
        )
    j = deltas.join(stored, on=group_cols, how="left")
    ext_endangered = F.lit(False)
    for c in min_cols:
        d, s = F.col(f"__del_min_{c}"), F.col(f"__st_min_{c}")
        ext_endangered = ext_endangered | (
            d.isNotNull()
            & (F.col("__in_mv").isNull() | s.isNull() | (d <= s))
        )
    for c in max_cols:
        d, s = F.col(f"__del_max_{c}"), F.col(f"__st_max_{c}")
        ext_endangered = ext_endangered | (
            d.isNotNull()
            & (F.col("__in_mv").isNull() | s.isNull() | (d >= s))
        )
    hll_endangered = (
        F.col("__any_del").isNotNull() if approx_cols else F.lit(False)
    )
    j = (
        j.withColumn("__endangered", ext_endangered)
        .withColumn("__hll_endangered", hll_endangered)
        .localCheckpoint(eager=True)
    )
    # bounded driver probe over the UNION of endangered keys: decides
    # between the group-pruned point read, a distributed semi join,
    # and skipping the source scan entirely when nothing is endangered
    end_keys = j.filter(
        F.col("__endangered") | F.col("__hll_endangered")
    ).select(*group_cols)
    probe = end_keys.limit(_MAX_EXACT_KEYS + 1).collect()
    if not probe:
        exact = None
    else:
        if rollup_src:
            aggs = (
                [
                    F.min(f"{c}_min").alias(f"__ex_min_{c}")
                    for c in min_cols
                ]
                + [
                    F.max(f"{c}_max").alias(f"__ex_max_{c}")
                    for c in max_cols
                ]
                + [
                    F.hll_union_agg(F.col(f"{c}_hll")).alias(
                        f"__ex_hll_{c}"
                    )
                    for c in approx_cols
                ]
            )
        else:
            aggs = (
                [F.min(c).alias(f"__ex_min_{c}") for c in min_cols]
                + [F.max(c).alias(f"__ex_max_{c}") for c in max_cols]
                + [
                    F.hll_sketch_agg(F.col(c)).alias(f"__ex_hll_{c}")
                    for c in approx_cols
                ]
            )
        if len(group_cols) == 1 and len(probe) <= _MAX_EXACT_KEYS:
            src = source.read(
                spark,
                version=cur,
                where={group_cols[0]: [r[0] for r in probe]},
            )
        else:
            # no broadcast hint: this branch is chosen precisely
            # because the key set exceeded the driver cap, so let
            # Spark/AQE pick the semi-join strategy from its size
            src = source.read(spark, version=cur).join(
                end_keys, on=group_cols, how="semi"
            )
        if source_where is not None:
            # filtered MV: the exact recompute sees only the view's
            # universe (the group-pruned read is a superset)
            src = src.filter(F.expr(source_where))
        exact = src.groupBy(*group_cols).agg(*aggs)
    if exact is not None:
        j = j.join(exact, on=group_cols, how="left")
    else:
        for c in min_cols:
            j = j.withColumn(
                f"__ex_min_{c}",
                F.lit(None).cast(j.schema[f"__ins_min_{c}"].dataType),
            )
        for c in max_cols:
            j = j.withColumn(
                f"__ex_max_{c}",
                F.lit(None).cast(j.schema[f"__ins_max_{c}"].dataType),
            )
        for c in approx_cols:
            j = j.withColumn(
                f"__ex_hll_{c}", F.lit(None).cast("binary")
            )
    out_cols = []
    for c in min_cols:
        out_cols.append(
            F.when(F.col("__endangered"), F.col(f"__ex_min_{c}"))
            .otherwise(
                F.when(
                    F.col("__in_mv").isNull(), F.col(f"__ins_min_{c}")
                ).otherwise(
                    F.least(
                        F.col(f"__st_min_{c}"), F.col(f"__ins_min_{c}")
                    )
                )
            )
            .alias(f"{c}_min")
        )
    for c in max_cols:
        out_cols.append(
            F.when(F.col("__endangered"), F.col(f"__ex_max_{c}"))
            .otherwise(
                F.when(
                    F.col("__in_mv").isNull(), F.col(f"__ins_max_{c}")
                ).otherwise(
                    F.greatest(
                        F.col(f"__st_max_{c}"), F.col(f"__ins_max_{c}")
                    )
                )
            )
            .alias(f"{c}_max")
        )
    for c in approx_cols:
        out_cols.append(
            F.when(F.col("__hll_endangered"), F.col(f"__ex_hll_{c}"))
            .otherwise(
                F.when(
                    F.col("__in_mv").isNull()
                    | F.col(f"__st_hll_{c}").isNull(),
                    F.col(f"__ins_hll_{c}"),
                ).otherwise(
                    F.hll_union(
                        F.col(f"__st_hll_{c}"), F.col(f"__ins_hll_{c}")
                    )
                )
            )
            .alias(f"{c}_hll")
        )
    return j.select("*", *out_cols)

def refresh_join_mv(
    a: VersionedTable,
    b: VersionedTable,
    mv: VersionedTable,
    spark: SparkSession,
    *,
    name: str,
    on: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    key_a: str | list[str],
    key_b: str | list[str],
    rows_col: str = _ROWS,
    percentile_cols: list[str] | None = None,
    percentile_rel_err: float = _DEFAULT_PCT_ERR,
    source_where: str | None = None,
    pin_watermark: bool = False,
) -> tuple[int, int]:
    """Incrementally maintain an aggregate MV over an EQUI-JOIN of two
    versioned tables (the classic delta-join IVM decomposition):

        delta(A |><| B)  =  deltaA |><| B@new  UNION  A@old |><| deltaB

    with each joined row's sign the PRODUCT of its sides' signs (full
    snapshots are all +1, so the sign is just the delta side's).
    Grouped signed deltas then MERGE into the MV exactly like
    refresh_mv — both source watermarks ride the MV manifest's txn map
    in ONE commit, so a crash/replay can never apply one side's delta
    without the other.

    O(delta) at scale: the snapshot each delta joins against is read
    GROUP-PRUNED to the delta's join keys (manifest stats + blooms via
    the IN-set point probe when the key set is a single column under
    _MAX_EXACT_KEYS; a plain AQE-planned semi join otherwise), so neither full
    snapshot is rescanned after the one bootstrap join. Requires
    version ``wm_a`` of A to still be retained (A@old) — if vacuum
    expired it, the refresh raises with the re-bootstrap remedy.

    ``group_cols``/``sum_cols`` name columns of the JOINED row (either
    side); both sources must satisfy the CDF contract on their own
    keys. SUM/COUNT (AVG = SUM/COUNT at read) plus, since r16,
    ``percentile_cols``: the same signed log-bucket histograms
    refresh_mv maintains (``<col>_hist``, estimate with
    hist_percentile) — fully self-maintainable under the delta-join's
    signed rows, so the fold stays O(delta) with no endangered
    recompute on either side. Join-key updates decompose into
    -old/+new pairs on the delta side and need nothing special.
    Returns (version_a, version_b) the MV now reflects.
    ``pin_watermark=True`` tags BOTH sources at their watermarks
    (vacuum-proof refreshes, see refresh_mv).

    ``source_where`` (r16) makes this a FILTERED join MV: a row-level
    SQL predicate over the JOINED row (either side's columns). Filter
    commutes with the signed delta-join decomposition — each joined
    delta row filters independently, so both the bootstrap join and
    every ``deltaA >< B@new / A@old >< deltaB`` leg apply the
    predicate before grouping, and a one-sided conjunct reaches that
    side's scan via Catalyst pushdown. Same contract as refresh_mv's
    filtered path: deterministic row-level predicate, recorded in the
    spec, changing it requires a re-bootstrap."""
    from ..io.versioned import _schema_from_json

    tag_a, tag_b = f"mv:{name}:a", f"mv:{name}:b"
    percentile_cols = list(percentile_cols or [])
    hist_base = _hist_base(percentile_rel_err)
    *_, hist_names = _derived_names(
        group_cols, sum_cols, rows_col, [], [], [], [], [],
        percentile_cols,
    )
    cur_a, cur_b = a.latest_version(), b.latest_version()
    if cur_a is None or cur_b is None:
        raise FileNotFoundError(
            f"join-MV sources need snapshots: {a.path}, {b.path}"
        )
    schema_a = _schema_from_json(a._load_manifest(cur_a)["schema"])
    schema_b = _schema_from_json(b._load_manifest(cur_b)["schema"])
    cols_a = {f.name for f in schema_a.fields}
    cols_b = {f.name for f in schema_b.fields}
    from pyspark.sql.types import StructType

    joined_schema = StructType(
        list(schema_a.fields) + list(schema_b.fields)
    )
    ftypes = _sum_fold_types(joined_schema, sum_cols)
    _sum_fold_types(joined_schema, percentile_cols)  # numeric check
    missing = [c for c in on if c not in cols_a or c not in cols_b]
    if missing:
        raise ValueError(f"join columns missing from a source: {missing}")
    clash = (cols_a & cols_b) - set(on)
    if clash:
        raise ValueError(
            f"non-join columns shared by both sources would collide in "
            f"the joined row: {sorted(clash)} — rename one side"
        )
    spec = {
        "spec_version": _SPEC_VERSION,
        "kind": "join",
        "name": name,
        "on": list(on),
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        "key_a": _norm_key(key_a),
        "key_b": _norm_key(key_b),
        "rows_col": rows_col,
        "percentile_cols": percentile_cols,
        "percentile_rel_err": (
            float(percentile_rel_err) if percentile_cols else None
        ),
        "hist_encoding": _HIST_ENCODING if percentile_cols else None,
        "source_where": source_where,
    }
    where_expr = (
        None if source_where is None else F.expr(source_where)
    )
    while True:
        mv_v = mv.latest_version()
        txn = (
            {}
            if mv_v is None
            else (mv._load_manifest(mv_v).get("txn") or {})
        )
        wa = None if txn.get(tag_a) is None else int(txn[tag_a])
        wb = None if txn.get(tag_b) is None else int(txn[tag_b])
        if wa is None:
            _store_spec(mv, spec)  # bootstrap (re)defines the spec
        else:
            _validate_spec(mv, spec)
        if wa is not None and cur_a <= wa and wb is not None and (
            cur_b <= wb
        ):
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                _pin_watermark(a, f"{name}-a", wa)
                _pin_watermark(b, f"{name}-b", wb)
            return wa, wb
        try:
            sums = [
                F.coalesce(F.sum(c), F.lit(0)).cast(ftypes[c]).alias(c)
                for c in sum_cols
            ]
            if wa is None:
                joined = a.read(spark, version=cur_a).join(
                    b.read(spark, version=cur_b), on=on, how="inner"
                )
                if where_expr is not None:
                    joined = joined.filter(where_expr)
                agg = joined.groupBy(*group_cols).agg(
                    *sums, F.count("*").cast("bigint").alias(rows_col)
                )
                if percentile_cols:
                    agg = _attach_hists(
                        agg, joined, group_cols, percentile_cols,
                        hist_base, F.lit(1),
                    )
                mv.commit(
                    agg,
                    mode="overwrite",
                    txn={tag_a: cur_a, tag_b: cur_b},
                    expected_parent=mv_v,
                )
            else:
                # project each leg to the columns the fold consumes
                # (guide §2.3; see _signed_cdf's note — untracked-only
                # ± pairs cancel after the join). The post-join select
                # keeps the two legs union-compatible. Filtered MVs
                # keep full rows (source_where may reference any
                # joined column).
                tracked = (
                    set(group_cols) | set(sum_cols)
                    | set(percentile_cols)
                )
                sel = sorted(set(on) | tracked)
                proj_a = (
                    None
                    if source_where is not None
                    else sorted(set(on) | (tracked & cols_a))
                )
                proj_b = (
                    None
                    if source_where is not None
                    else sorted(set(on) | (tracked & cols_b))
                )

                def leg(joined):
                    if source_where is not None:
                        return joined
                    return joined.select(*sel, "__sign")

                parts = []
                if cur_a > wa:
                    da = _signed_cdf(
                        a, spark, wa + 1, cur_a, key_a,
                        columns=proj_a,
                    ).localCheckpoint(eager=True)
                    parts.append(
                        leg(
                            da.join(
                                _pruned_snapshot(
                                    b, spark, cur_b, on, da
                                ),
                                on=on,
                                how="inner",
                            )
                        )
                    )
                if cur_b > wb:
                    db = _signed_cdf(
                        b, spark, wb + 1, cur_b, key_b,
                        columns=proj_b,
                    ).localCheckpoint(eager=True)
                    try:
                        a_old = _pruned_snapshot(a, spark, wa, on, db)
                    except FileNotFoundError as e:
                        raise ValueError(
                            f"join-MV watermark snapshot {wa} of "
                            f"{a.path} was expired by vacuum(); "
                            "re-create the MV (bootstrap) or retain "
                            "watermark snapshots until refresh"
                        ) from e
                    parts.append(
                        leg(db.join(a_old, on=on, how="inner"))
                    )
                delta = parts[0]
                for p in parts[1:]:
                    delta = delta.unionByName(p)
                if where_expr is not None:
                    # joined delta rows filter independently — a
                    # join-key update whose post-image leaves the view
                    # nets to a pure view delete (and mirror-wise)
                    delta = delta.filter(where_expr)
                deltas = delta.groupBy(*group_cols).agg(
                    *[
                        F.coalesce(
                            F.sum(F.col("__sign") * F.col(c)), F.lit(0)
                        )
                        .cast(ftypes[c])
                        .alias(c)
                        for c in sum_cols
                    ],
                    F.sum("__sign").cast("bigint").alias(rows_col),
                )
                if percentile_cols:
                    # the joined delta row's sign is already the
                    # product of its sides' signs (__sign) — the same
                    # signed fold the agg MV uses, over joined rows
                    deltas = _attach_hists(
                        deltas, delta, group_cols, percentile_cols,
                        hist_base, F.col("__sign"),
                    )
                deltas = _pin_deltas(deltas)
                try:
                    merge_into(
                        mv,
                        spark,
                        deltas,
                        key=group_cols,
                        when_matched={
                            **{
                                c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                                + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                                for c in [*sum_cols, rows_col]
                            },
                            **{
                                n: _hist_merge_expr(n)
                                for n in hist_names
                            },
                        },
                        txn={tag_a: cur_a, tag_b: cur_b},
                        expected_parent=mv_v,
                        source_unique=True,  # groupBy(group_cols) out
                    )
                finally:
                    deltas.unpersist()
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                # pin BOTH sides: the next refresh reads A@watermark
                # (the delta-join's old snapshot) and each side's CDF
                # walk needs its watermark manifest as the first pair's
                # parent
                _pin_watermark(a, f"{name}-a", cur_a)
                _pin_watermark(b, f"{name}-b", cur_b)
            return cur_a, cur_b
        except CommitConflictError:
            continue  # racing refresher landed: re-read the watermarks


def _signed_cdf(t, spark, lo, hi, key, columns=None):
    """Row-level CDF rows [lo, hi] with a ``__sign`` column (+1 for
    insert/update_postimage, -1 for delete/update_preimage), metadata
    columns dropped — the signed-multiset delta of the table.
    ``columns`` projects the diff to the columns the join-fold
    consumes (see snapshot_diff's projected-diff note — a ± pair over
    untracked columns joins identically on both signs and cancels in
    every grouped aggregate, so dropping it changes nothing)."""
    cdf = table_changes_cdf(
        t, spark, lo, hi, key=key, dup_probe="lazy", columns=columns
    )
    return cdf.withColumn("__sign", _sign_col()).drop(
        "_change_type", "_commit_version"
    )


def _pruned_snapshot(t, spark, version, on, delta):
    """Snapshot ``version`` of ``t`` restricted to the delta's join
    keys: the IN-set point probe (manifest stats + blooms) when the
    join key is one column with a bounded distinct set, else a plain
    semi join left to AQE (the key set exceeded the driver cap, so
    Spark picks the strategy from its runtime size) — either way the
    join against the delta never rescans the snapshot."""
    keys = delta.select(*on).distinct()
    if len(on) == 1:
        probe = keys.limit(_MAX_EXACT_KEYS + 1).collect()
        if len(probe) <= _MAX_EXACT_KEYS:
            return t.read(
                spark, version=version,
                where={on[0]: [r[0] for r in probe]},
            )
    # no broadcast hint: the IN-set path already handled bounded key
    # sets; this fallback exists for sets past the driver cap
    return t.read(spark, version=version).join(
        keys, on=on, how="semi"
    )

def _fold_aux_batch(
    aux: VersionedTable,
    batch_df,
    *,
    group_cols: list[str],
    col: str,
    tag: str,
    batch_id: int,
) -> None:
    """Streaming twin of _fold_aux: fold ONE micro-batch's signed
    value counts into the support table with the BATCH_ID as the txn
    epoch — the same replay/conflict protocol as the MV merge, on the
    aux's own manifest, so a restart that replays the batch skips the
    fold it already applied."""
    spark = batch_df.sparkSession
    sign = _sign_col()
    deltas = (
        batch_df.filter(F.col(col).isNotNull())
        .groupBy(*group_cols, col)
        .agg(F.sum(sign).cast("bigint").alias("cnt"))
    )
    while True:
        latest = aux.latest_version()
        hw = (
            None
            if latest is None
            else (aux._load_manifest(latest).get("txn") or {}).get(tag)
        )
        if hw is not None and int(hw) >= int(batch_id):
            return  # replay of a folded batch
        try:
            if latest is None:
                # first batch materializes the aux from nothing (a
                # correct CDF replay cannot delete before inserting,
                # so these counts are non-negative)
                aux.commit(
                    deltas,
                    mode="overwrite",
                    txn={tag: int(batch_id)},
                    expected_parent=latest,
                )
            else:
                merge_into(
                    aux,
                    spark,
                    deltas,
                    key=[*group_cols, col],
                    when_matched={
                        "cnt": F.coalesce(F.col("t.cnt"), F.lit(0))
                        + F.coalesce(F.col("s.cnt"), F.lit(0))
                    },
                    txn={tag: int(batch_id)},
                    expected_parent=latest,
                    source_unique=True,  # groupBy(key) output
                )
            _sweep_zero_groups(aux, spark, "cnt")
            return
        except CommitConflictError:
            continue  # concurrent delivery landed: re-check


def make_mv_maintainer(
    mv: VersionedTable,
    query_name: str,
    *,
    group_cols: list[str],
    sum_cols: list[str],
    rows_col: str = _ROWS,
    source: VersionedTable | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    approx_distinct_cols: list[str] | None = None,
    percentile_cols: list[str] | None = None,
    percentile_rel_err: float = _DEFAULT_PCT_ERR,
    source_where: str | None = None,
):
    """STREAMING IVM: a foreachBatch sink that folds a
    ``readchangedata`` stream's micro-batches into an aggregate MV.
    Point a CDF changefeed at the source and hand this writer to
    foreachBatch — each batch's rows become signed grouped deltas
    (exactly refresh_mv's algebra) MERGEd into the MV with the
    BATCH_ID as the txn epoch, atomically in the manifest publish:
    a replayed batch (restart, zombie driver, speculative retry) at or
    below the watermark skips, and two concurrent deliveries race
    through expected_parent — exactly-once without a ledger.

    No bootstrap scan at all: started from ``startingversion=
    earliest`` the stream replays the source's v0 inserts, so the
    empty MV plus the stream IS the full aggregate — the MV
    materializes incrementally from nothing and then stays O(delta)
    per trigger.

    Measure parity with batch refresh_mv (r14 — the two paths share
    the fold algebra so they cannot drift): ``sumsq_cols`` and
    ``distinct_cols`` work exactly as in refresh_mv (the distinct
    support table folds per batch with the same batch_id epoch, see
    _fold_aux_batch); ``min_cols``/``max_cols`` additionally require
    ``source`` — the endangered-group exact recompute reads the
    source SNAPSHOT PINNED AT THE BATCH'S OWN MAX _commit_version
    (not latest: the table may have advanced past what the stream has
    delivered), so a replayed batch recomputes the identical values.
    Decimal measures fold exactly as decimal(38, s) like the batch
    path. ``percentile_cols`` (r15) folds signed log-bucket
    histograms per batch — self-maintainable under deletes, no source
    needed, same bucket geometry as the batch refresher.
    ``source_where`` (r16) filters each batch's row images like the
    batch refresher's filtered-MV path — a batch left empty by the
    filter commits nothing (same as a planned-but-empty batch)."""
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    distinct_cols = list(distinct_cols or [])
    approx_distinct_cols = list(approx_distinct_cols or [])
    percentile_cols = list(percentile_cols or [])
    hist_base = _hist_base(percentile_rel_err)
    ext_names, sq_names, nd_names, hll_names, hist_names = _derived_names(
        group_cols, sum_cols, rows_col, min_cols, max_cols,
        sumsq_cols, distinct_cols, approx_distinct_cols,
        percentile_cols,
    )
    if (ext_names or hll_names) and source is None:
        raise ValueError(
            "min_cols/max_cols/approx_distinct_cols need source= "
            "(the endangered-group recompute/re-sketch reads the "
            "source snapshot)"
        )
    # kind "agg-stream", NOT "agg": a batch refresh_mv pointed at a
    # stream-maintained MV (or vice versa) must raise — the two
    # protocols keep independent watermarks and would double-count
    spec = {
        "spec_version": _SPEC_VERSION,
        "kind": "agg-stream",
        "name": query_name,
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        "rows_col": rows_col,
        "min_cols": min_cols,
        "max_cols": max_cols,
        "sumsq_cols": sumsq_cols,
        "distinct_cols": distinct_cols,
        "approx_distinct_cols": approx_distinct_cols,
        "percentile_cols": percentile_cols,
        "percentile_rel_err": (
            float(percentile_rel_err) if percentile_cols else None
        ),
        "hist_encoding": _HIST_ENCODING if percentile_cols else None,
        "source_where": source_where,
    }
    spec_checked = False

    def write(batch_df, batch_id: int) -> None:
        nonlocal spec_checked
        spark = batch_df.sparkSession
        if source_where is not None:
            # filtered MV: row images filter independently, exactly
            # like the batch refresher's CDF filter
            batch_df = batch_df.filter(F.expr(source_where))
        # a planned-but-empty batch (pure compaction versions, or one
        # the view filter emptied) needs no MV commit; the watermark
        # stays put, and a replayed empty batch is empty again — safe
        # to skip
        if not batch_df.take(1):
            return
        if not spec_checked:
            # once per (re)started query: a fresh MV records the spec
            # before the first fold; an existing one validates against
            # its recorded spec (adopting it if pre-spec, raising on
            # any drift — including a batch-refreshed MV's "agg" kind)
            if mv.latest_version() is None:
                _store_spec(mv, spec)
            else:
                _validate_spec(mv, spec)
            spec_checked = True
        sign = _sign_col()
        is_add = sign == 1
        ftypes = _sum_fold_types(batch_df.schema, sum_cols)
        _sum_fold_types(batch_df.schema, sumsq_cols)
        _sum_fold_types(batch_df.schema, percentile_cols)
        have = set(batch_df.columns)
        for c in [*distinct_cols, *approx_distinct_cols]:
            if c not in have:
                raise ValueError(
                    f"distinct column {c!r} not in the stream schema"
                )
        base = batch_df.groupBy(*group_cols).agg(
            *[
                F.coalesce(F.sum(sign * F.col(c)), F.lit(0))
                .cast(ftypes[c])
                .alias(c)
                for c in sum_cols
            ],
            F.sum(sign).cast("bigint").alias(rows_col),
            *[
                F.coalesce(
                    F.sum(
                        sign
                        * F.col(c).cast("double")
                        * F.col(c).cast("double")
                    ),
                    F.lit(0.0),
                ).alias(f"{c}_sumsq")
                for c in sumsq_cols
            ],
            *[
                F.min(F.when(is_add, F.col(c))).alias(f"__ins_min_{c}")
                for c in min_cols
            ],
            *[
                F.min(F.when(~is_add, F.col(c))).alias(f"__del_min_{c}")
                for c in min_cols
            ],
            *[
                F.max(F.when(is_add, F.col(c))).alias(f"__ins_max_{c}")
                for c in max_cols
            ],
            *[
                F.max(F.when(~is_add, F.col(c))).alias(f"__del_max_{c}")
                for c in max_cols
            ],
            *[
                F.hll_sketch_agg(F.when(is_add, F.col(c))).alias(
                    f"__ins_hll_{c}"
                )
                for c in approx_distinct_cols
            ],
            *(
                [
                    F.max(F.when(~is_add, F.lit(1))).alias("__any_del")
                ]
                if approx_distinct_cols
                else []
            ),
        )
        if percentile_cols:
            base = _attach_hists(
                base, batch_df, group_cols, percentile_cols,
                hist_base, _sign_col(),
            )
        if ext_names or distinct_cols or hll_names or hist_names:
            # one tiny metadata job; reused across conflict retries
            base = base.localCheckpoint(eager=True)
        cur = None
        if ext_names or hll_names:
            cur = int(
                batch_df.agg(
                    F.max("_commit_version").cast("bigint")
                ).collect()[0][0]
            )
        for c in distinct_cols:
            _fold_aux_batch(
                nd_aux_table(mv, c), batch_df,
                group_cols=group_cols, col=c,
                tag=query_name, batch_id=batch_id,
            )
        # the txn-epoch replay/conflict loop mirrors
        # io/versioned.py::make_idempotent_table_writer — a protocol
        # change there (the hw comparison, the expected_parent pin)
        # must land here too
        while True:
            latest = mv.latest_version()
            hw = (
                None
                if latest is None
                else (mv._load_manifest(latest).get("txn") or {}).get(
                    query_name
                )
            )
            if hw is not None and int(hw) >= int(batch_id):
                return  # replay of a committed batch
            deltas = base
            if ext_names or hll_names:
                deltas = _fold_stored(
                    source, mv, spark, deltas,
                    cur=cur, mv_v=latest, group_cols=group_cols,
                    min_cols=min_cols, max_cols=max_cols,
                    approx_cols=approx_distinct_cols,
                    source_where=source_where,
                )
            if distinct_cols:
                deltas = _fold_distinct(
                    mv, spark, deltas,
                    group_cols=group_cols,
                    distinct_cols=distinct_cols,
                )
            deltas = _pin_deltas(deltas.select(
                *group_cols, *sum_cols, rows_col, *sq_names,
                *ext_names, *nd_names, *hll_names, *hist_names,
            ))
            try:
                merge_into(
                    mv,
                    spark,
                    deltas,
                    key=group_cols,
                    when_matched={
                        **{
                            c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                            + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                            for c in [*sum_cols, rows_col, *sq_names]
                        },
                        **{
                            n: F.col(f"s.{n}")
                            for n in [*ext_names, *nd_names, *hll_names]
                        },
                        **{n: _hist_merge_expr(n) for n in hist_names},
                    },
                    txn={query_name: int(batch_id)},
                    expected_parent=latest,
                    source_unique=True,  # groupBy(group_cols) output
                )
                break
            except CommitConflictError:
                continue  # concurrent delivery landed: re-check
            finally:
                deltas.unpersist()
        _sweep_zero_groups(mv, spark, rows_col)

    return write


def refresh_rollup_mv(
    fine: VersionedTable,
    mv: VersionedTable,
    spark: SparkSession,
    *,
    name: str,
    group_cols: list[str],
    source_where: str | None = None,
    pin_watermark: bool = False,
) -> int:
    """Cascaded (multi-level) rollup: maintain a COARSE aggregate MV
    incrementally from a FINE aggregate MV's change-data-feed — the
    TimescaleDB continuous-aggregate / Druid rollup ladder (hourly →
    daily → monthly), each level O(its own delta), never rescanning
    the base table. Returns the fine-MV version the rollup now
    reflects. Reference parity: the reference delegates all
    aggregation to Postgres at query time (internal/db/db.go:43-137);
    a continuous rollup ladder is north-star lakehouse surface — at
    100 TB the fine MV is the only thing that ever scans the base,
    and each coarser level folds deltas that are already thousands of
    times smaller.

    EVERYTHING IS DERIVED FROM THE FINE MV'S RECORDED SPEC
    (_mv_spec.json, r16): the caller names only the coarse grouping —
    a subset of the fine grouping — and the rollup maintains the SAME
    measure columns under the SAME names, so rollups compose (a
    rollup's spec is measure-shaped like an agg spec and a third
    level derives from it identically):

    * SUM columns fold as sums of fine sums; ``rows_col`` folds
      WEIGHTED — sum of fine row counts (the fine CDF's +1/−1 sign
      times the fine group's count), so the coarse count is the BASE
      row count, not the fine group count.
    * ``<c>_sumsq`` folds as a plain double sum (sums of squares are
      associative), keeping VAR/STDDEV derivable at every level.
    * ``<c>_min`` / ``<c>_max`` fold with LEAST/GREATEST on the
      insert side; a fine-group preimage whose extreme TOUCHES the
      stored coarse extreme endangers the group, and exactly those
      groups recompute ``MIN(c_min)`` / ``MAX(c_max)`` from the FINE
      MV snapshot (group-pruned) — O(delta + endangered fine rows),
      and the fine MV is already aggregate-sized.
    * ``<c>_hll`` folds by SKETCH UNION (F.hll_union_agg) on the
      insert side; any preimage endangers (a re-sketched fine group
      may have shrunk) and endangered groups re-union from the fine
      snapshot. Estimates remain within HLL error of the BASE
      table's distinct count (union of per-group sketches over a
      partition of the rows).
    * ``<c>_hist`` percentile histograms fold by pure SIGNED MAP
      MERGE (_attach_merged_hists): deterministic bucketing makes
      the merged map byte-identical to a histogram built from the
      base values, so deletes are forgotten EXACTLY — O(delta), no
      endangered recompute, same ``percentile_rel_err`` (and
      hist_encoding) as the fine level.
    * EXACT COUNT DISTINCT (``distinct_cols``) does NOT roll up — a
      value's occurrence counts cannot be combined across fine
      groups without per-value state. Declare the coarse MV directly
      over the base table (its aux keeps the per-value counts), or
      use ``approx_distinct_cols`` (HLL unions exactly). A fine spec
      with distinct_cols is refused loudly.

    The rollup's watermark is the FINE MV's version, riding the
    rollup's manifest txn map atomically (same crash/replay contract
    as refresh_mv); ``pin_watermark=True`` tags the FINE MV so its
    vacuum can never expire the manifests the next rollup fold
    needs. The rollup records its own spec (kind "rollup") at
    bootstrap; later refreshes re-derive from the fine spec and any
    drift — a re-bootstrapped fine MV with different measures, a
    changed coarse grouping — raises instead of folding garbage.
    ``source_where`` makes this a FILTERED rollup — a SQL predicate
    over FINE MV rows (group or measure columns) scopes the coarse
    view's universe, with the same partial-view identity as
    refresh_mv: every fine CDF row image filters independently, so a
    fine-group update crossing the boundary (say ``n_rows >= 10``)
    nets to a pure coarse insert/delete; the endangered recompute
    reads the fine snapshot under the same predicate; the predicate
    rides the spec (changing it re-bootstraps).

    Contract: the fine MV must be spec-recorded (refresh it once
    under this build, or re-bootstrap) and maintained by refresh_mv /
    make_mv_maintainer / refresh_rollup_mv / refresh_join_mv (a JOIN
    MV's per-group sums, weighted rows, and histograms coarsen the
    same way — the join legs stay at the fine level); coarse group
    columns must be a non-empty subset of the fine grouping."""
    tag = f"mv:{name}"
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError(
            "rollup needs at least one group column (a GLOBAL "
            "aggregate has no MERGE key; keep a constant group "
            "column in the fine MV and roll up onto it)"
        )
    fspec = load_mv_spec(fine)
    if fspec is None:
        raise ValueError(
            f"fine MV at {fine.path} has no recorded spec "
            "(_mv_spec.json) — refresh it once under this build (a "
            "pre-spec MV adopts its spec on the next refresh) or "
            "re-bootstrap it, then roll up"
        )
    if fspec.get("kind") not in ("agg", "agg-stream", "rollup", "join"):
        raise ValueError(
            f"fine MV at {fine.path} has kind {fspec.get('kind')!r}: "
            "only grouped aggregate MVs (agg / agg-stream / rollup / "
            "join) roll up"
        )
    if fspec.get("distinct_cols"):
        raise ValueError(
            "exact COUNT DISTINCT does not roll up (occurrence "
            "counts cannot merge across fine groups without "
            "per-value state): declare the coarse MV directly over "
            "the base table with refresh_mv, or switch the fine MV "
            f"to approx_distinct_cols. Fine MV declares "
            f"{fspec['distinct_cols']!r}"
        )
    fine_groups = list(fspec["group_cols"])
    missing = [g for g in group_cols if g not in fine_groups]
    if missing:
        raise ValueError(
            f"rollup group column(s) {missing!r} are not fine-MV "
            f"group columns {fine_groups!r} — a rollup can only "
            "coarsen the fine grouping"
        )
    sum_cols = list(fspec["sum_cols"])
    rows_col = fspec["rows_col"]
    min_cols = list(fspec.get("min_cols") or [])
    max_cols = list(fspec.get("max_cols") or [])
    sumsq_cols = list(fspec.get("sumsq_cols") or [])
    approx_cols = list(fspec.get("approx_distinct_cols") or [])
    pct_cols = list(fspec.get("percentile_cols") or [])
    rel_err = fspec.get("percentile_rel_err")
    if pct_cols and fspec.get("hist_encoding") != _HIST_ENCODING:
        raise ValueError(
            f"fine MV at {fine.path} stores percentile histograms "
            f"under bucket encoding {fspec.get('hist_encoding')} but "
            f"this build merges encoding {_HIST_ENCODING} — "
            "re-bootstrap the fine MV first"
        )
    ext_names, sq_names, _, hll_names, hist_names = _derived_names(
        group_cols, sum_cols, rows_col, min_cols, max_cols,
        sumsq_cols, [], approx_cols, pct_cols,
    )
    cur = fine.latest_version()
    if cur is None:
        raise FileNotFoundError(f"fine MV has no snapshots: {fine.path}")
    from ..io.versioned import _schema_from_json

    fine_schema = _schema_from_json(fine._load_manifest(cur)["schema"])
    fine_names = {f.name for f in fine_schema.fields}
    for n in [rows_col, *sum_cols, *sq_names, *ext_names,
              *hll_names, *hist_names]:
        if n not in fine_names:
            raise ValueError(
                f"fine MV at {fine.path} is missing measure column "
                f"{n!r} its spec declares — re-bootstrap the fine MV"
            )
    # sums (incl. the _sumsq columns, which are plain double sums at
    # this level) fold in the fine MV's own storage types — bigint
    # stays exact, decimal(38,s) stays exact, double stays double
    fold_cols = [*sum_cols, *sq_names]
    ftypes = _sum_fold_types(fine_schema, fold_cols)
    spec = {
        "spec_version": _SPEC_VERSION,
        "kind": "rollup",
        "name": name,
        "source_name": fspec["name"],
        "group_cols": group_cols,
        "sum_cols": sum_cols,
        "key": fine_groups,
        "rows_col": rows_col,
        "min_cols": min_cols,
        "max_cols": max_cols,
        "sumsq_cols": sumsq_cols,
        "distinct_cols": [],
        "approx_distinct_cols": approx_cols,
        "percentile_cols": pct_cols,
        "percentile_rel_err": (
            float(rel_err) if pct_cols else None
        ),
        "hist_encoding": _HIST_ENCODING if pct_cols else None,
        "source_where": source_where,
    }
    where_expr = (
        None if source_where is None else F.expr(source_where)
    )
    while True:
        mv_v, wm = _watermark(mv, tag)
        if wm is None:
            _store_spec(mv, spec)  # bootstrap (re)defines the spec
        else:
            _validate_spec(mv, spec)
        if wm is not None and cur <= wm:
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                _pin_watermark(fine, name, wm)
            return wm
        try:
            if wm is None:
                boot = fine.read(spark, version=cur)
                if where_expr is not None:
                    boot = boot.filter(where_expr)
                agg = boot.groupBy(*group_cols).agg(
                    *[
                        F.coalesce(F.sum(c), F.lit(0))
                        .cast(ftypes[c])
                        .alias(c)
                        for c in fold_cols
                    ],
                    F.coalesce(F.sum(rows_col), F.lit(0))
                    .cast("bigint")
                    .alias(rows_col),
                    *[
                        F.min(f"{c}_min").alias(f"{c}_min")
                        for c in min_cols
                    ],
                    *[
                        F.max(f"{c}_max").alias(f"{c}_max")
                        for c in max_cols
                    ],
                    *[
                        F.hll_union_agg(F.col(f"{c}_hll")).alias(
                            f"{c}_hll"
                        )
                        for c in approx_cols
                    ],
                )
                if hist_names:
                    agg = _attach_merged_hists(
                        agg, boot, group_cols, hist_names, F.lit(1)
                    )
                mv.commit(
                    agg,
                    mode="overwrite",
                    txn={tag: cur},
                    expected_parent=mv_v,
                )
            elif (
                _SIGNED_FOLD != "0"
                and not ext_names
                and not hll_names
                and all(ftypes[c] != "double" for c in fold_cols)
                and cur - wm <= _CDF_PLAN_CHUNK
            ):
                # DIRECT SIGNED FOLD over fine-MV rows (see refresh_mv
                # and the module knob note): coarse sums, the weighted
                # row count, and signed histogram merges are all linear
                # in the fine-row multiset over exact arithmetic, so ±
                # fine rows fold to the same coarse delta as the keyed
                # fine CDF — unchanged fine groups cancel exactly.
                # (fold_cols includes <c>_sumsq only when the fine MV
                # declares it, and those are double — the gate above
                # keeps such specs on the CDF path.)
                needed = (
                    None
                    if source_where is not None
                    else sorted({
                        *group_cols, *fold_cols, rows_col, *hist_names,
                    })
                )
                srows = table_signed_rows(
                    fine, spark, wm, cur, columns=needed
                )
                if where_expr is not None:
                    # each fine ROW IMAGE filters independently — same
                    # partial-view identity as the CDF path
                    srows = srows.filter(where_expr)
                s = F.col("__sign")
                deltas = srows.groupBy(*group_cols).agg(
                    *[
                        F.coalesce(F.sum(s * F.col(c)), F.lit(0))
                        .cast(ftypes[c])
                        .alias(c)
                        for c in fold_cols
                    ],
                    F.coalesce(F.sum(s * F.col(rows_col)), F.lit(0))
                    .cast("bigint")
                    .alias(rows_col),
                )
                if hist_names:
                    deltas = _attach_merged_hists(
                        deltas, srows, group_cols, hist_names, s
                    )
                nonzero = F.col(rows_col) != 0
                for c in fold_cols:
                    nonzero = nonzero | (F.col(c) != 0)
                for n in hist_names:
                    nonzero = nonzero | (F.size(F.col(n)) > 0)
                deltas = _pin_deltas(deltas.filter(nonzero).select(
                    *group_cols, *fold_cols, rows_col, *hist_names,
                ))
                try:
                    merge_into(
                        mv,
                        spark,
                        deltas,
                        key=group_cols,
                        when_matched={
                            **{
                                c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                                + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                                for c in [*fold_cols, rows_col]
                            },
                            **{
                                n: _hist_merge_expr(n)
                                for n in hist_names
                            },
                        },
                        txn={tag: cur},
                        expected_parent=mv_v,
                        source_unique=True,  # groupBy(group_cols) out
                    )
                finally:
                    deltas.unpersist()
            else:
                sign = _sign_col()
                is_add = sign == 1
                cdf_df = table_changes_cdf(
                    fine, spark, wm + 1, cur, key=fine_groups,
                    dup_probe="lazy",
                )
                if where_expr is not None:
                    # each fine ROW IMAGE filters independently: a
                    # fine-group update crossing the view boundary
                    # nets to a pure coarse insert/delete — the same
                    # partial-view identity as refresh_mv
                    cdf_df = cdf_df.filter(where_expr)
                deltas = cdf_df.groupBy(*group_cols).agg(
                    *[
                        F.coalesce(F.sum(sign * F.col(c)), F.lit(0))
                        .cast(ftypes[c])
                        .alias(c)
                        for c in fold_cols
                    ],
                    F.coalesce(
                        F.sum(sign * F.col(rows_col)), F.lit(0)
                    )
                    .cast("bigint")
                    .alias(rows_col),
                    *[
                        F.min(
                            F.when(is_add, F.col(f"{c}_min"))
                        ).alias(f"__ins_min_{c}")
                        for c in min_cols
                    ],
                    *[
                        F.min(
                            F.when(~is_add, F.col(f"{c}_min"))
                        ).alias(f"__del_min_{c}")
                        for c in min_cols
                    ],
                    *[
                        F.max(
                            F.when(is_add, F.col(f"{c}_max"))
                        ).alias(f"__ins_max_{c}")
                        for c in max_cols
                    ],
                    *[
                        F.max(
                            F.when(~is_add, F.col(f"{c}_max"))
                        ).alias(f"__del_max_{c}")
                        for c in max_cols
                    ],
                    *[
                        F.hll_union_agg(
                            F.when(is_add, F.col(f"{c}_hll"))
                        ).alias(f"__ins_hll_{c}")
                        for c in approx_cols
                    ],
                    *(
                        [
                            F.max(
                                F.when(~is_add, F.lit(1))
                            ).alias("__any_del")
                        ]
                        if approx_cols
                        else []
                    ),
                )
                if hist_names:
                    deltas = _attach_merged_hists(
                        deltas, cdf_df, group_cols, hist_names,
                        _sign_col(),
                    )
                if ext_names or hll_names:
                    deltas = _fold_stored(
                        fine, mv, spark, deltas,
                        cur=cur, mv_v=mv_v, group_cols=group_cols,
                        min_cols=min_cols, max_cols=max_cols,
                        approx_cols=approx_cols,
                        source_where=source_where,
                        rollup_src=True,
                    )
                deltas = _pin_deltas(deltas.select(
                    *group_cols, *fold_cols, rows_col,
                    *ext_names, *hll_names, *hist_names,
                ))
                try:
                    merge_into(
                        mv,
                        spark,
                        deltas,
                        key=group_cols,
                        when_matched={
                            **{
                                c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                                + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                                for c in [*fold_cols, rows_col]
                            },
                            **{
                                n: F.col(f"s.{n}")
                                for n in [*ext_names, *hll_names]
                            },
                            **{
                                n: _hist_merge_expr(n)
                                for n in hist_names
                            },
                        },
                        txn={tag: cur},
                        expected_parent=mv_v,
                        source_unique=True,  # groupBy(group_cols) out
                    )
                finally:
                    deltas.unpersist()
            _sweep_zero_groups(mv, spark, rows_col)
            if pin_watermark:
                _pin_watermark(fine, name, cur)
            return cur
        except CommitConflictError:
            continue  # racing refresher landed: re-read the watermark


def answer_from_mvs(
    mvs,
    spark: SparkSession,
    *,
    group_cols: list[str],
    measures: dict[str, tuple],
    where: str | None = None,
    having: str | None = None,
):
    """MV SELECTION — the read-side optimizer over a CATALOG of
    candidate MVs (the classic view-matching step, e.g. the
    Goldstein/Larson SQL Server algorithm's selection phase): try
    ``rewrite_with_mv`` on every candidate — each serves itself from
    its own recorded spec, so a mixed catalog of agg / join / rollup /
    filtered views needs no per-view arguments — keep the answers
    whose subsumption check passed, and return the one that reads the
    FEWEST STORED ROWS. The cost signal is ``count_where`` with no
    predicate: pure manifest metadata, zero Spark jobs, so choosing
    among a ladder of rollups costs a few file reads. On a cascade
    (fine by (day, site), coarse by (site)) a site-grouped query picks
    the COARSE level automatically — MV-sized input shrinks again by
    the rollup factor.

    Returns ``(answer_df, chosen_mv)``, or ``None`` when no candidate
    subsumes the request (caller falls back to the source). Ties
    break to the earliest candidate in ``mvs`` (stable). A candidate
    without a recorded spec raises — a catalog is built from
    self-describing views; refresh the stray once to adopt its spec.
    Reference parity: the reference always queries base tables in
    Postgres (internal/db/db.go:43-72); automatic answer-from-view is
    north-star warehouse surface."""
    best = None
    for mv in mvs:
        ans = rewrite_with_mv(
            mv, spark,
            group_cols=group_cols, measures=measures, where=where,
            having=having,
        )
        if ans is None:
            continue
        rows = int(mv.count_where(spark))
        if best is None or rows < best[2]:
            best = (ans, mv, rows)
    return None if best is None else (best[0], best[1])
