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
endangered-group rows), never a full rescan (see _fold_extremes).

Contract: group columns must be NON-NULL (MERGE matches keys by
equality, and a NULL group key would never match its MV row) and the
source must satisfy the CDF contract (key-unique on ``key``,
merge/apply_changes-maintained).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..io.versioned import (
    CommitConflictError,
    VersionedTable,
    merge_into,
    table_changes_cdf,
)

_ROWS = "n_rows"

# endangered-group keys are collected driver-side only up to this cap
# (to drive the group-pruned exact read); a larger set falls back to a
# distributed semi join — same bounded-driver discipline as
# io/versioned.py's _MAX_DRIVER_ROWS
_MAX_EXACT_KEYS = 8192


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
    accumulated error); decimals are rejected loudly because +-folding
    grows precision past the MV's declared type."""
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
        else:
            raise ValueError(
                f"sum column {c!r} has type "
                f"{types[c].simpleString()}: only integral (exact "
                "bigint fold) and float/double columns are "
                "maintainable — cast decimals to cents-style "
                "integers or double first"
            )
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

    ``pin_watermark=True`` tags the source at each new watermark
    (``mvpin-<name>-<v>``, previous pin swept), so an aggressive
    vacuum() can never expire the manifests the next refresh's CDF
    walk needs — without it, a vacuum past the watermark forces an MV
    re-bootstrap (the documented remedy). Main-chain sources only
    (tags live on main)."""
    tag = f"mv:{name}"
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    ext_names = [f"{c}_min" for c in min_cols] + [
        f"{c}_max" for c in max_cols
    ]
    sq_names = [f"{c}_sumsq" for c in sumsq_cols]
    taken = {*group_cols, *sum_cols, rows_col}
    for c in [*min_cols, *max_cols, *sumsq_cols]:
        if c in group_cols:
            raise ValueError(
                f"derived-aggregate column {c!r} is a group column"
            )
    for n in [*ext_names, *sq_names]:
        if n in taken:
            raise ValueError(f"derived column name {n!r} collides")
    cur = source.latest_version()
    if cur is None:
        raise FileNotFoundError(f"source has no snapshots: {source.path}")
    from ..io.versioned import _schema_from_json

    src_schema = _schema_from_json(source._load_manifest(cur)["schema"])
    ftypes = _sum_fold_types(src_schema, sum_cols)
    _sum_fold_types(src_schema, sumsq_cols)  # numeric-family check
    while True:
        mv_v, wm = _watermark(mv, tag)
        if wm is not None and cur <= wm:
            # converged (or a replay of an applied refresh): still run
            # the zero-group sweep so a crashed predecessor's residue
            # heals
            mv.delete_where(
                spark, F.col(rows_col) == 0, prune_where="auto"
            )
            if pin_watermark:
                # converged replays still pin: a caller switching an
                # unpinned MV to pin_watermark=True must be protected
                # from the NEXT vacuum even when no delta folds
                _pin_watermark(source, name, wm)
            return wm
        try:
            if wm is None:
                agg = (
                    source.read(spark, version=cur)
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
                    )
                )
                mv.commit(
                    agg,
                    mode="overwrite",
                    txn={tag: cur},
                    expected_parent=mv_v,
                )
            else:
                sign = _sign_col()
                is_add = sign == 1
                deltas = (
                    table_changes_cdf(
                        source, spark, wm + 1, cur, key=key
                    )
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
                    )
                )
                if ext_names:
                    deltas = _fold_extremes(
                        source, mv, spark, deltas,
                        cur=cur, mv_v=mv_v, group_cols=group_cols,
                        min_cols=min_cols, max_cols=max_cols,
                    )
                deltas = deltas.select(
                    *group_cols, *sum_cols, rows_col, *sq_names,
                    *ext_names,
                )
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
                        # exact-recomputed for endangered groups)
                        **{n: F.col(f"s.{n}") for n in ext_names},
                    },
                    txn={tag: cur},
                    expected_parent=mv_v,
                )
            mv.delete_where(
                spark, F.col(rows_col) == 0, prune_where="auto"
            )
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


def _fold_extremes(
    source: VersionedTable,
    mv: VersionedTable,
    spark: SparkSession,
    deltas,
    *,
    cur: int,
    mv_v: int,
    group_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
):
    """Resolve each delta group's FINAL min/max columns.

    Non-endangered groups fold insert-side candidates against the
    stored extreme with LEAST/GREATEST (null-skipping, so a group with
    no relevant rows keeps its stored value). A group is ENDANGERED
    when a delete/update-preimage value touches the stored extreme
    (<= for min, >= for max) or when the group is absent from the MV
    but saw deletes inside the window (insert-then-delete of a brand
    new group) — exactly those groups are recomputed from source@cur,
    group-pruned via manifest stats when the endangered key set is
    small and the group key is a single column."""
    stored = mv.read(spark, version=mv_v).select(
        *group_cols,
        *[F.col(f"{c}_min").alias(f"__st_min_{c}") for c in min_cols],
        *[F.col(f"{c}_max").alias(f"__st_max_{c}") for c in max_cols],
        F.lit(True).alias("__in_mv"),
    )
    j = deltas.join(stored, on=group_cols, how="left")
    endangered = F.lit(False)
    for c in min_cols:
        d, s = F.col(f"__del_min_{c}"), F.col(f"__st_min_{c}")
        endangered = endangered | (
            d.isNotNull()
            & (F.col("__in_mv").isNull() | s.isNull() | (d <= s))
        )
    for c in max_cols:
        d, s = F.col(f"__del_max_{c}"), F.col(f"__st_max_{c}")
        endangered = endangered | (
            d.isNotNull()
            & (F.col("__in_mv").isNull() | s.isNull() | (d >= s))
        )
    j = j.withColumn("__endangered", endangered).localCheckpoint(
        eager=True
    )
    # bounded driver probe: the endangered KEY set (not rows) decides
    # between the group-pruned point read, a distributed semi join,
    # and skipping the source scan entirely when nothing is endangered
    end_keys = j.filter(F.col("__endangered")).select(*group_cols)
    probe = end_keys.limit(_MAX_EXACT_KEYS + 1).collect()
    if not probe:
        exact = None
    else:
        aggs = [
            F.min(c).alias(f"__ex_min_{c}") for c in min_cols
        ] + [F.max(c).alias(f"__ex_max_{c}") for c in max_cols]
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
        exact = src.groupBy(*group_cols).agg(*aggs)
    if exact is not None:
        j = j.join(exact, on=group_cols, how="left")
    else:
        for c in min_cols:
            j = j.withColumn(
                f"__ex_min_{c}", F.lit(None).cast(j.schema[f"__ins_min_{c}"].dataType)
            )
        for c in max_cols:
            j = j.withColumn(
                f"__ex_max_{c}", F.lit(None).cast(j.schema[f"__ins_max_{c}"].dataType)
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
    _MAX_EXACT_KEYS; a broadcast semi join otherwise), so neither full
    snapshot is rescanned after the one bootstrap join. Requires
    version ``wm_a`` of A to still be retained (A@old) — if vacuum
    expired it, the refresh raises with the re-bootstrap remedy.

    ``group_cols``/``sum_cols`` name columns of the JOINED row (either
    side); both sources must satisfy the CDF contract on their own
    keys. SUM/COUNT only (AVG = SUM/COUNT at read); join-key updates
    decompose into -old/+new pairs on the delta side and need nothing
    special. Returns (version_a, version_b) the MV now reflects.
    ``pin_watermark=True`` tags BOTH sources at their watermarks
    (vacuum-proof refreshes, see refresh_mv)."""
    from ..io.versioned import _schema_from_json

    tag_a, tag_b = f"mv:{name}:a", f"mv:{name}:b"
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

    ftypes = _sum_fold_types(
        StructType(list(schema_a.fields) + list(schema_b.fields)),
        sum_cols,
    )
    missing = [c for c in on if c not in cols_a or c not in cols_b]
    if missing:
        raise ValueError(f"join columns missing from a source: {missing}")
    clash = (cols_a & cols_b) - set(on)
    if clash:
        raise ValueError(
            f"non-join columns shared by both sources would collide in "
            f"the joined row: {sorted(clash)} — rename one side"
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
        if wa is not None and cur_a <= wa and wb is not None and (
            cur_b <= wb
        ):
            mv.delete_where(
                spark, F.col(rows_col) == 0, prune_where="auto"
            )
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
                agg = joined.groupBy(*group_cols).agg(
                    *sums, F.count("*").cast("bigint").alias(rows_col)
                )
                mv.commit(
                    agg,
                    mode="overwrite",
                    txn={tag_a: cur_a, tag_b: cur_b},
                    expected_parent=mv_v,
                )
            else:
                parts = []
                if cur_a > wa:
                    da = _signed_cdf(
                        a, spark, wa + 1, cur_a, key_a
                    ).localCheckpoint(eager=True)
                    parts.append(
                        da.join(
                            _pruned_snapshot(
                                b, spark, cur_b, on, da
                            ),
                            on=on,
                            how="inner",
                        )
                    )
                if cur_b > wb:
                    db = _signed_cdf(
                        b, spark, wb + 1, cur_b, key_b
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
                    parts.append(db.join(a_old, on=on, how="inner"))
                delta = parts[0]
                for p in parts[1:]:
                    delta = delta.unionByName(p)
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
                merge_into(
                    mv,
                    spark,
                    deltas,
                    key=group_cols,
                    when_matched={
                        c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                        + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                        for c in [*sum_cols, rows_col]
                    },
                    txn={tag_a: cur_a, tag_b: cur_b},
                    expected_parent=mv_v,
                )
            mv.delete_where(
                spark, F.col(rows_col) == 0, prune_where="auto"
            )
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


def _signed_cdf(t, spark, lo, hi, key):
    """Row-level CDF rows [lo, hi] with a ``__sign`` column (+1 for
    insert/update_postimage, -1 for delete/update_preimage), metadata
    columns dropped — the signed-multiset delta of the table."""
    cdf = table_changes_cdf(t, spark, lo, hi, key=key)
    return cdf.withColumn("__sign", _sign_col()).drop(
        "_change_type", "_commit_version"
    )


def _pruned_snapshot(t, spark, version, on, delta):
    """Snapshot ``version`` of ``t`` restricted to the delta's join
    keys: the IN-set point probe (manifest stats + blooms) when the
    join key is one column with a bounded distinct set, else a
    broadcast semi join — either way the join against the delta never
    rescans the snapshot."""
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

def make_mv_maintainer(
    mv: VersionedTable,
    query_name: str,
    *,
    group_cols: list[str],
    sum_cols: list[str],
    rows_col: str = _ROWS,
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
    per trigger. SUM/COUNT only (the endangered-extreme recompute of
    refresh_mv needs a source snapshot read, which a sink deliberately
    doesn't do — use batch refresh_mv for MIN/MAX views)."""

    def write(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a planned-but-empty batch (pure compaction versions) needs
        # no MV commit; the watermark stays put, and a replayed empty
        # batch is empty again — safe to skip
        if not batch_df.take(1):
            return
        sign = _sign_col()
        ftypes = _sum_fold_types(batch_df.schema, sum_cols)
        deltas = batch_df.groupBy(*group_cols).agg(
            *[
                F.coalesce(F.sum(sign * F.col(c)), F.lit(0))
                .cast(ftypes[c])
                .alias(c)
                for c in sum_cols
            ],
            F.sum(sign).cast("bigint").alias(rows_col),
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
            try:
                merge_into(
                    mv,
                    spark,
                    deltas,
                    key=group_cols,
                    when_matched={
                        c: F.coalesce(F.col(f"t.{c}"), F.lit(0))
                        + F.coalesce(F.col(f"s.{c}"), F.lit(0))
                        for c in [*sum_cols, rows_col]
                    },
                    txn={query_name: int(batch_id)},
                    expected_parent=latest,
                )
                break
            except CommitConflictError:
                continue  # concurrent delivery landed: re-check
        mv.delete_where(spark, F.col(rows_col) == 0, prune_where="auto")

    return write
