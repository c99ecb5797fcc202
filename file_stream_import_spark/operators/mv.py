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
skips. SUM/COUNT are self-maintainable under deletes; AVG = SUM/COUNT
at read time. MIN/MAX (``min_cols``/``max_cols``) use the standard
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
    SAME single MERGE commit, so crash/replay atomicity is unchanged."""
    tag = f"mv:{name}"
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    ext_names = [f"{c}_min" for c in min_cols] + [
        f"{c}_max" for c in max_cols
    ]
    taken = {*group_cols, *sum_cols, rows_col}
    for c in [*min_cols, *max_cols]:
        if c in group_cols:
            raise ValueError(f"min/max column {c!r} is a group column")
    for n in ext_names:
        if n in taken:
            raise ValueError(f"derived column name {n!r} collides")
    cur = source.latest_version()
    if cur is None:
        raise FileNotFoundError(f"source has no snapshots: {source.path}")
    while True:
        mv_v, wm = _watermark(mv, tag)
        if wm is not None and cur <= wm:
            # converged (or a replay of an applied refresh): still run
            # the zero-group sweep so a crashed predecessor's residue
            # heals
            mv.delete_where(
                spark, F.col(rows_col) == 0, prune_where="auto"
            )
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
                            .cast("bigint")
                            .alias(c)
                            for c in sum_cols
                        ],
                        F.count("*").cast("bigint").alias(rows_col),
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
                is_add = F.col("_change_type").isin(
                    "insert", "update_postimage"
                )
                sign = F.when(is_add, F.lit(1)).otherwise(F.lit(-1))
                deltas = (
                    table_changes_cdf(
                        source, spark, wm + 1, cur, key=key
                    )
                    .groupBy(*group_cols)
                    .agg(
                        *[
                            F.coalesce(F.sum(sign * F.col(c)), F.lit(0))
                            .cast("bigint")
                            .alias(c)
                            for c in sum_cols
                        ],
                        F.sum(sign).cast("bigint").alias(rows_col),
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
                    *group_cols, *sum_cols, rows_col, *ext_names
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
                            for c in [*sum_cols, rows_col]
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
            return cur
        except CommitConflictError:
            continue  # racing refresher landed: re-read the watermark

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
            src = source.read(spark, version=cur).join(
                F.broadcast(end_keys), on=group_cols, how="semi"
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
