"""Round-16 optimization behaviors.

Each test pins one of the r16 performance changes at the SEMANTIC
level — the optimizations must never change what a caller observes,
except where the new behavior is itself the contract (write-side file
sizing, lazy dup probe's error channel).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    merge_into,
    snapshot_diff,
    table_changes_cdf,
)


def _mk(spark, rows, schema="k long, v long, extra string"):
    return spark.createDataFrame(rows, schema)


class TestFusedDupProbe:
    def test_duplicate_source_keys_still_raise(self, spark, tmp_path):
        """The dup probe now rides the touch-test aggregate — the
        contract (ValueError before any write) is unchanged."""
        t = VersionedTable(str(tmp_path / "t"))
        t.commit(_mk(spark, [(1, 10, "a")]), mode="overwrite")
        dup = _mk(spark, [(2, 20, "b"), (2, 21, "c")])
        with pytest.raises(ValueError, match="duplicate keys"):
            merge_into(t, spark, dup, key="k")
        # nothing was committed
        assert t.latest_version() == 0

    def test_duplicate_keys_raise_on_first_commit_path(
        self, spark, tmp_path
    ):
        """base-is-None merges (first commit) keep the probe too."""
        t = VersionedTable(str(tmp_path / "t"))
        dup = _mk(spark, [(2, 20, "b"), (2, 21, "c")])
        with pytest.raises(ValueError, match="duplicate keys"):
            merge_into(t, spark, dup, key="k")

    def test_null_keys_count_as_duplicates(self, spark, tmp_path):
        """Two NULL-keyed source rows collide, exactly like the old
        groupBy probe (struct-of-key comparison is null-safe)."""
        t = VersionedTable(str(tmp_path / "t"))
        t.commit(_mk(spark, [(1, 10, "a")]), mode="overwrite")
        dup = _mk(spark, [(None, 20, "b"), (None, 21, "c")])
        with pytest.raises(ValueError, match="duplicate keys"):
            merge_into(t, spark, dup, key="k")

    def test_source_unique_merge_result_identical(self, spark, tmp_path):
        """source_unique=True skips the probe; a normal merge's result
        is byte-identical either way."""
        rows = [(i, i * 10, "x") for i in range(20)]
        upd = _mk(spark, [(5, 999, "y"), (25, 1, "z")])
        t1 = VersionedTable(str(tmp_path / "a"))
        t1.commit(_mk(spark, rows), mode="overwrite")
        merge_into(t1, spark, upd, key="k")
        t2 = VersionedTable(str(tmp_path / "b"))
        t2.commit(_mk(spark, rows), mode="overwrite")
        merge_into(t2, spark, upd, key="k", source_unique=True)
        a = sorted(map(tuple, t1.read(spark).collect()))
        b = sorted(map(tuple, t2.read(spark).collect()))
        assert a == b and len(a) == 21


class TestLazyDupProbe:
    def test_lazy_probe_raises_at_consumption(self, spark, tmp_path):
        """dup_probe='lazy' embeds the key-uniqueness guard in the
        diff plan: a raw-append duplicate key surfaces when the diff
        is consumed (Spark USER_RAISED_EXCEPTION with the contract
        message) instead of at call time."""
        t = VersionedTable(str(tmp_path / "t"))
        mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
        t.commit(mk([(0, "seed")]))
        t.commit(mk([(1, "x")]))
        t.commit(mk([(1, "y"), (2, "b")]))
        d = snapshot_diff(
            t, spark, t.latest_version() - 2, t.latest_version(),
            key="k", dup_probe="lazy",
        )
        with pytest.raises(Exception, match="key-unique"):
            d.collect()

    def test_lazy_probe_passes_clean_diff(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
        t.commit(mk([(1, "a"), (2, "b")]), mode="overwrite")
        t.commit(mk([(3, "c")]))
        d = snapshot_diff(t, spark, 0, 1, key="k", dup_probe="lazy")
        got = {(r["k"], r["change"]) for r in d.collect()}
        assert got == {(3, "I")}
        assert "__diff_dups" not in d.columns


class TestProjectedCdf:
    def test_projected_cdf_matches_full_on_tracked_columns(
        self, spark, tmp_path
    ):
        """columns=[...] restricts the CDF payload; rows for changes
        of TRACKED columns are identical to the full CDF projected."""
        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            _mk(spark, [(1, 10, "a"), (2, 20, "b")]), mode="overwrite"
        )
        merge_into(
            t, spark, _mk(spark, [(1, 11, "a"), (3, 30, "c")]), key="k"
        )
        full = table_changes_cdf(t, spark, 1, key="k")
        proj = table_changes_cdf(t, spark, 1, key="k", columns=["v"])
        assert set(proj.columns) == {
            "k", "v", "_change_type", "_commit_version"
        }
        want = {
            (r["k"], r["v"], r["_change_type"])
            for r in full.select(
                "k", "v", "_change_type"
            ).collect()
        }
        got = {
            (r["k"], r["v"], r["_change_type"]) for r in proj.collect()
        }
        assert got == want

    def test_untracked_only_update_emits_no_projected_rows(
        self, spark, tmp_path
    ):
        """An update touching ONLY untracked columns emits no CDF row
        under projection — the ± pair it previously emitted cancels
        in every signed fold, so MV results are unchanged while the
        diff shuffles nothing for it."""
        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            _mk(spark, [(1, 10, "a"), (2, 20, "b")]), mode="overwrite"
        )
        # v unchanged, only 'extra' changes
        merge_into(t, spark, _mk(spark, [(1, 10, "CHANGED")]), key="k")
        proj = table_changes_cdf(t, spark, 1, key="k", columns=["v"])
        assert proj.count() == 0
        full = table_changes_cdf(t, spark, 1, key="k")
        assert full.count() == 2  # pre+post pair still in the full CDF

    def test_refresh_mv_unaffected_by_untracked_update(
        self, spark, tmp_path
    ):
        from file_stream_import_spark.operators.mv import refresh_mv

        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            _mk(
                spark,
                [(1, 10, "a"), (2, 20, "a"), (3, 5, "b")],
                "k long, v long, g string",
            ),
            mode="overwrite",
        )
        mv = VersionedTable(str(tmp_path / "mv"))
        refresh_mv(
            t, mv, spark, name="m", group_cols=["g"],
            sum_cols=["v"], key="k",
        )
        before = sorted(map(tuple, mv.read(spark).collect()))
        # update only the untracked... here every column is tracked
        # except none — so instead bump v and verify the fold, then
        # merge an identical row (no-op update) and verify zero delta
        merge_into(
            t, spark,
            _mk(spark, [(1, 10, "a")], "k long, v long, g string"),
            key="k",
        )
        v = refresh_mv(
            t, mv, spark, name="m", group_cols=["g"],
            sum_cols=["v"], key="k",
        )
        assert v == t.latest_version()
        assert sorted(map(tuple, mv.read(spark).collect())) == before


class TestWriteFileSizing:
    def test_small_commit_coalesces_to_one_file(self, spark, tmp_path):
        """Write-side REBALANCE: a tiny commit arriving in many
        partitions lands as one right-sized file, not one file per
        upstream partition (guide §6 small-files fix; the changefeed
        plans per file, so this bounds task fan-out too)."""
        t = VersionedTable(str(tmp_path / "t"))
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartition(16)
        t.commit(df, mode="overwrite")
        m = t._load_manifest(0)
        g = m["groups"][0]
        files = [
            n
            for n in os.listdir(os.path.join(t.path, g))
            if n.endswith(".parquet")
        ]
        assert len(files) == 1
        assert t.read(spark).count() == 1000

    def test_empty_commit_still_readable(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        df = spark.range(10).filter("id < 0").select(
            F.col("id").alias("k")
        )
        t.commit(df, mode="overwrite")
        assert t.read(spark).count() == 0


class TestRebalanceSizeGate:
    """The REBALANCE hint is size-gated: only deltas the optimizer
    estimates small get the extra shuffle. A large delta keeps its
    upstream partitioning (the shuffle there is a full extra pass that
    cannot fix a tiny-files pathology it does not have — measured 1.7x
    on a 280 MB commit with the file count unchanged,
    tools/ab_write_rebalance.py)."""

    def test_small_estimate_rebalances(self, spark):
        from file_stream_import_spark.io.versioned import (
            _delta_small_enough,
        )

        assert _delta_small_enough(spark.range(1000).selectExpr(
            "id as k", "id * 2 as v"
        ))

    def test_large_estimate_skips(self, spark):
        from file_stream_import_spark.io.versioned import (
            _delta_small_enough,
        )

        # Range reports exact rows x width stats without running a
        # job: 10^9 rows x 8 B >> the 256 MB gate
        assert not _delta_small_enough(spark.range(1_000_000_000))

    def test_unknown_estimate_rebalances(self, spark):
        """LogicalRDD-backed plans (localCheckpoint, foreachBatch
        micro-batch deltas) report the defaultSizeInBytes sentinel —
        exactly the exactly-once small-commit shapes the hint exists
        for, so unknown must mean rebalance."""
        from file_stream_import_spark.io.versioned import (
            _delta_small_enough,
        )

        df = spark.range(100).selectExpr("id as k").localCheckpoint(
            eager=True
        )
        assert _delta_small_enough(df)

    def test_large_commit_keeps_upstream_layout(self, spark, tmp_path):
        """End-to-end: a delta estimated over the gate writes one file
        per upstream partition (no rebalance shuffle), and the table
        still reads back intact."""
        import file_stream_import_spark.io.versioned as V

        src = str(tmp_path / "src")
        spark.range(5_000).selectExpr(
            "id as k", "id * 3 as v"
        ).write.parquet(src)
        # explicit upstream partitioning (the scan alone may pack the
        # small files into one split); Repartition passes the scan's
        # real size estimate through, so the gate still sees a finite
        # stat rather than the unknown sentinel
        delta = spark.read.parquet(src).repartition(7)

        old = V._WRITE_REBALANCE_MAX_BYTES
        V._WRITE_REBALANCE_MAX_BYTES = 1  # force "large" without big data
        try:
            t = VersionedTable(str(tmp_path / "t"))
            t.commit(delta, mode="overwrite")
        finally:
            V._WRITE_REBALANCE_MAX_BYTES = old
        m = t._load_manifest(0)
        g = m["groups"][0]
        files = [
            n
            for n in os.listdir(os.path.join(t.path, g))
            if n.endswith(".parquet")
        ]
        assert len(files) == 7  # upstream partitioning preserved
        assert t.read(spark).count() == 5_000
