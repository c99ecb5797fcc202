"""count_where — COUNT(*) answered from manifest metadata wherever
provable (Iceberg's snapshot-summary / min-max trick): disjoint groups
count 0 without a read, fully-contained groups count their manifest
``_rows``, and only boundary groups scan. The classification must be
EXACT, not just the total: a group miscounted as metadata when it
needed a scan gives silently wrong counts at any scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import VersionedTable


def _ranged_table(spark, tmp_path) -> VersionedTable:
    """Four groups holding disjoint contiguous k ranges of 1000 rows:
    [0,999], [1000,1999], [2000,2999], [3000,3999]."""
    t = VersionedTable(str(tmp_path / "t"))
    for i in range(4):
        t.commit(
            spark.range(i * 1000, (i + 1) * 1000).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("v"),
            ),
            mode="append" if i else "overwrite",
        )
    return t


class TestCountWhere:
    def test_no_predicate_is_pure_metadata(self, spark, tmp_path):
        t = _ranged_table(spark, tmp_path)
        n, d = t.count_where(spark, detail=True)
        assert n == 4000
        assert d == {"pruned": 0, "metadata": 4, "scanned": 0}

    def test_boundary_groups_scan_contained_count_from_stats(
        self, spark, tmp_path
    ):
        t = _ranged_table(spark, tmp_path)
        # [500, 2500]: g0 and g2 are boundary (scan), g1 contained
        # (metadata), g3 disjoint (pruned)
        n, d = t.count_where(spark, where={"k": (500, 2500)}, detail=True)
        assert n == 2001
        assert d == {"pruned": 1, "metadata": 1, "scanned": 2}
        # agreement with the exact read on every window shape
        for lo, hi in [(0, 3999), (1000, 1999), (999, 1000), (4500, 9000)]:
            assert t.count_where(spark, where={"k": (lo, hi)}) == (
                t.read(spark, where={"k": (lo, hi)}).count()
            )

    def test_open_bounds_and_in_sets(self, spark, tmp_path):
        t = _ranged_table(spark, tmp_path)
        n, d = t.count_where(spark, where={"k": (2000, None)}, detail=True)
        assert n == 2000
        assert d["metadata"] == 2 and d["scanned"] == 0 and d["pruned"] == 2
        # IN-sets can't be proven by a box: matching groups scan
        n, d = t.count_where(
            spark, where={"k": [3, 1500, 1501]}, detail=True
        )
        assert n == 3
        assert d["scanned"] == 2 and d["pruned"] == 2 and d["metadata"] == 0

    def test_nulls_force_scan(self, spark, tmp_path):
        """A contained box with NULLs in the referenced column must
        SCAN: NULL rows are inside _rows but fail any bound."""
        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            spark.createDataFrame(
                [(1,), (2,), (None,)], "k bigint"
            ),
            mode="overwrite",
        )
        n, d = t.count_where(spark, where={"k": (0, 10)}, detail=True)
        assert n == 2
        assert d == {"pruned": 0, "metadata": 0, "scanned": 1}
        # without a predicate the NULL row counts — and stays metadata
        assert t.count_where(spark, detail=True) == (
            3,
            {"pruned": 0, "metadata": 1, "scanned": 0},
        )

    def test_pending_mor_deletes_force_scan(self, spark, tmp_path):
        """_rows overstates a group with pending equality deletes —
        those groups scan (with the anti-join applied) even when the
        box is contained."""
        t = _ranged_table(spark, tmp_path)
        t.delete_where(
            spark,
            F.col("k").between(1100, 1149),
            strategy="merge-on-read",
            key_cols=["k"],
        )
        n, d = t.count_where(spark, where={"k": (1000, 1999)}, detail=True)
        assert n == 950
        assert d == {"pruned": 3, "metadata": 0, "scanned": 1}
        assert t.count_where(spark) == 3950

    def test_time_travel_version(self, spark, tmp_path):
        t = _ranged_table(spark, tmp_path)
        v1 = t.versions()[1]  # after the second commit
        assert t.count_where(spark, version=v1) == 2000

    def test_empty_table_raises(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            t.count_where(spark)
