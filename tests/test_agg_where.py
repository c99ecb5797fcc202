"""agg_where: metadata-only MIN/MAX/SUM/COUNT (VERDICT r9 #4 —
count_where's pruned/metadata/scanned classification extended to the
distributive aggregates, with per-group SUMs observed at write time).
Every test pins the classification alongside the values: a
misclassified group is silently wrong at any scale."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import VersionedTable


def _mk(spark, tmp_path, n_groups=3, rows=10):
    t = VersionedTable(str(tmp_path / "t"))
    for gi in range(n_groups):
        df = spark.range(gi * rows, (gi + 1) * rows).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("val"),
            (F.col("id") / 4.0).alias("x"),
        )
        t.commit(df, mode="append" if gi else "overwrite")
    return t


class TestMetadataAgg:
    def test_no_predicate_pure_metadata(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        out, detail = t.agg_where(spark, "val", detail=True)
        assert detail == {"pruned": 0, "metadata": 3, "scanned": 0}
        assert out == {"min": 0, "max": 58, "sum": sum(2 * k for k in range(30)), "count": 30}

    def test_bounded_classification(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        out, detail = t.agg_where(
            spark, "val", where={"k": (0, 14)}, detail=True
        )
        # group 0 contained, group 1 boundary (scan), group 2 pruned
        assert detail == {"pruned": 1, "metadata": 1, "scanned": 1}
        assert out["min"] == 0 and out["max"] == 28
        assert out["sum"] == sum(2 * k for k in range(15))
        assert out["count"] == 15

    def test_double_column(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        out = t.agg_where(spark, "x", ops=("min", "max", "sum"))
        assert out["min"] == 0.0 and out["max"] == pytest.approx(29 / 4)
        assert out["sum"] == pytest.approx(sum(k / 4 for k in range(30)))

    def test_nulls_ignored_sql_semantics(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "n"))
        t.commit(
            spark.createDataFrame(
                [(1, 10), (2, None), (3, 30)], "k bigint, v bigint"
            ),
            mode="overwrite",
        )
        out, detail = t.agg_where(spark, "v", detail=True)
        assert detail["metadata"] == 1 and detail["scanned"] == 0
        assert out == {"min": 10, "max": 30, "sum": 40, "count": 2}

    def test_all_null_column(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "an"))
        t.commit(
            spark.createDataFrame(
                [(1, None), (2, None)], "k bigint, v bigint"
            ),
            mode="overwrite",
        )
        out = t.agg_where(spark, "v")
        assert out == {"min": None, "max": None, "sum": None, "count": 0}

    def test_pending_mor_delete_forces_scan(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        t.delete_where(
            spark,
            F.col("k") < 5,
            strategy="merge-on-read",
            key_cols=["k"],
        )
        out, detail = t.agg_where(spark, "val", detail=True)
        # the delete sidecar scopes to ALL groups at delete time — every
        # group's _rows overstate, so every group scans; values exact
        assert detail["metadata"] == 0
        assert out["min"] == 10 and out["count"] == 25
        assert out["sum"] == sum(2 * k for k in range(5, 30))

    def test_pre_sum_manifests_scan_for_sum_only(self, spark, tmp_path):
        """A manifest whose entries lack 'sum' (pre-r10) answers
        min/max/count from metadata but scans for sum."""
        t = _mk(spark, tmp_path, n_groups=1)
        m = t._load_manifest(t.latest_version())
        for st in m["stats"].values():
            for c, entry in list(st.items()):
                if isinstance(entry, dict):
                    entry.pop("sum", None)
        import json as _json
        import os as _os

        from file_stream_import_spark.io.versioned import _manifest_path

        path = _manifest_path(t.path, t.latest_version())
        _os.chmod(path, 0o644)
        with open(path, "w") as f:
            _json.dump(m, f)
        out_mm, d_mm = t.agg_where(
            spark, "val", ops=("min", "max"), detail=True
        )
        assert d_mm == {"pruned": 0, "metadata": 1, "scanned": 0}
        out_s, d_s = t.agg_where(spark, "val", ops=("sum",), detail=True)
        assert d_s == {"pruned": 0, "metadata": 0, "scanned": 1}
        assert out_s["sum"] == sum(2 * k for k in range(10))

    def test_nan_stats_scan(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "nan"))
        t.commit(
            spark.createDataFrame(
                [(1, 1.0), (2, float("nan")), (3, 2.0)],
                "k bigint, x double",
            ),
            mode="overwrite",
        )
        out, detail = t.agg_where(spark, "x", detail=True)
        # non-finite stats are omitted → scan; Spark's exact semantics
        # (NaN is greater than everything for max) apply
        assert detail["metadata"] == 0 and detail["scanned"] == 1
        assert out["min"] == 1.0
        import math

        assert math.isnan(out["max"]) and math.isnan(out["sum"])

    def test_decimal_and_timestamp_domains(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "d"))
        t.commit(
            spark.createDataFrame(
                [
                    (1, Decimal("1.50"), datetime.datetime(2020, 1, 1)),
                    (2, Decimal("2.25"), datetime.datetime(2020, 6, 1)),
                ],
                "k bigint, amt decimal(10,2), ts timestamp",
            ),
            mode="overwrite",
        )
        out, detail = t.agg_where(spark, "amt", detail=True)
        assert detail["metadata"] == 1
        assert out["min"] == Decimal("1.50")
        assert out["sum"] == Decimal("3.75")
        ts = t.agg_where(spark, "ts", ops=("min", "max"), detail=True)
        assert ts[1]["metadata"] == 1
        assert ts[0]["max"] == datetime.datetime(2020, 6, 1)

    def test_matches_exact_scan_fuzz(self, spark, tmp_path):
        """Cross-check: agg_where == the exact scan for a grid of
        boxes over a multi-group table with negatives and duplicates."""
        t = VersionedTable(str(tmp_path / "fz"))
        rows = [(i % 7, (-1) ** i * i) for i in range(40)]
        for c in range(0, 40, 10):
            t.commit(
                spark.createDataFrame(
                    rows[c : c + 10], "k bigint, v bigint"
                ),
                mode="append" if c else "overwrite",
            )
        for lo, hi in [(0, 6), (2, 4), (5, 5), (7, 9)]:
            got = t.agg_where(spark, "v", where={"k": (lo, hi)})
            want_rows = [v for k, v in rows if lo <= k <= hi]
            assert got["count"] == len(want_rows)
            assert got["min"] == (min(want_rows) if want_rows else None)
            assert got["max"] == (max(want_rows) if want_rows else None)
            assert got["sum"] == (
                sum(want_rows) if want_rows else None
            )


def test_sum_on_string_column_refused(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "s"))
    t.commit(
        spark.createDataFrame([(1, "a")], "k bigint, v string"),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="SUM is undefined"):
        t.agg_where(spark, "v", ops=("sum",))
    # min/max over strings stay valid (lexicographic, as SQL)
    out = t.agg_where(spark, "v", ops=("min", "max", "count"))
    assert out == {"min": "a", "max": "a", "count": 1}
