"""Round-9: derive_prune_bounds — predicate → stats-box extraction
(the Delta file-skipping-planner move) behind delete_where's and
update_where's ``prune_where="auto"``.

Soundness contract under test: condition TRUE for a row ⇒ every
derived bound holds for that row. The planner must NEVER widen what a
DML touches incorrectly (a missed bound only costs a rewrite; a wrong
bound would silently skip matching rows), so every underivable shape
(NOT, isNull, col-vs-col, UDF, OR across columns, non-primitive
literals) must yield NO bound for the affected column.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    derive_prune_bounds,
)


class TestDeriveBounds:
    def test_between_and_equality(self, spark):
        b = derive_prune_bounds(
            F.col("k").between(1200, 1800) & (F.col("status") == "F")
        )
        assert b == {"k": (1200, 1800), "status": ("F", "F")}

    def test_isin_is_a_value_list(self, spark):
        assert derive_prune_bounds(F.col("k").isin(3, 1, 2)) == {
            "k": [3, 1, 2]
        }

    def test_one_sided_ranges(self, spark):
        assert derive_prune_bounds(F.col("k") > 5) == {"k": (5, None)}
        assert derive_prune_bounds(F.col("k") <= 9) == {"k": (None, 9)}

    def test_literal_on_the_left_flips(self, spark):
        assert derive_prune_bounds(F.lit(5) < F.col("k")) == {
            "k": (5, None)
        }
        assert derive_prune_bounds(F.lit(9) >= F.col("k")) == {
            "k": (None, 9)
        }

    def test_or_same_column_hulls(self, spark):
        b = derive_prune_bounds(
            F.col("k").between(0, 10) | F.col("k").between(50, 60)
        )
        assert b == {"k": (0, 60)}

    def test_or_in_sets_union(self, spark):
        b = derive_prune_bounds(
            F.col("k").isin(1, 2) | F.col("k").isin(2, 9)
        )
        assert b == {"k": [1, 2, 9]}

    def test_or_across_columns_is_unbounded(self, spark):
        assert (
            derive_prune_bounds((F.col("k") > 5) | (F.col("v") == "x"))
            == {}
        )

    def test_or_keeps_only_both_branch_columns(self, spark):
        b = derive_prune_bounds(
            ((F.col("k") > 5) & (F.col("v") == "x"))
            | (F.col("k") < 2)
        )
        # k bounded on both branches (hull unbounded-below/above ->
        # (None, None) is acceptable only if sound); v on one only
        assert "v" not in b

    def test_and_intersects(self, spark):
        b = derive_prune_bounds((F.col("k") >= 3) & (F.col("k") <= 7))
        assert b == {"k": (3, 7)}
        b = derive_prune_bounds(
            F.col("k").between(0, 10) & F.col("k").between(5, 20)
        )
        assert b == {"k": (5, 10)}

    def test_and_with_underivable_side_keeps_other(self, spark):
        b = derive_prune_bounds(
            (F.col("k") > 5) & F.col("v").startswith("x")
        )
        assert b == {"k": (5, None)}

    def test_underivable_shapes_yield_nothing(self, spark):
        for cond in (
            ~(F.col("k") > 5),
            F.col("k").isNull(),
            F.col("k").isNotNull(),
            F.col("a") == F.col("b"),
            F.col("k") == F.lit(None),
            F.length("v") > 3,
            (F.col("k") + 1) > 5,
        ):
            assert derive_prune_bounds(cond) == {}, str(cond)

    def test_compound_names_yield_nothing(self, spark):
        assert derive_prune_bounds(F.col("a.b") > 5) == {}

    def test_soundness_on_random_predicates(self, spark):
        """For assorted predicates over a concrete table: every row
        where the condition is TRUE satisfies every derived bound."""
        df = spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("m"),
            F.concat(F.lit("v"), (F.col("id") % 5)).alias("v"),
        )
        preds = [
            F.col("k").between(10, 20),
            (F.col("k") > 50) & (F.col("m") == 3),
            (F.col("k") < 5) | (F.col("k") > 95),
            F.col("v").isin("v1", "v3") & (F.col("k") >= 40),
            (F.col("m") <= 2) | ((F.col("m") >= 5) & (F.col("k") > 10)),
            ~(F.col("k") > 5) & (F.col("m") == 1),
        ]
        for cond in preds:
            bounds = derive_prune_bounds(cond)
            rows = df.filter(cond).collect()
            for r in rows:
                for col, b in bounds.items():
                    val = r[col]
                    assert val is not None, (str(cond), col)
                    if isinstance(b, list):
                        assert val in b, (str(cond), col, val)
                    else:
                        lo, hi = b
                        if lo is not None:
                            assert val >= lo, (str(cond), col, val)
                        if hi is not None:
                            assert val <= hi, (str(cond), col, val)


class TestAutoPrunedDml:
    def _table(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        for gi in range(4):
            lo = gi * 100
            df = spark.range(lo, lo + 100).select(
                F.col("id").alias("k"),
                (F.col("id") % 2 == 0).alias("even"),
                F.concat(F.lit("s"), F.col("id") % 3).alias("s"),
            )
            t.commit(df, mode="append" if gi else "overwrite")
        return t

    def test_auto_delete_matches_full_and_carries_groups(
        self, spark, tmp_path
    ):
        cond = F.col("k").between(120, 180) & (F.col("s") == "s1")
        t_auto = self._table(spark, tmp_path / "a")
        base = t_auto.latest_version()
        before = set(t_auto._load_manifest(base)["groups"])
        v = t_auto.delete_where(spark, cond, prune_where="auto")
        carried = set(t_auto._load_manifest(v)["groups"]) & before
        assert len(carried) == 3  # only the [100,200) group rewrote
        t_full = self._table(spark, tmp_path / "b")
        t_full.delete_where(spark, cond)  # unpruned ground truth
        got = sorted(r["k"] for r in t_auto.read(spark).collect())
        want = sorted(r["k"] for r in t_full.read(spark).collect())
        assert got == want

    def test_auto_update_matches_full(self, spark, tmp_path):
        cond = (F.col("k") >= 250) & (F.col("k") < 260)
        t = self._table(spark, tmp_path / "u")
        base = t.latest_version()
        before = set(t._load_manifest(base)["groups"])
        v = t.update_where(
            spark, cond, {"s": F.lit("UPDATED")}, prune_where="auto"
        )
        carried = set(t._load_manifest(v)["groups"]) & before
        assert len(carried) == 3
        got = {r["k"]: r["s"] for r in t.read(spark).collect()}
        assert all(got[k] == "UPDATED" for k in range(250, 260))
        assert got[249] != "UPDATED" and got[260] != "UPDATED"
        assert len(got) == 400

    def test_underivable_condition_full_rewrites_correctly(
        self, spark, tmp_path
    ):
        t = self._table(spark, tmp_path / "f")
        base = t.latest_version()
        before = set(t._load_manifest(base)["groups"])
        # length(s) is opaque to the planner -> full rewrite, right rows
        v = t.delete_where(
            spark,
            (F.length("s") > 1) & (F.col("k") % 100 == 7),
            prune_where="auto",
        )
        carried = set(t._load_manifest(v)["groups"]) & before
        assert carried == set()  # nothing derivable: everything rewrote
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == sorted(set(range(400)) - {7, 107, 207, 307})

    def test_auto_in_set_delete(self, spark, tmp_path):
        t = self._table(spark, tmp_path / "i")
        base = t.latest_version()
        before = set(t._load_manifest(base)["groups"])
        v = t.delete_where(
            spark, F.col("k").isin(42, 43), prune_where="auto"
        )
        carried = set(t._load_manifest(v)["groups"]) & before
        assert len(carried) == 3
        assert t.read(spark).count() == 398

    def test_bad_string_value_raises(self, spark, tmp_path):
        t = self._table(spark, tmp_path / "e")
        with pytest.raises(ValueError, match="auto"):
            t.delete_where(
                spark, F.col("k") > 5, prune_where="automatic"
            )


class TestTypedLiterals:
    """Round-9b: date / timestamp / Decimal literals reach the stats
    domain (ISO encodings) so time-partitioned DML auto-prunes — the
    most common production shape."""

    def test_date_bounds_are_iso_strings(self, spark):
        import datetime

        b = derive_prune_bounds(
            F.col("d").between(
                datetime.date(2020, 1, 10), datetime.date(2020, 2, 5)
            )
        )
        assert b == {"d": ("2020-01-10", "2020-02-05")}

    def test_timestamp_bounds_isoformat_canonical(self, spark):
        import datetime

        b = derive_prune_bounds(
            F.col("ts") >= datetime.datetime(2020, 1, 15, 10, 30, 45)
        )
        # whole seconds: NO fraction (isoformat convention), 'T' sep
        assert b == {"ts": ("2020-01-15T10:30:45", None)}
        b = derive_prune_bounds(
            F.col("ts") <= datetime.datetime(2020, 1, 15, 10, 30, 45, 500000)
        )
        assert b == {"ts": (None, "2020-01-15T10:30:45.500000")}

    def test_decimal_bounds_pass_through(self, spark):
        import decimal

        b = derive_prune_bounds(
            F.col("price") > decimal.Decimal("12.34")
        )
        assert b == {"price": (decimal.Decimal("12.34"), None)}

    def test_date_partitioned_auto_delete(self, spark, tmp_path):
        """The production shape: one group per day-range, DELETE WHERE
        a date window — only the overlapping groups rewrite."""
        import datetime

        t = VersionedTable(str(tmp_path / "t"))
        for gi in range(4):
            df = spark.range(gi * 25, gi * 25 + 25).select(
                F.col("id").alias("k"),
                F.date_add(F.lit("2020-01-01"), F.col("id").cast("int"))
                .alias("d"),
            )
            t.commit(df, mode="append" if gi else "overwrite")
        base = t.latest_version()
        before = set(t._load_manifest(base)["groups"])
        v = t.delete_where(
            spark,
            F.col("d").between(
                datetime.date(2020, 1, 31), datetime.date(2020, 2, 9)
            ),
            prune_where="auto",
        )
        carried = set(t._load_manifest(v)["groups"]) & before
        assert len(carried) == 3  # days 30-39 live in group 1 only
        got = t.read(spark).count()
        assert got == 100 - 10

    def test_timestamp_boundary_not_overpruned(self, spark, tmp_path):
        """A row at EXACTLY the whole-second bound must survive a
        >=/<= window — the mixed-encoding trap ('…:45.0' vs '…:45')
        would prune it."""
        import datetime

        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            spark.sql(
                "SELECT 1 AS k, TIMESTAMP '2020-01-15 10:30:45' AS ts"
            ),
            mode="overwrite",
        )
        t.commit(
            spark.sql(
                "SELECT 2 AS k, TIMESTAMP '2020-06-01 00:00:00' AS ts"
            ),
            mode="append",
        )
        bound = datetime.datetime(2020, 1, 15, 10, 30, 45)
        v = t.delete_where(
            spark,
            (F.col("ts") >= bound) & (F.col("ts") <= bound),
            prune_where="auto",
        )
        got = [r["k"] for r in t.read(spark, version=v).collect()]
        assert got == [2]  # the boundary row was found and deleted

    def test_timestamp_expr_read_prunes(self, spark, tmp_path):
        import datetime

        t = VersionedTable(str(tmp_path / "t"))
        for mo in (1, 2, 3):
            t.commit(
                spark.sql(
                    f"SELECT id AS k, TIMESTAMP '2020-{mo:02d}-01 00:00:00'"
                    " + make_interval(0, 0, 0, 0, 0, CAST(id AS INT), 0)"
                    " AS ts FROM range(10)"
                ),
                mode="append" if mo > 1 else "overwrite",
            )
        df = t.read(
            spark,
            where_expr=F.col("ts")
            >= datetime.datetime(2020, 3, 1),
        )
        dirs = {
            os.path.basename(os.path.dirname(f)) for f in df.inputFiles()
        }
        assert len(dirs) == 1  # only the March group scans
        assert df.count() == 10
