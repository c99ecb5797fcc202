"""Regression tests for the round-10 ADVICE findings:

1. (high) derive_prune_bounds passed raw Python str literals through,
   so a string compared against a timestamp/date column (the common
   implicit-cast predicate ``F.col('ts') < '2020-01-15 12:00:00'``)
   was compared LEXICOGRAPHICALLY against the stats domain's
   'T'-separated isoformat strings; since ' ' < 'T', same-day groups
   were wrongly pruned — silent row loss in read(where_expr=), missed
   rows in pruned DELETE/UPDATE, and missed target rows in MERGE's
   BY SOURCE sweep. Now: bound-application sites re-encode str bounds
   into the stats domain via the manifest schema
   (_normalize_prune_bounds); un-normalizable bounds are DROPPED
   (scan, never a wrong prune). Decimal columns (numeric-as-str stats)
   get the mirror fix.
2. (medium) _group_fully_contained proved containment with
   ``not _stat_lt(...)`` — _stat_lt's doubt-is-False contract is
   conservative for pruning but ANTI-conservative when negated: a NaN
   stats value or an unconvertible mixed-domain bound read as
   "provably contained", so count_where counted the group's full
   _rows. Now: proofs use _stat_le (True only on a successful
   comparison).
3. (low) _bounds_hull unioned IN-lists without checking member types,
   so ``col.isin(1,2) | col.isin('a')`` derived a mixed list whose
   min()/max() later raised TypeError inside _group_may_match at
   read/DML time. Now: the hull probes comparability and falls back to
   no-bound; _where_bounds also guards its min/max.
4. (low) merge_into's two code paths disagree on duplicate-KEY target
   rows. That divergence is now CONTRACTUAL (docstring) and pinned
   here: default clauses collapse duplicates (upsert / ON CONFLICT
   semantics); any non-default clause engages SQL-MERGE semantics
   where each duplicate target row is updated.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    _bounds_hull,
    _group_fully_contained,
    _group_may_match,
    _normalize_prune_bounds,
    _stat_le,
    _where_bounds,
    derive_prune_bounds,
    merge_into,
)


def _ts_table(spark, tmp_path, with_decimal=False):
    """Two groups split at noon 2020-01-15: morning rows (08:00-11:00)
    and afternoon rows (13:00-16:00), keyed k, one group each."""
    t = VersionedTable(str(tmp_path / "ts"))
    rows_am = [
        (k, datetime.datetime(2020, 1, 15, 8 + k), float(k))
        for k in range(4)
    ]
    rows_pm = [
        (k + 10, datetime.datetime(2020, 1, 15, 13 + k), float(k + 10))
        for k in range(4)
    ]
    schema = "k bigint, ts timestamp, x double"
    t.commit(spark.createDataFrame(rows_am, schema), mode="overwrite")
    t.commit(spark.createDataFrame(rows_pm, schema), mode="append")
    return t


class TestStrTemporalBounds:
    """ADVICE 1 (high): str-vs-temporal predicates must not prune away
    matching groups."""

    def test_read_where_expr_space_form_timestamp(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        # all afternoon rows match; the space-form literal used to
        # compare ' ' < 'T' and prune the afternoon group entirely
        got = t.read(
            spark, where_expr=F.col("ts") > "2020-01-15 12:00:00"
        )
        assert got.count() == 4
        got2 = t.read(
            spark, where_expr=F.col("ts") < "2020-01-15 12:00:00"
        )
        assert got2.count() == 4

    def test_read_where_expr_equality_space_form(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        got = t.read(
            spark, where_expr=F.col("ts") == "2020-01-15 13:00:00"
        )
        assert got.count() == 1

    def test_read_where_dict_space_form(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        got = t.read(
            spark, where={"ts": ("2020-01-15 12:00:00", None)}
        )
        assert got.count() == 4

    def test_pruned_delete_space_form(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        n = t.delete_where(
            spark,
            F.col("ts") >= "2020-01-15 12:00:00",
            prune_where="auto",
        )
        assert n is not None
        assert t.read(spark).count() == 4  # afternoon rows actually gone
        ks = {r["k"] for r in t.read(spark).collect()}
        assert ks == {0, 1, 2, 3}

    def test_pruned_update_space_form(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        t.update_where(
            spark,
            F.col("ts") > "2020-01-15 12:00:00",
            {"x": F.col("x") + 100},
            prune_where="auto",
        )
        got = {r["k"]: r["x"] for r in t.read(spark).collect()}
        for k in (10, 11, 12, 13):
            assert got[k] == pytest.approx(k + 100)
        for k in range(4):
            assert got[k] == pytest.approx(k)

    def test_merge_by_source_space_form(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        # source matches nothing; BY SOURCE delete gated on an
        # afternoon-only space-form condition must reach the afternoon
        # group (the bug pruned it → rows silently survived)
        src = spark.createDataFrame(
            [(99, datetime.datetime(2021, 1, 1), 0.0)],
            "k bigint, ts timestamp, x double",
        )
        merge_into(
            t,
            spark,
            src,
            key="k",
            when_matched=None,
            when_not_matched=None,
            when_not_matched_by_source="delete",
            not_matched_by_source_condition=(
                F.col("ts") > "2020-01-15 12:00:00"
            ),
        )
        ks = {r["k"] for r in t.read(spark).collect()}
        assert ks == {0, 1, 2, 3}

    def test_count_where_space_form_classification(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        total, detail = t.count_where(
            spark,
            where={"ts": ("2020-01-15 12:00:00", None)},
            detail=True,
        )
        assert total == 4
        # the morning group is provably disjoint, the afternoon group
        # provably contained — both answered without a scan
        assert detail == {"pruned": 1, "metadata": 1, "scanned": 0}

    def test_date_column_str_bound(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "d"))
        rows1 = [(k, datetime.date(2020, 1, 10 + k)) for k in range(3)]
        rows2 = [(k + 10, datetime.date(2020, 2, 10 + k)) for k in range(3)]
        t.commit(
            spark.createDataFrame(rows1, "k bigint, d date"),
            mode="overwrite",
        )
        t.commit(
            spark.createDataFrame(rows2, "k bigint, d date"),
            mode="append",
        )
        got = t.read(spark, where_expr=F.col("d") >= "2020-02-01")
        assert got.count() == 3

    def test_unparseable_str_bound_scans_not_prunes(self, spark, tmp_path):
        t = _ts_table(spark, tmp_path)
        # Spark's ANSI cast accepts the non-padded form, but
        # datetime.fromisoformat does NOT — the normalizer must DROP
        # the bound (scan everything), not mis-compare it
        got = t.read(spark, where_expr=F.col("ts") > "2020-1-5")
        assert got.count() == 8

    def test_normalize_decimal_str_bound(self):
        from decimal import Decimal
        from pyspark.sql.types import DecimalType

        types = {"amt": DecimalType(10, 2)}
        norm, dropped = _normalize_prune_bounds(
            {"amt": ("9.5", None)}, types
        )
        assert not dropped
        assert norm["amt"] == (Decimal("9.5"), None)
        # lexicographic '10.00' < '9.5' would wrongly prune; Decimal
        # compare keeps the group
        st = {"amt": {"min": "10.00", "max": "20.00", "nulls": 0}}
        assert _group_may_match(st, norm)

    def test_normalize_drops_zoned_literal(self):
        from pyspark.sql.types import TimestampType

        norm, dropped = _normalize_prune_bounds(
            {"ts": ("2020-01-15T12:00:00+02:00", None)},
            {"ts": TimestampType()},
        )
        assert dropped == {"ts"}
        assert "ts" not in norm


class TestFullyContainedDoubt:
    """ADVICE 2 (medium): containment proofs fail on any doubt."""

    def test_stat_le_nan(self):
        nan = float("nan")
        assert not _stat_le(nan, 1.0)
        assert not _stat_le(1.0, nan)
        assert not _stat_le("abc", 1)  # unconvertible mixed domain

    def test_nan_stats_force_scan(self):
        nan = float("nan")
        g = {
            "x": {"min": nan, "max": nan, "nulls": 0},
            "_rows": 10,
        }
        # bound x <= 5: the NaN box proves NOTHING — must not be
        # "provably contained" (the old negated _stat_lt said it was)
        assert not _group_fully_contained(g, {"x": (None, 5.0)})
        assert not _group_fully_contained(g, {"x": (0.0, None)})

    def test_mixed_domain_bound_forces_scan(self):
        g = {"x": {"min": 1, "max": 2, "nulls": 0}, "_rows": 5}
        # a str bound on an int column raises in the Decimal fallback:
        # doubt → not contained
        assert not _group_fully_contained(g, {"x": (None, "zzz")})

    def test_count_where_nan_stats_scans(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "nan"))
        t.commit(
            spark.createDataFrame(
                [(1, 1.0), (2, float("nan")), (3, 2.0)], "k bigint, x double"
            ),
            mode="overwrite",
        )
        total, detail = t.count_where(
            spark, where={"x": (0.0, 10.0)}, detail=True
        )
        # NaN fails both >= and <= in SQL, so only 2 rows match — and
        # they must come from a SCAN (non-finite stats are omitted from
        # the manifest, so containment is unprovable)
        assert total == 2
        assert detail["metadata"] == 0


class TestMixedInSetHull:
    """ADVICE 3 (low): mixed-type IN-sets never crash group matching."""

    def test_hull_mixed_types_no_bound(self):
        assert _bounds_hull([1, 2], ["a"]) == (None, None)
        assert _bounds_hull([1, 2], [3]) == [1, 2, 3]

    def test_where_bounds_mixed_list(self):
        assert _where_bounds([1, "a"]) == (None, None)

    def test_mixed_isin_or_read(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "mix"))
        t.commit(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "k bigint, v string"
            ),
            mode="overwrite",
        )
        # "2" is ANSI-castable (the predicate runs), but Python-side
        # the OR-hull is the mixed list [1, 2, '2'] whose min()/max()
        # used to raise TypeError inside _group_may_match
        cond = F.col("k").isin(1, 2) | F.col("k").isin("2")
        bounds = derive_prune_bounds(cond)
        # derivation may or may not keep a bound; applying it must not
        # raise and must not lose rows
        got = t.read(spark, where_expr=cond)
        assert got.count() == 2
        if "k" in bounds:
            assert _group_may_match(
                {"k": {"min": 1, "max": 2, "nulls": 0}}, bounds
            )


class TestMergeDuplicateTargets:
    """ADVICE 4 (low): duplicate-target-key semantics are pinned per
    path as documented."""

    def _dup_table(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "dup"))
        t.commit(
            spark.createDataFrame(
                [(1, "old1"), (2, "old2")], "k bigint, v string"
            ),
            mode="overwrite",
        )
        # a plain append legitimately duplicates key 1
        t.commit(
            spark.createDataFrame([(1, "old1b")], "k bigint, v string"),
            mode="append",
        )
        return t

    def test_default_path_collapses_duplicates(self, spark, tmp_path):
        t = self._dup_table(spark, tmp_path)
        src = spark.createDataFrame([(1, "new")], "k bigint, v string")
        merge_into(t, spark, src, key="k")
        rows = sorted(
            (r["k"], r["v"]) for r in t.read(spark).collect()
        )
        assert rows == [(1, "new"), (2, "old2")]  # upsert semantics

    def test_clause_path_updates_each_duplicate(self, spark, tmp_path):
        t = self._dup_table(spark, tmp_path)
        src = spark.createDataFrame([(1, "new")], "k bigint, v string")
        merge_into(
            t, spark, src, key="k", matched_condition=F.lit(True)
        )
        rows = sorted(
            (r["k"], r["v"]) for r in t.read(spark).collect()
        )
        # SQL MERGE: both duplicate target rows updated, both kept
        assert rows == [(1, "new"), (1, "new"), (2, "old2")]


class TestCrossTemporalDomainBounds:
    """r10 self-review: datetime bounds on DATE columns (and date
    bounds on TIMESTAMP columns) must normalize into the column's
    stats encoding — the raw isoformat would mis-order against the
    other domain's strings exactly at day boundaries."""

    def test_datetime_bound_on_date_column(self, spark, tmp_path):
        from file_stream_import_spark.io.versioned import VersionedTable

        t = VersionedTable(str(tmp_path / "d"))
        rows1 = [(k, datetime.date(2020, 1, 10 + k)) for k in range(3)]
        rows2 = [(k + 10, datetime.date(2020, 2, 1 + k)) for k in range(3)]
        t.commit(
            spark.createDataFrame(rows1, "k bigint, d date"),
            mode="overwrite",
        )
        t.commit(
            spark.createDataFrame(rows2, "k bigint, d date"),
            mode="append",
        )
        # equality-day datetime bound: the group holding 2020-02-01
        # must NOT be pruned ('2020-02-01' < '2020-02-01T00:00:00'
        # lexicographically — the bug shape)
        got = t.read(
            spark,
            where={
                "d": (
                    datetime.datetime(2020, 2, 1),
                    datetime.datetime(2020, 2, 1),
                )
            },
        )
        assert got.count() == 1

    def test_date_bound_on_timestamp_column(self, spark, tmp_path):
        from file_stream_import_spark.io.versioned import VersionedTable

        t = VersionedTable(str(tmp_path / "ts"))
        rows = [
            (1, datetime.datetime(2020, 1, 15, 0, 0)),  # midnight
            (2, datetime.datetime(2020, 1, 15, 12, 0)),
        ]
        t.commit(
            spark.createDataFrame(rows, "k bigint, ts timestamp"),
            mode="overwrite",
        )
        t.commit(
            spark.createDataFrame(
                [(3, datetime.datetime(2020, 6, 1))],
                "k bigint, ts timestamp",
            ),
            mode="append",
        )
        # upper bound = a DATE (midnight semantics): only the exact
        # midnight row matches; the group must not be pruned by the
        # prefix-sorts-first artifact
        got = t.read(
            spark, where={"ts": (None, datetime.date(2020, 1, 15))}
        )
        assert got.count() == 1
        ks = [r["k"] for r in got.collect()]
        assert ks == [1]
