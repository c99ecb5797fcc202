"""Incremental materialized-view maintenance (r13,
operators/mv.py::refresh_mv): an aggregate MV refreshed O(delta) from
the source's CDF — bootstrap once, then signed grouped deltas MERGEd
in, watermark atomic in the txn map. The invariant every test drives:
after refresh, the MV equals a FULL recompute of the source — through
every DML kind, group-membership moves, vanishing groups, replays, and
random histories."""

from __future__ import annotations

import os as _os
import uuid as _uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    merge_into,
)
from file_stream_import_spark.operators.mv import refresh_mv


def _mk(spark, tmp_path, rows, name="src"):
    t = VersionedTable(str(tmp_path / name))
    t.commit(
        spark.createDataFrame(rows, "k long, g string, x long"),
        mode="overwrite",
    )
    return t


def _mv(tmp_path, name="mv"):
    return VersionedTable(str(tmp_path / name))


def _refresh(src, mv, spark):
    return refresh_mv(
        src, mv, spark,
        name="t", group_cols=["g"], sum_cols=["x"], key="k",
    )


def _state(spark, t):
    return sorted(
        (r["g"], r["n_rows"], r["x"])
        for r in t.read(spark).collect()
    )


def _recompute(spark, src):
    return sorted(
        (r["g"], r["n"], r["x"])
        for r in src.read(spark)
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(F.sum("x"), F.lit(0)).cast("bigint").alias("x"),
        )
        .collect()
    )


class TestRefreshMv:
    def test_bootstrap_equals_full_aggregate(self, spark, tmp_path):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        )
        mv = _mv(tmp_path)
        assert _refresh(src, mv, spark) == 0
        assert _state(spark, mv) == [("a", 2, 30), ("b", 1, 5)]

    def test_incremental_through_each_dml_kind(self, spark, tmp_path):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        )
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        # append
        src.commit(
            spark.createDataFrame(
                [(4, "b", 7)], "k long, g string, x long"
            ),
            mode="append",
        )
        # merge update (same group)
        merge_into(
            src, spark,
            spark.createDataFrame(
                [(1, "a", 99)], "k long, g string, x long"
            ),
            key="k",
        )
        # CoW delete
        src.delete_where(spark, F.col("k") == 2)
        v = _refresh(src, mv, spark)
        assert v == src.latest_version()
        assert _state(spark, mv) == _recompute(spark, src)

    def test_update_moves_row_between_groups(self, spark, tmp_path):
        src = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        merge_into(
            src, spark,
            spark.createDataFrame(
                [(1, "b", 10)], "k long, g string, x long"
            ),
            key="k",
        )
        _refresh(src, mv, spark)
        assert _state(spark, mv) == [("b", 2, 30)] == _recompute(
            spark, src
        )

    def test_vanished_group_row_is_swept(self, spark, tmp_path):
        src = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        src.delete_where(spark, F.col("g") == "a")
        _refresh(src, mv, spark)
        assert _state(spark, mv) == [("b", 1, 20)]

    def test_noop_and_replay_protection(self, spark, tmp_path):
        src = _mk(spark, tmp_path, [(1, "a", 10)])
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        before = mv.latest_version()
        # converged: no new MV version, watermark returned
        assert _refresh(src, mv, spark) == src.latest_version()
        assert mv.latest_version() == before
        # advance the source once; refresh twice — the delta applies
        # exactly once
        src.commit(
            spark.createDataFrame(
                [(2, "a", 5)], "k long, g string, x long"
            ),
            mode="append",
        )
        _refresh(src, mv, spark)
        _refresh(src, mv, spark)
        assert _state(spark, mv) == [("a", 2, 15)]

    def test_rollback_rebuild_via_recreate(self, spark, tmp_path):
        """A source ROLLBACK is replayed by the CDF as the exact revert
        delta, so the MV converges through it like any other commit."""
        src = _mk(spark, tmp_path, [(1, "a", 10)])
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        src.commit(
            spark.createDataFrame(
                [(2, "b", 7)], "k long, g string, x long"
            ),
            mode="append",
        )
        _refresh(src, mv, spark)
        src.rollback(0)
        _refresh(src, mv, spark)
        assert _state(spark, mv) == [("a", 1, 10)] == _recompute(
            spark, src
        )

    def test_refresh_through_rename_of_sum_col(self, spark, tmp_path):
        """A rename of the SUM column between refreshes: the CDF range
        folds the chain, so the delta surfaces under the END name —
        rename the MV's column in lockstep (metadata-only on both
        sides) and refresh with the new name."""
        src = _mk(spark, tmp_path, [(1, "a", 10)])
        mv = _mv(tmp_path)
        _refresh(src, mv, spark)
        src.rename_column("x", "y")
        mv.rename_column("x", "y")
        src.commit(
            spark.createDataFrame(
                [(2, "a", 5)], "k long, g string, y long"
            ),
            mode="append",
        )
        refresh_mv(
            src, mv, spark,
            name="t", group_cols=["g"], sum_cols=["y"], key="k",
        )
        got = sorted(
            (r["g"], r["n_rows"], r["y"])
            for r in mv.read(spark).collect()
        )
        assert got == [("a", 2, 15)]


_FUZZ_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "5"))
_FUZZ_DERANDOMIZE = "SPARK_GRAFT_FUZZ_EXAMPLES" not in _os.environ

_rows_st = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.sampled_from(["a", "b", "c"]),
        st.integers(-20, 20),
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],
)
_op_st = st.one_of(
    st.tuples(st.just("merge"), _rows_st),
    st.tuples(st.just("delete"), st.integers(0, 9), st.integers(0, 9)),
    st.tuples(st.just("append"), _rows_st),
    st.tuples(st.just("refresh"), st.just(None)),
)


class TestMvConvergenceFuzz:
    @settings(
        max_examples=_FUZZ_EXAMPLES,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
            HealthCheck.data_too_large,
        ],
        derandomize=_FUZZ_DERANDOMIZE,
    )
    @given(init=_rows_st, ops=st.lists(_op_st, min_size=1, max_size=5))
    def test_mv_equals_recompute_for_random_histories(
        self, spark, tmp_path_factory, init, ops
    ):
        base = tmp_path_factory.mktemp("mv_fuzz")
        src = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        seen = set()
        init = [r for r in init if r[0] not in seen]
        src.commit(
            spark.createDataFrame(init, "k long, g string, x long"),
            mode="overwrite",
        )
        mv = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        _refresh(src, mv, spark)
        for op in ops:
            kind = op[0]
            if kind == "merge":
                # appends new keys too: keys must stay unique, which
                # merge guarantees by construction
                merge_into(
                    src, spark,
                    spark.createDataFrame(
                        op[1], "k long, g string, x long"
                    ),
                    key="k",
                )
            elif kind == "delete":
                lo, hi = sorted((op[1], op[2]))
                src.delete_where(spark, F.col("k").between(lo, hi))
            elif kind == "append":
                # only keys not already present (append must keep the
                # CDF key-unique contract)
                have = {
                    r["k"] for r in src.read(spark).select("k").collect()
                }
                fresh = [r for r in op[1] if r[0] not in have]
                if not fresh:
                    continue
                src.commit(
                    spark.createDataFrame(
                        fresh, "k long, g string, x long"
                    ),
                    mode="append",
                )
            else:
                _refresh(src, mv, spark)
        _refresh(src, mv, spark)
        assert _state(spark, mv) == _recompute(spark, src), (
            f"MV diverged from recompute after {ops}"
        )


def _refresh_mm(src, mv, spark):
    return refresh_mv(
        src, mv, spark,
        name="t", group_cols=["g"], sum_cols=["x"], key="k",
        min_cols=["x"], max_cols=["x"],
    )


def _state_mm(spark, t):
    return sorted(
        (r["g"], r["n_rows"], r["x"], r["x_min"], r["x_max"])
        for r in t.read(spark).collect()
    )


def _recompute_mm(spark, src):
    return sorted(
        (r["g"], r["n"], r["x"], r["x_min"], r["x_max"])
        for r in src.read(spark)
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.coalesce(F.sum("x"), F.lit(0)).cast("bigint").alias("x"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
        )
        .collect()
    )


class TestRefreshMvMinMax:
    """r13 (continued): MIN/MAX in the incremental MV — LEAST/GREATEST
    folding on inserts, exact recompute ONLY for groups whose stored
    extreme was touched by a delete (the endangered set)."""

    def test_bootstrap_carries_extremes(self, spark, tmp_path):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        )
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == [
            ("a", 2, 30, 10, 20), ("b", 1, 5, 5, 5)
        ]

    def test_insert_folds_without_source_scan(
        self, spark, tmp_path, monkeypatch
    ):
        src = _mk(spark, tmp_path, [(1, "a", 10), (2, "a", 20)])
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        src.commit(
            spark.createDataFrame(
                [(3, "a", 3), (4, "b", 40)], "k long, g string, x long"
            ),
            mode="append",
        )
        reads = {"n": 0}
        orig = VersionedTable.read

        def counting(self, *a, **kw):
            if self.path == src.path:
                reads["n"] += 1
            return orig(self, *a, **kw)

        monkeypatch.setattr(VersionedTable, "read", counting)
        _refresh_mm(src, mv, spark)
        # append-only delta: nothing endangered, the source snapshot
        # is never rescanned (the CDF walk reads group files directly)
        assert reads["n"] == 0
        assert _state_mm(spark, mv) == [
            ("a", 3, 33, 3, 20), ("b", 1, 40, 40, 40)
        ] == _recompute_mm(spark, src)

    def test_delete_of_extreme_triggers_exact_recompute(
        self, spark, tmp_path
    ):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 10), (2, "a", 20), (3, "a", 15)],
        )
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        src.delete_where(spark, F.col("k") == 1)  # removes min=10
        src.delete_where(spark, F.col("k") == 2)  # removes max=20
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == [
            ("a", 1, 15, 15, 15)
        ] == _recompute_mm(spark, src)

    def test_delete_of_non_extreme_keeps_stored_value(
        self, spark, tmp_path, monkeypatch
    ):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 10), (2, "a", 20), (3, "a", 15)],
        )
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        src.delete_where(spark, F.col("k") == 3)  # 15: not an extreme
        reads = {"n": 0}
        orig = VersionedTable.read

        def counting(self, *a, **kw):
            if self.path == src.path:
                reads["n"] += 1
            return orig(self, *a, **kw)

        monkeypatch.setattr(VersionedTable, "read", counting)
        _refresh_mm(src, mv, spark)
        assert reads["n"] == 0  # interior delete: not endangered
        assert _state_mm(spark, mv) == [
            ("a", 2, 30, 10, 20)
        ] == _recompute_mm(spark, src)

    def test_insert_then_delete_same_window_new_group(
        self, spark, tmp_path
    ):
        src = _mk(spark, tmp_path, [(1, "a", 10)])
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        # one refresh window: new group 'b' gains 5 and 9, loses the 5
        src.commit(
            spark.createDataFrame(
                [(2, "b", 5), (3, "b", 9)], "k long, g string, x long"
            ),
            mode="append",
        )
        src.delete_where(spark, F.col("k") == 2)
        _refresh_mm(src, mv, spark)
        # a naive insert-side fold would keep min=5; the new-group-
        # with-deletes endangerment recomputes it to 9
        assert _state_mm(spark, mv) == [
            ("a", 1, 10, 10, 10), ("b", 1, 9, 9, 9)
        ] == _recompute_mm(spark, src)

    def test_update_moves_extreme_between_groups(self, spark, tmp_path):
        src = _mk(
            spark, tmp_path,
            [(1, "a", 1), (2, "a", 20), (3, "b", 50)],
        )
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        # k=1 (a's min) moves to b, where it becomes b's new min
        merge_into(
            src, spark,
            spark.createDataFrame(
                [(1, "b", 1)], "k long, g string, x long"
            ),
            key="k",
        )
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == [
            ("a", 1, 20, 20, 20), ("b", 2, 51, 1, 50)
        ] == _recompute_mm(spark, src)

    def test_null_values_are_transparent(self, spark, tmp_path):
        src = _mk(spark, tmp_path, [(1, "a", 10), (2, "a", None)])
        mv = _mv(tmp_path)
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == [("a", 2, 10, 10, 10)]
        # deleting the NULL row endangers nothing and changes no extreme
        src.delete_where(spark, F.col("k") == 2)
        # inserting a NULL changes no extreme either
        src.commit(
            spark.createDataFrame(
                [(3, "a", None)], "k long, g string, x long"
            ),
            mode="append",
        )
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == [
            ("a", 2, 10, 10, 10)
        ] == _recompute_mm(spark, src)

    def test_validation_rejects_collisions(self, spark, tmp_path):
        src = _mk(spark, tmp_path, [(1, "a", 10)])
        mv = _mv(tmp_path)
        with pytest.raises(ValueError, match="group column"):
            refresh_mv(
                src, mv, spark, name="t", group_cols=["g"],
                sum_cols=["x"], key="k", min_cols=["g"],
            )

    @settings(
        max_examples=_FUZZ_EXAMPLES,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
            HealthCheck.data_too_large,
        ],
        derandomize=_FUZZ_DERANDOMIZE,
    )
    @given(init=_rows_st, ops=st.lists(_op_st, min_size=1, max_size=5))
    def test_minmax_mv_equals_recompute_for_random_histories(
        self, spark, tmp_path_factory, init, ops
    ):
        base = tmp_path_factory.mktemp("mv_mm_fuzz")
        src = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        seen = set()
        init = [r for r in init if r[0] not in seen]
        src.commit(
            spark.createDataFrame(init, "k long, g string, x long"),
            mode="overwrite",
        )
        mv = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        _refresh_mm(src, mv, spark)
        for op in ops:
            kind = op[0]
            if kind == "merge":
                merge_into(
                    src, spark,
                    spark.createDataFrame(
                        op[1], "k long, g string, x long"
                    ),
                    key="k",
                )
            elif kind == "delete":
                lo, hi = sorted((op[1], op[2]))
                src.delete_where(spark, F.col("k").between(lo, hi))
            elif kind == "append":
                have = {
                    r["k"] for r in src.read(spark).select("k").collect()
                }
                fresh = [r for r in op[1] if r[0] not in have]
                if not fresh:
                    continue
                src.commit(
                    spark.createDataFrame(
                        fresh, "k long, g string, x long"
                    ),
                    mode="append",
                )
            else:
                _refresh_mm(src, mv, spark)
        _refresh_mm(src, mv, spark)
        assert _state_mm(spark, mv) == _recompute_mm(spark, src), (
            f"MIN/MAX MV diverged from recompute after {ops}"
        )
