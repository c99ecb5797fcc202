"""CDC replication over the streaming CDF (r12): make_cdf_replicator
consumes a readchangedata changefeed and keeps a REPLICA versioned
table converged with the source — through appends, merges, CoW
deletes, overwrites, rollbacks, rewrite publishes, and compactions —
with exactly-once batch application. Plus the metamorphic check tying
the two CDF implementations together: the STREAM's rows must equal the
BATCH table_changes_rows' rows for the same history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    make_cdf_replicator,
    merge_into,
    table_changes_rows,
)


def _mk(spark, tmp_path, rows, name="src"):
    t = VersionedTable(str(tmp_path / name))
    t.commit(
        spark.createDataFrame(rows, "k long, v long"), mode="overwrite"
    )
    return t


def _replicate(spark, src, tmp_path, name="rep"):
    from file_stream_import_spark.io.pysource import (
        TableChangefeedDataSource,
    )

    spark.dataSource.register(TableChangefeedDataSource)
    rep = VersionedTable(str(tmp_path / name))
    q = (
        spark.readStream.format("table_changefeed")
        .option("path", src.path)
        .option("readchangedata", "true")
        .option("key", "k")
        .option("maxversionspertrigger", "1")
        .load()
        .writeStream.foreachBatch(
            make_cdf_replicator(rep, "repl", key="k")
        )
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return rep


def _rows(spark, t):
    return sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    )


class TestReplication:
    def test_replica_converges_through_all_dml(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10), (2, 20), (3, 30)])
        t.commit(
            spark.createDataFrame([(4, 40)], "k long, v long"),
            mode="append",
        )
        merge_into(
            t, spark,
            spark.createDataFrame([(2, 99), (5, 50)], "k long, v long"),
            key="k",
        )
        t.delete_where(spark, F.col("k") == 1)
        t.compact(spark, min_bytes=1 << 30)
        rep = _replicate(spark, t, tmp_path)
        assert _rows(spark, rep) == _rows(spark, t)
        assert _rows(spark, rep) == [(2, 99), (3, 30), (4, 40), (5, 50)]

    def test_replica_through_rewrite_publish(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10), (2, 20), (3, 30)])
        b = t.create_branch("audit")
        b.delete_where(spark, F.col("k") < 3)
        b.commit(
            spark.createDataFrame([(7, 70)], "k long, v long"),
            mode="append",
        )
        t.publish_branch("audit")
        rep = _replicate(spark, t, tmp_path)
        assert _rows(spark, rep) == _rows(spark, t) == [(3, 30), (7, 70)]

    def test_replica_through_rollback(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10)])
        t.commit(
            spark.createDataFrame([(2, 20)], "k long, v long"),
            mode="append",
        )
        t.rollback(0)
        rep = _replicate(spark, t, tmp_path)
        assert _rows(spark, rep) == _rows(spark, t) == [(1, 10)]

    def test_catchup_batch_resolves_last_writer_wins(
        self, spark, tmp_path
    ):
        """One UNBOUNDED batch spanning commits that insert, update,
        then delete the same key: the replicator's _commit_version
        sequence must resolve to the newest state per key."""
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )

        spark.dataSource.register(TableChangefeedDataSource)
        t = _mk(spark, tmp_path, [(1, 10), (2, 20)])
        merge_into(
            t, spark,
            spark.createDataFrame([(1, 11)], "k long, v long"),
            key="k",
        )
        t.delete_where(spark, F.col("k") == 2)
        rep = VersionedTable(str(tmp_path / "rep"))
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()  # no trigger bound: ONE catch-up batch
            .writeStream.foreachBatch(
                make_cdf_replicator(rep, "repl", key="k")
            )
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert _rows(spark, rep) == _rows(spark, t) == [(1, 11)]

    def test_exactly_once_replay(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10)])
        rep = VersionedTable(str(tmp_path / "rep"))
        w = make_cdf_replicator(rep, "repl", key="k")
        batch = spark.createDataFrame(
            [(1, 10, "insert", 0)],
            "k long, v long, _change_type string, _commit_version int",
        )
        w(batch, 0)
        v = rep.latest_version()
        w(batch, 0)  # replayed delivery of the same epoch
        assert rep.latest_version() == v
        assert _rows(spark, rep) == [(1, 10)]


class TestStreamMatchesBatchCdf:
    def test_stream_rows_equal_table_changes_rows(self, spark, tmp_path):
        """Metamorphic tie between the two CDF implementations: the
        pyarrow stream kernel and the Spark batch table_changes_rows
        must describe the same history identically (per version, per
        key, per change type, with matching payloads)."""
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )

        spark.dataSource.register(TableChangefeedDataSource)
        t = _mk(spark, tmp_path, [(1, 10), (2, 20), (3, 30)])
        t.commit(
            spark.createDataFrame([(4, 40)], "k long, v long"),
            mode="append",
        )
        merge_into(
            t, spark,
            spark.createDataFrame([(2, 99), (5, 50)], "k long, v long"),
            key="k",
        )
        t.delete_where(spark, F.col("k").isin(1, 4))
        t.commit(
            spark.createDataFrame([(9, 90)], "k long, v long"),
            mode="overwrite",
        )

        got = []
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: got.extend(
                    (
                        r["_commit_version"],
                        r["k"],
                        r["_change_type"],
                        r["v"],
                    )
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckm"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        want = []
        for r in table_changes_rows(t, spark, 0, key="k").collect():
            v, k, c = r["_commit_version"], r["k"], r["_change_type"]
            if c == "I":
                want.append((v, k, "insert", r["new"]["v"]))
            elif c == "D":
                want.append((v, k, "delete", r["old"]["v"]))
            else:
                want.append((v, k, "update_preimage", r["old"]["v"]))
                want.append((v, k, "update_postimage", r["new"]["v"]))
        assert sorted(got) == sorted(want)


# -- replication convergence fuzz -------------------------------------
#
# The capstone property of the r12 CDC loop: for ANY key-unique DML
# history (upserts, merge-deletes, CoW range deletes, overwrites,
# rollbacks, compactions), a readchangedata stream driven through
# make_cdf_replicator converges the replica to EXACTLY the source's
# final state — and to the pure-Python model of the same ops. Each
# surface in the chain (append planning, the pyarrow diff kernel,
# last-writer-wins changelog resolution, idempotent apply_changes) has
# its own tests; this exercises their COMPOSITION over random
# interleavings, with bounded triggers so catch-up batches split at
# arbitrary commit boundaries.

import os as _os
import uuid as _uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FUZZ_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "5"))
_FUZZ_DERANDOMIZE = "SPARK_GRAFT_FUZZ_EXAMPLES" not in _os.environ

_rows_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(-50, 50)),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],
)
_op_st = st.one_of(
    st.tuples(st.just("merge"), _rows_st),
    st.tuples(st.just("merge_del"), _rows_st),
    st.tuples(
        st.just("delete"), st.integers(0, 12), st.integers(0, 12)
    ),
    st.tuples(st.just("overwrite"), _rows_st),
    st.just(("compact",)),
    st.tuples(st.just("rollback"), st.integers(0, 30)),
    # r13: a rename CYCLE (v -> v_tmp -> v) injects two rename commits
    # into the replayed range while leaving the net schema unchanged,
    # so every other op's frame shape stays valid — the replica must
    # converge through the rename-chain routing (_resolved_map fold)
    st.just(("rename_cycle",)),
)


def _model_apply(state: dict, op: tuple) -> dict:
    kind = op[0]
    if kind == "merge":
        out = dict(state)
        out.update(op[1])
        return out
    if kind == "merge_del":
        return {k: v for k, v in state.items() if k not in dict(op[1])}
    if kind == "delete":
        lo, hi = sorted((op[1], op[2]))
        return {k: v for k, v in state.items() if not lo <= k <= hi}
    if kind == "overwrite":
        return dict(op[1])
    return state  # compact: no logical change (rollback handled inline)


class TestReplicationConvergenceFuzz:
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
    @given(
        init=_rows_st,
        ops=st.lists(_op_st, min_size=1, max_size=5),
        per_trigger=st.integers(1, 3),
    )
    def test_replica_converges_for_random_histories(
        self, spark, tmp_path_factory, init, ops, per_trigger
    ):
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )
        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            apply_changes,
        )

        spark.dataSource.register(TableChangefeedDataSource)
        base = tmp_path_factory.mktemp("cdf_fuzz")
        t = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        t.commit(
            spark.createDataFrame(init, "k long, v long"),
            mode="overwrite",
        )
        model = dict(init)
        # model state per COMMITTED version (ops may no-op-commit:
        # compacting one group, deleting an empty range) — rollback
        # targets resolve through this map, never op indexes
        states = {t.latest_version(): dict(model)}
        for op in ops:
            kind = op[0]
            if kind == "merge":
                merge_into(
                    t, spark,
                    spark.createDataFrame(op[1], "k long, v long"),
                    key="k",
                )
            elif kind == "merge_del":
                merge_into(
                    t, spark,
                    spark.createDataFrame(op[1], "k long, v long"),
                    key="k",
                    when_matched="delete",
                    when_not_matched=None,
                )
            elif kind == "delete":
                lo, hi = sorted((op[1], op[2]))
                t.delete_where(spark, F.col("k").between(lo, hi))
            elif kind == "overwrite":
                t.commit(
                    spark.createDataFrame(op[1], "k long, v long"),
                    mode="overwrite",
                )
            elif kind == "compact":
                t.compact(spark, min_bytes=1 << 30)
            elif kind == "rename_cycle":
                t.rename_column("v", "v_tmp")
                t.rename_column("v_tmp", "v")
            if kind == "rollback":
                # target only MODEL-TRACKED versions (post-op states):
                # a mid-rename-cycle version is a legal engine target
                # but carries the transient column name the other ops'
                # frames don't speak
                targets = sorted(states)
                target = targets[op[1] % len(targets)]
                t.rollback(target)
                model = dict(states[target])
            else:
                model = _model_apply(model, op)
            states[t.latest_version()] = dict(model)

        rep = VersionedTable(f"{base}/{_uuid.uuid4().hex}")
        w = make_cdf_replicator(rep, "fz", key="k")
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .option("maxversionspertrigger", str(per_trigger))
            .load()
            .writeStream.foreachBatch(w)
            .option(
                "checkpointLocation", f"{base}/ck_{_uuid.uuid4().hex}"
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = _rows(spark, rep)
        src = _rows(spark, t)
        want = sorted(model.items())
        assert src == want, f"source diverged from model: {ops}"
        assert got == want, (
            f"replica diverged after {ops} "
            f"(per_trigger={per_trigger}): replica={got} model={want}"
        )


class TestBatchCdfFlatShape:
    def test_table_changes_cdf_equals_stream_rows(self, spark, tmp_path):
        """table_changes_cdf is the batch twin of readchangedata: for
        the same history, same flat rows (the executor-parallel path
        for backfills too large for the stream's per-rewrite task)."""
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )
        from file_stream_import_spark.io.versioned import (
            table_changes_cdf,
        )

        spark.dataSource.register(TableChangefeedDataSource)
        t = _mk(spark, tmp_path, [(1, 10), (2, 20), (3, 30)])
        merge_into(
            t, spark,
            spark.createDataFrame([(2, 99), (5, 50)], "k long, v long"),
            key="k",
        )
        t.delete_where(spark, F.col("k") == 1)
        got_stream = []
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: got_stream.extend(
                    (r["_commit_version"], r["k"], r["_change_type"],
                     r["v"])
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckf"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got_batch = [
            (r["_commit_version"], r["k"], r["_change_type"], r["v"])
            for r in table_changes_cdf(t, spark, 0, key="k").collect()
        ]
        # version 0 is emitted by the stream as plain inserts and by
        # the batch path as from_version=0 inserts — identical
        assert sorted(got_batch) == sorted(got_stream)
        assert got_batch  # non-trivial: inserts + update pair + delete

    def test_timestamp_bounds(self, spark, tmp_path):
        import time

        from file_stream_import_spark.io.versioned import (
            table_changes_cdf,
        )

        t = _mk(spark, tmp_path, [(1, 10)])
        time.sleep(0.05)
        cut = time.time()
        time.sleep(0.05)
        t.delete_where(spark, F.col("k") == 1)
        got = [
            (r["k"], r["_change_type"])
            for r in table_changes_cdf(
                t, spark, from_timestamp=cut, key="k"
            ).collect()
        ]
        assert got == [(1, "delete")]
        with pytest.raises(ValueError, match="not both"):
            table_changes_cdf(
                t, spark, from_version=0, from_timestamp=cut
            )
