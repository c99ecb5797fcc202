"""Regression tests for the round-13 ADVICE findings fixed in r14:

1. the MV zero-group sweep swallows CommitConflictError (it is
   self-healing; a raise crashed streaming batches whose MERGE had
   already committed) — operators/mv.py::_sweep_zero_groups;
2. vacuum's checkpoint trim passes the EXPIRED set and
   _compact_checkpoint re-reads the merged view itself, so a segment
   landed by a concurrent commit between vacuum's planning read and
   the compaction keeps its row — io/versioned.py::_compact_checkpoint;
3. TableChangefeedBatchReader validates endingversion at construction
   (a past-the-end version used to fail later with the misleading
   expired-by-vacuum remedy) — io/pysource.py;
4. optimize_incremental's driver-side metadata pass is linear (set
   lookups hoisted out of the comprehensions) — behavior unchanged,
   covered by tests/test_optimize_incremental.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    CommitConflictError,
    VersionedTable,
)


def _commit_rows(spark, t, rows, mode="append"):
    t.commit(
        spark.createDataFrame(rows, "k long, x long"), mode=mode
    )


class TestSweepSwallowsConflict:
    def test_conflicting_sweep_does_not_raise(self, spark):
        from file_stream_import_spark.operators.mv import (
            _sweep_zero_groups,
        )

        class _Boom:
            def delete_where(self, *a, **kw):
                raise CommitConflictError("racing refresher")

        _sweep_zero_groups(_Boom(), spark, "n_rows")  # must not raise

    def test_other_errors_still_propagate(self, spark):
        from file_stream_import_spark.operators.mv import (
            _sweep_zero_groups,
        )

        class _Boom:
            def delete_where(self, *a, **kw):
                raise RuntimeError("not a conflict")

        with pytest.raises(RuntimeError):
            _sweep_zero_groups(_Boom(), spark, "n_rows")


class TestCheckpointTrimOneRead:
    def test_concurrent_segment_row_survives_compaction(
        self, spark, tmp_path
    ):
        """The pre-fix flow materialized kept_rows from one read, then
        _compact_checkpoint re-read 'upto' from a second — a segment
        written in between lost its row while its segment file was
        unlinked. Now the drop-set filter runs inside the compaction's
        own read: simulate the race by landing a 'concurrent' commit
        (and its segment) AFTER the planner computed its expired set,
        then compacting with that stale set."""
        t = VersionedTable(str(tmp_path / "t"))
        _commit_rows(spark, t, [(1, 1)], mode="overwrite")  # v0
        _commit_rows(spark, t, [(2, 2)])                    # v1
        _commit_rows(spark, t, [(3, 3)])                    # v2
        t._extend_checkpoint(2)
        stale_expired = {0}  # the planner's view, before the race
        _commit_rows(spark, t, [(4, 4)])                    # v3 races in
        t._extend_checkpoint(3)
        t._compact_checkpoint(drop=stale_expired)
        ck = t._read_checkpoint()
        vers = {int(r["version"]) for r in ck["rows"]}
        assert 0 not in vers, "expired row must be dropped"
        assert vers == {1, 2, 3}, (
            "the concurrent commit's row must survive the compaction"
        )
        assert int(ck["upto"]) == 3

    def test_vacuum_trim_matches_retained_set(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "tv"))
        _commit_rows(spark, t, [(1, 1)], mode="overwrite")
        for i in range(2, 6):
            _commit_rows(spark, t, [(i, i)])
        t._extend_checkpoint(t.latest_version())
        t.vacuum(keep_versions=2, min_age_seconds=0)
        ck = t._read_checkpoint()
        vers = {int(r["version"]) for r in ck["rows"]}
        assert vers == set(t.versions())
        # history() serves entirely from the checkpoint (no manifest
        # backfill hole — the perf regression the advice described)
        hist = t.history()
        assert [int(r["version"]) for r in hist] == t.versions()


class TestBatchCdfEndingVersionValidation:
    def test_past_the_end_version_fails_loudly(self, spark, tmp_path):
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )

        t = VersionedTable(str(tmp_path / "cf"))
        _commit_rows(spark, t, [(1, 1)], mode="overwrite")  # v0
        _commit_rows(spark, t, [(2, 2)])                    # v1
        spark.dataSource.register(TableChangefeedDataSource)
        with pytest.raises(Exception, match=r"does not exist.*latest"):
            (
                spark.read.format("table_changefeed")
                .option("path", t.path)
                .option("readchangedata", "true")
                .option("key", "k")
                .option("endingversion", "99")
                .load()
                .collect()
            )

    def test_valid_and_latest_still_work(self, spark, tmp_path):
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )

        t = VersionedTable(str(tmp_path / "cf2"))
        _commit_rows(spark, t, [(1, 1)], mode="overwrite")
        _commit_rows(spark, t, [(2, 2)])
        spark.dataSource.register(TableChangefeedDataSource)
        for ev in ("1", "latest"):
            got = (
                spark.read.format("table_changefeed")
                .option("path", t.path)
                .option("readchangedata", "true")
                .option("key", "k")
                .option("endingversion", ev)
                .load()
                .count()
            )
            assert got == 2
