"""Regression tests for the round-13 ADVICE findings:

1. (high) publish_branch duplicated staged rows when the same branch
   was published twice (retry, concurrent publishers, or
   append-then-republish): the rebase path computed ``branch_added``
   only against the FORK, so groups already landed on main by this
   branch's own prior publish were re-appended to the new manifest —
   rows doubled, the manifest carried duplicate group entries, and the
   changefeed re-emitted them. Now: groups already present on main are
   excluded (group relpaths are immutable uuids, so membership is
   identity) and a publish with nothing new left is an idempotent
   no-op that mints no main version.
2. (low) _cdf_diff_arrow loaded manifest v-1 unguarded: a
   vacuum-expired parent of a diffed rewrite surfaced as a bare
   FileNotFoundError from an executor task instead of the documented
   'restart from a fresh checkpoint' ValueError the callers raise for
   v itself. Now: both loads share the vacuum-remedy ValueError.
3. (low) table_changes_cdf reordered output columns (keys hoisted in
   front of the payload), so with a non-leading key the batch shape
   diverged from the stream CDF's column order (declared schema order
   + meta), breaking flat-shape symmetry for positional consumers.
   Now: columns follow the declared schema's field order, keys in
   place, then _change_type + _commit_version.
4. (low) null_safe_eq treated NaN != NaN (NaN is a VALUE, not a null,
   under arrow dtypes — the both-null term missed it), so unchanged
   rows whose float payload held NaN emitted spurious
   update_preimage/update_postimage pairs on every rewrite of their
   group — a pure compaction no longer diffed to zero rows. Now: a
   both-NaN term joins the equality.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.pysource import _cdf_diff_arrow
from file_stream_import_spark.io.versioned import (
    VersionedTable,
    _schema_from_json,
    merge_into,
    table_changes_cdf,
)


def _mk(spark, tmp_path, rows, schema="k long, v long", name="t"):
    t = VersionedTable(str(tmp_path / name))
    t.commit(spark.createDataFrame(rows, schema), mode="overwrite")
    return t


def _df(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema)


def _declared(t):
    return _schema_from_json(
        t._load_manifest(t.latest_version())["schema"]
    )


class TestPublishBranchIdempotent:
    def test_republish_same_head_is_noop(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(i, i) for i in range(15)])
        b = t.create_branch("stage")
        b.commit(_df(spark, [(100, 1), (101, 2)]), mode="append")
        pv = t.publish_branch("stage")
        assert t.read(spark).count() == 17
        # the retry (same branch, same head): no new main version, no
        # duplicated rows, no changefeed re-emission
        pv2 = t.publish_branch("stage")
        assert pv2 == pv
        assert t.latest_version() == pv
        assert t.read(spark).count() == 17
        m = t._load_manifest(pv)
        assert len(m["groups"]) == len(set(m["groups"]))

    def test_append_then_republish_adds_only_new(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10), (2, 20)])
        b = t.create_branch("stage")
        b.commit(_df(spark, [(3, 30)]), mode="append")
        pv1 = t.publish_branch("stage")
        b.commit(_df(spark, [(4, 40)]), mode="append")
        pv2 = t.publish_branch("stage")
        assert pv2 == pv1 + 1
        got = sorted(
            (r["k"], r["v"]) for r in t.read(spark).collect()
        )
        assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]
        m = t._load_manifest(pv2)
        assert len(m["groups"]) == len(set(m["groups"]))
        # the second publish's delta is exactly the new staged group
        assert len(m["added"]) == 1

    def test_republish_over_interim_main_append(self, spark, tmp_path):
        """Publish, main ingests meanwhile, branch stages more, publish
        again: the second rebase must skip the already-published group
        but still land the new one over main's interim append."""
        t = _mk(spark, tmp_path, [(1, 10)])
        b = t.create_branch("stage")
        b.commit(_df(spark, [(2, 20)]), mode="append")
        t.publish_branch("stage")
        t.commit(_df(spark, [(3, 30)]), mode="append")
        b.commit(_df(spark, [(4, 40)]), mode="append")
        pv = t.publish_branch("stage")
        got = sorted(
            (r["k"], r["v"]) for r in t.read(spark).collect()
        )
        assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]
        m = t._load_manifest(pv)
        assert len(m["groups"]) == len(set(m["groups"]))

    def test_noop_republish_after_interim_append(self, spark, tmp_path):
        """Nothing new staged, main appended since the first publish:
        still an idempotent no-op, not a duplicate re-append."""
        t = _mk(spark, tmp_path, [(1, 10)])
        b = t.create_branch("stage")
        b.commit(_df(spark, [(2, 20)]), mode="append")
        t.publish_branch("stage")
        t.commit(_df(spark, [(3, 30)]), mode="append")
        head = t.latest_version()
        assert t.publish_branch("stage") == head
        assert t.latest_version() == head
        assert t.read(spark).count() == 3


class TestCdfVacuumExpiredParent:
    def test_expired_parent_raises_remedy(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10), (2, 20)])
        merge_into(
            t, spark, _df(spark, [(2, 99)]), key="k"
        )
        v = t.latest_version()
        t.vacuum(keep_versions=1, min_age_seconds=0)
        with pytest.raises(ValueError, match="vacuum"):
            _cdf_diff_arrow(t.path, None, v, ["k"], _declared(t))

    def test_retained_pair_still_diffs(self, spark, tmp_path):
        t = _mk(spark, tmp_path, [(1, 10), (2, 20)])
        merge_into(t, spark, _df(spark, [(2, 99)]), key="k")
        v = t.latest_version()
        at = _cdf_diff_arrow(t.path, None, v, ["k"], _declared(t))
        assert sorted(
            (r["k"], r["_change_type"]) for r in at.to_pylist()
        ) == [(2, "update_postimage"), (2, "update_preimage")]


class TestBatchCdfColumnOrder:
    def test_non_leading_key_keeps_schema_order(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            [(10.0, 1, "a"), (20.0, 2, "b")],
            schema="v double, k long, s string",
        )
        merge_into(
            t, spark,
            _df(spark, [(99.0, 2, "b2")], "v double, k long, s string"),
            key="k",
        )
        d = table_changes_cdf(t, spark, 0, key="k")
        assert d.columns == [
            "v", "k", "s", "_change_type", "_commit_version"
        ]

    def test_matches_stream_cdf_shape(self, spark, tmp_path):
        from file_stream_import_spark.io.pysource import (
            TableChangefeedDataSource,
        )

        spark.dataSource.register(TableChangefeedDataSource)
        t = _mk(
            spark, tmp_path,
            [(10.0, 1)],
            schema="v double, k long",
        )
        t.delete_where(spark, F.col("k") == 1)
        stream_cols: list[list[str]] = []
        q = (
            spark.readStream.format("table_changefeed")
            .option("path", t.path)
            .option("readchangedata", "true")
            .option("key", "k")
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: stream_cols.append(df.columns)
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        batch_cols = table_changes_cdf(t, spark, 0, key="k").columns
        assert stream_cols and stream_cols[0] == batch_cols


class TestCdfNanPayload:
    def test_compaction_of_nan_rows_diffs_to_zero(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            [(1, float("nan")), (2, 2.0)],
            schema="k long, x double",
        )
        t.commit(
            _df(spark, [(3, float("nan"))], "k long, x double"),
            mode="append",
        )
        assert t.compact(spark, min_bytes=1 << 30) is not None
        v = t.latest_version()
        at = _cdf_diff_arrow(t.path, None, v, ["k"], _declared(t))
        assert at.num_rows == 0

    def test_rewrite_emits_only_real_changes(self, spark, tmp_path):
        """A merge updating k=2 rewrites the group also holding the
        NaN row k=1 — only k=2's pre/post pair may surface."""
        t = _mk(
            spark, tmp_path,
            [(1, float("nan")), (2, 2.0)],
            schema="k long, x double",
        )
        merge_into(
            t, spark,
            _df(spark, [(2, 9.0)], "k long, x double"),
            key="k",
        )
        v = t.latest_version()
        at = _cdf_diff_arrow(t.path, None, v, ["k"], _declared(t))
        assert sorted(
            (r["k"], r["_change_type"]) for r in at.to_pylist()
        ) == [(2, "update_postimage"), (2, "update_preimage")]

    def test_nan_to_value_still_updates(self, spark, tmp_path):
        t = _mk(
            spark, tmp_path,
            [(1, float("nan"))],
            schema="k long, x double",
        )
        merge_into(
            t, spark,
            _df(spark, [(1, 5.0)], "k long, x double"),
            key="k",
        )
        v = t.latest_version()
        rows = _cdf_diff_arrow(
            t.path, None, v, ["k"], _declared(t)
        ).to_pylist()
        got = sorted((r["k"], r["_change_type"]) for r in rows)
        assert got == [
            (1, "update_postimage"), (1, "update_preimage")
        ]
        post = [
            r for r in rows if r["_change_type"] == "update_postimage"
        ][0]
        assert post["x"] == 5.0
        pre = [
            r for r in rows if r["_change_type"] == "update_preimage"
        ][0]
        assert math.isnan(pre["x"])
