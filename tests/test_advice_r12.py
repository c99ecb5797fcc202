"""Regression tests for the round-12 ADVICE findings:

1. (medium) txn watermarks were dropped across WAP boundaries:
   create_branch's v0 publish (parent=None) started the branch chain
   with an EMPTY txn map, and publish_branch's manifest carried no txn
   so _publish overwrote it with main's fork-point map — discarding
   epochs staged on the branch. An idempotent writer pointed at a
   recreated branch (or at main after a publish) could re-apply an
   already-committed batch_id, silently duplicating rows. Now: the
   fork's map rides the branch v0 explicitly, and publish passes the
   branch head's map so _publish max-folds it with main's inherited
   one.
2. (low) create_tag's retained-version check was TOCTOU with a
   concurrent vacuum: the tag could land pointing at a just-expired
   version, pinning nothing, and read(tag=) then failed with a bare
   FileNotFoundError. Now: the manifest is re-verified AFTER the tag
   link; a lost race removes the dangling tag and raises with the
   remedy.
3. (low) vacuum()'s branch live-set walk called self.branch(name) per
   listing entry; a concurrent delete_branch between the listing and
   the handle lookup raised KeyError and aborted vacuum mid-run
   (expired manifests already unlinked, orphan sweep never ran). Now:
   advisory skip, like racing manifest loads.
4. (low) a crash between create_branch's os.mkdir and the v0 publish
   left an empty branch dir: create_branch then failed forever with
   "already exists" and publish_branch crashed with TypeError. Now:
   branch() treats a manifest-less dir as absent (KeyError with the
   remedy), create_branch ADOPTS the leftover (the v0 link stays the
   atomic arbiter), publish_branch raises cleanly, and delete_branch
   still removes the litter.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
)


def _mk(spark, tmp_path, name="t", n=6, txn=None):
    t = VersionedTable(str(tmp_path / name))
    t.commit(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        mode="overwrite",
        txn=txn,
    )
    return t


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


class TestTxnAcrossWap:
    def test_branch_v0_inherits_fork_txn(self, spark, tmp_path):
        t = _mk(spark, tmp_path, txn={"ingest": 5})
        b = t.create_branch("stage")
        assert b._load_manifest(0).get("txn") == {"ingest": 5}

    def test_publish_carries_branch_epochs_to_main(self, spark, tmp_path):
        t = _mk(spark, tmp_path, txn={"ingest": 5})
        b = t.create_branch("stage")
        b.commit(_df(spark, [(50, 1)]), mode="append", txn={"ingest": 6})
        pv = t.publish_branch("stage")
        assert t._load_manifest(pv).get("txn") == {"ingest": 6}

    def test_rebased_publish_max_folds_both_maps(self, spark, tmp_path):
        """Branch stages epoch 7 of writer q; main meanwhile lands
        epoch 5 of q and epoch 9 of w. The rebased publish's map must
        be the per-writer max of both chains."""
        t = _mk(spark, tmp_path, txn={"q": 1})
        b = t.create_branch("stage")
        b.commit(_df(spark, [(50, 1)]), mode="append", txn={"q": 7})
        t.commit(_df(spark, [(60, 2)]), mode="append", txn={"q": 5})
        t.commit(_df(spark, [(61, 3)]), mode="append", txn={"w": 9})
        pv = t.publish_branch("stage")
        m = t._load_manifest(pv)
        assert m.get("rebased_from") is not None
        assert m.get("txn") == {"q": 7, "w": 9}

    def test_idempotent_writer_skips_replay_on_branch(
        self, spark, tmp_path
    ):
        """The documented invariant end-to-end: a writer whose epoch
        committed to MAIN before the fork must be a no-op when replayed
        against the BRANCH (pre-fix the branch chain started empty and
        the replay would duplicate rows)."""
        t = _mk(spark, tmp_path, txn={"job": 3})
        b = t.create_branch("stage")
        before = b.latest_version()
        # replay protection is the high-water-mark check the
        # exactly-once sink uses: epoch <= watermark means skip
        hw = (b._load_manifest(before).get("txn") or {}).get("job")
        assert hw == 3
        if not (hw is not None and 3 <= hw):  # pragma: no cover
            b.commit(_df(spark, [(99, 9)]), mode="append", txn={"job": 3})
        assert b.latest_version() == before


class TestTagVacuumRace:
    def test_lost_race_removes_dangling_tag(
        self, spark, tmp_path, monkeypatch
    ):
        from file_stream_import_spark.io import versioned as V

        t = _mk(spark, tmp_path)
        t.commit(_df(spark, [(50, 1)]), mode="append")
        victim = V._manifest_path(t._meta_root, 0)
        real_link = os.link

        def link_then_vacuum(src, dst):
            real_link(src, dst)
            # simulate vacuum's unlink landing between create_tag's
            # exists-check and the link becoming visible to it
            if os.path.exists(victim):
                os.unlink(victim)

        monkeypatch.setattr(os, "link", link_then_vacuum)
        with pytest.raises(FileNotFoundError, match="concurrent vacuum"):
            t.create_tag("stale", version=0)
        monkeypatch.undo()
        assert t.tags() == {}  # no dangling tag pinning nothing

    def test_tag_on_retained_version_still_works(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        assert t.create_tag("ok") == 0
        assert t.tags() == {"ok": 0}


class TestVacuumBranchRace:
    def test_vacuum_skips_branch_deleted_after_listing(
        self, spark, tmp_path, monkeypatch
    ):
        t = _mk(spark, tmp_path)
        b = t.create_branch("real")
        b.commit(_df(spark, [(50, 1)]), mode="append")
        for i in range(3):
            t.commit(_df(spark, [(60 + i, 2)]), mode="append")
        # the listing returns a branch that a concurrent delete_branch
        # removes before the per-branch handle lookup
        monkeypatch.setattr(
            VersionedTable,
            "branches",
            lambda self: ["ghost", "real"],
        )
        removed = t.vacuum(keep_versions=1, min_age_seconds=0)
        monkeypatch.undo()
        # vacuum completed: old manifests expired AND the orphan sweep
        # ran; the REAL branch's groups stayed live
        assert t.versions() == [t.latest_version()]
        assert len(b.read(spark).collect()) == 7


class TestCrashedCreateBranch:
    def _litter(self, t, name):
        d = os.path.join(t.path, "_refs", "branches", name)
        os.makedirs(d)
        return d

    def test_branch_handle_treats_empty_dir_as_absent(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path)
        self._litter(t, "half")
        with pytest.raises(KeyError, match="no manifests"):
            t.branch("half")

    def test_publish_on_empty_dir_raises_cleanly(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        self._litter(t, "half")
        with pytest.raises(KeyError, match="no manifests"):
            t.publish_branch("half")

    def test_create_branch_adopts_leftover_dir(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        self._litter(t, "half")
        b = t.create_branch("half")  # adopt, not "already exists"
        b.commit(_df(spark, [(50, 1)]), mode="append")
        pv = t.publish_branch("half")
        assert t._load_manifest(pv)["mode"] == "publish_branch:half"

    def test_delete_branch_cleans_leftover_dir(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        d = self._litter(t, "half")
        t.delete_branch("half")
        assert not os.path.isdir(d)

    def test_create_branch_still_rejects_live_duplicate(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path)
        t.create_branch("dup")
        with pytest.raises(ValueError, match="already exists"):
            t.create_branch("dup")

    def test_vacuum_skips_empty_branch_dir(self, spark, tmp_path):
        t = _mk(spark, tmp_path)
        self._litter(t, "half")
        t.commit(_df(spark, [(50, 1)]), mode="append")
        t.vacuum(keep_versions=1, min_age_seconds=0)
        assert t.versions() == [t.latest_version()]
