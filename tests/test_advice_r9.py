"""Regression tests for the round-9 ADVICE findings:

1. (low) _rewrite_pruned unpacked prune_where entries as 2-tuples at
   box-serialization time, AFTER the new data group was written — a
   list-valued (IN-set) prune_where, which _group_may_match accepts,
   crashed with an opaque unpacking ValueError and left an orphan
   group. Now: malformed bounds raise a clear ValueError BEFORE any
   write, and list bounds serialize via _where_bounds ([min, max] box).
2. (low) version_as_of's binary search treated a manifest with a
   missing committed_at as "after timestamp" and moved left, so a
   legacy/foreign manifest mid-list could resolve to an older version
   than the linear scan would. Now: any None probe falls back to the
   linear scan that skips timestamp-less entries.
3. (low) _write_hint / _extend_checkpoint / vacuum's checkpoint trim
   create `*.tmp-<uuid>` files in _manifests/ and rely on os.replace;
   a crash in between left litter nothing reclaimed. Now: vacuum()
   sweeps `.tmp-` files older than min_age_seconds.
4. (low) the IN-set read surface (where={col: [v1, v2, ...]}) shipped
   in r8 without tests — covered here: multi-group bloom pruning, None
   values in the set, the empty set, and mixed list/tuple bounds.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.versioned import (
    VersionedTable,
    _manifest_path,
)


def _mk_table(spark, tmp_path, n_groups=4, rows_per_group=50):
    """n_groups commits of disjoint contiguous k-ranges with a string
    payload; returns (table, per-group key lists)."""
    t = VersionedTable(str(tmp_path / "t"))
    ranges = []
    for gi in range(n_groups):
        lo = gi * rows_per_group
        df = spark.range(lo, lo + rows_per_group).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        t.commit(df, mode="append" if gi else "overwrite")
        ranges.append(list(range(lo, lo + rows_per_group)))
    return t, ranges


class TestPruneWhereValidation:
    """ADVICE 1: malformed prune_where fails BEFORE any write; IN-set
    prune_where works end to end (delete + rebase box)."""

    def test_malformed_bound_raises_before_write(self, spark, tmp_path):
        t, _ = _mk_table(spark, tmp_path, n_groups=2)
        data_root = os.path.join(t.path, "data")
        n_before = len(os.listdir(data_root))
        with pytest.raises(ValueError, match="prune_where"):
            t.delete_where(
                spark, F.col("k") == 5, prune_where={"k": 5}  # scalar
            )
        with pytest.raises(ValueError, match="prune_where"):
            t.update_where(
                spark, F.col("k") == 5, {"v": F.lit("x")},
                prune_where={"k": (1, 2, 3)},  # 3-tuple
            )
        # no orphan group was written by either failed call
        assert len(os.listdir(data_root)) == n_before

    def test_in_set_prune_where_delete(self, spark, tmp_path):
        t, _ = _mk_table(spark, tmp_path, n_groups=4, rows_per_group=50)
        base = t.latest_version()
        groups_before = set(t._load_manifest(base)["groups"])
        v = t.delete_where(
            spark,
            F.col("k").isin(10, 20),
            prune_where={"k": [10, 20]},  # IN-set box = [10, 20]
        )
        m = t._load_manifest(v)
        # groups 1..3 (k>=50) are disjoint from the [10, 20] box and
        # must carry BY REFERENCE (only group 0 rewritten)
        assert len(set(m["groups"]) & groups_before) == 3
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == sorted(set(range(200)) - {10, 20})

    def test_in_set_box_rebases_disjoint(self, spark, tmp_path):
        """Two pruned deletes on disjoint IN-sets: the second publishes
        against a stale parent and must REBASE (not conflict) because
        the IN-set boxes are disjoint."""
        t, _ = _mk_table(spark, tmp_path, n_groups=4, rows_per_group=50)
        base = t.latest_version()
        t.delete_where(
            spark, F.col("k").isin(5, 7), prune_where={"k": [5, 7]},
            expected_parent=base,
        )
        v = t.delete_where(
            spark, F.col("k").isin(160, 170),
            prune_where={"k": [160, 170]}, expected_parent=base,
        )
        m = t._load_manifest(v)
        assert m.get("rebased_from") == base
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == sorted(set(range(200)) - {5, 7, 160, 170})


class TestVersionAsOfNoneTimestamp:
    """ADVICE 2: a manifest lacking committed_at mid-list must not
    steer the binary search to an older version."""

    def test_foreign_manifest_without_timestamp(self, spark, tmp_path):
        t, _ = _mk_table(spark, tmp_path, n_groups=5, rows_per_group=10)
        vs = t.versions()
        stamps = {
            v: t._load_manifest(v).get("committed_at") for v in vs
        }
        # simulate an externally authored manifest: strip committed_at
        # from a MIDDLE version (binary search probes the middle first)
        victim = vs[len(vs) // 2]
        p = _manifest_path(t.path, victim)
        m = json.load(open(p))
        del m["committed_at"]
        json.dump(m, open(p, "w"))
        # resolving "now" must still find the NEWEST stamped version,
        # not stop left of the timestamp-less probe
        assert t.version_as_of(time.time()) == vs[-1]
        # and resolving just after an early version still lands on it
        early = vs[1]
        assert t.version_as_of(stamps[early] + 1e-4) == early

    def test_all_manifests_without_timestamp(self, spark, tmp_path):
        t, _ = _mk_table(spark, tmp_path, n_groups=2, rows_per_group=5)
        for v in t.versions():
            p = _manifest_path(t.path, v)
            m = json.load(open(p))
            m.pop("committed_at", None)
            json.dump(m, open(p, "w"))
        with pytest.raises(FileNotFoundError):
            t.version_as_of(time.time())


class TestVacuumTmpSweep:
    """ADVICE 3: vacuum reclaims stale `.tmp-` litter in _manifests/."""

    def test_sweeps_old_keeps_fresh(self, spark, tmp_path):
        t, _ = _mk_table(spark, tmp_path, n_groups=2, rows_per_group=5)
        mdir = os.path.join(t.path, "_manifests")
        stale = os.path.join(mdir, "v00000099.json.tmp-deadbeef")
        fresh = os.path.join(mdir, "_latest.hint.tmp-cafebabe")
        for p in (stale, fresh):
            with open(p, "w") as f:
                f.write("{}")
        old = time.time() - 7200
        os.utime(stale, (old, old))
        t.vacuum(keep_versions=10, min_age_seconds=3600)
        assert not os.path.exists(stale)   # old litter reclaimed
        assert os.path.exists(fresh)       # in-flight write protected
        # vacuum(0) with no writers active reclaims everything
        t.vacuum(keep_versions=10, min_age_seconds=0)
        assert not os.path.exists(fresh)


class TestInSetReads:
    """ADVICE 4: the where={col: [v1, v2, ...]} read surface."""

    def _bloomed_table(self, spark, tmp_path):
        t = VersionedTable(str(tmp_path / "bt"))
        for gi in range(4):
            lo = gi * 100
            df = spark.range(lo, lo + 100).select(
                F.concat(F.lit("id-"), F.format_string("%04d", F.col("id")))
                .alias("uid"),
                F.col("id").alias("k"),
            )
            t.commit(df, mode="append" if gi else "overwrite")
        t.set_bloom_columns(spark, ["uid"])
        return t

    def test_multi_group_bloom_pruning(self, spark, tmp_path):
        """An IN-set probe on a bloom'd string key reads only the
        groups that might hold one of the probed values."""
        t = self._bloomed_table(spark, tmp_path)
        # two keys living in groups 0 and 2
        df = t.read(spark, where={"uid": ["id-0005", "id-0250"]})
        got = sorted(r["k"] for r in df.collect())
        assert got == [5, 250]
        # pruning evidence: the scan's input files cover at most 3 of
        # the 4 groups (blooms may false-positive one extra; proving
        # <4 still shows the IN-set consulted the filters)
        m = t._load_manifest(t.latest_version())
        touched_groups = {
            os.path.basename(os.path.dirname(f.replace("file:", "")))
            for f in df.inputFiles()
        }
        assert len(touched_groups) < len(m["groups"])

    def test_none_in_set_is_dropped(self, spark, tmp_path):
        """SQL IN never matches NULL: a None in the probe list is
        ignored for both pruning and the row filter."""
        t = self._bloomed_table(spark, tmp_path)
        df = t.read(spark, where={"uid": ["id-0007", None]})
        assert [r["k"] for r in df.collect()] == [7]

    def test_empty_set_returns_no_rows(self, spark, tmp_path):
        t = self._bloomed_table(spark, tmp_path)
        assert t.read(spark, where={"uid": []}).count() == 0
        assert t.read(spark, where={"uid": [None]}).count() == 0

    def test_mixed_list_and_tuple_bounds(self, spark, tmp_path):
        """A WHERE mixing an IN-set on one column with a range on
        another conjoins correctly."""
        t = self._bloomed_table(spark, tmp_path)
        df = t.read(
            spark,
            where={"uid": ["id-0005", "id-0250", "id-0399"], "k": (0, 300)},
        )
        got = sorted(r["k"] for r in df.collect())
        assert got == [5, 250]  # id-0399 filtered by the range bound


class TestVacuumRootTmpSweep:
    """r16: sidecar publishers (operators/mv.py's _mv_spec.json) write
    `<name>.tmp-<uuid>` at the table ROOT then os.replace — a crash in
    between leaves litter nothing else reclaims. Vacuum's tmp sweep
    now covers root-level FILES with the same age gate."""

    def test_sweeps_old_root_litter_keeps_fresh_and_dirs(
        self, spark, tmp_path
    ):
        t, _ = _mk_table(spark, tmp_path, n_groups=2, rows_per_group=5)
        stale = os.path.join(t.path, "_mv_spec.json.tmp-deadbeef")
        fresh = os.path.join(t.path, "_mv_spec.json.tmp-cafebabe")
        for p in (stale, fresh):
            with open(p, "w") as f:
                f.write("{}")
        # a DIRECTORY whose name matches must never be touched
        decoy = os.path.join(t.path, "weird.tmp-dir")
        os.makedirs(decoy)
        old = time.time() - 7200
        os.utime(stale, (old, old))
        os.utime(decoy, (old, old))
        t.vacuum(keep_versions=10, min_age_seconds=3600)
        assert not os.path.exists(stale)
        assert os.path.exists(fresh)
        assert os.path.isdir(decoy)
        # the real spec file survives any vacuum
        spec = os.path.join(t.path, "_mv_spec.json")
        with open(spec, "w") as f:
            f.write("{}")
        os.utime(spec, (old, old))
        t.vacuum(keep_versions=10, min_age_seconds=0)
        assert os.path.exists(spec)
        assert not os.path.exists(fresh)
