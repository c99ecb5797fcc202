"""Metadata scaling for VersionedTable at real commit volumes (round-8
verdict item 1): with ~1k committed versions,

* latest_version() resolves through the `_latest.hint` file in O(1)
  file operations — no directory listing, no manifest walk;
* version_as_of() binary-searches committed_at (monotone by
  construction) and loads O(log n) manifests;
* history() serves from the `_history.ckpt.json` checkpoint and loads
  only the manifests newer than it;
* vacuum() trims expired rows out of the checkpoint, and a hint
  pointing at a vacuumed manifest falls back to the listing.

These tests drive the metadata layer directly through _publish (no
Spark jobs — the data path is covered by test_versioned.py), so a
thousand commits stay sub-second.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from file_stream_import_spark.io import versioned as V
from file_stream_import_spark.io.versioned import VersionedTable

N = 1000  # last version number (N + 1 manifests, v0..vN)
SCHEMA = StructType([StructField("k", LongType())]).json()


@pytest.fixture()
def table(tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    parent = None
    for _ in range(N + 1):
        parent = t._publish(
            parent,
            {
                "schema": SCHEMA,
                "groups": [],
                "mode": "append",
                "added": [],
                "delete_entries": [],
                "stats": {},
            },
        )
    assert parent == N
    return t


class TestLatestVersionHint:
    def test_o1_resolution_without_listing(self, table, monkeypatch):
        calls = {"listdir": 0, "exists": 0}
        real_listdir, real_exists = os.listdir, os.path.exists

        def counting_listdir(p):
            calls["listdir"] += 1
            return real_listdir(p)

        def counting_exists(p):
            calls["exists"] += 1
            return real_exists(p)

        monkeypatch.setattr(os, "listdir", counting_listdir)
        monkeypatch.setattr(os.path, "exists", counting_exists)
        assert table.latest_version() == N
        assert calls["listdir"] == 0  # never lists the manifest dir
        assert calls["exists"] <= 3  # hint probe + one forward miss

    def test_stale_hint_probes_forward(self, table):
        with open(V._hint_path(table.path), "w") as f:
            f.write(str(N - 7))  # lagging hint (slow concurrent writer)
        assert table.latest_version() == N

    def test_missing_or_corrupt_hint_falls_back(self, table):
        os.unlink(V._hint_path(table.path))
        assert table.latest_version() == N
        with open(V._hint_path(table.path), "w") as f:
            f.write("not a number")
        assert table.latest_version() == N


class TestVersionAsOfBinarySearch:
    def test_logarithmic_manifest_loads(self, table, monkeypatch):
        ts_mid = table._load_manifest(500)["committed_at"]
        ts_last = table._load_manifest(N)["committed_at"]
        loads = {"n": 0}
        real = VersionedTable._load_manifest

        def counting(self, v):
            loads["n"] += 1
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        got = table.version_as_of(ts_mid)
        assert loads["n"] <= 12  # ~log2(1001) + slack, not 1001
        assert got >= 500
        assert table.version_as_of(ts_last) == N

    def test_result_matches_linear_scan_semantics(self, table):
        ts = table._load_manifest(500)["committed_at"]
        got = table.version_as_of(ts)
        assert table._load_manifest(got)["committed_at"] <= ts
        if got < N:
            assert table._load_manifest(got + 1)["committed_at"] > ts

    def test_before_first_commit_raises(self, table):
        first = table._load_manifest(0)["committed_at"]
        with pytest.raises(FileNotFoundError):
            table.version_as_of(first - 1.0)


class TestHistoryCheckpoint:
    def test_checkpoint_covers_multiples_of_interval(self, table):
        ck = table._read_checkpoint()
        assert ck["upto"] == (N // V._CKPT_EVERY) * V._CKPT_EVERY
        assert len(ck["rows"]) == ck["upto"] + 1

    def test_history_loads_only_past_checkpoint(self, table, monkeypatch):
        loads = {"n": 0}
        real = VersionedTable._load_manifest

        def counting(self, v):
            loads["n"] += 1
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        rows = table.history()
        ck_upto = (N // V._CKPT_EVERY) * V._CKPT_EVERY
        assert loads["n"] == N - ck_upto
        assert len(rows) == N + 1
        assert rows[0]["version"] == 0 and rows[-1]["version"] == N
        assert rows[500]["parent"] == 499

    def test_history_correct_without_checkpoint(self, table):
        os.unlink(V._ckpt_path(table.path))
        rows = table.history()
        assert len(rows) == N + 1
        assert [r["version"] for r in rows] == list(range(N + 1))


class TestVacuumWindowing:
    def test_vacuum_trims_checkpoint_and_keeps_hint_valid(self, table):
        table.vacuum(keep_versions=10, min_age_seconds=0)
        assert table.versions() == list(range(N - 9, N + 1))
        ck = table._read_checkpoint()
        assert all(int(r["version"]) > N - 10 for r in ck["rows"])
        assert table.latest_version() == N
        assert len(table.history()) == 10

    def test_hint_at_vacuumed_version_falls_back(self, table):
        table.vacuum(keep_versions=5, min_age_seconds=0)
        with open(V._hint_path(table.path), "w") as f:
            f.write("3")  # points at an expired manifest
        assert table.latest_version() == N

    def test_checkpoint_file_is_json(self, table):
        with open(V._ckpt_path(table.path)) as f:
            ck = json.load(f)
        assert set(ck) == {"upto", "rows"}


class TestRealDataMetadataScale:
    """Round-9 (r8 VERDICT item 4): the hint/checkpoint layer proven
    against REAL manifests — ~100 commits carrying actual data groups,
    column stats, and bloom sidecars (the synthetic _publish fixture
    above has empty groups) — and the data-path operations that ride
    on them staying O(right thing) at that commit volume."""

    N_COMMITS = 100
    ROWS = 20

    @pytest.fixture(scope="class")
    def real_table(self, spark, tmp_path_factory):
        import hashlib

        from pyspark.sql import functions as F

        t = VersionedTable(
            str(tmp_path_factory.mktemp("meta_real") / "t")
        )
        mk = lambda lo: spark.range(lo, lo + self.ROWS).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("uid"),
        )
        t.commit(mk(0), mode="overwrite")
        t.set_bloom_columns(spark, ["uid"])
        for i in range(1, self.N_COMMITS):
            t.commit(mk(i * self.ROWS), mode="append")
        return t

    def test_manifests_are_real(self, real_table):
        m = real_table._load_manifest(real_table.latest_version())
        # +1: set_bloom_columns publishes a metadata-only snapshot
        assert real_table.latest_version() == self.N_COMMITS
        assert len(m["groups"]) == self.N_COMMITS
        for g in m["groups"]:
            st = m["stats"][g]
            assert st["_rows"] == self.ROWS
            assert st["k"]["min"] is not None
            assert "uid" in st["_bloom"]

    def test_latest_version_is_o1(self, real_table, monkeypatch):
        calls = {"listdir": 0}
        real_listdir = os.listdir

        def counting(p):
            calls["listdir"] += 1
            return real_listdir(p)

        monkeypatch.setattr(os, "listdir", counting)
        assert real_table.latest_version() == self.N_COMMITS
        assert calls["listdir"] == 0  # hint + forward probe only

    def test_read_loads_one_manifest_and_prunes_groups(
        self, spark, real_table, monkeypatch
    ):
        loads = {"n": 0}
        real = VersionedTable._load_manifest

        def counting(self, v):
            loads["n"] += 1
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        df = real_table.read(spark, where={"k": (1005, 1015)})
        assert loads["n"] == 1  # resolve latest, nothing else
        # contiguous ranges: stats boxes confine the scan to <= 2 groups
        files = df.inputFiles()
        dirs = {os.path.basename(os.path.dirname(f)) for f in files}
        assert 1 <= len(dirs) <= 2
        assert sorted(r["k"] for r in df.collect()) == list(
            range(1005, 1016)
        )

    def test_version_as_of_logarithmic_on_real_manifests(
        self, real_table, monkeypatch
    ):
        ts = real_table._load_manifest(50)["committed_at"]
        loads = {"n": 0}
        real = VersionedTable._load_manifest

        def counting(self, v):
            loads["n"] += 1
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        got = real_table.version_as_of(ts)
        assert loads["n"] <= 9  # ~log2(101) + slack
        assert got >= 50

    def test_history_serves_from_checkpoint(self, real_table, monkeypatch):
        loads = {"n": 0}
        real = VersionedTable._load_manifest

        def counting(self, v):
            loads["n"] += 1
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        rows = real_table.history()
        n_versions = self.N_COMMITS + 1
        ck_upto = (self.N_COMMITS // V._CKPT_EVERY) * V._CKPT_EVERY
        assert loads["n"] == self.N_COMMITS - ck_upto
        assert len(rows) == n_versions
        assert rows[-1]["n_groups"] == self.N_COMMITS

    def test_merge_into_stays_o_delta_at_100_groups(
        self, spark, real_table
    ):
        from pyspark.sql import functions as F

        from file_stream_import_spark.io.versioned import merge_into

        base = real_table.latest_version()
        m_before = real_table._load_manifest(base)
        upd = spark.range(500, 505).select(
            F.col("id").alias("k"),
            F.lit("updated").alias("uid"),
        )
        v = merge_into(real_table, spark, upd, key="k")
        m_after = real_table._load_manifest(v)
        carried = set(m_after["groups"]) & set(m_before["groups"])
        # 5 contiguous keys live in ONE group; 99 carry by reference
        assert len(carried) >= self.N_COMMITS - 1
        got = {
            r["k"]: r["uid"]
            for r in real_table.read(
                spark, version=v, where={"k": (499, 506)}
            ).collect()
        }
        assert all(got[k] == "updated" for k in range(500, 505))
        assert got[499] != "updated" and got[505] != "updated"


class TestWindowedVersionListing:
    """Round-9 (r8 ledger item 7): versions() resolves from an anchor
    (hint, else checkpoint upto) with O(log n) exists() probes — no
    directory listing — exploiting the contiguity invariant (_publish
    allocates sequentially, vacuum expires a strict prefix)."""

    def _count_listdir(self, monkeypatch):
        # counts listings that scale with commit volume; the history
        # SEGMENT dir is exempt — it holds at most _SEG_COMPACT (16)
        # entries by construction, so listing it is O(1), not the
        # O(#manifests) walk this suite exists to forbid
        calls = {"n": 0}
        real = os.listdir

        def counting(p):
            if os.path.basename(str(p)) != V._SEG_DIR:
                calls["n"] += 1
            return real(p)

        monkeypatch.setattr(os, "listdir", counting)
        return calls

    def test_no_listing_with_hint(self, table, monkeypatch):
        calls = self._count_listdir(monkeypatch)
        assert table.versions() == list(range(N + 1))
        assert calls["n"] == 0

    def test_checkpoint_anchor_when_hint_missing(self, table, monkeypatch):
        os.unlink(V._hint_path(table.path))
        calls = self._count_listdir(monkeypatch)
        assert table.versions() == list(range(N + 1))
        assert calls["n"] == 0  # ckpt upto (960) anchors the probe

    def test_fallback_listing_without_anchors(self, table):
        os.unlink(V._hint_path(table.path))
        os.unlink(V._ckpt_path(table.path))
        assert table.versions() == list(range(N + 1))

    def test_contiguous_suffix_after_vacuum(self, table, monkeypatch):
        table.vacuum(keep_versions=7, min_age_seconds=0)
        calls = self._count_listdir(monkeypatch)
        assert table.versions() == list(range(N - 6, N + 1))
        assert calls["n"] == 0
        # version_as_of rides the bounded listing too
        ts = table._load_manifest(N)["committed_at"]
        assert table.version_as_of(ts) == N


class TestVacuumReaderRace:
    """Round-9 (r8 ledger item 6): read() re-resolves when the version
    it just resolved is vacuumed before its manifest opens; a PINNED
    version surfaces the FileNotFoundError (it is genuinely gone)."""

    def _spark_table(self, spark, tmp_path):
        from pyspark.sql import functions as F

        t = VersionedTable(str(tmp_path / "t"))
        t.commit(
            spark.range(5).select(F.col("id").alias("k")),
            mode="overwrite",
        )
        t.commit(
            spark.range(5, 10).select(F.col("id").alias("k")),
            mode="append",
        )
        return t

    def test_resolved_read_retries_after_vacuum(
        self, spark, tmp_path, monkeypatch
    ):
        t = self._spark_table(spark, tmp_path)
        real = VersionedTable._load_manifest
        state = {"raised": False}

        def racing(self, v):
            # simulate vacuum landing between resolution and open:
            # the FIRST manifest open fails as if just unlinked
            if not state["raised"]:
                state["raised"] = True
                raise FileNotFoundError(V._manifest_path(self.path, v))
            return real(self, v)

        monkeypatch.setattr(VersionedTable, "_load_manifest", racing)
        got = sorted(r["k"] for r in t.read(spark).collect())
        assert got == list(range(10))
        assert state["raised"]  # the race actually fired

    def test_pinned_read_surfaces_vacuumed_version(self, spark, tmp_path):
        t = self._spark_table(spark, tmp_path)
        t.commit(
            t.read(spark).limit(1), mode="overwrite"
        )
        t.vacuum(keep_versions=1, min_age_seconds=0)
        with pytest.raises(FileNotFoundError):
            t.read(spark, version=0)

    def test_exhausted_retries_raise(self, spark, tmp_path, monkeypatch):
        t = self._spark_table(spark, tmp_path)

        def always(self, v):
            raise FileNotFoundError("gone")

        monkeypatch.setattr(VersionedTable, "_load_manifest", always)
        with pytest.raises(FileNotFoundError):
            t.read(spark)


class TestRefsMetadataScale:
    """Refs at commit volume: many branches and tags over a ~1k-version
    chain — pure metadata (no Spark jobs), so the mechanics stay
    sub-second and the walk costs are pinned by op counting."""

    def _branch_publish(self, b, parent):
        return b._publish(
            parent,
            {
                "schema": SCHEMA,
                "groups": [],
                "mode": "append",
                "added": [],
                "delete_entries": [],
                "stats": {},
            },
        )

    def test_many_branches_and_tags(self, table):
        for i in range(40):
            b = table.create_branch(f"b{i}", from_version=i * 20)
            parent = b.latest_version()
            for _ in range(3):
                parent = self._branch_publish(b, parent)
        assert len(table.branches()) == 40
        for v in range(0, N + 1, 200):
            table.create_tag(f"t{v}", version=v)
        assert len(table.tags()) == 6

        # the oldest tag (v0) pins the WHOLE chain through vacuum
        table.vacuum(keep_versions=1, min_age_seconds=0)
        assert table.versions()[0] == 0

        # releasing every tag but the newest releases the prefix
        for v in range(0, N, 200):
            table.delete_tag(f"t{v}")
        table.vacuum(keep_versions=1, min_age_seconds=0)
        assert table.versions() == [1000]

        # branch chains are untouched by main vacuum, and their heads
        # still resolve through their own hints
        for i in range(40):
            b = table.branch(f"b{i}")
            assert b.latest_version() == 3
            assert b.versions() == [0, 1, 2, 3]

    def test_vacuum_walk_is_linear_in_branch_manifests(
        self, table, monkeypatch
    ):
        for i in range(10):
            b = table.create_branch(f"b{i}")
            parent = b.latest_version()
            for _ in range(4):
                parent = self._branch_publish(b, parent)

        calls = {"n": 0}
        orig = VersionedTable._load_manifest

        def counting(self, version):
            calls["n"] += 1
            return orig(self, version)

        monkeypatch.setattr(VersionedTable, "_load_manifest", counting)
        table.vacuum(keep_versions=1, min_age_seconds=0)
        # retained main manifests + every branch manifest (10 x 5),
        # plus O(1) bookkeeping — NOT O(main versions x branches)
        assert calls["n"] <= 1 + 10 * 5 + 20

    def test_branch_heads_resolve_o1_via_hint(self, table, monkeypatch):
        b = table.create_branch("hot")
        parent = b.latest_version()
        for _ in range(50):
            parent = self._branch_publish(b, parent)
        exists_calls = {"n": 0}
        orig = os.path.exists

        def counting(p):
            exists_calls["n"] += 1
            return orig(p)

        monkeypatch.setattr(os.path, "exists", counting)
        assert table.branch("hot").latest_version() == 50
        # hint + forward probe per resolution, never a version walk.
        # Two resolutions since r12: branch() itself validates the
        # handle is not a crashed-create leftover (one latest_version)
        # before the caller's explicit latest_version.
        assert exists_calls["n"] <= 6


class TestHistorySegmentLog:
    """r13 (post-round ledger #4): the history checkpoint is a base
    file plus an append-only SEGMENT log. Per-commit upkeep writes only
    the delta rows (the base is never rewritten on the commit path);
    segments fold into the base every _SEG_COMPACT extensions and at
    vacuum-trim, so the whole-file rewrite is paid once per
    _SEG_COMPACT * _CKPT_EVERY commits instead of per _CKPT_EVERY."""

    def _publish_n(self, t, parent, n):
        for _ in range(n):
            parent = t._publish(
                parent,
                {
                    "schema": SCHEMA,
                    "groups": [],
                    "mode": "append",
                    "added": [],
                    "delete_entries": [],
                    "stats": {},
                },
            )
        return parent

    def test_base_untouched_between_compactions(self, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        # 3 checkpoint extensions (v64, v128, v192): all land as
        # segments; the base file is never created, so the commit path
        # wrote O(delta) rows, not the whole history
        parent = self._publish_n(t, None, 3 * V._CKPT_EVERY + 1)
        assert parent == 3 * V._CKPT_EVERY
        assert not os.path.exists(V._ckpt_path(t.path))
        segs = V._seg_files(t.path)
        # v0 checkpoints too (0 % _CKPT_EVERY == 0)
        assert [u for u, _ in segs] == [
            V._CKPT_EVERY * i for i in (0, 1, 2, 3)
        ]
        # each segment holds exactly its delta
        with open(segs[2][1]) as f:
            seg = json.load(f)
        assert seg["from"] == V._CKPT_EVERY + 1
        assert seg["upto"] == 2 * V._CKPT_EVERY
        assert len(seg["rows"]) == V._CKPT_EVERY
        # merged view is identical to what the monolithic file held
        ck = t._read_checkpoint()
        assert ck["upto"] == 3 * V._CKPT_EVERY
        assert [r["version"] for r in ck["rows"]] == list(
            range(3 * V._CKPT_EVERY + 1)
        )

    def test_compaction_folds_segments_into_base(self, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        # extensions land at v0, v64, ... — the _SEG_COMPACT-th is at
        # v(_SEG_COMPACT-1)*64 and triggers the fold
        upto = (V._SEG_COMPACT - 1) * V._CKPT_EVERY
        self._publish_n(t, None, upto + 1)
        assert V._seg_files(t.path) == []
        with open(V._ckpt_path(t.path)) as f:
            base = json.load(f)
        assert base["upto"] == upto
        assert [r["version"] for r in base["rows"]] == list(
            range(upto + 1)
        )
        # history is served from the folded base + tail manifests
        hist = t.history()
        assert [h["version"] for h in hist] == list(range(upto + 1))

    def test_vacuum_trims_base_and_segments(self, tmp_path):
        t = VersionedTable(str(tmp_path / "t"))
        parent = self._publish_n(t, None, 2 * V._CKPT_EVERY + 1)
        t.vacuum(keep_versions=10, min_age_seconds=0)
        # trim compacts: expired rows gone from the merged view AND the
        # stale segments are folded away
        assert V._seg_files(t.path) == []
        ck = t._read_checkpoint()
        assert [r["version"] for r in ck["rows"]] == list(
            range(2 * V._CKPT_EVERY - 9, 2 * V._CKPT_EVERY + 1)
        )
        assert [h["version"] for h in t.history()] == list(
            range(2 * V._CKPT_EVERY - 9, 2 * V._CKPT_EVERY + 1)
        )

    def test_stale_segment_resurrection_is_benign(self, tmp_path):
        # a crash between vacuum's base rewrite and the segment unlink
        # leaves trimmed rows resurrected from a stale segment; every
        # reader filters to the retained set, so history() is unchanged
        t = VersionedTable(str(tmp_path / "t"))
        self._publish_n(t, None, V._CKPT_EVERY + 1)
        segs = V._seg_files(t.path)
        with open(segs[0][1]) as f:
            stale = f.read()
        t.vacuum(keep_versions=5, min_age_seconds=0)
        with open(segs[0][1], "w") as f:
            f.write(stale)  # simulate the un-unlinked segment
        merged = t._read_checkpoint()
        assert merged["upto"] == V._CKPT_EVERY
        assert [h["version"] for h in t.history()] == list(
            range(V._CKPT_EVERY - 4, V._CKPT_EVERY + 1)
        )

    def test_premigration_base_only_table_reads(self, tmp_path):
        # a table whose checkpoint predates the segment log (monolithic
        # base, no segment dir) reads and extends correctly
        t = VersionedTable(str(tmp_path / "t"))
        parent = self._publish_n(t, None, V._CKPT_EVERY + 1)
        merged = t._read_checkpoint()
        with open(V._ckpt_path(t.path), "w") as f:
            json.dump(merged, f)
        for _, p in V._seg_files(t.path):
            os.unlink(p)
        assert t._read_checkpoint()["upto"] == V._CKPT_EVERY
        parent = self._publish_n(t, parent, V._CKPT_EVERY)
        ck = t._read_checkpoint()
        assert ck["upto"] == 2 * V._CKPT_EVERY
        assert [r["version"] for r in ck["rows"]] == list(
            range(2 * V._CKPT_EVERY + 1)
        )
