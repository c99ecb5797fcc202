"""Snapshot-versioned parquet table: manifest-listed data files with
atomic commits, time travel, and rollback — the Iceberg/Delta core
mechanic (a table IS its manifest; data files are immutable) built on
nothing but parquet + atomic rename, since the real table formats are
classpath-blocked here (README "Lakehouse ACID MERGE INTO" note).

Layout:

    table/
      data/<uuid>/part-*.parquet   immutable file groups, one per commit
      _manifests/v00000001.json    ordered snapshots; each lists the
                                   FULL set of data files it reads

Protocol (the invariants that give snapshot isolation):

* Data files are written FIRST, under a fresh uuid directory. A crash
  after the data write but before the manifest rename leaves orphan
  files that no manifest references — invisible to every reader,
  reclaimable by vacuum().
* A commit is ONE atomic create of the next version's manifest —
  ``os.link`` of a temp file into the slot, which fails with
  FileExistsError if another writer got there first (rename would
  silently REPLACE the winner). Concurrent writers serialize
  optimistically; the loser surfaces CommitConflictError and retries
  on a fresh version.
* ``append`` reuses the parent snapshot's file list plus the new group
  (no rewrite — O(delta) commit cost); ``overwrite`` starts an empty
  list. ``rollback`` is a NEW commit whose file list equals an old
  snapshot's — history is never mutated, exactly like Iceberg's
  rollback-as-new-snapshot.
* Readers resolve a version (default: latest) to its manifest and read
  exactly that file list — a reader mid-query never sees a half commit.

Schema contract: the manifest records the commit's schema JSON; append
requires an identical schema unless ``allow_evolution=True``, which
permits ADDITIVE columns (old groups read them as NULL via parquet
schema merging — unionByName semantics); type changes always fail.

At 100 TB the manifest lists file GROUPS (one directory per commit),
so manifest size grows with commit count, not file count; the
data-file listing inside a group is delegated to the parquet reader.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflictError(RuntimeError):
    """Another writer committed the version this commit targeted."""


class SchemaMismatchError(ValueError):
    """Append schema differs from the table's current schema."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


class VersionedTable:
    def __init__(self, path: str) -> None:
        self.path = path

    # -- introspection ------------------------------------------------

    def versions(self) -> list[int]:
        d = _manifest_dir(self.path)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _load_manifest(self, version: int) -> dict:
        with open(_manifest_path(self.path, version)) as f:
            return json.load(f)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- commit -------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        allow_evolution: bool = False,
    ) -> int:
        """Write ``df`` as a new snapshot; returns the version number.
        ``mode='append'`` adds to the parent snapshot's files,
        ``'overwrite'`` replaces them. Raises CommitConflictError if a
        concurrent writer takes the target version first.

        ``allow_evolution=True`` permits ADDITIVE schema evolution on
        append: new columns join the table schema (old rows read them
        as NULL via parquet schema merging — unionByName semantics, the
        same by-NAME resolution rule as the reference's header map,
        writer.go:86-91); changing an existing column's type stays an
        error in every mode."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown mode {mode!r}")
        parent = self.latest_version()
        schema_json = df.schema.json()
        groups: list[str] = []
        if mode == "append" and parent is not None:
            m = self._load_manifest(parent)
            if m["schema"] != schema_json:
                if not allow_evolution:
                    raise SchemaMismatchError(
                        "append schema differs from table schema; pass "
                        "allow_evolution=True for additive columns, or "
                        "overwrite to migrate explicitly"
                    )
                schema_json = _evolve_schema(m["schema"], df.schema)
            groups = list(m["groups"])
        # (1) immutable data files first, invisible until the manifest
        group = os.path.join("data", uuid.uuid4().hex)
        df.write.parquet(os.path.join(self.path, group))
        groups.append(group)
        # (2) atomic manifest publish
        return self._publish(
            parent, {"schema": schema_json, "groups": groups, "mode": mode}
        )

    def _publish(self, parent: int | None, manifest: dict) -> int:
        os.makedirs(_manifest_dir(self.path), exist_ok=True)
        version = (parent if parent is not None else -1) + 1
        manifest["version"] = version
        manifest["parent"] = parent
        tmp = _manifest_path(self.path, version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        target = _manifest_path(self.path, version)
        try:
            # link+unlink = atomic create-if-absent (rename would
            # silently REPLACE an existing target and clobber the
            # concurrent winner's manifest)
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} was committed concurrently; retry"
            ) from None
        finally:
            os.unlink(tmp)
        return version

    # -- read / time travel ------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        m = self._load_manifest(version)
        paths = [os.path.join(self.path, g) for g in m["groups"]]
        if not paths:
            return spark.createDataFrame(
                [], schema=_schema_from_json(m["schema"])
            )
        # mergeSchema: groups written before an additive evolution lack
        # the new columns; the merged read fills them with NULL
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    # -- rollback / vacuum -------------------------------------------

    def rollback(self, to_version: int) -> int:
        """Publish a NEW snapshot with ``to_version``'s file list —
        history stays intact, time travel to the bad version still
        works, exactly like Iceberg's rollback."""
        m = self._load_manifest(to_version)
        return self._publish(
            self.latest_version(),
            {
                "schema": m["schema"],
                "groups": list(m["groups"]),
                "mode": f"rollback:{to_version}",
            },
        )

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Iceberg's expire-snapshots + orphan cleanup: drop manifests
        older than the newest ``keep_versions``, then delete every data
        group no REMAINING manifest references — which also reclaims
        crash orphans (data written, manifest never published). Time
        travel keeps working for retained versions only. Returns the
        removed group dirs."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        import shutil

        vs = self.versions()
        expired, keep = vs[:-keep_versions], vs[-keep_versions:]
        for v in expired:
            os.unlink(_manifest_path(self.path, v))
        live: set[str] = set()
        for v in keep:
            live.update(self._load_manifest(v)["groups"])
        removed = []
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                g = os.path.join("data", d)
                if g not in live:
                    shutil.rmtree(os.path.join(self.path, g))
                    removed.append(g)
        return removed


def _schema_from_json(schema_json: str):
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(schema_json))


def _evolve_schema(table_schema_json: str, incoming) -> str:
    """Additive-only evolution: incoming may ADD columns; every column
    shared with the table must keep its exact type. Returns the evolved
    schema JSON (table columns first, then the new ones — stable order
    so repeated evolutions are deterministic)."""
    from pyspark.sql.types import StructType

    table = StructType.fromJson(json.loads(table_schema_json))
    by_name = {f.name: f for f in table.fields}
    for f in incoming.fields:
        old = by_name.get(f.name)
        if old is not None and old.dataType != f.dataType:
            raise SchemaMismatchError(
                f"column {f.name!r} changes type "
                f"{old.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()}; type changes need an "
                "explicit overwrite migration"
            )
    evolved = list(table.fields) + [
        f for f in incoming.fields if f.name not in by_name
    ]
    return StructType(evolved).json()


def merge_into(
    table: VersionedTable,
    spark: SparkSession,
    updates: DataFrame,
    key: str | list[str],
) -> int:
    """MERGE INTO the versioned table: WHEN MATCHED THEN UPDATE SET *,
    WHEN NOT MATCHED THEN INSERT * — the lakehouse upsert (README
    design note), committed as a new snapshot so the pre-merge state
    stays time-travelable.

    Like SQL MERGE (and the Derby staging path in io/jdbc.py), the
    source must be unique per key — duplicate source keys would make
    the result order-dependent, so they fail loudly; callers resolve
    them first (operators/upsert.py::merge_upsert is the
    last-writer-wins resolver).

    Copy-on-write granularity: this rewrites the WHOLE snapshot (one
    anti-join + union + commit). Iceberg/Delta rewrite only files
    containing matched keys; with manifest-listed groups the same
    optimization would track min/max key per group and union untouched
    groups by reference — noted, not implemented.
    """
    keys = [key] if isinstance(key, str) else list(key)
    dup = (
        updates.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "MERGE source has duplicate keys; resolve last-writer-wins "
            "first (operators/upsert.py::merge_upsert)"
        )
    if table.latest_version() is None:
        return table.commit(updates, mode="overwrite")
    current = table.read(spark)
    if current.schema != updates.schema:
        raise SchemaMismatchError(
            "MERGE source schema differs from table schema"
        )
    merged = current.join(updates, keys, "left_anti").unionByName(updates)
    return table.commit(merged, mode="overwrite")


def make_idempotent_table_writer(
    table: VersionedTable,
    query_name: str,
    key: str | list[str] | None = None,
):
    """foreachBatch-compatible exactly-once writer INTO the versioned
    table — the lake-side twin of streaming/exactly_once.py's JDBC sink,
    using the Delta transactional-writer idea (txn appId + epoch) on
    manifests instead of a ledger table: each commit records
    ``{"txn": {query_name: batch_id}}``, and a replayed batch_id at or
    below the query's high-water mark is skipped. The manifest publish
    is already atomic, so the txn record and the data are one commit —
    no separate ledger to keep in sync.

    ``key=None`` appends the batch; with a key, the batch MERGEs
    (upsert) — give last-writer-wins resolution to duplicate keys
    within the batch first if the stream can produce them.
    """

    def high_water(t: VersionedTable) -> int | None:
        hw = None
        for v in t.versions():
            txn = t._load_manifest(v).get("txn") or {}
            b = txn.get(query_name)
            if b is not None:
                hw = b if hw is None else max(hw, b)
        return hw

    def write(batch_df: DataFrame, batch_id: int) -> None:
        hw = high_water(table)
        if hw is not None and batch_id <= hw:
            return  # replay of a committed epoch
        if key is None or table.latest_version() is None:
            v = table.commit(batch_df, mode="append")
        else:
            v = merge_into(table, batch_df.sparkSession, batch_df, key)
        # stamp the txn mark onto the just-published manifest: rewrite
        # is safe because the version is ours (nobody else can publish
        # this slot) and readers only consult groups/schema
        m = table._load_manifest(v)
        m["txn"] = {query_name: int(batch_id)}
        with open(_manifest_path(table.path, v), "w") as f:
            json.dump(m, f)

    return write
