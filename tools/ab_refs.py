#!/usr/bin/env python3
"""Scale evidence for branch/tag refs: fork, tag, and publish cost
must track MANIFEST size (number of group entries), never data bytes.

Builds two tables with the same tiny rows-per-commit but 16 vs 256
commits (16x the groups, 16x the manifest), then times create_tag /
create_branch / branch-commit / publish_branch on each. A data-coupled
implementation would also scale with bytes; we vary bytes separately
(wide vs narrow rows at equal group count) to show the times don't
move.

Usage: python tools/ab_refs.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(spark, n_commits: int, wide: bool):
    from pyspark.sql import functions as F

    from file_stream_import_spark.io.versioned import VersionedTable

    t = VersionedTable(tempfile.mkdtemp(prefix=f"ab_refs_{n_commits}_"))
    base = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    if wide:
        base = base.withColumn("pad", F.repeat(F.lit("x"), 2000))
    base = base.coalesce(1).localCheckpoint(eager=True)
    for i in range(n_commits):
        t.commit(base, mode="append" if i else "overwrite")
    return t, base.limit(1).localCheckpoint(eager=True)


def timed(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    from file_stream_import_spark.session import get_spark

    spark = get_spark(app_name="ab_refs", shuffle_partitions=8)
    out = {}
    tables = []
    for label, n_commits, wide in (
        ("16_groups", 16, False),
        ("256_groups", 256, False),
        ("16_groups_16x_bytes", 16, True),
    ):
        t, staged = build(spark, n_commits, wide)
        tables.append(t)
        i = [0]

        def tag():
            i[0] += 1
            t.create_tag(f"tg{i[0]}")

        def fork_and_publish():
            i[0] += 1
            name = f"br{i[0]}"
            b = t.create_branch(name)
            b.commit(staged, mode="append")
            t.publish_branch(name)
            # reset main so the next rep forks from a clean head
            t.delete_branch(name)

        out[label] = {
            "create_tag_s": timed(tag),
            "fork_commit_publish_s": timed(fork_and_publish, reps=3),
            "n_groups": len(
                t._load_manifest(t.latest_version())["groups"]
            ),
        }
    print(json.dumps(out))
    for t in tables:
        shutil.rmtree(t.path, ignore_errors=True)


if __name__ == "__main__":
    main()
