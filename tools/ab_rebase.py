#!/usr/bin/env python3
"""Scale evidence for the r12 rebase publish: publishing a staged
branch over a DIVERGED main costs one manifest load per interim
commit (the append-only proof walk) plus one atomic manifest create —
metadata-bound, independent of data bytes.

Builds a table, forks a branch with one staged append, then lands
4 / 16 / 64 interim main appends before publishing. A data-coupled
implementation would scale with interim BYTES; we vary bytes
separately (wide vs narrow interim rows at equal commit count) to
show the time tracks the COMMIT COUNT (linear, ~ms per manifest
load), not the data.

Usage: python tools/ab_rebase.py
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


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from file_stream_import_spark.io.versioned import VersionedTable

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab_rebase")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shaped = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # same schema, 2000x the string bytes — so bytes is the ONLY
    # variable between the narrow and wide interim runs
    base = shaped.withColumn(
        "pad", F.lit("x")
    ).coalesce(1).localCheckpoint(eager=True)
    wide = shaped.withColumn(
        "pad", F.repeat(F.lit("x"), 2000)
    ).coalesce(1).localCheckpoint(eager=True)

    def run(n_interim: int, use_wide: bool) -> tuple[float, float, float]:
        t = VersionedTable(
            tempfile.mkdtemp(prefix=f"ab_rb_{n_interim}_")
        )
        try:
            t.commit(base, mode="overwrite")
            b = t.create_branch("stage")
            b.commit(base, mode="append")
            frame = wide if use_wide else base
            for _ in range(n_interim):
                t.commit(frame, mode="append")
            # the append-only proof walk in isolation (r13: served
            # from the history checkpoint past _CKPT_EVERY, so its
            # cost no longer tracks interim commit count) — timed as
            # the median of 5 to stay above clock noise
            main_latest = t.latest_version()
            walk, walk_unbatched = [], []
            real_read = type(t)._read_checkpoint
            for _ in range(9):
                t0 = time.perf_counter()
                t._publish_rebase_check(
                    "stage", b, b.latest_version(), 0, main_latest
                )
                walk.append(time.perf_counter() - t0)
            # the pre-r13 arm: no checkpoint coverage -> one manifest
            # load per interim commit (monkeypatched, walk-only)
            try:
                type(t)._read_checkpoint = lambda self: {
                    "upto": -1, "rows": []
                }
                for _ in range(9):
                    t0 = time.perf_counter()
                    t._publish_rebase_check(
                        "stage", b, b.latest_version(), 0, main_latest
                    )
                    walk_unbatched.append(time.perf_counter() - t0)
            finally:
                type(t)._read_checkpoint = real_read
            t0 = time.perf_counter()
            pv = t.publish_branch("stage")
            dt = time.perf_counter() - t0
            assert t._load_manifest(pv).get("rebased_from") == 0
            return (
                round(dt, 4),
                round(sorted(walk)[4], 5),
                round(sorted(walk_unbatched)[4], 5),
            )
        finally:
            shutil.rmtree(t.path, ignore_errors=True)

    sizes = (4, 16, 64, 256)
    narrow = [run(n, False) for n in sizes]
    wide_r = [run(n, True) for n in sizes]
    out = {
        "interim_commits": list(sizes),
        "publish_sec_narrow": [p for p, _, _ in narrow],
        "walk_sec": [w for _, w, _ in narrow],
        "walk_sec_unbatched": [u for _, _, u in narrow],
        "publish_sec_wide": [p for p, _, _ in wide_r],
    }
    # the publish TOTAL grows with the table's group count (a manifest
    # is a full state: the rebased manifest lists every group); the
    # flatness claim is on the WALK, checkpoint-served past
    # _CKPT_EVERY (r13) — vs the pre-r13 arm's one manifest load per
    # interim commit
    out["walk_batched_win_at_256"] = round(
        out["walk_sec_unbatched"][-1]
        / max(out["walk_sec"][-1], 1e-9),
        2,
    )
    out["wide_over_narrow_at_256"] = round(
        out["publish_sec_wide"][-1]
        / max(out["publish_sec_narrow"][-1], 1e-9),
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
