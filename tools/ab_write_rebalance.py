"""A/B the write-side REBALANCE file-sizing hint across commit sizes.

The r16 change applies `df.hint("rebalance")` to data-group writes so a
tiny commit arriving in N upstream partitions does not land as N
~30-row files (which the per-file-planned changefeed then fans into N
Python tasks). This tool measures both ends:

* LARGE commit (default 20M rows, ~280 MB parquet): the un-gated hint
  ("force") pays a full extra shuffle of the delta and — under AQE's
  default parallelism-first coalescing, which targets bytes/cores, not
  the 64 MB advisory — leaves the file count unchanged, i.e. pure cost
  (measured 1.7x vs "off"). The size gate (default mode "1") must read
  the parquet-backed delta's real size estimate and skip the hint, so
  "gated" ≈ "off" here.
* SMALL commit (100k rows forced through 32 partitions): the gate must
  fire, collapsing 32 tiny files into 1 ("gated" ≈ "force" ≈ 1 file,
  "off" = 32 files).

Arms share one session and interleave passes so host phase cannot bias
a whole arm. The delta is parquet-backed (written once in setup, read
back), the realistic bulk-load shape whose plan statistics are real —
a localCheckpoint'd delta reports the unknown-stats sentinel and the
gate deliberately keeps the hint for those (micro-batch shape).

Run: python tools/ab_write_rebalance.py [rows] [passes]
"""

from __future__ import annotations

import importlib
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("off", "force", "gated")
_ENV = {"off": "0", "force": "force", "gated": "1"}


def _part_files(root: str) -> list[int]:
    sizes = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and f.startswith("part-"):
                sizes.append(os.path.getsize(os.path.join(dirpath, f)))
    return sorted(sizes)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from file_stream_import_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ab_write_rebalance")
    spark.sparkContext.setLogLevel("ERROR")

    import file_stream_import_spark.io.versioned as V

    base = tempfile.mkdtemp(prefix="ab_wreb_")
    results: dict[str, list[float]] = {a: [] for a in ARMS}
    files: dict[str, list[int]] = {}
    try:
        # setup (untimed): materialize the delta as parquet and read it
        # back, so the optimizer sees real file-size statistics
        src = os.path.join(base, "src")
        (
            spark.range(rows)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 1024).cast("int").alias("grp"),
                (F.col("id") * 0.37).alias("v"),
                F.concat(F.lit("pay_"), (F.col("id") % 9973)).alias(
                    "tag"
                ),
            )
            .write.parquet(src)
        )
        delta = spark.read.parquet(src)
        est = int(
            delta._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        print(
            f"delta estimate {est/1e6:.0f} MB vs gate "
            f"{V._WRITE_REBALANCE_MAX_BYTES/1e6:.0f} MB -> gated arm "
            + ("skips" if est > V._WRITE_REBALANCE_MAX_BYTES else "rebalances")
        )

        # warm-up (discarded)
        t = V.VersionedTable(os.path.join(base, "warm"))
        t.commit(delta, mode="overwrite")

        for i in range(n_passes):
            for arm in ARMS:
                os.environ["SPARK_GRAFT_WRITE_REBALANCE"] = _ENV[arm]
                importlib.reload(V)  # flag is read at import
                path = os.path.join(base, f"{arm}_{i}")
                tab = V.VersionedTable(path)
                t0 = time.perf_counter()
                tab.commit(delta, mode="overwrite")
                wall = time.perf_counter() - t0
                results[arm].append(round(wall, 3))
                if arm not in files:
                    files[arm] = _part_files(path)
                shutil.rmtree(path, ignore_errors=True)
                print(f"  [{i}] {arm}: {wall:.3f}s", file=sys.stderr)

        print(f"LARGE commit ({rows} rows):")
        for arm in ARMS:
            r, f = results[arm], files[arm]
            print(
                f"  {arm:5s}: passes={r} min={min(r):.3f} median="
                f"{statistics.median(r):.3f} | files={len(f)} "
                f"sizes_mb=[{f[0]/1e6:.1f}..{f[-1]/1e6:.1f}]"
            )
        print(
            "  force/off (min): "
            f"{min(results['force'])/min(results['off']):.2f}x   "
            "gated/off (min): "
            f"{min(results['gated'])/min(results['off']):.2f}x"
        )

        # SMALL commit: the gate must still fire
        small = delta.limit(100_000).repartition(32)
        print("SMALL commit (100k rows via 32 partitions):")
        for arm in ARMS:
            os.environ["SPARK_GRAFT_WRITE_REBALANCE"] = _ENV[arm]
            importlib.reload(V)
            path = os.path.join(base, f"small_{arm}")
            tab = V.VersionedTable(path)
            tab.commit(small, mode="overwrite")
            f = _part_files(path)
            shutil.rmtree(path, ignore_errors=True)
            print(f"  {arm:5s}: files={len(f)}")
    finally:
        os.environ["SPARK_GRAFT_WRITE_REBALANCE"] = "1"
        importlib.reload(V)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
