"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end including the action (count of the result —
forces full execution without driver-side materialization of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


# topk_per_group stays LAST: it is the one pandas-backed headline query,
# and the Python worker pool it spawns (held alive by worker.reuse)
# oversubscribes local-mode CPUs, skewing any JVM query timed after it.
HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_unshipped_orders",
    "q5_region_revenue",
    "agg_distinct_counts",
    "agg_rollup",
    "join_left_outer",
    "join_range_band",
    "window_running",
    "json_extract",
    "dedup_last_writer_wins",
    "topk_per_group",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from file_stream_import_spark.queries import all_queries
    from file_stream_import_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM (codegen, shuffle machinery) + parquet footer caches on
    # the tables the headline queries actually scan; excluded from timings
    for t in ("lineitem", "orders", "customer", "region"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    # Two passes, report the per-query min: the second pass absorbs
    # one-time costs (codegen compile, Python worker fork for the pandas
    # query) and host-level noise, so the recorded number is the engine's
    # steady cost, not the environment's worst case.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.count()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            print(f"  [{_pass}] {name}: {elapsed:.3f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
