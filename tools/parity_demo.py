"""Reference-parity demo: the three reference lifecycles composed into
ONE runnable end-to-end pipeline (SURVEY.md §3.1–3.3), lake edition.

    generate (O13)  →  CSV drop dir  →  Structured Streaming ingest
    (O1/O2)  →  exactly-once MERGE into the versioned table (O5, the
    ON CONFLICT upsert as a lakehouse commit)  →  count / paginate /
    JSON page served from the latest snapshot (O9/O7/O8)

Reference shape being mirrored (all public, /root/reference):
  * cmd/gen_file/main.go:14-70 — the 1M-row locations generator
    (here: io/generator.py, seeded and oracle-checkable);
  * internal/writer/writer.go:40-129 — HTTP POST /process CSV ingest
    (here: a drop directory watched by Structured Streaming — the
    idiomatic Spark replacement for a push endpoint);
  * internal/db/db.go:43-80 — INSERT ... ON CONFLICT (locid) DO UPDATE
    (here: io/versioned.py::merge_into through the exactly-once
    foreachBatch writer, so replays of a micro-batch can never
    double-apply — the guarantee the reference's hand-rolled chunked
    writer does NOT have);
  * internal/db/db.go:111-137 — LIMIT/OFFSET page as one JSON array
    (here: operators/paginate.py with an explicit total order).

Each wave runs as an availableNow streaming pass; the second wave
re-draws payloads for the first `--update-rows` locids (the reference's
re-import scenario), and the demo proves: row count unchanged (updates,
not inserts), the old payload still readable via time travel, and the
JSON page served from the post-update snapshot.

Run: python tools/parity_demo.py [--rows 200000] [--update-rows 50000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--update-rows", type=int, default=50_000)
    args = ap.parse_args()

    from file_stream_import_spark.io.csv_ingest import (
        ingest_locations_stream,
    )
    from file_stream_import_spark.io.generator import (
        generate_locations,
        write_locations_csv,
    )
    from file_stream_import_spark.io.versioned import (
        VersionedTable,
        make_idempotent_table_writer,
    )
    from file_stream_import_spark.operators.paginate import (
        paginate,
        to_json_page,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("parity_demo")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="parity_demo_")
    drop_dir = os.path.join(work, "drop")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(drop_dir)
    table = VersionedTable(os.path.join(work, "locations_lake"))
    writer = make_idempotent_table_writer(
        table, "parity_ingest", key="locid"
    )

    def drop_wave(tag: str, df) -> None:
        staged = os.path.join(work, f"wave_{tag}")
        write_locations_csv(df, staged)
        for i, name in enumerate(sorted(os.listdir(staged))):
            if name.endswith(".csv"):
                shutil.move(
                    os.path.join(staged, name),
                    os.path.join(drop_dir, f"{tag}-{i}.csv"),
                )

    def ingest_pass() -> float:
        t0 = time.time()
        q = (
            ingest_locations_stream(spark, drop_dir)
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.time() - t0

    try:
        # O13: the reference's generator design point, scaled by --rows
        print(f"[1/4] generate: {args.rows} + {args.update_rows} rows")
        drop_wave("initial", generate_locations(spark, args.rows, seed=0))

        print("[2/4] stream pass 1: CSV drop -> exactly-once lake MERGE")
        s1 = ingest_pass()
        v1 = table.latest_version()
        n1 = table.read(spark).count()
        print(f"      {n1} rows in snapshot v{v1} ({s1:.1f}s)")

        # the reference re-import: same locids, re-drawn payloads
        drop_wave(
            "update",
            generate_locations(spark, args.update_rows, seed=1),
        )
        print("[3/4] stream pass 2: update wave (ON CONFLICT DO UPDATE)")
        s2 = ingest_pass()
        v2 = table.latest_version()
        n2 = table.read(spark).count()
        print(f"      {n2} rows in snapshot v{v2} ({s2:.1f}s)")
        assert n2 == args.rows, "updates must not add rows"

        # replay safety: re-delivering the processed batches is a no-op
        before = table.latest_version()
        ingest_pass()
        assert table.latest_version() == before, "replay committed!"
        print("      replayed pass skipped (txn watermark) — exactly-once")

        # O9 count / O7 page / O8 JSON — served from the latest snapshot
        print("[4/4] read API: count + page 3 (limit 10) as JSON")
        probe = "LOC000000000007"
        old = (
            table.read(spark, version=v1)
            .filter(F.col("locid") == probe)
            .first()
        )
        new = (
            table.read(spark, version=v2)
            .filter(F.col("locid") == probe)
            .first()
        )
        assert old["locname"] != new["locname"] or (
            old["business"] != new["business"]
        ), "update wave should have re-drawn this payload"
        print(f"      time travel: {probe} v{v1}={old['locname']!r} "
              f"-> v{v2}={new['locname']!r}")
        page = paginate(
            table.read(spark), order_by=["locid"], limit=10, offset=20
        )
        js = to_json_page(page)
        print(f"      page json ({len(js)} bytes): {js[:120]}...")
        print(f"history: {[h['mode'] for h in table.history()]}")
        print("PARITY DEMO OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
