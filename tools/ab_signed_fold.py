#!/usr/bin/env python3
"""A/B: direct signed MV fold vs keyed-CDF fold at LARGE delta size
(r16 optimization 2, change #10).

The bench's 2k-row delta is driver/scheduling-bound, so the knob's
win there mostly reflects removed stage-jobs. This A/B sizes the
DATA-side claim: at a multi-million-row delta the keyed path pays a
per-key shuffle + per-key (Object/Sort) aggregate + the group shuffle,
while the signed fold pays the group shuffle alone with vectorized
HashAggregates — so the gap should WIDEN with delta size.

One source table (k, status, bucket, cents), bootstrapped fine MV on
(status, bucket); each measured wave merges a fixed fraction of keys
with bumped cents and refreshes under SPARK_GRAFT_MV_SIGNED_FOLD
toggled via the module knob, alternating A/B/A/B per wave to cancel
host phase. Reports per-arm refresh wall seconds.

Run: python tools/ab_signed_fold.py [--rows 8000000] [--delta 2000000]
     [--waves 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--delta", type=int, default=2_000_000)
    ap.add_argument("--waves", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from file_stream_import_spark.session import get_spark
    from file_stream_import_spark.io.versioned import (
        VersionedTable,
        merge_into,
    )
    from file_stream_import_spark.operators import mv as M

    spark = get_spark(app_name="ab_signed_fold")
    tmp = tempfile.mkdtemp(prefix="ab_sf_")
    out = {"rows": args.rows, "delta": args.delta, "arms": {}}
    try:
        base = (
            spark.range(args.rows)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("s"), (F.col("id") % 7)).alias("status"),
                (F.col("id") % 256).cast("int").alias("bucket"),
                (F.col("id") * 13 % 100_000).alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
        upd = base.filter(F.col("k") < args.delta).localCheckpoint(
            eager=True
        )
        t = VersionedTable(os.path.join(tmp, "t"))
        t.commit(base, mode="overwrite")
        view = VersionedTable(os.path.join(tmp, "mv"))
        kw = dict(
            name="ab", group_cols=["status", "bucket"],
            sum_cols=["cents"], key="k",
        )
        M.refresh_mv(t, view, spark, **kw)
        wave = 0
        times: dict = {"signed": [], "keyed": []}
        for w in range(args.waves):
            for arm, knob in (("keyed", "0"), ("signed", "1")):
                wave += 1
                merge_into(
                    t, spark,
                    upd.withColumn(
                        "cents", F.col("cents") + F.lit(wave)
                    ),
                    key="k", source_unique=True,
                )
                old = M._SIGNED_FOLD
                M._SIGNED_FOLD = knob
                try:
                    t0 = time.perf_counter()
                    M.refresh_mv(t, view, spark, **kw)
                    dt = time.perf_counter() - t0
                finally:
                    M._SIGNED_FOLD = old
                times[arm].append(round(dt, 3))
                print(f"wave {wave} {arm}: {dt:.3f}s", file=sys.stderr)
        for arm, ts in times.items():
            out["arms"][arm] = {"passes": ts, "min": min(ts)}
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
