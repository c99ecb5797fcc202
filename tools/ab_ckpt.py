#!/usr/bin/env python3
"""Scale evidence for the r13 history-checkpoint SEGMENT LOG
(post-round-13 ledger #4): per-commit checkpoint upkeep writes only
the delta rows (one small segment file), so its cost is FLAT in
history size; the pre-r13 monolithic design rewrote the whole
checkpoint every _CKPT_EVERY commits, so its per-extension cost grew
linearly with commit count.

Drives the metadata layer directly through _publish (no Spark — same
harness as tests/test_metadata_scale.py) at three history sizes and
times the cumulative checkpoint upkeep for
  * seg   — the shipped segment-log extension (+ its periodic fold)
  * mono  — an in-tool emulation of the pre-r13 whole-file rewrite
            (read merged rows, append delta, rewrite one file)
measured over the LAST 4 extensions of each run, where the monolithic
arm's O(history) rewrite is at its largest.

Usage: python tools/ab_ckpt.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from file_stream_import_spark.io import versioned as V  # noqa: E402
from file_stream_import_spark.io.versioned import VersionedTable  # noqa: E402

SCHEMA = (
    '{"type":"struct","fields":[{"name":"k","type":"long",'
    '"nullable":true,"metadata":{}}]}'
)


def publish_n(t: VersionedTable, n: int, upkeep) -> list[float]:
    """n publishes; returns the wall seconds of each checkpoint
    extension (the upkeep callable is invoked exactly where _publish
    calls _extend_checkpoint)."""
    times: list[float] = []
    parent = None
    orig = VersionedTable._extend_checkpoint
    try:
        def timed(self, upto):
            t0 = time.perf_counter()
            upkeep(self, upto)
            times.append(time.perf_counter() - t0)

        VersionedTable._extend_checkpoint = timed
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
    finally:
        VersionedTable._extend_checkpoint = orig
    return times


def mono_extend(self: VersionedTable, upto: int) -> None:
    """The pre-r13 monolithic extension: read ALL rows, append the
    delta, rewrite the whole checkpoint file."""
    ck = self._read_checkpoint_base()
    rows = list(ck["rows"])
    for v in range(int(ck["upto"]) + 1, upto + 1):
        rows.append(V._history_row(v, self._load_manifest(v)))
    tmp = V._ckpt_path(self._meta_root) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"upto": upto, "rows": rows}, f)
    os.replace(tmp, V._ckpt_path(self._meta_root))


SEG_EXTEND = VersionedTable._extend_checkpoint  # the shipped path


def run(n_commits: int, arm: str) -> dict[str, float]:
    root = tempfile.mkdtemp(prefix=f"ab_ckpt_{arm}_{n_commits}_")
    try:
        t = VersionedTable(root)
        upkeep = mono_extend if arm == "mono" else SEG_EXTEND
        times = publish_n(t, n_commits, upkeep)
        # median isolates the steady-state extension (the segment
        # arm's periodic fold and post-fold base parse are the
        # amortized spikes; the TOTAL captures them honestly)
        med = sorted(times)[len(times) // 2]
        return {
            "median_ext_ms": round(med * 1000, 3),
            "total_upkeep_ms": round(sum(times) * 1000, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out: dict[str, dict[str, dict[str, float]]] = {}
    for n in (1024, 4096, 16384):
        out[str(n)] = {
            "seg": run(n, "seg"),
            "mono": run(n, "mono"),
        }
    small, large = out["1024"], out["16384"]
    print(
        json.dumps(
            {
                "tool": "ab_ckpt",
                "per_history_size": out,
                # steady-state extension growth at 16x history: flat
                # for the segment log, linear for the monolith
                "seg_median_growth_16x": round(
                    large["seg"]["median_ext_ms"]
                    / max(small["seg"]["median_ext_ms"], 1e-9),
                    2,
                ),
                "mono_median_growth_16x": round(
                    large["mono"]["median_ext_ms"]
                    / max(small["mono"]["median_ext_ms"], 1e-9),
                    2,
                ),
                "total_win_16k": round(
                    large["mono"]["total_upkeep_ms"]
                    / max(large["seg"]["total_upkeep_ms"], 1e-9),
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
