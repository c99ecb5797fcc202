#!/usr/bin/env python3
"""Regenerate queries/driver_evidence.json from CORRECTNESS_r*.json.

Run this at the START of a round, BEFORE editing any query code: the
recorded source hashes are only valid evidence if the working tree is
unchanged since the driver round they describe. Queries whose code later
changes hash-mismatch and sort to the front of the registry (rank 0 in
queries/__init__._ordered), so they get re-verified next round.

Usage: python tools/update_evidence.py [--stale NAME ...]

--stale marks names whose code is KNOWN to have changed between their
last driver row and now (e.g. fixed after the run) — their hash is
recorded as a sentinel so they re-verify.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", nargs="*", default=[])
    args = ap.parse_args()

    from file_stream_import_spark import queries as reg

    reg.load_all()

    evidence: dict[str, dict] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if name not in reg.QUERIES:
                continue
            # A failed row is not evidence — leave the query at rank 0.
            # hash_match must pass too: a hash-FAIL whose code is never
            # edited would otherwise be sorted away and never rechecked.
            ok = (
                row.get("err") in (None, "no_oracle")
                and row.get("rows_match") in (True, None)
                and row.get("hash_match") in (True, None)
            )
            if not ok:
                evidence.pop(name, None)
                continue
            evidence[name] = {"round": rnd, "src_hash": reg._src_hash(name)}

    for name in args.stale:
        if name in evidence:
            evidence[name]["src_hash"] = "changed-after-check"

    out = Path(reg.__file__).with_name("driver_evidence.json")
    out.write_text(json.dumps(evidence, indent=1, sort_keys=True) + "\n")
    by_round: dict[int, int] = {}
    for row in evidence.values():
        by_round[row["round"]] = by_round.get(row["round"], 0) + 1
    print(f"wrote {out} — {len(evidence)} entries, by round: {by_round}")
    missing = sorted(set(reg.QUERIES) - set(evidence))
    stale = [n for n in evidence if evidence[n]["src_hash"] == "changed-after-check"]
    print(f"rank-0 (unchecked): {missing}")
    print(f"rank-0 (marked stale): {stale}")


if __name__ == "__main__":
    main()
