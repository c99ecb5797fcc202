"""Driver-form oracle check for a subset (or all) of the declared
queries: plain SparkSession (the driver builds its own, not our tuned
one), each query at the given SF vs its DuckDB oracle.

Usage: python tools/oracle_check.py [substr ...] [--sf 0.01]
  With no substrings, checks every registered query.
"""

from __future__ import annotations

import math
import sys

import duckdb


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent

    sf_dir = f"/root/testdata/sf{sf}"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = ent.queries(), ent.oracle_sql()

    def norm(pdf):
        cols = sorted(pdf.columns)
        out = []
        for _, r in pdf[cols].iterrows():
            row = []
            for c in cols:
                v = r[c]
                if hasattr(v, "item"):
                    v = v.item()
                if isinstance(v, float):
                    v = "nan" if math.isnan(v) else f"{v:.6f}"
                row.append(str(v))
            out.append(tuple(row))
        return sorted(out)

    names = sorted(
        n for n in qs if not args or any(a in n for a in args)
    )
    fails = []
    for name in names:
        try:
            sp = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print("ERR ", name, repr(e)[:200])
            continue
        if name in osql:
            dk = con.sql(osql[name]).df()
            ok = sorted(sp.columns) == sorted(dk.columns) and norm(
                sp
            ) == norm(dk)
            if not ok:
                fails.append(name)
            print(("OK  " if ok else "FAIL"), name, len(sp))
        else:
            print("ROWS", name, len(sp))
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
