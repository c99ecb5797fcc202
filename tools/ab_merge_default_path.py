"""A/B: default MERGE fast path (anti-join + union) vs the unified
_merge_clauses path (one left-outer join + anti-join insert side) on
bench.py's lake_merge_upsert shape — sf0.1 orders, 8 groups, ~10k
update keys. Decides ADVICE r10 (low): the two paths disagree on
duplicate-KEY target rows, so either we unify (route the default
through _merge_clauses and eat whatever this measures) or we document.

Run: python tools/ab_merge_default_path.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from file_stream_import_spark.io.versioned import (  # noqa: E402
    VersionedTable,
    merge_into,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build(spark, tmp):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    kmax = int(orders.agg(F.max("k")).first()[0])
    step = (kmax + 8) // 8
    t = VersionedTable(os.path.join(tmp, "t"))
    for i in range(8):
        t.commit(
            orders.filter(F.col("k").between(i * step, (i + 1) * step - 1)),
            mode="append" if i else "overwrite",
        )
    upd = (
        orders.filter(
            F.col("k").between(step, step + 5_000 * 4) & (F.col("k") % 4 == 0)
        )
        .withColumn("status", F.lit("MERGED"))
        .localCheckpoint(eager=True)
    )
    return t, upd


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_merge_default_path")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for label, kwargs in [
        ("default(anti+union)", {}),
        # matched_condition=lit(True) forces _merge_clauses with
        # semantics identical to the default update_all clauses
        ("clauses(left_outer)", {"matched_condition": F.lit(True)}),
    ]:
        best = None
        for _ in range(3):
            tmp = tempfile.mkdtemp(prefix="ab_merge_")
            try:
                t, upd = build(spark, tmp)
                t0 = time.time()
                merge_into(t, spark, upd, key="k", **kwargs)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        print(f"{label}: best-of-3 {best:.3f}s")


if __name__ == "__main__":
    main()


def threeway(t, spark, upd, keys=("k",)):
    """Duplicate-preserving default-clause merge from narrow joins:
    untouched targets (anti) + matched targets replaced by source
    values per-target-row (inner, selecting source cols) + inserts
    (anti). Same result as _merge_clauses with default clauses."""
    from file_stream_import_spark.io import versioned as V

    keys = list(keys)
    base = t.latest_version()
    m = t._load_manifest(base)
    declared = V._schema_from_json(m["schema"])
    types = {f.name: f.dataType for f in declared.fields}
    touched, untouched, _ = V._split_touched_groups(
        m, upd, keys, types, table_path=t.path
    )
    current = t._read_groups(spark, m, touched)
    cols = [f.name for f in declared.fields]
    tt = current.alias("t")
    ss = upd.alias("s")
    updated = tt.join(ss, keys, "inner").select(
        *[F.col(f"s.{c}").alias(c) for c in cols]
    )
    kept = tt.join(ss, keys, "left_anti").select(*cols)
    inserts = ss.join(tt, keys, "left_anti").select(*cols)
    merged = kept.unionByName(updated).unionByName(inserts)
    import uuid as _uuid

    group = os.path.join("data", _uuid.uuid4().hex)
    V._write_group_with_stats(merged, os.path.join(t.path, group))
    # stop before publish: we only time the plan+write, the manifest
    # publish cost is identical across variants

