"""Generate plans/r17 before/after .explain("formatted") evidence for
the declared queries touched in round 17.

The "before" arm is reproduced from this tree via the preserved env
knobs (each r17 change keeps its old path behind one), so both files
regenerate from the committed code:

  * dedup_embedding_cosine / ann_cosine_ivf_knn:
    SPARK_GRAFT_COSINE_KERNEL=jvm restores the r16 anti-join arm
    (ivf norm-reuse has no knob — its before is plan-only: one extra
    aggregate fold in the corpus projection).

Usage: python tools/gen_r17_plans.py before|after [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

NAMES = [
    "dedup_embedding_cosine",
    "ann_cosine_ivf_knn",
]

KNOBS_BEFORE = {
    "SPARK_GRAFT_COSINE_KERNEL": "jvm",
}


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or NAMES
    assert suffix in ("before", "after"), suffix
    if suffix == "before":
        os.environ.update(KNOBS_BEFORE)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent

    qs = ent.queries()
    sf = "/root/testdata/sf0.01"
    os.makedirs("plans/r17", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)
        path = f"plans/r17/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, len(txt), "bytes")


if __name__ == "__main__":
    main()
