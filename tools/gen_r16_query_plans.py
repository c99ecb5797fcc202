"""Regenerate the plans/r16 *_after.txt evidence for the DECLARED
queries touched by the r16 session-4 changes (#11 HOF-lambda
projection, #13 hoisted norms + anti join). The *_before.txt files are
the round-start captures (pre-edit tree) and are not regenerable from
this tree — do not overwrite them.

Usage: python tools/gen_r16_query_plans.py [suffix]   (default: after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

NAMES = [
    # change #11 (token-array projection out of HOF lambdas)
    "dedup_minhash_lsh",
    "text_winnow_fingerprints",
    "text_repetition",
    "chunk_dedup_exact",
    # change #13 (hoisted norms, NOT-EXISTS anti join)
    "dedup_embedding_cosine",
    "ann_cosine_lsh_pairs",
    "ann_cosine_ivf_knn",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
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
    for name in NAMES:
        df = qs[name](spark, sf)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        out = os.path.join("plans", "r16", f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print("wrote", out, len(plan))


if __name__ == "__main__":
    main()
