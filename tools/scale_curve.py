"""sf1 scale-curve sanity run (VERDICT r4 #7).

No sf1 fixture exists, so build one at /tmp/sf1 by unioning 10
key-shifted copies of sf0.1 (order/cust/supp keys offset per copy;
dimension tables and value distributions unchanged — the same recipe
TPC-H dbgen uses across scale factors, applied to the driver's own
fixture rather than novel synthetic data). Then time the five most
expensive headline queries at sf0.1 and sf1 in ONE session and print
the time ratio per query. A healthy distributed plan shows ~linear
growth (ratio ~= 10 +- constant overhead); a super-linear ratio flags a
hidden quadratic or driver-side term the sf0.1 bench can't see.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
COPIES = 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# key columns to shift per copy, per table (dims stay identical)
SHIFT = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    # user_id shifts too: per-user event density then matches sf0.1, so
    # per-user joins (attribution) scale linearly instead of
    # quadratically on 10 stacked copies of the same users
    "events": ["event_id", "user_id"],
    # 10 key-shifted copies keep the VALUE distribution identical, so
    # corpus-level spectra (PCA) are the same problem at 10x rows —
    # unlike near-dup pair queries, which this recipe can't scale
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def build(spark: SparkSession) -> None:
    os.makedirs(DST, exist_ok=True)
    offsets: dict[str, int] = {}
    for t, cols in SHIFT.items():
        if os.path.exists(f"{DST}/{t}.parquet"):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")

        def offset_key(c: str) -> str:
            # TPC-H columns share offsets across tables via their
            # single-letter-prefix stem (l_orderkey/o_orderkey ->
            # 'orderkey'); multi-letter prefixes (doc_id, event_id,
            # user_id) are DISTINCT keys — collapsing them to 'id'
            # would shift events by the documents offset and collide
            # event_ids across copies.
            head, _, tail = c.partition("_")
            return tail if len(head) == 1 else c

        for c in cols:
            key = offset_key(c)
            if key not in offsets:
                offsets[key] = df.agg(F.max(c)).first()[0] + 1
        parts = []
        for i in range(COPIES):
            cp = df
            for c in cols:
                off = offsets[offset_key(c)]
                cp = cp.withColumn(c, F.col(c) + F.lit(i * off))
            parts.append(cp)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")
    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_curve")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    from file_stream_import_spark.queries import all_queries

    qs = all_queries()
    names = [
        "q1_pricing_summary",
        "q3_unshipped_orders",
        "q5_region_revenue",
        "join_range_band",
        "topk_per_group",
        # round-5 additions (documents scaled too)
        "text_token_entropy",
        "price_trend_by_priority",
        "retention_cohorts_monthly",
        "schema_profile",
        # round-5b additions (events scaled; near-dup PAIR queries are
        # deliberately absent — a corpus of 10 key-shifted copies
        # genuinely contains ~copies^2 near-dup pairs, so their growth
        # measures the duplicated corpus, not the operator)
        "daily_revenue_acf",
        "benford_leading_digit",
        "attribution_linear",
        "source_logodds_tokens",
        "heavy_hitters_users",
        "bloom_semi_filter",
        "variant_props_stats",
        # round-5c additions
        "hll_mergeable_union",
        "dow_seasonality",
        "cusum_daily_orders",
        "asof_tolerance_lookup",
        "bootstrap_ci_revenue",
        "multimodal_wav_decode",
        "multimodal_png_roundtrip",
        "embedding_top_pc",
        # round-6 additions (near-dup pair caveat does not apply: none
        # of these are pair queries over the duplicated corpus)
        "stream_attribution_full_outer",
        "spearman_daily_corr",
        "runs_test_daily_revenue",
        "skyline_orders",
        "gini_customer_revenue",
        "text_hashing_vectorizer",
        "segment_priority_association",
        "cms_event_counts",
        "theil_sen_monthly",
        "mann_kendall_trend",
        "asof_nearest_purchase",
        "multimodal_bmp_roundtrip",
        "window_funnel_levels",
        "survival_km_reorder",
        "lakehouse_upsert_lifecycle",
        "stream_attribution_semi",
        "forecast_backtest_metrics",
        "part_cooccurrence_topk",
        "rolling_corr_30d",
        "cdc_apply_into_lake",
        "lake_snapshot_diff",
        # r12 additions: the row-level CDF path over a multi-commit
        # range (the one r11 surface without its own scale row), the
        # rebase publish, the streaming CDF, and branch-aware CDC —
        # each builds its own lake from the sf_dir's orders, so sf1
        # means 10x rows AND 10x per-commit delta
        "lake_row_changes",
        "lake_rebase_publish",
        "stream_rewrite_cdf",
        "lake_branch_changes",
    ]
    # optional: restrict to names passed on the command line (re-running
    # the full list re-measures queries whose curve is already recorded)
    if len(sys.argv) > 1:
        unknown = sorted(set(sys.argv[1:]) - set(names))
        if unknown:
            raise SystemExit(f"unknown query name(s): {unknown}")
        names = [n for n in names if n in sys.argv[1:]]
    results = {}
    for name in names:
        fn = qs[name]
        times = {}
        for sf_label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[sf_label] = best
        ratio = times["sf1"] / times["sf0.1"]
        results[name] = (times["sf0.1"], times["sf1"], ratio)
        print(
            f"{name}: sf0.1 {times['sf0.1']:.3f}s  sf1 {times['sf1']:.3f}s  "
            f"ratio {ratio:.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
