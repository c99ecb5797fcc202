"""Physical-plan regression tests: the scale properties the engine is
designed around (pushdown, pruning, broadcast selection, no accidental
cartesian products, local top-k prune) must survive refactors — a query
that still returns correct rows but loses its PushedFilters would pass
the oracle and silently become a 100 TB full scan."""

from __future__ import annotations

import pytest

from file_stream_import_spark.queries import all_queries

QUERIES = all_queries()


def physical_plan(spark, sf_dir, name: str) -> str:
    qe = QUERIES[name](spark, sf_dir)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # formatted mode prints full PushedFilters / ReadSchema (toString()
    # abbreviates them)
    return qe.explainString(mode)


def read_schema_cols(plan: str) -> list[str]:
    import re

    cols = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.append([f.split(":")[0] for f in m.group(1).split(",") if f])
    return cols


class TestPushdownAndPruning:
    def test_q6_filters_reach_scan_and_schema_is_minimal(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q6_forecast_revenue")
        assert "PushedFilters: [" in plan
        assert "GreaterThanOrEqual(l_shipdate" in plan
        assert "LessThan(l_shipdate" in plan
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        }

    def test_q1_prunes_to_seven_columns(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q1_pricing_summary")
        (cols,) = read_schema_cols(plan)
        assert len(cols) == 7

    def test_dimension_filters_push_into_scans(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q3_unshipped_orders")
        assert "EqualTo(c_mktsegment,BUILDING)" in plan


class TestJoinStrategies:
    def test_star_joins_broadcast_at_test_sf(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q5_region_revenue")
        assert plan.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in plan

    def test_no_cartesian_in_fact_joins(self, spark, sf_dir):
        for name in (
            "q7_nation_volume",
            "q9_product_profit",
            "q18_large_orders",
            "join_range_band",
        ):
            assert "CartesianProduct" not in physical_plan(spark, sf_dir, name), name

    def test_semi_and_anti_join_types(self, spark, sf_dir):
        assert "LeftSemi" in physical_plan(spark, sf_dir, "q4_priority_late_ship")
        assert "LeftAnti" in physical_plan(spark, sf_dir, "q22_idle_customers")

    def test_range_join_is_bucketized_hash_not_nested_loop(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "join_range_band")
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTopKAndOrder:
    def test_topk_prunes_locally_before_window(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "topk_per_group")
        assert "MapInPandas" in plan

    def test_knn_partial_topk_shuffles_only_survivors(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "knn_topk_partial")
        # scoring side: query set broadcast, vectors never shuffled
        assert plan.count(") BroadcastExchange") == 1
        # exactly ONE hash shuffle (") Exchange" is the node-detail
        # header; the distribution is an Arguments: line in formatted
        # mode), keyed on query_id, and it sits ABOVE the per-batch
        # local top-k (tree prints root-first) — the full scored-pair
        # set never crosses the wire
        assert plan.count(") Exchange") == 1
        assert "hashpartitioning(query_id" in plan
        assert "MapInPandas" in plan
        assert plan.index("Exchange (") < plan.index("MapInPandas (")

    def test_top_n_uses_take_ordered(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q10_returned_items")
        assert "TakeOrderedAndProject" in plan


class TestAggregation:
    def test_q1_aggregate_is_partial_then_final(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "q1_pricing_summary")
        # map-side combine: partial aggregate below the exchange, final above
        assert "partial_sum" in plan
        assert "hashpartitioning(l_returnflag" in plan

    def test_grouping_sets_single_expand(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "agg_grouping_sets")
        # exactly one Expand node (") Expand" is the node-detail header)
        assert plan.count(") Expand") == 1


class TestScalePathOperators:
    def test_ivf_assignment_is_pure_projection(self, spark, sf_dir):
        # the coarse quantizer lives in the task closure — if assignment
        # ever grows an Exchange it has regressed to a join-based argmax
        from file_stream_import_spark.io.tables import load_table
        from file_stream_import_spark.operators import similarity

        e = load_table(spark, sf_dir, "embeddings")
        cents = similarity.ivf_centroids(e, 4)
        plan = (
            similarity.ivf_assign(e, cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_q21_single_fact_shuffle_no_self_joins(self, spark, sf_dir):
        # EXISTS/NOT-EXISTS collapse into window aggregates: lineitem must
        # be scanned once, not three times (l1/l2/l3 of the SQL form)
        plan = physical_plan(spark, sf_dir, "q21_waiting_suppliers")
        assert plan.count("lineitem.parquet") == 1

    def test_gapfill_spine_is_generated_not_joined_wide(self, spark, sf_dir):
        # the dense grid comes from sequence()+explode (Generate node),
        # never from a driver-collected range or a cross join
        plan = physical_plan(spark, sf_dir, "resample_hourly_gapfill")
        assert ") Generate" in plan and "explode(sequence(" in plan
        assert "CartesianProduct" not in plan

    def test_train_shuffle_has_no_corpus_wide_single_partition(self, spark, sf_dir):
        # the global rank is two-level: the full corpus is ranked per
        # hash-prefix bucket and only the 256-row bucket-count table may
        # pass through a SinglePartition exchange (for its cum-sum); the
        # base-offset join must broadcast, never shuffle the corpus
        plan = physical_plan(spark, sf_dir, "train_shuffle")
        assert "BroadcastHashJoin" in plan
        # formatted mode spells the exchange's distribution in its
        # Arguments: detail line; exactly one (the 256-row cum-sum)
        assert plan.count("SinglePartition") == 1


class TestRound3Additions:
    def test_weighted_sample_prunes_topk_before_shuffle(self, spark, sf_dir):
        # Spark's rank-limit pushdown (WindowGroupLimit) must keep the
        # local top-5-per-group prune BELOW the exchange: only ≤5k rows
        # per upstream partition cross the wire, not the fact table
        plan = physical_plan(spark, sf_dir, "weighted_sample_topk")
        assert plan.count(") WindowGroupLimit") == 2  # partial + final
        # tree prints root-first: final WindowGroupLimit above the
        # exchange, the PARTIAL one below it (leafward) — i.e. the local
        # prune happens before rows cross the wire
        tree = plan.split("\n\n")[0]
        exch = tree.index("Exchange (")
        wgls = [i for i in range(len(tree)) if tree.startswith("WindowGroupLimit (", i)]
        assert len(wgls) == 2
        assert wgls[0] < exch < wgls[1]
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
        }

    def test_embedding_quantize_broadcasts_dim_stats(self, spark, sf_dir):
        # the 64-row calibration table is the ONLY broadcast; the exploded
        # values are never shuffled for the join
        plan = physical_plan(spark, sf_dir, "embedding_quantize_int8")
        assert plan.count(") BroadcastExchange") == 1
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_constraint_check_single_scan_per_table(self, spark, sf_dir):
        # same-table constraints share one scan: orders appears twice
        # (counter pass + FK anti-join probe), every other table once
        plan = physical_plan(spark, sf_dir, "constraint_check")
        assert plan.count("orders.parquet") == 2
        assert plan.count("lineitem.parquet") == 1
        assert plan.count("events.parquet") == 1
        assert plan.count("documents.parquet") == 1
        assert "LeftAnti" in plan

    def test_zipf_window_sees_only_distinct_terms(self, spark, sf_dir):
        # the top-100 rank runs AFTER the (lang, tok) aggregate — the
        # window input is vocabulary-sized, not corpus-sized — and the
        # count aggregate is partial/final (map-side combine)
        plan = physical_plan(spark, sf_dir, "text_zipf_fit")
        assert "partial_count" in plan
        agg = plan.index("HashAggregate")
        # root-first print order: final projection/window above, the
        # term-count aggregate at the leafward end below the window sort
        assert plan.index("WindowGroupLimit") < agg or "WindowGroupLimit" in plan

    def test_bigram_lm_vocab_is_one_row_broadcast(self, spark, sf_dir):
        # V joins in via a 1-row broadcast nested loop (constant), never a
        # shuffle; the per-bigram count joins hash on (w1, w2)
        plan = physical_plan(spark, sf_dir, "doc_bigram_logprob")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_sessionize_single_user_partitioning(self, spark, sf_dir):
        # lag window, running sum, and final aggregate all share ONE
        # hashpartitioning(user_id) — exactly one exchange in the plan
        plan = physical_plan(spark, sf_dir, "sessionize_events")
        assert plan.count(") Exchange") == 1
        assert "hashpartitioning(user_id" in plan

    def test_pagerank_no_cartesian_and_broadcast_n(self, spark, sf_dir):
        # the 1-row node count joins via broadcast; edge⋈score joins hash
        plan = physical_plan(spark, sf_dir, "pagerank_bipartite")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row crossJoin form

    def test_supplier_jaccard_joins_on_customer_key(self, spark, sf_dir):
        # pair generation is an equi-join on the shared-customer key with
        # the inequality as a post-filter — never a nested-loop pair scan
        plan = physical_plan(spark, sf_dir, "supplier_jaccard")
        assert "CartesianProduct" not in plan

    def test_anomaly_scores_join_stats_broadcast(self, spark, sf_dir):
        # |event_type|-sized stats tables broadcast back onto the stream
        for name in ("anomaly_zscore", "anomaly_mad"):
            plan = physical_plan(spark, sf_dir, name)
            assert "BroadcastHashJoin" in plan, name
            assert "CartesianProduct" not in plan, name


class TestStatsQueries:
    def test_corr_matrix_is_one_pass_one_row(self, spark, sf_dir):
        # all 14 moments accumulate in a single partial/final aggregate
        # (one scan, one exchange); the 6 pairs unfold via Generate from
        # the one aggregate row — no per-pair re-scans
        plan = physical_plan(spark, sf_dir, "corr_matrix_lineitem")
        assert plan.count("lineitem.parquet") == 1
        assert plan.count(") Exchange") == 1
        assert "partial_count" in plan or "partial_sum" in plan
        assert ") Generate" in plan

    def test_skew_diagnostics_shuffles_only_key_counts(self, spark, sf_dir):
        # the fact table reduces map-side to (key, partial count); whole
        # rows never shuffle, and the final stats pass is over the
        # key-bounded count table
        plan = physical_plan(spark, sf_dir, "join_skew_diagnostics")
        assert plan.count("lineitem.parquet") == 1
        assert "partial_count" in plan
        (cols,) = read_schema_cols(plan)
        assert cols == ["l_suppkey"]

    def test_iqr_fences_broadcast_back_no_fact_shuffle(self, spark, sf_dir):
        # the 3-row quantile table broadcasts onto the second fact scan;
        # the fact table itself is never hash-repartitioned for the join
        plan = physical_plan(spark, sf_dir, "iqr_outlier_fences")
        assert "BroadcastHashJoin" in plan
        assert "hashpartitioning(l_extendedprice" not in plan

    def test_yoy_joins_tiny_rollup_not_fact(self, spark, sf_dir):
        # the year-back comparison self-joins the ~#months aggregate —
        # the orders scan feeds ONE aggregate, and no cartesian appears
        plan = physical_plan(spark, sf_dir, "yoy_monthly_growth")
        assert "CartesianProduct" not in plan
        assert plan.count("orders.parquet") == 2  # two sides of the tiny self-join
        (cols, *rest) = read_schema_cols(plan)
        assert set(cols) == {"o_orderdate", "o_totalprice"}

    def test_welch_ttest_pairs_from_aggregates_only(self, spark, sf_dir):
        # the pairwise comparison joins the 5-row per-segment aggregate
        # with itself — fact rows never appear on either join side, so
        # the join input is aggregate-bounded at any corpus size
        plan = physical_plan(spark, sf_dir, "segment_welch_ttest")
        assert "partial_sum" in plan
        assert "CartesianProduct" not in plan

    def test_token_divergence_scans_corpus_once(self, spark, sf_dir):
        # the (source, tok) count table is localCheckpoint-ed, so all four
        # consumers (join probe, source totals, token totals, grand total)
        # read the materialized vocab-bounded table — the corpus itself is
        # scanned and tokenized exactly once; totals broadcast back
        plan = physical_plan(spark, sf_dir, "source_token_divergence")
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row N_c crossJoin
        assert "CartesianProduct" not in plan
        assert plan.count("documents.parquet") == 0  # lineage cut upstream
        assert "ExistingRDD" in plan  # the checkpointed count table

    def test_audio_features_prune_to_payload_columns(self, spark, sf_dir):
        # only id + payload cross the Arrow boundary; the fan-out is a
        # MapInPandas over the pruned scan
        plan = physical_plan(spark, sf_dir, "multimodal_audio_energy")
        assert "MapInPandas" in plan
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {"doc_id", "text"}

    def test_pareto_uses_thresholds_not_global_sort(self, spark, sf_dir):
        # the quantile-threshold formulation must never produce a ranked
        # cumulative window (all-data single-partition sort); thresholds
        # come back as a 1-row broadcast
        plan = physical_plan(spark, sf_dir, "pareto_revenue_share")
        assert ") Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan
        assert plan.count("orders.parquet") == 0  # rollup checkpointed once
        assert "ExistingRDD" in plan

    def test_psi_fact_bucketed_once(self, spark, sf_dir):
        # six consumers all read the checkpointed (week, bucket) table;
        # the fact table is scanned/bucketed exactly once (at checkpoint
        # time), so the final plan contains no events scan at all
        plan = physical_plan(spark, sf_dir, "value_psi_weekly")
        assert plan.count("events.parquet") == 0
        assert "ExistingRDD" in plan
        assert "CartesianProduct" not in plan

    def test_hhi_rolls_up_fact_once(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "supplier_hhi_by_nation")
        assert plan.count("lineitem.parquet") == 0  # supplier rollup checkpointed
        assert "ExistingRDD" in plan
        assert "BroadcastHashJoin" in plan  # nation dim + totals broadcast

    def test_shingle_queries_tokenize_once(self, spark, sf_dir):
        # the distinct (doc, shingle) set is checkpointed: tokenize +
        # distinct-shuffle run once, not once per consumer
        for name in ("ngram_novelty", "dup_ngram_coverage"):
            plan = physical_plan(spark, sf_dir, name)
            assert plan.count("documents.parquet") == 0, name
            assert "ExistingRDD" in plan, name


class TestRound4Plans:
    def test_trailing_hour_single_user_shuffle(self, spark, sf_dir):
        # one window pass = exactly one hash exchange, keyed on user_id
        plan = physical_plan(spark, sf_dir, "trailing_hour_window")
        import re

        args = re.findall(r"Arguments: (hashpartitioning\(\S+|SinglePartition)", plan)
        assert len(args) == 1 and args[0].startswith(
            "hashpartitioning(user_id"
        )

    def test_array_stats_is_pure_projection(self, spark, sf_dir):
        # higher-order array fns compile to a shuffle-free projection
        plan = physical_plan(spark, sf_dir, "array_stats_surface")
        assert "Exchange" not in plan

    def test_sequence_paths_take_ordered_topk(self, spark, sf_dir):
        # top-10 must compile to TakeOrderedAndProject, not a global sort
        plan = physical_plan(spark, sf_dir, "sequence_top_paths")
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan

    def test_gap_islands_partitions_on_custkey_only(self, spark, sf_dir):
        # distinct + window + both aggs: every exchange keys on o_custkey,
        # and nothing funnels to a single partition
        plan = physical_plan(spark, sf_dir, "orders_gap_islands")
        assert "SinglePartition" not in plan
        import re

        args = re.findall(r"Arguments: hashpartitioning\(([^,]+)", plan)
        assert args and all(a.startswith("o_custkey") for a in args)

    def test_grouped_mode_partitions_on_event_type(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "grouped_mode")
        assert "SinglePartition" not in plan
        import re

        args = re.findall(r"Arguments: hashpartitioning\(([^,]+)", plan)
        assert args and all(a.startswith("event_type") for a in args)

    def test_pmi_no_event_scale_self_join(self, spark, sf_dir):
        # pairs unfold array-locally from one per-user aggregate — there
        # must be no sort-merge self-join of event-scale frames; the only
        # joins are broadcast of |types|-sized aggregates
        plan = physical_plan(spark, sf_dir, "cooccurrence_pmi")
        assert "SortMergeJoin" not in plan
        assert plan.count("events.parquet") <= 4

    def test_containment_no_union_duplication(self, spark, sf_dir):
        # directions unfold via explode inside one lineage: same scan
        # count as the jaccard baseline (a union of two selects doubles it)
        plan = physical_plan(spark, sf_dir, "dedup_containment")
        assert plan.count("documents.parquet") <= 4
        assert "Union" not in plan

    def test_pit_lookup_is_union_window_not_range_join(self, spark, sf_dir):
        # the as-of lookup must compile to one keyed window over a
        # union — no range join, no nested-loop
        plan = physical_plan(spark, sf_dir, "pit_status_lookup")
        assert "NestedLoop" not in plan
        assert "SortMergeJoin" not in plan
        assert "Union" in plan

    def test_twa_single_user_shuffle(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "time_weighted_avg")
        import re

        args = re.findall(r"Arguments: (hashpartitioning\(\S+|SinglePartition)", plan)
        assert args and all(a.startswith("hashpartitioning(user_id") for a in args)

    def test_ohlc_no_single_partition_funnel(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "tumbling_ohlc")
        assert "SinglePartition" not in plan

    def test_pq_codes_projection_with_tiny_codebook(self, spark, sf_dir):
        # assignment is a broadcast of a 1-row codebook + pure projection:
        # two scans (vectors + centroid sample), no shuffle of vector data
        plan = physical_plan(spark, sf_dir, "embedding_pq_codes")
        assert plan.count("embeddings.parquet") == 2
        assert "SortMergeJoin" not in plan
        assert "BroadcastExchange" in plan or "broadcast" in plan

    def test_trending_topk_window_group_limit(self, spark, sf_dir):
        # rank<=3 must push the local top-3 prune below the exchange
        plan = physical_plan(spark, sf_dir, "trending_hourly_topk")
        assert ") WindowGroupLimit" in plan

    def test_triangles_no_cartesian_and_knn_is_partitioned(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "supplier_triangles")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the kNN prune is a per-node window, never a global sort
        assert "rangepartitioning" not in plan

    def test_audio_vad_single_doc_partitioning_after_fanout(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "multimodal_audio_vad")
        assert "MapInPandas" in plan
        import re

        args = re.findall(r"Arguments: (hashpartitioning\(\S+|SinglePartition)", plan)
        assert args and all(a.startswith("hashpartitioning(doc_id") for a in args)

    def test_sweepline_single_scan_day_partitioned(self, spark, sf_dir):
        # pieces and ±1 points unfold via explode: ONE events scan (the
        # UNION-ALL formulation would scan four times), and the sweep
        # partitions by day — never a global time order
        plan = physical_plan(spark, sf_dir, "max_concurrent_sessions")
        assert plan.count("events.parquet") == 1
        assert "SinglePartition" not in plan

    def test_rolling_median_single_cust_shuffle(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "rolling_median_price")
        import re

        args = re.findall(r"Arguments: (hashpartitioning\(\S+|SinglePartition)", plan)
        assert args and all(a.startswith("hashpartitioning(o_custkey") for a in args)
        assert "PushedFilters: [" in plan  # custkey sample reaches the scan

    def test_decayed_score_anchor_broadcast(self, spark, sf_dir):
        # the max-ts anchor is a 1-row broadcast; the fact side shuffles
        # once, on user_id, for the final aggregate
        plan = physical_plan(spark, sf_dir, "decayed_engagement_score")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "hashpartitioning(user_id" in plan

    def test_tfidf_similarity_posting_join_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "tfidf_doc_similarity")
        assert "CartesianProduct" not in plan
        # candidates come from the term equi-join; the df cap must reach
        # the join as a real filter
        assert "hashpartitioning(term" in plan
        assert "(df" in plan and "100" in plan

    def test_weighted_median_single_group_shuffle(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "weighted_median_price")
        import re

        args = re.findall(r"Arguments: (hashpartitioning\(\S+|SinglePartition)", plan)
        assert args and all(
            a.startswith("hashpartitioning(l_returnflag") for a in args
        )

    def test_hierarchy_rollup_no_joins_no_iteration(self, spark, sf_dir):
        # transitive rollup must be explode + one aggregate: zero joins
        plan = physical_plan(spark, sf_dir, "part_hierarchy_rollup")
        assert "Join" not in plan
        assert ") Generate" in plan  # the ancestor-path explode

    def test_backlog_cumsum_runs_on_day_grid_only(self, spark, sf_dir):
        # the only single-partition exchange feeds the |days|-sized
        # cumulative sum, AFTER the per-day aggregation
        plan = physical_plan(spark, sf_dir, "orders_backlog_daily")
        assert plan.count("SinglePartition") == 1
        tree = plan.split("\n\n")[0]
        # partial aggregate (per-day nets) sits leafward of the window
        assert "HashAggregate" in tree and "Window" in tree

    def test_label_drift_shuffles_partials_only(self, spark, sf_dir):
        # the shuffle carries (label, dim) / (dim) partial sums with
        # map-side combine, never raw embedding rows
        plan = physical_plan(spark, sf_dir, "embedding_label_drift")
        assert "partial_sum" in plan
        assert "CartesianProduct" not in plan


class TestRound5Plans:
    def test_schema_profile_scans_once(self, spark, sf_dir):
        """All per-column profile metrics come from ONE scan (Catalyst
        expands the input for the multi-distinct aggregate, but must not
        re-read the parquet per column)."""
        import re

        plan = physical_plan(spark, sf_dir, "schema_profile")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Expand" in plan  # the multi-distinct shape, documented

    def test_price_trend_is_single_partial_final_aggregate(self, spark, sf_dir):
        """The OLS moments are one map-side-combined aggregate: exactly
        one exchange, no join, no window."""
        import re

        plan = physical_plan(spark, sf_dir, "price_trend_by_priority")
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
        assert "Join" not in plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1

    def test_pq_adc_broadcasts_tiny_sides_only(self, spark, sf_dir):
        """The corpus side streams once; codebook + queries broadcast.
        The BNLJ cross joins are tiny-build-side by construction (1-row
        codebook aggregate, <=10 query rows) — assert no shuffle
        exchange other than the final top-k window's."""
        import re

        plan = physical_plan(spark, sf_dir, "ann_cosine_pq_adc_knn")
        # exactly one non-broadcast exchange: the per-query rank window
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
        assert "hashpartitioning(query_id" in plan
        assert "WindowGroupLimit" in plan  # top-5 pruned before exchange

    def test_retention_monthly_broadcasts_cohort_sizes(self, spark, sf_dir):
        """The month-level sizes frame (<=100 rows) must broadcast; the
        only fact-sized shuffles are the two custkey aggregations."""
        plan = physical_plan(spark, sf_dir, "retention_cohorts_monthly")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_leakage_split_assignment_is_projection_after_clustering(
        self, spark, sf_dir
    ):
        """The split hash must be a projection (no extra shuffle beyond
        the dedup/clustering pipeline's own): no exchange keyed on
        split/bucket anywhere."""
        plan = physical_plan(spark, sf_dir, "leakage_safe_split")
        assert "hashpartitioning(split" not in plan
        assert "CartesianProduct" not in plan


class TestRound5bPlans:
    def test_benford_prunes_to_price_column(self, spark, sf_dir):
        """Digit histogram reads ONE column; the total-sum window runs
        over the 9-row digit rollup, not the fact table."""
        plan = physical_plan(spark, sf_dir, "benford_leading_digit")
        (cols,) = read_schema_cols(plan)
        assert cols == ["o_totalprice"]
        assert "Join" not in plan

    def test_acf_windows_over_daily_rollup_only(self, spark, sf_dir):
        """One fact scan reduced to days BEFORE the ordered lag window;
        the 7 lags unfold array-locally (no self-joins)."""
        import re

        plan = physical_plan(spark, sf_dir, "daily_revenue_acf")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Join" not in plan
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {"o_orderdate", "o_totalprice"}

    def test_fd_check_prunes_each_candidate_to_two_columns(
        self, spark, sf_dir
    ):
        """Each candidate FD aggregate reads exactly its (lhs, rhs)
        column pair — four pruned scans, no joins."""
        plan = physical_plan(spark, sf_dir, "fd_check_orders")
        for cols in read_schema_cols(plan):
            assert len(cols) == 2, cols
        assert "Join" not in plan

    def test_attribution_band_join_no_cartesian(self, spark, sf_dir):
        """The touch join is keyed on user_id (time band as residual
        predicate) — never a cartesian; n_touches window reuses the
        join's purchase-side partitioning."""
        plan = physical_plan(spark, sf_dir, "attribution_linear")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_logodds_single_corpus_scan_topk_pruned(self, spark, sf_dir):
        """Marginals come from windows over the (source, token) rollup —
        one documents scan; the per-source top-5 is a WindowGroupLimit
        local prune."""
        import re

        plan = physical_plan(spark, sf_dir, "source_logodds_tokens")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "WindowGroupLimit" in plan

    def test_bloom_predicate_reaches_fact_side(self, spark, sf_dir):
        """The bitmap membership test is a literal-only predicate on the
        fact key (pushable below the exchange); the dim scan keeps its
        segment pushdown."""
        plan = physical_plan(spark, sf_dir, "bloom_semi_filter")
        assert "xxhash64(o_custkey" in plan
        assert "EqualTo(c_mktsegment,BUILDING)" in plan
        assert "CartesianProduct" not in plan

    def test_heavy_hitters_candidates_broadcast(self, spark, sf_dir):
        """Pass 1 (the zero-shuffle mapInPandas candidate scan) is
        localCheckpoint-materialized, so the final plan reads its tiny
        RDD instead of re-running the scan; the recount semi-joins
        against BROADCAST candidates so the only aggregate shuffle
        carries candidate keys."""
        plan = physical_plan(spark, sf_dir, "heavy_hitters_users")
        assert "MapInPandas" not in plan  # pass 1 already materialized
        assert "ExistingRDD" in plan or "LogicalRDD" in plan
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_image_ahash_banded_join_no_cartesian(self, spark, sf_dir):
        """Signatures come from the Arrow kernel once; candidate pairs
        only from (band, value) bucket equality — an equi-join, never a
        cartesian scan of the signature set."""
        plan = physical_plan(spark, sf_dir, "dedup_image_ahash")
        assert "MapInPandas" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound5cPlans:
    def test_bootstrap_single_scan_all_replicates(self, spark, sf_dir):
        """All 32 Poisson replicates are columns of ONE map-side
        aggregate over ONE pruned scan — no row duplication, no joins;
        the SE windows run over the 32-row stack."""
        import re

        plan = physical_plan(spark, sf_dir, "bootstrap_ci_revenue")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Join" not in plan
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {"o_orderkey", "o_totalprice"}

    def test_cusum_windows_over_daily_rollup(self, spark, sf_dir):
        """The fact scan reduces to the ~2.4k-row daily rollup before
        any ordered window touches it; one pruned column, no joins."""
        import re

        plan = physical_plan(spark, sf_dir, "cusum_daily_orders")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Join" not in plan
        (cols,) = read_schema_cols(plan)
        assert cols == ["o_orderdate"]

    def test_dow_seasonality_single_scan_seven_row_window(
        self, spark, sf_dir
    ):
        plan = physical_plan(spark, sf_dir, "dow_seasonality")
        assert "Join" not in plan
        (cols,) = read_schema_cols(plan)
        assert set(cols) == {"o_orderdate", "o_totalprice"}

    def test_hll_union_no_cartesian_and_pruned(self, spark, sf_dir):
        """Sketch build + exact check are two pruned scans of the same
        two columns; the yearly merge joins 7-row sides — never a
        cartesian."""
        plan = physical_plan(spark, sf_dir, "hll_mergeable_union")
        assert "CartesianProduct" not in plan
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_custkey", "o_orderdate"}

    def test_asof_tolerance_same_core_as_pit(self, spark, sf_dir):
        """Tolerance is a post-projection: the plan must stay the
        union+window as-of shape — one shuffle on the key, no range or
        cartesian join."""
        plan = physical_plan(spark, sf_dir, "asof_tolerance_lookup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Union" in plan


class TestRound6Plans:
    def test_skyline_prunes_and_broadcasts_date_grid(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "skyline_orders")
        # only the 3 needed order columns reach the scan
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_orderkey", "o_orderdate", "o_totalprice"}
        # the date-grid running-max side broadcasts back onto the fact
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_hashing_vectorizer_partial_aggregates(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "text_hashing_vectorizer")
        # map-side combine on (doc_id, bucket) before the one exchange
        assert "partial_count" in plan or "partial_sum" in plan
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"doc_id", "text"}

    def test_cms_sketch_probe_is_broadcast(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "cms_event_counts")
        # the 256-cell sketch joins the probes via broadcast, and the
        # events scan carries only the key column
        assert "BroadcastHashJoin" in plan
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"event_type"}

    def test_association_broadcasts_dimension(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "segment_priority_association")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "partial_count" in plan  # cell counts map-side combine

    def test_full_outer_stream_mirror_is_equi_join(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "stream_attribution_full_outer")
        # FullOuter on the user_id equi key — NOT a nested-loop product
        assert "FullOuter" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_asof_nearest_has_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "asof_nearest_purchase")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_gini_reads_two_columns(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "gini_customer_revenue")
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_custkey", "o_totalprice"}

    def test_spearman_reads_two_columns_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "spearman_daily_corr")
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_orderdate", "o_totalprice"}
        assert "CartesianProduct" not in plan


class TestLateRound6Plans:
    def test_forecast_backtest_reads_two_columns_broadcast_model(
        self, spark, sf_dir
    ):
        plan = physical_plan(spark, sf_dir, "forecast_backtest_metrics")
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_orderdate", "o_totalprice"}
        assert "BroadcastHashJoin" in plan  # 7-row dow model broadcasts
        assert "CartesianProduct" not in plan

    def test_cooccurrence_is_single_equi_join(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "part_cooccurrence_topk")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"l_orderkey", "l_partkey"}

    def test_rolling_corr_prunes_and_partial_aggregates(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "rolling_corr_30d")
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"o_orderdate", "o_totalprice"}
        assert "partial_count" in plan or "partial_sum" in plan

    def test_funnel_levels_single_events_scan(self, spark, sf_dir):
        """r7 rewrite: the whole funnel is ONE job over ONE events scan
        (per-user arrays + nested EXISTS), not the r6 four-action join
        pyramid that re-read events up to 4x."""
        import re

        plan = physical_plan(spark, sf_dir, "window_funnel_levels")
        # formatted explain shows each node once in the tree and once
        # in the details section — count distinct scan NODES
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Join" not in plan  # chain tests run as array EXISTS
        for cols in read_schema_cols(plan):
            assert set(cols) <= {"user_id", "event_type", "ts"}

    def test_mahalanobis_broadcasts_dim_stats(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "embedding_outlier_mahalanobis")
        assert "BroadcastHashJoin" in plan  # 64-row moment table
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan  # global top-20, no sort


class TestRound11Plans:
    def test_market_basket_broadcasts_and_bounded_pairs(
        self, spark, sf_dir
    ):
        """The association-mining shape: part dim broadcast into the
        lineitem join, brand marginals broadcast into the pair frame,
        and the within-order self-join keyed on okey (an equi-join —
        never a cartesian product)."""
        plan = physical_plan(spark, sf_dir, "market_basket_lift")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the distinct-(order,brand) projection precedes the self-join
        assert "HashAggregate" in plan

    def test_markov_transitions_single_user_shuffle(self, spark, sf_dir):
        """The marginal join broadcasts; no cartesian anywhere. (The
        user-keyed window runs ONCE before the r12 lineage cut, so it
        no longer appears in the final plan — TestSharedSubtreeCuts
        pins that.)"""
        plan = physical_plan(spark, sf_dir, "events_markov_transitions")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_table_changes_scans_only_added_groups(self, spark, sf_dir):
        """Batch CDC plans one parquet scan per commit signature over
        ADDED groups only — no driver-side row materialization
        (the plan contains real FileScans, not a LocalTableScan of
        collected rows)."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from file_stream_import_spark.io.tables import load_table
        from file_stream_import_spark.io.versioned import (
            VersionedTable,
            table_changes,
        )

        t = VersionedTable(tempfile.mkdtemp(prefix="plan_tc_"))
        try:
            o = load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("k")
            )
            t.commit(o.limit(50), mode="overwrite")
            t.commit(o.limit(20), mode="append")
            df = table_changes(t, spark, 1)
            qe = df._jdf.queryExecution()
            mode = (
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            plan = qe.explainString(mode)
            assert "Scan parquet" in plan
            assert "LocalTableScan" not in plan
            # one version -> ONE scan, no union (formatted explain
            # prints each node twice: tree + details)
            assert "Union" not in plan
            assert plan.count("Scan parquet") == 2
        finally:
            shutil.rmtree(t.path, ignore_errors=True)


class TestSharedSubtreeCuts:
    """r12: the two r11 analytics queries re-computed their tiny shared
    frame from a full fact-table scan per consumer; after the
    localCheckpoint lineage cut, the fact table appears in the final
    plan at most once (the checkpointed frame shows up as scan-free
    RDD scans)."""

    def test_market_basket_single_fact_scan(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "market_basket_lift")
        # the distinct (order, brand) frame is checkpointed: the plan
        # never re-reads lineitem or part
        assert "lineitem.parquet" not in plan
        assert "part.parquet" not in plan

    def test_markov_single_window_subtree(self, spark, sf_dir):
        plan = physical_plan(spark, sf_dir, "events_markov_transitions")
        # tr is checkpointed after the one window+agg pass: the final
        # plan re-reads neither the events table nor the window
        assert "events.parquet" not in plan
        assert "Window" not in plan


class TestDenseSequenceFixture:
    """r13: the lake fixtures' orders densify ran through
    ``row_number() OVER (ORDER BY o_orderkey)`` — an unpartitioned
    window funneling every order through ONE task inside ~10 lake
    driver queries and the lake_table_changes bench entry. The
    replacement (operators.curation.dense_sequence) is two-level:
    range-bucket, per-bucket rank, triangular-join offsets — so the
    plan must carry no single-partition exchange anywhere."""

    def test_densified_orders_no_single_partition(self, spark, sf_dir):
        from file_stream_import_spark.queries.round11 import (
            _densified_orders,
        )

        qe = _densified_orders(spark, sf_dir)._jdf.queryExecution()
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        plan = qe.explainString(mode)
        assert "SinglePartition" not in plan
        assert "Window" in plan  # the per-bucket rank survives

    def test_dense_sequence_equals_row_number(self, spark):
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from file_stream_import_spark.operators.curation import (
            dense_sequence,
        )

        # gappy, shuffled keys across many partitions
        df = (
            spark.range(0, 5000, 1, 16)
            .select((F.col("id") * 7 % 9973).alias("key"))
            .distinct()
        )
        want = [
            (r["key"], r["k"])
            for r in df.select(
                "key",
                F.row_number().over(W.orderBy("key")).alias("k"),
            ).collect()
        ]
        got = [
            (r["key"], r["k"])
            for r in dense_sequence(df, "key", out_col="k").collect()
        ]
        assert sorted(got) == sorted(want)

    def test_dense_sequence_bucket_is_value_based(self, spark):
        """The r13 duplicate-rank bug: a PHYSICAL bucket
        (spark_partition_id over repartitionByRange) is re-sampled per
        subtree evaluation, so the rank arm and the offset arm can
        disagree on a row's bucket — observed ~4k duplicate ids per
        150k rows under AQE. The bucket must be a pure function of the
        key VALUE (literal quantile cuts), which no plan rewrite can
        de-synchronize; the plan must carry no partition-id call."""
        from pyspark.sql import functions as F

        from file_stream_import_spark.operators.curation import (
            dense_sequence,
        )

        df = (
            spark.range(0, 120_000, 1, 32)
            .select((F.col("id") * 7 % 999_983).alias("key"))
            .distinct()
        )
        d = dense_sequence(df, "key", out_col="k")
        qe = d._jdf.queryExecution()
        mode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        plan = qe.explainString(mode)
        assert "SPARK_PARTITION_ID" not in plan.upper()
        n = d.count()
        assert d.groupBy("k").count().filter("count > 1").count() == 0
        assert d.agg(F.max("k")).first()[0] == n
