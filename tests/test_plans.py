"""Physical-plan regression suite (SURVEY.md §4).

Correctness oracles prove the ANSWERS are right; these tests pin the
PLANS — predicate pushdown reaching the parquet scan, broadcast joins
where a side is known-small, zero-exchange bucketed joins, bounded
shuffle counts on the dedup path. A refactor that silently turns a
narrow map into a shuffle, or un-pushes a filter, fails here long
before it shows up as a 100 TB incident. Assertions use conservative
substrings of Spark 4.x explain output.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_q1_filter_pushed_to_parquet_scan(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    # the whole pipeline stays JVM-side: no Python evaluation anywhere
    assert "Python" not in plan
    # aggregation must run inside whole-stage codegen — visible on the
    # FINAL adaptive plan, so execute once then re-explain
    df.collect()
    assert "codegen id" in plan_of(df)


def test_q1_scan_prunes_columns(spark):
    plan = plan_of(REGISTRY["q1_pricing_summary"].fn(spark, SF))
    # ReadSchema must not include columns the query never touches
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_q3_broadcasts_filtered_dimension(spark):
    plan = plan_of(REGISTRY["q3_shipping_priority"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_has_no_exchange_before_smj(spark):
    plan = plan_of(REGISTRY["bucketed_colocated_join"].fn(spark, SF))
    assert "SortMergeJoin" in plan
    # the join inputs are bucketed: SelectedBucketsCount appears and the
    # only exchange in the whole plan is the tiny post-join segment agg
    assert "SelectedBucketsCount" in plan
    assert plan.count("Exchange") <= 2  # final agg + AQE reads


def test_exact_dedup_single_shuffle(spark):
    plan = plan_of(REGISTRY["exact_dedup"].fn(spark, SF), mode="simple")
    assert plan.count("Exchange") == 1


def test_assign_clusters_is_narrow_after_fanout(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.similarity import (
        assign_clusters,
    )

    emb = read_table(spark, SF, "embeddings")
    piv = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    plan = plan_of(assign_clusters(emb, piv), mode="simple")
    # one round-robin fan-out exchange, then pure map — the argmax adds
    # no join, no aggregation, no further exchange
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Aggregate" not in plan


def test_partition_pruned_scan_reads_selected_partitions(spark):
    plan = plan_of(REGISTRY["partition_pruned_report"].fn(spark, SF))
    # the sink is hive-partitioned by l_returnflag; the report's read
    # must prune to the two requested partition values at the scan
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:300]
    assert "l_returnflag" in seg and "IN (A,R)" in seg


def test_context_pack_bins_no_global_single_partition_window(spark):
    plan = plan_of(REGISTRY["context_pack_bins"].fn(spark, SF), mode="simple")
    # the distributed prefix scan's only SinglePartition exchange is the
    # bucket-subtotal table (bounded: n/bucket_width rows), never the
    # document stream itself
    assert plan.count("Exchange SinglePartition") <= 1


def test_upcoming_leave_uses_broadcast_not_collect_join(spark):
    plan = plan_of(REGISTRY["upcoming_leave_pct"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bloom_probe_stays_jvm_side_and_pushed(spark):
    """The literal-path Bloom probe must evaluate as plain expressions
    in the scan stage — no Python, no extra exchange for the filter."""
    plan = plan_of(REGISTRY["bloom_pruned_join"].fn(spark, SF))
    assert "Python" not in plan
    assert "PushedFilters" in plan  # dim-side priority/status filters


def test_quality_weighted_sample_is_zero_shuffle(spark):
    plan = plan_of(REGISTRY["quality_weighted_sample"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan
    # scan reads only the two touched columns
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_winnow_single_keyed_window_shuffle(spark):
    """Fingerprint selection: exactly one exchange feeds the per-doc
    window sort; the gram hash itself is a projection (codegen), not a
    transform-lambda."""
    from employee_data_management_system_data_engineering_solution_spark.operators.dedup import (
        winnow_fingerprint_rows,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(winnow_fingerprint_rows(docs, "doc_id", "text"))
    assert plan.count("Exchange hashpartitioning") <= 2  # window + distinct
    assert "Python" not in plan
    assert "Window" in plan


def test_simhash_arith_no_python_and_mapside_agg(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.dedup import (
        simhash_arith,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    plan = plan_of(simhash_arith(docs, "doc_id", "text"))
    assert "Python" not in plan
    # partial aggregation before the exchange (map-side combine of the
    # 48 signed sums)
    assert "partial" in plan.lower()


def test_pq_encode_is_narrow(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    emb = read_table(spark, SF, "embeddings")
    cbs = pq_train_codebooks(emb, m=4, ksub=8)
    plan = plan_of(pq_encode(emb, cbs, m=4))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_balanced_strata_sample_has_partial_group_limit(spark):
    # WindowGroupLimit must appear (and Spark runs it in Partial mode
    # before the exchange), so a skewed stratum ships <= k rows per map
    # task instead of its full population
    plan = plan_of(REGISTRY["balanced_strata_sample"].fn(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan


def test_cube_expands_then_aggregates_map_side(spark):
    plan = plan_of(REGISTRY["revenue_cube_report"].fn(spark, SF))
    assert "Expand" in plan
    # partial + final hash aggregate around one exchange: the x4 Expand
    # rows collapse map-side before shuffling
    assert plan.count("HashAggregate") >= 2
    assert "Python" not in plan


def test_zorder_key_is_codegen_single_exchange(spark):
    df = REGISTRY["zorder_layout_stats"].fn(spark, SF)
    plan = plan_of(df, mode="simple")
    assert "Python" not in plan
    assert plan.count("Exchange") == 1  # only the 64-bucket stats agg


def test_pq_ivf_search_broadcasts_query_side(spark):
    plan = plan_of(REGISTRY["pq_ivf_search"].fn(spark, SF))
    # coarse join: inverted-list side streams, LUT/probe side broadcast
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_funnel_single_user_shuffle(spark):
    # the three step minima are cascading windows over ONE
    # partitionBy(user_id) exchange; only the final 1-row agg adds a
    # second. A regression to per-step join/agg chains showed up as 8.
    df = REGISTRY["funnel_conversion_report"].fn(spark, SF)
    plan = plan_of(df, mode="simple")
    assert plan.count("Exchange") <= 3
    assert "Python" not in plan


def test_incremental_refresh_bounded_exchanges_no_python(spark):
    """The whole maintenance path — diff (one full-outer join), delta
    explode+groupBy, stored-agg groupBy, final full-outer merge — must
    stay JVM-side within a bounded exchange budget, all of them keyed
    by order key or report key (never a cartesian / nested-loop)."""
    df = REGISTRY["incremental_agg_refresh"].fn(spark, SF)
    plan = plan_of(df, mode="simple")
    assert "Python" not in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # 2 snapshot sides + base-agg + delta-agg + merge join: the
    # pre-rewrite shape that rescans the base per stage showed up as 10+
    assert plan.count("Exchange") <= 8


def test_constraint_quarantine_single_scan_single_join(spark):
    """The gate is one narrow validation pass + one FK join + one tiny
    summary agg: the per-check counts must come from ONE scan of the
    batch (conditional aggregation), never a scan per check."""
    df = REGISTRY["constraint_quarantine"].fn(spark, SF)
    plan = plan_of(df, mode="simple")
    assert "Python" not in plan
    # exactly one scan of the orders fixture feeds all six counters
    assert plan.count("orders.parquet") == 1
    # one FK join; the summary agg collapses to a single partition once
    assert plan.count("Join") == 1
    assert plan.count("Exchange SinglePartition") <= 1


def test_approx_percentiles_single_exchange_map_side_sketch(spark):
    """The GK sketch must merge map-side: partial aggregation before
    the one group-key exchange, no Python, and the scan reads only the
    two touched columns."""
    df = REGISTRY["salary_percentiles_approx"].fn(spark, SF)
    plan = plan_of(df)
    assert "Python" not in plan
    assert "partial" in plan.lower()
    assert plan_of(df, mode="simple").count("Exchange") == 1
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "o_comment" not in read_schema and "o_custkey" not in read_schema


# ---------------------------------------------------------------------------
# Round-8 operators
# ---------------------------------------------------------------------------
def test_interval_overlap_join_is_equi_join_never_cartesian(spark):
    """The bucketed overlap join must plan as a hash/sort-merge
    EQUI-join on (key, bucket) with the overlap predicate as residual —
    never a cartesian/broadcast-nested-loop product, which is what the
    naive theta-join formulation degenerates to on hot keys."""
    df = REGISTRY["purchase_error_overlap"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan  # pure JVM path


def test_cdc_log_replay_single_window_shuffle_keyed_apply(spark):
    """The LWW collapse is ONE window over the log key; the apply is a
    same-key anti-join + union. No Python, no cartesian, and the
    events/orders scan count stays bounded (base + 4 log legs)."""
    df = REGISTRY["cdc_log_replay"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan and "Python" not in plan


def test_dirty_group_refresh_prunes_with_semi_and_anti_joins(spark):
    """The min/max refresh must recompute dirty groups via a SEMI join
    (never materializing the join product) and keep clean groups via
    an ANTI join — both present in the plan, no Python nodes."""
    df = REGISTRY["incremental_agg_refresh_minmax"].fn(spark, SF)
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Python" not in plan


def test_frequent_shingles_rescore_shuffle_is_candidate_bounded(spark):
    """The exact rescore must count only MG candidates: a LeftSemi
    prune against the candidate set sits between the corpus scan and
    the final groupBy. Since the r8 ADVICE fix the bounded candidate
    set is EAGERLY localCheckpoint-ed (the Arrow MG stage runs into
    the checkpoint and the final plan reads it back as an ExistingRDD
    scan), so the rescore plan itself must contain NO Python eval node
    of any tier."""
    df = REGISTRY["frequent_shingles"].fn(spark, SF)
    plan = plan_of(df)
    assert "LeftSemi" in plan
    # the checkpointed candidate scan replaces the in-plan MG stage
    assert "ExistingRDD" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_value_outliers_mad_stats_joins_broadcast(spark):
    """Both per-type stats tables are |event_types| rows; after AQE
    they must reach the events join as broadcasts, not shuffles of the
    event log."""
    df = REGISTRY["value_outliers_mad"].fn(spark, SF)
    df.collect()  # let AQE finalize
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_neardup_admission_restricted_join_no_self_pairs(spark):
    """The admission path must never re-pair the corpus against
    itself: the plan is the banded batch x corpus equi-join plus the
    window-computed bucket stats — no cartesian, no second aggregation
    of the signature subtree, JVM-only except nothing (pure builtins)."""
    df = REGISTRY["neardup_admission"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan
    # (the window-computed bucket stats sit behind the eager candidate
    # localCheckpoint, so they're structurally invisible here; the
    # no-re-executed-subtree property is covered by the operator's
    # design test in test_dedup.py)


def test_feature_drift_psi_never_joins_rows(spark):
    """PSI merges two report-cardinality aggregates; the snapshots
    must never join row-to-row (no join keyed on anything but the
    bucket id after aggregation)."""
    df = REGISTRY["feature_drift_psi"].fn(spark, SF)
    plan = plan_of(df)
    assert "Python" not in plan and "CartesianProduct" not in plan
    # both sides aggregate BEFORE the merge join: two HashAggregate
    # pairs precede the full-outer bucket join
    assert plan.count("HashAggregate") >= 4


def test_weighted_sample_topk_uses_bounded_heap_not_global_sort(spark):
    """Top-k must run as TakeOrderedAndProject (per-partition heaps,
    driver merge of k) — a global Sort+Exchange of the corpus is the
    100 TB anti-pattern this operator exists to avoid."""
    plan = plan_of(REGISTRY["weighted_sample_topk"].fn(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    # only pruned columns reach the scan
    full = plan_of(REGISTRY["weighted_sample_topk"].fn(spark, SF))
    seg = full.split("ReadSchema", 1)[1][:200]
    assert "l_orderkey" in seg and "l_quantity" in seg
    assert "l_comment" not in seg and "l_extendedprice" not in seg


def test_brand_price_regression_one_agg_pass_pruned_scan(spark):
    """All six sufficient statistics ride ONE aggregation (no second
    scan), and lineitem's scan reads only the three needed columns."""
    plan = plan_of(REGISTRY["brand_price_regression"].fn(spark, SF), mode="simple")
    assert plan.count("HashAggregate") <= 4  # partial+final, plus AQE wrappers
    full = plan_of(REGISTRY["brand_price_regression"].fn(spark, SF))
    li_seg = full.split("lineitem", 1)[1]
    seg = li_seg.split("ReadSchema", 1)[1][:220]
    assert "l_partkey" in seg and "l_quantity" in seg and "l_extendedprice" in seg
    assert "l_comment" not in seg and "l_shipdate" not in seg


def test_feature_woe_iv_single_scan_report_cardinality(spark):
    """One scan of orders, one grouping to |buckets| rows, totals via
    a window OVER the tiny aggregate (X123 discipline) — no second
    corpus scan, no row-to-row join."""
    plan = plan_of(REGISTRY["feature_woe_iv"].fn(spark, SF), mode="simple")
    assert plan.count("FileScan") == 1
    assert "Window" in plan and "Join" not in plan


def test_fd_violation_report_scans_are_column_pruned(spark):
    plan = plan_of(REGISTRY["fd_violation_report"].fn(spark, SF))
    # each FD reads exactly its determinant + dependent
    doc_seg = plan.split("documents", 1)[1].split("ReadSchema", 1)[1][:150]
    assert "text" not in doc_seg  # the wide payload column never loads


def test_rolling_user_features_windows_over_daily_aggregate(spark):
    """The RANGE window must slide over the DAILY rollup (aggregate
    BEFORE window), so window state per user is days, not raw events;
    both window functions share one per-user sort."""
    plan = plan_of(REGISTRY["rolling_user_features"].fn(spark, SF), mode="simple")
    agg_pos = plan.rfind("HashAggregate")
    win_pos = plan.find("Window")
    assert win_pos != -1 and agg_pos != -1
    # in simple-mode output the LAST (upstream) aggregate appears BELOW
    # the window operator: upstream operators print deeper in the tree
    assert agg_pos > win_pos
    assert plan.count("Sort") <= 2


def test_corr_matrix_is_one_scan_one_aggregate(spark):
    """All 14 sufficient statistics ride ONE aggregation over ONE scan
    — never a per-pair job loop; the explode is a narrow projection of
    the 1-row aggregate."""
    plan = plan_of(REGISTRY["lineitem_corr_matrix"].fn(spark, SF), mode="simple")
    assert plan.count("FileScan") == 1
    assert "Join" not in plan
    full = plan_of(REGISTRY["lineitem_corr_matrix"].fn(spark, SF))
    seg = full.split("ReadSchema", 1)[1][:250]
    assert "l_comment" not in seg and "l_shipdate" not in seg


def test_calendar_completeness_touches_corpus_twice_pruned(spark):
    """Only two corpus passes (bounds min/max + distinct-on-dates);
    the calendar join is days x days, and neither scan reads the wide
    columns."""
    plan = plan_of(REGISTRY["calendar_completeness_report"].fn(spark, SF))
    assert plan.count("FileScan") <= 2
    for seg in plan.split("ReadSchema")[1:]:
        assert "o_comment" not in seg[:200] and "o_totalprice" not in seg[:200]


def test_covisitation_equi_join_bounded_topk(spark):
    """The basket self-join must be a hash EQUI-join on the order key
    (never a cartesian/theta join), and the top-50 a bounded heap."""
    plan = plan_of(REGISTRY["part_covisitation_topk"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Cross", ""
    )  # only the 1-row totals cross join may nest
    assert "TakeOrderedAndProject" in plan


def test_bigram_collocations_topk_bounded_heap(spark):
    """The global PMI top-20 must run as TakeOrderedAndProject
    (per-partition heaps), never a single-partition row_number window
    over the min-support survivor set — vocabulary-bounded, but still
    enormous at 100 TB."""
    plan = plan_of(REGISTRY["bigram_collocations"].fn(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_cusum_windows_over_daily_rollup(spark):
    """CUSUM windows slide over the daily aggregate (aggregate BELOW
    the window in the printed tree), and the top-5 is a bounded heap."""
    plan = plan_of(REGISTRY["revenue_cusum_shift"].fn(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    agg_pos = plan.rfind("HashAggregate")
    win_pos = plan.find("Window")
    assert win_pos != -1 and agg_pos > win_pos


def test_salted_join_partitions_on_key_and_salt(spark):
    """The join exchange must hash-partition on (key, salt) — the salt
    genuinely splits a hot key's rows across reducers — with no
    cartesian product anywhere."""
    plan = plan_of(REGISTRY["salted_revenue_join"].fn(spark, SF), mode="simple")
    join_line = next(line for line in plan.splitlines() if "HashJoin" in line)
    # both sides' key lists carry the salt (at bench scale that makes
    # the shuffle partitioning (key, salt); at test scale AQE
    # broadcasts, and the hashed relation is still keyed on the salt)
    assert join_line.count("__salt") >= 2
    assert "CartesianProduct" not in plan


def test_hard_negative_mining_broadcasts_query_side(spark):
    """The bounded query side is broadcast; the corpus is never
    shuffled for the scoring pass."""
    plan = plan_of(REGISTRY["hard_negative_mining"].fn(spark, SF), mode="simple")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unicode_script_profile_is_pure_scan(spark):
    """The script profile must be one narrow projection over the scan:
    zero exchanges, zero windows, no Python — built-in regex counting
    only (the 100 TB contract: embarrassingly parallel)."""
    plan = plan_of(REGISTRY["unicode_script_profile"].fn(spark, SF), mode="simple")
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Python" not in plan


def test_embedding_dim_profile_single_aggregate(spark):
    """One posexplode + one map-side-combined groupBy to |dim| rows —
    exactly one shuffle, no window, no join."""
    plan = plan_of(REGISTRY["embedding_dim_profile"].fn(spark, SF), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "Join" not in plan


def test_benchmark_decontamination_dedups_before_join(spark):
    """The collision join must be dedup-first on the md5 gram key:
    no cartesian product, and HashAggregate pairs (the distincts)
    sit below the gram join."""
    plan = plan_of(REGISTRY["benchmark_decontamination"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("HashAggregate") >= 4  # two distincts, partial+final


def test_supplier_pagerank_topk_bounded_heap(spark):
    """The top-100 cut must be TakeOrderedAndProject; the rank window
    runs only over the bounded 100-row result (same fix class as
    bigram_collocations this round)."""
    plan = plan_of(REGISTRY["supplier_pagerank"].fn(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_bpe_encode_stats_single_corpus_scan_no_python(spark):
    """The encode pass scans the corpus ONCE (the (source, word) count
    frame is checkpointed and feeds both the join side and the
    distinct-word encode side); the 10-merge replace chain collapses
    into narrow codegen'd projections — no Python, no window, no
    cartesian."""
    plan = plan_of(REGISTRY["bpe_encode_stats"].fn(spark, SF), mode="simple")
    assert plan.count("FileScan") <= 1  # checkpointed counts; corpus read once
    assert "Python" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_recall_report_no_allpairs_no_python(spark):
    """Every detector pipeline stays banded/bucketed: no cartesian
    product and no nested-loop join anywhere except the bounded 1-row
    count cross joins; no Python eval."""
    plan = plan_of(REGISTRY["dedup_recall_report"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    # the only nested loops are the 1-row aggregate cross joins
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line


def test_seasonal_decompose_pushdown_and_rollup_windows(spark):
    """The NULL-date guard reaches the parquet scan; all windows run
    over the |days|-row daily rollup, JVM-side throughout."""
    plan = plan_of(REGISTRY["seasonal_decompose_report"].fn(spark, SF))
    assert "PushedFilters" in plan
    assert "IsNotNull(o_orderdate)" in plan.split("PushedFilters", 1)[1][:400]
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_mann_kendall_single_corpus_pass_no_python(spark):
    """The monthly rollup is localCheckpointed, so the returned plan's
    four consumers (sign pairs, ties, n) read the tiny series — no
    FileScan may appear (a re-derived corpus join would put one back),
    and everything stays JVM-side with no cartesian."""
    plan = plan_of(REGISTRY["mann_kendall_trend"].fn(spark, SF), mode="simple")
    assert "FileScan" not in plan  # one corpus pass, paid at build time
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_ri_audit_single_fact_pass_broadcast_dims(spark):
    """The three lineitem edges ride ONE checkpointed fact pass (their
    rows surface as scans of the 1-row aggregate, so at most four
    FileScans — the four non-fact children — appear in the returned
    plan); the dim edges broadcast their key sets; JVM-side, no
    cartesian."""
    plan = plan_of(REGISTRY["referential_integrity_audit"].fn(spark, SF), mode="simple")
    assert plan.count("BroadcastHashJoin") >= 4  # the non-fact edges
    assert plan.count("FileScan") <= 8  # 4 children + 4 parent key sets
    assert "Relation [e0_n_rows" in plan or "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_range_partition_plan_histogram_first(spark):
    """The key-NULL guard reaches the scan, the distinct-value
    histogram aggregate runs before any window/join, and the only
    nested-loop joins are the bounded broadcast cut/total joins."""
    plan = plan_of(REGISTRY["range_partition_plan"].fn(spark, SF))
    assert "PushedFilters" in plan
    assert "IsNotNull(l_extendedprice)" in plan.split("PushedFilters", 1)[1][:400]
    assert "Python" not in plan
    for line in plan.splitlines():
        if "NestedLoopJoin" in line.replace("BroadcastNestedLoopJoin", "NestedLoopJoin"):
            assert "Broadcast" in line


def test_mmr_result_is_bounded_local_rows(spark):
    """The returned frame is driver-built (<= 5 x 5 rows): the
    corpus-sized work (pool scoring, pairwise sims) executed inside
    the call on JVM frames, and the greedy ran over the bounded
    collect — the plan must be a local scan, not a recomputation."""
    plan = plan_of(REGISTRY["mmr_diversified_topk"].fn(spark, SF), mode="simple")
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    assert "FileScan" not in plan


def test_binary_quantized_topk_one_shuffle_no_python(spark):
    """The sign-bit coarse stage broadcasts the 5 packed query words
    (xor+popcount inside codegen — no Python, no UDF) and the single
    hash exchange is the per-query rank window; the corpus is never
    sort-merge-joined."""
    plan = plan_of(REGISTRY["binary_quantized_topk"].fn(spark, SF), mode="simple")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_epoch_shuffle_shards_two_level_aggregation(spark):
    """The shard plan is the two-level map-side-combinable shape: shard
    assignment is a narrow map (no global sort, no window, no join —
    at 100 TB a row_number permutation would be a full-data sort), and
    the only exchanges are the two aggregation shuffles."""
    plan = plan_of(REGISTRY["epoch_shuffle_shards"].fn(spark, SF), mode="simple")
    assert "Sort " not in plan and "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Python" not in plan


def test_source_divergence_word_join_no_cartesian(spark):
    """The divergence pair join must key on the WORD (hash join), with
    the tiny per-source totals broadcast — never a source×source
    cartesian of corpus-sized frames."""
    plan = plan_of(REGISTRY["source_divergence_report"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "Python" not in plan


def test_perplexity_partition_lang_window_over_scores_only(spark):
    """The partition adds ONE lang-keyed ntile window on top of the
    X68 score (the window's input is (doc_id, score, lang) rows, not
    text), and everything stays JVM-side."""
    plan = plan_of(REGISTRY["perplexity_partition_report"].fn(spark, SF), mode="simple")
    assert plan.count("Window") == 1
    assert "Python" not in plan


def test_cross_source_dup_matrix_digest_join(spark):
    """The matrix joins on the digest (equi hash join) with broadcast
    totals — no cartesian, no window, no Python."""
    plan = plan_of(REGISTRY["cross_source_dup_matrix"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "BroadcastExchange" in plan
    assert "Window" not in plan and "Python" not in plan


def test_rho_loss_selection_bounded_topk_heap(spark):
    """The top-20 cut must be TakeOrderedAndProject (bounded heap);
    the rank window runs only over the 20-row result — a global rank
    window over the candidate split would single-partition it (the
    supplier_pagerank discipline)."""
    plan = plan_of(REGISTRY["rho_loss_selection"].fn(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
