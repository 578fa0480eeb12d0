"""Driver-contract smoke: entry() returns rows; every queries() entry
has a stable schema; oracle_sql() keys are a subset of queries()."""

from __future__ import annotations

from __spark_entry__ import entry, oracle_sql, queries


def test_entry_smoke(spark):
    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_oracle_keys_subset_of_queries(spark):
    qs, oracles = queries(), oracle_sql()
    assert set(oracles) <= set(qs)
    # non-SQL-expressible ops are known and deliberate
    # (strike_stream_stateful gained a closed-form batch oracle in r4;
    # multimodal_decode a byte-statistics oracle in r5 — simhash's
    # blake2b stays SQL-inexpressible and is pinned by a pure-Python
    # reference implementation in test_dedup.py instead)
    # column_profile_approx / salary_percentiles_approx: sketch
    # estimates (HLL++, Greenwald-Khanna) are engine-specific; their
    # exact-statistics parity and error bounds are pytest-asserted
    assert set(qs) - set(oracles) == {
        "simhash_signatures",
        "column_profile_approx",
        "salary_percentiles_approx",
    }


def test_check_window_covers_every_operator_family():
    """External harnesses verify a bounded prefix of queries() (first
    50 entries); the curated priority order must keep one carrier per
    operator family inside that window, and everything outside it must
    be a deliberate overflow (rows-only or multiply-covered/unit-tested
    elsewhere)."""
    window = list(queries())[:50]
    carriers = {
        # Round-8 window (see the rotation narrative in
        # plans/__init__.py): (a) the ten never-checked r8 operators,
        # (b) the 33 stalest re-confirmation queries (the r2/r4
        # deferrals the r7 narrative promised plus the whole r5-green
        # cohort), and (c) nine family anchors so each displaced
        # family keeps an in-window carrier.
        #
        # new in r8 — never driver-checked, full hash oracles:
        "incremental_agg_refresh_minmax", "frequent_shingles",
        "purchase_error_overlap", "cdc_log_replay", "user_path_topk",
        "value_outliers_mad", "snapshot_vacuum", "strike_stream_from_wire",
        "neardup_admission", "feature_drift_psi",
        # mid-round additions (never driver-checked): each displaces
        # one multiply-covered r5 re-confirmation slot (the displaced
        # names join the r9 re-confirmation queue):
        # cluster_safe_split displaced ivf_topk (ANN family carried by
        # ann_recall_report's 6-method sweep + embedding_topk +
        # kmeans_ivf_assign + hyperplane_lsh_groups + the neardup pairs);
        # weighted_sample_topk displaced kmeans_ivf_assign (same
        # family); brand_price_regression displaced minhash_lsh_groups
        # (LSH-dedup carried by ngram_jaccard_pairs +
        # dedup_clusters_star + neardup_admission); feature_woe_iv
        # displaced repeated_passages (text amply carried);
        # fd_violation_report displaced embedding_neardup_pairs
        # (embedding family carried by embedding_topk +
        # ann_recall_report); rolling_user_features displaced
        # forward_fill_values (temporal gap/window family carried by
        # rolling_user_features itself + event_sessions);
        # lineitem_corr_matrix displaced dedup_keep_best (W1 keep-best
        # carried by dedup_last_write_wins + exact_dedup);
        # calendar_completeness_report displaced tfidf_top_terms
        # (text family amply carried); benford_digit_audit displaced
        # train_test_split (split family carried by cluster_safe_split);
        # weighted_median_by_flag displaced event_sessions (sequence
        # family carried by user_path_topk); part_covisitation_topk
        # displaced hyperplane_lsh_groups (ANN-LSH carried by
        # ann_recall_report's 6-method sweep + embedding_topk);
        # revenue_cusum_shift displaced price_decile_stats (order
        # statistics carried by weighted_median_by_flag +
        # value_outliers_mad); salted_revenue_join displaced exact_dedup
        # (exact dedup carried by dedup_last_write_wins + the fuzzy
        # stack); hard_negative_mining displaced embedding_topk (same
        # brute-force cosine machinery + ann_recall_report's sweep);
        # k_anonymity_report displaced benchmark_contamination (text/
        # contamination carried by text_stats + doc_fingerprint +
        # frequent_shingles + corpus_curation_pipeline);
        # column_entropy_profile displaced snapshot_diff_orders (CDC
        # diff carried by cdc_log_replay + incremental_agg_refresh_
        # minmax + snapshot_vacuum + scd2_merge)
        "cluster_safe_split", "weighted_sample_topk",
        "brand_price_regression", "feature_woe_iv",
        "fd_violation_report", "rolling_user_features",
        "lineitem_corr_matrix", "calendar_completeness_report",
        "benford_digit_audit", "weighted_median_by_flag",
        "part_covisitation_topk", "revenue_cusum_shift",
        "salted_revenue_join", "hard_negative_mining",
        "k_anonymity_report", "column_entropy_profile",
        # family anchors: composed pipeline + sinks, SCD-2 (K6 MERGE is
        # carried by the strictly-more-general cdc_log_replay), the
        # 6-method ANN report, K5 promotion, graph ranking, temporal
        # analytics, and the three r6-stale streaming topologies that
        # complement the new wire carrier (windowed agg, stream-static
        # enrich, stream-stream inner join)
        # (supplier_pagerank + funnel_conversion_report yielded their
        # anchor slots to the two late r8 operators; graph stays
        # carried by dedup_clusters_star, sequences by user_path_topk
        # + event_sessions)
        "daily_pipeline", "scd2_merge", "ann_recall_report",
        "staging_promote_roundtrip", "strike_window_counts",
        "stream_static_enrich", "stream_purchase_view_join",
        # re-confirmation cohort: last driver green r2 (the r7
        # deferrals)
        "customers_with_urgent_orders", "doc_fingerprint",
        "longest_leave_streak", "salary_change_deltas", "text_stats",
        "union_entities",
        # re-confirmation cohort: last driver green r4 (the r7
        # deferrals)
        "dedup_last_write_wins", "json_lines_roundtrip", "orc_roundtrip",
        # re-confirmation cohort: last driver green r5 (complete)
        "corpus_curation_pipeline",
        "dedup_clusters_star", "doc_chunks",
        "multimodal_profile", "ngram_jaccard_pairs",
        "partition_pruned_report",
        "q1_pricing_summary", "q3_shipping_priority",
    }
    assert carriers <= set(window), sorted(carriers - set(window))


def test_rotation_policy_is_mechanically_satisfied():
    """The rotation policy as data: every registered oracle-bearing
    query that has never earned a driver hash-green verdict (per
    driver_history.json, regenerated each round by
    tools/build_driver_history.py) must sit INSIDE the 50-slot check
    window so it gets its verdict this round; rows-only-by-contract
    entries are exempt. Guards against new queries silently parking in
    the unchecked tail."""
    from employee_data_management_system_data_engineering_solution_spark.plans import (
        ROWS_ONLY_BY_CONTRACT,
        driver_green_rounds,
        never_green,
    )

    window = set(list(queries())[:50])
    pending = never_green()
    outside = sorted(set(pending) - window)
    assert not outside, f"never-driver-green queries stuck in the tail: {outside}"
    # the exemption list must stay honest: every exempt name is
    # registered and genuinely oracle-less
    oracles = oracle_sql()
    for name in ROWS_ONLY_BY_CONTRACT:
        assert name in queries() and name not in oracles, name
    # sanity: the history file tracks at least every in-window query
    # that predates this round
    hist = driver_green_rounds()
    assert len(hist) >= 80


def test_every_query_runs_at_smoke_sf(spark):
    # schema-stability pass at sf0.001: every registered query analyzes
    # and returns a DataFrame with at least one column (cheap: no action)
    for name, fn in queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
