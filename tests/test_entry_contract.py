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
        # Round-13 window (see the rotation narrative in
        # plans/__init__.py): (a) the four r13 newcomers, never
        # driver-checked; (b) the COMPLETE 40-query r9-green cohort
        # the r12 verdict ordered in first (PROGRESS.jsonl final r13
        # entry); (c) five more r13 newcomers (seasonal decomposition,
        # Mann-Kendall, RI audit, range-partition planner, MMR) took
        # the remaining slots, so exactly ONE r10-green keeper fits:
        # stateful streaming + checkpoint recovery
        # (checkpoint_restart_strikes). Everything rotated out is
        # r10/r11/r12 driver-green, guarded by the committed full
        # local runs, and the 49 remaining r10-green queries queue
        # FIRST for r14 (PROGRESS.jsonl r14 schedule entry).
        #
        # new in r13 — never driver-checked:
        "gate_trained_eval", "bpe_merge_batched",
        "dedup_recall_sampled", "dedup_recall_curve",
        "seasonal_decompose_report", "mann_kendall_trend",
        "referential_integrity_audit", "range_partition_plan",
        "mmr_diversified_topk",
        # re-confirmation: the complete 40-query r9-green cohort
        "balanced_strata_sample", "benchmark_contamination",
        "bloom_pruned_join", "bm25_topk", "brand_price_theilsen",
        "bucketed_colocated_join", "column_profile", "dedup_keep_best",
        "discount_quantity_ab", "domain_mixture_sample",
        "embedding_neardup_pairs", "event_sessions",
        "events_in_error_windows", "format_roundtrips",
        "forward_fill_values", "funnel_conversion_report",
        "fuzzy_name_pairs", "gate_calibration_bins", "gate_eval_report",
        "hourly_interpolated_series", "hybrid_rrf_topk",
        "hyperplane_lsh_groups", "kmeans_ivf_assign",
        "order_price_ks_drift", "phash_neardup_pairs", "pii_scrub",
        "price_decile_stats", "quality_weighted_sample",
        "repeated_passages", "revenue_cube_report",
        "revenue_forecast_mase", "schema_evolution_read",
        "snapshot_diff_orders", "strike_report_rlike",
        "supplier_golden_record", "text_profile", "tfidf_top_terms",
        "train_test_split", "upcoming_leave_pct", "user_value_trend",
        # re-confirmation: 1 of the 50 r10-green — stateful streaming
        # (the one family with no other in-window carrier; graph,
        # MERGE-upsert, quantized ANN and winnowing ride the r14
        # drain of the remaining 49 r10-green queries)
        "checkpoint_restart_strikes",
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
