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
        # Round-9 window (see the rotation narrative in
        # plans/__init__.py): (a) the r9 newcomers, never
        # driver-checked; (b) the complete 16-query r5-green cohort;
        # (c) the r6-green block minus the r10 deferral tail. No
        # dedicated anchors this round — the stale cohort itself
        # carries every operator family (sources/sinks via
        # format_roundtrips + schema_evolution_read +
        # upcoming_leave_pct, joins via bloom_pruned_join +
        # bucketed_colocated_join + fuzzy_name_pairs, dedup/window via
        # exact_dedup + dedup_keep_best, streaming via
        # strike_stream_stateful — the r8 verdict's explicit anchor
        # ask — temporal via funnel_conversion_report + event_sessions
        # + hourly_interpolated_series, graph via supplier_pagerank,
        # ANN via the embedding carriers, maintenance via
        # snapshot_diff_orders); everything rotated out or deferred to
        # r10 is r6-r8 driver-green and guarded by the committed full
        # local run.
        #
        # new in r9 — never driver-checked, full hash oracles:
        "phash_neardup_pairs", "bm25_topk", "quality_gate_logistic",
        "gate_eval_report", "gate_calibration_bins",
        "discount_quantity_ab", "order_price_ks_drift",
        "supplier_golden_record", "ppjoin_neardup_pairs",
        "hybrid_rrf_topk", "domain_mixture_sample", "brand_price_theilsen",
        "revenue_forecast_mase",
        # re-confirmation: last driver green r5 (complete)
        "benchmark_contamination", "dedup_keep_best",
        "embedding_neardup_pairs", "embedding_topk", "event_sessions",
        "exact_dedup", "forward_fill_values", "hyperplane_lsh_groups",
        "ivf_topk", "kmeans_ivf_assign", "minhash_lsh_groups",
        "price_decile_stats", "repeated_passages",
        "snapshot_diff_orders", "tfidf_top_terms", "train_test_split",
        # re-confirmation: last driver green r6 (minus the deferral
        # tail — the six PQ/IVF quantization variants and, as r9
        # newcomers land, the LLM-text block; every deferred name is
        # family-covered in-window and queues for r10)
        "strike_stream_stateful", "upcoming_leave_pct",
        "supplier_pagerank", "funnel_conversion_report",
        "column_profile", "text_profile", "balanced_strata_sample",
        "bloom_pruned_join", "bucketed_colocated_join",
        "format_roundtrips", "schema_evolution_read",
        "events_in_error_windows", "fuzzy_name_pairs",
        "hourly_interpolated_series", "multimodal_decode", "pii_scrub",
        "quality_weighted_sample", "revenue_cube_report",
        "simhash_hamming_pairs", "strike_report_rlike",
        "user_value_trend",
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
