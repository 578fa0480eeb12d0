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
        # Round-7 window (see the rotation narrative in
        # plans/__init__.py). With every oracle-bearing query driver-
        # green at least once after r6, the window now carries (a) the
        # four never-checked r7 restart/maintenance operators, (b) the
        # 37 stalest re-confirmation queries (last green r2-r4), and
        # (c) nine r6-green family anchors so each displaced family
        # keeps an in-window carrier.
        #
        # new in r7 — never driver-checked, full hash oracles:
        "checkpoint_restart_strikes", "checkpoint_restart_windowed",
        "stream_left_join_events", "compact_parquet_roundtrip",
        "incremental_agg_refresh", "constraint_quarantine",
        "ann_rank_quality", "value_winsorized_stats", "supplier_communities",
        "join_key_skew_report", "multi_touch_attribution",
        "snapshot_time_travel", "event_transitions",
        # family anchors (r6 green): composed pipeline + sinks, SCD-2,
        # MERGE, LSH dedup stack, the 6-method ANN report, temporal
        # joins, and the three streaming state machines distinct from
        # the restart carriers' plans
        "daily_pipeline", "scd2_merge", "keyed_upsert",
        "neardup_prune", "ann_recall_report", "purchase_asof_view",
        "stream_dedup_counts", "session_window_counts",
        "streaming_upsert_dim",
        # re-confirmation cohort: last driver green r2
        # (text_stats + doc_fingerprint deferred to r8 for the two new
        # X110/X111 carriers; text family stays covered in-window by
        # quality_score, lang_id, word_freq_topk)
        # (customers_with_urgent_orders + union_entities also deferred
        # to r8 for X112/X113; semi-join leg carried by the anti query,
        # set-ops by except_all_dupes)
        "binary_metadata", "cube_order_stats",
        "customers_without_urgent_orders",
        # (longest_leave_streak + salary_change_deltas also deferred to
        # r8 for X114/X115; window family carried by
        # salary_rank_analytics + trailing_revenue_90d)
        "lang_id",
        "multimodal_frame_stats", "promo_revenue_share", "quality_score",
        "region_supplier_volume", "rollup_revenue",
        "salary_percentiles", "salary_rank_analytics", "status_pivot_report",
        "stratified_sample", "strike_report_batch",
        "top3_orders_per_customer", "top_earner_per_designation",
        "trailing_revenue_90d", "word_freq_topk",
        # re-confirmation cohort: last driver green r3
        "active_count_by_designation", "distinct_order_supp_pairs",
        "epoch_status_clean", "except_all_dupes", "json_props_stats",
        "ordered_designation_report", "published_report_roundtrip",
        "salted_skew_join",
        # re-confirmation cohort: last driver green r4 (json_lines /
        # orc roundtrips and dedup_last_write_wins deferred to r8;
        # format legs carried by format_roundtrips + the full local
        # run, W2 row_number machinery by the dedup_keep_best family)
        "dedup_clusters", "pct_of_quota",
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
