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
        # Round-11 window (see the rotation narrative in
        # plans/__init__.py): (a) the five r11 newcomers, never
        # driver-checked; (b) the complete 26-query r7-stale block the
        # r10 verdict ordered in first (the only registry members
        # without driver evidence since r7); (c) 19 of the 50 r8-green
        # queries, picked so every operator family keeps a carrier:
        # streaming via strike_stream_from_wire + stream_static_enrich
        # + checkpoint_restart_windowed (recovery), the flagship
        # q1_pricing_summary, pipelines via daily_pipeline +
        # corpus_curation_pipeline, ANN via ann_recall_report +
        # hard_negative_mining + ann_rank_quality +
        # ann_incremental_admission, dedup via dedup_clusters_star +
        # ngram_jaccard_pairs + neardup_prune, CDC via cdc_log_replay,
        # formats/sinks via json_lines_roundtrip + orc_roundtrip,
        # layout via partition_pruned_report, curation via
        # k_anonymity_report + feature_drift_psi + stratified_sample,
        # UDTF via doc_chunks, SCD via scd2_merge, analytics via
        # part_covisitation_topk + revenue_cusum_shift + the r7 block's
        # rank/rollup/pivot carriers, text via lang_id + quality_score
        # + the tokenizer/script newcomers; everything rotated out is
        # r8/r9/r10 driver-green, guarded by the committed full local
        # run, and the 31 remaining r8-green queries queue FIRST for
        # r12 (PROGRESS.jsonl).
        #
        # new in r11 — never driver-checked, full hash oracles:
        "bpe_merge_table", "unicode_script_profile",
        "ann_incremental_admission", "benchmark_decontamination",
        "gopher_repetition_report", "cross_split_leakage",
        "embedding_dim_profile", "token_mixture_plan",
        # re-confirmation: the complete 26-query r7-stale block
        "customers_without_urgent_orders", "lang_id",
        "event_transitions", "ann_rank_quality",
        "checkpoint_restart_windowed", "constraint_quarantine",
        "cube_order_stats", "distinct_order_supp_pairs",
        "incremental_agg_refresh", "join_key_skew_report",
        "json_props_stats", "multi_touch_attribution", "neardup_prune",
        "promo_revenue_share", "quality_score",
        "region_supplier_volume", "rollup_revenue",
        "salary_percentiles", "salary_rank_analytics",
        "status_pivot_report", "stratified_sample",
        "strike_report_batch", "top3_orders_per_customer",
        "top_earner_per_designation", "trailing_revenue_90d",
        "value_winsorized_stats",
        # re-confirmation: 16 of the 50 r8-green (family coverage;
        # orc_roundtrip / feature_drift_psi / revenue_cusum_shift
        # yielded to the late newcomers and lead the r12 queue)
        "q1_pricing_summary", "daily_pipeline",
        "corpus_curation_pipeline", "strike_stream_from_wire",
        "stream_static_enrich", "ann_recall_report",
        "hard_negative_mining", "dedup_clusters_star",
        "ngram_jaccard_pairs", "cdc_log_replay", "json_lines_roundtrip",
        "partition_pruned_report", "k_anonymity_report", "doc_chunks",
        "scd2_merge", "part_covisitation_topk",
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
