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
        # Round-10 window (see the rotation narrative in
        # plans/__init__.py): (a) the r10 newcomers, never
        # driver-checked; (b) the complete 16-query r6-stale deferral
        # queue (the r9 verdict's item 1 — the only registry members
        # not driver-checked since r6); (c) 21 of the 47 r7-green
        # queries, picked so every operator family keeps a carrier
        # (three discretionary r7 slots yielded to the X164-X166 late
        # newcomers): streaming via checkpoint_restart_strikes
        # (stateful machine + recovery) + four topology carriers,
        # reference core via active_count/epoch_status_clean/
        # keyed_upsert/pct_of_quota/except_all_dupes/
        # ordered_designation_report, sinks and maintenance via
        # published_report_roundtrip + compact_parquet_roundtrip +
        # snapshot_time_travel + zorder_layout_stats, joins via
        # salted_skew_join + purchase_asof_view, ANN via the six
        # PQ/IVF variants, text via word_freq_topk plus the r6
        # LLM-text block and the retrieval/tokenizer newcomers,
        # multimodal via binary_metadata + multimodal_frame_stats,
        # graph via supplier_triangles + supplier_communities +
        # dedup_clusters + part_link_prediction, temporal via
        # weekly_cohort_retention + user_survival_km; the 26 r7
        # leftovers queue for r11 (PROGRESS.jsonl) and everything
        # rotated out is r8/r9 driver-green, guarded by the committed
        # full local run.
        #
        # new in r10 — never driver-checked, full hash oracles:
        "priority_price_mwu", "decile_lift_report",
        "segment_nation_chi2", "price_qty_elasticity",
        "char_bigram_entropy", "dsir_importance_weights",
        "ndcg_mrr_report", "repeated_substring_spans",
        "shingle_containment_pairs", "part_link_prediction",
        "nation_revenue_gini", "user_survival_km",
        "bpe_merge_candidates",
        # re-confirmation: the complete r6-stale deferral queue
        "embedding_quantize", "ivf_topk_multiprobe", "pq_adc_search",
        "pq_ivf_search", "quantized_ivf_topk", "quantized_topk_rescore",
        "cluster_topic_terms", "context_pack_bins",
        "bigram_collocations", "boilerplate_scrub_stats",
        "lm_doc_score", "zorder_layout_stats",
        "winnow_fingerprint_pairs", "weekly_cohort_retention",
        "value_outliers", "supplier_triangles",
        # re-confirmation: 21 of the 47 r7-green (family coverage)
        "checkpoint_restart_strikes", "session_window_counts",
        "stream_dedup_counts", "stream_left_join_events",
        "streaming_upsert_dim", "active_count_by_designation",
        "epoch_status_clean", "keyed_upsert", "pct_of_quota",
        "except_all_dupes", "ordered_designation_report",
        "published_report_roundtrip", "compact_parquet_roundtrip",
        "snapshot_time_travel", "salted_skew_join",
        "purchase_asof_view", "word_freq_topk", "binary_metadata",
        "multimodal_frame_stats", "supplier_communities",
        "dedup_clusters",
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
