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
        # Round-12 window (see the rotation narrative in
        # plans/__init__.py): (a) the three r12 newcomers, never
        # driver-checked; (b) the rows-only trio, ordered in by the
        # r11 verdict for rows>0 driver evidence; (c) the COMPLETE
        # 34-query r8-green block without driver evidence since r8
        # (PROGRESS.jsonl final r12 entry); (d) 10 of the 50 r9-green
        # queries, picked for family coverage and newcomer pairing:
        # the gate the X177 trainer learns (quality_gate_logistic),
        # the exact truth set X176 scores against
        # (ppjoin_neardup_pairs), dedup via minhash_lsh_groups +
        # simhash_hamming_pairs + exact_dedup, stateful streaming via
        # strike_stream_stateful (stream_purchase_view_join +
        # strike_window_counts ride the r8 block), ANN via
        # embedding_topk + ivf_topk, graph via supplier_pagerank
        # (re-green after its r11 top-k rework), multimodal via
        # multimodal_decode + the r8 block's multimodal_profile;
        # everything rotated out is r9/r10/r11 driver-green, guarded
        # by the committed full local run, and the 40 remaining
        # r9-green queries queue FIRST for r13 (PROGRESS.jsonl).
        #
        # new in r12 — never driver-checked:
        "bpe_encode_stats", "dedup_recall_report",
        "gate_training_rounds",
        # rows-only trio (driver rows-only verdicts):
        "simhash_signatures", "column_profile_approx",
        "salary_percentiles_approx",
        # re-confirmation: the complete 34-query r8-green block
        "benford_digit_audit", "brand_price_regression",
        "calendar_completeness_report", "cluster_safe_split",
        "column_entropy_profile", "customers_with_urgent_orders",
        "dedup_last_write_wins", "doc_fingerprint",
        "fd_violation_report", "feature_drift_psi", "feature_woe_iv",
        "frequent_shingles", "incremental_agg_refresh_minmax",
        "lineitem_corr_matrix", "longest_leave_streak",
        "multimodal_profile", "neardup_admission", "orc_roundtrip",
        "purchase_error_overlap", "q3_shipping_priority",
        "revenue_cusum_shift", "rolling_user_features",
        "salary_change_deltas", "salted_revenue_join",
        "snapshot_vacuum", "staging_promote_roundtrip",
        "stream_purchase_view_join", "strike_window_counts",
        "text_stats", "union_entities", "user_path_topk",
        "value_outliers_mad", "weighted_median_by_flag",
        "weighted_sample_topk",
        # re-confirmation: 10 of the 50 r9-green (family coverage)
        "quality_gate_logistic", "ppjoin_neardup_pairs",
        "minhash_lsh_groups", "simhash_hamming_pairs",
        "strike_stream_stateful", "exact_dedup", "embedding_topk",
        "ivf_topk", "supplier_pagerank", "multimodal_decode",
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
