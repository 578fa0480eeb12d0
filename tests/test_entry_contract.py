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
    # column_profile_approx: HLL++ estimates are engine-specific; its
    # exact-statistics parity and error bounds are pytest-asserted
    assert set(qs) - set(oracles) == {
        "simhash_signatures",
        "column_profile_approx",
    }


def test_check_window_covers_every_operator_family():
    """External harnesses verify a bounded prefix of queries() (first
    50 entries); the curated priority order must keep one carrier per
    operator family inside that window, and everything outside it must
    be a deliberate overflow (rows-only or multiply-covered/unit-tested
    elsewhere)."""
    window = list(queries())[:50]
    carriers = {
        # sources + all sink shapes + format round-trips (K3 CSV publish
        # rides daily_pipeline; published_report_roundtrip and
        # salted_skew_join rotated to the tail in r4, displaced by the
        # two new LLM operators below; orc_roundtrip rotated out in r5
        # — ORC read/write stays carried by format_roundtrips — to make
        # room for bigram_collocations, the last never-driver-checked
        # oracle-bearing query; json_lines_roundtrip followed for the
        # same reason, its JSON leg carried by format_roundtrips)
        # q3_shipping_priority rotated out for supplier_pagerank (r6):
        # its J2 inner-join family is carried by bloom_pruned_join
        # partition_pruned_report rotated out for zorder_layout_stats
        # (r6): K1 partitioned sink carried by daily_pipeline, pruning
        # layout family carried by the Morton-key stats
        "supplier_pagerank",
        "daily_pipeline", "staging_promote_roundtrip",
        "zorder_layout_stats",
        "schema_evolution_read", "bucketed_colocated_join",
        # scd / upsert / dedup (sorts ride q3/ordered reports; the r4-r5
        # rotations moved 2-3-round-stable carriers to the tail —
        # dedup_last_write_wins rides dedup_keep_best's row_number
        # family, pct_of_quota's inner equi-join rides q3 — guarded by
        # the full local oracle run before each snapshot)
        # dedup_keep_best rotated out for funnel_conversion_report
        # (r6): its row_number keep-best machinery IS top_k_per_group,
        # exercised in-window by balanced_strata_sample
        "keyed_upsert", "scd2_merge", "funnel_conversion_report",
        "upcoming_leave_pct",
        # every streaming carrier (rlike carries ST2+ST4 in full; the
        # event_type stand-in variant rides the tail)
        "strike_report_rlike",
        "strike_window_counts", "strike_stream_stateful",
        "stream_dedup_counts", "session_window_counts",
        "stream_purchase_view_join", "streaming_upsert_dim",
        # temporal joins / repair / sessionization / anomalies + CDC
        # event_sessions rotated out for bloom_pruned_join (r6):
        # sessionization stays carried by session_window_counts
        "purchase_asof_view", "events_in_error_windows",
        # train_test_split rotated out for quality_weighted_sample (r6):
        # seeded-hash sampling family carried by the new query
        # forward_fill_values rotated out for hourly_interpolated_series
        # (r6): series-repair family carried by the interpolation query
        # price_decile_stats rotated out for revenue_cube_report
        # (r6): grouped-agg family carried by column_profile and the
        # cube's own multi-level aggregation
        # corpus_curation_pipeline rotated out for balanced_strata_
        # sample (r6): its filter/dedup/split stages are carried by
        # text_profile, neardup_prune, and the sampling queries
        # snapshot_diff_orders rotated out for stream_static_enrich
        # (r6): delta-apply carried by keyed_upsert/streaming_upsert_dim
        "user_value_trend", "hourly_interpolated_series", "bloom_pruned_join",
        "value_outliers", "stream_static_enrich", "quality_weighted_sample",
        "revenue_cube_report", "balanced_strata_sample",
        # LLM dedup / ANN / multimodal / text-scrub stack. The r6
        # rotation displaced five 5-round-green carriers whose stages
        # live on inside in-window compositions: exact_dedup /
        # minhash_lsh_groups / ngram_jaccard_pairs ride neardup_prune
        # (hash -> LSH -> Jaccard-verify stages), embedding_topk is the
        # ground-truth stage of ann_recall_report, ivf_topk's inverted-
        # list family is carried by ivf_topk_multiprobe /
        # quantized_ivf_topk / kmeans_ivf_assign.
        # benchmark_contamination rotated out for simhash_hamming_pairs
        # (r6): gram-set machinery carried by winnow/neardup_prune
        # dedup_clusters_star rotated out for supplier_triangles (r6):
        # star-CC machinery is the clustering stage inside neardup_prune
        # doc_chunks rotated out for boilerplate_scrub_stats (r6):
        # chunk-split semantics carried by the scrub's block machinery
        "supplier_triangles", "neardup_prune", "simhash_hamming_pairs",
        "boilerplate_scrub_stats",
        # hyperplane_lsh_groups rotated out for pq_adc_search (r6):
        # vector-ANN family carried by the IVF/SQ8/PQ/recall stack
        "pq_adc_search", "ivf_topk_multiprobe",
        "embedding_quantize", "quantized_topk_rescore",
        "quantized_ivf_topk", "ann_recall_report",
        # repeated_passages rotated out for winnow_fingerprint_pairs
        # (same passage/substring-fingerprint family, green r5)
        # embedding_neardup_pairs rotated out for pq_ivf_search (r6):
        # its assign_clusters bucketing rides the in-window IVF/kmeans
        # stack, near-dup family carried by neardup_prune
        # tfidf_top_terms rotated out for fuzzy_name_pairs (r6):
        # vocab-bounded corpus statistics carried by lm_doc_score and
        # bigram_collocations
        "pq_ivf_search", "pii_scrub", "winnow_fingerprint_pairs",
        # kmeans_ivf_assign rotated out for cluster_topic_terms (r6):
        # the kmeans training machinery is the stage inside the
        # composition, whose oracle unrolls the same iterations
        "context_pack_bins", "fuzzy_name_pairs", "bigram_collocations",
        "cluster_topic_terms", "lm_doc_score", "multimodal_decode",
        # composed family carriers (text X1-X5, formats X61+X62);
        # multimodal_profile rotated out for weekly_cohort_retention
        # (r6) — multimodal keeps hash-checked multimodal_decode
        "text_profile", "weekly_cohort_retention", "format_roundtrips",
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
