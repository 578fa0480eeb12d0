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
        "daily_pipeline", "staging_promote_roundtrip",
        "partition_pruned_report",
        "schema_evolution_read", "bucketed_colocated_join",
        # scd / upsert / dedup (sorts ride q3/ordered reports; the r4-r5
        # rotations moved 2-3-round-stable carriers to the tail —
        # dedup_last_write_wins rides dedup_keep_best's row_number
        # family, pct_of_quota's inner equi-join rides q3 — guarded by
        # the full local oracle run before each snapshot)
        "keyed_upsert", "scd2_merge", "dedup_keep_best",
        "upcoming_leave_pct",
        # every streaming carrier (rlike carries ST2+ST4 in full; the
        # event_type stand-in variant rides the tail)
        "strike_report_rlike",
        "strike_window_counts", "strike_stream_stateful",
        "stream_dedup_counts", "session_window_counts",
        "stream_purchase_view_join", "streaming_upsert_dim",
        # temporal joins / repair / sessionization / anomalies + CDC
        "purchase_asof_view", "events_in_error_windows",
        "user_value_trend", "forward_fill_values", "event_sessions",
        "value_outliers", "snapshot_diff_orders",
        # LLM dedup / ANN / multimodal / text-scrub stack
        # (dedup_clusters rotated out in r5: identical oracle and
        # algorithm family carried by dedup_clusters_star; the composed
        # corpus prune neardup_prune took its slot)
        "exact_dedup", "minhash_lsh_groups", "ngram_jaccard_pairs",
        "dedup_clusters_star", "neardup_prune", "doc_chunks",
        "hyperplane_lsh_groups", "embedding_topk", "ivf_topk",
        "embedding_neardup_pairs", "pii_scrub", "repeated_passages",
        "context_pack_bins", "tfidf_top_terms", "bigram_collocations",
        "kmeans_ivf_assign", "lm_doc_score",
        # composed family carriers (text X1-X5, multimodal X16+X33,
        # formats X61+X62)
        "text_profile", "multimodal_profile", "format_roundtrips",
    }
    assert carriers <= set(window), sorted(carriers - set(window))


def test_every_query_runs_at_smoke_sf(spark):
    # schema-stability pass at sf0.001: every registered query analyzes
    # and returns a DataFrame with at least one column (cheap: no action)
    for name, fn in queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
