"""Sequenced-funnel and cohort-retention semantics on hand-built
micro-corpora (the oracle pins cross-engine parity; these pin the
INTENDED semantics against cases the test data may not contain)."""

from __future__ import annotations

import datetime as dt



def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, 1.0, "{}")
         for i, (s, u, t) in enumerate(rows)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )


def _funnel(spark, ev, tmp_path):
    import employee_data_management_system_data_engineering_solution_spark.plans.temporal as tp

    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return {
        r.step: (r.n_users, r.conv_from_view)
        for r in tp.funnel_conversion_report(spark, str(tmp_path)).collect()
    }


def test_funnel_requires_strict_event_ordering(spark, tmp_path):
    # u1 converts fully in order; u2 purchased BEFORE clicking (no step
    # 3); u3 clicked before viewing (click doesn't count, no step 2);
    # u4 only views
    ev = _events(
        spark,
        [
            (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
            (0, 2, "view"), (5, 2, "purchase"), (10, 2, "click"),
            (0, 3, "click"), (10, 3, "view"),
            (0, 4, "view"),
        ],
    )
    got = _funnel(spark, ev, tmp_path)
    assert got["1_view"][0] == 4
    assert got["2_click"][0] == 2  # u1 and u2 (u2's click follows its view)
    assert got["3_purchase"][0] == 1  # only u1: u2's purchase precedes its click
    assert got["1_view"][1] == 1.0 and got["3_purchase"][1] == 0.25


def test_cohort_retention_counts_distinct_users_per_offset(spark, tmp_path):
    import employee_data_management_system_data_engineering_solution_spark.plans.temporal as tp

    wk = 7 * 24 * 3600
    # u1 active weeks 0,1,1 (dup within offset 1 must count once);
    # u2 first appears week 1, active again week 3
    ev = _events(
        spark,
        [
            (0, 1, "view"), (wk + 5, 1, "click"), (wk + 9, 1, "view"),
            (wk, 2, "view"), (3 * wk + 2, 2, "purchase"),
        ],
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.cohort_wk, r.week_offset): r.n_users
        for r in tp.weekly_cohort_retention(spark, str(tmp_path)).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_boilerplate_scrub_removes_later_occurrences_and_reassembles(spark, tmp_path):
    import hashlib

    import employee_data_management_system_data_engineering_solution_spark.plans.llm as llm

    header = " ".join(f"h{i}" for i in range(10))  # shared 10-word block
    b1 = " ".join(f"a{i}" for i in range(10))
    b2 = " ".join(f"b{i}" for i in range(7))  # short tail block survives
    docs = spark.createDataFrame(
        [
            (1, f"{header} {b1}", "en", "s", 0),
            (2, f"{header} {b2}", "en", "s", 0),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_blocks, r.n_kept, r.scrubbed_md5)
        for r in llm.boilerplate_scrub_stats(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1 owns the header (lowest doc_id) and keeps everything;
    # doc 2 loses the header and reassembles to just its tail block
    assert got == {
        1: (2, 2, md5(f"{header} {b1}")),
        2: (2, 1, md5(b2)),
    }
