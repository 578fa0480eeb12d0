"""snapshot_diff / hash_split semantics on hand-built frames."""

from __future__ import annotations

from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
    hash_split,
    snapshot_diff,
)


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged → dropped
         (2, "B", 20.0),      # update (s)
         (4, None, 41.0),     # update (v; null-safe s compare)
         (5, "e", 50.0)],     # insert; 3 missing → delete
        "k bigint, s string, v double",
    )
    out = {r["k"]: (r["change_type"], r["s"], r["v"])
           for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert out == {
        2: ("update", "B", 20.0),
        3: ("delete", "c", 30.0),
        4: ("update", None, 41.0),
        5: ("insert", "e", 50.0),
    }


def test_snapshot_diff_keep_unchanged(spark):
    old = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    new = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    out = snapshot_diff(old, new, keys=["k"], keep_unchanged=True).collect()
    assert [r["change_type"] for r in out] == ["unchanged"]


def test_hash_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(df, "doc_id").collect()}
    assert a == b                                   # stable across runs
    assert all(0 <= v[0] < 100 for v in a.values())
    assert {v[1] for v in a.values()} <= {"train", "valid", "test"}
    # roughly 80/10/10 (loose bounds; 200 keys)
    n_train = sum(1 for v in a.values() if v[1] == "train")
    assert 120 <= n_train <= 195


def test_hash_split_seed_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    a = {r["doc_id"]: r["bucket"] for r in hash_split(df, "doc_id", seed="s1").collect()}
    b = {r["doc_id"]: r["bucket"] for r in hash_split(df, "doc_id", seed="s2").collect()}
    assert a != b


def test_quality_weighted_sample_contract(spark):
    """Importance resample: deterministic, unbiased-weight contract —
    every survivor's weight is 10000/thresh for its own quality, and
    the kept fraction tracks the mean keep-probability."""
    from employee_data_management_system_data_engineering_solution_spark.plans.curation import (
        quality_weighted_sample,
    )

    out = quality_weighted_sample(spark, "/root/testdata/sf0.001").collect()
    again = quality_weighted_sample(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)
    assert out, "sample must be non-empty"
    for r in out[:50]:
        p = min(max(r.quality, 0.05), 0.95)
        thresh = round(p * 10000)
        assert abs(r.sample_weight - round(10000.0 / thresh, 4)) < 1e-9
    # corpus is 500 docs; kept count should be near sum of keep-probs
    # (hash buckets are uniform) — loose 3-sigma-ish band
    n_kept = len(out)
    assert 50 < n_kept < 500
