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


def test_keep_old_emits_old_values(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "k INT, g STRING, v DOUBLE"
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "b", 30.0), (4, "c", 40.0)], "k INT, g STRING, v DOUBLE"
    )
    got = {
        r.k: r
        for r in snapshot_diff(old, new, ["k"], keep_old=True).collect()
    }
    assert got[1].change_type == "delete" and got[1].old_v == 10.0
    assert got[2].change_type == "update" and got[2].old_g == "a" and got[2].g == "b"
    assert got[2].old_v == 20.0 and got[2].v == 25.0
    assert got[4].change_type == "insert" and got[4].old_v is None
    assert 3 not in got  # unchanged


def _recompute(df):
    from pyspark.sql import functions as F

    return {
        (r.g, r.n, float(r.s))
        for r in df.groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def test_incremental_refresh_equals_recompute_with_moves_and_empties(spark):
    """The maintenance algebra on every edge: a fully-deleted group
    vanishes, a delta-created group appears, a group-moving update
    transfers (count, sum) between groups, and the refreshed aggregate
    equals a from-scratch recompute of the new snapshot."""
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        agg_delta_contributions,
        apply_agg_delta,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "gone", 40)],
        "k INT, g STRING, v INT",
    )
    new = spark.createDataFrame(
        # k=1 moves a->b, k=2 repriced in place, k=3 unchanged, k=4
        # deleted (group 'gone' empties), k=5 creates group 'c'
        [(1, "b", 10), (2, "a", 25), (3, "b", 30), (5, "c", 50)],
        "k INT, g STRING, v INT",
    )
    base = old.groupBy("g").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    delta = agg_delta_contributions(
        snapshot_diff(old, new, ["k"], keep_old=True), "g", "v"
    )
    refreshed = apply_agg_delta(
        base, delta, ["g"], [("n", "d_n"), ("s", "d_sum")], count_col="n"
    )
    got = {(r.g, r.n, float(r.s)) for r in refreshed.collect()}
    assert got == _recompute(new)
    assert not any(g == "gone" for g, _, _ in got)
    assert any(g == "c" for g, _, _ in got)


def test_incremental_refresh_null_values_and_null_groups(spark):
    """The NULL edges the review flagged: an update whose NEW value is
    NULL must subtract the old value (not net to zero through the
    coalesced diff column), a NULL old value contributes nothing to the
    sum while still moving the count, and a NULL GROUP key merges
    null-safely into ONE refreshed row."""
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        agg_delta_contributions,
        apply_agg_delta,
        snapshot_diff,
    )

    schema = "k INT, g STRING, v INT"
    old = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None), (3, None, 7), (4, None, 1)], schema
    )
    new = spark.createDataFrame(
        # k=1: value nulled in place; k=2: NULL->9; k=3 stays in the
        # NULL group repriced; k=4 deleted from the NULL group
        [(1, "a", None), (2, "a", 9), (3, None, 8)], schema
    )
    base = old.groupBy("g").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    delta = agg_delta_contributions(
        snapshot_diff(old, new, ["k"], keep_old=True), "g", "v"
    )
    got = {
        r.g: (r.n, r.s)
        for r in apply_agg_delta(
            base, delta, ["g"], [("n", "d_n"), ("s", "d_sum")], count_col="n"
        ).collect()
    }
    # recompute of new: group a -> n=2, s=9 (NULL skipped); NULL group -> n=1, s=8
    assert got == {"a": (2, 9), None: (1, 8)}


def test_incremental_refresh_all_null_group_refreshes_to_null_sum(spark):
    """The last NULL edge in the exactness contract: a surviving group
    whose values become ALL NULL recomputes to sum=NULL, so the
    maintained aggregate must refresh to NULL too (via the ``d_nv``
    non-null witness + ``null_when_zero``), not the coalesced 0."""
    import pytest
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        agg_delta_contributions,
        apply_agg_delta,
        snapshot_diff,
    )

    schema = "k INT, g STRING, v INT"
    old = spark.createDataFrame([(1, "a", 5), (2, "a", 3), (3, "b", 1)], schema)
    new = spark.createDataFrame([(1, "a", None), (2, "a", None), (3, "b", 2)], schema)
    base = old.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.count("v").alias("nv")
    )
    delta = agg_delta_contributions(
        snapshot_diff(old, new, ["k"], keep_old=True), "g", "v"
    )
    args = (base, delta, ["g"], [("n", "d_n"), ("s", "d_sum"), ("nv", "d_nv")])
    got = {
        r.g: (r.n, r.s)
        for r in apply_agg_delta(
            *args, count_col="n", null_when_zero=[("s", "nv")]
        ).collect()
    }
    assert got == {"a": (2, None), "b": (1, 2)}

    # the witness must itself be a maintained column
    with pytest.raises(ValueError, match="null_when_zero"):
        apply_agg_delta(
            base, delta, ["g"], [("n", "d_n"), ("s", "d_sum")],
            count_col="n", null_when_zero=[("s", "nv")],
        )


def test_keep_old_emits_raw_new_side_columns(spark):
    old = spark.createDataFrame([(1, 10.0)], "k INT, v DOUBLE")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k INT, v DOUBLE")
    got = {r.k: r for r in snapshot_diff(old, new, ["k"], keep_old=True).collect()}
    # update to NULL: main column coalesces to the OLD value, but the
    # raw new-side column keeps the truth
    assert got[1].change_type == "update" and got[1].v == 10.0
    assert got[1].new_v is None and got[1].old_v == 10.0
    assert got[2].change_type == "insert" and got[2].new_v == 5.0


def test_dirty_group_refresh_recomputes_only_touched_groups(spark):
    """min/max are not delta-maintainable under deletes; the fallback
    recomputes dirty groups from the new base and must pass CLEAN
    groups through from the stored view untouched — proven here by
    poisoning a clean group's stored row and checking the poison
    survives while every dirty group comes out exactly recomputed."""
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        dirty_group_refresh,
        snapshot_diff,
    )

    schema = "k INT, g STRING, v INT"
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 99), (3, "b", 5), (4, "clean", 7), (5, None, 3)],
        schema,
    )
    new = spark.createDataFrame(
        # k=2 (the max of 'a') deleted -> 'a' must recompute to max=10;
        # k=3 moves b->c; k=5 repriced inside the NULL group; 'clean'
        # untouched
        [(1, "a", 10), (3, "c", 5), (4, "clean", 7), (5, None, 4)],
        schema,
    )
    aggs = [
        F.count("*").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    ]
    stored = old.groupBy("g").agg(*aggs)
    # poison the clean group: if the refresh recomputed it, the poison
    # would be healed and this test would catch the extra work
    poisoned = stored.withColumn(
        "vmax", F.when(F.col("g") == "clean", F.lit(777)).otherwise(F.col("vmax"))
    )
    diff = snapshot_diff(old, new, ["k"], keep_old=True)
    got = {
        r.g: (r.n, r.vmin, r.vmax)
        for r in dirty_group_refresh(poisoned, new, diff, "g", aggs).collect()
    }
    assert got == {
        "a": (1, 10, 10),      # extremum retired by delete -> recomputed
        "c": (1, 5, 5),        # move-in group created
        "clean": (1, 7, 777),  # untouched: stored row (poison intact)
        None: (1, 4, 4),       # NULL group is a real, refreshable group
    }
    assert "b" not in got  # move-out emptied the group


def test_cdc_replay_tombstones_resurrection_and_new_keys(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        cdc_replay,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k INT, v STRING"
    )
    log = spark.createDataFrame(
        [
            (1, 2, "upsert", "b2"),   # plain update
            (2, 3, "delete", None),   # tombstone
            (3, 3, "upsert", "c2"),   # resurrection AFTER the tombstone
            (4, 4, "delete", None),   # stays dead
            (5, 9, "upsert", "new"),  # brand-new key
            (6, 9, "upsert", "new2"), # last writer wins on the new key
        ],
        "seq INT, k INT, op STRING, v STRING",
    )
    got = {r.k: r.v for r in cdc_replay(base, log, ["k"]).collect()}
    assert got == {1: "a", 2: "b2", 3: "c2", 9: "new2"}


def test_cdc_replay_unknown_op_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        cdc_replay,
    )

    base = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    log = spark.createDataFrame([(1, 1, "truncate", None)], "seq INT, k INT, op STRING, v STRING")
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="unknown op"):
        cdc_replay(base, log, ["k"]).collect()


def test_cdc_replay_duplicate_winning_seq_raises(spark):
    """ADVICE r8 regression: two log entries sharing a key's WINNING
    (key, seq) have no defined last writer — the replay must poison
    the run, not let partitioning order pick an arbitrary winner."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        cdc_replay,
    )

    base = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    dup = spark.createDataFrame(
        [(5, 1, "upsert", "x"), (5, 1, "upsert", "y")],
        "seq INT, k INT, op STRING, v STRING",
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="duplicate winning seq"):
        cdc_replay(base, dup, ["k"]).collect()

    # duplicates BELOW the winner are harmless history: collapse keeps
    # the unique top seq and replays deterministically
    ok = spark.createDataFrame(
        [(1, 1, "upsert", "x"), (1, 1, "upsert", "y"), (2, 1, "upsert", "z")],
        "seq INT, k INT, op STRING, v STRING",
    )
    got = {(r.k, r.v) for r in cdc_replay(base, ok, ["k"]).collect()}
    assert got == {(1, "z")}
