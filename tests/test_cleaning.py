"""Cleaning/dedup operator semantics (SURVEY.md §5 item 3; reference
``clean_load_2_tf_staging.py:73-90`` and ``clean_load_3_ld_staging.py:54-63``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
    dedup_keep_best,
    dedup_last_write_wins,
    derive_status,
    epoch_seconds_to_timestamp,
    remove_dupes_except_all,
)


def test_epoch_seconds_to_timestamp(spark):
    df = spark.createDataFrame([Row(a=0, b=1609459200)])  # 2021-01-01T00:00:00Z
    out = epoch_seconds_to_timestamp(df, ["a", "b"]).collect()[0]
    assert out.a == dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc).astimezone().replace(tzinfo=None)
    assert out.b.year == 2021 and out.b.month == 1


def test_derive_status(spark):
    df = spark.createDataFrame([Row(end_date=None), Row(end_date="2021-01-01")])
    out = [r.status for r in derive_status(df).collect()]
    assert sorted(out) == ["Active", "Inactive"]


def test_dedup_keep_best_picks_winner(spark):
    df = spark.createDataFrame(
        [(1, None, 100), (1, None, 200), (2, None, 50)],  # winner: highest salary per key
        "emp_id long, end_date date, salary long",
    )
    out = dedup_keep_best(df, ["emp_id", "end_date"], [F.col("salary").desc()])
    got = {(r.emp_id, r.salary) for r in out.collect()}
    assert got == {(1, 200), (2, 50)}


def test_dedup_last_write_wins_with_tie_breakers(spark):
    df = spark.createDataFrame(
        [
            Row(emp_id=1, day="d1", arrival=1, status="A"),
            Row(emp_id=1, day="d1", arrival=2, status="B"),  # latest arrival wins
            # tied arrival: tie-breaker decides deterministically
            Row(emp_id=2, day="d1", arrival=1, status="X"),
            Row(emp_id=2, day="d1", arrival=1, status="Y"),
        ]
    )
    out = dedup_last_write_wins(
        df, ["emp_id", "day"], "arrival", tie_breakers=[F.col("status").desc()]
    )
    got = {(r.emp_id, r.status) for r in out.collect()}
    assert got == {(1, "B"), (2, "Y")}


def test_remove_dupes_except_all_keeps_multiplicity(spark):
    # two IDENTICAL rows: the window marks one as rn>1, exceptAll must
    # remove exactly one copy (bag semantics), keeping the other
    df = spark.createDataFrame(
        [
            Row(emp_id=1, salary=100),
            Row(emp_id=1, salary=100),
            Row(emp_id=3, salary=50),
        ]
    )
    out = remove_dupes_except_all(df, ["emp_id"], [F.col("salary").desc()])
    got = sorted((r.emp_id, r.salary) for r in out.collect())
    assert got == [(1, 100), (3, 50)]


def test_forward_fill_carries_last_nonnull(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        forward_fill,
    )

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 40.0), ("b", 1, None)],
        "k string, i bigint, v double",
    )
    got = {
        (r["k"], r["i"]): r["v_filled"]
        for r in forward_fill(df, ["k"], ["i"], "v").collect()
    }
    assert got == {("a", 1): 10.0, ("a", 2): 10.0, ("a", 3): 10.0, ("a", 4): 40.0, ("b", 1): None}


def test_resample_interpolate_linear_and_boundaries(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        resample_interpolate,
    )
    from pyspark.sql import functions as F

    # one key: observations at t=100 (v=10) and t=200 (v=30)
    obs = spark.createDataFrame(
        [(1, 100, 1, 10.0), (1, 200, 2, 30.0)],
        "k bigint, t bigint, o bigint, v double",
    )
    grid = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 150), (1, 175), (1, 250)], "k bigint, t bigint"
    )
    out = {r.t: r.v_interp for r in
           resample_interpolate(obs, grid, "k", "t", "o", "v").collect()}
    assert out[50] == 10.0      # before first obs -> clamp to next
    assert out[100] == 10.0     # collides with obs -> obs value
    assert out[150] == 20.0     # halfway
    assert out[175] == 25.0     # 3/4 of the way
    assert out[250] == 30.0     # after last obs -> clamp to prev


def test_winsorize_clamps_and_preserves_rows(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        winsorize,
    )

    rows = [("a", float(v)) for v in range(1, 101)] + [("a", 10000.0), ("a", -500.0)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    out = winsorize(df, "k", "v", lo=0.05, hi=0.95).collect()
    assert len(out) == len(rows)  # repair, not deletion
    lo, hi = out[0]["__lo"], out[0]["__hi"]
    assert all(r["__lo"] == lo and r["__hi"] == hi for r in out)
    assert all(lo <= r.v_wins <= hi for r in out)
    # the two planted outliers clamp to the cuts; interior rows unchanged
    clamped = {r.v: r.v_wins for r in out}
    assert clamped[10000.0] == hi and clamped[-500.0] == lo
    assert clamped[50.0] == 50.0


def test_winsorize_null_values_and_null_keys_survive(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        winsorize,
    )

    rows = [("a", float(v)) for v in range(1, 21)] + [
        ("a", None),       # NULL value: must stay NULL, not become the cut
        (None, 1.0),       # NULL key: its own stratum, not dropped
        (None, 100.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    out = winsorize(df, "k", "v", lo=0.05, hi=0.95).collect()
    assert len(out) == len(rows)
    nulls = [r for r in out if r.v is None]
    assert len(nulls) == 1 and nulls[0].v_wins is None
    null_key = [r for r in out if r.k is None]
    assert len(null_key) == 2  # clipped against their own group's cuts
    assert all(r["__lo"] <= r.v_wins <= r["__hi"] for r in null_key)


def test_priority_sample_matches_python_reference(spark):
    """The sample is a pure function of (keys, weights, seed): a
    pure-Python replay of the md5 priority computation picks the same
    k rows in the same rank order."""
    import hashlib

    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import priority_sample

    rows = [(i, (i * 7) % 13 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id LONG, wt LONG")
    got = [
        (r.id, r.weight, r.priority_key, r.sample_rank)
        for r in priority_sample(df, ["id"], "wt", k=10, seed="t-v1")
        .orderBy("sample_rank")
        .collect()
    ]

    def prio(i, w):
        h = int(hashlib.md5(f"{i}:t-v1".encode()).hexdigest()[:15], 16)
        return h // w

    ref = sorted(((prio(i, w), i, w) for i, w in rows))[:10]
    assert got == [(i, w, p, rk + 1) for rk, (p, i, w) in enumerate(ref)]


def test_priority_sample_determinism_and_weight_semantics(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import priority_sample

    rows = [(1, 1_000_000_000), (2, None), (3, 0), (4, -5)] + [
        (i, 1) for i in range(5, 30)
    ]
    df = spark.createDataFrame(rows, "id LONG, wt LONG")
    a = priority_sample(df, ["id"], "wt", k=5).collect()
    b = priority_sample(df, ["id"], "wt", k=5).collect()
    assert a == b                                     # reruns identical
    ids = {r.id for r in a}
    assert ids <= {1} | set(range(5, 30))             # NULL/0/negative never sampled
    # a 10^9-weight row among weight-1 rows wins its place in the top-k
    # (its priority_key is ~10^9 smaller than any unit-weight row's)
    assert 1 in ids
    assert [r.sample_rank for r in sorted(a, key=lambda r: r.sample_rank)] == [1, 2, 3, 4, 5]


def test_priority_sample_fractional_weights_floor_semantics(spark):
    """ADVICE r8 regression: fractional weights are FLOORED before the
    integer sort key. Weights in (0, 1) floor to 0 and are EXCLUDED —
    before the fix they truncated to a zero divisor, `h div 0` yielded
    NULL, and NULLS-FIRST ordering silently handed those rows every
    sample slot. Fractional weights > 1 participate as floor(w)."""
    import hashlib

    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import priority_sample

    rows = [(1, 0.25), (2, 0.999), (3, 2.7), (4, 1.0)] + [
        (float(i), 5.5) for i in range(5, 15)
    ]
    rows = [(int(i), w) for i, w in rows]
    df = spark.createDataFrame(rows, "id LONG, wt DOUBLE")
    got = priority_sample(df, ["id"], "wt", k=6, seed="frac-v1").collect()
    ids = {r.id for r in got}
    assert ids.isdisjoint({1, 2})              # sub-unit weights excluded
    assert len(got) == 6 and all(r.priority_key is not None for r in got)

    def prio(i, w):
        h = int(hashlib.md5(f"{i}:frac-v1".encode()).hexdigest()[:15], 16)
        return h // int(w)                     # floor(w) as the divisor

    ref = sorted((prio(i, w), i) for i, w in rows if int(w) >= 1)[:6]
    assert [(r.priority_key, r.id) for r in sorted(got, key=lambda r: r.sample_rank)] == ref


def test_domain_mixture_allocation_and_selection(spark):
    """X150 invariants vs a pure-Python replay: 6-dp decimal sqrt
    weights, largest-remainder quotas summing exactly to N=200, and
    md5-rank selection per domain."""
    import hashlib
    import math
    from decimal import Decimal

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents").select("lang", "doc_id").collect()
    counts = {}
    for r in docs:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    wts = {g: Decimal(str(round(math.sqrt(n), 6))) for g, n in counts.items()}
    W = float(sum(wts.values()))
    xs = {g: float(w) * 200 / W for g, w in wts.items()}
    base = {g: math.floor(x) for g, x in xs.items()}
    deficit = 200 - sum(base.values())
    order = sorted(counts, key=lambda g: (-(xs[g] - base[g]), g))
    quota = {g: base[g] + (1 if order.index(g) < deficit else 0) for g in counts}
    assert sum(quota.values()) == 200

    out = REGISTRY["domain_mixture_sample"].fn(spark, sf).collect()
    assert len(out) == 200
    got_quota = {r.lang: r.quota for r in out}
    assert got_quota == quota
    by_lang = {}
    for r in out:
        assert r.n_domain == counts[r.lang]
        by_lang.setdefault(r.lang, []).append(r)
    for g, rows in by_lang.items():
        assert len(rows) == quota[g]
        assert sorted(r.samp_rank for r in rows) == list(range(1, quota[g] + 1))
    # replay the md5 hash ranking for one domain
    g = max(quota, key=quota.get)
    hkey = lambda d: (int(hashlib.md5(f"{d}:dmix-v1".encode()).hexdigest()[:15], 16), d)
    expect = sorted((r.doc_id for r in docs if r.lang == g), key=hkey)[: quota[g]]
    assert sorted(r.doc_id for r in by_lang[g]) == sorted(expect)
