"""profile_columns / approx_distinct semantics."""

from __future__ import annotations

from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
    approx_distinct,
    profile_columns,
)


def test_profile_columns_nulls_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 3.5), (3, "b", None), (4, "a", 0.5)],
        "k bigint, s string, v double",
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["s"]["n_nonnull"], got["s"]["n_distinct"]) == (3, 2)
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    assert (got["v"]["n_nonnull"], got["v"]["min_value"], got["v"]["max_value"]) == (3, "0.5", "3.5")
    assert got["k"]["n_distinct"] == 4


def test_profile_columns_subset(spark):
    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    out = profile_columns(df, ["s"]).collect()
    assert [r["col_name"] for r in out] == ["s"]


def test_approx_distinct_close_to_exact(spark):
    df = spark.range(10_000).selectExpr("id", "id % 137 AS m")
    row = approx_distinct(df, ["id", "m"], rsd=0.02).collect()[0]
    assert abs(row["id_approx"] - 10_000) / 10_000 < 0.1
    assert abs(row["m_approx"] - 137) / 137 < 0.1


def test_quantile_buckets_match_exact_ntile(spark):
    # Untied values, count divisible by n: cut-point binning must equal
    # exact NTILE (the formulation it replaces at scale).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
        quantile_buckets,
    )

    df = spark.range(1, 101).select((F.col("id") * 1.5).alias("v"))
    got = {
        r["v"]: r["bucket"]
        for r in quantile_buckets(df, "v", n=10).collect()
    }
    want = {
        r["v"]: r["nt"]
        for r in df.select(
            "v", F.ntile(10).over(Window.orderBy("v")).alias("nt")
        ).collect()
    }
    assert got == want


def test_quantile_buckets_ties_land_low_and_cover_all_rows(spark):
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
        quantile_buckets,
    )

    df = spark.range(0, 200).select((F.col("id") % 4).cast("double").alias("v"))
    out = quantile_buckets(df, "v", n=4).groupBy("bucket").count().collect()
    assert sum(r["count"] for r in out) == 200
    # every row carrying an identical value gets the same bucket
    per_val = (
        quantile_buckets(df, "v", n=4)
        .groupBy("v")
        .agg(F.count_distinct("bucket").alias("nb"))
        .collect()
    )
    assert all(r["nb"] == 1 for r in per_val)


def test_quantile_buckets_null_bucket_and_n_validation(spark):
    import pytest
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
        quantile_buckets,
    )

    df = spark.createDataFrame(
        [Row(v=float(x)) for x in range(1, 9)] + [Row(v=None), Row(v=None)]
    )
    out = quantile_buckets(df, "v", n=4).collect()
    # NULL values are unranked: NULL bucket, never the top bucket
    assert sum(1 for r in out if r.bucket is None) == 2
    assert all(r.bucket is not None for r in out if r.v is not None)
    assert {r.bucket for r in out if r.v is not None} == {1, 2, 3, 4}
    with pytest.raises(ValueError):
        quantile_buckets(df, "v", n=1)


def test_profile_columns_approx_bounds_vs_exact(spark):
    """The approx profile (column_profile_approx's operator) must agree
    with the exact profile on every non-distinct statistic, and each
    HLL++ cardinality estimate must land within the error bound."""
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    rsd = 0.05
    exact = {r.col_name: r for r in profile_columns(orders, cols).collect()}
    approx = {r.col_name: r for r in profile_columns(orders, cols, approx=True, rsd=rsd).collect()}
    assert set(exact) == set(approx) == set(cols)
    for c in cols:
        e, a = exact[c], approx[c]
        assert (a.n_rows, a.n_nonnull, a.min_value, a.max_value) == (
            e.n_rows,
            e.n_nonnull,
            e.min_value,
            e.max_value,
        )
        # 5-sigma bound on the relative standard deviation: loose
        # enough to be flake-free, tight enough to catch a wrong sketch
        assert abs(a.n_distinct - e.n_distinct) <= max(5 * rsd * e.n_distinct, 2), c


def test_validate_constraints_null_predicate_is_violation(spark):
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
        validate_constraints,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "O"), (2, -1.0, "O"), (3, None, "X"), (4, 2.0, None)],
        "k INT, price DOUBLE, status STRING",
    )
    out = {
        r.k: sorted(r.violations)
        for r in validate_constraints(
            df,
            {
                "pos": F.col("price") > 0,
                "status_ok": F.col("status").isin("O", "F"),
            },
        ).collect()
    }
    assert out[1] == []
    assert out[2] == ["pos"]
    # NULL price -> NULL predicate -> VIOLATION, plus unknown status
    assert out[3] == ["pos", "status_ok"]
    # NULL status -> isin yields NULL -> violation
    assert out[4] == ["status_ok"]


def test_approx_percentiles_within_rank_error_of_exact(spark):
    """salary_percentiles_approx (rows-only by contract): the group set
    and counts must equal the exact report's, and each approximate
    quantile must land between the exact order statistics at
    probability +/- 2/accuracy — the Greenwald-Khanna guarantee with
    margin."""
    from pyspark.sql import functions as F

    import employee_data_management_system_data_engineering_solution_spark.plans.core as core

    sf = "/root/testdata/sf0.001"
    approx = {r.designation: r for r in core.salary_percentiles_approx(spark, sf).collect()}
    exact = {r.designation: r for r in core.salary_percentiles(spark, sf).collect()}
    assert set(approx) == set(exact)
    import bisect

    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    orders = read_table(spark, sf, "orders")
    vals: dict[str, list[float]] = {}
    for row in orders.select("o_orderpriority", "o_totalprice").collect():
        vals.setdefault(row.o_orderpriority, []).append(row.o_totalprice)
    eps = 2.0 / 1000  # accuracy=1000
    for d, r in approx.items():
        assert r.n == exact[d].n, d
        xs = sorted(vals[d])
        n = len(xs)
        for p, got in ((0.5, r.p50_salary), (0.9, r.p90_salary)):
            # the returned value must be an actual order statistic whose
            # rank is within eps*n (+1 for discretization) of target —
            # the GK guarantee, asserted rank-wise because approx
            # returns data values, never interpolations
            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got) - 1
            assert lo <= hi, (d, p, got, "value not in group")
            target = p * n
            tol = eps * n + 1
            assert lo - tol <= target <= hi + 1 + tol, (d, p, got, lo, hi, target)


def test_woe_iv_matches_python_reference_and_handles_pure_buckets(spark):
    """Known counts → ln-share reference; a pure bucket (all events)
    stays finite via Laplace smoothing; NULL labels count on neither
    side."""
    import math

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import woe_iv

    rows = (
        [(0, True)] * 8 + [(0, False)] * 2      # event-heavy bucket
        + [(1, True)] * 1 + [(1, False)] * 9    # nonevent-heavy bucket
        + [(2, True)] * 5                       # PURE bucket: no nonevents
        + [(2, None)] * 3                       # NULL labels: counted nowhere
    )
    df = spark.createDataFrame(rows, "bucket INT, is_event BOOLEAN")
    got = {r.bucket: r for r in woe_iv(df).collect()}
    E, NE, B = 14, 11, 3
    for b, (e, ne) in {0: (8, 2), 1: (1, 9), 2: (5, 0)}.items():
        pe, pne = (e + 1) / (E + B), (ne + 1) / (NE + B)
        w = math.log(pe / pne)
        r = got[b]
        assert (r.n_events, r.n_nonevents) == (e, ne)
        assert abs(r.woe - round(w, 6)) < 1e-9, b
        assert abs(r.iv_term - round((pe - pne) * w, 6)) < 1e-9, b
    assert math.isfinite(got[2].woe)  # smoothing keeps the pure bucket finite


def test_fd_violations_null_semantics(spark):
    """{'a', NULL} per key is a violation (NULL is one extra value,
    not a wildcard); a NULL determinant forms a group; a clean FD
    reports rate 0."""
    from employee_data_management_system_data_engineering_solution_spark.operators.quality import fd_violations

    rows = [
        (1, "x"), (1, "x"),          # clean key
        (2, "a"), (2, None),         # violation via NULL-as-value
        (3, None), (3, None),        # NULL-only: one value, clean
        (None, "p"), (None, "q"),    # NULL determinant group, violating
    ]
    df = spark.createDataFrame(rows, "k INT, v STRING")
    r = fd_violations(df, ["k"], "v", "k->v").collect()[0]
    assert (r.n_keys, r.n_violating_keys, r.max_distinct_rhs) == (4, 2, 2)
    assert r.violation_rate == 0.5
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    assert fd_violations(clean, ["k"], "v", "f").collect()[0].violation_rate == 0.0


def test_benford_expected_literals_match_log10(spark):
    """The pinned 6-dp literals ARE log10(1+1/d), shares sum to ~1,
    and the digit extraction reads the decimal rendering (0.05 -> 5)."""
    import math

    from employee_data_management_system_data_engineering_solution_spark.plans.curation import _BENFORD
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    for d, lit in _BENFORD.items():
        assert abs(float(lit) - math.log10(1 + 1 / d)) < 5e-7, d
    rows = REGISTRY["benford_digit_audit"].fn(spark, "/root/testdata/sf0.001").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.abs_dev - abs(r.share - r.benford_expected)) < 2e-6


def test_k_anonymity_counts_match_hand_built_groups(spark, tmp_path):
    """Known QI group sizes -> exact small-group and at-risk counts
    per threshold; risk is monotone non-decreasing in k."""
    rows = []
    i = 0
    # groups: (nation, segment, bucket 0): sizes 1, 3, 6 across segments
    for seg, sz in (("A", 1), ("B", 3), ("C", 6)):
        for _ in range(sz):
            i += 1
            rows.append((i, f"c{i}", 7, 100.0, seg))
    df = spark.createDataFrame(
        rows, "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/customer.parquet")
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    got = {r.k: r for r in REGISTRY["k_anonymity_report"].fn(spark, sf).collect()}
    assert got[2].n_groups == 3
    assert (got[2].n_small_groups, got[2].rows_at_risk) == (1, 1)     # size-1 only
    assert (got[5].n_small_groups, got[5].rows_at_risk) == (2, 4)     # sizes 1+3
    assert (got[10].n_small_groups, got[10].rows_at_risk) == (3, 10)  # all
    assert got[2].risk_rate <= got[5].risk_rate <= got[10].risk_rate
    assert got[10].risk_rate == 1.0


def test_column_entropy_matches_math_reference(spark, tmp_path):
    """Known distribution -> -sum(p ln p); constant column -> entropy
    0 with NULL normalized entropy; near-unique -> norm ~ 1."""
    import math

    rows = [(i, "SAME", ["H", "H", "L", "M"][i % 4], i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "o_orderkey LONG, o_orderstatus STRING, o_orderpriority STRING, o_custkey LONG"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/orders.parquet")
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    got = {r.col_name: r for r in REGISTRY["column_entropy_profile"].fn(spark, sf).collect()}
    const = got["o_orderstatus"]
    assert (const.n_distinct, const.entropy, const.norm_entropy) == (1, -0.0, None)
    tri = got["o_orderpriority"]  # p = 1/2, 1/4, 1/4
    want = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert abs(tri.entropy - round(want, 4)) < 1e-9
    assert abs(tri.norm_entropy - round(want / math.log(3), 4)) < 1e-9
    uniq = got["o_custkey"]
    assert uniq.n_distinct == 40 and abs(uniq.norm_entropy - 1.0) < 1e-9


def test_logistic_gate_matches_reference_and_stays_jvm_side(spark):
    """Gate scores equal a pure-Python fixed-order dot product +
    sigmoid; the admission decision is logit >= 0; the plan has no
    Python eval node (broadcast weights + codegen arithmetic only)."""
    import contextlib
    import io
    import math

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import logistic_gate

    rows = [(1, 0.1, 2.0), (2, 0.0, 0.0), (3, -0.5, 4.0), (4, 0.3, -1.0)]
    df = spark.createDataFrame(rows, "id LONG, a DOUBLE, b DOUBLE")
    out = logistic_gate(df, {"a": 2.0, "b": -0.5}, intercept=0.25)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    # The test INPUT is a createDataFrame (Python-backed ExistingRDD);
    # the gate itself must add no Python eval node and must broadcast
    # the weight row.
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    got = {r.id: r for r in out.collect()}
    for i, a, b in rows:
        z = 0.25 + 2.0 * a + -0.5 * b
        assert got[i].logit == z
        assert got[i].prob == 1.0 / (1.0 + math.exp(-z))
        assert got[i].admitted == (z >= 0)


def test_logistic_gate_rejects_reserved_column_names(spark):
    """Inputs already carrying a helper/output column name must raise
    instead of silently dropping the user's column (r9 ADVICE item)."""
    import pytest

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import logistic_gate

    for bad in ("logit", "prob", "admitted", "__b", "__w_0"):
        df = spark.createDataFrame(
            [(1, 0.5, 2.0)], f"id LONG, a DOUBLE, {bad} DOUBLE"
        )
        with pytest.raises(ValueError, match="reserves column names"):
            logistic_gate(df, {"a": 1.0}, intercept=0.0)
