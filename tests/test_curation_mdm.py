"""Golden-record survivorship (X148) on planted duplicate entities."""

from __future__ import annotations

from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY


def test_golden_record_survivorship_rules(spark, tmp_path):
    rows = [
        # nation 1: a 3-member edit-distance chain (1-2, 2-3)
        (1, "ACME CORP", 1, 10.00),
        (2, "ACME CORQ", 1, 99.99),
        (3, "AXME CORQ", 1, 50.00),
        # nation 2: same-shape name but different nation — must NOT merge
        (4, "ACME CORX", 2, 77.00),
        # singletons
        (5, "ZETA LLC", 3, 5.00),
        (6, "WIDGETS INC", 1, 1.25),
    ]
    df = spark.createDataFrame(
        rows, "s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    out = {
        r.cluster_id: r
        for r in REGISTRY["supplier_golden_record"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 4, 5, 6}
    merged = out[1]
    assert merged.n_members == 3 and merged.n_names == 3
    assert merged.golden_name == "ACME CORP"  # lowest-key member
    assert merged.nation_mode == 1
    assert merged.max_acctbal == 99.99  # exact decimal max
    assert out[4].n_members == 1 and out[4].golden_name == "ACME CORX"
    assert out[5].nation_mode == 3 and out[6].max_acctbal == 1.25
