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
    assert set(qs) - set(oracles) == {
        "simhash_signatures",
        "multimodal_decode",
        "strike_stream_stateful",
    }


def test_every_query_runs_at_smoke_sf(spark):
    # schema-stability pass at sf0.001: every registered query analyzes
    # and returns a DataFrame with at least one column (cheap: no action)
    for name, fn in queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
