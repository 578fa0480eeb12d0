"""Misra-Gries candidates + exact-rescore heavy hitters
(operators/freq.py): the superset guarantee under forced pruning, and
end-to-end equality with the exact full groupBy."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from employee_data_management_system_data_engineering_solution_spark.operators.freq import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _items_df(spark, items, partitions=8):
    return spark.createDataFrame(
        [(x,) for x in items], "item STRING"
    ).repartition(partitions)


def test_mg_candidates_contain_every_frequent_item_under_pruning(spark):
    """Zipf-ish stream, capacity far below the distinct count so every
    partition prunes: any item with global count > N/(capacity+1) must
    still appear in the union of partition summaries — for an
    arbitrary (here: round-robin) partitioning."""
    rng = random.Random(7)
    # 3 hot items + a long tail of 500 cold ones
    items = (
        ["hot_a"] * 400 + ["hot_b"] * 300 + ["hot_c"] * 200
        + [f"cold_{rng.randrange(500)}" for _ in range(600)]
    )
    rng.shuffle(items)
    capacity = 15
    got = {
        r.item
        for r in misra_gries_candidates(
            _items_df(spark, items), "item", capacity
        ).collect()
    }
    n = len(items)
    true = Counter(items)
    guaranteed = {i for i, c in true.items() if c > n / (capacity + 1)}
    assert guaranteed <= got
    assert {"hot_a", "hot_b", "hot_c"} <= got


def test_heavy_hitters_exact_equals_full_groupby(spark):
    """The whole point: the two-pass result is EXACT — identical items
    AND identical counts to the full-vocabulary groupBy filter — while
    the capacity (just above denom) forces real pruning."""
    rng = random.Random(11)
    items = [f"w{rng.randrange(80)}" for _ in range(2000)] + ["anchor"] * 150
    rng.shuffle(items)
    denom, capacity = 20, 31  # threshold 5% of 2150; 80+ distinct > capacity
    got = {
        (r.item, r.n)
        for r in heavy_hitters_exact(
            _items_df(spark, items), "item", denom=denom, capacity=capacity
        ).collect()
    }
    true = Counter(items)
    want = {(i, c) for i, c in true.items() if c * denom > len(items)}
    assert got == want
    assert ("anchor", 150) in got


def test_heavy_hitters_rejects_guarantee_breaking_capacity(spark):
    df = _items_df(spark, ["a", "b"])
    with pytest.raises(ValueError, match="candidate superset guarantee"):
        heavy_hitters_exact(df, "item", denom=100, capacity=50)
    with pytest.raises(ValueError, match="capacity"):
        misra_gries_candidates(df, "item", 0)


def test_mg_nulls_are_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "item STRING"
    )
    got = Counter()
    for r in misra_gries_candidates(df, "item", 10).collect():
        got[r.item] += r.est  # summaries are PER PARTITION; est sums across them
    assert None not in got
    assert got["a"] == 2 and got["b"] == 1


def test_mg_totals_ride_the_summary_pass(spark):
    """emit_totals: per-partition exact totals sum to the stream
    length even when the shrink step empties a partition's candidate
    set (all counters tied at the cut) — the edge that forces totals
    onto their own rows."""
    from employee_data_management_system_data_engineering_solution_spark.operators.freq import (
        CAND,
        TOTAL,
    )

    # one partition, capacity 1, two distinct items with equal counts:
    # shrink subtracts the 2nd-largest (=largest) and empties the dict
    df = spark.createDataFrame([("a",), ("b",)], "item STRING").coalesce(1)
    rows = misra_gries_candidates(df, "item", 1, emit_totals=True).collect()
    kinds = Counter(r.kind for r in rows)
    assert kinds[TOTAL] == 1 and kinds.get(CAND, 0) == 0  # emptied, total intact
    assert sum(r.est for r in rows if r.kind == TOTAL) == 2

    # multi-partition: totals sum to the full stream length
    big = _items_df(spark, [f"w{i % 7}" for i in range(100)], partitions=4)
    rows = misra_gries_candidates(big, "item", 50, emit_totals=True).collect()
    assert sum(r.est for r in rows if r.kind == TOTAL) == 100
