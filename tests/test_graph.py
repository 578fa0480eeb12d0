"""connected_components semantics on hand-built edge lists, and
large-star/small-star equivalence (including the long-chain case where
min-label propagation's round count explodes)."""

from __future__ import annotations

import random

import pytest

from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _cc(spark, edges, fn=connected_components, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["component"] for r in fn(df, **kw).collect()}


def test_two_components_transitive(spark):
    # 1-2, 2-3 chain + separate 10-11
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # a 6-node path: label must propagate across the diameter
    got = _cc(spark, [(i, i + 1) for i in range(1, 6)])
    assert set(got.values()) == {1}


def test_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (1, 9)]) == {1: 1, 5: 1, 9: 1}


def test_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "src bigint, dst bigint")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


# ---------------------------------------------------------------------------
# large-star/small-star
# ---------------------------------------------------------------------------
def test_star_matches_minlabel_basic(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    assert _cc(spark, edges, connected_components_star) == _cc(spark, edges)


def test_star_long_chain_few_rounds(spark):
    # a 40-hop path: min-label would need ~40 propagation rounds;
    # star contraction must finish within its (logarithmic) budget
    edges = [(i, i + 1) for i in range(1, 41)]
    got = _cc(spark, edges, connected_components_star, max_iter=12)
    assert set(got.values()) == {1}
    assert len(got) == 41


def test_star_self_loops_and_singletons(spark):
    # self-loop-only nodes are their own component; a self-loop inside
    # a component changes nothing
    got = _cc(spark, [(7, 7), (1, 2), (2, 2)], connected_components_star)
    assert got == {7: 7, 1: 1, 2: 1}


def test_star_matches_minlabel_random(spark):
    rng = random.Random(17)
    nodes = list(range(1, 61))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b] or [(1, 2)]
    assert _cc(spark, edges, connected_components_star) == _cc(
        spark, edges, connected_components, max_iter=40
    )


def test_pagerank_fixed_point_mass_and_hub(spark):
    """Star graph: the hub must out-rank every leaf; total fixed-point
    mass stays within floor-loss of the scale; reruns are bit-equal."""
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # symmetric star: hub 1 <-> leaves 2..6
    rows = [(1, i) for i in range(2, 7)] + [(i, 1) for i in range(2, 7)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    pr = {r.node: r.rank_fp for r in pagerank_fixed_point(edges, iters=3).collect()}
    assert set(pr) == {1, 2, 3, 4, 5, 6}
    assert pr[1] > max(v for k, v in pr.items() if k != 1)
    assert len({v for k, v in pr.items() if k != 1}) == 1  # leaves symmetric
    total = sum(pr.values())
    scale = 10**12
    assert scale * 0.95 < total <= scale  # floor losses only shrink mass
    again = {r.node: r.rank_fp for r in pagerank_fixed_point(edges, iters=3).collect()}
    assert pr == again


def test_triangle_counts_on_known_graph(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant
    # edge 4-5 (no triangle) and a disconnected edge 6-7; duplicate and
    # reversed input edges must not double-count
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_rejects_oversized_ids(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(
        [(2**33, 1), (1, 2), (2, 2**33)], "src LONG, dst LONG"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        triangle_counts(df).collect()


def test_label_propagation_two_cliques_one_bridge(spark):
    """Two 4-cliques joined by a single bridge edge: after 3 sync
    rounds each clique converges to its minimum member's label, and the
    bridge does not merge them (LPA separates densely-knit groups where
    connected components would report ONE component)."""
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}
    # contrast: CC merges everything through the bridge
    cc = {r.node: r.component for r in connected_components(df).collect()}
    assert len(set(cc.values())) == 1


def test_label_propagation_deterministic_and_tie_breaks_low(spark):
    """Rerun-identical labels, and a node seeing two equal-frequency
    labels adopts the SMALLER one (the total-order tie-break the
    cross-engine oracle relies on)."""
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        label_propagation,
    )

    # node 5 bridges singletons 1 and 9: votes {1:1, 9:1, 5:1} round 1
    # -> tie on count, min label 1 wins
    df = spark.createDataFrame([(1, 5), (9, 5)], "src LONG, dst LONG")
    a = {r.node: r.label for r in label_propagation(df, rounds=1).collect()}
    b = {r.node: r.label for r in label_propagation(df, rounds=1).collect()}
    assert a == b
    assert a[5] == 1


def test_label_propagation_string_ids(spark):
    """The operator's contract has no numeric-id constraint: string
    vertex ids must propagate real labels (a negated-label tie-break
    would silently NULL them) with the same min-label tie rule."""
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(
        [("alpha", "mid"), ("zeta", "mid")], "src STRING, dst STRING"
    )
    got = {r.node: r.label for r in label_propagation(df, rounds=1).collect()}
    assert None not in got.values()
    assert got["mid"] == "alpha"  # tie on count -> lexicographic min


def test_part_link_prediction_matches_python_replay(spark):
    """Common-neighbor Jaccard over the capped part co-purchase graph
    replayed in pure Python at sf0.001: same per-node top-32
    adjacency, same non-edge filter, same exact-rational score."""
    from collections import defaultdict

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    li = (
        read_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    w = defaultdict(int)
    for pks in by_order.values():
        ss = sorted(pks)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                w[(ss[i], ss[j])] += 1
    edges = set(w)
    adj0 = defaultdict(list)
    for (a, b), wt in w.items():
        adj0[a].append((wt, b))
        adj0[b].append((wt, a))
    nbr = {
        v: {nb for _, nb in sorted(lst, key=lambda t: (-t[0], t[1]))[:32]}
        for v, lst in adj0.items()
    }
    # degree = |R(a)|, vias whose capped list CONTAINS a — the same
    # direction the wedge count uses, so jaccard is in [0, 1]
    listed_by = defaultdict(set)
    for v, ns in nbr.items():
        for nb in ns:
            listed_by[nb].add(v)
    seen = defaultdict(set)
    for v, ns in nbr.items():
        ss = sorted(ns)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                seen[(ss[i], ss[j])].add(v)
    want = {}
    for (a, b), common in seen.items():
        if (a, b) in edges:
            continue
        cn = len(common)
        da, db = len(listed_by[a]), len(listed_by[b])
        # HALF_UP like Spark/DuckDB round() — CPython's round() is
        # banker's and diverges on exact ties (e.g. 25/128 = 0.1953125)
        from decimal import ROUND_HALF_UP, Decimal

        jac = float(
            Decimal(repr(cn / (da + db - cn))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        if cn >= 2 and jac >= 0.1:
            assert 0.0 <= jac <= 1.0
            want[(a, b)] = (cn, da, db, jac)
    got = {
        (r.part_a, r.part_b): (r.common_neighbors, r.deg_a, r.deg_b, r.jaccard)
        for r in REGISTRY["part_link_prediction"].fn(spark, sf).collect()
    }
    assert len(got) > 0
    assert got == want
