"""Embedding similarity: brute-force top-k vs a numpy reference,
shuffle-free IVF assignment, IVF search."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from employee_data_management_system_data_engineering_solution_spark.operators.similarity import (
    assign_clusters,
    cosine_neardup_pairs,
    cosine_topk_bruteforce,
    ivf_topk,
)


def _vectors(n=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim)).astype(np.float32)


def _df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_bruteforce_topk_matches_numpy(spark):
    vecs = _vectors()
    df = _df(spark, vecs)
    queries = df.filter(df.vec_id < 3)
    got = cosine_topk_bruteforce(queries, df, k=5).collect()

    v = vecs.astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = np.round(unit @ unit.T, 6)
    for q in range(3):
        order = sorted(
            (i for i in range(len(vecs)) if i != q), key=lambda i: (-sims[q, i], i)
        )[:5]
        mine = sorted(
            ((r.neighbor_id, r.rank) for r in got if r.query_id == q), key=lambda t: t[1]
        )
        assert [n for n, _ in mine] == order


def test_assign_clusters_nearest_pivot(spark):
    vecs = _vectors()
    df = _df(spark, vecs)
    pivots = df.filter(df.vec_id < 4)
    got = {r.vec_id: r.cluster_id for r in assign_clusters(df, pivots).collect()}

    v = vecs.astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = np.round(unit @ unit.T, 6)
    for i in range(len(vecs)):
        # max sim, tie-break min pivot id
        want = min(range(4), key=lambda p: (-sims[i, p], p))
        assert got[i] == want, f"vec {i}"
    # a pivot is its own nearest pivot (cosine 1.0)
    assert all(got[p] == p for p in range(4))


def test_cosine_neardup_pairs_finds_planted_dup(spark):
    vecs = _vectors(20)
    df = _df(spark, vecs)
    # plant an exact duplicate of vec 5 as id 99
    dup = spark.createDataFrame([Row(vec_id=99, embedding=[float(x) for x in vecs[5]])])
    corpus = df.unionByName(dup)
    pivots = df.filter(df.vec_id < 4)
    out = cosine_neardup_pairs(corpus, pivots, threshold=0.999).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(5, 99)}
    assert out[0].cosine_sim == 1.0


def test_ivf_topk_subset_of_cluster(spark):
    vecs = _vectors(50)
    df = _df(spark, vecs)
    pivots = df.filter(df.vec_id < 5)
    queries = df.filter((df.vec_id >= 10) & (df.vec_id < 13))
    rows = ivf_topk(queries, df, pivots, k=5).collect()
    assigned = {r.vec_id: r.cluster_id for r in assign_clusters(df, pivots).collect()}
    assert {r.query_id for r in rows} == {10, 11, 12}
    for r in rows:
        # neighbors must come from the query's own cluster, never itself
        assert assigned[r.neighbor_id] == assigned[r.query_id]
        assert r.neighbor_id != r.query_id
    # ranks are 1..k contiguous per query
    for q in (10, 11, 12):
        ranks = sorted(r.rank for r in rows if r.query_id == q)
        assert ranks == list(range(1, len(ranks) + 1))
