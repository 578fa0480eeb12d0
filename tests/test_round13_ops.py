"""Independent-replay pins for the round-13 build-outs (X182–X186):
weekly seasonal decomposition, Mann-Kendall trend, the RI audit, the
range-partition planner, and MMR-diversified retrieval. Each test
recomputes the operator's contract in plain Python/numpy on a
hand-built warehouse — the same discipline as the BPE/GD replay suites
(SURVEY §5)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY


def _write(spark, tmp_path, table: str, rows, schema: str) -> None:
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(f"{tmp_path}/{table}.parquet")


_ORDERS_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)


def _order(k, cust, price, date):
    return (k, cust, "F", price, date, "1-URGENT")


# ---------------------------------------------------------------------------
# X182 seasonal decomposition
# ---------------------------------------------------------------------------
def test_seasonal_decompose_matches_python_replay(spark, tmp_path):
    """Dense 28-day series + a calendar gap + a 5-day coda: the replay
    recomputes daily sums, full-week-only centered trends (gap days
    disqualify their neighbours), per-isodow seasonal means and
    residual stddev. Revenue is quantized to .25 so every float sum in
    the replay is exact."""
    base = dt.datetime(2024, 1, 1)  # a Monday
    days = list(range(28)) + list(range(30, 35))  # gap: days 28, 29
    rows = []
    k = 0
    daily = {}
    for d in days:
        date = base + dt.timedelta(days=d)
        # deterministic wiggle: weekly pattern + trend + a second order
        r1 = 100.25 + 7.5 * (d % 7) + 0.75 * d
        r2 = 50.5 + 2.25 * ((d * 3) % 5)
        rows.append(_order(k, 1, r1, date)); k += 1
        rows.append(_order(k, 2, r2, date)); k += 1
        daily[d] = r1 + r2
    # one undated order: must sit nowhere on the axis
    rows.append(_order(k, 1, 999.0, None))
    _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)

    got = {
        r.dow: r
        for r in REGISTRY["seasonal_decompose_report"].fn(spark, str(tmp_path)).collect()
    }

    per_dow: dict[int, list[float]] = {}
    rev_dow: dict[int, list[float]] = {}
    for d, rev in daily.items():
        wnd = [daily[x] for x in range(d - 3, d + 4) if x in daily]
        if len(wnd) != 7:
            continue  # gap-adjacent day: no full centered week
        det7 = 7 * rev - sum(wnd)
        dow = ((base + dt.timedelta(days=d)).weekday()) + 1  # ISO 1..7
        per_dow.setdefault(dow, []).append(det7)
        rev_dow.setdefault(dow, []).append(rev)
    assert set(got) == set(per_dow)
    for dow, dets in per_dow.items():
        n = len(dets)
        r = got[dow]
        assert r.n_days == n
        assert abs(r.avg_revenue - sum(rev_dow[dow]) / n) < 1e-6
        assert abs(r.seasonal - sum(dets) / (7 * n)) < 1e-6
        var = (sum(x * x for x in dets) - sum(dets) ** 2 / n) / (49 * n)
        assert abs(r.resid_stddev - math.sqrt(max(var, 0.0))) < 1e-6


def test_seasonal_decompose_short_series_is_empty(spark, tmp_path):
    """Fewer than 7 consecutive days: no full centered week exists, so
    the report is empty rather than built on partial trends."""
    base = dt.datetime(2024, 3, 4)
    rows = [
        _order(i, 1, 100.0 + i, base + dt.timedelta(days=i)) for i in range(5)
    ]
    _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)
    assert REGISTRY["seasonal_decompose_report"].fn(spark, str(tmp_path)).collect() == []


# ---------------------------------------------------------------------------
# X183 Mann-Kendall
# ---------------------------------------------------------------------------
def _mk_ref(series: list[float]):
    n = len(series)
    s = sum(
        (0 if series[j] == series[i] else (1 if series[j] > series[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    if n < 3 or var18 <= 0:
        return s, var18 / 18.0, None, "insufficient"
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var18 / 18.0)
    verdict = (
        "no trend" if abs(z) <= 1.96 else ("increasing" if s > 0 else "decreasing")
    )
    return s, var18 / 18.0, z, verdict


def test_mann_kendall_matches_python_replay(spark, tmp_path):
    """Three nations: strictly rising (significant), noisy flat with
    ties (no trend), and a 2-month series (insufficient). Replay
    recomputes S, the tie-corrected variance, and the verdict."""
    nations = [(0, "RISING", 0), (1, "FLAT", 0), (2, "SHORT", 0)]
    _write(spark, tmp_path, "nation", nations,
           "n_nationkey LONG, n_name STRING, n_regionkey LONG")
    custs = [(10, "ca", 0, 0.0, "AUTO"), (11, "cb", 1, 0.0, "AUTO"),
             (12, "cc", 2, 0.0, "AUTO")]
    _write(spark, tmp_path, "customer", custs,
           "c_custkey LONG, c_name STRING, c_nationkey LONG, "
           "c_acctbal DOUBLE, c_mktsegment STRING")
    series = {
        10: [100.0 + 10 * i for i in range(12)],            # rising
        11: [100.0, 100.0, 90.0, 100.0, 110.0, 100.0,
             100.0, 95.0, 100.0, 100.0],                    # flat + ties
        12: [50.0, 60.0],                                   # too short
    }
    rows, k = [], 0
    for cust, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(_order(k, cust, v, dt.datetime(2023, 1 + i % 12, 5)
                               + dt.timedelta(days=365 * (i // 12))))
            k += 1
    _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)

    got = {r.n_name: r
           for r in REGISTRY["mann_kendall_trend"].fn(spark, str(tmp_path)).collect()}
    for name, cust in (("RISING", 10), ("FLAT", 11), ("SHORT", 12)):
        s, var_s, z, verdict = _mk_ref(series[cust])
        r = got[name]
        assert r.n_months == len(series[cust])
        assert r.s_stat == s
        assert abs(r.var_s - round(var_s, 4)) < 1e-9
        if z is None:
            assert r.z_stat is None
        else:
            assert abs(r.z_stat - z) < 1e-4
        assert r.trend == verdict
    assert got["RISING"].trend == "increasing"
    assert got["FLAT"].trend == "no trend"
    assert got["SHORT"].trend == "insufficient"


def test_mann_kendall_all_tied_series_is_insufficient(spark, tmp_path):
    """A constant series ties every pair: Var(S) = 0, so the verdict
    is 'insufficient' rather than a division artifact."""
    _write(spark, tmp_path, "nation", [(0, "CONST", 0)],
           "n_nationkey LONG, n_name STRING, n_regionkey LONG")
    _write(spark, tmp_path, "customer", [(10, "c", 0, 0.0, "AUTO")],
           "c_custkey LONG, c_name STRING, c_nationkey LONG, "
           "c_acctbal DOUBLE, c_mktsegment STRING")
    rows = [_order(i, 10, 77.0, dt.datetime(2023, 1 + i, 3)) for i in range(6)]
    _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)
    r, = REGISTRY["mann_kendall_trend"].fn(spark, str(tmp_path)).collect()
    assert (r.s_stat, r.z_stat, r.trend) == (0, None, "insufficient")


# ---------------------------------------------------------------------------
# X184 referential-integrity audit
# ---------------------------------------------------------------------------
def _mini_warehouse(spark, tmp_path):
    _write(spark, tmp_path, "region", [(0, "R0")],
           "r_regionkey LONG, r_name STRING")
    _write(spark, tmp_path, "nation", [(0, "N0", 0), (1, "N1", 9)],
           "n_nationkey LONG, n_name STRING, n_regionkey LONG")
    _write(spark, tmp_path, "customer",
           [(1, "c1", 0, 0.0, "AUTO"), (2, "c2", None, 0.0, "AUTO"),
            (3, "c3", 7, 0.0, "AUTO")],
           "c_custkey LONG, c_name STRING, c_nationkey LONG, "
           "c_acctbal DOUBLE, c_mktsegment STRING")
    _write(spark, tmp_path, "supplier", [(1, "s1", 0, 0.0)],
           "s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE")
    _write(spark, tmp_path, "part", [(1, "p1", "B", "T", 1, 1.0)],
           "p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, "
           "p_size INT, p_retailprice DOUBLE")
    orders = [_order(100, 1, 10.0, dt.datetime(2024, 1, 1)),
              _order(101, 99, 10.0, dt.datetime(2024, 1, 2)),   # orphan cust
              _order(102, None, 10.0, dt.datetime(2024, 1, 3))]  # NULL fk
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    li = [(100, 1, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 5)),
          (999, 1, 1, 2, 1.0, 5.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 5)),
          (998, 8, 1, 3, 1.0, 5.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 5)),
          (998, 9, None, 4, 1.0, 5.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 5))]
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
           "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
           "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
           "l_shipdate TIMESTAMP")


def test_referential_integrity_audit_planted_orphans(spark, tmp_path):
    _mini_warehouse(spark, tmp_path)
    got = {r.edge: r
           for r in REGISTRY["referential_integrity_audit"].fn(spark, str(tmp_path)).collect()}
    assert len(got) == 7
    r = got["lineitem.l_orderkey->orders.o_orderkey"]
    # orderkeys 999/998 are orphans (3 rows, 2 distinct keys); no NULLs
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (4, 0, 3, 2)
    assert abs(r.orphan_pct - 0.75) < 1e-9
    r = got["lineitem.l_partkey->part.p_partkey"]
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (4, 0, 2, 2)
    r = got["lineitem.l_suppkey->supplier.s_suppkey"]
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (4, 1, 0, 0)
    assert r.orphan_pct == 0.0
    r = got["orders.o_custkey->customer.c_custkey"]
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (3, 1, 1, 1)
    assert abs(r.orphan_pct - 0.5) < 1e-9
    r = got["customer.c_nationkey->nation.n_nationkey"]
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (3, 1, 1, 1)
    r = got["nation.n_regionkey->region.r_regionkey"]
    assert (r.n_rows, r.n_null_fk, r.n_orphan_rows, r.n_orphan_keys) == (2, 0, 1, 1)
    r = got["supplier.s_nationkey->nation.n_nationkey"]
    assert (r.n_rows, r.n_orphan_rows) == (1, 0)


# ---------------------------------------------------------------------------
# X185 range-partition plan
# ---------------------------------------------------------------------------
def _range_plan_ref(values, b=8):
    from collections import Counter

    hist = sorted(Counter(values).items())
    n = sum(c for _, c in hist)
    cum, c = [], 0
    for v, cnt in hist:
        c += cnt
        cum.append((v, cnt, c))
    cuts = []
    for k in range(1, b):
        rank = (n * k + b - 1) // b
        cuts.append(min(v for v, _, cc in cum if cc >= rank))
    out = {}
    for v, cnt, _ in cum:
        bucket = 1 + sum(1 for cut in cuts if cut < v)
        nr, nk, mn, mx = out.get(bucket, (0, 0, v, v))
        out[bucket] = (nr + cnt, nk + 1, min(mn, v), max(mx, v))
    return n, out


def test_range_partition_plan_matches_python_replay(spark, tmp_path):
    """120 distinct values plus one hot value holding ~40% of rows:
    several octile ranks land inside the hot value, so consecutive
    cuts coincide and the buckets between them are EMPTY — the replay
    pins counts, bounds, shares, and the empty-bucket gap."""
    values = [float(100 + i) for i in range(120)] + [500.0] * 80
    rows = [
        (i, 1, 1, 1, 1.0, v, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
        for i, v in enumerate(values)
    ]
    rows.append((999, 1, 1, 1, 1.0, None, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 1)))  # NULL key: no range position
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
           "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
           "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
           "l_shipdate TIMESTAMP")
    got = {r.bucket: r
           for r in REGISTRY["range_partition_plan"].fn(spark, str(tmp_path)).collect()}
    n, want = _range_plan_ref(values)
    assert set(got) == set(want)
    assert len(want) < 8  # the hot value really did empty some buckets
    for bucket, (nr, nk, mn, mx) in want.items():
        r = got[bucket]
        assert (r.n_rows, r.n_keys) == (nr, nk)
        assert (r.min_key, r.max_key) == (mn, mx)
        assert abs(r.row_share - nr / n) < 1e-6
        assert abs(r.skew_ratio - nr * 8 / n) < 1e-4
    assert abs(sum(r.row_share for r in got.values()) - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# X186 MMR
# ---------------------------------------------------------------------------
def _mmr_ref(vecs, query_ids, pool_k=10, k=5, lam=0.7):
    import numpy as np
    from decimal import Decimal

    ids = sorted(vecs)
    out = []
    for q in query_ids:
        qv = np.asarray(vecs[q])
        sims = {}
        for i in ids:
            if i == q:
                continue
            v = np.asarray(vecs[i])
            sims[i] = round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6)
        pool = sorted(sims, key=lambda i: (-sims[i], i))[:pool_k]
        pair = {}
        for a in pool:
            va = np.asarray(vecs[a])
            for bb in pool:
                if a == bb:
                    continue
                vb = np.asarray(vecs[bb])
                pair[a, bb] = round(
                    float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6
                )
        from decimal import ROUND_HALF_UP

        grain = Decimal("0.000001")
        sel = []
        for rank in range(1, min(k, len(pool)) + 1):
            best = None
            for cand in pool:
                if cand in sel:
                    continue
                maxsim = max((pair[cand, s] for s in sel), default=0.0)
                # the engine ranks by the HALF_UP-rounded decimal score
                score = (
                    Decimal("0.7") * Decimal(f"{sims[cand]:.6f}")
                    - Decimal("0.3") * Decimal(f"{maxsim:.6f}")
                ).quantize(grain, rounding=ROUND_HALF_UP)
                if best is None or (-score, cand) < (-best[1], best[0]):
                    best = (cand, score)
            sel.append(best[0])
            out.append((q, rank, best[0], sims[best[0]], float(best[1])))
    return out


def _toy_embeddings(spark, tmp_path, n=120, dim=8):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in list(range(20)) + list(range(100, 105)):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], int(i % 3)))
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    # the parquet round-trips through FLOAT: replay from what was stored
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{tmp_path}/embeddings.parquet")
    return {
        int(i): [float(x) for x in e]
        for i, e in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    }


def test_mmr_matches_numpy_replay(spark, tmp_path):
    vecs = _toy_embeddings(spark, tmp_path)
    got = sorted(
        (r.query_id, r.mmr_rank, r.neighbor_id, r.relevance, r.mmr_score)
        for r in REGISTRY["mmr_diversified_topk"].fn(spark, str(tmp_path)).collect()
    )
    want = sorted(_mmr_ref(vecs, list(range(100, 105))))
    assert len(got) == len(want) == 25
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) < 1e-9
        assert abs(g[4] - w[4]) < 1e-9


def test_mmr_rank1_is_top_relevance_and_ranks_distinct(spark, tmp_path):
    vecs = _toy_embeddings(spark, tmp_path)
    rows = REGISTRY["mmr_diversified_topk"].fn(spark, str(tmp_path)).collect()
    byq = {}
    for r in rows:
        byq.setdefault(r.query_id, []).append(r)
    for q, rs in byq.items():
        assert sorted(x.mmr_rank for x in rs) == [1, 2, 3, 4, 5]
        assert len({x.neighbor_id for x in rs}) == 5
        top = max(rs, key=lambda x: (x.relevance, -x.neighbor_id))
        first = next(x for x in rs if x.mmr_rank == 1)
        assert first.relevance == top.relevance


def test_mmr_small_pool_emits_fewer_ranks(spark, tmp_path):
    """Three candidates besides the query: the greedy loop drains the
    pool and stops — 3 rows, ranks 1..3, no raise."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in [1, 2, 3, 100]:
        v = rng.normal(size=4)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], 0))
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    rs = REGISTRY["mmr_diversified_topk"].fn(spark, str(tmp_path)).collect()
    assert sorted(r.mmr_rank for r in rs) == [1, 2, 3]
    assert {r.query_id for r in rs} == {100}
