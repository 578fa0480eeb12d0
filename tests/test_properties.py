"""Property-based checks (SURVEY.md §5 item 4): invariants that must
hold for arbitrary inputs, via hypothesis over small generated frames.

Each property runs the full Spark plan per example, so example counts
are kept low — these are semantic invariants, not fuzzing volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
    dedup_keep_best,
    remove_dupes_except_all,
)
from employee_data_management_system_data_engineering_solution_spark.operators.scd import (
    keyed_upsert,
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # value
        st.sampled_from(["a", "b", "c"]),  # payload
    ),
    min_size=1,
    max_size=12,
)


@given(rows=rows_strategy)
@_SETTINGS
def test_dedup_keep_best_key_uniqueness_and_winner(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long, p string")
    out = dedup_keep_best(
        df, ["k"], [F.col("v").desc(), F.col("p").asc()]
    ).collect()
    # one row per key
    keys = [r.k for r in out]
    assert len(keys) == len(set(keys)) == len({k for k, _, _ in rows})
    # the winner is the max under the total order
    want = {}
    for k, v, p in rows:
        cur = want.get(k)
        if cur is None or (-v, p) < (-cur[0], cur[1]):
            want[k] = (v, p)
    assert {r.k: (r.v, r.p) for r in out} == want


@given(rows=rows_strategy)
@_SETTINGS
def test_except_all_equals_keep_best_on_total_order(spark, rows):
    # with a total order the reference's W1+O3 (exceptAll) flow and the
    # window-filter dedup agree as SETS of surviving rows... except for
    # exact duplicate rows, where exceptAll keeps one copy per key by
    # multiset arithmetic. Compare against keep-best on the deduped bag.
    df = spark.createDataFrame(rows, "k long, v long, p string").dropDuplicates()
    order = [F.col("v").desc(), F.col("p").asc()]
    a = sorted(map(tuple, remove_dupes_except_all(df, ["k"], order).collect()))
    b = sorted(map(tuple, dedup_keep_best(df, ["k"], order).collect()))
    assert a == b


@given(
    dim=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9)), max_size=8, unique_by=lambda t: t[0]),
    stg=st.lists(st.tuples(st.integers(0, 4), st.integers(10, 19)), max_size=8, unique_by=lambda t: t[0]),
)
@_SETTINGS
def test_keyed_upsert_key_set_is_union(spark, dim, stg):
    dim_df = spark.createDataFrame(dim, "k long, v long") if dim else spark.createDataFrame([], "k long, v long")
    stg_df = spark.createDataFrame(stg, "k long, v long") if stg else spark.createDataFrame([], "k long, v long")
    out = {r.k: r.v for r in keyed_upsert(dim_df, stg_df, keys=["k"]).collect()}
    dim_m, stg_m = dict(dim), dict(stg)
    # key set is the union; staging wins on collisions
    assert set(out) == set(dim_m) | set(stg_m)
    for k, v in out.items():
        assert v == (stg_m[k] if k in stg_m else dim_m[k])


@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    bucket_width=st.integers(min_value=1, max_value=16),
)
@_SETTINGS
def test_prefix_sum_equals_serial_fold_property(spark, values, bucket_width):
    """prefix_sum over arbitrary ints and bucket widths == the serial
    cumulative fold, independent of bucketing."""
    from employee_data_management_system_data_engineering_solution_spark.operators.prefix import (
        prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "k long, v long"
    )
    got = {
        r.k: r.running_total
        for r in prefix_sum(df, "k", "v", bucket_width=bucket_width).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(values):
        acc += v
        want[i] = acc
    assert got == want


# --------------------------------------------------------------------------
# round-6 operators
# --------------------------------------------------------------------------
_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=6
)


@given(texts=_texts)
@_SETTINGS
def test_winnow_fingerprints_are_gram_hash_subset(spark, texts):
    """Every winnowing fingerprint is the hash of SOME gram of the doc
    (window-min selects, never invents), and identical docs always get
    identical fingerprint sets."""
    from employee_data_management_system_data_engineering_solution_spark.operators.dedup import (
        winnow_fingerprint_rows,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(1000, texts[0])],
        "doc_id bigint, text string",
    )
    rows = winnow_fingerprint_rows(df, "doc_id", "text", n=4, window=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc.get(0, set()) == by_doc.get(1000, set())


@given(texts=_texts)
@_SETTINGS
def test_simhash_arith_stable_and_bounded(spark, texts):
    from employee_data_management_system_data_engineering_solution_spark.operators.dedup import (
        simhash_arith,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    a = {r.doc_id: r.simhash for r in simhash_arith(df, "doc_id", "text").collect()}
    b = {r.doc_id: r.simhash for r in simhash_arith(df, "doc_id", "text").collect()}
    assert a == b
    assert all(0 <= s < (1 << 48) for s in a.values())


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=14,
    )
)
@_SETTINGS
def test_pagerank_mass_bounded_and_deterministic(spark, edges):
    """Symmetrized graph: fixed-point mass never exceeds the scale and
    floor losses keep it within 5%; two runs are bit-equal."""
    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        pagerank_fixed_point,
    )

    sym = list({e for ab in edges for e in (ab, (ab[1], ab[0]))})
    df = spark.createDataFrame(sym, "src bigint, dst bigint")
    pr = {r.node: r.rank_fp for r in pagerank_fixed_point(df, iters=2).collect()}
    scale = 10**12
    assert 0 < sum(pr.values()) <= scale
    assert sum(pr.values()) > scale * 0.90
    again = {r.node: r.rank_fp for r in pagerank_fixed_point(df, iters=2).collect()}
    assert pr == again


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True),
    probes=st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
)
@_SETTINGS
def test_bloom_never_false_negative_property(spark, keys, probes):
    from employee_data_management_system_data_engineering_solution_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    kdf = spark.createDataFrame([(k,) for k in keys], "k bigint")
    words = bloom_build(kdf, "k", num_bits=1 << 10)
    pdf = spark.createDataFrame([(p,) for p in set(probes) | set(keys)], "k bigint")
    hits = {
        r.k
        for r in pdf.filter(
            bloom_might_contain(F.col("k"), words, num_bits=1 << 10)
        ).collect()
    }
    assert set(keys) <= hits  # no false negatives, ever


@given(
    obs=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 1000)),
        min_size=2,
        max_size=8,
    ).filter(lambda o: len({t for t, _ in o}) == len(o)),
    grid_ts=st.lists(st.integers(0, 100), min_size=1, max_size=6, unique=True),
)
@_SETTINGS
def test_resample_interpolate_between_neighbor_values(spark, obs, grid_ts):
    """Interior grid values lie within [min, max] of the two
    surrounding observations; boundary values equal the clamped
    neighbor."""
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        resample_interpolate,
    )

    df = spark.createDataFrame(
        [(1, t, i, float(v)) for i, (t, v) in enumerate(obs)],
        "k bigint, t bigint, o bigint, v double",
    )
    grid = spark.createDataFrame([(1, t) for t in grid_ts], "k bigint, t bigint")
    out = {r.t: r.v_interp for r in
           resample_interpolate(df, grid, "k", "t", "o", "v").collect()}
    ts = sorted(t for t, _ in obs)
    vals = dict(obs)
    for g, v in out.items():
        prevs = [t for t in ts if t <= g]
        nexts = [t for t in ts if t >= g]
        if not prevs:
            assert v == round(vals[nexts[0]], 4)
        elif not nexts:
            assert v == round(vals[prevs[-1]], 4)
        else:
            lo = min(vals[prevs[-1]], vals[nexts[0]])
            hi = max(vals[prevs[-1]], vals[nexts[0]])
            assert lo - 1e-6 <= v <= hi + 1e-6


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=2, max_size=6, unique=True
    ),
    data=st.data(),
)
@_SETTINGS
def test_deletion_neighborhood_join_complete_for_random_edits(spark, words, data):
    """Completeness: for any base word and any single random edit
    (insert/delete/substitute), the deletion-blocking join finds the
    pair — the SymSpell recall guarantee, fuzzed instead of assumed."""
    from employee_data_management_system_data_engineering_solution_spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    base = words[0]
    op = data.draw(st.sampled_from(["ins", "del", "sub"]))
    # insert may land AFTER the last char (append); del/sub need a char
    max_pos = len(base) if op == "ins" else len(base) - 1
    pos = data.draw(st.integers(min_value=0, max_value=max_pos))
    ch = data.draw(st.sampled_from("xyz"))  # disjoint alphabet: a REAL edit
    if op == "ins":
        edited = base[:pos] + ch + base[pos:]
    elif op == "del":
        edited = base[:pos] + base[pos + 1 :]
    else:
        edited = base[:pos] + ch + base[pos:][1:]
    rows = [(0, base), (1, edited)] + [(i + 2, w) for i, w in enumerate(words[1:])]
    df = spark.createDataFrame(rows, "id LONG, nm STRING")
    got = {(r.id_a, r.id_b) for r in deletion_neighborhood_pairs(df, "id", "nm").collect()}
    if edited != base and edited:
        assert (0, 1) in got
    # soundness rides the exact levenshtein filter: every reported pair
    # really is within distance 1
    names = dict(rows)
    import itertools

    def ed(a, b):
        if len(a) > len(b):
            a, b = b, a
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j]
            for i, ca in enumerate(a, 1):
                cur.append(min(prev[i] + 1, cur[-1] + 1, prev[i - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for ia, ib in got:
        assert ed(names[ia], names[ib]) <= 1
    # and no distance<=1 pair is missed across the whole frame
    for (ia, a), (ib, b) in itertools.combinations(rows, 2):
        if ed(a, b) <= 1 and a and b:
            assert (min(ia, ib), max(ia, ib)) in got, (a, b)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=20
    )
)
@_SETTINGS
def test_morton_key_orders_like_python_reference(spark, pts):
    from employee_data_management_system_data_engineering_solution_spark.operators.layout import (
        morton_key,
        morton_key_py,
    )

    df = spark.createDataFrame(pts, "x INT, y INT")
    got = [
        (r.x, r.y, r.z)
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y"), 10).alias("z")).collect()
    ]
    for x, y, z in got:
        assert z == morton_key_py(x, y, 10)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=16
    )
)
@_SETTINGS
def test_triangle_counts_match_bruteforce_enumeration(spark, edges):
    """Degree-ordered triangle counting fuzzed against brute-force
    enumeration on random <=8-vertex multigraphs (self-loops and
    duplicate/reversed edges must be ignored, per-node counts exact)."""
    import itertools

    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = {v for e in und for v in e}
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(verts), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 200),  # doc_id
            st.sampled_from(["en", "de"]),
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
@_SETTINGS
def test_stratum_cap_sampling_is_capped_and_deterministic(spark, tmp_path, rows):
    """Per-stratum cap through the PRODUCTION sampler (its own salt and
    hash expression, not a test-local reimplementation): never more
    than 25 rows per (lang, source), strata smaller than the cap keep
    everything, and the pick is identical across reruns (pure function
    of the key)."""
    from collections import Counter

    import employee_data_management_system_data_engineering_solution_spark.plans.curation as cur

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(d, f"text {d}", lang, src, 6) for d, lang, src in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    def run():
        return {
            (r.lang, r.source, r.doc_id, r.samp_rank)
            for r in cur.balanced_strata_sample(spark, sf_dir).collect()
        }

    got = run()
    sizes = Counter((lang, src) for _, lang, src in rows)
    kept = Counter((lang, src) for lang, src, _, _ in got)
    for stratum, n in sizes.items():
        assert kept[stratum] == min(n, 25), (stratum, n)
    assert all(1 <= rank <= 25 for _, _, _, rank in got)
    assert got == run()  # deterministic under rerun


_snapshot_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # row key
        st.sampled_from(["g1", "g2", "g3"]),     # group
        # NULL values included on purpose: the all-NULL-group edge is
        # where the naive NULL→0 coalescing diverges from a recompute
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)


@given(old_rows=_snapshot_strategy, new_rows=_snapshot_strategy)
@_SETTINGS
def test_incremental_refresh_equals_recompute_for_any_delta(spark, old_rows, new_rows):
    """The maintenance algebra against arbitrary snapshots: whatever
    mix of inserts/deletes/in-place updates/group-moving updates the
    random old→new transition encodes, base_agg + Δ must equal the
    from-scratch recompute of the new snapshot (including groups that
    empty out or newly appear)."""
    from collections import defaultdict

    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        agg_delta_contributions,
        apply_agg_delta,
        snapshot_diff,
    )

    schema = "k LONG, g STRING, v LONG"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    base = old.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.count("v").alias("nv"),
    )
    delta = agg_delta_contributions(
        snapshot_diff(old, new, ["k"], keep_old=True), "g", "v"
    )
    refreshed = {
        r.g: (r.n, r.s)
        for r in apply_agg_delta(
            base,
            delta,
            ["g"],
            [("n", "d_n"), ("s", "d_sum"), ("nv", "d_nv")],
            count_col="n",
            null_when_zero=[("s", "nv")],
        ).collect()
    }
    want = defaultdict(lambda: [0, None])
    for _, g, v in new_rows:
        want[g][0] += 1
        if v is not None:
            want[g][1] = v if want[g][1] is None else want[g][1] + v
    assert refreshed == {g: (n, s) for g, (n, s) in want.items()}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=12,
    ),
    rounds=st.integers(min_value=1, max_value=3),
)
@_SETTINGS
def test_label_propagation_matches_python_sync_reference(spark, edges, rounds):
    """Fixed-round synchronous LPA vs a pure-Python replay of the same
    update rule (neighbor votes + one self-vote, max count, min-label
    tie-break) on arbitrary multigraphs — self-loops and duplicate
    edges must be normalized identically by both."""
    from collections import Counter, defaultdict

    from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.node: r.label for r in label_propagation(df, rounds=rounds).collect()}

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    nodes = set(adj)
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = {}
        for n in nodes:
            votes = Counter(labels[m] for m in adj[n])
            votes[labels[n]] += 1  # self-vote
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    assert got == labels


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        ),
        min_size=2,
        max_size=25,
    )
)
@_SETTINGS
def test_winsorize_matches_python_reference(spark, rows):
    """Per-key p10/p90 clipping vs a pure-Python replay of the same
    linear-interpolation percentile + clamp, NULLs passing through."""
    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        winsorize,
    )

    df = spark.createDataFrame(
        [(i, k, float(v) if v is not None else None) for i, (k, v) in enumerate(rows)],
        "i LONG, k STRING, v DOUBLE",
    )
    got = {
        r.i: r.v_wins for r in winsorize(df, "k", "v", lo=0.1, hi=0.9).collect()
    }

    def pctl(xs, p):  # linear interpolation, the percentile() contract
        xs = sorted(xs)
        if len(xs) == 1:
            return xs[0]
        pos = p * (len(xs) - 1)
        lo_i, frac = int(pos), pos - int(pos)
        return xs[lo_i] if frac == 0 else xs[lo_i] + (xs[lo_i + 1] - xs[lo_i]) * frac

    by_key = {}
    for i, (k, v) in enumerate(rows):
        by_key.setdefault(k, []).append(v)
    want = {}
    for i, (k, v) in enumerate(rows):
        vals = [x for x in by_key[k] if x is not None]
        if v is None or not vals:
            want[i] = None
        else:
            lo_c, hi_c = pctl(vals, 0.1), pctl(vals, 0.9)
            want[i] = min(max(float(v), lo_c), hi_c)
    for i in want:
        if want[i] is None:
            assert got.get(i) is None, i
        else:
            assert got[i] is not None and abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),        # user
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=7200),     # offset seconds
            st.integers(min_value=0, max_value=200),      # value
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_multi_touch_attribution_matches_python_reference(spark, events):
    """Equal-split credit vs a brute-force Python replay: per purchase,
    every same-user view in [t-1h, t] earns value/n; user totals and
    distinct assisting-view counts must agree."""
    import datetime as dt
    from collections import defaultdict

    import employee_data_management_system_data_engineering_solution_spark.plans.curation  # noqa: F401
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, t, base + dt.timedelta(seconds=off), float(v), "{}")
        for i, (u, t, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE, props STRING"
    )
    import tempfile, os, shutil, glob

    work = tempfile.mkdtemp(prefix="eds_attr_prop_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(work, "__w"))
        part = glob.glob(os.path.join(work, "__w", "part-*.parquet"))[0]
        shutil.move(part, os.path.join(work, "events.parquet"))
        got = {
            r.user_id: (r.n_assisting_views, r.attributed_revenue)
            for r in REGISTRY["multi_touch_attribution"].fn(spark, work).collect()
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    purchases = [(i, u, off, v) for i, (u, t, off, v) in enumerate(events) if t == "purchase"]
    views = [(i, u, off) for i, (u, t, off, _) in enumerate(events) if t == "view"]
    credit = defaultdict(float)
    assisting = defaultdict(set)
    for pi, pu, poff, pv in purchases:
        assists = [vi for vi, vu, voff in views if vu == pu and poff - 3600 <= voff <= poff]
        for vi in assists:
            credit[pu] += pv / len(assists)
            assisting[pu].add(vi)
    want = {u: (len(assisting[u]), round(credit[u], 2)) for u in credit}
    assert got == want


# ---------------------------------------------------------------------------
# Round-8 operators vs pure-Python references
# ---------------------------------------------------------------------------
_cdc_log_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),          # key
        st.sampled_from(["upsert", "delete"]),          # op
        st.integers(min_value=0, max_value=99),         # payload value
    ),
    min_size=0,
    max_size=12,
)


@given(
    base_rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=99)),
        min_size=0, max_size=6, unique_by=lambda r: r[0],
    ),
    log_rows=_cdc_log_strategy,
)
@_SETTINGS
def test_cdc_replay_matches_python_fold(spark, base_rows, log_rows):
    """cdc_replay against the obvious sequential fold: apply log
    entries in seq order to a dict — whatever mix of updates,
    tombstones, resurrections, and new keys hypothesis generates."""
    from employee_data_management_system_data_engineering_solution_spark.operators.cdc import (
        cdc_replay,
    )

    base = spark.createDataFrame(base_rows or [], "k INT, v INT")
    log = spark.createDataFrame(
        [(i + 1, k, op, v) for i, (k, op, v) in enumerate(log_rows)],
        "seq INT, k INT, op STRING, v INT",
    )
    got = {r.k: r.v for r in cdc_replay(base, log, ["k"]).collect()}

    state = dict(base_rows)
    for k, op, v in log_rows:  # already in seq order
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


_interval_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=5000),  # start offset (s)
        st.integers(min_value=0, max_value=3000),  # length (s)
    ),
    min_size=0,
    max_size=8,
)


@given(lrows=_interval_strategy, rrows=_interval_strategy)
@_SETTINGS
def test_interval_overlap_join_matches_quadratic_reference(spark, lrows, rrows):
    """The bucketed overlap join against the O(n·m) definition, for
    arbitrary interval sets — bucket spans, the anchor-dedup rule, and
    closed-endpoint semantics all under test, with interval lengths
    from 0 (degenerate point intervals) to multiples of the bucket."""
    import datetime as dt

    from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def mk(rows, idc, sc, ec):
        data = [
            (i, k, t0 + dt.timedelta(seconds=s), t0 + dt.timedelta(seconds=s + ln))
            for i, (k, s, ln) in enumerate(rows)
        ]
        return (
            spark.createDataFrame(data, f"{idc} INT, k INT, {sc} TIMESTAMP, {ec} TIMESTAMP"),
            data,
        )

    left, ldata = mk(lrows, "lid", "ls", "le")
    right, rdata = mk(rrows, "rid", "rs", "re")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "k", "ls", "le", "rs", "re", bucket_seconds=600
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, lk, ls, le in ldata
        for ri, rk, rs, re in rdata
        if lk == rk and ls <= re and rs <= le
    )
    assert got == want


@given(
    items=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    denom=st.sampled_from([3, 5, 10]),
)
@_SETTINGS
def test_heavy_hitters_exact_matches_counter(spark, items, denom):
    """Two-pass MG heavy hitters against collections.Counter for
    arbitrary streams and support thresholds, with capacity pinned just
    above the guarantee line so shrink pruning actually fires."""
    from collections import Counter

    from employee_data_management_system_data_engineering_solution_spark.operators.freq import (
        heavy_hitters_exact,
    )

    df = spark.createDataFrame([(f"w{x}",) for x in items], "item STRING").repartition(4)
    got = {
        (r.item, r.n)
        for r in heavy_hitters_exact(df, "item", denom=denom, capacity=denom).collect()
    }
    want = {
        (f"w{x}", c) for x, c in Counter(items).items() if c * denom > len(items)
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),   # key (deduped below)
            st.integers(min_value=-2, max_value=60),   # weight, incl. <=0
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=8),
    parts=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_priority_sample_order_invariant_and_matches_reference(spark, rows, k, parts):
    """The weighted sample is a pure function of (keys, weights, seed):
    invariant under row order AND partitioning, equal to the
    pure-Python md5 priority replay, never containing a non-positive
    weight."""
    import hashlib

    from employee_data_management_system_data_engineering_solution_spark.operators.cleaning import (
        priority_sample,
    )

    df = spark.createDataFrame(rows, "id LONG, wt LONG").repartition(parts)
    rev = spark.createDataFrame(list(reversed(rows)), "id LONG, wt LONG").coalesce(1)
    a = sorted(
        (r.sample_rank, r.id, r.priority_key)
        for r in priority_sample(df, ["id"], "wt", k=k, seed="p-v1").collect()
    )
    b = sorted(
        (r.sample_rank, r.id, r.priority_key)
        for r in priority_sample(rev, ["id"], "wt", k=k, seed="p-v1").collect()
    )
    assert a == b

    def prio(i, w):
        h = int(hashlib.md5(f"{i}:p-v1".encode()).hexdigest()[:15], 16)
        return h // w

    eligible = sorted((prio(i, w), i) for i, w in rows if w > 0)
    want = [(rk + 1, i, p) for rk, (p, i) in enumerate(eligible[:k])]
    assert a == sorted(want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),                  # bucket
            st.sampled_from([True, False, None]),                   # label
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_woe_iv_matches_python_for_random_labelings(spark, rows):
    import math

    from employee_data_management_system_data_engineering_solution_spark.operators.quality import woe_iv

    df = spark.createDataFrame(rows, "bucket INT, is_event BOOLEAN")
    got = {r.bucket: r for r in woe_iv(df).collect()}
    ev, ne = {}, {}
    for b, lbl in rows:
        ev.setdefault(b, 0)
        ne.setdefault(b, 0)
        if lbl is True:
            ev[b] += 1
        elif lbl is False:
            ne[b] += 1
    E, NE, B = sum(ev.values()), sum(ne.values()), len(ev)
    assert set(got) == set(ev)
    for b in ev:
        pe, pne = (ev[b] + 1) / (E + B), (ne[b] + 1) / (NE + B)
        w = math.log(pe / pne)
        r = got[b]
        assert (r.n_events, r.n_nonevents) == (ev[b], ne[b])
        assert abs(r.share_event - round(pe, 6)) < 1e-12
        assert abs(r.woe - round(w, 6)) < 1e-9
        assert abs(r.iv_term - round((pe - pne) * w, 6)) < 1e-9


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),   # determinant
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),        # dependent
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_fd_violations_matches_python_reference(spark, rows):
    from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
        fd_violations,
    )

    df = spark.createDataFrame(rows, "k INT, v STRING")
    r = fd_violations(df, ["k"], "v", "k->v").collect()[0]
    vals: dict = {}
    for k, v in rows:
        vals.setdefault(k, set()).add(v)
    nv = {k: len(s - {None}) + (1 if None in s else 0) for k, s in vals.items()}
    n_viol = sum(1 for n in nv.values() if n > 1)
    assert r.n_keys == len(nv)
    assert r.n_violating_keys == n_viol
    assert r.max_distinct_rhs == max(nv.values())
    assert r.violation_rate == round(n_viol / len(nv), 6)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),                        # group
            st.integers(min_value=1, max_value=400),            # cents value
            st.integers(min_value=0, max_value=9),              # weight
        ),
        min_size=1,
        max_size=24,
    )
)
@_SETTINGS
def test_weighted_median_query_matches_python(spark, tmp_path, rows):
    """The registered weighted-median plan equals the pure-Python lower
    weighted median for arbitrary weighted multisets (duplicated
    values, zero weights, single-row groups)."""
    import uuid

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    data = [
        (g, cents / 100.0, w, i)
        for i, (g, cents, w) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "l_returnflag STRING, l_extendedprice DOUBLE, l_quantity LONG, l_orderkey LONG"
    )
    sf = str(tmp_path / f"wm{uuid.uuid4().hex[:8]}")
    df.write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: r
        for r in REGISTRY["weighted_median_by_flag"].fn(spark, sf).collect()
    }
    ref: dict = {}
    for g, v, w, _ in data:
        if w > 0:
            ref.setdefault(g, []).append((round(v, 2), w))
    for g, pairs in ref.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        r = got[g]
        assert r.total_weight == tot
        assert abs(r.weighted_median - med) < 1e-9, g
    assert set(got) == set(ref)


@given(
    baskets=st.lists(
        st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_covisitation_matches_bruteforce_pairs(spark, tmp_path, baskets):
    """Pair counts equal brute-force combinations over DISTINCT parts
    per basket; lift matches the closed form; the report is exactly
    the >=2-count pairs in (n_co DESC, a, b) order (all fit in 50)."""
    import itertools as it
    import uuid
    from collections import Counter

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows, ln = [], 0
    for ok, parts in enumerate(baskets, start=1):
        for p in parts:
            ln += 1
            rows.append((ok, p, ln))
    df = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG, l_linenumber LONG")
    sf = str(tmp_path / f"cv{uuid.uuid4().hex[:8]}")
    df.write.parquet(f"{sf}/lineitem.parquet")
    got = [
        (r.part_a, r.part_b, r.n_co, r.n_a, r.n_b, r.lift)
        for r in REGISTRY["part_covisitation_topk"].fn(spark, sf).collect()
    ]
    co: Counter = Counter()
    support: Counter = Counter()
    for parts in baskets:
        ps = sorted(set(parts))
        support.update(ps)
        co.update(it.combinations(ps, 2))
    n_orders = len(baskets)
    want = sorted(
        ((a, b, c) for (a, b), c in co.items() if c >= 2),
        key=lambda t: (-t[2], t[0], t[1]),
    )
    assert [(a, b, c) for a, b, c, *_ in got] == want
    for a, b, c, na, nb, lift in got:
        assert (na, nb) == (support[a], support[b])
        assert abs(lift - round(c * n_orders / (na * nb), 6)) < 1e-12


@given(
    vals=st.lists(st.integers(min_value=1, max_value=50000), min_size=2, max_size=25)
)
@_SETTINGS
def test_cusum_statistic_matches_python_closed_form(spark, tmp_path, vals):
    """For an arbitrary daily series: the reported cusum equals the
    Python S_t = C_t − t·mean at every reported day, and the top-5
    selection is the exact argsort of |T_t| (tie-broken by day)."""
    import datetime as dt
    import uuid

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows = [
        (i + 1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), v / 100.0, "X")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE, o_orderpriority STRING"
    )
    sf = str(tmp_path / f"cs{uuid.uuid4().hex[:8]}")
    df.write.parquet(f"{sf}/orders.parquet")
    got = REGISTRY["revenue_cusum_shift"].fn(spark, sf).collect()
    xs = [round(v / 100.0, 2) for v in vals]
    n = len(xs)
    tot = sum(int(round(x * 100)) for x in xs)  # exact cents
    cum, tt = 0, {}
    for t, x in enumerate(xs, start=1):
        cum += int(round(x * 100))
        tt[t] = n * cum - t * tot  # exact cents-scaled T_t
    order = sorted(tt, key=lambda t: (-abs(tt[t]), t))[:5]
    want_days = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=t - 1)).isoformat() for t in order
    ]
    assert [r.day for r in got] == want_days
    for r, t in zip(got, order):
        # compare against the UNROUNDED exact value within half a
        # 4-dp rounding unit: at an exact decimal tie (hypothesis
        # found T/(100n) = -0.00375) Spark rounds the shortest-repr
        # decimal HALF_UP while CPython rounds the exact double, so
        # the two round() results legitimately differ by one unit in
        # the last place — both are correct roundings of the same
        # statistic, which is what this pin is for
        assert abs(r.cusum - tt[t] / 100.0 / n) <= 5.01e-5


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=20
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["x", "y"])),
        min_size=0,
        max_size=10,
    ),
    salts=st.integers(min_value=1, max_value=5),
    how=st.sampled_from(["inner", "left"]),
)
@_SETTINGS
def test_salted_join_equals_plain_join(spark, lrows, rrows, salts, how):
    """The salted join is result-identical to the plain join for
    arbitrary frames, salt counts, and inner/left semantics —
    duplicates on BOTH sides included (multiset equality)."""
    from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
        salted_join,
    )

    l = spark.createDataFrame(lrows, "k INT, v INT") if lrows else spark.createDataFrame([], "k INT, v INT")
    r = spark.createDataFrame(rrows, "k INT, p STRING") if rrows else spark.createDataFrame([], "k INT, p STRING")
    got = sorted(
        map(tuple, salted_join(l, r, ["k"], salts=salts, how=how).collect())
    )
    want = sorted(map(tuple, l.join(r, ["k"], how).collect()))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # quantized value
            st.sampled_from([True, False, None]),  # sample flag (+ NULLs)
        ),
        min_size=2,
        max_size=24,
    )
)
@_SETTINGS
def test_mann_whitney_matches_python_for_random_samples(spark, rows):
    """Tied-rank U and tie-corrected z equal a pure-Python reference
    for arbitrary heavy-tie samples; NULL-flag rows never count."""
    import math
    from collections import Counter

    from employee_data_management_system_data_engineering_solution_spark.operators.stats import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(rows, "v LONG, in_a BOOLEAN")
    got = mann_whitney_u(df, "v", F.col("in_a")).collect()[0]
    xs = [v for v, f in rows if f is True]
    ys = [v for v, f in rows if f is False]
    assert (got.n_a, got.n_b) == (len(xs), len(ys))
    if not xs or not ys:
        assert got.z_stat is None
        return
    allv = sorted(xs + ys)
    ranks, i = {}, 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + 1 + j) / 2
        i = j
    na, nb, n = len(xs), len(ys), len(xs) + len(ys)
    u = sum(ranks[x] for x in xs) - na * (na + 1) / 2
    assert got.u_a == u
    ties = sum(t**3 - t for t in Counter(allv).values())
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    if var <= 0:
        assert got.z_stat is None
    else:
        z = (u - na * nb / 2) / math.sqrt(var)
        assert got.z_stat is not None
        assert abs(got.z_stat - z) < 5.1e-7


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["p", "q", "r"]),
            st.sampled_from(["x", "y"]),
        ),
        min_size=2,
        max_size=30,
    )
)
@_SETTINGS
def test_chi2_independence_matches_python_for_random_tables(spark, rows):
    """The 6-dp-rounded-cell chi² and Cramér's V equal the pinned
    pure-Python form for arbitrary contingency tables."""
    import math
    from collections import Counter

    from employee_data_management_system_data_engineering_solution_spark.operators.stats import (
        chi2_independence,
    )

    df = spark.createDataFrame(rows, "a STRING, b STRING")
    got = chi2_independence(df, "a", "b").collect()[0]
    cnt = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = (
        sum(
            round(o * o * n / (ra[a] * cb[b]), 6)
            for (a, b), o in cnt.items()
        )
        - n
    )
    assert got.n == n
    assert (got.levels_a, got.levels_b) == (len(ra), len(cb))
    assert got.dof == (len(ra) - 1) * (len(cb) - 1)
    assert abs(got.chi2 - chi2) < 1e-9
    mindim = min(len(ra), len(cb)) - 1
    if mindim == 0:
        assert got.cramers_v is None
    else:
        # max(…, 0): the 6-dp-rounded cell sum can land a hair below N
        # on a near-independent table — the operator clamps before the
        # sqrt (r12 ADVICE fix), so the replay must too
        v = round(math.sqrt(max(got.chi2, 0.0) / (n * mindim)), 6)
        assert got.cramers_v == v
        assert 0.0 <= got.cramers_v <= 1.0 + 1e-9


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # score tenths
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_decile_lift_invariants_for_random_scores(spark, rows):
    """Bucket totals partition the population; cumulative capture ends
    at 1; lift is the exact rational (n_pos·N)/(n·P); tied-score
    groups never split across buckets."""
    from collections import Counter, defaultdict

    from employee_data_management_system_data_engineering_solution_spark.operators.modeleval import (
        decile_lift,
    )

    data = [(v / 10.0, y) for v, y in rows]
    df = spark.createDataFrame(data, "score DOUBLE, label INT")
    out = decile_lift(df, "score", "label", 10).collect()
    n_total = len(rows)
    p_total = sum(y for _, y in rows)
    assert sum(r.n for r in out) == n_total
    assert sum(r.n_pos for r in out) == p_total
    if p_total:
        assert out[-1].cum_capture == 1.0
        for r in out:
            assert r.lift == round((r.n_pos * n_total) / (r.n * p_total), 6)
    # score-group convention: every bucket's row count is a sum of
    # whole tied-score groups
    sizes = Counter(s for s, _ in data)
    bucket_of = {}
    below = 0
    for s in sorted(sizes, reverse=True):
        bucket_of[s] = 10 * below // n_total
        below += sizes[s]
    want = defaultdict(int)
    for s, k in sizes.items():
        want[bucket_of[s]] += k
    assert {r.bucket: r.n for r in out} == dict(want)
