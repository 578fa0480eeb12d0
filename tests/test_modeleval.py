"""Model-evaluation operators vs pure-Python references.

binary_auc is checked against the O(n²) pair-counting definition of
AUC (ties worth ½), which the Mann-Whitney average-rank identity must
equal exactly; calibration_bins against a dict-based replay including
the rounded-before-gap ECE chain.
"""

from __future__ import annotations

import math

import pytest

from employee_data_management_system_data_engineering_solution_spark.operators.modeleval import (
    binary_auc,
    calibration_bins,
)


def _pair_auc(rows):
    """Brute-force AUC: P(score₊ > score₋) + ½·P(tie)."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for q in neg:
            num += 1.0 if p > q else (0.5 if p == q else 0.0)
    return num / (len(pos) * len(neg))


@pytest.fixture(scope="module")
def scored(spark):
    # deterministic scores with deliberate cross-class TIES (0.5 is
    # both classes) and a tied pure-positive group (0.9, 0.9)
    rows = [
        (0.1, 0), (0.2, 0), (0.5, 0), (0.5, 1), (0.5, 1),
        (0.7, 0), (0.7, 1), (0.9, 1), (0.9, 1), (0.3, 0), (0.8, 1),
    ]
    df = spark.createDataFrame(
        [(s, y, s >= 0.5) for s, y in rows], "score DOUBLE, label INT, pred BOOLEAN"
    )
    return rows, df


def test_binary_auc_equals_pair_counting(scored):
    rows, df = scored
    got = binary_auc(df, "score", "label", "pred").collect()[0]
    assert got.auc == round(_pair_auc(rows), 6)
    # confusion at pred = score >= 0.5
    tp = sum(1 for s, y in rows if y == 1 and s >= 0.5)
    fp = sum(1 for s, y in rows if y == 0 and s >= 0.5)
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, n_pos - tp, n_neg - fp)
    assert got.precision == round(tp / (tp + fp), 6)
    assert got.recall == round(tp / n_pos, 6)
    assert got.f1 == round(2 * tp / (2 * tp + fp + (n_pos - tp)), 6)
    assert got.accuracy == round((tp + n_neg - fp) / len(rows), 6)


def test_binary_auc_degenerate_single_class(spark):
    df = spark.createDataFrame(
        [(0.3, 1, False), (0.8, 1, True)], "score DOUBLE, label INT, pred BOOLEAN"
    )
    got = binary_auc(df, "score", "label", "pred").collect()[0]
    assert got.auc is None and got.n_pos == 2 and got.n_neg == 0
    assert got.recall == 0.5 and got.accuracy == 0.5 and got.precision == 1.0


def test_calibration_bins_matches_replay(spark):
    rows = [(0.05, 0), (0.12, 0), (0.18, 1), (0.55, 1), (0.58, 0),
            (0.97, 1), (1.0, 1), (0.999999, 1), (0.55, 1)]
    df = spark.createDataFrame(rows, "prob DOUBLE, label INT")
    got = {r.bin: r for r in calibration_bins(df, "prob", "label", 10).collect()}
    # prob 1.0 clamps into bin 9 (least(floor(10.0), 9))
    bins = {}
    for p, y in rows:
        p6 = round(p, 6)
        b = min(int(math.floor(p6 * 10)), 9)
        bins.setdefault(b, []).append((p6, y))
    assert set(got) == set(bins)
    n_total = len(rows)
    for b, members in bins.items():
        n = len(members)
        n_pos = sum(y for _, y in members)
        conf = round(sum(p for p, _ in members) / n, 6)
        acc = round(n_pos / n, 6)
        r = got[b]
        assert (r.n, r.n_pos) == (n, n_pos)
        assert r.conf == conf and r.acc == acc
        assert r.ece_term == round(abs(acc - conf) * n / n_total, 6)
    assert 9 in got and got[9].n == 3


def test_decile_lift_matches_replay(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.modeleval import decile_lift

    rows = [(round((i % 20) * 0.05, 6), 1 if i % 3 == 0 else 0) for i in range(40)]
    rows += [(0.5, 1), (0.5, 0), (0.5, 0)]  # heavy tie straddling a cut
    df = spark.createDataFrame(rows, "score DOUBLE, label INT")
    got = {r.bucket: r for r in decile_lift(df, "score", "label", 10).collect()}
    # python replay of the score-group convention
    from collections import Counter, defaultdict

    cnt = Counter(s for s, _ in rows)
    pos = defaultdict(int)
    for s, y in rows:
        pos[s] += y
    n_total = len(rows)
    below = {}
    acc = 0
    for s in sorted(cnt, reverse=True):
        below[s] = acc
        acc += cnt[s]
    buckets = defaultdict(lambda: [0, 0])
    for s in cnt:
        b = 10 * below[s] // n_total
        buckets[b][0] += cnt[s]
        buckets[b][1] += pos[s]
    assert set(got) == set(buckets)
    p_total = sum(y for _, y in rows)
    cum = 0
    for b in sorted(buckets):
        n, np_ = buckets[b]
        cum += np_
        r = got[b]
        assert (r.n, r.n_pos) == (n, np_)
        assert r.pos_rate == round(np_ / n, 6)
        assert r.cum_capture == round(cum / p_total, 6)
        assert r.lift == round((np_ * n_total) / (n * p_total), 6)


def test_decile_lift_all_tied_single_bucket(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators.modeleval import decile_lift

    df = spark.createDataFrame(
        [(0.7, 1), (0.7, 0), (0.7, 1)], "score DOUBLE, label INT"
    )
    out = decile_lift(df, "score", "label", 10).collect()
    assert len(out) == 1 and out[0].bucket == 0 and out[0].n == 3
    assert out[0].lift == 1.0  # single bucket == base rate


def test_calibration_bins_clamps_out_of_range_probs(spark):
    # out-of-contract probs fold into the edge bins instead of leaking
    # bin ids outside [0, n_bins) (r9 ADVICE item)
    rows = [(-0.2, 0), (-0.000001, 1), (0.05, 0), (1.0, 1), (1.3, 1)]
    df = spark.createDataFrame(rows, "prob DOUBLE, label INT")
    got = {r.bin: r for r in calibration_bins(df, "prob", "label", 10).collect()}
    assert set(got) == {0, 9}
    assert got[0].n == 3 and got[0].n_pos == 1  # two negatives clamp in
    assert got[9].n == 2 and got[9].n_pos == 2  # 1.0 and 1.3 clamp in


def test_binary_auc_empty_input_counts_are_zero(spark):
    """The MWU-class empty-input edge, pinned here too: an empty frame
    has zero (score, pred) groups and sum-over-empty is NULL — the
    count columns must read 0 with NULL AUC/ratio metrics."""
    from employee_data_management_system_data_engineering_solution_spark.operators.modeleval import binary_auc

    df = spark.createDataFrame([], "score INT, label INT, pred BOOLEAN")
    got = binary_auc(df).collect()[0]
    assert (got.n, got.n_pos, got.n_neg, got.tp, got.fp, got.fn, got.tn) == (
        0, 0, 0, 0, 0, 0, 0,
    )
    assert got.auc is None and got.precision is None
    assert got.recall is None and got.f1 is None and got.accuracy is None
