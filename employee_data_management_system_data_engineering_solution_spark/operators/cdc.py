"""Change-data-capture primitives: snapshot diff and deterministic
hash-based dataset splitting.

The reference's merge path (SCD-2 close-out + keyed upsert) consumes a
pre-computed delta; ``snapshot_diff`` PRODUCES that delta from two full
snapshots — the missing first stage of a warehouse CDC loop. North-star
extension (SURVEY §2.11.1).

Scale design: the diff is ONE full-outer shuffle join on the natural
key (bucket both snapshots on the key to make it co-located/zero
shuffle); classification is a narrow null-safe column comparison, no
window, no collect. ``hash_split`` is a pure narrow map — a salted md5
over the key, mod N — so a 100 TB corpus splits without a shuffle, and
the assignment is stable across runs and cluster sizes (no
``rand()``, no ``monotonically_increasing_id``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
    *,
    keep_unchanged: bool = False,
    keep_old: bool = False,
) -> DataFrame:
    """Diff two snapshots of the same table into insert/update/delete
    rows.

    Output: key columns, ``change_type`` ∈ {insert, update, delete[,
    unchanged]}, and the non-key ``compare`` columns valued from the NEW
    snapshot (from the OLD one for deletes). Comparison is null-safe;
    rows equal on every compare column are 'unchanged' and dropped
    unless ``keep_unchanged``.

    ``keep_old=True`` additionally emits ``old_<col>`` AND ``new_<col>``
    columns holding each side's RAW values (``old_*`` NULL for inserts,
    ``new_*`` NULL for deletes) — the shape incremental aggregate
    maintenance needs: an update's contribution is (−old, +new), and
    neither side is recoverable from the coalesced main columns alone
    (a genuinely-NULL new value would coalesce to the OLD value and
    corrupt the delta).

    Keys join null-safely, so a NULL-keyed row present in both
    snapshots diffs as update/unchanged (a plain-SQL ``=`` join would
    report it as delete + insert); presence on each side is tracked
    with marker columns, never inferred from key nullness.
    """
    keys = list(keys)
    compare = list(compare) if compare is not None else [c for c in new.columns if c not in keys]

    o = old.select(*keys, *compare).withColumn("__o_present", F.lit(1))
    n = new.select(*keys, *compare).withColumn("__n_present", F.lit(1))
    o = reduce(lambda df, c: df.withColumnRenamed(c, f"__o_{c}"), keys + compare, o)
    n = reduce(lambda df, c: df.withColumnRenamed(c, f"__n_{c}"), keys + compare, n)

    cond = reduce(
        lambda a, b: a & b,
        [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")

    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare],
    )
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k) for k in keys],
        change.alias(CHANGE_COL),
        *[F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c) for c in compare],
        *(
            [F.col(f"__o_{c}").alias(f"old_{c}") for c in compare]
            + [F.col(f"__n_{c}").alias(f"new_{c}") for c in compare]
            if keep_old
            else []
        ),
    )
    return out if keep_unchanged else out.filter(F.col(CHANGE_COL) != "unchanged")


def hash_split(
    df: DataFrame,
    key: str,
    *,
    seed: str = "seed",
    buckets: int = 100,
    cuts: Sequence[tuple[str, int]] = (("train", 80), ("valid", 90), ("test", 100)),
) -> DataFrame:
    """Deterministic dataset split: bucket = md5(key ‖ seed) mod
    ``buckets``; the first cut whose bound exceeds the bucket names the
    split. Appends ``bucket`` and ``split`` columns.

    DuckDB-parity form of the hash (see gate convention):
    Spark ``conv(substring(md5(x), 1, 15), 16, 10)`` ≡ DuckDB
    ``('0x' || substring(md5(x), 1, 15))::BIGINT``.
    """
    digest = F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + seed)))
    bucket = (F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % buckets).alias("bucket")
    chain = None
    for name, bound in cuts:
        chain = (
            F.when(F.col("bucket") < bound, F.lit(name))
            if chain is None
            else chain.when(F.col("bucket") < bound, F.lit(name))
        )
    return df.withColumn("bucket", bucket).withColumn("split", chain)


def agg_delta_contributions(
    diff: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group (Δcount, Δsum) contributions from a ``keep_old``
    snapshot diff — the delta half of incremental aggregate
    maintenance (the standard insert/delete-pair formulation: an
    update contributes (−1, −old) to its OLD group and (+1, +new) to
    its NEW group, which nets the count to zero when the group didn't
    move and handles group-changing updates with no special case).

    Output: (group_col, d_n, d_sum, d_nv). NULL discipline:
    contributions are built from the RAW per-side columns (``new_*``
    for the plus leg, ``old_*`` for the minus leg) — never the diff's
    coalesced main columns, which would substitute the other side's
    value when one is genuinely NULL; a NULL value contributes nothing
    to ``d_sum`` (sum skips it, exactly as a recompute would) while
    still moving the count, and a NULL GROUP key is a legitimate group
    (grouped here, merged null-safely by :func:`apply_agg_delta`).
    ``d_nv`` tracks the NON-NULL value count (±1 only when the leg's
    value is non-null) — the witness :func:`apply_agg_delta` needs to
    refresh a group whose surviving values are all NULL to a NULL sum,
    exactly as a recompute would, instead of a fabricated 0.

    Scale: one narrow explode of ≤2 structs per changed row, then ONE
    groupBy on the grouping key whose cardinality is the report's, not
    the table's. The whole point at 100 TB: the refresh touches
    |delta| rows, never the base table.
    """
    ng, nv = F.col(f"new_{group_col}"), F.col(f"new_{value_col}")
    og, ov = F.col(f"old_{group_col}"), F.col(f"old_{value_col}")
    plus = F.struct(
        ng.alias("g"),
        F.lit(1).alias("dn"),
        nv.alias("dv"),
        F.when(nv.isNotNull(), 1).otherwise(0).alias("dnv"),
    )
    minus = F.struct(
        og.alias("g"),
        F.lit(-1).alias("dn"),
        (-ov).alias("dv"),
        F.when(ov.isNotNull(), -1).otherwise(0).alias("dnv"),
    )
    contribs = (
        F.when(F.col(CHANGE_COL) == "insert", F.array(plus))
        .when(F.col(CHANGE_COL) == "delete", F.array(minus))
        .otherwise(F.array(minus, plus))  # update = delete(old) + insert(new)
    )
    return (
        diff.select(F.explode(contribs).alias("c"))
        .groupBy(F.col("c.g").alias(group_col))
        .agg(
            F.sum("c.dn").alias("d_n"),
            F.sum("c.dv").alias("d_sum"),
            F.sum("c.dnv").alias("d_nv"),
        )
    )


def apply_agg_delta(
    base_agg: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    pairs: Sequence[tuple[str, str]],
    count_col: str,
    null_when_zero: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Merge per-group delta contributions into a stored aggregate:
    full-outer join on the group key, add each additive ``(base_col,
    delta_col)`` pair with NULL→0 coalescing (the count pair included),
    drop groups whose refreshed count is zero (fully deleted), keep
    groups the delta newly created.

    Exactness contract: works for counts and DECIMAL money sums —
    2-decimal money sums are exact and never round (a sum of cents is
    cents), so ``stored + Δ`` equals the full recompute bit-for-bit;
    do NOT feed it double sums, whose stored value depends on the
    original summation order. The NULL→0 coalescing alone would break
    that claim on one edge: a surviving group whose values are ALL
    NULL recomputes to ``sum = NULL``, not 0. ``null_when_zero`` closes
    it — each ``(sum_col, nonnull_count_col)`` entry (both must be
    maintained via ``pairs``; the witness count comes from
    ``agg_delta_contributions``'s ``d_nv``) NULLs the refreshed sum
    when the group's refreshed non-null value count is 0. The join
    keys compare NULL-SAFELY: a NULL grouping key is one group on both
    sides, exactly as groupBy treats it — a plain equi-join would emit
    it twice, once per side. One shuffle on the group key, sized by
    report cardinality.
    """
    group_cols = list(group_cols)
    b = reduce(
        lambda df, c: df.withColumnRenamed(c, f"__b_{c}"),
        [bc for bc, _ in pairs],
        base_agg,
    )
    b = reduce(
        lambda df, c: df.withColumnRenamed(c, f"__bg_{c}"), group_cols, b
    )
    cond = reduce(
        lambda a, c: a & b[f"__bg_{c}"].eqNullSafe(delta[c]),
        group_cols[1:],
        b[f"__bg_{group_cols[0]}"].eqNullSafe(delta[group_cols[0]]),
    )
    merged = b.join(delta, cond, "full_outer")
    zero = F.lit(0)
    out = merged.select(
        *[
            F.coalesce(F.col(f"__bg_{c}"), F.col(c)).alias(c)
            for c in group_cols
        ],
        *[
            (F.coalesce(F.col(f"__b_{bc}"), zero) + F.coalesce(F.col(dc), zero)).alias(bc)
            for bc, dc in pairs
        ],
    )
    maintained = {bc for bc, _ in pairs}
    for sum_col, nv_col in null_when_zero:
        if sum_col not in maintained or nv_col not in maintained:
            raise ValueError(
                f"null_when_zero pair ({sum_col}, {nv_col}) must both be "
                "maintained columns from `pairs`"
            )
        out = out.withColumn(
            sum_col, F.when(F.col(nv_col) > 0, F.col(sum_col))
        )
    return out.filter(F.col(count_col) > 0)


def dirty_group_refresh(
    stored_agg: DataFrame,
    new_base: DataFrame,
    diff: DataFrame,
    group_col: str,
    agg_exprs: Sequence[Column],
) -> DataFrame:
    """Incremental refresh for NON-invertible aggregates (min/max/
    distinct counts): deletes and updates can retire the current
    extremum, so no per-group delta can maintain them — the standard
    materialized-view fallback is to mark the groups the delta TOUCHED
    as dirty and recompute exactly those from the new base table,
    keeping every clean group's stored row untouched.

    ``diff`` must come from ``snapshot_diff(..., keep_old=True)`` so
    each change's OLD and NEW group memberships are known raw: an
    insert dirties its new group, a delete its old group, an update
    both (covering group-moving updates). The artifact-NULL sides
    (``old_*`` of an insert, ``new_*`` of a delete) are deliberately
    NOT treated as touching the NULL group — only real membership legs
    are — while a genuinely-NULL group key dirties and recomputes
    null-safely like any other group.

    ``stored_agg`` must have the exact schema of
    ``new_base.groupBy(group_col).agg(*agg_exprs)`` (enforced by the
    final ``unionByName``).

    Scale: |dirty| ≤ 2·|delta| distinct groups — a small aggregate AQE
    broadcasts on its runtime size (not forced: a huge delta would
    make a forced broadcast the hazard, and at that point the plan
    degrades gracefully to a shuffle semi-join); the recompute scans
    only rows whose group is dirty (semi-join prunes; with the base
    partitioned/bucketed by group this is partition pruning), so the
    refresh is O(|delta| + |rows in dirty groups| + |report|), never
    O(|base|). Cited shape: recompute-on-delete fallback in view
    maintenance literature (self-maintainability does not hold for
    MIN/MAX under deletions).
    """
    ng, og = F.col(f"new_{group_col}"), F.col(f"old_{group_col}")
    touched = (
        F.when(F.col(CHANGE_COL) == "insert", F.array(ng))
        .when(F.col(CHANGE_COL) == "delete", F.array(og))
        .otherwise(F.array(og, ng))
    )
    dirty = diff.select(F.explode(touched).alias("__dirty_g")).distinct()
    recomputed = (
        new_base.join(
            dirty, F.col(group_col).eqNullSafe(F.col("__dirty_g")), "left_semi"
        )
        .groupBy(group_col)
        .agg(*agg_exprs)
    )
    kept = stored_agg.join(
        dirty, F.col(group_col).eqNullSafe(F.col("__dirty_g")), "left_anti"
    )
    return kept.unionByName(recomputed)


def cdc_replay(
    base: DataFrame,
    log: DataFrame,
    keys: Sequence[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    upsert_op: str = "upsert",
    delete_op: str = "delete",
) -> DataFrame:
    """Replay an ordered CDC event log onto a base snapshot:
    last-writer-wins per key by ``seq_col``, ``delete`` ops are
    tombstones, and a later upsert RESURRECTS a deleted key (the edge
    naive "apply deletes then upserts" phase-ordering gets wrong).
    ``log`` must carry the key columns, ``seq_col``, ``op_col``, and —
    for upserts — every non-key column of ``base``.

    The log is collapsed FIRST (row_number over (key, seq desc) — only
    each key's final op matters), then applied in one pass: base rows
    whose key never appears in the log survive via anti-join; the
    collapsed upserts contribute their payload (including brand-new
    keys); collapsed deletes contribute nothing. ``seq_col`` must be
    unique per key: a duplicate (key, seq) at the TOP of a key's
    collapse has no defined winner, so the replay poisons it with
    ``raise_error`` instead of letting partitioning order pick one
    nondeterministically (detected via ``lead(seq)`` in the same
    window — same partition keys, no extra shuffle; duplicates below
    the winner are harmless history and stay unchecked, mirroring the
    unknown-op rule). An unknown op that
    WINS a key's collapse poisons the replay with ``raise_error``
    rather than silently dropping the row (ops displaced by a later
    event are never applied, so they are not validated — the check
    guards what takes effect, inside the expression that reads the
    op, where Catalyst cannot prune it away). CDC keys must be
    non-null (the join is standard equality; a NULL-keyed log entry
    targets nothing).

    Scale: both shuffles — the collapse window and the anti-join — are
    on the SAME key, so with the base bucketed by primary key the
    apply is co-located; cost is O(|log| + |base|) with the log side
    collapsed to ≤ one row per touched key before it meets the base.
    """
    keys = list(keys)
    payload = [c for c in base.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    last = (
        log.withColumn("__rn", F.row_number().over(w))
        .withColumn("__dup_win", F.lead(seq_col).over(w).eqNullSafe(F.col(seq_col)))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    checked_op = F.when(
        F.col("__dup_win"),
        F.raise_error(
            F.concat(
                F.lit("cdc_replay: duplicate winning seq for key "),
                F.concat_ws("/", *[F.col(k).cast("string") for k in keys]),
            )
        ),
    ).when(
        F.col(op_col).isin(upsert_op, delete_op), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("cdc_replay: unknown op '"), F.col(op_col), F.lit("'"))
        )
    )
    survivors = last.filter(checked_op == upsert_op).select(*keys, *payload)
    untouched = base.join(last.select(*keys), keys, "left_anti")
    return untouched.unionByName(survivors)
