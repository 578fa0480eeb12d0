"""Approximate frequent-items machinery (Misra-Gries) with exact
rescoring — the 100 TB answer to "what are the frequent words/phrases
in the corpus" when the full-vocabulary groupBy shuffle is the
bottleneck (north-star extension; twin of the exact ``word_freq_topk``
the way X70/X108 twin the exact profiles/percentiles).

Two corpus passes, the standard mergeable-summaries construction
(Misra & Gries 1982; Agarwal et al., "Mergeable Summaries", PODS'12):

1. **Candidates + totals** — each partition folds its items through a
   Misra-Gries summary with ``capacity`` counters (Arrow batch at a
   time; merging a batch = add its counts, then subtract the
   (capacity+1)-th largest total and drop non-positives, which is the
   paper's merge step and preserves the error bound), and also emits
   its exact item COUNT as one total row — so the global N needed for
   the support threshold rides this same pass instead of costing a
   third scan. An item absent from EVERY partition summary has global
   count ≤ N/(capacity+1), so the union of summaries is a guaranteed
   superset of every item with frequency above that — shuffle-free,
   and the only Python work in the pipeline.
2. **Exact rescore** — one more scan counts ONLY candidate items
   (semi-join prune; the groupBy shuffle carries ≤ partitions ×
   capacity rows instead of the full vocabulary), then keeps items
   whose EXACT count clears the support threshold.

Because ``capacity + 1 > denom``, every item selected by
``n · denom > N`` is guaranteed present among candidates, so the
output is EXACT — identical to the full groupBy — while the shuffle
stays candidate-sized. The threshold compare is integer arithmetic on
both engines (``n * denom > N``), so there is no float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.io import arrow_batch_defaults

#: marker value in the ``kind`` column of a totals-bearing summary
CAND, TOTAL = "cand", "total"


def misra_gries_candidates(
    df: DataFrame, col: str, capacity: int = 8191, *, emit_totals: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``df[col]`` (strings):
    (item, est) rows, ≤ ``capacity`` per input partition. est is the
    summary's LOWER-bound counter, not the true count — callers
    wanting exact counts rescore (``heavy_hitters_exact``). Guarantee:
    any item with global count > N/(capacity+1) appears in at least
    one partition's summary, for ANY partitioning of the input.

    ``emit_totals=True`` adds a ``kind`` column (``'cand'`` /
    ``'total'``) and one ``'total'`` row per partition whose ``est``
    is the partition's EXACT item count — letting callers obtain the
    global N from the summary instead of paying a separate corpus
    scan. (A shrink step can legitimately empty a partition's
    candidate set — all counters tied at the cut — so totals get their
    own rows, never a column piggybacked on candidate rows.)"""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    fields = [
        T.StructField("item", T.StringType()),
        T.StructField("est", T.LongType()),
    ]
    if emit_totals:
        fields.append(T.StructField("kind", T.StringType()))
    schema = T.StructType(fields)

    def mg(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            n_part += int(vc.sum())
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                # merge-shrink: subtract the (capacity+1)-th largest
                # count from everything, drop non-positives — at most
                # `capacity` items can exceed that value, and the
                # total undercount stays ≤ N/(capacity+1)
                m = sorted(counts.values(), reverse=True)[capacity]
                counts = {i: c - m for i, c in counts.items() if c > m}
        out = {"item": list(counts.keys()), "est": list(counts.values())}
        if emit_totals:
            out["kind"] = [CAND] * len(counts)
            out["item"].append(None)
            out["est"].append(n_part)
            out["kind"].append(TOTAL)
        yield pd.DataFrame(out)

    arrow_batch_defaults(df.sparkSession)
    return df.select(F.col(col).alias(col)).mapInPandas(mg, schema)


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    denom: int = 5000,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT counts of every item whose frequency exceeds 1/``denom``
    of the total (selection: ``n * denom > N``, integer compare),
    computed without a full-vocabulary shuffle: MG candidates → exact
    rescore of candidates only. ``capacity`` defaults to
    ``max(2·denom − 1, 8191)`` (the guarantee needs ``capacity + 1 >
    denom``; extra counters buy candidate slack at linear memory —
    size executor memory for one ``capacity``-entry dict per task).

    Exactly TWO passes over the corpus: the MG pass also emits
    per-partition exact totals, the summary (≤ partitions ×
    (capacity+1) rows) is persisted, N is summed from its total rows
    as a driver scalar — the same bounded-barrier discipline as the
    k-means centroid collects, because N parameterizes the FILTER,
    not the data path — and the rescore pass counts candidates only.
    The persisted summary is deterministic under eviction/recompute
    (MG depends only on partition content and order), so a cache miss
    can never change the answer. Output: (item, n)."""
    if capacity is None:
        capacity = max(2 * denom - 1, 8191)
    if capacity + 1 <= denom:
        raise ValueError(
            f"capacity+1 ({capacity + 1}) must exceed denom ({denom}) or the "
            "candidate superset guarantee fails and the result stops being exact"
        )
    items = df.select(F.col(col).alias("item")).filter(F.col("item").isNotNull())
    summary = misra_gries_candidates(items, "item", capacity, emit_totals=True)
    summary.persist()
    total = (
        summary.filter(F.col("kind") == TOTAL)
        .agg(F.sum("est").alias("n"))
        .collect()[0]["n"]
    ) or 0
    # Materialize the bounded candidate set eagerly (≤ partitions ×
    # capacity rows) so the summary's cached blocks can be released
    # NOW — without the localCheckpoint, the returned plan would keep
    # the persist pinned and repeated calls (multi-SF bench sweeps in
    # one session) would accumulate cached blocks until eviction
    # pressure.
    cands = (
        summary.filter(F.col("kind") == CAND)
        .select("item")
        .distinct()
        .localCheckpoint(eager=True)
    )
    summary.unpersist()
    exact = (
        items.join(cands, "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
    )
    return exact.filter(F.col("n") * denom > F.lit(total))
