"""Bloom-filter join pruning — cut the big side's shuffle volume
before a large-×-large join.

The reference joins staged tables with plain equi-joins
(reference: merge2_tf_dim_staging.py; SURVEY §2.4); at 100 TB the
dominant cost of ``fact JOIN filtered_dim`` is shuffling fact rows
whose keys can never match. A Bloom filter built from the (already
filtered, much smaller) dim key set and applied map-side to the fact
scan drops most non-matching rows BEFORE the exchange — the same idea
as Spark's runtime row-level filtering, but explicit, tunable, and
usable when the optimizer's own injection declines to fire.

Correctness contract: a Bloom filter has NO false negatives, so
pruning + exact join ≡ exact join — the final result is byte-identical
whatever the false-positive rate, which only costs shuffle bytes. That
is why the DuckDB oracle for a bloom-pruned query is the PLAIN join
SQL: the filter is invisible in the result, visible only in the
exchange volume.

Scale shape: the build is one map-side-combined ``bit_or`` aggregation
to ≤ ``num_bits``/64 rows collected to the driver (a 2^17-bit filter is
2 KiB of longs — broadcast-trivial); the probe is a narrow filter of k
``xxhash64`` evaluations per fact row against an array literal, fully
inside whole-stage codegen. No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per filter; 2^17 (16 KiB) holds ~13k keys at ~10 bits/key
#: (≈1% FP). Callers sizing for bigger key sets pass a bigger power.
DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 3


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k probe positions for ``key``: independent hash functions
    derived by pairing the key with a literal salt under ``xxhash64``
    (Spark's seed is fixed, so the salt column provides the family)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)).cast("long")
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Build the filter: a dense ``num_bits/64``-long word list.

    One explode (×k, tiny), one ``bit_or`` groupBy whose map-side
    partial aggregation reduces every partition to ≤ num_bits/64 rows
    before the exchange, one bounded collect. The returned list is the
    whole filter — hand it to :func:`bloom_prune` (driver-side literal,
    no broadcast variable or UDF anywhere).
    """
    rows = bloom_build_df(keys, key_col, num_bits, num_hashes).collect()
    dense = [0] * (num_bits // 64)
    for r in rows:
        dense[int(r["word_idx"])] = int(r["bits"])
    return dense


def bloom_words_literal(words: list[int]) -> Column:
    """The filter as ONE array literal expression (the pivot-literal
    trick from ``similarity._pivot_literal``: a single parsed SQL
    string, not num_bits/64 nested ``lit`` calls)."""
    return F.expr(f"array({','.join(f'{w}L' for w in words)})")


def bloom_might_contain(
    key: Column,
    words: list[int],
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """True iff every probe bit is set — may be a false positive, never
    a false negative. All probes are plain integer expressions over the
    array literal; codegen keeps the whole predicate in the scan stage,
    so the prune happens before any exchange."""
    lit = bloom_words_literal(words)
    checks = [
        (
            F.call_function(
                "shiftright",
                F.element_at(lit, ((p / 64).cast("long") + 1).cast("int")),
                (p % 64).cast("int"),
            )
            % 2
            != 0
        )
        for p in _bit_positions(key, num_bits, num_hashes)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_build_df(
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """The filter as a (word_idx, bits) DataFrame — the large-filter
    sibling of :func:`bloom_build`: nothing is collected, so the filter
    size is bounded by executor memory, not by what a plan literal can
    carry. Pin the (≤ num_bits/64-row) result before probing."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = F.explode(
        F.array(*_bit_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("__pos")
    return (
        keys.select(pos)
        .select(
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_prune_by_join(
    fact: DataFrame,
    fact_key: str,
    words_df: DataFrame,
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Probe via ``num_hashes`` broadcast-hash joins against the
    (word_idx, bits) filter table instead of a plan literal. A 2^21-bit
    filter is a ~350 KiB literal whose parse/analysis dominates the
    query; as a broadcast relation the same words cost three hash
    lookups per row inside codegen and the plan stays O(1). Missing
    words coalesce to 0 (bit unset ⇒ row pruned)."""
    out = fact
    keep = F.lit(True)
    for i in range(num_hashes):
        p = F.pmod(F.xxhash64(F.col(fact_key), F.lit(i)), F.lit(num_bits)).cast("long")
        w = words_df.select(
            F.col("word_idx").alias(f"__wi{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.withColumn(f"__p{i}", p).join(
            F.broadcast(w), F.expr(f"__p{i} div 64") == F.col(f"__wi{i}"), "left"
        )
        keep = keep & (
            F.call_function(
                "shiftright",
                F.coalesce(F.col(f"__b{i}"), F.lit(0).cast("long")),
                (F.col(f"__p{i}") % 64).cast("int"),
            )
            % 2
            != 0
        )
    drop = [c for i in range(num_hashes) for c in (f"__p{i}", f"__wi{i}", f"__b{i}")]
    return out.filter(keep).drop(*drop)


#: above this size the filter probes via broadcast join; below it, the
#: cheaper literal path (no joins) wins
LITERAL_MAX_BITS = 1 << 18


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int | None = None,
    num_hashes: int = DEFAULT_NUM_HASHES,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side Bloom-pruned first.

    Only inner and semi joins are accepted: the prune-then-join
    identity relies on dropped fact rows being exactly those that
    cannot match, which outer joins are REQUIRED to keep — a
    left-outer bloom-pruned join would silently lose its unmatched
    rows (modulo false positives), so it raises instead.

    ``num_bits=None`` (default) sizes the filter from the dim key
    count: the next power of two of 16 bits/key, floored at 2^17. A
    fixed-size filter silently saturates when the key set grows — at
    ~1.3 bits/key the "prune" passes ~90% of non-matching rows while
    still paying the probe cost — so auto-sizing (one bounded count
    over the already-filtered dim) is the default and a fixed size is
    the opt-in.

    The dim side is consumed twice (filter build + join), three times
    with auto-sizing (plus the distinct key count); callers with an
    expensive dim pipeline should pin it. The join itself is left to
    Catalyst/AQE — after pruning, the fact side is small enough that
    AQE often converts the exchange to a local one anyway.
    """
    if how.replace("_", "").lower() not in {"inner", "semi", "leftsemi"}:
        raise ValueError(
            f"bloom_pruned_join supports inner/semi joins only, got how={how!r}: "
            "outer joins must keep the unmatched rows the prune removes"
        )
    if num_bits is None:
        # DISTINCT keys (a dim with duplicated keys must not inflate
        # the filter); this is the third evaluation of the dim pipeline
        # (sizing count + build + join) — pin an expensive dim first
        n_keys = dim.select(dim_key).distinct().count()
        num_bits = DEFAULT_NUM_BITS
        # cap at 2^26 (1 MiB of words as a broadcast relation): past
        # ~4M keys the false-positive rate degrades gracefully — at
        # that point the dim side is usually big enough that a plain
        # shuffle join is the right plan anyway
        while num_bits < 16 * max(n_keys, 1) and num_bits < (1 << 26):
            num_bits *= 2
    if num_bits <= LITERAL_MAX_BITS:
        words = bloom_build(dim.select(dim_key), dim_key, num_bits, num_hashes)
        pruned = fact.filter(
            bloom_might_contain(F.col(fact_key), words, num_bits, num_hashes)
        )
    else:
        wdf = bloom_build_df(
            dim.select(dim_key), dim_key, num_bits, num_hashes
        ).localCheckpoint(eager=False)
        pruned = bloom_prune_by_join(fact, fact_key, wdf, num_bits, num_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
