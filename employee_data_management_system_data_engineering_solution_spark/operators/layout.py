"""Space-filling-curve data layout: Z-order (Morton) keys.

Multi-dimensional clustering for scan pruning: sorting a table by the
bit-interleaved Morton key of two filter columns co-locates rows that
are close in BOTH dimensions into the same output files, so file-level
min/max statistics prune scans filtered on either column (or both) —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. A plain
lexicographic sort clusters only the leading column; at 100 TB the
difference is whether a two-predicate query reads ~1/P of the files or
all of them.

The key is a pure narrow map (no shuffle, no UDF: shift/and/add inside
whole-stage codegen); the SORT that consumes it is the usual
repartitionByRange write path. :func:`morton_sql` emits the identical
arithmetic as ANSI SQL so cross-engine oracles replay the exact key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Bit-interleaved Morton key of two non-negative ints: bit ``i``
    of ``x`` lands at position ``2i``, bit ``i`` of ``y`` at ``2i+1``
    (y is the higher-order dimension). Inputs must already be
    NON-NEGATIVE and bounded to ``bits`` bits — for signed sources mask
    with ``F.pmod(x, 1 << bits)`` (plain ``%`` is sign-preserving in
    both Spark and DuckDB, and a negative input's two's-complement bits
    interleave into keys that collide with large positive values,
    silently defeating the min/max pruning). The result fits in
    ``2*bits`` bits of a long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    xl, yl = x.cast("long"), y.cast("long")
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_sql(x: str, y: str, bits: int = 10) -> str:
    """The same interleave as :func:`morton_key`, rendered as one ANSI
    SQL expression over the (already bounded) expressions ``x``/``y`` —
    keeps oracle replays textually derived from the same bit layout."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def morton_key_py(x: int, y: int, bits: int = 10) -> int:
    """Pure-Python reference interleave (test oracle)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
