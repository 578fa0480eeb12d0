"""Z-order (Morton) layout: bit-exact parity between the Spark column
expression, the SQL oracle text, and a pure-Python reference — plus the
clustering property the layout exists for (per-file bounding boxes stay
tight in BOTH dimensions)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.layout import (
    morton_key,
    morton_key_py,
    morton_sql,
)


def test_morton_key_matches_python_reference(spark):
    pts = [(x, y) for x in (0, 1, 2, 3, 5, 123, 1023) for y in (0, 1, 7, 64, 1000, 1023)]
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y"), 10).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == morton_key_py(x, y, 10), (x, y)


def test_morton_sql_matches_python_reference():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT x, y, {morton_sql('x', 'y', 10)} AS z
        FROM (SELECT unnest(range(0, 50)) AS x) CROSS JOIN (SELECT unnest([0, 3, 17, 1023]) AS y)
        """
    ).fetchall()
    assert rows
    for x, y, z in rows:
        assert z == morton_key_py(x, y, 10), (x, y)


def test_morton_interleave_is_bijective_on_domain():
    seen = {morton_key_py(x, y, 4) for x in range(16) for y in range(16)}
    assert len(seen) == 256 and min(seen) == 0 and max(seen) == 255


def test_morton_rejects_bad_bits():
    with pytest.raises(ValueError):
        morton_key(F.lit(1), F.lit(1), 0)
    with pytest.raises(ValueError):
        morton_sql("x", "y", 32)


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of the layout: bucketing by the TOP Morton bits keeps
    each bucket's bounding box small in BOTH dimensions (each of the 64
    buckets spans at most 1/8 of each 1024-wide domain), which is what
    makes file-level min/max stats prunable for either predicate. A
    lexicographic sort by x alone leaves y unbounded per bucket."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 1024).alias("x"),
        ((F.col("id") * 7919) % 1024).alias("y"),
    )
    z = df.select(
        "x", "y", F.shiftright(morton_key(F.col("x"), F.col("y"), 10), 14).alias("b")
    )
    stats = z.groupBy("b").agg(
        (F.max("x") - F.min("x")).alias("sx"), (F.max("y") - F.min("y")).alias("sy")
    ).collect()
    assert stats
    for r in stats:
        # top-6-bit bucket = 3 high bits of each dimension fixed →
        # spans <= 2^7 - 1 within each 2^10 domain
        assert r.sx <= 127 and r.sy <= 127, (r.b, r.sx, r.sy)
