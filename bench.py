"""Benchmark harness: times every registered query at the bench scale
factor and prints ONE JSON line on stdout.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced to full materialization through the no-op sink
(``format("noop")``) so timings include the whole plan, not a
count-optimized subset. One warm-up action runs first so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = 0.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("eds-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()

    # warm-up: JVM codegen, parquet reader, Arrow python workers, and the
    # Structured Streaming machinery — all at the smallest sf so their
    # one-time startup isn't billed to the first timed query. Non-fatal:
    # a broken warm-up must still leave a parseable JSON line on stdout.
    warm_sf = "/root/testdata/sf0.001"
    for warm in (
        lambda: spark.range(1_000_000).selectExpr("sum(id)").collect(),
        lambda: qs["q1_pricing_summary"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
        lambda: qs["simhash_signatures"](spark, warm_sf)
        .write.format("noop").mode("overwrite").save(),
        lambda: qs["strike_stream_stateful"](spark, warm_sf)
        .write.format("noop").mode("overwrite").save(),
    ):
        try:
            warm()
        except Exception as exc:
            print(f"bench: warm-up step failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failed query must not kill the bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
