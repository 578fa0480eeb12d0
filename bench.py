"""Benchmark harness: times every registered query at the bench scale
factor and prints ONE compact JSON line on stdout.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced to full materialization through the no-op sink
(``format("noop")``) so timings include the whole plan, not a
count-optimized subset.

Methodology (warm-cache, two-pass):

* WARM-UP: before timing, the harness runs a fixed warm list — JVM/
  codegen startup, the parquet reader over every bench-scale table
  (full scan into the noop sink, so first-scan I/O and the OS page
  cache are excluded from every timed query equally), the Arrow python
  worker pool, the Structured Streaming machinery, and the regex/
  ngram-family codegen JIT (measured ~2-4 s of one-time compilation
  each, which would otherwise be billed to whichever query runs the
  path first). Timings therefore measure STEADY-STATE plan execution,
  not cold-start I/O.
* TWO PASSES: every query is timed twice in one session. The HEADLINE
  suite total is the sum of FIRST-pass times (comparable round over
  round, and it charges the session-scoped verified-pair memo — see
  ``plans/llm._PAIRS_CACHE`` — exactly once, to the first consumer).
  ``BENCH_DETAIL.json`` carries per-query ``min`` and ``spread``
  (|t1-t2|) so a regression can be told apart from single-run VM
  noise; spreads of ±20% on sub-second queries are normal here.
  Note the pair-memo consumers (ngram_jaccard_pairs, dedup_clusters,
  dedup_clusters_star) read the memo on pass 2, so their min reflects
  amortized (steady-state) cost by design.

The stdout line is kept well under 1,500 bytes (the harness capturing
it may retain only a bounded stdout tail): it carries the suite total,
query/failure counts, and the five slowest queries. The full per-query
timing dict goes to ``BENCH_DETAIL.json`` next to this file and to
stderr. A query that throws is counted in ``n_failed`` — a broken query
must flag the run, never shrink the reported total into looking faster.
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
    # TIMESTAMP(NANOS) parquet columns read as long, session-wide — set
    # once at startup (not inside a warm closure) so every plan,
    # including a bench run with warm-ups disabled, sees the same conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from __spark_entry__ import queries

    qs = queries()

    # warm-up: JVM codegen, parquet reader, Arrow python workers, and the
    # Structured Streaming machinery — all at the smallest sf so their
    # one-time startup isn't billed to the first timed query (see the
    # module docstring for the warm-cache methodology). Non-fatal: a
    # broken warm-up must still leave a parseable JSON line on stdout.
    warm_sf = "/root/testdata/sf0.001"

    def _touch(table: str):
        # full scan into the noop sink: warms the OS page cache and the
        # parquet reader for the bench-sf file so first-scan I/O isn't
        # billed to whichever timed query happens to read it first
        def go():
            spark.read.parquet(f"{sf_dir}/{table}.parquet").write.format("noop").mode(
                "overwrite"
            ).save()

        return go

    def _warm_query(name: str):
        return lambda: qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()

    for warm in (
        lambda: spark.range(1_000_000).selectExpr("sum(id)").collect(),
        lambda: qs["q1_pricing_summary"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
        _touch("events"),
        _touch("documents"),
        _touch("embeddings"),
        _warm_query("simhash_signatures"),
        # first regex-bearing plan pays ~2s of one-time JIT on the
        # codegen->java.util.regex path; the ngram signature/verify
        # plans pay ~4s of codegen JIT — warm both at the small sf
        _warm_query("strike_report_rlike"),
        _warm_query("strike_stream_stateful"),
        _warm_query("ngram_jaccard_pairs"),
    ):
        try:
            warm()
        except Exception as exc:
            print(f"bench: warm-up step failed: {exc}", file=sys.stderr)

    # the ngram warm-up memoized the sf0.001 pair set; drop it so the
    # timed pass charges the bench-sf pipeline to the first consumer
    try:
        from employee_data_management_system_data_engineering_solution_spark.plans import llm as _llm

        _llm.clear_pairs_cache()
    except Exception as exc:
        print(f"bench: cache reset failed: {exc}", file=sys.stderr)

    def run_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                out[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # a failed query must not kill the bench
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                out[name] = -1.0
        return out

    timings = run_pass()  # pass 1: the headline numbers
    second = run_pass()  # pass 2: noise bound (and steady-state memo reads)

    failed = sorted(name for name, t in timings.items() if t < 0)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: kv[1],
            reverse=True,
        )[:5]
    )

    per_query = {
        n: {
            "t1": timings[n],
            "t2": second.get(n, -1.0),
            "min": min(t for t in (timings[n], second.get(n, -1.0)) if t >= 0)
            if max(timings[n], second.get(n, -1.0)) >= 0
            else -1.0,
            "spread": round(abs(timings[n] - second.get(n, timings[n])), 3)
            if timings[n] >= 0 and second.get(n, -1.0) >= 0
            else None,
        }
        for n in timings
    }
    detail = {
        "metric": "suite_total_sec",
        "value": None if failed else total,
        "unit": "sec",
        "queries": timings,
        "per_query": per_query,
        "methodology": (
            "warm-cache; suite total = sum of pass-1 times; per_query has both "
            "passes, min, and spread (|t1-t2|) as the noise bound; the "
            "verified-pair memo makes pass-2 ngram/cluster times amortized"
        ),
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "failed": failed,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail), file=sys.stderr)

    compact = {
        "metric": "suite_total_sec",
        # a run with failures reports a null total: a broken query must
        # never make the suite look faster by dropping out of the sum
        "value": None if failed else total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "queries": slowest,
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # hard guard: never exceed the capture window
        compact.pop("queries", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()
    # rc stays 0 so the line is always captured; failures are flagged in
    # the JSON itself (n_failed > 0, value = null).
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
