"""SparkSession factory.

Replaces the five copies of the session-builder block in the reference
(``clean_load_2_tf_staging.py:9-17`` and identical blocks in every job
script). One builder, parameterized, no hardcoded credentials
(contrast ``clean_load_2_tf_staging.py:18-23``), no LEGACY time parser.

Scale posture: AQE on (runtime coalesce + skew-join), shuffle
partitions sized to the local core count for tests; on a real cluster
callers pass ``shuffle_partitions`` ~ 2-3x total cores. Session
timezone is pinned to UTC so timestamp semantics are stable across
engines and hosts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "eds-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Defaults follow $SPARK_GRAFT_CPUS when set (the driver's bench
    contract), else all local cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # engine-level Arrow batch sizing (guide §4.2): the
        # Python-boundary operators stream one narrow column; 64k-row
        # batches amortize per-batch overhead ~6x over the 10k default
        # (measured on frequent_shingles, r16). Also applied at
        # operator entry (sources.io.arrow_batch_defaults) so sessions
        # built elsewhere get it too.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # test data carries TIMESTAMP(NANOS) parquet columns, which Spark
        # rejects by default; read them as long and convert in the reader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("EDS_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
