"""File-source replay scaffolding for the streaming carriers.

The driver's ``events`` table stands in for the Kafka feed: each
carrier stages the parquet file into a fresh directory, runs a
micro-batch stream over it with an update-mode memory sink, and
returns the materialized result. In production only the source line
changes (``spark.readStream.format("kafka")``).

``replayed_events`` centralizes the shared mechanics: NANOS-safe
schema, state-partition sizing (per-partition state-store + Arrow
worker setup dominates small-key batches), deterministic sink naming,
and guaranteed cleanup of the staging dir, stream query, temp view,
and shuffle-partition conf.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable, Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def replayed_events(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> Iterator[tuple[DataFrame, Callable[[DataFrame, str], DataFrame]]]:
    """Yield ``(stream_df, run)`` where ``stream_df`` is the streaming
    view of ``{sf_dir}/events.parquet`` and ``run(result_df, name, output_mode)``
    executes the streaming plan through a memory sink (update mode by
    default; session-window aggregations require complete/append)
    (availableNow trigger) and returns the sink table, materialized so
    it survives the cleanup that follows the ``with`` block."""
    from ..sources.io import normalize_nanos

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    prior_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))

    stage_dir = tempfile.mkdtemp(prefix="eds_stream_")
    queries = []
    names = []
    try:
        os.symlink(f"{sf_dir}/events.parquet", f"{stage_dir}/events.parquet")
        batch = spark.read.parquet(f"{sf_dir}/events.parquet")
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
        )

        def run(result: DataFrame, name: str, output_mode: str = "update") -> DataFrame:
            q = (
                result.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            queries.append(q)
            names.append(name)
            q.awaitTermination()
            out = spark.table(name)
            return spark.createDataFrame(out.collect(), schema=out.schema)

        yield normalize_nanos(stream), run
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior_parts)
        for q in queries:
            q.stop()
        for name in names:
            spark.catalog.dropTempView(name)
        shutil.rmtree(stage_dir, ignore_errors=True)
