"""Filesystem seam for the warehouse maintenance helpers.

Data reads/writes go through Spark itself, which speaks every
Hadoop-supported scheme for free. The MAINTENANCE helpers — newest-file
discovery (S4), compaction accounting, time-travel version listing,
retention deletes — additionally need directory METADATA (names,
mtimes, marker-file existence), which ``spark.read`` doesn't expose.
This module is the one place that metadata comes from:

* a SCHEME-LESS path that exists locally is served by the ``os``
  implementation even when a session is up — it is strictly more
  precise (nanosecond mtimes vs Hadoop's milliseconds, which matters
  for newest-file tie-breaking) and has no JVM dependency;
* everything else (``hdfs://``, ``s3a://``, ``file://`` URIs, or
  scheme-less paths on a default-HDFS deployment) goes through the
  Hadoop ``FileSystem`` API of a JVM-backed session — the 100 TB
  deployment path;
* with no usable JVM at all (plain-Python callers, Spark Connect
  sessions, docs builds), the pure ``os`` fallback handles local
  paths. A session without a JVM handle is treated as "no session"
  even when passed EXPLICITLY — ``compact_parquet(connect_session,
  ...)`` must degrade to the local listing, not crash after the write.

Behavioral parity of the two sides is asserted by tests/test_io.py
running the same suites against both.

Returned child paths are expressed in the CALLER's coordinates (input
path + '/' + name), never the filesystem's canonical URI — a caller
that passed ``/tmp/x`` gets ``/tmp/x/f.csv`` back, not
``file:/tmp/x/f.csv``, so path equality and downstream joins behave
the same on both sides of the seam.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class FsEntry:
    """One directory child: basename, modification time (epoch
    seconds), directory flag."""

    name: str
    mtime: float
    is_dir: bool


def _jvm_spark():
    """The active JVM-backed SparkSession, or None (no session, or a
    Connect session with no JVM handle)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:
        return None
    if spark is None or getattr(spark, "_jvm", None) is None:
        return None
    return spark


def _usable(spark):
    """An explicitly-passed session counts only if it actually carries
    a JVM handle (Spark Connect sessions don't); otherwise fall back to
    the active classic session, then to None."""
    if spark is not None and getattr(spark, "_jvm", None) is not None:
        return spark
    return _jvm_spark()


def _local(path: str) -> bool:
    """True when the path is scheme-less and exists on the local
    filesystem — serve it with ``os`` (ns-precision mtimes, no JVM)."""
    return "://" not in path and os.path.exists(path)


def _hadoop_fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def join(path: str, name: str) -> str:
    """Caller-coordinate child path: plain ``os.path.join`` for local
    paths, '/'-append for URIs (``os.path.join`` would mangle
    ``s3a://bucket/dir`` on Windows-style separators)."""
    if "://" in path:
        return path.rstrip("/") + "/" + name
    return os.path.join(path, name)


def _list_dir_os(path: str) -> list[FsEntry] | None:
    if not os.path.isdir(path):
        return None
    out = []
    for name in os.listdir(path):
        full = os.path.join(path, name)
        # a concurrent writer's short-lived artifact (_temporary,
        # .part-*.crc) can vanish between listdir and stat — skip it
        # rather than crash the listing (Hadoop's listStatus snapshot
        # has no such race)
        try:
            out.append(
                FsEntry(
                    name=name,
                    mtime=os.path.getmtime(full),
                    is_dir=os.path.isdir(full),
                )
            )
        except FileNotFoundError:
            continue
    return out


def list_dir(path: str, spark=None) -> list[FsEntry] | None:
    """Children of ``path`` as :class:`FsEntry`, or None when the path
    does not exist or is not a directory. Local scheme-less paths use
    ``os`` directly; URIs (and scheme-less paths that only a
    default-FS knows about) go through the Hadoop FS of a JVM-backed
    session."""
    if _local(path):
        return _list_dir_os(path)
    spark = _usable(spark)
    if spark is not None:
        fs, jpath = _hadoop_fs(spark, path)
        if not fs.exists(jpath) or not fs.getFileStatus(jpath).isDirectory():
            return None
        return [
            FsEntry(
                name=st.getPath().getName(),
                mtime=st.getModificationTime() / 1000.0,
                is_dir=st.isDirectory(),
            )
            for st in fs.listStatus(jpath)
        ]
    return _list_dir_os(path)


def exists(path: str, spark=None) -> bool:
    """Existence check through the same seam (marker files like
    ``_SUCCESS`` on any scheme)."""
    if _local(path):
        return True
    spark = _usable(spark)
    if spark is not None:
        fs, jpath = _hadoop_fs(spark, path)
        return bool(fs.exists(jpath))
    return os.path.exists(path)


def delete(path: str, spark=None) -> bool:
    """Recursive delete through the seam (local ``shutil.rmtree`` /
    Hadoop ``fs.delete(path, recursive=True)``). Returns True when
    something was removed, False when the path didn't exist — never
    raises for a missing path (retention passes re-run)."""
    if _local(path):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        else:
            os.remove(path)
        return True
    spark = _usable(spark)
    if spark is not None:
        fs, jpath = _hadoop_fs(spark, path)
        return bool(fs.delete(jpath, True))
    return False
