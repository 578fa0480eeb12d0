"""Filesystem seam for the warehouse maintenance helpers.

Data reads/writes go through Spark itself, which speaks every
Hadoop-supported scheme for free. The MAINTENANCE helpers — newest-file
discovery (S4), compaction accounting, time-travel version listing —
additionally need directory METADATA (names, mtimes, marker-file
existence), which ``spark.read`` doesn't expose. This module is the one
place that metadata comes from:

* with a live JVM-backed SparkSession, listings go through the Hadoop
  ``FileSystem`` API of that session (``Path.getFileSystem``), so
  ``hdfs://`` / ``s3a://`` / ``file://`` paths all behave identically —
  the 100 TB deployment path;
* with no active session (plain-Python callers, unit helpers), a pure
  ``os`` fallback handles local paths — behaviorally identical on
  ``file://``-equivalent input, asserted by tests/test_io.py running
  the same suites against both sides of the seam.

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


def list_dir(path: str, spark=None) -> list[FsEntry] | None:
    """Children of ``path`` as :class:`FsEntry`, or None when the path
    does not exist or is not a directory. Routed through the Hadoop FS
    of ``spark`` (or the active session) when a JVM is up; pure-``os``
    otherwise."""
    spark = spark or _jvm_spark()
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
    if not os.path.isdir(path):
        return None
    out = []
    for name in os.listdir(path):
        full = os.path.join(path, name)
        out.append(
            FsEntry(name=name, mtime=os.path.getmtime(full), is_dir=os.path.isdir(full))
        )
    return out


def exists(path: str, spark=None) -> bool:
    """Existence check through the same seam (marker files like
    ``_SUCCESS`` on any scheme)."""
    spark = spark or _jvm_spark()
    if spark is not None:
        fs, jpath = _hadoop_fs(spark, path)
        return bool(fs.exists(jpath))
    return os.path.exists(path)


def delete(path: str, spark=None) -> bool:
    """Recursive delete through the seam (Hadoop ``fs.delete(path,
    recursive=True)`` / local ``shutil.rmtree``). Returns True when
    something was removed, False when the path didn't exist — never
    raises for a missing path (retention passes re-run)."""
    spark = spark or _jvm_spark()
    if spark is not None:
        fs, jpath = _hadoop_fs(spark, path)
        return bool(fs.delete(jpath, True))
    if not os.path.exists(path):
        return False
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    else:
        os.remove(path)
    return True
