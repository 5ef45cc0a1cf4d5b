"""Filesystem IO that works on local paths AND Hadoop-FileSystem URIs.

Index METADATA (stats.json, `_checkpoints/` manifests, `_metrics/`,
`_norms_stats/`, `_ann_meta.json`) must live NEXT TO the parquet data it
describes: on a cluster the index dir is `hdfs:///...` / `s3a://...`, and
plain ``open()``/``os.listdir`` would silently write the metadata into a
local ``hdfs:`` directory on the driver — resume would break and
``IndexHandle.open`` on any other node would fail.  Every metadata
read/write/list/delete therefore funnels through this module:

* scheme-less path → plain-Python fast path (zero JVM round-trips; the
  local-mode hot path is unchanged);
* URI path (anything matching ``scheme://`` or ``scheme:/``) → the JVM's
  ``org.apache.hadoop.fs.FileSystem`` resolved through the ACTIVE
  SparkSession's gateway with the session's own Hadoop configuration, i.e.
  the exact same filesystem the parquet writers use.

``file:/...`` URIs take the Hadoop branch too — which is how the test
suite exercises the remote code path without a real HDFS cluster.
"""

from __future__ import annotations

import json
import os
import re
import shutil

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:/")


def is_remote(path: str) -> bool:
    """True when ``path`` is a filesystem URI that must go through the
    Hadoop FileSystem API (hdfs://, s3a://, gs://, file:/, ...)."""
    return bool(_URI_RE.match(path))


def _jvm_fs(path: str):
    """(FileSystem, Path) for a URI path, from the active SparkSession."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve remote path {path!r}; "
            "create the session before touching URI-scheme index metadata"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return fs, jpath


def write_json(path: str, obj: dict) -> None:
    """Atomic-publish JSON: write ``path + '.tmp'`` then rename over the
    destination (checkpoint manifests rely on never seeing a torn file)."""
    if not is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return
    fs, dest = _jvm_fs(path)
    parent = dest.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    tmp = dest.suffix(".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj, indent=1, sort_keys=True).encode()))
    finally:
        out.close()
    # Publish via FileContext.rename(..., Rename.OVERWRITE): a single
    # atomic metadata op on HDFS-like filesystems — a concurrent reader
    # sees the old complete file or the new complete file, never a torn
    # write and never a missing path.  (FileSystem.rename won't clobber,
    # and delete-then-rename opens a window where the destination is
    # absent and read_json returns None → resume would redo work.)
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dest.toUri(), hconf
        )
        ren = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        ren[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, dest, ren)
        return
    except Exception:
        # Fallback for filesystems without a FileContext implementation
        # (AbstractFileSystem unregistered for the scheme, e.g. some
        # object-store connectors). Delete-then-rename is NOT atomic: a
        # concurrent reader can observe the destination missing between
        # the two ops.  Single-writer builds (the actual usage — one
        # driver owns an index dir) are unaffected; rename failure is
        # checked so a lost publish can never pass silently.
        pass
    if fs.exists(dest):
        fs.delete(dest, False)
    if not fs.rename(tmp, dest):
        raise RuntimeError(
            f"metadata publish failed: rename({tmp}, {dest}) returned false; "
            "the previous manifest was deleted — rebuild or re-run the write"
        )


def read_json(path: str) -> dict | None:
    if not is_remote(path):
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
    fs, p = _jvm_fs(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode())


def listdir(path: str) -> list[str]:
    """Child names of a directory (like os.listdir, sorted)."""
    if not is_remote(path):
        return sorted(os.listdir(path))
    fs, p = _jvm_fs(path)
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def isdir(path: str) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    fs, p = _jvm_fs(path)
    try:
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())
    except Exception:
        return False


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, p = _jvm_fs(path)
    return bool(fs.exists(p))


def rmtree(path: str) -> None:
    """Recursive delete, ignore-missing (shutil.rmtree(ignore_errors=True))."""
    if not is_remote(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, p = _jvm_fs(path)
    try:
        fs.delete(p, True)
    except Exception:
        pass
