"""Filesystem helpers routed through Hadoop FileSystem when a SparkSession
is active, so checkpoint markers / attribute sidecars / resume checks work on
HDFS, S3A, or any other scheme the cluster's Hadoop conf knows — not only the
driver-local POSIX filesystem. Falls back to plain `os` IO when no session is
up (unit tests, tools) or the JVM gateway is unreachable.

The reference keeps these concerns inside HadoopAttributeStore
(spark/.../io/hadoop/HadoopAttributeStore.scala); here every caller goes
through one tiny shim instead.
"""

from __future__ import annotations

import os
import sys


def _is_remote(path: str) -> bool:
    """True for scheme-qualified non-local paths (hdfs://, s3a://, ...)."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme not in ("", "file")


def _hadoop_fs(path: str):
    """Return (fs, jvm_path), or None when no active Spark JVM is available.

    Only falls back to driver-local `os` IO when there is genuinely no
    active session (unit tests, tools). A failing Hadoop FS call for a
    scheme-qualified path (hdfs://, s3a://) PROPAGATES — silently writing a
    checkpoint marker to a literal local './hdfs:...' directory would break
    resume across nodes while looking like success."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        if _is_remote(path):
            print(
                f"tilegrid.fsutil: no active SparkSession; falling back to "
                f"local os IO for remote-looking path {path!r}",
                file=sys.stderr,
            )
        return None
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, p
    except Exception:
        if _is_remote(path):
            raise  # never mask remote-FS failures with local writes
        print(
            f"tilegrid.fsutil: Hadoop FS unavailable for local path {path!r};"
            " falling back to os IO",
            file=sys.stderr,
        )
        return None


def exists(path: str) -> bool:
    got = _hadoop_fs(path)
    if got is None:
        return os.path.exists(path)
    fs, p = got
    return bool(fs.exists(p))


def write_text(path: str, text: str) -> None:
    got = _hadoop_fs(path)
    if got is None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        return
    fs, p = got
    out = fs.create(p, True)  # overwrite
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str) -> str:
    got = _hadoop_fs(path)
    if got is None:
        with open(path) as f:
            return f.read()
    fs, p = got
    stream = fs.open(p)
    try:
        # py4j copies byte[] buffers on the way in, so stream.read(buf)
        # can't fill a Python bytearray — drain JVM-side via commons-io
        # (bundled with Spark) and ship the result back once
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def listdir(path: str) -> list[str]:
    got = _hadoop_fs(path)
    if got is None:
        return os.listdir(path) if os.path.isdir(path) else []
    fs, p = got
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete(path: str) -> bool:
    """Recursive delete; returns True when something was removed. Routes
    through Hadoop FileSystem when a session is active (hdfs://, s3a://),
    else shutil/os."""
    got = _hadoop_fs(path)
    if got is None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path)
            return True
        if os.path.exists(path):
            os.remove(path)
            return True
        return False
    fs, p = got
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))
