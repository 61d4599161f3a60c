"""Hadoop-FileSystem-aware sidecar IO (K2 routing beyond local paths).

The chunk tables already read/write through Spark's Hadoop path layer,
so any configured scheme (s3a://, viewfs://, hdfs://…) routes for
free (reference src/sink.rs:108-122 S3/local duality). The tiny
driver-side sidecars (manifest parts, store_meta.json, centroids)
used local `os` IO — this module gives them the same duality: local
paths keep the fast path (plus POSIX temp+rename atomicity); URI
paths go through the JVM Hadoop FileSystem already sitting in the
SparkContext, inheriting its credentials/config. Writes on URI paths
use create(overwrite)+rename where the FS supports it.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p, jvm


def write_bytes(spark, path: str, data: bytes) -> None:
    """Atomic-ish small-file write through the Hadoop FS: write to a
    sibling temp then rename (object stores implement rename as
    copy+delete — fine at sidecar sizes)."""
    fs, p, jvm = _fs_and_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp-write")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise OSError(f"hadoop rename failed for {path}")


def read_bytes(spark, path: str) -> bytes:
    fs, p, jvm = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships on Spark's classpath
        arr = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(arr)


def exists(spark, path: str) -> bool:
    fs, p, _jvm = _fs_and_path(spark, path)
    return bool(fs.exists(p))
