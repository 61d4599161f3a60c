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
    # dot-prefixed tmp: hidden from Spark/Hadoop directory listings if
    # a crashed writer leaves it behind in a dir that's read wholesale
    head, _, tail = path.rpartition("/")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{head}/.{tail}.tmp-write")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise OSError(f"hadoop rename failed for {path}")


def write_sidecar(spark, path: str, data: bytes) -> None:
    """THE atomic small-file write for driver-side sidecars (store
    meta, manifest parts, vacuum records, centroids): local paths get
    POSIX temp+rename (tmp name carries the pid so concurrent writers
    never collide); URI paths route through the Hadoop FS. One owner
    for the atomicity rule instead of a copy per call site."""
    if has_scheme(path):
        if spark is None:
            raise ValueError("URI sidecar paths need the spark session")
        write_bytes(spark, path, data)
        return
    import os

    d, base = os.path.split(path)
    os.makedirs(d, exist_ok=True)
    # dot-prefixed tmp: a crashed writer's leftover is hidden from
    # Spark's directory listings (manifest/vacuum parts live in dirs
    # that get read wholesale)
    tmp = os.path.join(d, f".{base}.tmp-{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


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
