"""Hadoop/pyarrow-FileSystem-aware sidecar IO (K2 routing beyond
local paths).

The chunk tables read/write through Spark's Hadoop path layer for any
JVM-configured scheme (viewfs://, hdfs://…) — reference
src/sink.rs:108-122 S3/local duality. s3:// is special in this stack:
stock PySpark ships no hadoop-aws jar, so the JVM CANNOT serve it; all
s3 paths route through pyarrow's S3FileSystem instead (the AWS C++
SDK — the same client the PBF ranged reads use), driver-side for
sidecars and worker-side for chunk payloads (plans/pa_store.py).
Local paths keep the fast path (plus POSIX temp+rename atomicity);
JVM URI paths use create+rename; s3 writes are single-key PUTs, which
S3 makes atomic per key — no rename needed (S3 has none).
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")

#: schemes the JVM cannot serve without hadoop-aws — routed via pyarrow
PYARROW_SCHEMES = ("s3", "s3a", "s3n")


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def scheme_of(path: str) -> str | None:
    m = _SCHEME_RE.match(path)
    return path.split("://", 1)[0].lower() if m else None


def uses_pyarrow(path: str) -> bool:
    """True when the path must route through pyarrow.fs (s3 family)."""
    return scheme_of(path) in PYARROW_SCHEMES


def split_query(path: str) -> tuple[str, str]:
    """(head, query) — query keeps its '?' ('' if none). Store URIs may
    carry credentials/endpoint config in the query (the
    S3FileSystem.from_uri contract), which child-path joins must
    preserve."""
    head, sep, query = path.partition("?")
    return head, (sep + query if sep else "")


def join_uri(base: str, *parts: str) -> str:
    """Child path under a URI, preserving any ?query config."""
    head, query = split_query(base)
    return "/".join([head.rstrip("/"), *parts]) + query


def pa_fs(path: str):
    """(pyarrow FileSystem, inner path) for a URI — s3a/s3n normalize
    to s3 (pyarrow's one S3 scheme). The inner path has no query."""
    import pyarrow.fs as pafs

    uri = path
    if scheme_of(path) in ("s3a", "s3n"):
        uri = "s3://" + path.split("://", 1)[1]
    return pafs.FileSystem.from_uri(uri)


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p, jvm


def write_bytes(spark, path: str, data: bytes) -> None:
    """Atomic-ish small-file write through the Hadoop FS: write to a
    sibling temp then rename (object stores implement rename as
    copy+delete — fine at sidecar sizes). s3 routes via pyarrow: one
    PUT, atomic per key."""
    if uses_pyarrow(path):
        fs, inner = pa_fs(path)
        with fs.open_output_stream(inner) as out:
            out.write(data)
        return
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
    if uses_pyarrow(path):
        fs, inner = pa_fs(path)
        with fs.open_input_stream(inner) as f:
            return f.read()
    fs, p, jvm = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships on Spark's classpath
        arr = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(arr)


def exists(spark, path: str) -> bool:
    if uses_pyarrow(path):
        import pyarrow.fs as pafs

        fs, inner = pa_fs(path)
        return fs.get_file_info(inner).type != pafs.FileType.NotFound
    fs, p, _jvm = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def stat_file(spark, path: str) -> tuple[float, int]:
    """(mtime_seconds, size) — the one metadata round-trip an
    object-store HEAD costs."""
    if uses_pyarrow(path):
        import time

        fs, inner = pa_fs(path)
        info = fs.get_file_info(inner)
        # unknown mtime must read as YOUNG (now), never 0: vacuum's
        # orphan horizon treats 0.0 as ancient and would delete an
        # in-flight writer's not-yet-committed file
        mtime = (
            info.mtime.timestamp() if info.mtime is not None else time.time()
        )
        return mtime, int(info.size or 0)
    fs, p, _jvm = _fs_and_path(spark, path)
    st = fs.getFileStatus(p)
    return st.getModificationTime() / 1000.0, int(st.getLen())


def delete_file(spark, path: str) -> bool:
    if uses_pyarrow(path):
        fs, inner = pa_fs(path)
        fs.delete_file(inner)  # raises if missing — caller catches
        return True
    fs, p, _jvm = _fs_and_path(spark, path)
    return bool(fs.delete(p, False))


def list_files(spark, dir_path: str, suffix: str = "") -> list[str]:
    """Full child-file URIs under a directory (non-recursive), query
    config preserved so each result routes like the parent. Missing
    dir → []."""
    names: list[str] = []
    if uses_pyarrow(dir_path):
        import pyarrow.fs as pafs

        fs, inner = pa_fs(dir_path)
        try:
            infos = fs.get_file_info(
                pafs.FileSelector(
                    inner.rstrip("/"), recursive=False, allow_not_found=True
                )
            )
        except (FileNotFoundError, OSError):
            return []
        names = [
            i.path.rsplit("/", 1)[-1]
            for i in infos
            if i.type == pafs.FileType.File
        ]
    else:
        fs, p, _jvm = _fs_and_path(spark, dir_path)
        if not fs.exists(p):
            return []
        for st in fs.listStatus(p):
            if st.isFile():
                names.append(st.getPath().getName())
    return [
        join_uri(dir_path, n)
        for n in sorted(names)
        if n.endswith(suffix) and not n.startswith(".")
    ]
