"""Source routing (reference S1/S2: URL-parse dispatch between S3 and
local filesystem, src/pbf.rs:22-43 and src/sink.rs:108-122).

Spark's DataSource API already routes s3a://, file://, hdfs:// URIs
through Hadoop FileSystems with ranged reads, so the reference's two
hand-written readers collapse into one call. The Iceberg path uses the
`iceberg` format when the runtime is on the classpath (the north-rule
deployment target); this sandbox has no Iceberg jar, so the fallback
reads the same data as plain parquet — identical downstream semantics,
minus snapshot metadata (our manifest layer supplies lineage instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_source(
    spark: SparkSession,
    location: str,
    fmt: str | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read an input table from any supported location.

    fmt=None auto-detects: catalog table names (no '/' and no scheme)
    → iceberg/catalog table; paths/URIs → parquet.
    """
    if fmt == "iceberg" or (fmt is None and "/" not in location and "://" not in location):
        try:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            return reader.load(location)
        except Exception as e:  # noqa: BLE001
            # fall back ONLY when the Iceberg runtime itself is absent
            # (this sandbox); real catalog errors (auth, missing table)
            # must surface, not turn into a misleading parquet-path error
            msg = str(e)
            missing_runtime = (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find data source" in msg
                or "ClassNotFoundException" in msg
            )
            if fmt == "iceberg" or not missing_runtime:
                raise
    return spark.read.parquet(location)
