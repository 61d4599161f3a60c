"""Explicit partitioning + skew salting (north_rule-mandated new work).

The reference never needed skew handling — PBF blobs are uniformly
~8 MB by construction (reference src/util.rs:81-84 sizes the read-ahead
for them). A web-pages table is the opposite: host frequency is
Zipf-like and a single pathological host can hold a double-digit
percentage of rows. A naive pmod(xxhash64(host), N) would send that
host's whole mass to one encode task.

Strategy (frequency pre-pass + salted splits):
  1. one cheap aggregation: rows per host (this is the only extra job,
     and it reads a single projected column — Catalyst prunes the scan)
  2. fanout(host) = ceil(rows / target_rows_per_partition), broadcast
     back (host-count tables are small: distinct hosts ≪ rows)
  3. salt = pmod(xxhash64(url), fanout)   — deterministic, resumable
     pid  = pmod(xxhash64(host, salt), N)

Light hosts keep fanout 1 (locality: one host → one partition, which
maximizes dictionary/FSST sharing); heavy hosts split into exactly as
many partitions as their mass requires. The whole scheme is two
deterministic column expressions — no AQE dependency, no RDDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .encode import PID_COL

HOST_EXPR = "parse_url(url, 'HOST')"


def host_col(url_col: str = "url"):
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def host_frequencies(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.select(host_col(url_col).alias("host")).groupBy("host").count()


def salted_pids(
    df: DataFrame,
    url_col: str = "url",
    num_partitions: int = 32,
    target_rows_per_partition: int | None = None,
) -> DataFrame:
    """Attach PID_COL balanced across hosts with heavy-host splitting."""
    total = df.count()
    if target_rows_per_partition is None:
        # split groups at 1/4 partition granularity: more, smaller
        # host-salt groups place far more evenly under hashing
        # (balls-into-bins variance shrinks with group count)
        target_rows_per_partition = max(1, total // (num_partitions * 4))
    freq = host_frequencies(df, url_col).withColumn(
        "fanout",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("count") / F.lit(target_rows_per_partition)),
        ).cast("int"),
    ).select("host", "fanout")

    with_host = df.withColumn("__host__", host_col(url_col))
    joined = with_host.join(
        F.broadcast(freq), with_host["__host__"] == freq["host"], "left"
    ).drop("host")
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.coalesce(F.col("fanout"), F.lit(1)))
    pid = F.pmod(F.xxhash64(F.col("__host__"), salt), F.lit(num_partitions))
    return joined.withColumn(PID_COL, pid.cast("long")).drop("__host__", "fanout")


def partition_balance(df_with_pid: DataFrame) -> dict:
    """max/mean rows per partition — the skew health metric."""
    counts = df_with_pid.groupBy(PID_COL).count()
    row = counts.agg(
        F.max("count").alias("mx"),
        F.avg("count").alias("mean"),
        F.count("*").alias("n_parts"),
    ).first()
    return {
        "max": row["mx"],
        "mean": float(row["mean"]),
        "n_partitions": row["n_parts"],
        "skew": row["mx"] / float(row["mean"]),
    }
