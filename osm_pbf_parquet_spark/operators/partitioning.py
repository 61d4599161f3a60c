"""Explicit partitioning + skew salting (north_rule-mandated new work).

The reference never needed skew handling — PBF blobs are uniformly
~8 MB by construction (reference src/util.rs:81-84 sizes the read-ahead
for them). A web-pages table is the opposite: host frequency is
Zipf-like and a single pathological host can hold a double-digit
percentage of rows. A naive pmod(xxhash64(host), N) would send that
host's whole mass to one encode task.

Strategy (frequency pre-pass + round-robin salted splits):
  1. one cheap aggregation: rows per host (this is the only extra job,
     and it reads a single projected column — Catalyst prunes the scan)
  2. fanout(host) = ceil(rows / target_rows_per_partition), rounded UP
     to a multiple of N when it exceeds N; broadcast back (host-count
     tables are small: distinct hosts ≪ rows)
  3. salt = pmod(xxhash64(url), fanout)      — deterministic, resumable
     pid  = pmod(xxhash64(host) + salt, N)   — ROUND-ROBIN placement

Round-robin (r6): hashing (host, salt) placed a heavy host's fanout
groups into bins RANDOMLY — with fanout ~ tens of groups the binomial
variance left max/mean ≈ 1.8 (measured at 20k rows). Adding the salt
to the host's base hash instead makes consecutive salts hit DISTINCT
consecutive pids: a host with fanout ≤ N spreads exactly evenly over
fanout partitions, and rounding fanout to a multiple of N makes a
mega-host (the 60%-of-corpus case) spread exactly evenly over ALL N.
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
    raw = F.greatest(
        F.lit(1),
        F.ceil(F.col("count") / F.lit(target_rows_per_partition)),
    ).cast("int")
    # fanout > N rounds UP to a multiple of N so the round-robin wraps
    # a whole number of times — a mega-host spreads exactly evenly
    fanout = F.when(
        raw > num_partitions,
        (F.ceil(raw / F.lit(num_partitions)) * num_partitions).cast("int"),
    ).otherwise(raw)
    freq = host_frequencies(df, url_col).withColumn(
        "fanout", fanout
    ).select("host", "fanout")

    with_host = df.withColumn("__host__", host_col(url_col))
    joined = with_host.join(
        F.broadcast(freq), with_host["__host__"] == freq["host"], "left"
    ).drop("host")
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.coalesce(F.col("fanout"), F.lit(1)))
    # round-robin: consecutive salts land on DISTINCT consecutive pids.
    # pmod the host hash BEFORE adding the salt: raw long addition can
    # overflow Long.MAX for a host hashing near it, which under Spark
    # 4's default ANSI mode throws ARITHMETIC_OVERFLOW instead of
    # wrapping; (h mod N + salt) mod N is identical and bounded
    pid = F.pmod(
        F.pmod(F.xxhash64(F.col("__host__")), F.lit(num_partitions)) + salt,
        F.lit(num_partitions),
    )
    return joined.withColumn(PID_COL, pid.cast("long")).drop("__host__", "fanout")


def range_bounds(
    df: DataFrame,
    col: str,
    num_partitions: int = 32,
    sample_error: float = 0.01,
) -> list[float]:
    """Deduplicated approx-quantile partition boundaries for `col` —
    persist these and pass them back to range_pids so incremental
    loads of a growing table keep a STABLE value→pid mapping."""
    probs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = df.stat.approxQuantile(col, probs, sample_error)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    return uniq


def range_pids(
    df: DataFrame,
    col: str,
    num_partitions: int = 32,
    sample_error: float = 0.01,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Attach PID_COL by VALUE RANGE of `col` (approx-quantile bounds):
    globally clusters the store on that column, so zone-map pruning of
    a range predicate eliminates whole PARTITIONS, not just chunks —
    the right layout for time-series / append-mostly tables. Combine
    with encode_dataframe(sort_cols=[col]) for chunk-level clustering
    inside each partition.

    approxQuantile is one bounded-memory pass (Greenwald-Khanna); the
    boundary list (num_partitions-1 values) compiles into a CASE chain
    — no sort shuffle, unlike repartitionByRange, and the pid is a
    deterministic pure function of the value given a boundary set.
    For incremental loads of a growing table, compute `range_bounds`
    ONCE, persist it, and pass it via `bounds` on every run — the
    value→pid mapping then stays stable across runs (resumable).
    """
    if bounds is None:
        bounds = range_bounds(df, col, num_partitions, sample_error)
    pid = F.lit(0)
    for i, b in enumerate(bounds):
        pid = F.when(F.col(col) > F.lit(b), F.lit(i + 1)).otherwise(pid)
    # nulls sort first (partition 0), matching Spark's default ordering
    return df.withColumn(PID_COL, pid.cast("long"))


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
