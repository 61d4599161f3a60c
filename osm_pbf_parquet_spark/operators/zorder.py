"""Z-order (Morton) clustering for multi-column zone-map pruning.

`sort_cols` clusters chunks on ONE column; a store queried by several
dimensions (time AND host, custkey AND price) needs a space-filling
curve so chunk zone maps are selective on every participating column
at once — the layout Delta Lake's OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrite produce.

Implementation is rank-based, like Delta's: each column is bucketed
into 2^bits quantile buckets (skew-robust — equal row mass per bucket,
not equal value width), the bucket ids' bits are interleaved into one
Morton value, and the store is range-laid-out + sorted on that value.
Everything is built-in Catalyst expressions:

  bucket  = aggregate(boundaries, 0, acc + (col >= b))   -- JVM lambda
  zvalue  = OR over bit positions of shifted bucket bits

so the hot path stays whole-stage-JVM with zero Python. Boundary
lists (2^bits - 1 doubles per column, driver-side, bounded) are
computed once with approxQuantile (Greenwald-Khanna, one pass) and can
be persisted and re-passed for stable incremental loads — the same
resumability contract as partitioning.range_pids.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import PID_COL, range_pids

ZVAL_COL = "__zval__"


def quantile_bounds(
    df: DataFrame, cols: list[str], bits: int = 8, sample_error: float = 0.01
) -> dict[str, list[float]]:
    """Per-column quantile cut points (2^bits - 1 each), one
    bounded-memory pass over the data per approxQuantile call.
    Timestamps/dates are bucketed on their numeric cast."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    out: dict[str, list[float]] = {}
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    for c in cols:
        out[c] = casted.approxQuantile(c, probs, sample_error)
    return out


def _bucket_expr(col: str, boundaries: list[float]) -> F.Column:
    """bucket(col) = #boundaries strictly below the value — a JVM
    higher-order aggregate over the broadcast boundary array (O(2^bits)
    adds per row, no Python, no shuffle). Nulls land in bucket 0."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
    )


def zvalue(df: DataFrame, bounds: dict[str, list[float]], bits: int = 8) -> F.Column:
    """Morton-interleave the rank buckets of every column in `bounds`.

    Column i contributes bit b of its bucket to z-bit (b * n_cols + i),
    so all columns share selectivity equally down the curve.
    """
    cols = sorted(bounds)  # deterministic bit assignment
    n = len(cols)
    pieces = []
    for i, c in enumerate(cols):
        bucket = _bucket_expr(c, bounds[c]).cast("long")
        for b in range(bits):
            pieces.append(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return reduce(lambda a, x: a.bitwiseOR(x), pieces).alias(ZVAL_COL)


def zorder_pids(
    df: DataFrame,
    cols: list[str],
    num_partitions: int = 32,
    bits: int = 8,
    bounds: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Attach PID_COL + ZVAL_COL for a z-ordered store layout: range
    partitions over the Morton value, to be combined with
    encode_dataframe(sort_cols=[ZVAL_COL]) so both the partition layout
    AND the chunk order follow the curve — zone maps then prune on
    every z-ordered column. Pass persisted `bounds` for stable pids
    across incremental runs."""
    if bounds is None:
        bounds = quantile_bounds(df, cols, bits)
    with_z = df.withColumn(ZVAL_COL, zvalue(df, bounds, bits))
    return range_pids(with_z, ZVAL_COL, num_partitions)


def encode_zordered(
    df: DataFrame,
    cols: list[str],
    num_partitions: int = 32,
    bits: int = 8,
    bounds: dict[str, list[float]] | None = None,
    **encode_kwargs,
) -> DataFrame:
    """Z-ordered encode: layout + chunk sort on the Morton value.
    ZVAL_COL rides through the exchange for the within-partition sort
    but is a layout helper — the encode fn drops it (with PID_COL)
    before any payload is built, so decode returns the source schema
    and bytes_in counts only real data."""
    from .encode import encode_dataframe

    laid_out = zorder_pids(df, cols, num_partitions, bits, bounds)
    return encode_dataframe(
        laid_out,
        num_partitions=num_partitions,
        sort_cols=[ZVAL_COL],
        **encode_kwargs,
    )
