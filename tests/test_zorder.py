"""Z-order layout: multi-column zone-map pruning + bit-identity.

sort_cols covers one dimension (test_pruning); a Morton layout must
make chunk zone maps selective on BOTH participating columns at once,
while decode stays bit-identical (the helper z-value never enters the
payload).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_parquet_spark.operators.encode import decode_dataframe
from osm_pbf_parquet_spark.operators.pruning import prune_by_range
from osm_pbf_parquet_spark.operators.zorder import (
    ZVAL_COL,
    encode_zordered,
    quantile_bounds,
    zvalue,
)

N_PARTS = 8
CHUNK = 32 << 10


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_zvalue_interleave_is_deterministic(spark):
    df = spark.createDataFrame(
        [(float(i), float(100 - i)) for i in range(100)], ["a", "b"]
    )
    bounds = quantile_bounds(df, ["a", "b"], bits=4)
    z1 = df.withColumn(ZVAL_COL, zvalue(df, bounds, bits=4))
    z2 = df.withColumn(ZVAL_COL, zvalue(df, bounds, bits=4))
    assert z1.exceptAll(z2).isEmpty()
    # 4 bits x 2 cols -> z in [0, 255]
    mx = z1.agg(F.max(ZVAL_COL)).first()[0]
    assert 0 < mx < 256


def test_zorder_roundtrip_bit_identical(spark, sf_dir):
    ev = _events(spark, sf_dir)
    chunks = encode_zordered(
        ev, ["user_id", "value"], num_partitions=N_PARTS,
        target_chunk_bytes=CHUNK,
    )
    assert chunks.filter(F.col("column") == ZVAL_COL).count() == 0, (
        "layout helper must not be encoded"
    )
    dec = decode_dataframe(chunks, ev.schema)
    assert dec.count() == ev.count()
    cols = [c for c in ev.columns if c != "event_id"]
    joined = ev.alias("a").join(dec.alias("b"), "event_id")
    ok = joined.filter(
        F.expr(" AND ".join(f"a.{c} <=> b.{c}" for c in cols))
    ).count()
    assert ok == ev.count()


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    ev = _events(spark, sf_dir).cache()
    z_chunks = encode_zordered(
        ev, ["user_id", "value"], num_partitions=N_PARTS,
        target_chunk_bytes=CHUNK,
    ).cache()

    groups = z_chunks.select("partition_id", "chunk_seq").distinct().count()

    u_lo, u_hi, v_lo, v_hi = 100, 200, 10.0, 20.0
    kept = prune_by_range(
        prune_by_range(z_chunks, "user_id", lower=u_lo, upper=u_hi),
        "value", lower=v_lo, upper=v_hi,
    ).cache()
    kept_groups = kept.select("partition_id", "chunk_seq").distinct().count()
    assert kept_groups < groups, (
        f"z-order pruning kept all {groups} chunk groups — zone maps "
        "are not selective"
    )

    got = (
        decode_dataframe(kept, ev.schema)
        .filter(
            (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
            & (F.col("value") >= v_lo) & (F.col("value") <= v_hi)
        )
    )
    want = ev.filter(
        (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
        & (F.col("value") >= v_lo) & (F.col("value") <= v_hi)
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_zorder_beats_single_sort_on_second_dim(spark, sf_dir):
    """A store sorted only on user_id cannot prune a value-only
    predicate; the z-ordered store must."""
    from osm_pbf_parquet_spark.operators.encode import encode_dataframe

    ev = _events(spark, sf_dir).cache()
    single = encode_dataframe(
        ev, key_col="event_id", num_partitions=N_PARTS,
        target_chunk_bytes=CHUNK, sort_cols=["user_id"],
    ).cache()
    zord = encode_zordered(
        ev, ["user_id", "value"], num_partitions=N_PARTS,
        target_chunk_bytes=CHUNK,
    ).cache()

    def kept_frac(chunks):
        total = chunks.select("partition_id", "chunk_seq").distinct().count()
        kept = (
            prune_by_range(chunks, "value", lower=10.0, upper=12.0)
            .select("partition_id", "chunk_seq").distinct().count()
        )
        return kept / total

    assert kept_frac(zord) < kept_frac(single), (
        "z-order should prune a second-dimension predicate better than "
        "a single-column sort layout"
    )
