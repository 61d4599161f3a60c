"""Structured Streaming → chunk store, via foreachBatch.

Each micro-batch runs the exact batch encoder (operators/encode.py)
and commits a manifest entry keyed by (snapshot_id = stream epoch), so
the encoded table stays resumable and exactly-once at the micro-batch
granularity — Spark's checkpoint dir replays failed epochs and the
manifest's read-time dedup makes replayed commits idempotent, the same
visibility rule as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.manifest import encode_job


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    num_partitions: int | None = None,
    codecs: dict[str, str] | None = None,
    trigger_once: bool = True,
):
    """Attach the encoder to a streaming DataFrame.

    num_partitions=None resolves from the store's recorded routing
    contract (or the derived default for a fresh store) inside
    encode_job — a hardcoded default here would conflict with a store
    built by a default-granularity batch encode and reject every epoch.

    Returns the StreamingQuery; caller awaits termination. Each epoch
    becomes snapshot 'epoch-{id}' in the manifest.
    """
    spark = stream_df.sparkSession

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_job(
            spark,
            batch_df,
            out_dir,
            key_col=key_col,
            num_partitions=num_partitions,
            snapshot_id=f"epoch-{epoch_id}",
            codecs=codecs,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
    num_partitions: int | None = None,
    codecs: dict[str, str] | None = None,
    snapshot_id: str = "snap-0",
    trigger_once: bool = True,
):
    """CDC apply: a change stream with an `op` column ('upsert' |
    'delete') merges into ONE logical snapshot via copy-on-write
    merge_job — re-crawls and takedowns land continuously while
    readers always see a consistent committed view (last-wins
    manifest, same visibility rule as every other writer).

    Each micro-batch is reduced to the LAST op per key BEFORE the
    merge (r3 advice: merge_job refuses a key in both its update and
    delete sets, because inside one call the upsert would silently
    win — an upsert followed by a delete of the same key in one epoch
    must delete, not resurrect). Order within a batch comes from
    ``seq_col`` (an event-time / Kafka-offset column — pass it
    whenever the source provides one); without it, source arrival
    order stands in (monotonically_increasing_id over the batch) —
    correct for single-partition feeds, best-effort across partitions
    of an unordered source, which is the strongest claim ANY consumer
    can make about cross-partition order.

    Replayed epochs re-merge the same change set; merge_job is
    idempotent for a replay because applying identical upserts/deletes
    twice reaches the same final rows (the second commit supersedes
    with identical content).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..plans.merge import merge_job

    spark = stream_df.sparkSession
    data_cols = [f.name for f in schema.fields]

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        order = (
            F.col(seq_col) if seq_col else F.monotonically_increasing_id()
        )
        w = Window.partitionBy(key_col).orderBy(F.desc("__seq__"))
        batch_df = (
            batch_df.withColumn("__seq__", order)
            .withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__seq__", "__rn__")
            .cache()
        )
        try:
            ups = batch_df.filter(F.col(op_col) == "upsert").select(*data_cols)
            dels = batch_df.filter(F.col(op_col) == "delete").select(key_col)
            merge_job(
                spark, out_dir, schema,
                updates=ups if not ups.isEmpty() else None,
                deletes=dels if not dels.isEmpty() else None,
                key_col=key_col, num_partitions=num_partitions,
                snapshot_id=snapshot_id, codecs=codecs,
            )
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
