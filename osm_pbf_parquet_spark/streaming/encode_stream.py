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
    num_partitions: int = 32,
    codecs: dict[str, str] | None = None,
    trigger_once: bool = True,
):
    """Attach the encoder to a streaming DataFrame.

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
