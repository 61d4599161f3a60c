"""Watermarked windowed aggregation + applyInPandasWithState
sessionization: the streaming twins of events_hourly / sessionize_events
(late-data correctness and bounded state are the 100 TB concerns)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Two chronological parquet files (maxFilesPerTrigger=1 feeds them
    as separate micro-batches so the watermark actually advances —
    a single availableNow batch would finalize nothing in append mode)."""
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for user in range(3):
        for sess in range(3):  # 3 sessions per user, 2h apart
            t0 = base + pd.Timedelta(hours=3 * sess, minutes=7 * user)
            for i in range(4):  # events 5 min apart (< 30 min gap)
                rows.append((user, t0 + pd.Timedelta(minutes=5 * i), 1.5 * i))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"]).sort_values("ts")
    # µs precision: Spark 4 reads pandas' default ns-INT64 parquet
    # timestamps as plain INT64, not timestamp (CLAUDE.md gotcha)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("stream_events")
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(d / "part1.parquet", index=False)
    pdf.iloc[half:].to_parquet(d / "part2.parquet", index=False)
    return str(d), pdf


def _run_stream(spark, src_dir, build, sink_name):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # parquet naive timestamps surface as TIMESTAMP_NTZ under Spark 4;
    # cast to session-tz timestamp (UTC) for watermarks/windows
    schema = "user_id long, ts timestamp_ntz, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink_name}")


def test_windowed_agg_matches_batch_for_finalized_windows(spark, event_stream_dir):
    from osm_pbf_parquet_spark.streaming.aggregates import windowed_agg

    src_dir, pdf = event_stream_dir
    got = _run_stream(
        spark, src_dir,
        lambda s: windowed_agg(s, watermark="0 seconds"),
        "win_sink",
    ).collect()
    assert got, "no windows finalized — watermark never advanced"
    batch = (
        spark.createDataFrame(pdf)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
        .collect()
    )
    batch_by_start = {r["window_start"]: (r["n"], r["total"]) for r in batch}
    for r in got:  # every emitted window must equal its batch twin
        assert batch_by_start[r["window_start"]] == (r["n"], r["total"])


def test_sessionize_stream_matches_batch_sessions(spark, event_stream_dir):
    from osm_pbf_parquet_spark.streaming.aggregates import sessionize_stream

    src_dir, pdf = event_stream_dir
    got = _run_stream(
        spark, src_dir,
        lambda s: sessionize_stream(s, gap_minutes=30, watermark="0 seconds"),
        "sess_sink",
    ).collect()
    assert got, "no sessions emitted"
    # batch twin: every (user, session_start) group of the synthetic data
    # is a 4-event session with cents = floor(1.5*100*(0+1+2+3)) = 900
    emitted = {(r["user_id"], r["session_start"]) for r in got}
    assert len(emitted) == len(got), "duplicate session emitted"
    for r in got:
        assert r["n_events"] == 4 and r["value_cents"] == 900
    # sessions from the first file's time range must have closed
    assert len(got) >= 3
