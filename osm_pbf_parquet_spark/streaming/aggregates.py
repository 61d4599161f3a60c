"""Structured Streaming analytics: watermarked windowed aggregation and
custom stateful sessionization.

Two canonical late-data-correct streaming shapes over an event stream
(ts, user_id, value):

* `windowed_agg` — tumbling-window counts/sums with a watermark: late
  events inside the watermark still update their window; events later
  than the watermark are dropped and the window's state is evicted
  (bounded state at 100 TB/day stream rates). Append output mode emits
  each window exactly once, when it finalizes.

* `sessionize_stream` — gap-based sessions via
  `applyInPandasWithState` (the custom-stateful-operator escape hatch):
  per-user state carries the open session's (start, last_ts, n, sum);
  an event > gap after last_ts closes the session and emits it; an
  EventTimeTimeout fires after the watermark passes last_ts + gap so
  idle users' sessions close WITHOUT requiring another event (state is
  then freed — the unbounded-key case stays bounded).

Batch twins: `__spark_entry__.events_hourly` / `sessionize_events` are
the bounded-batch faces of these plans (same window/gap semantics), so
the streaming operators inherit their oracle checks at batch parity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def windowed_agg(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum with late-data watermark (append mode
    emits a window once, when the watermark passes its end)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


def _session_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, _last, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "n_events": [n],
                    "value_cents": [cents],
                }
            )
            return
        import numpy as np

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        # floor (not truncate) matches the batch twin's integer cents
        cents_col = np.floor(rows["value"].fillna(0) * 100).astype("int64")
        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us = last_us = n = cents = None
        out: dict[str, list] = {
            "user_id": [], "session_start": [], "n_events": [], "value_cents": []
        }
        for t, c in zip(ts_us.tolist(), cents_col.tolist()):
            if start_us is None:
                start_us, last_us, n, cents = t, t, 1, c
            elif t - last_us > gap_us:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["n_events"].append(n)
                out["value_cents"].append(cents)
                start_us, last_us, n, cents = t, t, 1, c
            else:
                # a late in-watermark event must never move the session
                # window BACKWARD (it would prematurely split the next
                # gap and shrink the idle timeout); it may extend the
                # start earlier — merging into the open session is the
                # standard streaming approximation for cross-batch lates
                start_us = min(start_us, t)
                last_us, n, cents = max(last_us, t), n + 1, cents + c
        state.update((int(start_us), int(last_us), int(n), int(cents)))
        # close the open session once the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization with per-user state and event-time
    timeouts — the streaming twin of the batch lag+cumsum plan."""
    gap_us = gap_minutes * 60 * 1_000_000
    src = stream_df.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
