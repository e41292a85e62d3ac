"""Stateful streaming sessionization via applyInPandasWithState.

The batch engine gates gap-based sessionization (queries.sessionize,
window-function formulation).  This is its streaming twin: a custom
stateful operator the reference has no analog for (SURVEY §2.10 —
osm2pgsql has no event-time streaming at all), built the way Spark
Structured Streaming wants custom state handled: per-key Arrow
batches + an explicit GroupState, event-time timeout driven by the
watermark.

Semantics per user_id:
- events extend the current session while the gap to the previous
  event is <= gap_us; a larger gap CLOSES the running session (it is
  emitted) and starts a new one;
- when the watermark passes last_ts + gap_us without new events the
  open session times out and is emitted (the streaming replacement
  for "end of input" in batch).

At scale: state is one small tuple per active user, partitioned by
the groupBy key — no shuffle beyond the keyed exchange, no growth
with history length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        for ts_us in rows["ts_us"]:
            t = int(ts_us)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                # out-of-order events above the watermark fold INTO the
                # open session; never move its bounds backwards
                start = min(start, t)
                last = max(last, t)
                n += 1

        wm_ms = state.getCurrentWatermarkMs()
        end_ms = last // 1000 + gap_us // 1000
        if end_ms <= wm_ms:
            # the watermark already passed the open session's horizon:
            # close it now instead of waiting for a timeout trigger
            closed.append((user_id, start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            # time the open session out once the watermark passes
            # last+gap (timeout must be strictly beyond the watermark)
            state.setTimeoutTimestamp(max(end_ms, wm_ms + 1))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )

    return fn


def sessionize_stream(
    events: DataFrame, gap_us: int = 30 * 60 * 1_000_000, watermark: str = "1 hour"
) -> DataFrame:
    """events: streaming DataFrame with (event_id, ts, user_id, ...).
    Returns a streaming DataFrame of CLOSED sessions."""
    prepared = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            "event_id",
            (F.col("ts").cast("double") * 1_000_000).cast("long").alias("ts_us"),
            F.col("ts"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
