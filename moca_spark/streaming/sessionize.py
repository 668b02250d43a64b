"""Custom stateful streaming operator: event sessionization via
``applyInPandasWithState``.

The reference's stateful per-entity processing is its persistent
actors (one Minion per task replaying its journal,
role/worker/Minion.scala:46-66). The Structured-Streaming-native
equivalent for custom per-key state is ``applyInPandasWithState``:
state lives in the state store (checkpointed, exactly-once), the
function sees each key's Arrow batch + its state handle.

Sessionization: events of a user belong to one session while gaps stay
under ``gap_s``; a session closes when the processing-timeout fires
(no events for the key) or a larger gap arrives in-batch. Emits
closed sessions (user_id, session_start, session_end, n_events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", IntegerType()),
])

# state: (session_start_epoch_us, last_event_epoch_us, n_events)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", IntegerType()),
])


def make_sessionizer(gap_s: int = 1800):
    gap_us = gap_s * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
                )
            ts_list.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = ts_list[0]
                n = 0
            for t_us in ts_list:
                if t_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n))
                    start_us, n = t_us, 0
                last_us = t_us
                n += 1
            state.update((start_us, last_us, n))
            state.setTimeoutDuration(gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                [
                    (u, pd.Timestamp(s * 1000, unit="ns"),
                     pd.Timestamp(e * 1000, unit="ns"), n)
                    for u, s, e, n in closed
                ],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return sessionize


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events: streaming DF with (user_id long, ts timestamp, ...)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_s),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
