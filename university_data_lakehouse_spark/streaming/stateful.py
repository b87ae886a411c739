"""Custom stateful streaming operator: per-user session accumulator
via ``applyInPandasWithState`` (SURVEY §2.9).

The streaming twin of ``operators/events.events_sessionize``: state
per user_id carries (session_start, last_ts, n_events, total_value);
a gap > SESSION_GAP_MIN minutes — or state timeout — closes the
session and emits it. This is the operator class Spark's built-ins
can't express (custom emission logic + custom state), hence the
Pandas-UDF-backed escape hatch per the build rules.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.events import SESSION_GAP_MIN

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", IntegerType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", IntegerType()),
    StructField("total_value", DoubleType()),
])

_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _to_us(ts: pd.Timestamp) -> int:
    return ts.value // 1000


def session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate events into the open session; emit closed sessions
    when a gap exceeds the threshold or the state times out."""
    (user_id,) = key
    closed: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            s, last, n, tv = state.get
            closed.append((user_id, s, last, n, tv))
            state.remove()
    else:
        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            for ts, val in zip(pdf["ts"], pdf["value"]):
                rows.append((_to_us(ts), float(val)))
        rows.sort()
        if state.exists:
            start_us, last_us, n, tv = state.get
        else:
            start_us, last_us, n, tv = None, None, 0, 0.0
        for t_us, val in rows:
            if last_us is not None and t_us - last_us > _GAP_US:
                closed.append((user_id, start_us, last_us, n, tv))
                start_us, n, tv = t_us, 0, 0.0
            if start_us is None:
                start_us = t_us
            last_us = t_us
            n += 1
            tv += val
        if start_us is not None:
            state.update((start_us, last_us, n, tv))
            state.setTimeoutDuration(SESSION_GAP_MIN * 60 * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                "n_events": [c[3] for c in closed],
                "total_value": [c[4] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Apply the stateful session operator to a streaming events DF
    (columns: user_id, ts, value)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            session_update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
