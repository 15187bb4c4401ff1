"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin is the ``events_sessionize`` query (running-sum over >gap
boundaries — SURVEY §2.3's stateful-segmentation analog); this is the
Structured-Streaming formulation with explicit per-key state:

- state per ``user_id``: the open session (start ts, last ts, event count);
- each micro-batch folds its events into the open session, splitting
  whenever the gap between consecutive events exceeds ``gap_sec`` —
  fully-closed sessions are emitted immediately;
- the still-open session is held in state with an EVENT-TIME TIMEOUT at
  ``last_ts + gap_sec``: when the watermark passes it, the session closes
  and is emitted. Late events beyond the watermark are dropped by the
  watermark itself (north-rule late-data handling).

At 10^12 events this runs with bounded state (one small tuple per active
user) and shuffles each batch once on user_id — the same partitioning
contract as every other operator in this engine.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType, TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", IntegerType()),
])

# state: (start_epoch_us, last_epoch_us, n_events)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", IntegerType()),
])


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us: int) -> _dt.datetime:
    return pd.Timestamp(us * 1000).to_pydatetime()


def make_sessionize_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((user_id, _ts(start_us), _ts(last_us), int(n)))
                state.remove()
            if closed:
                yield pd.DataFrame(closed, columns=[f.name for f in
                                                    SESSION_SCHEMA.fields])
            return

        times: list[int] = []
        for pdf in pdfs:
            times.extend(_us(t) for t in pdf["ts"])
        times.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = times[0], times[0], 0

        for t in times:
            if n > 0 and t <= last_us:
                # admitted LATE event (within the configured watermark):
                # merge into the open session with min(start)/max(last)
                # semantics — it must never regress session_end or feed the
                # gap check (exact as long as watermark <= gap_sec, the
                # sane configuration; beyond that a very-late event merges
                # instead of forming its own session, documented).
                start_us = min(start_us, t)
                n += 1
                continue
            if n > 0 and t - last_us > gap_us:
                closed.append((user_id, _ts(start_us), _ts(last_us), int(n)))
                start_us, n = t, 0
            last_us = t
            n += 1

        state.update((start_us, last_us, n))
        # close the open session when the watermark passes last + gap;
        # clamp above the current watermark — Spark rejects a timeout at or
        # below it (can only bind when a group sees exclusively-late input,
        # but the failure mode there is a dead streaming query)
        timeout_ms = (last_us + gap_us) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in
                                                SESSION_SCHEMA.fields])

    return fn


def stream_sessionize(events: DataFrame, gap_sec: int = 1800,
                      watermark: str = "0 seconds") -> DataFrame:
    """events (streaming, with ``user_id``/``ts``) -> closed sessions.

    ``watermark`` is the out-of-order admission window: events later than
    it are dropped by Spark before the state fold; events within it merge
    into the open session (min-start/max-last — see the fold). Keep
    watermark <= gap_sec for exact gap semantics.
    """
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                make_sessionize_fn(gap_sec),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
