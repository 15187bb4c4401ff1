"""Watermarked event-time windowed aggregation — the canonical
Structured Streaming operator (readStream → watermark → window groupBy →
append), completing §2.10 alongside sessionize / dedup / near-dedup /
heavy hitters.

The batch twin is ``queries.events_tumbling_window`` (oracle-checked);
this module applies the SAME aggregation shape to an unbounded stream:
``F.window`` buckets by event time, the watermark bounds state (a window
is finalized — and its single result row emitted, append mode — once the
watermark passes its end; later-than-watermark rows are dropped, the
documented trade of bounded state for bounded lateness).

One measured subtlety (pinned by test_stream_windowed): Spark evaluates
"too late" against the watermark as of the PREVIOUS completed trigger,
so a late row arriving in the watermark-pusher's immediate next batch
still merges; the drop is guaranteed from the batch after that. Plan
ingestion lateness budgets with that one-trigger grace in mind.

At scale: one shuffle per micro-batch on (window, key) with map-side
partial aggregation; state is one row per open window×key, aged out by
the watermark — the operator's memory is O(open windows), independent of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "30 minutes",
                    ts_col: str = "ts",
                    key_col: str = "event_type") -> DataFrame:
    """(window_start, window_end, key, n_events, sum_value) per tumbling
    window of ``width``; works on a streaming OR batch DataFrame (batch
    ignores the watermark — Spark defines batch semantics as
    watermark-free, which is exactly the twin-equality test's oracle).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), width)
    return (src.groupBy(win, F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    key_col, "n_events", "sum_value"))


def stream_windowed_counts(events: DataFrame, out_table: str,
                           checkpoint: str, width: str = "1 hour",
                           watermark: str = "30 minutes"):
    """Wire the windowed aggregate to an append-mode memory sink (tests)
    — append emits each window exactly once, on finalization."""
    return (windowed_counts(events, width, watermark)
            .writeStream.format("memory").queryName(out_table)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
