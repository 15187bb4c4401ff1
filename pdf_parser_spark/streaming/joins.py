"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins — the two join shapes an ingest pipeline
needs (attach dimension attributes at arrival; correlate two live event
streams within a bounded time skew).

Stream-static: the static side is broadcast per micro-batch — no state,
no watermark, the dimension is re-read so slowly-changing lookups pick
up updates between triggers.

Stream-stream: BOTH sides carry watermarks and the join predicate bounds
the event-time skew, so the state store can evict rows once the other
side's watermark passes their horizon — without the time bound the state
grows with the stream and the query is (correctly) rejected for append
mode. At scale the join shuffles both streams on the key per micro-batch
with watermark-bounded state per key: memory is O(rows within the skew
window), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_enrich(stream: DataFrame, dim: DataFrame,
                  key: str) -> DataFrame:
    """Left-join a static dimension onto a stream (broadcast per
    micro-batch; unmatched rows survive with nulls)."""
    return stream.join(F.broadcast(dim), key, "left")


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         *, left_ts: str = "ts", right_ts: str = "ts",
                         max_delay: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands in
    [left_ts, left_ts + max_delay] — the click-after-impression shape.

    Both inputs get event-time watermarks; the range predicate is what
    lets Spark bound join state (rows evict once the opposite watermark
    clears their reachable window). Right-side columns are suffixed
    ``_r`` to keep the joined schema collision-free.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = (right.withWatermark(right_ts, watermark)
          .select([F.col(c).alias(c if c == key else f"{c}_r")
                   for c in right.columns]).alias("r"))
    rt = F.col(f"r.{right_ts}_r")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (rt >= lt)
            & (rt <= lt + F.expr(f"INTERVAL {max_delay}")))
    return lw.join(rw, cond, "inner").drop(F.col(f"r.{key}"))
