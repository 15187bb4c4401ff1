"""Streaming ingest deduplication: exact-dup suppression at arrival time.

A training-data landing zone receives the same document repeatedly
(re-crawls, retried uploads, mirrored feeds); deduplicating ON INGEST
keeps every downstream consumer idempotent. Structured Streaming's
``dropDuplicates`` holds the seen-key set as managed state; the watermark
bounds that state — a duplicate arriving within ``retention`` of the
original is suppressed, older re-arrivals age out of state (the standard
bounded-state trade: exact within the horizon, at-least-once beyond it —
the batch ``exact_dedup`` operator is the end-of-day absolute pass).

Key = md5 of the content (+ any explicit id column), the same
content-address the batch dedup tier uses (operators/dedup.py), so batch
and stream agree on what "duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(docs: DataFrame, text_col: str = "text",
                 ts_col: str = "ts", retention: str = "1 hour",
                 extra_keys: list[str] | None = None) -> DataFrame:
    """streaming docs -> first-arrival-only docs.

    State per distinct content hash lives until the event-time watermark
    passes ``retention``; duplicates inside the horizon are dropped
    exactly once, state is bounded by unique-docs-per-horizon.
    """
    from pdf_parser_spark.operators.dedup import content_key

    keyed = docs.withColumn("__content_key", content_key(F.col(text_col)))
    keys = ["__content_key"] + list(extra_keys or [])
    return (keyed.withWatermark(ts_col, retention)
            .dropDuplicatesWithinWatermark(keys)
            .drop("__content_key"))
