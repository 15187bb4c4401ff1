"""Watermarked tumbling-window aggregation: append-mode finalization,
late-row drop, and batch-twin agreement."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.streaming.windowed import (stream_windowed_counts,
                                                 windowed_counts)

T0 = dt.datetime(2026, 1, 1)


def _write(path, rows, mtime=None):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "event_type",
                                     "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    if mtime is not None:
        # the file source orders micro-batches by mtime; same-second
        # writes collapse the order, so pin it
        import os
        os.utime(path, (mtime, mtime))


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_windowed_counts_finalization_and_late_drop(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    # batch 1: three rows in window [0, 3600)
    _write(str(inp / "f1.parquet"), mtime=1_000_000, rows=[
        ("e1", _sec(100), "x", 1.0),
        ("e2", _sec(200), "x", 2.0),
        ("e3", _sec(300), "y", 3.0),
    ])
    # batch 2: e4 lands in the SAME window (watermark still at batch-1
    # horizon, so it's admitted and merged); e5 pushes the watermark to
    # 10000 - 1800 = 8200s, finalizing [0, 3600)
    _write(str(inp / "f2.parquet"), mtime=1_000_100, rows=[
        ("e4", _sec(1000), "x", 4.0),
        ("e5", _sec(10_000), "y", 5.0),
    ])
    # batch 3: on-time spacer. Spark evaluates "too late" against the
    # watermark as of the PREVIOUS completed trigger (one-trigger
    # admission lag — measured: a late row in the pusher's immediate
    # next batch still merges), so the drop is proven one batch later
    _write(str(inp / "f3.parquet"), mtime=1_000_200, rows=[
        ("e7", _sec(11_000), "y", 6.0),
    ])
    # batch 4: far older than the watermark -> dropped, not merged
    _write(str(inp / "f4.parquet"), mtime=1_000_300, rows=[
        ("e6", _sec(50), "x", 99.0),
    ])
    stream = (spark.readStream
              .schema("event_id string, ts timestamp, event_type string,"
                      " value double")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = stream_windowed_counts(stream, "winagg",
                               str(tmp_path / "ckpt"),
                               width="1 hour", watermark="30 minutes")
    q.awaitTermination(180)
    assert not q.isActive
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.sql("select * from winagg").collect()}
    # append mode emits ONLY the finalized window: e4 merged, e6 dropped
    # (its window was already evicted and its ts is behind the
    # watermark), e5/e7's windows still open (never finalized, never
    # emitted)
    assert got == {(_sec(0), "x"): (3, 7.0),
                   (_sec(0), "y"): (1, 3.0)}
    # the drop actually happened in the engine, not by accident of
    # emission timing
    dropped = sum(so.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress
                  for so in p.get("stateOperators", []))
    assert dropped == 1


def test_windowed_counts_batch_twin(spark, tmp_path):
    """The same function on a bounded DataFrame is the watermark-free
    oracle: every window present, late rows included (batch has no
    arrival order)."""
    p = str(tmp_path / "ev.parquet")
    _write(p, [
        ("e1", _sec(100), "x", 1.0),
        ("e2", _sec(1000), "x", 4.0),
        ("e5", _sec(10_000), "y", 5.0),
    ])
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in windowed_counts(
               spark.read.parquet(p), width="1 hour").collect()}
    assert got == {(_sec(0), "x"): (2, 5.0),
                   (_sec(7200), "y"): (1, 5.0)}
