"""Streaming ingest dedup: cross-batch duplicate suppression with bounded
(watermark-aged) state."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.streaming.dedupe import stream_dedup

T0 = dt.datetime(2026, 1, 1)


def _write(path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    _write(str(inp / "f1.parquet"), [
        ("a1", "alpha doc", _sec(0)),
        ("a2", "alpha doc", _sec(10)),      # in-batch duplicate
        ("b1", "beta doc", _sec(20)),
    ])
    _write(str(inp / "f2.parquet"), [
        ("a3", "alpha doc", _sec(100)),     # cross-batch dup (in horizon)
        ("c1", "gamma doc", _sec(120)),
    ])
    _write(str(inp / "f3.parquet"), [
        ("w", "watermark pusher", _sec(10_000)),
    ])

    stream = (spark.readStream
              .schema("doc_id string, text string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = (stream_dedup(stream, retention="1 hour")
         .writeStream.format("memory").queryName("deduped")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert not q.isActive
    got = {r.doc_id for r in spark.sql("select * from deduped").collect()}
    # exactly one survivor per distinct content, first arrival wins
    assert got == {"a1", "b1", "c1", "w"}


def test_stream_heavy_hitter_candidates(spark, tmp_path):
    """Cross-batch Misra-Gries state: the skewed value must survive both
    triggers with a sound lower bound, state stays capacity-bounded, and
    every value whose global frequency clears the per-shard guarantee
    threshold is in the final candidate set."""
    from pdf_parser_spark.streaming.heavyhitters import (
        stream_heavy_hitter_candidates)

    inp = tmp_path / "vals"
    inp.mkdir()

    def _writev(path, values):
        df = pd.DataFrame({"term": values})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)

    # batch 1: 'hot' x 60 + 30 singletons; batch 2: 'hot' x 40 + 'warm' x 25
    _writev(str(inp / "b1.parquet"),
            ["hot"] * 60 + [f"u{i}" for i in range(30)])
    _writev(str(inp / "b2.parquet"),
            ["hot"] * 40 + ["warm"] * 25 + [f"v{i}" for i in range(10)])

    stream = (spark.readStream.schema("term string")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = (stream_heavy_hitter_candidates(stream, "term", capacity=8,
                                        n_shards=2)
         .writeStream.format("memory").queryName("hh")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert not q.isActive

    rows = spark.sql("select * from hh").collect()
    # final summary per shard = the emission with that shard's max n_seen
    finals = {}
    for r in rows:
        m = max(x.n_seen for x in rows if x.shard == r.shard)
        if r.n_seen == m:
            finals.setdefault(r.shard, {})[r.value] = r.weight_lb
    merged = {v: lb for d in finals.values() for v, lb in d.items()}
    # the guarantee: 'hot' (100 occurrences, shard n <= 165, cap 8 ->
    # threshold <= 165/9 = 18.3) must be a candidate; 'warm' (25) too
    assert "hot" in merged and "warm" in merged
    # MG weights are lower bounds on true counts
    assert merged["hot"] <= 100 and merged["warm"] <= 25
    # cross-batch state: hot's bound grew beyond anything batch 2 alone
    # could justify (40), proving batch-1 state carried over
    assert merged["hot"] > 40
    # capacity bound per shard
    assert all(len(d) <= 8 for d in finals.values())
