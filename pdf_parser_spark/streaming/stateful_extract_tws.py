"""Stateful streaming extraction on Spark 4's ``transformWithStateInPandas``
— the forward-looking twin of ``stateful_extract.py``.

Same operator, same exactness contract (cumulative stream output ==
batch ``extract_chunks`` under arbitrary inter-batch splits/reorders of a
conversation's turns), rebuilt on the new arbitrary-state API that
supersedes ``applyInPandasWithState``:

- the three index counters live in a typed ``ValueState`` and the reorder
  buffer in a native ``MapState`` keyed by turn_idx — no JSON round-trip,
  and a buffered out-of-order turn is touched exactly once on write and
  once on pop instead of riding every state update;
- state TTL is a FIRST-CLASS state property (``ttlDurationMs``) enforced
  by the store itself, decoupled from timers — so unlike the
  applyInPandasWithState version, an idle-conversation TTL is safe under
  ``availableNow`` drains (no processing-time timer exists to keep the
  drain alive; expired state is simply absent on next read);
- ``transformWithState`` requires the RocksDB state store provider;
  :func:`stream_extract_tws` sets it on the session before starting the
  query (a per-query setting does not exist).

The extraction fold is shared verbatim (``stateful_extract._fold_turn``),
so per-row semantics cannot diverge between the two APIs; equality of the
two streaming renditions AND of each against batch is pinned in
tests/test_stream_stateful_extract.py.

Reference analog: none (the reference is single-process batch,
process_gea_pdfs.py:233-298); this is north-rule streaming surface.

ENVIRONMENT GATE: transformWithState's Python<->JVM state protocol is
protobuf-encoded (pyspark/sql/streaming/proto/StateMessage_pb2), so it
requires the ``protobuf`` package at RUNTIME — absent in this sandbox
(pip index unreachable; attempt dated 2026-08-21 in BASELINE.md). The
equality test skips on ``importorskip("google.protobuf")`` and has
therefore never run here; the applyInPandasWithState rendition
(stateful_extract.py) is the fully-exercised path. The import error the
gate prevents surfaces otherwise as an opaque "driver worker exited
unexpectedly (crashed)" at query start.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (StatefulProcessor,
                                                      StatefulProcessorHandle)

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.operators.merge import CHUNK_FIELDS, CHUNK_SCHEMA
from pdf_parser_spark.streaming.incremental import TRANSCRIPT_DDL
from pdf_parser_spark.streaming.stateful_extract import _fold_turn

_CHUNK_COLS = [f.name for f in CHUNK_FIELDS]

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")


class ExtractProcessor(StatefulProcessor):
    """Per-conversation fold: counters in ValueState, reorder buffer in
    MapState; turns fold strictly in turn_idx order (contiguity from 0)."""

    def __init__(self, cfg: ExtractionConfig, ttl_sec: int | None = None):
        if cfg.clean_boilerplate:
            raise ValueError(
                "clean_boilerplate is conversation-global (the repeated-"
                "line miner needs every turn); use the batch pipeline")
        self._cfg = cfg
        self._ttl_ms = None if ttl_sec is None else ttl_sec * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getValueState(
            "counters", "next_turn long, next_chunk long, next_off long",
            ttlDurationMs=self._ttl_ms)
        self._pending = handle.getMapState(
            "pending", "turn_idx int", "text string, tool string",
            ttlDurationMs=self._ttl_ms)

    def handleInputRows(self, key: Any, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if self._counters.exists():
            next_turn, next_chunk, next_off = self._counters.get()
        else:
            next_turn, next_chunk, next_off = 0, 0, 0

        arrived: dict[int, tuple] = {}
        for pdf in rows:
            for t_idx, text, tool in zip(pdf["turn_idx"].tolist(),
                                         pdf["text"].tolist(),
                                         pdf["tool"].tolist()):
                t_idx = int(t_idx)
                if t_idx >= next_turn and t_idx not in arrived:
                    arrived[t_idx] = (None if text is None else str(text),
                                      None if tool is None else str(tool))

        out: list[tuple] = []

        def pop(t: int) -> tuple | None:
            if t in arrived:
                return arrived.pop(t)
            if self._pending.containsKey((t,)):
                v = self._pending.getValue((t,))
                self._pending.removeKey((t,))
                return (v[0], v[1])
            return None

        while True:
            nxt = pop(next_turn)
            if nxt is None:
                break
            next_chunk, next_off = _fold_turn(
                conv_id, next_turn, nxt[0], nxt[1], self._cfg,
                next_chunk, next_off, out)
            next_turn += 1

        for t, (text, tool) in arrived.items():
            if t >= next_turn and not self._pending.containsKey((t,)):
                self._pending.updateValue((t,), (text, tool))

        self._counters.update((next_turn, next_chunk, next_off))

        if out:
            yield pd.DataFrame(
                {c: [r[i] for r in out]
                 for i, c in enumerate(_CHUNK_COLS)})

    def close(self) -> None:
        pass


def stateful_extract_tws(transcripts: DataFrame,
                         cfg: ExtractionConfig = ExtractionConfig(),
                         ttl_sec: int | None = None) -> DataFrame:
    """streaming transcripts -> streaming extracted chunks, via
    transformWithStateInPandas. Caller must have the RocksDB state store
    provider configured (see :func:`stream_extract_tws`)."""
    return (transcripts
            .groupBy("conv_id")
            .transformWithStateInPandas(
                ExtractProcessor(cfg, ttl_sec),
                outputStructType=CHUNK_SCHEMA,
                outputMode="append",
                timeMode="none"))


def stream_extract_tws(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str,
                       cfg: ExtractionConfig = ExtractionConfig(),
                       max_files_per_trigger: int | None = None,
                       ttl_sec: int | None = None,
                       available_now: bool = True):
    """Landing-directory wiring; sets the RocksDB provider the API
    requires (session-level — Spark has no per-query state provider)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)
    reader = spark.readStream.schema(TRANSCRIPT_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    transcripts = (reader.parquet(input_dir)
                   .where("conv_id is not null and turn_idx is not null"))
    chunks = stateful_extract_tws(transcripts, cfg, ttl_sec)
    writer = (chunks.writeStream
              .outputMode("append")
              .format("parquet")
              .option("path", f"{output_dir}/extracted")
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
