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
  by the store itself — no user-registered timer exists to keep an
  ``availableNow`` drain alive (the applyInPandasWithState version's
  failure mode). Spark requires ``timeMode='processingTime'`` whenever a
  TTL is configured (STATEFUL_PROCESSOR_CANNOT_ASSIGN_TTL_IN_TIME_MODE),
  so :func:`stateful_extract_tws` switches time mode with ``ttl_sec``;
  TTL-less callers keep ``timeMode='none'``. Because a MapState entry's
  TTL refreshes only on write, every batch that touches a key rewrites
  its surviving buffer entries so the reorder buffer expires with
  conversation idleness, not entry age — with that refresh the TTL
  retention caveat is the same as the other rendition's: only IDLE
  conversations are GC'd, and GC'd conversations drop late turns;
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
from pdf_parser_spark.streaming.incremental import (landing_reader,
                                                    start_parquet_sink)
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
        # The reorder buffer shares the counters' TTL, but a MapState
        # entry's TTL refreshes only on WRITE while the counters refresh
        # every batch the key appears — so without the refresh loop at
        # the end of handleInputRows, a buffered out-of-order turn in an
        # ACTIVE conversation would expire ttl_sec after ARRIVAL, the
        # gap would never fill, and a turn that WAS delivered would be
        # silently dropped. The refresh makes the buffer's lifetime
        # track conversation idleness (matching the
        # applyInPandasWithState rendition, where pending rides the one
        # state value refreshed on every update).
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
            # counters absent = fresh key OR a TTL-expired incarnation.
            # Counters and pending refresh in lockstep (below), so they
            # expire together, but the store gives no atomicity across
            # state variables — clear defensively so a resurrected
            # conv_id can't fold a previous incarnation's buffered turns
            # into its restarted (next_turn=0) stream.
            if self._ttl_ms is not None and self._pending.exists():
                self._pending.clear()

        arrived: dict[int, tuple] = {}
        for pdf in rows:
            for t_idx, text, tool in zip(pdf["turn_idx"].tolist(),
                                         pdf["text"].tolist(),
                                         pdf["tool"].tolist()):
                t_idx = int(t_idx)
                # first-wins dedup must consult BOTH buffers: a duplicate
                # of a turn already waiting in MapState would otherwise
                # shadow the first delivery AND leak its MapState row
                # forever (next_turn advances past it)
                if (t_idx >= next_turn and t_idx not in arrived
                        and not self._pending.containsKey((t_idx,))):
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

        if self._ttl_ms is not None:
            # TTL refresh: rewrite every surviving buffered turn so its
            # per-entry TTL restarts alongside the counters' — the
            # buffer must expire with conversation IDLENESS, never with
            # entry age (see init). Materialize before rewriting: the
            # store's iterator is not guaranteed stable under writes.
            # O(|gap buffer|) writes per touched key, bounded by the
            # reorder window, not the conversation.
            for k, v in list(self._pending.iterator()):
                self._pending.updateValue(k, v)

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
    provider configured (see :func:`stream_extract_tws`).

    timeMode follows ttl_sec: Spark refuses a state TTL outside
    processingTime time mode (STATEFUL_PROCESSOR_CANNOT_ASSIGN_TTL_IN_
    TIME_MODE), and the TTL's retention caveat matches the
    applyInPandasWithState rendition (see stateful_extract.py: GC'd
    conversations drop their late turns by design)."""
    time_mode = "none" if ttl_sec is None else "processingTime"
    return (transcripts
            .groupBy("conv_id")
            .transformWithStateInPandas(
                ExtractProcessor(cfg, ttl_sec),
                outputStructType=CHUNK_SCHEMA,
                outputMode="append",
                timeMode=time_mode))


def stream_extract_tws(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str,
                       cfg: ExtractionConfig = ExtractionConfig(),
                       max_files_per_trigger: int | None = None,
                       ttl_sec: int | None = None,
                       available_now: bool = True):
    """Landing-directory wiring; sets the RocksDB provider the API
    requires for the duration of QUERY START only (the provider is read
    at start; Spark has no per-query setting), then restores the
    session's prior value so later streams on the same session keep the
    provider they would have had."""
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, ROCKSDB_PROVIDER)
    try:
        transcripts = landing_reader(spark, input_dir, max_files_per_trigger,
                                     drop_null_keys=True)
        chunks = stateful_extract_tws(transcripts, cfg, ttl_sec)
        return start_parquet_sink(chunks, output_dir, checkpoint_dir,
                                  available_now)
    finally:
        if prev is not None:
            spark.conf.set(conf_key, prev)
        else:
            spark.conf.unset(conf_key)
