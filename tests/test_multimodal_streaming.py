"""Multimodal binary-column plumbing + Structured-Streaming incremental
extraction."""

from __future__ import annotations

import hashlib
import time

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.config import DEFAULT_CONFIG
from pdf_parser_spark.operators.merge import extract_chunks
from pdf_parser_spark.operators.multimodal import (decode_image,
                                                   frame_sample_plan,
                                                   media_dedup_groups,
                                                   parse_header,
                                                   payload_features,
                                                   synth_media)
from pdf_parser_spark.sources.synth import transcripts_pandas
from pdf_parser_spark.streaming.incremental import stream_extract


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n_rows=60, seed=42).cache()


def test_media_schema_typed(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
    assert {"mime", "width", "height", "duration_ms"} <= meta_fields


def test_payload_features_roundtrip(media):
    """mapInPandas features reproduce the header values and real digests."""
    feats = {r.media_id: r for r in payload_features(media).collect()}
    rows = media.collect()
    assert len(feats) == len(rows)
    for r in rows:
        f = feats[r.media_id]
        kind, w, h, dur = parse_header(bytes(r.payload))
        assert (f.kind, f.width, f.height, f.duration_ms) == (kind, w, h, dur)
        assert f.digest == hashlib.md5(bytes(r.payload)).hexdigest()
        assert f.n_bytes == len(bytes(r.payload))
        assert 0.0 < f.byte_entropy <= 8.0


def test_payload_features_distributed(media):
    """Plumbing survives repartitioning — results are partition-invariant."""
    a = sorted(payload_features(media).collect())
    b = sorted(payload_features(media.repartition(7)).collect())
    assert a == b


def test_frame_sample_plan_counts(media):
    plan = frame_sample_plan(media, every_ms=1000)
    got = (plan.groupBy("media_id").agg(F.count("*").alias("n"),
                                        F.max("frame_ts_ms").alias("last"))
           .collect())
    durs = {r.media_id: r.meta.duration_ms
            for r in media.where(F.col("kind") == "video").collect()}
    assert {r.media_id for r in got} == set(durs)
    for r in got:
        assert r.n == durs[r.media_id] // 1000 + 1
        assert r.last <= durs[r.media_id]


def test_frame_plan_prunes_payload(media, spark, tmp_path):
    # against a real file scan, the plan must prune the heavy binary column:
    # ReadSchema carries only media_id/kind/meta, never payload
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    plan = frame_sample_plan(spark.read.parquet(path), every_ms=1000)
    physical = plan._jdf.queryExecution().executedPlan().toString()
    # look only at the ReadSchema fragment: the surrounding scan line also
    # carries the file Location, whose pytest tmp dir contains "payload"
    schemas = [ln.split("ReadSchema:")[1]
               for ln in physical.splitlines() if "ReadSchema:" in ln]
    assert schemas and all("payload" not in s for s in schemas)


def test_media_dedup_exact(media, spark):
    dup = media.limit(3).union(media.limit(3))
    groups = media_dedup_groups(dup).collect()
    assert all(g.n_copies == 2 for g in groups)
    assert len(groups) == 3


def test_decode_image_gated(media):
    # non-PNG decode still requires PIL (absent here, unvendorable: no
    # network) — the gate is PER ROW now: PPSM payloads come back
    # ok=false naming the missing codec instead of failing the plan,
    # while the stdlib PNG default path runs end-to-end
    # (test_png_codec.py::test_default_decode_image_runs_end_to_end_on_png)
    rows = decode_image(media).collect()
    assert rows and all(not r.ok and "NotImplementedError" in r.error
                        and "pillow" in r.error for r in rows)


def _make_fake_decoder():
    """Minimal PIL-protocol codec the decode pipeline drives: parses the
    synthetic PPSM header, emits deterministic md5-stream 'pixels'.
    Defined in a closure so cloudpickle ships it by VALUE to executors
    (a module-level test class is not importable worker-side)."""

    class FakeImage:
        def __init__(self, w, h, key):
            self.size = (w, h)
            self._key = key

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, wh):
            return FakeImage(wh[0], wh[1], self._key)

        def tobytes(self):
            w, h = self.size
            need = w * h * 3
            buf = bytearray()
            i = 0
            while len(buf) < need:
                buf.extend(
                    hashlib.md5(f"{self._key}:{i}".encode()).digest())
                i += 1
            return bytes(buf[:need])

    def fake_decoder(payload: bytes):
        kind, w, h, _ = parse_header(payload)  # ValueError on corrupt
        if kind != "image":
            raise ValueError(f"cannot decode {kind} as image")
        return FakeImage(w, h, hashlib.md5(payload).hexdigest())

    return fake_decoder


def test_decode_image_pipeline_with_injected_codec(media, spark):
    """The decode path is REAL distributed plumbing (mapInPandas over
    payload bytes -> bounded RGB thumbnails with error rows, never task
    failures); only the codec is injected. Pinned: aspect-preserving
    downscale bound, pixel buffer sizing, determinism, per-row error
    capture on corrupt payloads."""
    from pdf_parser_spark.operators.multimodal import MEDIA_SCHEMA
    _fake_decoder = _make_fake_decoder()

    corrupt = spark.createDataFrame(
        [("mBAD", "conv_x", 0, "image", b"\x00garbage",
          ("image/x-ppsm", 0, 0, 0, 0, 8))], MEDIA_SCHEMA)
    rows = {r.media_id: r
            for r in decode_image(media.union(corrupt), max_side=100,
                                  decoder=_fake_decoder).collect()}
    ok = [r for r in rows.values() if r.ok]
    assert ok and len(rows) == media.where("kind = 'image'").count() + 1
    for r in ok:
        assert max(r.thumb_width, r.thumb_height) <= 100
        assert len(r.pixels) == r.thumb_width * r.thumb_height * 3
        if r.src_width > 100:  # downscale preserves aspect (3:4 synth)
            assert r.thumb_width == 100
            assert abs(r.thumb_height / r.thumb_width
                       - r.src_height / r.src_width) < 0.02
    bad = rows["mBAD"]
    assert not bad.ok and "ValueError" in bad.error and bad.pixels == b""
    # determinism through the Arrow batch path
    again = {r.media_id: r.pixels
             for r in decode_image(media, max_side=100,
                                   decoder=_fake_decoder).collect()}
    assert all(again[m] == r.pixels for m, r in rows.items() if m != "mBAD")


# --- streaming ---------------------------------------------------------------


def _write_convs(path: str, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = transcripts_pandas(n_convs=8, seed=seed)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _await(q, timeout=120):
    q.awaitTermination(timeout)
    assert not q.isActive


def test_stream_extract_incremental_resume(spark, tmp_path):
    """availableNow drains new files only; restart skips processed ones;
    union of micro-batch outputs equals the batch pipeline on the union."""
    inp = tmp_path / "landing"
    inp.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_convs(str(inp / "part1.parquet"), seed=101)
    _await(stream_extract(spark, str(inp), out, ckpt))
    n1 = spark.read.parquet(f"{out}/extracted").count()
    assert n1 > 0

    # no new files -> a second run appends nothing (checkpoint resume)
    _await(stream_extract(spark, str(inp), out, ckpt))
    assert spark.read.parquet(f"{out}/extracted").count() == n1

    # new file -> only its conversations are appended
    _write_convs(str(inp / "part2.parquet"), seed=202)
    _await(stream_extract(spark, str(inp), out, ckpt))
    got = spark.read.parquet(f"{out}/extracted")

    expected = extract_chunks(spark.read.parquet(str(inp)), DEFAULT_CONFIG)
    key = ["conv_id", "chunk_idx", "turn_idx", "chunk_type", "text",
           "char_count"]
    assert sorted(map(tuple, got.select(key).collect())) == \
        sorted(map(tuple, expected.select(key).collect()))
