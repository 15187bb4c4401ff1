"""Streaming ingest NEAR-dedup: simhash suppression against an
accumulating external signature store, cross-batch and idempotent."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.operators.dedup import simhash_py
from pdf_parser_spark.streaming.neardedup import (near_dedup_batch,
                                                  read_signature_store,
                                                  stream_near_dedup)

T0 = dt.datetime(2026, 1, 1)

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch carefully from the warm river bank nearby "
        "under a bright afternoon sun with gentle wind")
NEAR_1 = BASE.replace("bank", "banks")    # hamming 1 (asserted below)
NEAR_3 = BASE.replace("dog", "dogs")      # hamming 3
FAR = ("completely unrelated content about quantum chromodynamics "
       "lattice simulations and gauge field theory renormalization")


def _h(a, b):
    return bin((simhash_py(a) ^ simhash_py(b)) & ((1 << 64) - 1)).count("1")


def test_planted_distances_hold():
    """The fixture texts' simhash distances are part of the contract."""
    assert _h(BASE, NEAR_1) == 1
    assert _h(BASE, NEAR_3) == 3
    assert _h(BASE, FAR) > 3


def _write(path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def test_near_dedup_batch_rules(spark):
    """Store hits suppress; the remainder near-dedups to min-id
    survivors; signatures returned only for admitted rows."""
    store = spark.createDataFrame([("s1", simhash_py(BASE))], "id string, sh long")
    batch = spark.createDataFrame(
        [("a", NEAR_1), ("b", FAR), ("c", FAR + " extra"), ("d", FAR)],
        "doc_id string, text string")
    surv, sig = near_dedup_batch(batch, store)
    got = sorted(r.doc_id for r in surv.collect())
    # a: near store -> out; b/d identical FAR -> min id b survives;
    # c: within hamming of FAR cluster -> clustered with it
    assert "a" not in got and "b" in got
    assert sorted(r.id for r in sig.collect()) == got


def test_stream_near_dedup_cross_batch(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    _write(str(inp / "f1.parquet"), [
        ("a1", BASE, T0),
        ("a2", NEAR_1, T0),                  # in-batch near-dup of a1
        ("b1", FAR, T0),
    ])
    _write(str(inp / "f2.parquet"), [
        ("a3", NEAR_3, T0),                  # cross-batch near-dup of a1
        ("c1", FAR + " with novel suffix material appended here", T0),
    ])
    out = str(tmp_path / "out")
    store = str(tmp_path / "sigs")
    stream = (spark.readStream
              .schema("doc_id string, text string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = (stream_near_dedup(stream, out, store, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert not q.isActive

    admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert "a1" in admitted and "b1" in admitted      # first arrivals
    assert "a2" not in admitted                       # in-batch near-dup
    assert "a3" not in admitted                       # cross-batch near-dup
    sigs = read_signature_store(spark, store)
    assert ({r.id for r in sigs.collect()} == admitted)
    # the signature store is the batch tier's content address: values
    # recompute exactly from the admitted texts
    texts = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    for r in sigs.collect():
        assert r.sh == simhash_py(texts[r.id])

def test_replay_excludes_own_batch_partition(spark, tmp_path):
    """The data-loss scenario: a foreachBatch replay after a
    pre-checkpoint crash must NOT read the batch's own committed
    signatures (it would self-suppress every admitted row and overwrite
    its output with empty data)."""
    store = str(tmp_path / "sigs")
    sig = spark.createDataFrame([("a1", simhash_py(BASE))],
                                "id string, sh long")
    sig.write.parquet(f"{store}/batch=0")          # batch 0 committed...
    batch = spark.createDataFrame([("a1", BASE)], "doc_id string, text string")

    # ...then batch 0 is REPLAYED: excluding its own partition, a1 is
    # re-admitted (idempotent overwrite), not suppressed by itself
    surv, _ = near_dedup_batch(
        batch, read_signature_store(spark, store, exclude_batch=0))
    assert [r.doc_id for r in surv.collect()] == ["a1"]
    # a later batch DOES see batch 0's signatures
    surv2, _ = near_dedup_batch(
        batch, read_signature_store(spark, store, exclude_batch=1))
    assert surv2.count() == 0


def test_store_read_failures_raise(spark, tmp_path):
    """Only a missing store path means 'first batch'; a corrupt store
    must raise, not silently disable near-dedup."""
    import pytest

    missing = read_signature_store(spark, str(tmp_path / "nowhere"))
    assert missing.count() == 0
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        read_signature_store(spark, str(bad)).count()
