"""Incrementally-maintained corpus token statistics: merge equals full
recompute, exactly-once ledger, streaming maintenance, and the
LM-scoring consumer."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pdf_parser_spark.sources.stats_store import (merge_token_counts,
                                                  read_token_counts,
                                                  stream_token_stats,
                                                  token_count_deltas)

B1 = [(1, "alpha beta alpha"), (2, "beta gamma")]
B2 = [(3, "alpha delta"), (4, "")]
FULL_COUNTS = {"alpha": 3, "beta": 2, "gamma": 1, "delta": 1}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _counts(spark, store):
    return {r.term: r.c
            for r in read_token_counts(spark, str(store)).collect()}


def test_incremental_merge_equals_full_recompute(spark, tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    m1 = merge_token_counts(spark, _df(spark, B1), str(store), batch_id=0)
    assert m1["version"] == 1
    m2 = merge_token_counts(spark, _df(spark, B2), str(store), batch_id=1)
    assert m2["version"] == 2 and m2["applied"] == [0, 1]
    assert _counts(spark, store) == FULL_COUNTS
    # and equals the one-shot delta over the union
    full = {r.term: r.c for r in
            token_count_deltas(_df(spark, B1 + B2)).collect()}
    assert full == FULL_COUNTS


def test_merge_is_exactly_once(spark, tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    merge_token_counts(spark, _df(spark, B1), str(store), batch_id=0)
    # foreachBatch re-delivery: same batch id must be a no-op
    m = merge_token_counts(spark, _df(spark, B1), str(store), batch_id=0)
    assert m["version"] == 1
    assert _counts(spark, store) == {"alpha": 2, "beta": 2, "gamma": 1}


def test_streaming_maintenance(spark, tmp_path):
    inp = tmp_path / "landing"
    inp.mkdir()
    for name, rows in (("f1", B1), ("f2", B2)):
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(inp / f"{name}.parquet"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(str(inp)))
    q = stream_token_stats(stream, str(tmp_path / "store"),
                           str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _counts(spark, tmp_path / "store") == FULL_COUNTS


def test_unigram_logprob_from_store_counts(spark, tmp_path):
    """Scoring against the store's snapshot equals the full-scan LM —
    the consumer contract that makes incremental maintenance worth
    having."""
    from pdf_parser_spark.operators.textstats import unigram_logprob
    store = tmp_path / "store"
    store.mkdir()
    docs = _df(spark, B1 + B2)
    merge_token_counts(spark, docs, str(store), batch_id=0)
    via_store = unigram_logprob(
        docs, counts=read_token_counts(spark, str(store)))
    full_scan = unigram_logprob(docs)
    a = {r.id: (r.n_tokens, r.avg_logprob) for r in via_store.collect()}
    b = {r.id: (r.n_tokens, r.avg_logprob) for r in full_scan.collect()}
    assert a == b and len(a) == 4


def test_dsir_from_store_counts(spark, tmp_path):
    """DSIR's raw LM derived from the store's bucket counts equals the
    full-scan raw LM — the second consumer of incremental stats."""
    from pdf_parser_spark.operators.curation import dsir_importance
    from pdf_parser_spark.operators.dedup import release_owned_storage
    from pdf_parser_spark.sources.stats_store import \
        bucket_counts_from_store
    store = tmp_path / "store"
    store.mkdir()
    docs = _df(spark, B1 + B2)
    target = spark.createDataFrame([("alpha alpha beta",)], "text string")
    merge_token_counts(spark, docs, str(store), batch_id=0)
    bc = bucket_counts_from_store(
        read_token_counts(spark, str(store)), n_buckets=32)
    via_store = dsir_importance(docs, target, n_buckets=32, raw_counts=bc)
    full_scan = dsir_importance(docs, target, n_buckets=32)
    a = {r.id: (r.n_tokens, r.importance) for r in via_store.collect()}
    b = {r.id: (r.n_tokens, r.importance) for r in full_scan.collect()}
    assert a == b and len(a) == 4
    release_owned_storage(via_store)
    release_owned_storage(full_scan)


def test_time_travel_reads_older_versions(spark, tmp_path):
    """Every committed version stays readable — yesterday's LM is
    reproducible (the Iceberg snapshot-read analog)."""
    import pytest
    store = tmp_path / "store"
    store.mkdir()
    merge_token_counts(spark, _df(spark, B1), str(store), batch_id=0)
    merge_token_counts(spark, _df(spark, B2), str(store), batch_id=1)
    v1 = {r.term: r.c
          for r in read_token_counts(spark, str(store),
                                     version=1).collect()}
    assert v1 == {"alpha": 2, "beta": 2, "gamma": 1}
    assert _counts(spark, store) == FULL_COUNTS  # current unchanged
    with pytest.raises(ValueError, match="version 9 not in store"):
        read_token_counts(spark, str(store), version=9)


def test_unigram_logprob_novel_batch_terms_get_floor(spark, tmp_path):
    """A new batch scored against a stale store keeps its NOVEL terms:
    n_tokens counts every token and unseen terms contribute
    ln(unseen_count / total) instead of being silently dropped."""
    import math

    from pdf_parser_spark.operators.textstats import unigram_logprob
    store = tmp_path / "store"
    store.mkdir()
    old = _df(spark, [(0, "alpha beta"), (1, "alpha alpha")])
    merge_token_counts(spark, old, str(store), batch_id=0)
    # total = 4: alpha x3, beta x1
    new_batch = spark.createDataFrame(
        [(9, "alpha zzz-novel")], "doc_id long, text string")
    got = unigram_logprob(
        new_batch, counts=read_token_counts(spark, str(store))).collect()[0]
    assert got.n_tokens == 2                      # the novel token counts
    want = round((math.log(3 / 4) + math.log(1.0 / 4)) / 2, 6)
    assert got.avg_logprob == want
    import pytest
    with pytest.raises(ValueError, match="unseen_count"):
        unigram_logprob(new_batch, unseen_count=0.0)


def test_dsir_novel_batch_buckets_get_smoothed_floor(spark, tmp_path):
    """DSIR against a precomputed raw LM scores buckets neither LM has
    seen at the smoothed floor (ratio table spans the full bucket
    range); previously those buckets were dropped from the mean."""
    from pdf_parser_spark.operators.curation import dsir_importance
    from pdf_parser_spark.operators.dedup import release_owned_storage
    from pdf_parser_spark.sources.stats_store import \
        bucket_counts_from_store
    store = tmp_path / "store"
    store.mkdir()
    old = _df(spark, [(0, "alpha beta"), (1, "alpha alpha")])
    target = spark.createDataFrame([("alpha",)], "text string")
    merge_token_counts(spark, old, str(store), batch_id=0)
    bc = bucket_counts_from_store(
        read_token_counts(spark, str(store)), n_buckets=8)
    batch = spark.createDataFrame(
        [(9, "qqq-novel www-novel")], "doc_id long, text string")
    got_df = dsir_importance(batch, target, n_buckets=8, raw_counts=bc)
    got = got_df.collect()[0]
    # pure-python replay with bucket-level smoothing over the FULL
    # range: novel-bucket tokens score at the floor, not dropped
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8

    raw = {}
    for t in ["alpha", "beta", "alpha", "alpha"]:
        raw[bucket(t)] = raw.get(bucket(t), 0) + 1
    tgt = {bucket("alpha"): 1}
    rt, tt = sum(raw.values()), sum(tgt.values())

    def lr(b):
        return (math.log(tgt.get(b, 0) + 1) - math.log(tt + 8)) \
            - (math.log(raw.get(b, 0) + 1) - math.log(rt + 8))

    want = round((lr(bucket("qqq-novel")) + lr(bucket("www-novel"))) / 2, 6)
    assert got.n_tokens == 2
    assert got.importance == want
    release_owned_storage(got_df)
