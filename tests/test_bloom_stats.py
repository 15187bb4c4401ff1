"""Per-file Bloom-filter manifest stats (Iceberg Puffin / parquet
bloom analog): point-lookup file pruning on hash-shaped keys, where
min/max bounds degenerate (every md5-keyed file spans ~the full key
range, so a bounds-only lookup keeps every file). Correctness bar: no
false negatives ever — pruning may open extra files, never fewer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (_bloom_build,
                                               _bloom_contains,
                                               _bloom_params, append_rows,
                                               create_table,
                                               files_for_values,
                                               merge_into, read_manifest,
                                               read_for_values, read_table,
                                               vacuum)


def _digest(df):
    canon = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                                   F.lit("\x00"))
                                        for c in sorted(df.columns)]))
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.agg(F.sum(h).alias("s"), F.count("*").alias("n")).collect()[0]
    return (int(r.s) if r.s is not None else 0), int(r.n)


@pytest.fixture()
def hashed_docs(spark):
    # md5-shaped key: scatters across every file's range by construction
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.md5(F.concat_ws("|", "doc_id", "text"))
                    .alias("content_hash"),
                    "doc_id", "lang", "text"))


@pytest.fixture()
def store(spark, hashed_docs, tmp_path):
    d = str(tmp_path / "store")
    create_table(spark, hashed_docs.repartition(8), d, "content_hash",
                 bloom_cols=["content_hash"])
    return d


def test_bloom_core_no_false_negatives_and_bounded_fp():
    members = [f"k{i:05d}" for i in range(2000)]
    m, k = _bloom_params(len(members))
    bits = _bloom_build(members, m, k)
    assert all(_bloom_contains(bits, m, k, v) for v in members)
    probes = [f"absent{i:05d}" for i in range(5000)]
    fp = sum(_bloom_contains(bits, m, k, v) for v in probes) / len(probes)
    assert fp < 0.03  # sized for 1 %; generous margin for variance


def test_bounds_degenerate_but_bloom_prunes(spark, store, hashed_docs):
    m = read_manifest(store)
    files = m["snapshots"][str(m["version"])]["files"]
    assert len(files) == 8
    assert set(m["bloomstats"]["content_hash"]) == set(files)
    probe = [r.content_hash for r in hashed_docs.limit(3).collect()]
    # bounds alone keep everything: md5 keys span every file's range
    from pdf_parser_spark.sources.cowtable import files_intersecting_ranges
    st = m["stats"]
    bounds = [{"file": f, "kmin": st[f][0], "kmax": st[f][1], "rows": 0}
              for f in files]
    bounds_kept = files_intersecting_ranges(bounds,
                                            [(x, x) for x in probe])
    assert len(bounds_kept) == len(files)  # the degenerate case, proven
    kept = files_for_values(spark, store, "content_hash", probe)
    # each probed key lives in exactly one file; fp rate 1 % over 8
    # files x 3 values leaves plenty of margin below "all of them"
    assert len(kept) <= 5
    # no false negatives: the rows themselves must all come back
    got = read_for_values(spark, store, "content_hash", probe)
    assert sorted(r.content_hash for r in got.collect()) == sorted(probe)


def test_bloom_read_equals_full_scan_filter(spark, store, hashed_docs):
    probe = [r.content_hash
             for r in hashed_docs.orderBy("doc_id").limit(7).collect()]
    pruned = read_for_values(spark, store, "content_hash", probe)
    full = read_table(spark, store).where(
        F.col("content_hash").isin(probe))
    assert _digest(pruned) == _digest(full)


def test_absent_key_opens_at_most_fp_files(spark, store):
    kept = files_for_values(spark, store, "content_hash",
                            ["0000deadbeef0000deadbeef0000dead"])
    assert len(kept) <= 2  # 1 % fp over 8 files; 0 expected
    got = read_for_values(spark, store, "content_hash",
                          ["0000deadbeef0000deadbeef0000dead"])
    assert got.count() == 0


def test_append_and_merge_record_blooms_for_new_files(spark, store,
                                                      hashed_docs):
    extra = hashed_docs.select(
        F.concat(F.lit("zz"), F.substring("content_hash", 3, 30))
        .alias("content_hash"), "doc_id", "lang", "text").limit(50)
    append_rows(spark, store, extra.coalesce(1))
    m = read_manifest(store)
    files = m["snapshots"][str(m["version"])]["files"]
    assert set(m["bloomstats"]["content_hash"]) == set(files)
    probe = [r.content_hash for r in extra.limit(2).collect()]
    kept = files_for_values(spark, store, "content_hash", probe)
    assert len(kept) <= 3  # the appended file + fp slack
    got = read_for_values(spark, store, "content_hash", probe)
    assert sorted(r.content_hash for r in got.collect()) == sorted(probe)
    # merge path records blooms on its rewritten files too
    one = hashed_docs.limit(1).withColumn("text", F.lit("rewritten")) \
        .withColumn("op", F.lit("upsert"))
    merge_into(spark, store, one, batch_id=9)
    m2 = read_manifest(store)
    files2 = m2["snapshots"][str(m2["version"])]["files"]
    # every CURRENT file has a bloom; older snapshots' files keep
    # theirs for time travel until vacuum (same lifecycle as colstats)
    assert set(files2) <= set(m2["bloomstats"]["content_hash"])


def test_vacuum_drops_bloom_sidecars_with_their_files(spark, store,
                                                      hashed_docs):
    one = hashed_docs.limit(1).withColumn("text", F.lit("v2")) \
        .withColumn("op", F.lit("upsert"))
    merge_into(spark, store, one, batch_id=1)
    m = read_manifest(store)
    live = set(m["snapshots"][str(m["version"])]["files"])
    dead = [f for f in m["bloomstats"]["content_hash"] if f not in live]
    assert dead  # the rewritten v1 file's bloom is now orphaned
    dead_paths = [m["bloomstats"]["content_hash"][f]["path"] for f in dead]
    assert all(os.path.exists(os.path.join(store, p)) for p in dead_paths)
    vacuum(store, keep_last=1)
    m2 = read_manifest(store)
    assert set(m2["bloomstats"]["content_hash"]) == live
    assert not any(os.path.exists(os.path.join(store, p))
                   for p in dead_paths)
    # post-vacuum reads still prune and still return everything
    probe = [r.content_hash for r in read_table(spark, store)
             .limit(2).collect()]
    got = read_for_values(spark, store, "content_hash", probe)
    assert sorted(r.content_hash for r in got.collect()) == sorted(probe)


def test_nested_columns_skipped_file_always_kept(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i)] * 3) for i in range(20)],
        "id long, vec array<double>")
    d = str(tmp_path / "nested")
    create_table(spark, df.coalesce(2), d, "id", bloom_cols=["vec"])
    m = read_manifest(d)
    assert "vec" not in m.get("bloomstats", {})  # unsupported: no entry
    files = m["snapshots"]["1"]["files"]
    kept = files_for_values(spark, d, "vec", [[1.0, 1.0, 1.0]])
    assert kept == list(files)  # correctness over pruning


def test_small_batch_antijoin_probes_not_scans(spark, tmp_path):
    """The steady-state CDC refresh shape: a big store, a tiny batch.
    embed_incremental's cache anti-join must run against the bloom-
    pruned store read (store_files_probed << store_files) and still be
    row-for-row equal to the direct encoder."""
    from pdf_parser_spark.operators.embedding import (embed_chunks,
                                                      embed_incremental)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("conv_id"),
                    F.lit(0).alias("chunk_idx"),
                    F.col("text")))
    store = str(tmp_path / "vecs")
    # seed the store across many files so pruning is observable
    _, st0 = embed_incremental(docs.repartition(16), store, dim=16)
    assert st0["store_files"] >= 8
    # tiny second batch: 2 cached texts + 1 brand-new one
    small = docs.limit(2).unionByName(
        spark.createDataFrame([("zz", 0, "never seen before text")],
                              "conv_id string, chunk_idx int, text string"))
    got, st = embed_incremental(small, store, dim=16)
    assert st["new_embeddings"] == 1
    assert "store_files_probed" in st
    assert st["store_files_probed"] < st0["store_files"]
    # append geometry follows the data: a 1-row refresh adds ONE file,
    # not one near-empty file per shuffle partition
    assert st["store_files"] == st0["store_files"] + 1
    canon = lambda d: sorted(
        (r.conv_id, tuple(r.embedding)) for r in d.collect())
    assert canon(got) == canon(embed_chunks(small, dim=16))
    # huge batches skip the driver-side probe (no collect of 200k keys)
    _, st_big = embed_incremental(docs, store, dim=16, bloom_probe_max=1)
    assert "store_files_probed" not in st_big


def test_embedding_store_declares_bloom_on_content_hash(spark, tmp_path):
    from pdf_parser_spark.operators.embedding import embed_incremental
    chunks = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
              .select(F.col("doc_id").cast("string").alias("chunk_id"),
                      F.col("text").alias("chunk_text")).limit(100))
    store = str(tmp_path / "vecstore")
    _, stats = embed_incremental(chunks, store_dir=store, dim=16,
                                 text_col="chunk_text")
    m = read_manifest(store)
    assert m["bloom_cols"] == ["content_hash"]
    assert "content_hash" in m["bloomstats"]
    probe = [r.content_hash
             for r in read_table(spark, store).limit(2).collect()]
    n_files = len(m["snapshots"][str(m["version"])]["files"])
    kept = files_for_values(spark, store, "content_hash", probe)
    assert len(kept) <= n_files  # and typically far fewer
    got = read_for_values(spark, store, "content_hash", probe)
    assert sorted(r.content_hash for r in got.collect()) == sorted(probe)


def test_append_base_version_guard_closes_probe_race(spark, store,
                                                     hashed_docs):
    """A commit landing between a caller's novelty probe and its append
    must be DETECTED: the probe's snapshot version is stale, so the
    append's key-uniqueness reasoning is too."""
    from pdf_parser_spark.sources.cowtable import ConcurrentCommitError
    probed = read_manifest(store)["version"]
    other = hashed_docs.select(
        F.concat(F.lit("rw"), F.substring("content_hash", 3, 30))
        .alias("content_hash"), "doc_id", "lang", "text").limit(5)
    append_rows(spark, store, other.coalesce(1))  # the racing writer
    mine = hashed_docs.select(
        F.concat(F.lit("me"), F.substring("content_hash", 3, 30))
        .alias("content_hash"), "doc_id", "lang", "text").limit(5)
    with pytest.raises(ConcurrentCommitError, match="re-probe"):
        append_rows(spark, store, mine.coalesce(1), base_version=probed)
    # fresh probe succeeds
    append_rows(spark, store, mine.coalesce(1),
                base_version=read_manifest(store)["version"])
