"""Consistent cross-table snapshot sets (sources/consistent.py):
pinned reads line up across tables while the live lineage diverges
mid-cycle; set tags survive vacuum; expiry releases them; the lineage
refresher records a set only on green cycles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.pipeline import read_transcripts
from pdf_parser_spark.sources.consistent import (consistent_reads,
                                                 consistent_set_history,
                                                 expire_consistent_sets,
                                                 latest_consistent_set,
                                                 record_consistent_set)
from pdf_parser_spark.sources.cowtable import (create_table, merge_into,
                                               read_manifest, read_table,
                                               vacuum)
from pdf_parser_spark.sources.maintain import (build_embedded_table,
                                               build_extracted_table,
                                               refresh_extracted_table)
from pdf_parser_spark.sources.synth import write_transcripts_parquet


@pytest.fixture()
def chain(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_transcripts_parquet(p, n_convs=12, seed=21)
    turns = read_transcripts(spark, p).withColumn(
        "turn_key", F.concat_ws("#", "conv_id",
                                F.format_string("%06d", "turn_idx")))
    src, dst, emb, store = (str(tmp_path / x)
                            for x in ("src", "dst", "emb", "store"))
    create_table(spark, turns.repartitionByRange(3, "turn_key"),
                 src, "turn_key")
    build_extracted_table(spark, src, dst)
    build_embedded_table(spark, dst, emb, store, dim=16)
    return src, dst, emb, store, str(tmp_path / "csets.json")


def _edit_src(spark, src, mark, n=2):
    turns = read_table(spark, src)
    convs = sorted(r[0] for r in
                   turns.select("conv_id").distinct().collect())[:n]
    merge_into(spark, src,
               turns.where(F.col("conv_id").isin(convs))
               .withColumn("text", F.concat(F.lit(mark + " "), "text"))
               .withColumn("op", F.lit("upsert")))


def test_pinned_reads_line_up_while_live_diverges(spark, chain):
    src, dst, emb, store, sets = chain
    entry = record_consistent_set(sets, {"chunks": dst,
                                         "embeddings": emb})
    assert entry["set_id"] == 1

    # advance ONLY the chunk hop: the live pair is now inconsistent
    _edit_src(spark, src, "DIVERGE")
    refresh_extracted_table(spark, src, dst)
    live_orphans = (read_table(spark, dst).select("chunk_key")
                    .join(read_table(spark, emb).select("chunk_key"),
                          "chunk_key", "left_anti").count())
    assert live_orphans > 0  # the mid-cycle window is real

    pinned = consistent_reads(spark, sets)
    pin_orphans = (pinned["chunks"].select("chunk_key")
                   .join(pinned["embeddings"].select("chunk_key"),
                         "chunk_key", "left_anti").count())
    assert pin_orphans == 0  # the set still joins cleanly
    assert latest_consistent_set(sets)["set_id"] == 1


def test_set_pins_survive_vacuum_until_expired(spark, chain):
    src, dst, emb, store, sets = chain
    record_consistent_set(sets, {"chunks": dst, "embeddings": emb})
    v_pin = read_manifest(dst)["version"]
    # churn the chunk table several versions past the pin
    for i in range(2):
        _edit_src(spark, src, f"CHURN{i}")
        refresh_extracted_table(spark, src, dst)
    vacuum(dst, keep_last=1)
    assert str(v_pin) in read_manifest(dst)["snapshots"]  # tag held it
    pinned = consistent_reads(spark, sets)
    assert pinned["chunks"].count() > 0

    record_consistent_set(sets, {"chunks": dst, "embeddings": emb})
    out = expire_consistent_sets(sets, keep_last=1)
    assert out["expired_sets"] == 1 and out["dropped_tags"] == 2
    vacuum(dst, keep_last=1)
    assert str(v_pin) not in read_manifest(dst)["snapshots"]  # released
    assert [e["set_id"] for e in consistent_set_history(sets)] == [2]
    with pytest.raises(ValueError, match="not recorded"):
        consistent_reads(spark, sets, set_id=1)


def test_refresher_records_sets_only_on_green_moves(spark, chain):
    from pdf_parser_spark.sources.maintain import make_lineage_refresher
    src, dst, emb, store, sets = chain
    refresh = make_lineage_refresher(
        src, dst, emb_dir=emb, store_dir=store, wap=True,
        audits={"no_poison": lambda df:
                df.where(F.col("text").contains("POISON"))},
        consistent_set_path=sets)

    _edit_src(spark, src, "GREEN")
    refresh(spark, {"version": read_manifest(src)["version"]})
    assert refresh.log[-1]["chunks"]["published"] is True
    s1 = refresh.log[-1]["consistent_set"]
    assert set(s1["tables"]) == {"transcripts", "chunks", "embeddings"}
    assert s1["tables"]["chunks"]["version"] == \
        read_manifest(dst)["version"]

    # caught-up cycle: nothing moved, no new set
    refresh(spark, {"version": read_manifest(src)["version"]})
    assert "consistent_set" not in refresh.log[-1]
    # quarantined cycle: no set either
    _edit_src(spark, src, "POISON")
    refresh(spark, {"version": read_manifest(src)["version"]})
    assert refresh.log[-1]["chunks"]["published"] is False
    assert "consistent_set" not in refresh.log[-1]
    assert latest_consistent_set(sets)["set_id"] == s1["set_id"]
    # the pinned pair still reads consistently throughout
    pinned = consistent_reads(spark, sets)
    assert (pinned["chunks"].select("chunk_key")
            .join(pinned["embeddings"].select("chunk_key"),
                  "chunk_key", "left_anti").count()) == 0


def test_live_stream_full_composition(spark, tmp_path):
    """Capstone: a CDC stream drives the WHOLE round-4 stack — each
    micro-batch merges into the transcripts cow table, the lineage
    refresher stages re-extraction on a WAP branch, the maintained
    LSH index GATES publish (clone content quarantined), green cycles
    record a consistent cross-table set, and the pinned set reads
    join cleanly throughout."""
    import os

    from pdf_parser_spark.sources.dedup_index import build_dedup_index
    from pdf_parser_spark.sources.maintain import make_lineage_refresher
    from pdf_parser_spark.streaming.cow_sink import merge_stream

    p = str(tmp_path / "t.parquet")
    write_transcripts_parquet(p, n_convs=10, seed=41)
    src, dst, idx = (str(tmp_path / x) for x in ("src", "dst", "idx"))
    sets = str(tmp_path / "csets.json")
    turns = read_transcripts(spark, p).withColumn(
        "turn_key", F.concat_ws("#", "conv_id",
                                F.format_string("%06d", "turn_idx")))
    create_table(spark, turns.repartitionByRange(3, "turn_key"),
                 src, "turn_key")
    build_extracted_table(spark, src, dst)
    build_dedup_index(spark, dst, idx)

    convs = sorted(r[0] for r in
                   turns.select("conv_id").distinct().collect())
    stream_dir = str(tmp_path / "cdc")
    os.makedirs(stream_dir)
    # batch 0: a clean edit; batch 1: conv B cloned into conv A (the
    # near-dup the gate exists to stop)
    clean = (turns.where(F.col("conv_id") == convs[0])
             .withColumn("text", F.concat(F.lit("CLEAN zq7 "), "text")))
    donor = turns.where(F.col("conv_id") == convs[2])
    n_donor = donor.count()
    clone = (donor.withColumn("conv_id", F.lit(convs[1]))
             .withColumn("turn_key",
                         F.concat_ws("#", "conv_id",
                                     F.format_string("%06d", "turn_idx"))))
    surplus = (turns.where((F.col("conv_id") == convs[1])
                           & (F.col("turn_idx") >= n_donor)))
    for i, batch in enumerate((clean, clone.unionByName(surplus))):
        ops = batch.withColumn(
            "op", F.when((F.lit(i) == 1)
                         & (F.col("conv_id") == convs[1])
                         & (F.col("turn_idx") >= n_donor),
                         "delete").otherwise("upsert"))
        (ops.withColumn("lsn", F.monotonically_increasing_id())
         .write.mode("overwrite").parquet(f"{stream_dir}/f{i}"))

    follow = make_lineage_refresher(src, dst, wap=True,
                                    dedup_idx_dir=idx,
                                    dedup_gate_bands=4,
                                    consistent_set_path=sets)
    schema = (turns.withColumn("op", F.lit("x"))
              .withColumn("lsn", F.lit(0).cast("long")).schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(f"{stream_dir}/f*"))
    q = merge_stream(stream, src, str(tmp_path / "ckpt"),
                     order_col="lsn", on_commit=follow)
    q.awaitTermination(120)

    assert len(follow.log) == 2
    first, second = follow.log
    assert first["chunks"]["published"] is True
    assert "consistent_set" in first
    assert first["dedup_index"]["src_version"] == \
        first["consistent_set"]["tables"]["chunks"]["version"]
    assert second["chunks"]["published"] is False
    assert second["chunks"]["audits"]["near_dup"] > 0
    assert "consistent_set" not in second
    # main never served the clone; the pinned set joins cleanly
    assert (read_table(spark, dst)
            .where(F.col("conv_id") == convs[1])
            .where(F.col("text").contains("CLEAN")).count()) == 0
    pinned = consistent_reads(spark, sets)
    assert set(pinned) == {"transcripts", "chunks", "dedup_index"}
    assert pinned["chunks"].where(
        F.col("text").contains("CLEAN zq7")).count() > 0
