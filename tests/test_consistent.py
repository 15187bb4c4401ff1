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
