"""CDC-maintained MinHash-LSH near-dup index (sources/dedup_index.py):
refreshed index == from-scratch rebuild; dup_check_batch == the
cross-pair slice of a full minhash_lsh_pairs recompute; the probe read
is file-pruned without changing answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.dedup import minhash_lsh_pairs
from pdf_parser_spark.pipeline import read_transcripts
from pdf_parser_spark.sources.cowtable import (create_table, merge_into,
                                               read_manifest, read_table)
from pdf_parser_spark.sources.dedup_index import (SIG_KEY, bucket_rows,
                                                  build_dedup_index,
                                                  dup_check_batch,
                                                  refresh_dedup_index)
from pdf_parser_spark.sources.maintain import (build_extracted_table,
                                               refresh_extracted_table)
from pdf_parser_spark.sources.synth import write_transcripts_parquet

GEOM = dict(n=3, num_hashes=8, bands=4)


@pytest.fixture()
def tables(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    idx = str(tmp_path / "idx")
    p = str(tmp_path / "t.parquet")
    write_transcripts_parquet(p, n_convs=24, seed=11)
    turns = read_transcripts(spark, p).withColumn(
        "turn_key", F.concat_ws("#", "conv_id",
                                F.format_string("%06d", "turn_idx")))
    create_table(spark, turns.repartitionByRange(4, "turn_key"),
                 src, "turn_key")
    build_extracted_table(spark, src, dst)
    build_dedup_index(spark, dst, idx, **GEOM)
    return src, dst, idx


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_matches_batch_pipeline(spark, tables):
    _, dst, idx = tables
    want = bucket_rows(read_table(spark, dst), "chunk_key", "text",
                       **GEOM)
    assert _rows(read_table(spark, idx)) == _rows(want)
    m = read_manifest(idx)
    assert m["src_version"] == read_manifest(dst)["version"]
    assert m["dedup_cfg"]["bands"] == GEOM["bands"]


def _probe_batch(spark, dst, n_dups=6, n_novel=4):
    """Half re-ingests of indexed chunk texts under new ids (guaranteed
    full-band matches to their sources), half novel texts."""
    dups = (read_table(spark, dst)
            .orderBy("chunk_key").limit(n_dups)
            .select(F.concat(F.lit("probe#"), "chunk_key").alias("id"),
                    "text"))
    novel = spark.createDataFrame(
        [(f"probe#novel{i}",
          f"completely unindexed text {i} " + " ".join(
              f"tok{i}w{j}" for j in range(12)))
         for i in range(n_novel)], "id string, text string")
    return dups.unionByName(novel)


def test_dup_check_equals_full_recompute(spark, tables):
    _, dst, idx = tables
    batch = _probe_batch(spark, dst)
    got = dup_check_batch(spark, idx, batch, id_col="id")
    # oracle: full minhash_lsh_pairs over corpus+batch, cross pairs only
    corpus = read_table(spark, dst).select(
        F.col("chunk_key").alias("id"), "text")
    full = minhash_lsh_pairs(corpus.unionByName(batch), "id", "text",
                             **GEOM)
    is_probe = F.col("id_a").startswith("probe#")
    is_probe_b = F.col("id_b").startswith("probe#")
    cross = full.where(is_probe != is_probe_b).select(
        F.when(is_probe, F.col("id_a")).otherwise(F.col("id_b"))
        .alias("probe_id"),
        F.when(is_probe, F.col("id_b")).otherwise(F.col("id_a"))
        .alias("dup_of"),
        "n_bands_shared")
    assert _rows(got) == _rows(cross)
    # every re-ingested text matches its source in all bands
    full_band = {r.probe_id for r in got.where(
        (F.col("n_bands_shared") == GEOM["bands"])
        & (F.concat(F.lit("probe#"), "dup_of") == F.col("probe_id"))
    ).collect()}
    assert len(full_band) == 6


def test_probe_pruning_bites_and_preserves_answers(spark, tables):
    _, dst, idx = tables
    one = _probe_batch(spark, dst, n_dups=1, n_novel=0)
    pruned = dup_check_batch(spark, idx, one, id_col="id")
    full = dup_check_batch(spark, idx, one, id_col="id", prune=False)
    assert _rows(pruned) == _rows(full)
    # the 4-bucket probe's key ranges must hit a strict file subset
    from pdf_parser_spark.sources.cowtable import (
        file_key_bounds, files_intersecting_ranges)
    m = read_manifest(idx)
    files = m["snapshots"][str(m["version"])]["files"]
    qb = bucket_rows(one, "id", "text", **GEOM)
    probes = [(r.band, r.bucket)
              for r in qb.select("band", "bucket").distinct().collect()]
    bounds = file_key_bounds(spark, idx, files, m["key_col"], manifest=m)
    hit = files_intersecting_ranges(
        bounds, [("%02d#%s#" % p, "%02d#%s#￿" % p) for p in probes])
    assert 0 < len(hit) < len(files)


def test_refresh_equals_rebuild_after_cdc(spark, tables, tmp_path):
    src, dst, idx = tables
    turns = read_table(spark, src)
    convs = sorted(r[0] for r in
                   turns.select("conv_id").distinct().collect())
    edit, kill = convs[0], convs[1]
    upd = (turns.where(F.col("conv_id") == edit)
           .withColumn("text", F.concat(F.lit("EDIT\n"), "text"))
           .withColumn("op", F.lit("upsert")))
    dele = (turns.where(F.col("conv_id") == kill)
            .withColumn("op", F.lit("delete")))
    merge_into(spark, src, upd.unionByName(dele), batch_id=1)
    refresh_extracted_table(spark, src, dst)
    st = refresh_dedup_index(spark, dst, idx)
    assert st["src_version"] == read_manifest(dst)["version"]

    fresh = str(tmp_path / "idx_fresh")
    build_dedup_index(spark, dst, fresh, **GEOM)
    assert _rows(read_table(spark, idx)) == _rows(read_table(spark, fresh))
    # the killed conversation's chunks left the index
    assert read_table(spark, idx).where(
        F.col("id").startswith(kill)).count() == 0
    # and a repeat refresh is a recorded no-op
    assert refresh_dedup_index(spark, dst, idx)["skipped"] is True


def test_refresh_requires_build(spark, tables, tmp_path):
    _, dst, _ = tables
    bare = str(tmp_path / "bare")
    create_table(spark, read_table(spark, dst).limit(1)
                 .select(F.lit("00#x#y").alias(SIG_KEY)), bare, SIG_KEY)
    with pytest.raises(ValueError, match="src_version"):
        refresh_dedup_index(spark, dst, bare)


# --- WAP dup gate: the maintained index gating ingest ------------------------

def _clone_conv(spark, src, target, donor, batch_id):
    """CDC batch that rewrites conversation ``target`` to be a turn-for-
    turn copy of ``donor`` (upsert donor's turns under target's conv_id;
    delete target's surplus turns). Extraction is a pure per-conversation
    function of the turn stream, so target's re-extracted chunk TEXTS
    equal donor's indexed chunk texts exactly — identical minhash, all
    bands shared: the dup gate fires deterministically."""
    turns = read_table(spark, src)
    donor_rows = turns.where(F.col("conv_id") == donor)
    n_donor = donor_rows.count()
    clone = (donor_rows
             .withColumn("conv_id", F.lit(target))
             .withColumn("turn_key",
                         F.concat_ws("#", "conv_id",
                                     F.format_string("%06d", "turn_idx")))
             .withColumn("op", F.lit("upsert")))
    surplus = (turns.where((F.col("conv_id") == target)
                           & (F.col("turn_idx") >= n_donor))
               .withColumn("op", F.lit("delete")))
    merge_into(spark, src, clone.unionByName(surplus), batch_id=batch_id)


def test_wap_dup_gate_quarantines_cloned_content(spark, tables):
    """near_dup_audit as a WAP audit: a CDC batch whose re-extraction
    duplicates another conversation's indexed chunks is quarantined —
    main and the index stay bit-identical; the operator overrides by
    republishing without the gate, after which the index refresh equals
    a from-scratch rebuild."""
    from pdf_parser_spark.sources.dedup_index import near_dup_audit
    from pdf_parser_spark.sources.maintain import wap_refresh_extracted

    src, dst, idx = tables
    convs = sorted(r[0] for r in read_table(spark, src)
                   .select("conv_id").distinct().collect())
    target, donor = convs[0], convs[1]
    before = _rows(read_table(spark, dst).select("chunk_key"))
    idx_before = _rows(read_table(spark, idx))

    _clone_conv(spark, src, target, donor, batch_id=701)
    gate = {"near_dup": near_dup_audit(spark, idx)}
    out = wap_refresh_extracted(spark, src, dst, audits=gate)
    assert out["published"] is False
    assert out["audits"]["near_dup"] > 0
    assert read_manifest(dst).get("branches", {}) == {}
    assert _rows(read_table(spark, dst).select("chunk_key")) == before
    assert _rows(read_table(spark, idx)) == idx_before

    # operator decision: the duplication is intended — publish ungated
    # (quarantine re-opened the ledger), then advance the index
    out = wap_refresh_extracted(spark, src, dst)
    assert out["published"] is True
    refresh_dedup_index(spark, dst, idx)
    import uuid
    fresh = f"/tmp/idxfresh-{uuid.uuid4().hex[:8]}"
    build_dedup_index(spark, dst, fresh, **GEOM)
    assert _rows(read_table(spark, idx)) == _rows(read_table(spark, fresh))


def _dup_free_convs(spark, dst, idx):
    """Conversations with NO natural cross-conv near-dup chunk in the
    synthetic corpus (template text makes a few — seed 11 has one
    3-chunk mutual-dup clique), sorted. Editing one of those would
    correctly re-fire the gate on its unchanged chunks, which is the
    gate working, not the green path under test."""
    corpus = read_table(spark, dst)
    hits = dup_check_batch(spark, idx, corpus, id_col="chunk_key")
    conv = lambda c: F.expr(f"substring({c}, 1, length({c}) - 7)")
    dirty = set(r[0] for r in
                hits.where(conv("probe_id") != conv("dup_of"))
                .select(conv("probe_id")).distinct().collect())
    convs = sorted(r[0] for r in corpus.select("conv_id")
                   .distinct().collect())
    return [c for c in convs if c not in dirty]


def test_wap_dup_gate_passes_self_edits(spark, tables):
    """cross_conv_only: an ordinary edit re-emits chunks near the
    conversation's OWN indexed (pre-refresh) chunks — the gate must not
    flag those, or every edit would quarantine."""
    from pdf_parser_spark.sources.dedup_index import near_dup_audit
    from pdf_parser_spark.sources.maintain import wap_refresh_extracted

    src, dst, idx = tables
    turns = read_table(spark, src)
    conv = _dup_free_convs(spark, dst, idx)[0]
    # touch ONE turn, keep the rest: most re-extracted chunks are
    # bit-identical to their indexed selves (full-band self matches)
    first = (turns.where(F.col("conv_id") == conv)
             .orderBy("turn_idx").limit(1)
             .withColumn("text", F.lit("a genuinely novel edit with "
                                       "unique words zq1 zq2 zq3"))
             .withColumn("op", F.lit("upsert")))
    merge_into(spark, src, first, batch_id=702)
    out = wap_refresh_extracted(
        spark, src, dst,
        audits={"near_dup": near_dup_audit(spark, idx)})
    assert out["published"] is True
    assert out["audits"]["near_dup"] == 0


def test_lineage_refresher_maintains_and_gates_with_index(spark, tables):
    """make_lineage_refresher(dedup_idx_dir=..., dedup_gate_bands=...):
    green batches publish AND advance the index in lockstep; a cloned
    batch is quarantined with the index untouched."""
    from pdf_parser_spark.sources.maintain import make_lineage_refresher

    src, dst, idx = tables
    refresh = make_lineage_refresher(src, dst, wap=True,
                                     dedup_idx_dir=idx,
                                     dedup_gate_bands=1)
    turns = read_table(spark, src)
    convs = _dup_free_convs(spark, dst, idx)
    # green: a unique edit
    upd = (turns.where(F.col("conv_id") == convs[2])
           .withColumn("text", F.concat(F.lit("UNIQ-EDIT xq9 "), "text"))
           .withColumn("op", F.lit("upsert")))
    merge_into(spark, src, upd, batch_id=711)
    refresh(spark, {"version": read_manifest(src)["version"]})
    assert refresh.log[-1]["chunks"]["published"] is True
    assert read_manifest(idx)["src_version"] == \
        read_manifest(dst)["version"]

    # red: clone another conversation's content
    _clone_conv(spark, src, convs[3], convs[4], batch_id=712)
    idx_v = read_manifest(idx)["version"]
    dst_v = read_manifest(dst)["version"]
    refresh(spark, {"version": read_manifest(src)["version"]})
    assert refresh.log[-1]["chunks"]["published"] is False
    assert refresh.log[-1]["chunks"]["audits"]["near_dup"] > 0
    assert read_manifest(dst)["version"] == dst_v
    assert read_manifest(idx)["version"] == idx_v


def test_lineage_refresher_gate_requires_wap_and_index(spark):
    from pdf_parser_spark.sources.maintain import make_lineage_refresher
    with pytest.raises(ValueError, match="dedup_gate_bands"):
        make_lineage_refresher("s", "d", dedup_gate_bands=1)
    with pytest.raises(ValueError, match="dedup_gate_bands"):
        make_lineage_refresher("s", "d", wap=True, dedup_gate_bands=1)
