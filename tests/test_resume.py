"""Resume test (SURVEY.md §5.5): kill after k buckets, restart, outputs
identical to an uninterrupted run, no bucket reprocessed."""

from __future__ import annotations

from pdf_parser_spark.config import DEFAULT_CONFIG
from pdf_parser_spark.sources.lineage import (read_extracted, read_lineage,
                                              run_extraction)
from pdf_parser_spark.sources.synth import write_transcripts_parquet


def _rows(df):
    return sorted((r.conv_id, r.chunk_idx, r.turn_idx, r.chunk_type, r.text,
                   r.char_count, tuple(r.block_indices))
                  for r in df.collect())


def test_interrupted_run_resumes_without_reprocessing(spark, tmp_path):
    src = str(tmp_path / "transcripts.parquet")
    write_transcripts_parquet(src, n_convs=30, seed=5)

    # uninterrupted reference run
    full_dir = str(tmp_path / "full")
    res = run_extraction(spark, src, full_dir, DEFAULT_CONFIG,
                         n_buckets=8, buckets_per_job=3)
    assert res.processed_buckets == list(range(8))
    expected = _rows(read_extracted(spark, full_dir).drop("bucket_id"))
    assert expected

    # interrupted run: only the first job group completes
    part_dir = str(tmp_path / "part")
    res1 = run_extraction(spark, src, part_dir, DEFAULT_CONFIG,
                          n_buckets=8, buckets_per_job=3, max_jobs=1)
    assert res1.processed_buckets == [0, 1, 2]
    lineage1 = {(r.bucket_id, r.finished_ts)
                for r in read_lineage(spark, part_dir).collect()}
    assert {b for b, _ in lineage1} == {0, 1, 2}

    # resume completes the remainder and skips done buckets
    res2 = run_extraction(spark, src, part_dir, DEFAULT_CONFIG,
                          n_buckets=8, buckets_per_job=3, resume=True)
    assert res2.skipped_buckets == [0, 1, 2]
    assert res2.processed_buckets == [3, 4, 5, 6, 7]

    # done buckets were not reprocessed: their lineage rows are unchanged
    lineage2 = {(r.bucket_id, r.finished_ts)
                for r in read_lineage(spark, part_dir).collect()}
    assert lineage1 <= lineage2
    assert {b for b, _ in lineage2} == set(range(8))

    # final output identical to the uninterrupted run
    assert _rows(read_extracted(spark, part_dir).drop("bucket_id")) == expected


def test_lineage_carries_per_bucket_costs(spark, tmp_path):
    """Buckets in one job group must carry DISTINGUISHABLE wall costs
    (char-weighted attribution of the measured group wall), not one
    group-wide stamp — the skew-forensics signal at 4096 buckets. The
    raw group measurement is preserved in group_wall_sec."""
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=24, seed=3)
    out = str(tmp_path / "out")
    run_extraction(spark, src, out, DEFAULT_CONFIG, n_buckets=4,
                   buckets_per_job=4)
    rows = read_lineage(spark, out).collect()
    assert len(rows) == 4
    group_wall = rows[0].group_wall_sec
    assert all(r.group_wall_sec == group_wall for r in rows)
    # attribution: proportional to n_chars, sums back to the group wall
    total_chars = sum(r.n_chars for r in rows)
    for r in rows:
        assert abs(r.wall_sec - group_wall * r.n_chars / total_chars) < 1e-9
    assert abs(sum(r.wall_sec for r in rows) - group_wall) < 1e-6
    # distinguishable: bucket char counts differ, so must the costs
    assert len({r.wall_sec for r in rows}) > 1


def test_rerun_of_done_bucket_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=12, seed=9)
    out = str(tmp_path / "out")
    run_extraction(spark, src, out, DEFAULT_CONFIG, n_buckets=4,
                   buckets_per_job=4)
    before = _rows(read_extracted(spark, out).drop("bucket_id"))
    # simulate the crash-between-data-and-lineage case: force reprocess all
    run_extraction(spark, src, out, DEFAULT_CONFIG, n_buckets=4,
                   buckets_per_job=4, resume=False)
    after = _rows(read_extracted(spark, out).drop("bucket_id"))
    assert after == before  # dynamic partition overwrite, no duplicates


def test_full_metrics_blocks_kept_dropped(spark, tmp_path):
    """North-rule metrics: blocks kept / lines dropped per conversation."""
    from pdf_parser_spark.config import CLEANING_CONFIG, DEFAULT_CONFIG
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.pipeline import full_metrics
    from pdf_parser_spark.sources.synth import generate_transcripts

    rows = generate_transcripts(20, seed=5, max_turns=32)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    # parity mode: nothing may be dropped; blocks_kept == sum(block_count)
    m = full_metrics(df, extract_chunks(df, DEFAULT_CONFIG),
                     DEFAULT_CONFIG).collect()
    assert m and all(r.lines_dropped == 0 for r in m)
    from pyspark.sql import functions as F
    kept = {r.conv_id: r.s for r in
            extract_chunks(df, DEFAULT_CONFIG).groupBy("conv_id")
            .agg(F.sum("block_count").alias("s")).collect()}
    for r in m:
        assert r.blocks_kept == kept.get(r.conv_id, 0)
        assert r.n_turns == sum(1 for x in rows if x["conv_id"] == r.conv_id)

    # cleaning mode: the synthetic corpus has headers/footers/nav lines in
    # most conversations -> drops must occur somewhere
    mc = full_metrics(df, extract_chunks(df, CLEANING_CONFIG),
                      CLEANING_CONFIG).collect()
    assert sum(r.lines_dropped for r in mc) > 0
    assert all(r.lines_dropped <= r.lines_total for r in mc)


def test_extract_with_embeddings_composition(spark, tmp_path):
    from pdf_parser_spark.config import DEFAULT_CONFIG
    from pdf_parser_spark.pipeline import extract_with_embeddings
    from pdf_parser_spark.sources.synth import generate_transcripts

    rows = generate_transcripts(10, seed=3, max_turns=16)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    embedded, metrics = extract_with_embeddings(df, DEFAULT_CONFIG, dim=16)
    e = embedded.collect()
    assert e and all(len(r.embedding) == 16 for r in e)
    assert all(r.token_count == len(r.text or "") for r in e)
    m = {r.conv_id: r for r in metrics.collect()}
    from pyspark.sql import functions as F
    chunk_counts = {r.conv_id: r.n for r in
                    embedded.groupBy("conv_id")
                    .agg(F.count("*").alias("n")).collect()}
    for conv, r in m.items():
        assert r.total_chunks == chunk_counts.get(conv, 0)


def test_run_extraction_with_dirty_rows(spark, tmp_path):
    """A checkpointed production run over input containing null-keyed rows
    completes (rows dropped per the shared gate) and produces the same
    output as the clean subset."""
    import pandas as pd
    from pdf_parser_spark.sources.synth import generate_transcripts

    clean = generate_transcripts(10, seed=21, max_turns=6)
    dirty = clean + [
        {"conv_id": None, "turn_idx": 1, "role": "user", "text": "junk",
         "tool": None, "ts": None},
        {"conv_id": "conv_x", "turn_idx": None, "role": "user", "text": "j2",
         "tool": None, "ts": None},
    ]
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    clean_src = str(tmp_path / "clean.parquet")
    dirty_src = str(tmp_path / "dirty.parquet")
    spark.createDataFrame(clean, ddl).write.parquet(clean_src)
    spark.createDataFrame(dirty, ddl).write.parquet(dirty_src)

    out_c = str(tmp_path / "out_clean")
    out_d = str(tmp_path / "out_dirty")
    run_extraction(spark, clean_src, out_c, DEFAULT_CONFIG, n_buckets=4,
                   buckets_per_job=4)
    run_extraction(spark, dirty_src, out_d, DEFAULT_CONFIG, n_buckets=4,
                   buckets_per_job=4)
    assert (_rows(read_extracted(spark, out_d).drop("bucket_id"))
            == _rows(read_extracted(spark, out_c).drop("bucket_id")))
    # metrics landed too, one row per (surviving) conversation
    md = spark.read.parquet(f"{out_d}/metrics")
    assert md.count() == 10
