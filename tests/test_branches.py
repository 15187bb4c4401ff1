"""Branches + write-audit-publish on the copy-on-write table.

Branches are the MUTABLE half of the Iceberg ref model (tags are the
immutable half, test_cowtable.test_tags_pin_snapshots_through_vacuum):
writes target a branch head, main never sees them, and publish is a
metadata-only fast-forward. This is Iceberg's WAP (write-audit-publish)
staging pattern — the audit gate a 100 TB maintained table needs
between "the refresh ran" and "the serving layer reads it".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (ConcurrentCommitError,
                                               append_rows, compact_table,
                                               create_branch, create_table,
                                               drop_branch, fast_forward,
                                               merge_into, read_manifest,
                                               read_table, table_changes,
                                               vacuum)


def _digest(df):
    canon = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                                   F.lit("\x00"))
                                        for c in sorted(df.columns)]))
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.agg(F.sum(h).alias("s"), F.count("*").alias("n")).collect()[0]
    return (int(r.s) if r.s is not None else 0), int(r.n)


@pytest.fixture()
def docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "lang", "source", "text"))


@pytest.fixture()
def table(spark, docs, tmp_path):
    d = str(tmp_path / "t")
    create_table(spark, docs.repartitionByRange(4, "doc_id"), d, "doc_id")
    return d


def _upserts(docs, lo, hi, mark):
    return (docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("text", F.concat(F.lit(mark), "text"))
            .withColumn("op", F.lit("upsert")))


def test_branch_write_invisible_to_main_until_publish(spark, docs, table):
    create_branch(table, "audit")
    merge_into(spark, table, _upserts(docs, 0, 30, "B:"), branch="audit")
    # main unmoved, branch read sees the staged merge
    assert _digest(read_table(spark, table)) == _digest(docs)
    staged = read_table(spark, table, version="audit")
    assert staged.where(F.col("text").startswith("B:")).count() == \
        docs.where("doc_id < 30").count()
    ff = fast_forward(table, "audit")
    assert ff["from_version"] == 1
    assert _digest(read_table(spark, table)) == _digest(staged)
    m = read_manifest(table)
    assert m["version"] == ff["to_version"]
    # re-publish after more staging remains fast-forward (base moved)
    merge_into(spark, table, _upserts(docs, 30, 40, "C:"), branch="audit")
    fast_forward(table, "audit", drop=True)
    assert "audit" not in read_manifest(table).get("branches", {})
    got = read_table(spark, table)
    assert got.where(F.col("text").startswith("C:")).count() == \
        docs.where("doc_id >= 30 and doc_id < 40").count()


def test_drop_branch_removes_staging_and_unblocks_batch_ids(spark, docs,
                                                            table):
    create_branch(table, "audit")
    merge_into(spark, table, _upserts(docs, 0, 20, "X:"),
               branch="audit", batch_id=7)
    n_files_staged = len(read_manifest(table)["seq"])
    res = drop_branch(table, "audit")
    assert res["batch_ids_unapplied"] == [7]
    assert res["files_removed"] >= 1
    m = read_manifest(table)
    assert 7 not in m["applied"] and "audit" not in m.get("branches", {})
    assert len(m["seq"]) < n_files_staged
    # the aborted batch must be retryable on main (WAP abort contract)
    merge_into(spark, table, _upserts(docs, 0, 20, "X:"), batch_id=7)
    assert read_table(spark, table) \
        .where(F.col("text").startswith("X:")).count() == 20
    # shared files (carried from base) survived the drop
    assert _digest(read_table(spark, table, version=1)) == _digest(docs)


def test_publish_refuses_when_main_advanced(spark, docs, table):
    create_branch(table, "audit")
    merge_into(spark, table, _upserts(docs, 0, 10, "A:"), branch="audit")
    merge_into(spark, table, _upserts(docs, 50, 60, "M:"))  # main moves
    with pytest.raises(ConcurrentCommitError, match="not an ancestor"):
        fast_forward(table, "audit")
    # abort path: drop the stale branch, main's commit intact
    drop_branch(table, "audit")
    assert read_table(spark, table) \
        .where(F.col("text").startswith("M:")).count() == 10


def test_changelog_and_stream_skip_branch_snapshots(spark, docs, table):
    """Snapshot ids are global: a branch commit interleaves between two
    main commits. The main changelog must contain ONLY main's changes;
    the id-adjacent branch snapshot never leaks."""
    create_branch(table, "stage")
    merge_into(spark, table, _upserts(docs, 0, 5, "S:"), branch="stage")
    st = merge_into(spark, table, _upserts(docs, 100, 103, "M:"))
    log = table_changes(spark, table, 1, st["version"])
    texts = [r.text for r in log.where("change_type = 'insert'").collect()]
    assert len(texts) == 3 and all(t.startswith("M:") for t in texts)
    assert not any(t.startswith("S:") for t in texts)
    # endpoints on different chains are refused, not mis-diffed
    stage_head = read_manifest(table)["branches"]["stage"]["head"]
    with pytest.raises(ValueError, match="not an ancestor"):
        table_changes(spark, table, stage_head, st["version"])
    drop_branch(table, "stage")


def test_stream_reads_across_interleaved_branch_ids(spark, docs, table,
                                                    tmp_path):
    """cow_changes stream offsets are main versions; the partition walk
    must follow main's parent chain over an id gap left by a branch."""
    from pdf_parser_spark.sources.cow_stream import CowChangesDataSource
    spark.dataSource.register(CowChangesDataSource)
    create_branch(table, "stage")
    merge_into(spark, table, _upserts(docs, 0, 5, "S:"), branch="stage")
    st = merge_into(spark, table, _upserts(docs, 200, 204, "M:"))
    q = (spark.readStream.format("cow_changes")
         .option("path", table).option("starting_version", 1)
         .load()
         .writeStream.format("memory").queryName("branch_gap")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from branch_gap") \
        .where("change_type = 'insert'").collect()
    assert len(got) == 4
    assert all(r.text.startswith("M:") for r in got)
    assert all(r.commit_version == st["version"] for r in got)
    drop_branch(table, "stage")


def test_vacuum_keeps_branch_chain_and_publish_still_works(spark, docs,
                                                           table):
    create_branch(table, "audit")
    merge_into(spark, table, _upserts(docs, 0, 10, "A:"), branch="audit")
    merge_into(spark, table, _upserts(docs, 10, 20, "B:"), branch="audit")
    vacuum(table, keep_last=1)
    m = read_manifest(table)
    b = m["branches"]["audit"]
    # whole staging chain + base survived
    assert str(b["head"]) in m["snapshots"]
    assert str(b["base"]) in m["snapshots"]
    fast_forward(table, "audit", drop=True)
    got = read_table(spark, table)
    assert got.where(F.col("text").startswith("A:")).count() == 10
    assert got.where(F.col("text").startswith("B:")).count() == 10


def test_append_and_mor_on_branch(spark, docs, table):
    create_branch(table, "stage")
    extra = spark.createDataFrame(
        [(9_000_001, "en", "wap", "staged append")],
        "doc_id long, lang string, source string, text string")
    append_rows(spark, table, extra, branch="stage")
    dele = spark.createDataFrame([(0, None, None, None, "delete")],
                                 "doc_id long, lang string, source string, "
                                 "text string, op string")
    merge_into(spark, table, dele, branch="stage", strategy="mor")
    assert _digest(read_table(spark, table)) == _digest(docs)  # main clean
    staged = read_table(spark, table, version="stage")
    assert staged.where("doc_id = 9000001").count() == 1
    assert staged.where("doc_id = 0").count() == 0  # MOR mask on branch
    fast_forward(table, "stage", drop=True)
    assert _digest(read_table(spark, table)) == _digest(staged)


def test_branch_heads_race_detected_via_commit_seq(spark, docs, table):
    """Two writers staging on DIFFERENT refs still collide in the
    manifest file; main's version never moves, so only the commit
    counter can detect the lost update."""
    from pdf_parser_spark.sources.cowtable import _commit, _seq
    create_branch(table, "a")
    m_stale = read_manifest(table)
    seq0 = _seq(m_stale)
    merge_into(spark, table, _upserts(docs, 0, 5, "A:"), branch="a")
    with pytest.raises(ConcurrentCommitError, match="advanced commit"):
        _commit(table, m_stale, expected_seq=seq0)
    # compaction on main interleaves fine with a live branch — but it
    # moves main, so the branch is no longer fast-forwardable
    compact_table(spark, table)
    assert _digest(read_table(spark, table)) == _digest(docs)
    with pytest.raises(ConcurrentCommitError, match="not an ancestor"):
        fast_forward(table, "a")
    drop_branch(table, "a")


# --- rollback (metadata-only rewind of main) ---------------------------------

def test_rollback_rewinds_main_and_vacuum_reclaims(spark, docs, table):
    from pdf_parser_spark.sources.cowtable import rollback_table
    base = _digest(docs)
    merge_into(spark, table, _upserts(docs, 0, 20, "R1:"), batch_id=71)
    merge_into(spark, table, _upserts(docs, 20, 40, "R2:"), batch_id=72)
    out = rollback_table(table, 1)
    assert out["to_version"] == 1 and out["rolled_over"] == [3, 2]
    assert out["batch_ids_unapplied"] == [72, 71]
    assert _digest(read_table(spark, table)) == base
    m = read_manifest(table)
    assert m["version"] == 1 and m["applied"] == []
    # the rolled-over snapshots linger for inspection until vacuum,
    # which no longer sees them on main's ancestry
    assert {"1", "2", "3"} <= set(m["snapshots"])
    vacuum(table, keep_last=2)
    m = read_manifest(table)
    assert set(m["snapshots"]) == {"1"}
    # the un-applied batches land again (row-idempotent replay)
    merge_into(spark, table, _upserts(docs, 0, 20, "R1:"), batch_id=71)
    assert read_table(spark, table).where(
        F.col("text").startswith("R1:")).count() == \
        docs.where("doc_id < 20").count()


def test_rollback_to_tag_and_guardrails(spark, docs, table):
    from pdf_parser_spark.sources.cowtable import (create_tag,
                                                   rollback_table)
    merge_into(spark, table, _upserts(docs, 0, 10, "T:"))
    create_tag(table, "good")  # v2
    merge_into(spark, table, _upserts(docs, 10, 20, "BAD:"))
    out = rollback_table(table, "good")
    assert out["to_version"] == 2
    got = read_table(spark, table)
    assert got.where(F.col("text").startswith("BAD:")).count() == 0
    assert got.where(F.col("text").startswith("T:")).count() == \
        docs.where("doc_id < 10").count()
    # idempotent at the target; refuses non-ancestors (branch snapshots)
    assert rollback_table(table, 2).get("skipped") is True
    create_branch(table, "side")
    merge_into(spark, table, _upserts(docs, 50, 60, "S:"), branch="side")
    side_head = read_manifest(table)["branches"]["side"]["head"]
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_table(table, side_head)


def test_rollback_then_branch_restore_roundtrip(spark, docs, table):
    """Keep a path back: branch at the old head before rolling back;
    publishing that branch later is a plain fast_forward."""
    from pdf_parser_spark.sources.cowtable import rollback_table
    merge_into(spark, table, _upserts(docs, 0, 25, "K:"))
    head_digest = _digest(read_table(spark, table))
    create_branch(table, "keep")  # at v2 (old head)
    rollback_table(table, 1)
    assert _digest(read_table(spark, table)) == _digest(docs)
    fast_forward(table, "keep", drop=True)
    assert _digest(read_table(spark, table)) == head_digest


# --- inspection metadata tables -----------------------------------------------

def test_inspect_tables_reflect_history_refs_and_files(spark, docs,
                                                       table):
    from pdf_parser_spark.sources.cowtable import (create_tag,
                                                   inspect_files,
                                                   inspect_refs,
                                                   inspect_snapshots,
                                                   merge_into)
    merge_into(spark, table, _upserts(docs, 0, 10, "I:"), batch_id=61)
    create_tag(table, "pin")
    create_branch(table, "stage")
    merge_into(spark, table, _upserts(docs, 10, 20, "S:"),
               branch="stage", strategy="mor")

    snaps = {r["version"]: r.asDict()
             for r in inspect_snapshots(spark, table).collect()}
    assert snaps[1]["operation"] == "create"
    assert snaps[2]["operation"] == "merge" and snaps[2]["on_main"]
    assert snaps[2]["is_current"] and snaps[2]["batch_id"] == 61
    assert snaps[3]["branch"] == "stage" and not snaps[3]["on_main"]
    assert snaps[3]["parent"] == 2

    refs = {r["name"]: r.asDict()
            for r in inspect_refs(spark, table).collect()}
    assert refs["main"]["version"] == 2
    assert refs["pin"]["kind"] == "tag" and refs["pin"]["version"] == 2
    assert refs["stage"]["kind"] == "branch"
    assert refs["stage"]["version"] == 3 and refs["stage"]["base"] == 2

    files = inspect_files(spark, table).collect()
    assert all(not r["is_delete"] for r in files)  # main is cow-only
    assert sum(r["rows"] for r in files) == docs.count()
    assert all(r["bytes"] > 0 and r["key_min"] <= r["key_max"]
               for r in files)
    # the branch view carries the MOR delete file; ref resolution works
    bfiles = inspect_files(spark, table, version="stage").collect()
    assert any(r["is_delete"] for r in bfiles)
    with pytest.raises(ValueError, match="unknown ref"):
        inspect_files(spark, table, version="nope")
