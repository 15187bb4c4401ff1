"""Copy-on-write table: snapshot isolation, file-pruned MERGE, ledger
idempotence, compaction, vacuum. The local twin of the Iceberg v2
contracts the environment-blocked runtime jar would provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (compact_table, create_table,
                                               file_key_bounds, merge_into,
                                               read_manifest, read_table,
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
    # range layout => per-file doc_id footer ranges are disjoint, so
    # pruning is observable
    create_table(spark, docs.repartitionByRange(4, "doc_id"), d, "doc_id")
    return d


def _changes(spark, docs, lo, hi):
    """upserts rewriting text for keys in [lo, hi), plus one insert."""
    upd = (docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
           .withColumn("text", F.concat(F.lit("U:"), "text"))
           .withColumn("op", F.lit("upsert")))
    ins = spark.createDataFrame(
        [(10_000_000, "en", "cdc", "brand new row", "upsert")],
        "doc_id long, lang string, source string, text string, op string")
    return upd.unionByName(ins)


def test_create_read_roundtrip(spark, docs, table):
    assert _digest(read_table(spark, table)) == _digest(docs)
    m = read_manifest(table)
    assert m["version"] == 1 and m["key_col"] == "doc_id"


def test_merge_semantics_match_dataframe_merge(spark, docs, table):
    ch = _changes(spark, docs, 0, 40).unionByName(
        spark.createDataFrame([(450, None, None, None, "delete")],
                              "doc_id long, lang string, source string, "
                              "text string, op string"))
    stats = merge_into(spark, table, ch, batch_id=1)
    expected = (docs.where((F.col("doc_id") >= 40) | (F.col("doc_id") < 0))
                .where(F.col("doc_id") != 450)
                .unionByName(
                    docs.where(F.col("doc_id") < 40)
                    .withColumn("text", F.concat(F.lit("U:"), "text")))
                .unionByName(spark.createDataFrame(
                    [(10_000_000, "en", "cdc", "brand new row")],
                    "doc_id long, lang string, source string, text string")))
    assert _digest(read_table(spark, table)) == _digest(expected)
    assert stats["version"] == 2
    assert stats["batch_rows"] == ch.count()


def test_merge_prunes_untouched_files(spark, docs, table):
    m1 = read_manifest(table)
    files_v1 = set(m1["snapshots"]["1"]["files"])
    # keys 0..39 live in the lowest range file(s) only
    stats = merge_into(spark, table, _changes(spark, docs, 0, 40))
    m2 = read_manifest(table)
    files_v2 = set(m2["snapshots"]["2"]["files"])
    carried = files_v1 & files_v2
    assert stats["files_carried"] == len(carried) >= 2   # by-name carry
    assert stats["files_rewritten"] >= 1
    assert stats["files_rewritten"] < len(files_v1)      # pruning pruned


def test_footer_bounds_are_per_file_minmax(spark, docs, table):
    m = read_manifest(table)
    bounds = file_key_bounds(spark, table, m["snapshots"]["1"]["files"],
                             "doc_id")
    assert len(bounds) == len(m["snapshots"]["1"]["files"])
    lo = min(b["kmin"] for b in bounds)
    hi = max(b["kmax"] for b in bounds)
    r = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    assert (lo, hi) == (r[0], r[1])
    assert sum(b["rows"] for b in bounds) == docs.count()


def test_time_travel_and_ledger_idempotence(spark, docs, table):
    ch = _changes(spark, docs, 0, 10)
    merge_into(spark, table, ch, batch_id=7)
    again = merge_into(spark, table, ch, batch_id=7)   # replayed batch
    assert again["skipped"] is True
    assert read_manifest(table)["version"] == 2        # no new snapshot
    # v1 is still the pristine input
    assert _digest(read_table(spark, table, version=1)) == _digest(docs)


def test_merge_rejects_bad_batches(spark, docs, table):
    base = docs.limit(1).withColumn("op", F.lit("replace"))
    with pytest.raises(ValueError, match="unknown op"):
        merge_into(spark, table, base)
    dup = docs.limit(1).unionByName(docs.limit(1)) \
        .withColumn("op", F.lit("upsert"))
    with pytest.raises(ValueError, match="duplicate key"):
        merge_into(spark, table, dup)
    # failed merges never commit: version and rows intact
    assert read_manifest(table)["version"] == 1
    assert _digest(read_table(spark, table)) == _digest(docs)


def test_compact_table_and_vacuum(spark, docs, table):
    merge_into(spark, table, _changes(spark, docs, 0, 40))
    before = read_table(spark, table)
    d_before = _digest(before)
    c = compact_table(spark, table, target_mb=128)
    assert c["out_files"] == 1 and c["in_files"] > 1
    assert _digest(read_table(spark, table)) == d_before   # rows unchanged
    assert _digest(read_table(spark, table, version=1)) == _digest(docs)
    v = vacuum(table, keep_last=1)
    assert v["dropped_files"] >= 1
    assert _digest(read_table(spark, table)) == d_before   # current survives
    with pytest.raises(ValueError, match="version 1 not in table"):
        read_table(spark, table, version=1)


def test_null_op_rejected_loudly(spark, docs, table):
    """A NULL op must raise, not silently delete the key: `~isin` is NULL
    (not true) for NULL under three-valued logic, so an unguarded filter
    would let the row mark its file affected without contributing an
    upsert."""
    ch = spark.createDataFrame(
        [(5, "en", "cdc", "x", None)],
        "doc_id long, lang string, source string, text string, op string")
    before = _digest(read_table(spark, table))
    with pytest.raises(ValueError, match="NULL rejected"):
        merge_into(spark, table, ch)
    assert _digest(read_table(spark, table)) == before


def test_empty_snapshot_reads_after_vacuum(spark, docs, table):
    """Delete every row, vacuum away the only non-empty snapshot: the
    empty current snapshot must still read (schema from the manifest,
    not from some other snapshot's vacuumed files)."""
    ch = docs.select("doc_id").withColumn("lang", F.lit(None).cast("string")) \
             .withColumn("source", F.lit(None).cast("string")) \
             .withColumn("text", F.lit(None).cast("string")) \
             .withColumn("op", F.lit("delete"))
    merge_into(spark, table, ch)
    vacuum(table, keep_last=1)
    out = read_table(spark, table)
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "source", "text"]


def test_vacuum_commits_manifest_before_deleting(spark, docs, table, monkeypatch):
    """Crash-safety order: if deletion dies mid-way, the committed
    manifest must already exclude the dropped snapshots, so every listed
    file still exists."""
    import os

    import pdf_parser_spark.sources.cowtable as cow
    merge_into(spark, table, _changes(spark, docs, 0, 40))

    real_remove = os.remove
    def boom(path):
        raise OSError("disk pulled")
    monkeypatch.setattr(cow.os, "remove", boom)
    with pytest.raises(OSError):
        vacuum(table, keep_last=1)
    monkeypatch.setattr(cow.os, "remove", real_remove)

    m = read_manifest(table)
    assert sorted(m["snapshots"]) == ["2"]
    for f in m["snapshots"]["2"]["files"]:
        assert os.path.exists(os.path.join(table, f))
    # current snapshot fully readable despite the failed deletion
    assert read_table(spark, table).count() > 0


def test_table_changes_reconstructs_cdc(spark, docs, table):
    """v1 -> v2 changelog equals the applied batch: deletes as old rows,
    upserts as delete+insert (update) or bare insert (new key)."""
    from pdf_parser_spark.sources.cowtable import table_changes
    ch = _changes(spark, docs, 0, 40).unionByName(
        spark.createDataFrame([(450, None, None, None, "delete")],
                              "doc_id long, lang string, source string, "
                              "text string, op string"))
    merge_into(spark, table, ch)
    log = table_changes(spark, table, 1, 2)
    ins = {r.doc_id: r for r in log.where("change_type = 'insert'").collect()}
    dels = {r.doc_id: r for r in log.where("change_type = 'delete'").collect()}
    upd_keys = {r.doc_id for r in docs.where("doc_id >= 0 AND doc_id < 40")
                .collect()}
    # updates: delete of the old row + insert of the U: row
    assert upd_keys <= set(dels) and upd_keys <= set(ins)
    for k in upd_keys:
        assert ins[k].text.startswith("U:") and not dels[k].text.startswith("U:")
    # pure delete: old row out, nothing in
    assert 450 in dels and 450 not in ins
    # pure insert: new key in, nothing out
    assert 10_000_000 in ins and 10_000_000 not in dels
    # nothing else changed
    assert set(dels) == upd_keys | {450}
    assert set(ins) == upd_keys | {10_000_000}
    assert log.where("commit_version <> 2").count() == 0


def test_table_changes_across_compaction_is_empty(spark, docs, table):
    """A compaction snapshot renames every file but changes no rows: its
    changelog step contributes nothing, and a multi-step range spanning
    it still reconstructs the real CDC commits."""
    from pdf_parser_spark.sources.cowtable import table_changes
    merge_into(spark, table, _changes(spark, docs, 0, 20))       # v2
    compact_table(spark, table, target_mb=64)                    # v3
    merge_into(                                                  # v4
        spark, table,
        spark.createDataFrame([(7, "en", "cdc2", "late", "upsert")],
                              "doc_id long, lang string, source string, "
                              "text string, op string"))
    assert table_changes(spark, table, 2, 3).count() == 0
    span = table_changes(spark, table, 1, 4)
    assert span.where("commit_version = 3").count() == 0
    v4 = span.where("commit_version = 4")
    assert {(r.doc_id, r.change_type, r.text) for r in v4.collect()} == \
        {(7, "insert", "late"), (7, "delete", "U:" + [
            r.text for r in docs.where("doc_id = 7").collect()][0])}


def test_table_changes_validates_range(spark, docs, table):
    from pdf_parser_spark.sources.cowtable import table_changes
    with pytest.raises(ValueError, match="from_version < to_version"):
        table_changes(spark, table, 1, 1)
    with pytest.raises(ValueError, match="not in table"):
        table_changes(spark, table, 1, 9)


def test_manifest_stats_cached_and_match_footers(spark, docs, table):
    """Writers cache per-file key bounds in the manifest; the cached
    bounds are byte-equal to a fresh footer pass, merges extend the
    cache for their new files, and vacuum drops dropped files' entries."""
    m = read_manifest(table)
    files = m["snapshots"]["1"]["files"]
    assert set(m["stats"]) == set(files)
    key = lambda b: b["file"]  # noqa: E731
    cached = sorted(file_key_bounds(spark, table, files, "doc_id",
                                    manifest=m), key=key)
    fresh = sorted(file_key_bounds(spark, table, files, "doc_id"), key=key)
    assert cached == fresh

    merge_into(spark, table, _changes(spark, docs, 0, 40))
    m2 = read_manifest(table)
    assert set(m2["stats"]) >= set(m2["snapshots"]["2"]["files"])

    vacuum(table, keep_last=1)
    m3 = read_manifest(table)
    assert set(m3["stats"]) == set(m3["snapshots"]["2"]["files"])


def test_add_column_is_metadata_only(spark, docs, table):
    """Iceberg-style schema evolution: add_column touches no data file;
    old files read the new column as NULL; later merges carry it; time
    travel across the boundary keeps working."""
    import os

    from pdf_parser_spark.sources.cowtable import add_column

    files_before = {
        f: os.path.getmtime(os.path.join(table, f))
        for f in read_manifest(table)["snapshots"]["1"]["files"]}
    add_column(table, "stars", "double")
    m = read_manifest(table)
    # metadata-only: same files, untouched on disk
    assert m["snapshots"]["1"]["files"] == sorted(files_before) or \
        set(m["snapshots"]["1"]["files"]) == set(files_before)
    for f, mt in files_before.items():
        assert os.path.getmtime(os.path.join(table, f)) == mt

    out = read_table(spark, table)
    assert out.columns[-1] == "stars"
    assert out.where(F.col("stars").isNotNull()).count() == 0

    # a merge batch now carries the column
    ch = (read_table(spark, table).where("doc_id < 10")
          .withColumn("stars", F.lit(4.5))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, ch)
    cur = read_table(spark, table)
    assert cur.where("stars = 4.5").count() == 10
    assert cur.where("doc_id >= 10 AND stars IS NOT NULL").count() == 0
    # time travel: v1 reads with the evolved schema, all-NULL column
    v1 = read_table(spark, table, version=1)
    assert v1.where(F.col("stars").isNotNull()).count() == 0

    with pytest.raises(ValueError, match="already exists"):
        add_column(table, "stars", "double")


def test_drop_column_is_metadata_only(spark, docs, table):
    """Dropping projects the column away at read time (files untouched);
    the merge key is protected; rename does not exist by design."""
    from pdf_parser_spark.sources.cowtable import add_column, drop_column

    drop_column(table, "source")
    out = read_table(spark, table)
    assert "source" not in out.columns and out.count() == 500
    # merges now run on the narrowed schema
    ch = (out.where("doc_id < 5")
          .withColumn("text", F.concat(F.lit("D:"), "text"))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, ch)
    assert read_table(spark, table).where("text LIKE 'D:%'").count() == 5

    with pytest.raises(ValueError, match="merge key"):
        drop_column(table, "doc_id")
    with pytest.raises(ValueError, match="does not exist"):
        drop_column(table, "nope")
    # add-after-drop is REFUSED: by-name resolution would resurrect the
    # old bytes in unrewritten files (Iceberg's field-ID problem —
    # without field IDs, refusing is the only safe semantics)
    with pytest.raises(ValueError, match="resurrect"):
        add_column(table, "source", "string")
    add_column(table, "source_v2", "string")
    assert read_table(spark, table) \
        .where(F.col("source_v2").isNotNull()).count() == 0


def test_merge_conforms_batch_types_to_schema(spark, docs, table):
    """A batch column arriving at a narrower type (int for a double
    column) is cast to the manifest type before writing — otherwise the
    new data file's physical type would poison every schema-enforced
    read of the table."""
    from pdf_parser_spark.sources.cowtable import add_column
    add_column(table, "stars", "double")
    ch = (read_table(spark, table).where("doc_id < 5")
          .withColumn("stars", F.lit(4))          # INT, not double
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, ch)
    cur = read_table(spark, table)
    assert dict(cur.dtypes)["stars"] == "double"
    assert cur.where("stars = 4.0").count() == 5


def test_changelog_survives_drop_column(spark, docs, table):
    """History is not rewritten by schema evolution: a commit that only
    changed a later-dropped column still reports its changes (diff runs
    under the commit-time schema; output conforms to the current one)."""
    from pdf_parser_spark.sources.cowtable import drop_column, table_changes
    ch = (docs.where("doc_id < 8")
          .withColumn("source", F.lit("rewritten"))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, ch)                      # v2 changes ONLY source
    drop_column(table, "source")
    log = table_changes(spark, table, 1, 2)
    assert "source" not in log.columns               # presented in current schema
    assert log.where("change_type = 'insert'").count() == 8
    assert log.where("change_type = 'delete'").count() == 8


def test_create_rejects_duplicate_keys(spark, docs, tmp_path):
    d = str(tmp_path / "dup")
    with pytest.raises(ValueError, match="duplicate doc_id"):
        create_table(spark, docs.unionByName(docs.limit(3)), d, "doc_id")


def test_merge_refuses_uncastable_batch_values(spark, docs, table):
    """A batch value the manifest-type cast cannot convert must raise —
    a permissive cast would write NULL over real data."""
    from pdf_parser_spark.sources.cowtable import add_column
    add_column(table, "stars", "double")
    ch = (read_table(spark, table).where("doc_id < 3")
          .withColumn("stars", F.lit("n/a"))       # uncastable string
          .withColumn("op", F.lit("upsert")))
    with pytest.raises(ValueError, match="cannot cast"):
        merge_into(spark, table, ch)
    assert read_manifest(table)["version"] == 1    # nothing committed


def test_changelog_insert_only_commit_across_evolution(spark, docs, table):
    """A pure-insert commit (no affected files -> empty removed side)
    replayed AFTER an add_column must not crash: the insert-only branch
    reads under the commit-time schema and conforms to the current one."""
    from pdf_parser_spark.sources.cowtable import add_column, table_changes
    ins = spark.createDataFrame(
        [(20_000_000, "en", "cdc", "pure insert", "upsert")],
        "doc_id long, lang string, source string, text string, op string")
    merge_into(spark, table, ins)                  # v2: insert-only
    add_column(table, "stars", "double")
    log = table_changes(spark, table, 1, 2).collect()
    assert [(r.doc_id, r.change_type, r.stars) for r in log] == \
        [(20_000_000, "insert", None)]


# --- merge-on-read (equality deletes) ---------------------------------------

def _mor_batch(spark, docs, lo, hi):
    """Same shape as _changes plus a delete, for the MOR tests."""
    ch = _changes(spark, docs, lo, hi)
    dels = (docs.where(F.col("doc_id") % 17 == 4)
            .withColumn("op", F.lit("delete")))
    return ch.unionByName(dels).where(
        ~((F.col("op") == "upsert") & (F.col("doc_id") % 17 == 4)))


def test_mor_merge_reads_equal_to_cow_merge(spark, docs, tmp_path):
    """The two strategies are semantically identical: same batch on two
    copies of one table must read back digest-equal — and the MOR
    commit must rewrite NOTHING."""
    dc, dm = str(tmp_path / "cow"), str(tmp_path / "mor")
    for d in (dc, dm):
        create_table(spark, docs.repartitionByRange(4, "doc_id"), d,
                     "doc_id")
    ch = _mor_batch(spark, docs, 0, 40)
    sc = merge_into(spark, dc, ch, strategy="cow")
    sm = merge_into(spark, dm, ch, strategy="mor")
    assert sc["files_rewritten"] > 0
    assert sm["files_rewritten"] == 0
    assert sm["files_carried"] == 4          # every data file by name
    assert sm["delete_files_added"] == 1
    assert _digest(read_table(spark, dm)) == _digest(read_table(spark, dc))


def test_mor_time_travel_and_reinsert_lifecycle(spark, docs, table):
    """delete (mor) -> reinsert (mor) -> delete (mor): the seq rule
    keeps exactly the right copy live at each version."""
    row = read_table(spark, table).where("doc_id = 7")
    assert row.count() == 1
    d1 = row.withColumn("op", F.lit("delete"))
    merge_into(spark, table, d1, strategy="mor")               # v2
    assert read_table(spark, table).where("doc_id = 7").count() == 0
    re = (row.withColumn("text", F.lit("back"))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, re, strategy="mor")               # v3
    got = read_table(spark, table).where("doc_id = 7").collect()
    assert [r.text for r in got] == ["back"]
    merge_into(spark, table, d1, strategy="mor")               # v4
    assert read_table(spark, table).where("doc_id = 7").count() == 0
    # time travel sees each intermediate state
    assert read_table(spark, table, version=1) \
        .where("doc_id = 7").count() == 1
    assert read_table(spark, table, version=2) \
        .where("doc_id = 7").count() == 0
    assert [r.text for r in read_table(spark, table, version=3)
            .where("doc_id = 7").collect()] == ["back"]


def test_cow_merge_after_mor_does_not_revive_masked_rows(spark, docs,
                                                         table):
    """A cow rewrite of files holding MASKED rows must apply the masks
    first — a naive rewrite would resurrect equality-deleted rows."""
    dels = (docs.where(F.col("doc_id") < 30)
            .withColumn("op", F.lit("delete")))
    merge_into(spark, table, dels, strategy="mor")             # v2
    # cow-touch the same key range (upsert OTHER keys living in the
    # same range-partitioned files)
    upd = (docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
           .withColumn("text", F.lit("cowtouch"))
           .withColumn("op", F.lit("upsert")))
    st = merge_into(spark, table, upd, strategy="cow")         # v3
    assert st["files_rewritten"] > 0
    t = read_table(spark, table)
    assert t.where("doc_id < 30").count() == 0                 # not revived
    assert t.where("doc_id >= 30 and doc_id < 60 and text = 'cowtouch'") \
        .count() == upd.count()


def test_compact_purges_deletes_and_preserves_rows(spark, docs, table):
    merge_into(spark, table, _mor_batch(spark, docs, 0, 40),
               strategy="mor")                                 # v2
    before = _digest(read_table(spark, table))
    res = compact_table(spark, table, target_mb=128)
    m = read_manifest(table)
    snap = m["snapshots"][str(res["version"])]
    assert not snap.get("deletes")                             # purged
    assert m["snapshots"][str(res["version"])]["compaction"][
        "purged_delete_files"] == 1
    assert _digest(read_table(spark, table)) == before


def test_mor_changelog_matches_cow_changelog(spark, docs, tmp_path):
    """table_changes over a MOR commit reconstructs the same CDC rows
    the cow strategy produces for the same batch (unchanged-upsert
    cancellation included)."""
    from pdf_parser_spark.sources.cowtable import table_changes
    dc, dm = str(tmp_path / "cow"), str(tmp_path / "mor")
    for d in (dc, dm):
        create_table(spark, docs.repartitionByRange(4, "doc_id"), d,
                     "doc_id")
    ch = _mor_batch(spark, docs, 0, 40)
    # plant an unchanged upsert: same row re-upserted, must cancel
    unchanged = (docs.where("doc_id = 401")
                 .withColumn("op", F.lit("upsert")))
    ch = ch.where("doc_id <> 401").unionByName(unchanged)
    merge_into(spark, dc, ch, strategy="cow")
    merge_into(spark, dm, ch, strategy="mor")
    lc = table_changes(spark, dc, 1, 2)
    lm = table_changes(spark, dm, 1, 2)
    assert _digest(lm) == _digest(lc)
    assert lm.where("doc_id = 401").count() == 0               # cancelled


def test_mor_vacuum_keeps_needed_delete_files(spark, docs, table):
    import os
    merge_into(spark, table, _mor_batch(spark, docs, 0, 40),
               strategy="mor")                                 # v2
    before = _digest(read_table(spark, table))
    vacuum(table, keep_last=1)                                 # drop v1
    m = read_manifest(table)
    snap = m["snapshots"][str(m["version"])]
    for e in snap.get("deletes", []):                          # still live
        assert os.path.exists(os.path.join(table, e["file"]))
    assert _digest(read_table(spark, table)) == before
    # after compaction + vacuum the delete file itself is reclaimed
    compact_table(spark, table)                                # v3
    dels = [e["file"] for e in snap.get("deletes", [])]
    vacuum(table, keep_last=1)
    for f in dels:
        assert not os.path.exists(os.path.join(table, f))


def test_mor_stream_replays_equality_delete_commits(spark, docs,
                                                    tmp_path):
    """cow_changes streams a MOR commit: masked rows surface as deletes
    even though every data file was carried by name."""
    from pdf_parser_spark.sources.cow_stream import CowChangesDataSource
    from pdf_parser_spark.sources.cowtable import table_changes
    spark.dataSource.register(CowChangesDataSource)
    d = str(tmp_path / "t")
    create_table(spark, docs.repartitionByRange(4, "doc_id"), d,
                 "doc_id")
    merge_into(spark, d, _mor_batch(spark, docs, 0, 40),
               strategy="mor", batch_id=1)                     # v2
    out = (spark.readStream.format("cow_changes").option("path", d)
           .option("starting_version", 1).load())
    q = (out.writeStream.format("memory").queryName("cdc_mor")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("cdc_mor").drop("commit_version")
    want = table_changes(spark, d, 1, 2).drop("commit_version")
    assert _digest(got) == _digest(want)
    assert got.where("change_type = 'delete'").count() > 0


def test_rewrite_masked_files_is_targeted(spark, docs, table):
    """Masks confined to one range file: the rewrite touches that file
    only, carries the rest, purges the delete files, keeps the digest."""
    from pdf_parser_spark.sources.cowtable import rewrite_masked_files
    dels = (docs.where(F.col("doc_id") < 50)       # first range file only
            .withColumn("op", F.lit("delete")))
    merge_into(spark, table, dels, strategy="mor")
    before = _digest(read_table(spark, table))
    st = rewrite_masked_files(spark, table)
    assert st["files_rewritten"] == 1 and st["files_carried"] == 3
    assert st["delete_files_purged"] == 1
    m = read_manifest(table)
    assert not m["snapshots"][str(m["version"])].get("deletes")
    assert _digest(read_table(spark, table)) == before
    # idempotent: nothing left to rewrite
    assert rewrite_masked_files(spark, table)["skipped"] is True


def test_concurrent_commit_detected(spark, docs, table):
    """Optimistic concurrency: a writer whose base version was
    overtaken must raise, not silently overwrite the other writer's
    snapshot. Simulated by interleaving a second merge between the
    first writer's manifest read and its commit."""
    from pdf_parser_spark.sources.cowtable import (ConcurrentCommitError,
                                                   _commit)
    from pdf_parser_spark.sources.cowtable import _seq
    m_stale = read_manifest(table)             # writer A reads v1
    seq0 = _seq(m_stale)
    ch = (docs.where("doc_id < 5")
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, table, ch)               # writer B commits v2
    m_stale["version"] = 2                     # A builds its v2...
    with pytest.raises(ConcurrentCommitError, match="advanced commit"):
        _commit(table, m_stale, expected_seq=seq0)
    assert read_manifest(table)["version"] == 2   # B's commit intact


def test_clustered_compaction_honors_file_plan_beyond_cardinality(
        spark, docs, tmp_path):
    """cluster_by with a LOW-cardinality column must not cap the output
    file count at its distinct-value count: range layout over (cluster
    cols, key) honors the target_mb plan AND keeps each file's cluster
    bounds tight (a file straddles at most one cell boundary)."""
    from pdf_parser_spark.sources.cowtable import read_manifest as _rm
    d = str(tmp_path / "lowcard")
    # big enough that plan_n_files(total, 1MB) >> 4 cells; incompressible
    # payload so parquet bytes track row count
    four_cells = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("cell"),
        F.sha2(F.concat(F.lit("pay"), F.col("id").cast("string")), 512)
        .alias("text"))
    create_table(spark, four_cells.repartitionByRange(8, "doc_id"),
                 d, "doc_id", stats_cols=["cell"])
    before = _digest(read_table(spark, d))
    # tiny target forces a plan well above the 4-value cardinality
    r = compact_table(spark, d, target_mb=1, cluster_by=["cell"])
    assert r["out_files"] > 4, \
        f"file plan capped at cluster cardinality: {r}"
    assert _digest(read_table(spark, d)) == before
    # per-file cell bounds stay tight: width <= 1 adjacent cell
    m = _rm(d)
    cs = m["colstats"]["cell"]
    cur = m["snapshots"][str(m["version"])]["files"]
    widths = [cs[f][1] - cs[f][0] for f in cur if f in cs]
    assert widths and max(widths) <= 1


def test_remove_orphan_files_sweeps_losers_not_live_data(spark, docs,
                                                         table):
    """The losing concurrent writer's debris: data files referenced by
    no manifest, a crashed _staging dir, a bloom sidecar with no
    manifest entry. remove_orphan_files reclaims exactly those (past
    the mtime grace window) and never touches referenced files."""
    import os
    import time
    from pdf_parser_spark.sources.cowtable import (read_manifest,
                                                   remove_orphan_files)
    d = table
    # plant orphans: a fake data file, a fake bloom sidecar, a staging
    # dir — all with old mtimes; plus a YOUNG orphan that must survive
    os.makedirs(os.path.join(d, "_blooms"), exist_ok=True)
    old = time.time() - 7200
    for rel in ("data/loser-commit.parquet", "_blooms/loser.bloom"):
        p = os.path.join(d, rel)
        with open(p, "wb") as fh:
            fh.write(b"debris")
        os.utime(p, (old, old))
    young = os.path.join(d, "data", "inflight.parquet")
    with open(young, "wb") as fh:
        fh.write(b"in-flight writer")
    st = os.path.join(d, "_staging-deadbeef")
    os.makedirs(st)
    os.utime(st, (old, old))
    before = _digest(read_table(spark, d))
    r = remove_orphan_files(d, older_than_s=3600)
    assert r == {"removed_files": 2, "removed_staging_dirs": 1}
    assert not os.path.exists(os.path.join(d, "data",
                                           "loser-commit.parquet"))
    assert not os.path.exists(os.path.join(d, "_blooms", "loser.bloom"))
    assert os.path.exists(young)        # inside the grace window
    assert not os.path.exists(st)
    # every referenced file intact: reads identical
    assert _digest(read_table(spark, d)) == before
    # old snapshots still time-travelable (their files are referenced)
    m = read_manifest(d)
    for v in m["snapshots"]:
        assert read_table(spark, d, version=int(v)).count() > 0


def test_tags_pin_snapshots_through_vacuum(spark, docs, table):
    """Iceberg tag refs: reads resolve the name, vacuum never reclaims
    a tagged version, dropping the tag releases it."""
    from pdf_parser_spark.sources.cowtable import create_tag, drop_tag
    d = table
    v1_digest = _digest(read_table(spark, d))
    create_tag(d, "prod")                       # pins v1
    merge_into(spark, d, _changes(spark, docs, 0, 30), batch_id=1)
    merge_into(spark, d, _changes(spark, docs, 30, 60)
               .withColumn("text", F.concat(F.lit("2"), "text")),
               batch_id=2)
    assert read_manifest(d)["version"] == 3
    # read by tag == read by pinned version
    assert _digest(read_table(spark, d, version="prod")) == v1_digest
    with pytest.raises(ValueError, match="ref 'nope' not in table"):
        read_table(spark, d, version="nope")
    # vacuum keeps the tagged v1 alongside the current v3; v2 goes
    v = vacuum(d, keep_last=1)
    m = read_manifest(d)
    assert sorted(int(x) for x in m["snapshots"]) == [1, 3]
    assert v["dropped_files"] >= 1
    assert _digest(read_table(spark, d, version="prod")) == v1_digest
    # re-tagging moves the name in one commit (promote)
    create_tag(d, "prod", version=3)
    assert _digest(read_table(spark, d, version="prod")) == \
        _digest(read_table(spark, d))
    # v1 now untagged: the next vacuum reclaims it
    vacuum(d, keep_last=1)
    assert sorted(read_manifest(d)["snapshots"]) == ["3"]
    with pytest.raises(ValueError, match="version 1 not in table"):
        read_table(spark, d, version=1)
    drop_tag(d, "prod")
    with pytest.raises(ValueError, match="not in table"):
        read_table(spark, d, version="prod")


def test_age_based_retention(spark, docs, table):
    """vacuum(older_than_s=...): every commit stamps its snapshot, and
    age-based retention keeps young snapshots the count alone would
    drop — 'one blessed snapshot plus a window of time travel'."""
    import json as _json
    import os as _os
    import time as _time

    from pdf_parser_spark.sources.cowtable import inspect_snapshots

    merge_into(spark, table, _changes(spark, docs, 0, 10), batch_id=41)
    merge_into(spark, table, _changes(spark, docs, 10, 20), batch_id=42)
    snaps = read_manifest(table)["snapshots"]
    assert all("ts" in s for s in snaps.values())  # stamped at commit
    ts_col = dict(inspect_snapshots(spark, table)
                  .select("version", "committed_at").collect())
    assert all(v is not None for v in ts_col.values())

    # all three commits are seconds old: a week-long window keeps them
    v = vacuum(table, keep_last=1, older_than_s=7 * 86400)
    assert sorted(int(k) for k in
                  read_manifest(table)["snapshots"]) == [1, 2, 3]
    assert v["dropped_files"] == 0

    # age v1 artificially past the window: count keeps only the head,
    # age keeps v2+v3, so v1 goes
    m = read_manifest(table)
    m["snapshots"]["1"]["ts"] = _time.time() - 10 * 86400
    with open(_os.path.join(table, "manifest.json"), "w") as fh:
        _json.dump(m, fh)
    vacuum(table, keep_last=1, older_than_s=7 * 86400)
    assert sorted(int(k) for k in
                  read_manifest(table)["snapshots"]) == [2, 3]
    # and without the age window, plain count retention still applies
    vacuum(table, keep_last=1)
    assert sorted(int(k) for k in
                  read_manifest(table)["snapshots"]) == [3]
