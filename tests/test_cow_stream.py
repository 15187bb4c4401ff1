"""cow_changes streaming data source: the changelog as a readStream,
offset = snapshot version, checkpoint-resumed across queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cow_stream import CowChangesDataSource
from pdf_parser_spark.sources.cowtable import (compact_table, create_table,
                                               merge_into, read_manifest,
                                               table_changes)


@pytest.fixture()
def docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "lang", "source", "text"))


def _mk_table(spark, docs, tmp_path):
    d = str(tmp_path / "t")
    create_table(spark, docs.repartitionByRange(4, "doc_id"), d, "doc_id")
    return d


def _merge(spark, docs, d, lo, hi, tag):
    ch = (docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
          .withColumn("text", F.concat(F.lit(tag), "text"))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, d, ch)


def _drain(spark, d, ckpt, name, starting_version=None):
    reader = (spark.readStream.format("cow_changes").option("path", d))
    if starting_version is not None:
        reader = reader.option("starting_version", starting_version)
    q = (reader.load().writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df):
    return sorted(
        (r.doc_id, r.lang, r.source, r.text, r.change_type,
         r.commit_version) for r in df.collect())


def test_stream_matches_batch_changelog(spark, docs, tmp_path):
    spark.dataSource.register(CowChangesDataSource)
    d = _mk_table(spark, docs, tmp_path)
    _merge(spark, docs, d, 0, 30, "A:")        # v2
    compact_table(spark, d, target_mb=64)      # v3 — zero changes
    _merge(spark, docs, d, 100, 120, "B:")     # v4

    got = _drain(spark, d, str(tmp_path / "ck1"), "cdc1",
                 starting_version=1)
    want = table_changes(spark, d, 1, 4) \
        .select("doc_id", "lang", "source", "text", "change_type",
                "commit_version")
    assert _rows(got) == _rows(want)
    assert got.where("commit_version = 3").count() == 0  # compaction


def test_stream_resumes_from_checkpoint(spark, docs, tmp_path):
    """A restarted query continues from the committed offset (Spark's
    own checkpoint): already-streamed commits are NOT replayed, new ones
    appear exactly once. File sink — memory sinks can't recover."""
    spark.dataSource.register(CowChangesDataSource)
    d = _mk_table(spark, docs, tmp_path)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (spark.readStream.format("cow_changes").option("path", d)
             .option("starting_version", 1).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out)

    _merge(spark, docs, d, 0, 10, "A:")        # v2
    first = _rows(drain())
    assert first and all(r[5] == 2 for r in first)

    _merge(spark, docs, d, 200, 210, "B:")     # v3
    assert read_manifest(d)["version"] == 3
    both = _rows(drain())
    assert [r for r in both if r[5] == 2] == first      # no replay
    new = [r for r in both if r[5] == 3]
    assert new and {r[3][:2] for r in new if r[4] == "insert"} == {"B:"}
    assert len(both) == len(first) + len(new)


def test_stream_default_start_is_current_version(spark, docs, tmp_path):
    spark.dataSource.register(CowChangesDataSource)
    d = _mk_table(spark, docs, tmp_path)
    _merge(spark, docs, d, 0, 10, "A:")        # v2, BEFORE stream start
    out = _drain(spark, d, str(tmp_path / "ck2"), "cdc_c")
    assert out.count() == 0                    # history not replayed


def test_stream_replays_history_across_schema_evolution(spark, docs,
                                                        tmp_path):
    """Pre-evolution commits replay under their commit-time schema and
    project BY NAME into the current one — no width mismatch, no
    misbound columns after drop+add."""
    from pdf_parser_spark.sources.cowtable import add_column, drop_column
    spark.dataSource.register(CowChangesDataSource)
    d = _mk_table(spark, docs, tmp_path)
    _merge(spark, docs, d, 0, 10, "A:")            # v2, pre-evolution
    drop_column(d, "source")
    add_column(d, "stars", "double")

    out = (spark.readStream.format("cow_changes").option("path", d)
           .option("starting_version", 1).load())
    assert out.columns == ["doc_id", "lang", "text", "stars",
                           "change_type", "commit_version"]
    q = (out.writeStream.format("memory").queryName("cdc_evo")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("cdc_evo").collect()
    ins = [r for r in rows if r.change_type == "insert"]
    assert ins and all(r.stars is None for r in rows)      # added col: NULL
    assert all(r.text.startswith("A:") for r in ins)       # not misbound


def test_mid_stream_evolution_keeps_declared_shape(spark, docs, tmp_path):
    """A schema evolved AFTER the stream started must not change the
    shape of yielded tuples: the reader projects to the schema the
    stream declared at start — an added column never appears, and a
    dropped column still yields (as None) at its declared position."""
    from pdf_parser_spark.sources.cow_stream import CowChangesStreamReader
    from pdf_parser_spark.sources.cowtable import add_column, drop_column

    d = _mk_table(spark, docs, tmp_path)
    declared = ["doc_id", "lang", "source", "text"]  # schema at start
    reader = CowChangesStreamReader(d, 1, declared)

    add_column(d, "stars", "double")  # v stays 1 (metadata commit)
    ch = (docs.limit(2)
          .withColumn("stars", F.lit(3.0))
          .withColumn("op", F.lit("upsert")))
    merge_into(spark, d, ch)  # v2, committed under the evolved schema
    steps = reader.partitions({"version": 1}, {"version": 2})
    rows = [t for st in steps for t in reader.read(st)]
    assert rows
    # arity pinned: 4 declared cols + change_type + commit_version;
    # 'stars' (added after stream start) never widens the tuples
    assert all(len(t) == len(declared) + 2 for t in rows)

    # dropped-column case: a NEW stream declared before the drop keeps
    # its position, reading None (never another column's values)
    drop_column(d, "source")
    ch2 = (docs.limit(1)
           .withColumn("text", F.lit("post-drop"))
           .withColumn("stars", F.lit(1.0))
           .withColumn("op", F.lit("upsert")).drop("source"))
    merge_into(spark, d, ch2)  # v3 under the source-less schema
    steps = reader.partitions({"version": 2}, {"version": 3})
    rows3 = [t for st in steps for t in reader.read(st)]
    assert rows3
    assert all(len(t) == len(declared) + 2 for t in rows3)
    ins = [t for t in rows3 if t[-2] == "insert" and t[3] == "post-drop"]
    assert ins and all(t[2] is None for t in ins)  # source -> None
