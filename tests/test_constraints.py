"""CHECK constraints on the cow table (Delta's table-constraints
shape): per-commit row invariants enforced inside the merge path's
existing batch probe — a violating commit is refused atomically with
the table unchanged. Reference analog: the reference validates chunk
payloads before persisting (pdf_parser.py's per-page guards); this is
that promise attached to the TABLE so every writer inherits it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (append_rows, create_table,
                                               drop_column,
                                               drop_constraint,
                                               merge_into, read_manifest,
                                               read_table, set_constraint)


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


def _batch(docs, lo, hi, **cols):
    b = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    for c, v in cols.items():
        b = b.withColumn(c, v)
    return b.withColumn("op", F.lit("upsert"))


def test_violating_merge_refused_atomically(spark, docs, table):
    set_constraint(spark, table, "nonempty_text",
                   "length(text) > 0")
    before = _digest(read_table(spark, table))
    v0 = read_manifest(table)["version"]
    for strategy in ("cow", "mor"):
        with pytest.raises(ValueError, match="nonempty_text"):
            merge_into(spark, table,
                       _batch(docs, 0, 10, text=F.lit("")),
                       strategy=strategy)
    m = read_manifest(table)
    assert m["version"] == v0 and m["applied"] == []
    assert _digest(read_table(spark, table)) == before
    # a conforming merge still lands; deletes are exempt (NULL payload)
    ok = _batch(docs, 0, 10, text=F.concat(F.lit("ok "), "text"))
    dele = (docs.where("doc_id >= 10 and doc_id < 15")
            .withColumn("op", F.lit("delete")))
    merge_into(spark, table, ok.unionByName(dele))
    got = read_table(spark, table)
    assert got.where(F.col("text").startswith("ok ")).count() == \
        docs.where("doc_id < 10").count()
    assert got.where("doc_id >= 10 and doc_id < 15").count() == 0


def test_violating_append_refused(spark, docs, table):
    set_constraint(spark, table, "known_lang",
                   "lang in ('en','zh','de','fr','es','ja','ru','pt')")
    rows = (docs.limit(3)
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            .withColumn("lang", F.lit("xx")))
    with pytest.raises(ValueError, match="known_lang"):
        append_rows(spark, table, rows)
    assert read_manifest(table)["version"] == 1
    append_rows(spark, table, rows.withColumn("lang", F.lit("en")))
    assert read_table(spark, table).where(
        "doc_id >= 10000000").count() == 3


def test_null_passes_check_semantics(spark, docs, table):
    set_constraint(spark, table, "pos_len", "length(text) > 0")
    # NULL text: length() is NULL -> CHECK passes (SQL semantics)
    merge_into(spark, table,
               _batch(docs, 0, 5, text=F.lit(None).cast("string")))
    assert read_table(spark, table).where(
        "doc_id < 5 and text is null").count() == 5


def test_add_constraint_validates_existing_rows(spark, docs, table):
    with pytest.raises(ValueError, match="EXISTING"):
        set_constraint(spark, table, "impossible", "doc_id < 0")
    assert "constraints" not in read_manifest(table) or \
        "impossible" not in read_manifest(table).get("constraints", {})
    # validate=False skips the scan but still analysis-checks the expr
    with pytest.raises(Exception):
        set_constraint(spark, table, "broken", "no_such_col > 0",
                       validate=False)
    set_constraint(spark, table, "skipscan", "doc_id < 0",
                   validate=False)  # recorded despite existing rows
    assert read_manifest(table)["constraints"] == {"skipscan":
                                                   "doc_id < 0"}


def test_drop_constraint_and_drop_column_guard(spark, docs, table):
    set_constraint(spark, table, "nonempty_text", "length(text) > 0")
    with pytest.raises(ValueError, match="drop_constraint first"):
        drop_column(table, "text")
    drop_constraint(table, "nonempty_text")
    # the violating merge now lands
    merge_into(spark, table, _batch(docs, 0, 3, text=F.lit("")))
    assert read_table(spark, table).where("text = ''").count() == 3
    with pytest.raises(ValueError, match="not in table"):
        drop_constraint(table, "nonempty_text")
