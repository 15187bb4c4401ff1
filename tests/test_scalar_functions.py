"""Scalar column functions (SURVEY §2.8) vs their Python reference
semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_parser_spark.core.merge import linearize_table
from pdf_parser_spark.functions import (additive_keyword_score, bbox_height,
                                        bbox_width, chunk_id,
                                        distance_to_similarity, image_display,
                                        keyword_hit, null_safe_length,
                                        similarity_decay, table_linearize_sql,
                                        truncate_ellipsis)


def test_null_safe_length_and_chunk_id(spark):
    df = spark.createDataFrame(
        [("a.pdf", 0, "hello"), ("b.pdf", 3, None), ("c.pdf", 7, "")],
        "src string, idx int, text string")
    got = df.select(
        null_safe_length(F.col("text")).alias("n"),
        chunk_id(F.col("src"), F.col("idx")).alias("id")).collect()
    assert [r.n for r in got] == [5, 0, 0]
    for r, (src, idx, _) in zip(got, [("a.pdf", 0, 0), ("b.pdf", 3, 0),
                                      ("c.pdf", 7, 0)]):
        # C4: identical to hashlib (reference gea_qa_agent.py:109)
        assert r.id == hashlib.md5(f"{src}_{idx}".encode()).hexdigest()[:16]


def test_keyword_scoring_and_transforms(spark):
    df = spark.createDataFrame(
        [Row(text="Spark is Fast", meta="engine", src="conv_1",
             sim=0.5, dist=1.0)])
    got = df.select(
        additive_keyword_score(keyword_hit(F.col("text"), "SPARK"),
                               keyword_hit(F.col("meta"), "nope"),
                               keyword_hit(F.col("src"), "1")).alias("score"),
        distance_to_similarity(F.col("dist")).alias("s"),
        similarity_decay(F.col("sim")).alias("d"),
        truncate_ellipsis(F.col("text"), 5).alias("t"),
    ).collect()[0]
    assert abs(got.score - 0.7) < 1e-9
    assert abs(got.s - 0.5) < 1e-9 and abs(got.d - 0.4) < 1e-9
    assert got.t == "Spark..."


def test_image_display_and_bbox(spark):
    df = spark.createDataFrame(
        [("img_7", 1.0, 4.0, 2.0, 10.0), (None, 0.0, 0.0, 0.0, 0.0),
         ("", 2.0, 3.0, 1.0, 1.5)],
        "name string, x0 double, x1 double, top double, bottom double")
    got = df.select(image_display(F.col("name")).alias("disp"),
                    bbox_width(F.col("x0"), F.col("x1")).alias("w"),
                    bbox_height(F.col("top"), F.col("bottom")).alias("h")) \
        .collect()
    assert [r.disp for r in got] == ["图像: img_7", "图像: 未命名", "图像: 未命名"]
    assert [r.w for r in got] == [3.0, 0.0, 1.0]
    assert [(r.h) for r in got] == [8.0, 0.0, 0.5]


def test_table_linearize_sql_matches_python(spark):
    cells = [[["a", "b"], ["c", None]], [[], ["x", "y"]], [["1", "2.5"]]]
    df = spark.createDataFrame([(c,) for c in cells],
                               "cells array<array<string>>")
    got = [r.t for r in
           df.select(table_linearize_sql(F.col("cells")).alias("t")).collect()]
    exp = [linearize_table(c)[0] for c in cells]
    assert got == exp


def test_distance_to_similarity_pins_reference_formula(spark):
    # C7: sim = 1 / (1 + l2_distance), reference gea_qa_agent_chroma.py:177-179
    dists = [0.0, 0.25, 1.0, 3.0, 9.0, 123.456]
    df = spark.createDataFrame([(d,) for d in dists], "dist double")
    got = [r.s for r in
           df.select(distance_to_similarity(F.col("dist")).alias("s"))
             .collect()]
    for g, d in zip(got, dists):
        assert abs(g - 1.0 / (1.0 + d)) < 1e-12


def test_jsonl_round_trip_preserves_unicode_and_types(spark, tmp_path):
    from pdf_parser_spark.operators.export import read_jsonl, write_jsonl
    df = spark.createDataFrame(
        [(1, "数据 dedup\nline2", [1, 2]), (2, None, [])],
        "id int, text string, xs array<int>")
    p = str(tmp_path / "out.jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, "id int, text string, xs array<int>")
    a = sorted((r.id, r.text, list(r.xs)) for r in df.collect())
    b = sorted((r.id, r.text, list(r.xs) if r.xs is not None else None)
               for r in back.collect())
    # json has no [] vs NULL distinction for absent fields: Spark writes
    # [] and reads [] -> equality holds for our corpus shapes
    assert a == b
