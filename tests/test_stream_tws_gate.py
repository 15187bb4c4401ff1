"""transformWithStateInPandas rendition of the stateful streaming
extraction (streaming/stateful_extract_tws.py).

The full equality run is ENVIRONMENT-GATED: the API's Python<->JVM state
protocol needs the ``protobuf`` package (pyspark's
StateMessage_pb2 imports google.protobuf at query start), absent in this
sandbox — without it the query dies with "TransformWithStateInPySpark
driver worker exited unexpectedly (crashed)". The ungated tests below
cover what runs protobuf-free: construction-time validation and the
shared fold (identical by import to the exercised applyInPandasWithState
path)."""

from __future__ import annotations

import pytest

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.streaming.stateful_extract_tws import ExtractProcessor


def test_cleaning_mode_refused_at_construction():
    with pytest.raises(ValueError, match="clean_boilerplate"):
        ExtractProcessor(ExtractionConfig(clean_boilerplate=True))


def test_fold_shared_with_apipws_rendition():
    """Both streaming renditions import the SAME _fold_turn, so per-row
    semantics cannot diverge between the two APIs."""
    from pdf_parser_spark.streaming import stateful_extract, \
        stateful_extract_tws
    assert stateful_extract_tws._fold_turn is stateful_extract._fold_turn


def test_tws_equality_with_batch(spark, tmp_path):
    """Full gated run: split landing -> TWS stream == batch extraction."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf "
               "(unavailable in this sandbox; see module docstring)")
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.sources.synth import generate_transcripts
    from pdf_parser_spark.streaming.stateful_extract_tws import \
        stream_extract_tws
    from tests.conftest import TRANSCRIPT_SCHEMA

    rows = generate_transcripts(8, seed=13, max_turns=12)
    inp = tmp_path / "landing"; inp.mkdir()
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])
    for i in range(3):
        df = pd.DataFrame(rows[i::3],
                          columns=["conv_id", "turn_idx", "role", "text",
                                   "tool", "ts"])
        df["turn_idx"] = df["turn_idx"].astype("int32")
        df["ts"] = df["ts"].astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                            preserve_index=False),
                       str(inp / f"f{i}.parquet"))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    try:
        q = stream_extract_tws(spark, str(inp), str(tmp_path / "out"),
                               str(tmp_path / "ckpt"),
                               max_files_per_trigger=1)
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = sorted((r.conv_id, r.chunk_idx, r.text) for r in
                 spark.read.parquet(
                     str(tmp_path / "out" / "extracted")).collect())
    exp = sorted((r.conv_id, r.chunk_idx, r.text) for r in
                 extract_chunks(spark.createDataFrame(
                     rows, TRANSCRIPT_SCHEMA)).collect())
    assert got == exp
