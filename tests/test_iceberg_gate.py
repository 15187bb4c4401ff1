"""Iceberg integration: availability gate + DDL sanity.

The sandbox ships no Iceberg runtime, so the full create/append path is
exercised only when the jar is present (a real deployment); here we pin
the gate's behavior and the DDL contract the production wiring relies on.

Vendoring attempt (round 3, 2026-08-17): fetching
``iceberg-spark-runtime`` from public Maven (repo1.maven.org) fails at
DNS resolution — the sandbox has no outbound network (``curl`` exit 6,
``pip download`` likewise) — and no local jar exists anywhere on the
image (``find / -name '*iceberg*'``). The gate therefore stays; the
parquet dynamic-overwrite twin (tests/test_resume.py) remains the
executable evidence for the commit semantics.

Re-attempted round 4 (2026-08-18): still no DNS for repo1.maven.org or
the pip index (``pip download sentence-transformers`` → name resolution
failure), so the Iceberg jar, the real encoder, and PIL all remain
environment-gated this round too."""

from __future__ import annotations

import pytest

from pdf_parser_spark.sources import iceberg


def test_availability_gate_is_clean(spark):
    # must return a bool, never raise — this is what callers branch on
    assert iceberg.iceberg_available(spark) in (True, False)


def test_ddl_contract():
    ddl = iceberg.TRANSCRIPTS_DDL.format(table="cat.db.transcripts",
                                         n_buckets=4096)
    assert "bucket(4096, conv_id)" in ddl
    assert "USING iceberg" in ddl
    # sorted write order is what makes extract_chunks_bucketed's
    # conversation-complete-split contract hold straight off the scan
    assert "conv_id ASC, turn_idx ASC" in ddl
    for tmpl in (iceberg.EXTRACTED_DDL, iceberg.METRICS_DDL):
        assert "bucket(16, conv_id)" in tmpl.format(table="t", n_buckets=16)


def test_create_tables_when_available(spark, tmp_path):
    if not iceberg.iceberg_available(spark):
        pytest.skip("no Iceberg runtime in this environment")
    names = iceberg.create_tables(spark, "spark_catalog.default")
    assert set(names) == {"transcripts", "extracted", "metrics", "lineage"}
