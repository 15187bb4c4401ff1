"""fsck_table: a healthy table (merges, MOR deletes, branches, tags,
blooms, constraints) verifies clean; every seeded corruption class is
detected — missing/truncated files, stale cached key bounds (the
silent wrong-pruning case), dangling refs, data-invariant breaks —
and harmless states (orphans, lost sidecars) stay warnings."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (create_branch, create_table,
                                               create_tag, merge_into,
                                               read_manifest, set_constraint)
from pdf_parser_spark.sources.fsck import fsck_table


def _mk(spark, tmp_path, name="t", bloom=False):
    d = str(tmp_path / name)
    rows = [(f"k{i:04d}", i, f"text {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id string, n int, text string")
    create_table(spark, df.repartitionByRange(4, "id"), d, "id",
                 **({"bloom_cols": ["id"]} if bloom else {}))
    return d


def _manifest_edit(d, fn):
    m = read_manifest(d)
    fn(m)
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(m, fh)


def test_healthy_table_verifies_clean(spark, tmp_path):
    d = _mk(spark, tmp_path, bloom=True)
    # exercise every state: cow upsert, MOR delete, branch, tag,
    # constraint
    upd = spark.createDataFrame([("k0003", 33, "edited")],
                                "id string, n int, text string")
    merge_into(spark, d, upd.withColumn("op", F.lit("upsert")),
               batch_id=1)
    dele = spark.createDataFrame([("k0005", None, None)],
                                 "id string, n int, text string")
    merge_into(spark, d, dele.withColumn("op", F.lit("delete")),
               batch_id=2, strategy="mor")
    create_tag(d, "audited")
    create_branch(d, "staging")
    set_constraint(spark, d, "n_nonneg", "n >= 0")
    out = fsck_table(spark, d, data_checks=True)
    assert out["ok"] is True
    assert out["errors"] == []
    assert out["files_checked"] > 0
    assert out["snapshots"] >= 3


def test_missing_and_truncated_files_detected(spark, tmp_path):
    d = _mk(spark, tmp_path)
    m = read_manifest(d)
    files = sorted(m["snapshots"][str(m["version"])]["files"])
    os.remove(os.path.join(d, files[0]))
    with open(os.path.join(d, files[1]), "r+b") as fh:
        fh.truncate(10)  # valid path, destroyed footer
    out = fsck_table(spark, d)
    kinds = {(e["check"], e["what"]) for e in out["errors"]}
    assert ("missing_file", files[0]) in kinds
    assert ("unreadable_footer", files[1]) in kinds
    assert out["ok"] is False


def test_stale_narrow_bounds_detected(spark, tmp_path):
    """A cached range NARROWER than the file's true range makes merge
    pruning skip matching rows — the wrong-answer case fsck exists
    for."""
    d = _mk(spark, tmp_path)

    def narrow(m):
        f = sorted(m["stats"])[0]
        lo, hi, rows = m["stats"][f]
        m["stats"][f] = [lo, lo, rows]  # claims a single-key file

    _manifest_edit(d, narrow)
    out = fsck_table(spark, d)
    assert any(e["check"] == "stale_stats" for e in out["errors"])
    assert out["ok"] is False


def test_dangling_refs_detected(spark, tmp_path):
    d = _mk(spark, tmp_path)
    create_tag(d, "ghost")
    create_branch(d, "limbo")
    _manifest_edit(d, lambda m: (m["refs"].__setitem__("ghost", 999),
                                 m["branches"]["limbo"]
                                 .__setitem__("head", 998)))
    out = fsck_table(spark, d)
    whats = {e["what"] for e in out["errors"] if e["check"] == "ref"}
    assert whats == {"tag:ghost", "branch:limbo"}


def test_orphans_and_lost_blooms_are_warnings_not_errors(spark, tmp_path):
    d = _mk(spark, tmp_path, bloom=True)
    with open(os.path.join(d, "data", "junk.parquet"), "w") as fh:
        fh.write("leftover of a losing writer")
    m = read_manifest(d)
    ent = next(iter(m["bloomstats"]["id"].values()))
    os.remove(os.path.join(d, ent["path"]))
    out = fsck_table(spark, d)
    assert out["ok"] is True  # both are pruning/space issues, not rows
    checks = {w["check"] for w in out["warnings"]}
    assert {"orphans", "bloom_sidecar"} <= checks
    assert out["orphans"] == 1


def test_data_invariants_reproved_at_head(spark, tmp_path):
    d = _mk(spark, tmp_path)
    # plant a constraint the existing rows violate (validate=False is
    # the operator override fsck exists to catch up with)
    set_constraint(spark, d, "n_small", "n < 100", validate=False)
    out = fsck_table(spark, d, data_checks=True)
    bad = [e for e in out["errors"] if e["check"] == "data_invariant"]
    assert bad and "constraint:n_small" in bad[0]["what"]
    # structural checks alone stay green — the violation is data-level
    assert fsck_table(spark, d)["ok"] is True


def test_unreadable_manifest_reports_not_raises(spark, tmp_path):
    d = str(tmp_path / "broken")
    os.makedirs(d)
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        fh.write("{not json")
    out = fsck_table(spark, d)
    assert out["ok"] is False
    assert out["errors"][0]["check"] == "manifest"
