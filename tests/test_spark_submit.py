"""Packaging test: the pipeline runs under real ``spark-submit --py-files``
with ONLY the zip on the path (north-rule packaging contract)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit")


@pytest.mark.skipif(not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path, spark):
    from pdf_parser_spark.config import DEFAULT_CONFIG
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.sources.synth import write_transcripts_parquet

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    from package import build_zip

    zip_path = build_zip(str(tmp_path / "dist"))
    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    write_transcripts_parquet(inp, n_convs=12, seed=33)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source of the pkg
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "extract_job.py"),
         "--input", inp, "--output", out,
         "--n-buckets", "4", "--buckets-per-job", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: no accidental cwd import
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert sorted(result["processed_buckets"]) == [0, 1, 2, 3]

    # submitted-run output == in-process pipeline output
    got = spark.read.parquet(f"{out}/extracted").drop("bucket_id")
    exp = extract_chunks(spark.read.parquet(inp), DEFAULT_CONFIG)
    key = ["conv_id", "chunk_idx", "turn_idx", "chunk_type", "text",
           "char_count"]
    assert sorted(map(tuple, got.select(key).collect())) == \
        sorted(map(tuple, exp.select(key).collect()))
    # lineage rows present for resume
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.where("status = 'done'").count() == 4


def test_multi_executor_local_cluster_equality(tmp_path):
    """North-rule topology check: the extraction pipeline produces
    oracle-exact output on a REAL multi-executor cluster (local-cluster:
    separate worker JVMs + separate Python workers, code shipped ONLY via
    the --py-files zip) — the serialization/deployment surface local[N]
    cannot exercise. Runs in its own session (local-cluster and local
    masters cannot share a JVM)."""
    import textwrap

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    from package import build_zip

    zip_path = build_zip(str(tmp_path / "dist"))
    script = tmp_path / "job.py"
    out = tmp_path / "rows.json"
    script.write_text(textwrap.dedent(f"""
        import json
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .config("spark.executor.memory", "1g")
                 .config("spark.submit.pyFiles", {str(zip_path)!r})
                 .getOrCreate())
        spark.sparkContext.addPyFile({str(zip_path)!r})
        from pdf_parser_spark.config import CLEANING_CONFIG
        from pdf_parser_spark.operators.merge import extract_chunks
        from pdf_parser_spark.sources.synth import generate_transcripts
        rows = generate_transcripts(12, seed=17, max_turns=8)
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")
        got = [(r.conv_id, int(r.chunk_idx), int(r.turn_idx), r.chunk_type,
                r.text, int(r.char_count), list(r.block_indices))
               for r in extract_chunks(df, CLEANING_CONFIG).collect()]
        with open({str(out)!r}, "w") as f:
            json.dump(sorted(got), f)
        spark.stop()
    """))
    env = dict(os.environ)
    # NO PYTHONPATH at all: worker JVMs inherit the driver env and merge
    # PYTHONPATH into executor Python workers, which would let the test
    # pass even with --py-files shipping broken; the zip must reach both
    # the driver sys.path and the executors via addPyFile alone
    env.pop("PYTHONPATH", None)
    res = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]

    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.core.oracle import extract_many
    from pdf_parser_spark.sources.synth import generate_transcripts
    rows = generate_transcripts(12, seed=17, max_turns=8)
    expected = sorted(
        (c["conv_id"], int(c["chunk_idx"]), int(c["turn_idx"]),
         c["chunk_type"], c["text"], int(c["char_count"]),
         list(c["block_indices"]))
        for c in extract_many(rows, CLEANING_CONFIG))
    got = [tuple(x) if not isinstance(x, list) else x
           for x in json.load(open(out))]
    got = sorted((a, b, c, d, e, f, list(g)) for a, b, c, d, e, f, g in got)
    assert got == expected and len(got) > 0
