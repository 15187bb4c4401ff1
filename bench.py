#!/usr/bin/env python
"""Benchmark harness for pdf_parser_spark.

Default mode (what the driver runs):
    python bench.py
runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}

Extra keys carried alongside the contract fields: ``turns_per_sec`` (the
north-rule throughput metric over the synthetic transcript corpus) and
``cores``.

Scaling mode (north-rule two-cluster-size evidence; no real cluster in this
sandbox, so the same job runs at two parallelism levels in fresh JVMs)::

    python bench.py --scaling            # local[8] vs local[32]

prints one JSON line with throughput at both levels + scaling efficiency
  efficiency = (thr_4N / thr_N) / (4N / N)
and is what BASELINE.md's scaling table is produced from.

Internal worker mode (used by --scaling; also handy standalone)::

    python bench.py --extract-only --cores 8 --convs 30000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline subset of the driver-contract registry: one per operator family
# (agg, join+topk, star join, window, sessionize, dedup, minhash, vector topk,
# extraction over driver data). Each is timed to full materialization via the
# noop sink (no driver collect, no partial-agg shortcuts).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "events_window_context",
    "events_sessionize",
    "docs_dup_histogram",
    "docs_minhash_signatures",
    "emb_cosine_topk",
    "extract_documents",
]

BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "30000"))
BENCH_SEED = 7


def build_spark(cores: int, app: str = "bench"):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(app)
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate())


def _materialize(df) -> int:
    """Force full evaluation without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _synth_corpus_path(tmp_root: str, n_convs: int) -> tuple[str, int]:
    """Write (once) the deterministic synthetic transcript corpus; return
    (path, n_turns). Generation cost is excluded from all timings."""
    from pdf_parser_spark.sources.synth import write_transcripts_parquet
    path = os.path.join(tmp_root, f"transcripts_{n_convs}_{BENCH_SEED}.parquet")
    meta = path + ".meta"
    if os.path.exists(path) and os.path.exists(meta):
        with open(meta) as f:
            return path, int(f.read().strip())
    n = write_transcripts_parquet(path, n_convs, seed=BENCH_SEED, max_turns=256)
    with open(meta, "w") as f:
        f.write(str(n))
    return path, n


def run_extraction_bench(spark, corpus_path: str, n_turns: int) -> dict:
    """Time the north-rule job: transcripts -> extracted chunks (scale path)."""
    from pdf_parser_spark.config import DEFAULT_CONFIG
    from pdf_parser_spark.operators.merge import extract_chunks

    transcripts = spark.read.parquet(corpus_path)
    # warm-up pass on a slice: JIT, Arrow init, Python worker fork
    _materialize(extract_chunks(transcripts.limit(2000), DEFAULT_CONFIG))
    t0 = time.monotonic()
    _materialize(extract_chunks(transcripts, DEFAULT_CONFIG))
    wall = time.monotonic() - t0
    return {"extract_sec": round(wall, 3), "n_turns": n_turns,
            "turns_per_sec": round(n_turns / wall, 1)}


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from pdf_parser_spark.queries import QUERIES
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main_bench(cores: int, sf_dir: str) -> None:
    tmp_root = os.path.join(tempfile.gettempdir(), "pdf_parser_spark_bench")
    os.makedirs(tmp_root, exist_ok=True)
    corpus, n_turns = _synth_corpus_path(tmp_root, BENCH_CONVS)

    spark = build_spark(cores)
    try:
        queries = run_headline(spark, sf_dir)
        ext = run_extraction_bench(spark, corpus, n_turns)
    finally:
        spark.stop()

    queries["extract_synth"] = ext["extract_sec"]
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall time (9 operator-family queries "
                  "+ synthetic-transcript extraction)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "turns_per_sec": ext["turns_per_sec"],
        "extract_n_turns": ext["n_turns"],
        "cores": cores,
    }))


def main_extract_only(cores: int, n_convs: int) -> None:
    tmp_root = os.path.join(tempfile.gettempdir(), "pdf_parser_spark_bench")
    os.makedirs(tmp_root, exist_ok=True)
    corpus, n_turns = _synth_corpus_path(tmp_root, n_convs)
    spark = build_spark(cores, app=f"extract-bench-{cores}")
    try:
        ext = run_extraction_bench(spark, corpus, n_turns)
    finally:
        spark.stop()
    print(json.dumps({"cores": cores, **ext}))


def main_scaling(n_cores: int, n4_cores: int, n_convs: int) -> None:
    """North-rule scaling evidence: identical job, fresh JVM per level."""
    results = {}
    for cores in (n_cores, n4_cores):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extract-only",
             "--cores", str(cores), "--convs", str(n_convs)],
            capture_output=True, text=True, check=True, cwd=REPO)
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    thr_n = results[n_cores]["turns_per_sec"]
    thr_4n = results[n4_cores]["turns_per_sec"]
    eff = (thr_4n / thr_n) / (n4_cores / n_cores)
    print(json.dumps({
        "metric": f"extraction scaling efficiency local[{n_cores}] -> "
                  f"local[{n4_cores}]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_turns": results[n_cores]["n_turns"],
        f"turns_per_sec_{n_cores}": thr_n,
        f"turns_per_sec_{n4_cores}": thr_4n,
        f"sec_{n_cores}": results[n_cores]["extract_sec"],
        f"sec_{n4_cores}": results[n4_cores]["extract_sec"],
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--n-cores", type=int, default=8,
                    help="N for --scaling (4N is --cores or 4*N)")
    ap.add_argument("--convs", type=int, default=BENCH_CONVS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        main_scaling(args.n_cores, max(args.cores, 4 * args.n_cores),
                     args.convs)
    elif args.extract_only:
        main_extract_only(args.cores, args.convs)
    else:
        main_bench(args.cores, args.sf_dir)
