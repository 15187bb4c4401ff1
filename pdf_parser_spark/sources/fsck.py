"""Table integrity verification (fsck) for the cow table — the
operational check a 100 TB lake runs before trusting a snapshot.

Iceberg ships this as ``verify`` / metadata validation; Delta as FSCK.
The failure modes it catches are the ones that silently produce WRONG
ANSWERS rather than errors:

- a manifest ref (main / branch head / tag) pointing at a dropped
  snapshot — time travel resolves to nothing;
- a referenced data or delete file missing from storage (partial
  restore, manual deletion, a buggy orphan sweep) — reads crash or,
  worse, a pruned read silently skips it;
- STALE CACHED KEY BOUNDS: every merge/probe prunes files by the
  manifest's cached [kmin, kmax]; a cached range NARROWER than the
  file's true range makes pruning skip rows that should match —
  wrong answers with no exception anywhere. fsck recomputes bounds
  from parquet footers and compares;
- bloom sidecars whose bitset file vanished (reads fall back to
  keeping the file — correct but silently unpruned; flagged as a
  warning) or whose params are corrupt;
- duplicate or NULL merge keys at a head (an invariant every merge
  assumes; a direct parquet write into data/ can break it);
- CHECK constraint violations at a head (constraints gate the write
  path; fsck re-proves the invariant over the full current state).

Severity model: ``errors`` are states where some read or merge gives a
wrong answer or crashes; ``warnings`` are harmless-but-untidy states
(orphan files awaiting ``remove_orphan_files``, stale bookkeeping
entries for vacuumed files). ``ok`` means zero errors.

Scale shape: the per-file pass (existence + footer bounds) runs as a
``mapPartitions`` over the FILE LIST — a metadata-only distributed job,
no data pages read, the same pattern ``file_key_bounds`` uses — and
ships back only violations (bounded by ``max_report``). Data-level
checks are single aggregations over the head read. Nothing driver-side
scales with table size except the manifest itself, which is the same
object every reader already loads.

Reference analog: none — the reference holds no persistent state
(pdf_parser.py re-parses per call); an auditable table needs an
auditor.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.sources.cowtable import (_BLOOM_DIR, _ancestry,
                                               _delete_entries,
                                               _footer_key_bounds,
                                               read_manifest, read_table)


def _referenced_files(m: dict) -> tuple[set, set]:
    """(data files, delete files) referenced by ANY retained snapshot."""
    data: set[str] = set()
    dele: set[str] = set()
    for snap in m["snapshots"].values():
        data.update(snap["files"])
        dele.update(e["file"] for e in _delete_entries(snap))
    return data, dele


def _check_manifest(m: dict, table_dir: str,
                    errors: list, warnings: list) -> None:
    """Driver-side structural checks: refs resolve, ancestry is
    acyclic, schemas parse, bookkeeping maps point at known files."""
    from pyspark.sql.types import StructType

    snaps = m.get("snapshots", {})
    for field in ("key_col", "version", "snapshots"):
        if field not in m:
            errors.append({"check": "manifest_field", "what": field,
                           "detail": "required field missing"})
    if str(m.get("version")) not in snaps:
        errors.append({"check": "ref", "what": "main",
                       "detail": f"version {m.get('version')} not in "
                                 "snapshots"})
    for name, b in m.get("branches", {}).items():
        for role in ("head", "base"):
            if str(b.get(role)) not in snaps:
                errors.append({"check": "ref", "what": f"branch:{name}",
                               "detail": f"{role} {b.get(role)} not in "
                                         "snapshots"})
    for name, v in m.get("refs", {}).items():
        if str(v) not in snaps:
            errors.append({"check": "ref", "what": f"tag:{name}",
                           "detail": f"snapshot {v} not in snapshots"})
    ids = [int(k) for k in snaps]
    if ids and m.get("last_snapshot_id", max(ids)) < max(ids):
        errors.append({"check": "snapshot_ids",
                       "what": "last_snapshot_id",
                       "detail": f"{m['last_snapshot_id']} < max "
                                 f"snapshot id {max(ids)} — id reuse "
                                 "possible"})
    for v, snap in snaps.items():
        parent = snap.get("parent")
        if parent is not None and parent >= int(v):
            errors.append({"check": "ancestry", "what": f"snapshot:{v}",
                           "detail": f"parent {parent} >= child {v} "
                                     "(ids are allocation-ordered; a "
                                     "non-increasing parent is a cycle "
                                     "or corruption)"})
    try:
        # _ancestry walks parent links; with the monotonicity check
        # above it terminates, but prove main's chain resolves
        _ancestry(m, m["version"])
    except Exception as e:  # pragma: no cover - defensive
        errors.append({"check": "ancestry", "what": "main",
                       "detail": repr(e)})
    for what, sj in [("manifest", m.get("schema")),
                     *((f"snapshot:{v}", s.get("schema"))
                       for v, s in snaps.items())]:
        if sj is None:
            continue
        try:
            StructType.fromJson(json.loads(sj))
        except Exception as e:
            errors.append({"check": "schema", "what": what,
                           "detail": f"unparseable schema json: {e!r}"})

    data_ref, dele_ref = _referenced_files(m)
    all_ref = data_ref | dele_ref
    for bag, label in ((m.get("stats", {}), "stats"),
                       (m.get("seq", {}), "seq")):
        stale = sorted(set(bag) - all_ref)
        if stale:
            warnings.append({"check": "stale_bookkeeping", "what": label,
                             "detail": f"{len(stale)} entries for files "
                                       "no snapshot references",
                             "files": stale[:10]})
    for col, bag in m.get("colstats", {}).items():
        stale = sorted(set(bag) - all_ref)
        if stale:
            warnings.append({"check": "stale_bookkeeping",
                             "what": f"colstats:{col}",
                             "detail": f"{len(stale)} stale entries",
                             "files": stale[:10]})
    for col, bag in m.get("bloomstats", {}).items():
        for f, ent in bag.items():
            if f not in all_ref:
                warnings.append({"check": "stale_bookkeeping",
                                 "what": f"bloomstats:{col}",
                                 "detail": f"entry for unreferenced {f}"})
            elif not os.path.isfile(os.path.join(table_dir, ent["path"])):
                # reads keep the file on a bloom miss-open, so this is
                # lost pruning, not lost rows
                warnings.append({"check": "bloom_sidecar",
                                 "what": f"{col}:{f}",
                                 "detail": f"sidecar {ent['path']} "
                                           "missing"})
            elif not (ent.get("m", 0) > 0 and ent.get("k", 0) > 0):
                errors.append({"check": "bloom_sidecar",
                               "what": f"{col}:{f}",
                               "detail": f"corrupt params {ent}"})


def _check_files(spark: SparkSession, m: dict, table_dir: str,
                 errors: list, max_report: int) -> int:
    """Distributed per-file pass: every referenced file must exist with
    a readable footer, and a cached key-bound entry must equal the
    footer's true bounds (a NARROWER cache makes pruning drop rows —
    the silent-wrong-answer case). Violations only come back."""
    data_ref, dele_ref = _referenced_files(m)
    key_col = m["key_col"]
    stats = m.get("stats", {})
    rows = ([(f, "data", json.dumps(stats.get(f))) for f in sorted(data_ref)]
            + [(f, "delete", None) for f in sorted(dele_ref)])
    if not rows:
        return 0
    files_df = (spark.createDataFrame(
        rows, "rel string, kind string, expected string")
        .repartition(min(len(rows), 64)))

    def probe(part):
        import pyarrow.parquet as pq
        for r in part:
            path = os.path.join(table_dir, r.rel)
            if not os.path.isfile(path):
                yield {"check": "missing_file", "what": r.rel,
                       "detail": f"referenced {r.kind} file absent"}
                continue
            try:
                pq.ParquetFile(path).metadata
            except Exception as e:
                yield {"check": "unreadable_footer", "what": r.rel,
                       "detail": repr(e)}
                continue
            if r.kind != "data" or r.expected is None:
                continue
            exp = json.loads(r.expected)
            if exp is None:
                continue  # bounds were never cached (non-JSON key type)
            try:
                lo, hi, n = _footer_key_bounds(path, key_col)
            except Exception as e:
                yield {"check": "unreadable_footer", "what": r.rel,
                       "detail": f"key column {key_col!r}: {e!r}"}
                continue
            eko, ehi, erows = exp
            try:
                narrower = lo is not None and (eko > lo or ehi < hi)
            except TypeError:
                narrower = True  # cached type disagrees with footer's
            if n != erows or narrower:
                yield {"check": "stale_stats", "what": r.rel,
                       "detail": f"cached [{eko!r}, {ehi!r}] rows={erows}"
                                 f" vs footer [{lo!r}, {hi!r}] rows={n}"}

    # toLocalIterator would serialize partitions; violations are rare
    # by construction, so a capped collect is the bounded driver read
    bad = (spark.createDataFrame(
        files_df.rdd.mapPartitions(probe)
        .map(lambda d: (d["check"], d["what"], d["detail"])),
        "check string, what string, detail string")
        .limit(max_report).collect())
    errors.extend({"check": r.check, "what": r.what, "detail": r.detail}
                  for r in bad)
    return len(rows)


def _orphan_scan(m: dict, table_dir: str, warnings: list) -> int:
    data_ref, dele_ref = _referenced_files(m)
    bloom_ref = {ent["path"] for bs in m.get("bloomstats", {}).values()
                 for ent in bs.values()}
    referenced = data_ref | dele_ref | bloom_ref
    orphans = []
    for sub in ("data", _BLOOM_DIR):
        d = os.path.join(table_dir, sub)
        if not os.path.isdir(d):
            continue
        orphans.extend(f"{sub}/{n}" for n in os.listdir(d)
                       if f"{sub}/{n}" not in referenced
                       and os.path.isfile(os.path.join(d, n)))
    staging = [n for n in os.listdir(table_dir)
               if n.startswith("_staging-")]
    if orphans or staging:
        warnings.append({"check": "orphans",
                         "what": "unreferenced files",
                         "detail": f"{len(orphans)} orphan files, "
                                   f"{len(staging)} staging dirs — "
                                   "remove_orphan_files reclaims",
                         "files": sorted(orphans)[:10] + staging[:5]})
    return len(orphans)


def _check_head_data(spark: SparkSession, m: dict, table_dir: str,
                     head_label: str, version: int,
                     errors: list) -> None:
    key_col = m["key_col"]
    df = read_table(spark, table_dir, version=version)
    aggs = [F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0))
            .alias("null_keys"),
            (F.count("*") - F.count_distinct(F.col(key_col)))
            .alias("dup_keys")]
    names = ["null_keys", "dup_keys"]
    for cname, expr in m.get("constraints", {}).items():
        aggs.append(F.sum((~F.coalesce(F.expr(expr).cast("boolean"),
                                       F.lit(True))).cast("int"))
                    .alias(f"constraint:{cname}"))
        names.append(f"constraint:{cname}")
    r = df.agg(*aggs).collect()[0]
    for name in names:
        v = int(r[name] or 0)
        if v:
            errors.append({"check": "data_invariant",
                           "what": f"{head_label}:{name}",
                           "detail": f"{v} violating rows at snapshot "
                                     f"{version}"})


def fsck_table(spark: SparkSession, table_dir: str, *,
               data_checks: bool = False,
               max_report: int = 100) -> dict:
    """Verify a cow table's integrity. Always runs the structural and
    per-file passes; ``data_checks=True`` additionally re-proves the
    row-level invariants (unique non-NULL merge keys, CHECK
    constraints) at main's head and every branch head.

    Returns ``{"ok", "errors", "warnings", "files_checked",
    "snapshots", "orphans"}`` — ``ok`` is ``not errors``. Never mutates
    the table (pair with ``remove_orphan_files`` / ``vacuum`` to act on
    warnings)."""
    errors: list = []
    warnings: list = []
    try:
        m = read_manifest(table_dir)
    except Exception as e:
        return {"ok": False, "errors": [{"check": "manifest",
                                         "what": table_dir,
                                         "detail": repr(e)}],
                "warnings": [], "files_checked": 0, "snapshots": 0,
                "orphans": 0}
    _check_manifest(m, table_dir, errors, warnings)
    n_files = 0
    if not any(e["check"] == "manifest_field" for e in errors):
        n_files = _check_files(spark, m, table_dir, errors, max_report)
    orphans = _orphan_scan(m, table_dir, warnings)
    if data_checks and not errors:
        _check_head_data(spark, m, table_dir, "main", m["version"],
                         errors)
        for name, b in m.get("branches", {}).items():
            _check_head_data(spark, m, table_dir, f"branch:{name}",
                             b["head"], errors)
    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "files_checked": n_files,
            "snapshots": len(m.get("snapshots", {})),
            "orphans": orphans}


# --- lineage audit: the derivation chain re-proved by sample ----------------

def _digest_expr(df):
    """Order-insensitive content digest: sum over rows of a 60-bit
    slice of md5(json(all columns, sorted names)). Complex columns go
    through to_json, so arrays/structs canonicalize identically on
    both sides of a compare."""
    cols = [F.col(c) for c in sorted(df.columns)]
    canon = F.md5(F.to_json(F.struct(*cols)))
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.agg(F.sum(h).alias("s"), F.count("*").alias("n")).collect()[0]
    return (int(r.s) if r.s is not None else 0), int(r.n)


def _sample_convs(spark, chunks_dir: str, k: int, seed: int) -> list:
    df = read_table(spark, chunks_dir).select("conv_id").distinct()
    rows = (df.orderBy(F.xxhash64("conv_id", F.lit(seed)))
            .limit(k).collect())
    return sorted(r[0] for r in rows)


def fsck_lineage(spark: SparkSession, src_dir: str, chunks_dir: str, *,
                 emb_dir: str | None = None,
                 idx_dir: str | None = None,
                 metrics_dir: str | None = None,
                 sample_convs: int = 8, seed: int = 17) -> dict:
    """Audit the maintained derivation chain (transcripts -> chunks ->
    {embeddings, metrics, dedup index}) two ways:

    1. **Version consistency** (metadata-only): each derived table's
       recorded ``src_version`` must not be AHEAD of its upstream's
       current version (an impossible state — corruption or a manual
       manifest edit); merely LAGGING is a warning (the normal state
       between refreshes — run the refresher).
    2. **Sampled recompute** (the digest-equal-to-rebuild contract,
       re-proved at O(sample) cost): draw ``sample_convs``
       hash-sampled conversations, re-derive each hop for JUST those
       conversations from its upstream's pinned snapshot, and compare
       order-insensitive digests against the stored rows. Catches
       out-of-band writes, config drift, and maintenance bugs that
       version stamps can't see. Chunks re-extract with the manifest's
       recorded ``extract_cfg``; metrics re-aggregate; index rows
       re-hash with the recorded geometry. The embeddings hop is
       checked structurally (exactly one vector of the recorded dim
       per sampled chunk key, no strays) — the encoder is injectable
       at build time and deliberately not re-run by an auditor.

    Errors mean some consumer of the chain reads rows that do NOT
    equal a from-scratch rebuild; ``ok`` is ``not errors``. The
    sampled re-extraction uses the same pruned conversation reads the
    refresher itself uses — O(sample) files opened, never O(table)."""
    from pdf_parser_spark.config import ExtractionConfig
    from pdf_parser_spark.pipeline import extract, extraction_metrics
    from pdf_parser_spark.sources.maintain import (_pruned_conv_read,
                                                   _with_chunk_key)

    errors: list = []
    warnings: list = []
    hops: dict = {}

    def _version_gate(label: str, dir_: str, upstream_dir: str):
        m = read_manifest(dir_)
        up_v = read_manifest(upstream_dir)["version"]
        sv = m.get("src_version")
        if sv is None:
            errors.append({"check": "lineage_version", "what": label,
                           "detail": "no src_version recorded — not a "
                                     "maintained table"})
            return None, None
        if sv > up_v:
            errors.append({"check": "lineage_version", "what": label,
                           "detail": f"reflects src_version {sv} but "
                                     f"upstream is at {up_v} — "
                                     "impossible state"})
            return None, None
        if sv < up_v:
            warnings.append({"check": "lineage_lag", "what": label,
                             "detail": f"reflects {sv}, upstream at "
                                       f"{up_v} — run the refresher"})
        return m, sv

    cm, src_v = _version_gate("chunks", chunks_dir, src_dir)
    if cm is None:
        return {"ok": False, "errors": errors, "warnings": warnings,
                "hops": hops, "sampled_convs": []}
    convs = _sample_convs(spark, chunks_dir, sample_convs, seed)
    hops["chunks"] = {"src_version": src_v}

    # chunks hop: re-extract the sampled conversations from the PINNED
    # source snapshot with the RECORDED config
    if str(src_v) not in read_manifest(src_dir)["snapshots"]:
        warnings.append({"check": "lineage_recompute", "what": "chunks",
                         "detail": f"pinned src snapshot {src_v} was "
                                   "vacuumed — recompute unprovable "
                                   "until the next refresh"})
    else:
        cfg = ExtractionConfig(**cm["extract_cfg"])
        src_rows = _pruned_conv_read(spark, src_dir, convs,
                                     version=src_v)
        want = _with_chunk_key(extract(src_rows, cfg))
        got = _pruned_conv_read(spark, chunks_dir, convs)
        got = got.select(*want.columns)
        dw, dg = _digest_expr(want), _digest_expr(got)
        hops["chunks"].update(rows=dg[1])
        if dw != dg:
            errors.append({"check": "lineage_recompute", "what": "chunks",
                           "detail": f"sampled re-extraction digest "
                                     f"{dw} != stored {dg} over "
                                     f"{len(convs)} conversations"})

    chunks_now = _pruned_conv_read(spark, chunks_dir, convs)

    if metrics_dir is not None:
        mm, mv = _version_gate("metrics", metrics_dir, chunks_dir)
        if mm is not None and mv == read_manifest(chunks_dir)["version"]:
            want = extraction_metrics(chunks_now)
            got = (read_table(spark, metrics_dir)
                   .where(F.col("conv_id").isin(convs))
                   .select(*want.columns))
            dw, dg = _digest_expr(want), _digest_expr(got)
            hops["metrics"] = {"src_version": mv, "rows": dg[1]}
            if dw != dg:
                errors.append({"check": "lineage_recompute",
                               "what": "metrics",
                               "detail": f"sampled re-aggregation "
                                         f"digest {dw} != stored {dg}"})

    if idx_dir is not None:
        im, iv = _version_gate("dedup_index", idx_dir, chunks_dir)
        if im is not None and iv == read_manifest(chunks_dir)["version"]:
            from pdf_parser_spark.sources.dedup_index import bucket_rows
            g = im["dedup_cfg"]
            want = bucket_rows(chunks_now, im["src_key_col"],
                               g["text_col"], n=g["n"],
                               num_hashes=g["num_hashes"],
                               bands=g["bands"])
            conv_of = F.expr("substring(id, 1, length(id) - 7)")
            got = (read_table(spark, idx_dir)
                   .where(conv_of.isin(convs)).select(*want.columns))
            dw, dg = _digest_expr(want), _digest_expr(got)
            hops["dedup_index"] = {"src_version": iv, "rows": dg[1]}
            if dw != dg:
                errors.append({"check": "lineage_recompute",
                               "what": "dedup_index",
                               "detail": f"sampled re-hash digest "
                                         f"{dw} != stored {dg}"})

    if emb_dir is not None:
        em, ev = _version_gate("embeddings", emb_dir, chunks_dir)
        if em is not None and ev == read_manifest(chunks_dir)["version"]:
            key = read_manifest(chunks_dir)["key_col"]
            emb = _pruned_conv_read(spark, emb_dir, convs)
            dim = em.get("embed_dim")
            # rows flagged has_error (e.g. empty input text) carry []
            # by the reference's result-shape contract — exempt from
            # the dim check, not from existence
            r = (chunks_now.select(key)
                 .join(emb.select(key, F.size("embedding").alias("__d"),
                                  F.coalesce("has_error", F.lit(False))
                                  .alias("__e")),
                       key, "full_outer")
                 .agg(F.sum(F.when(F.col("__d").isNull(), 1)
                            .otherwise(0)).alias("missing"),
                      F.sum(F.when(F.col(key).isNull(), 1)
                            .otherwise(0)).alias("strays"),
                      F.sum(F.when((F.col("__d") != dim)
                                   & ~F.col("__e"), 1)
                            .otherwise(0)).alias("wrong_dim"),
                      F.count("*").alias("n")).collect()[0])
            hops["embeddings"] = {"src_version": ev, "rows": int(r.n)}
            for fld in ("missing", "strays", "wrong_dim"):
                v = int(r[fld] or 0)
                if v:
                    errors.append({"check": "lineage_recompute",
                                   "what": f"embeddings:{fld}",
                                   "detail": f"{v} rows over "
                                             f"{len(convs)} sampled "
                                             "conversations"})

    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "hops": hops, "sampled_convs": convs}
