"""CDC-maintained near-duplicate (MinHash-LSH) index — the fourth
maintained derivation hop: transcripts -> chunks -> {embeddings, metrics,
IVF, DEDUP INDEX}.

At 100 TB the dedup question stops being "find all pairs once" and
becomes "a CDC batch of new/edited documents just landed — which of them
near-duplicate something ALREADY IN the corpus?". Recomputing
minhash_lsh_pairs over corpus+batch per trickle is O(corpus) per batch;
the production shape is a persistent LSH index maintained incrementally:

- index table: one cow-table row per (band, bucket, chunk), keyed by
  ``sig_key = "%02d#%s#%s" % (band, bucket_md5, chunk_key)`` and laid
  out by range on that key — so a bucket's members are CONTIGUOUS in
  key space and a probe of B buckets prunes to the files whose key
  range intersects the B prefix ranges ``[band#bucket#,
  band#bucket#\\uffff]`` (cowtable.files_intersecting_ranges — the same
  interval routine the chunk merge uses). O(batch-buckets) files
  opened, never O(corpus).
- refresh: the chunk changelog names exactly the chunks whose bucket
  rows need attention. Inserted chunks hash map-side into new bucket
  rows (upserts); deleted chunks carry their OLD text in the changelog,
  so their stale bucket keys are recomputed from it and deleted —
  no lookup pass against the index, no tombstone scan. An edit whose
  text keeps a bucket re-asserts that sig_key as an upsert and the
  anti-join drops the redundant delete. O(changed chunks) per refresh.
- probe (``dup_check_batch``): hash the incoming batch map-side, prune
  the index read to the probed bucket ranges, one equi-join on
  (band, bucket), count bands shared per (probe, corpus chunk) — the
  exact ``minhash_lsh_pairs`` candidate semantics, restricted to
  batch x corpus, at O(batch) cost.

Equality contracts (pinned in tests/test_dedup_index.py):
- a refreshed index is row-identical to a from-scratch build at the
  chunk table's current version;
- ``dup_check_batch`` equals the cross-pair slice of a full
  ``minhash_lsh_pairs`` recompute over corpus+batch;
- the pruned probe opens strictly fewer files than the snapshot holds
  and returns the same rows as an unpruned probe.

Reference analog: none — the reference parses one PDF per call
(pdf_parser.py is stateless); dedup-at-ingest over a growing corpus is
the operability tier a 10^12-turn deployment needs. The LSH geometry
itself is operators/dedup.py's (minhash_signatures, band keys) so the
index agrees bit-for-bit with the batch pipeline and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.operators.dedup import minhash_signatures
from pdf_parser_spark.sources.cowtable import (_commit, _delete_entries,
                                               _masked_read, create_table,
                                               file_key_bounds,
                                               files_intersecting_ranges,
                                               merge_into, read_manifest,
                                               read_table, table_changes)

SIG_KEY = "sig_key"

# above this many probed buckets, skip driver-side range pruning and
# join against the full index read (still key-partitioned; pruning is a
# small-batch optimization, not a correctness dependency)
_MAX_PROBE_RANGES = 4096

_HI = "￿"


def bucket_rows(df: DataFrame, id_col: str, text_col: str, *,
                n: int = 3, num_hashes: int = 8,
                bands: int = 4) -> DataFrame:
    """(sig_key, id, band, bucket) — one row per LSH band bucket
    membership, entirely map-side (the minhash fold is a per-row array
    aggregate; the band keys are md5 over signature slices — the same
    construction minhash_lsh_pairs uses, so index rows and batch
    pipeline rows agree exactly). Rows whose text yields no shingles
    produce nothing, mirroring minhash_signatures."""
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    # materialize the tiny (id, sig) rows once: the band structs
    # reference sig 2*bands times and projection collapse would inline
    # (= recompute) the whole shingle+hash pipeline per reference
    sig = sig.repartition(
        sig.sparkSession.sparkContext.defaultParallelism, "id")
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.md5(F.concat_ws("|", *[F.col("sig")[bi * rows + ri]
                                          for ri in range(rows)]))
                 .alias("bucket"))
        for bi in range(bands)]
    out = (sig.select("id", F.explode(F.array(*band_cols)).alias("b"))
           .select("id", "b.band", "b.bucket"))
    return out.select(
        F.format_string("%02d#%s#%s", "band", "bucket", "id")
        .alias(SIG_KEY), "id", "band", "bucket")


def _cfg(n: int, num_hashes: int, bands: int, text_col: str) -> dict:
    return {"n": n, "num_hashes": num_hashes, "bands": bands,
            "text_col": text_col}


def build_dedup_index(spark: SparkSession, chunks_dir: str, idx_dir: str,
                      *, key_col: str = "chunk_key",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 8, bands: int = 4,
                      n_files: int = 8) -> dict:
    """Initial index build over the maintained chunk table's current
    snapshot. The LSH geometry and the reflected source version land in
    the creation commit; every refresh validates against them (mixing
    geometries in one index would silently corrupt bucket agreement)."""
    src_v = read_manifest(chunks_dir)["version"]
    chunks = read_table(spark, chunks_dir, version=src_v)
    br = bucket_rows(chunks, key_col, text_col, n=n,
                     num_hashes=num_hashes, bands=bands)
    create_table(spark, br.repartitionByRange(n_files, SIG_KEY),
                 idx_dir, SIG_KEY,
                 extra={"src_version": src_v, "src_key_col": key_col,
                        "dedup_cfg": _cfg(n, num_hashes, bands, text_col)})
    return {"src_version": src_v, "created": True}


def refresh_dedup_index(spark: SparkSession, chunks_dir: str,
                        idx_dir: str, strategy: str = "cow") -> dict:
    """Advance the index to the chunk table's current version from its
    changelog: inserted chunks hash into upserted bucket rows, deleted
    chunks' stale bucket keys are recomputed FROM THE OLD TEXT the
    changelog carries and deleted (minus any key the new text
    re-asserts). O(changed chunks) hashing + one file-pruned merge —
    the index is never rebuilt and never scanned to find stale rows."""
    src_v = read_manifest(chunks_dir)["version"]
    idx_m = read_manifest(idx_dir)
    from_v = idx_m.get("src_version")
    if from_v is None:
        raise ValueError(f"{idx_dir} records no src_version — build it "
                         "with build_dedup_index first")
    cfg = idx_m["dedup_cfg"]
    key_col = idx_m["src_key_col"]
    if from_v >= src_v:
        return {"skipped": True, "src_version": src_v}

    from pyspark.sql.window import Window
    # the index key depends on TEXT (sig_key embeds the bucket hash),
    # so an update is NOT a plain key upsert: the old text's bucket
    # keys must die explicitly. New state = the latest insert per chunk
    # key; old state = EVERY delete row in the window (each carries the
    # text whose buckets may be indexed — deletes of intermediate
    # never-indexed content no-op inside merge_into). Cached: both
    # sides below re-execute the changelog diff otherwise.
    log = table_changes(spark, chunks_dir, from_v, src_v).cache()
    try:
        kw = dict(n=cfg["n"], num_hashes=cfg["num_hashes"],
                  bands=cfg["bands"])
        w = Window.partitionBy(key_col).orderBy(
            F.col("commit_version").desc())
        ins = (log.where(F.col("change_type") == "insert")
               .withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
        # a key whose LAST action is a delete contributes no new rows
        last_alive = (log.groupBy(key_col)
                      .agg(F.max_by("change_type",
                                    F.struct(F.col("commit_version"),
                                             F.col("change_type")))
                           .alias("__last")))
        ins = (ins.join(last_alive.where(F.col("__last") == "insert")
                        .select(key_col), key_col, "left_semi"))
        dels = log.where(F.col("change_type") == "delete")
        new_rows = bucket_rows(ins, key_col, cfg["text_col"], **kw)
        old_rows = bucket_rows(dels, key_col, cfg["text_col"],
                               **kw).dropDuplicates([SIG_KEY])
        # an edit that keeps a bucket re-asserts the sig_key as an
        # upsert; only keys the new state does NOT re-assert die
        stale = old_rows.join(new_rows.select(SIG_KEY), SIG_KEY,
                              "left_anti")
        n_new = new_rows.limit(1).count()
        n_stale = stale.limit(1).count()
        if n_new == 0 and n_stale == 0:
            _record_src_version(idx_dir, src_v)
            return {"skipped": True, "src_version": src_v,
                    "changed_rows": 0}
        cols = new_rows.columns
        dele = stale.select(
            *[(F.col(c) if c == SIG_KEY else F.lit(None)).alias(c)
              for c in cols])
        batch = (new_rows.withColumn("op", F.lit("upsert"))
                 .unionByName(dele.withColumn("op", F.lit("delete"))))
        stats = merge_into(spark, idx_dir, batch, batch_id=src_v,
                           strategy=strategy)
    finally:
        log.unpersist()
    _record_src_version(idx_dir, src_v)
    return {"src_version": src_v, "from_version": from_v, "merge": stats}


def _record_src_version(idx_dir: str, src_version: int) -> None:
    m = read_manifest(idx_dir)
    m["src_version"] = src_version
    _commit(idx_dir, m)


def _pruned_bucket_read(spark: SparkSession, idx_dir: str,
                        probes: list[tuple[int, str]]) -> DataFrame:
    """The index snapshot restricted to the probed (band, bucket)
    prefixes, opening ONLY files whose cached [kmin, kmax] intersects a
    probe's key range [band#bucket#, band#bucket#\\uffff] — the same
    manifest-stats interval pruning the chunk merge uses. The residual
    equi-join downstream drops range false positives."""
    m = read_manifest(idx_dir)
    v = m["version"]
    files = m["snapshots"][str(v)]["files"]
    if not files:
        return read_table(spark, idx_dir, version=v)
    bounds = file_key_bounds(spark, idx_dir, files, m["key_col"],
                             manifest=m)
    ranges = [("%02d#%s#" % (band, bucket),
               "%02d#%s#%s" % (band, bucket, _HI))
              for band, bucket in probes]
    hit = files_intersecting_ranges(bounds, ranges)
    if not hit:
        return read_table(spark, idx_dir, version=v).limit(0)
    return _masked_read(spark, m, idx_dir, sorted(hit),
                        _delete_entries(m["snapshots"][str(v)]))


def near_dup_audit(spark: SparkSession, idx_dir: str, *,
                   min_bands: int = 1, id_col: str = "chunk_key",
                   cross_conv_only: bool = True):
    """A WAP audit (``maintain.wap_refresh_extracted(audits=...)``) that
    gates publication on the maintained near-dup index: staged chunks
    are probed with ``dup_check_batch`` and any chunk sharing >=
    ``min_bands`` LSH band buckets with an already-indexed chunk is a
    violation — the refresh is quarantined on its branch and main never
    serves the near-duplicate content.

    ``cross_conv_only`` (default): only duplicates of a DIFFERENT
    conversation count. A re-extraction of conversation X legitimately
    re-emits chunks near its own pre-refresh chunks (still indexed,
    since the index reflects main while the merge sits on the branch);
    flagging those would quarantine every edit. The conv id is
    recovered from the chunk key's fixed-width ``conv#%06d`` layout
    (maintain._with_chunk_key).

    Run this with the index in lockstep with the chunk table (the
    ``make_lineage_refresher(dedup_idx_dir=...)`` wiring refreshes it
    after every publish) — a lagging index gates against a stale
    corpus snapshot, which fails open, never wrong-blocks."""
    def audit(staged: DataFrame) -> DataFrame:
        hits = dup_check_batch(spark, idx_dir, staged, id_col=id_col,
                               min_bands=min_bands)
        if cross_conv_only:
            def conv(c: str):
                return F.expr(f"substring({c}, 1, length({c}) - 7)")
            hits = hits.where(conv("probe_id") != conv("dup_of"))
        return hits
    return audit


def dup_check_batch(spark: SparkSession, idx_dir: str, batch: DataFrame,
                    *, id_col: str = "id", text_col: str | None = None,
                    min_bands: int = 1, prune: bool = True) -> DataFrame:
    """(probe_id, dup_of, n_bands_shared) — for every document in
    ``batch``, the indexed chunks it shares >= ``min_bands`` LSH band
    buckets with: the ingest-time near-dup gate. The batch hashes
    map-side with the INDEX's recorded geometry; the index read prunes
    to the probed bucket ranges (above _MAX_PROBE_RANGES distinct
    buckets it degrades to a full key-partitioned join — pruning is an
    optimization, never a correctness dependency). A probe whose id
    equals an indexed key (re-ingest of the same chunk) does not match
    itself. Semantics equal minhash_lsh_pairs' candidate counts
    restricted to batch x corpus — pinned by test equality."""
    idx_m = read_manifest(idx_dir)
    cfg = idx_m["dedup_cfg"]
    qb = bucket_rows(batch, id_col,
                     text_col or cfg["text_col"],
                     n=cfg["n"], num_hashes=cfg["num_hashes"],
                     bands=cfg["bands"])
    qb = qb.select(F.col("id").alias("probe_id"), "band", "bucket")
    probes: list[tuple[int, str]] | None = None
    if prune:
        rows = (qb.select("band", "bucket").distinct()
                .limit(_MAX_PROBE_RANGES + 1).collect())
        if len(rows) <= _MAX_PROBE_RANGES:
            probes = [(r.band, r.bucket) for r in rows]
    idx = (_pruned_bucket_read(spark, idx_dir, probes)
           if probes is not None
           else read_table(spark, idx_dir))
    hits = (qb.join(idx.select(F.col("id").alias("dup_of"),
                               "band", "bucket"),
                    ["band", "bucket"])
            .where(F.col("probe_id") != F.col("dup_of")))
    out = (hits.groupBy("probe_id", "dup_of")
           .agg(F.count("*").alias("n_bands_shared")))
    if min_bands > 1:
        out = out.where(F.col("n_bands_shared") >= min_bands)
    return out
