"""Batched embedding operator (V1 in SURVEY.md §2.9).

Graft of the reference's embedding service (reference
embedding_service.py:133-191): batched ``model.encode`` with
``normalize_embeddings=True``, per-text char token_count, empty-text ->
error result (reference embedding_service.py:117-127, :225-232).

Spark shape: an ITERATOR pandas UDF (Iterator[pd.Series] ->
Iterator[pd.Series]) — the encoder is constructed ONCE per executor task,
then fed Arrow batches; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (the analog of the
reference's batch_size=100, embedding_service.py:40).

The sentence-transformers model is not available in this container, so the
default encoder is a DETERMINISTIC hash-based stub with the same contract
(unit-normalized float32 vectors of fixed dim). Swapping in a real model is
one function: pass ``encoder_factory=lambda: SentenceTransformer(...)`` —
the Spark plumbing (schema, batching, once-per-task init) is identical and
is what these tests exercise.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64


def hash_embed_py(text: str | None, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit vector from md5-seeded splitmix64 (stub model).

    One md5 of the text seeds a counter-mode splitmix64 expansion — pure
    modular uint64 arithmetic, so the values are pinned by the algorithm
    itself, not by any library's RNG stream (NumPy does NOT guarantee
    Generator distribution streams across releases). Per-text cost is one
    hash + a vectorized mix, so the stub's throughput profile matches a
    real batched encoder. Empty/None text -> zero vector (the downstream
    zero-similarity masking twin of the reference's error result,
    embedding_service.py:117-127)."""
    if not text:
        return [0.0] * dim
    return _hash_embed_np(text, dim).tolist()


def _hash_embed_np(text: str, dim: int):
    import numpy as np

    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8],
                          "big")
    # splitmix64 in counter mode over (seed + i*golden): public-domain
    # mixing constants; uint64 ops wrap modularly on every platform
    x = (np.uint64(seed)
         + np.arange(1, dim + 1, dtype=np.uint64)
         * np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    v = x.astype(np.float64) / 2.0**63 - 1.0
    n = math.sqrt(float(v @ v))
    return v / n if n > 0 else v


class _HashEncoder:
    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def encode(self, texts: list[str]) -> list[list[float]]:
        """Whole-batch vectorized stub: one md5 per text (irreducible),
        then ONE (n x dim) splitmix expansion + row norms for the entire
        Arrow batch — the scalar path's ~10 tiny numpy calls per text
        were pure call overhead at 100k+ texts/task. Values match
        :func:`hash_embed_py` (same float64 ops elementwise; row norms
        via per-row BLAS ddot, the same reduction the scalar path
        uses)."""
        import numpy as np

        dim = self.dim
        out = np.zeros((len(texts), dim))
        idx = [i for i, t in enumerate(texts) if t]
        if not idx:
            return out.tolist()
        seeds = np.array(
            [int.from_bytes(
                hashlib.md5(texts[i].encode("utf-8")).digest()[:8], "big")
             for i in idx], dtype=np.uint64)
        x = (seeds[:, None]
             + np.arange(1, dim + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        v = x.astype(np.float64) / 2.0**63 - 1.0
        # per-row ddot keeps the norm bit-identical to the scalar twin
        # (a batched gemm/einsum reduction can differ in the last ulp)
        norms = np.sqrt(np.array([float(r @ r) for r in v]))
        nz = norms > 0
        v[nz] /= norms[nz, None]
        out[idx] = v
        return out.tolist()


def make_embed_udf(dim: int = DEFAULT_DIM,
                   encoder_factory: Callable[[], object] | None = None):
    """Iterator pandas UDF: model constructed once, Arrow batches streamed."""
    factory = encoder_factory or (lambda: _HashEncoder(dim))

    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encoder = factory()  # once per task, like a per-executor model load
        for s in batches:
            texts = ["" if t is None else str(t) for t in s]
            yield pd.Series(encoder.encode(texts))

    return pandas_udf(embed, ArrayType(FloatType()))


DEFAULT_MODEL_NAME = "hash-stub-v1"
EMPTY_TEXT_ERROR = "empty input text"


def embed_chunks(chunks: DataFrame, dim: int = DEFAULT_DIM,
                 text_col: str = "text",
                 model_name: str = DEFAULT_MODEL_NAME) -> DataFrame:
    """Attach the full per-chunk embedding result to extracted chunks:
    embedding, model, dimensions, token_count, has_error, error — the
    reference's result shape verbatim (embedding_service.py:225-232).

    Content selection per type mirrors V2 (reference
    embedding_service.py:206-218): our ``text`` column already carries the
    per-type content. token_count = char length on success
    (embedding_service.py:168), 0 on error (the dataclass default).
    Empty/whitespace-only text mirrors the reference's error result
    (embedding_service.py:100-108): EMPTY vector, dimensions 0,
    has_error=true — so the store export's valid-embedding filter (F3,
    size(embedding) > 0) drops exactly the rows the reference drops, and a
    real encoder's failures land in the same observable columns.

    The error accounting is pure expressions over the text column — no
    second UDF pass; Catalyst prunes the embedding column away when a
    consumer (e.g. embedding_metrics) reads only the accounting."""
    udf = make_embed_udf(dim)
    c = F.coalesce(F.col(text_col), F.lit(""))
    is_empty = F.length(F.trim(c)) == 0
    return (chunks
            .withColumn("embedding",
                        F.when(is_empty, F.array().cast("array<float>"))
                         .otherwise(udf(c)))
            .withColumn("model", F.lit(model_name))
            .withColumn("dimensions",
                        F.when(is_empty, 0).otherwise(dim).cast("int"))
            .withColumn("token_count",
                        F.when(is_empty, F.lit(0)).otherwise(F.length(c))
                         .cast("long"))
            .withColumn("has_error", is_empty)
            .withColumn("error",
                        F.when(is_empty, F.lit(EMPTY_TEXT_ERROR))
                         .cast("string")))


def embedding_metrics(embedded: DataFrame) -> DataFrame:
    """Per-conversation embedding success/failure accounting (reference
    pdf_parser.py:411-419 embedding_statistics). Expressions only — the
    embedding column itself is never evaluated for this aggregate."""
    return embedded.groupBy("conv_id").agg(
        F.sum(F.when(F.col("has_error"), 0).otherwise(1))
         .alias("successful_embeddings"),
        F.sum(F.when(F.col("has_error"), 1).otherwise(0))
         .alias("failed_embeddings"))


def embed_incremental(chunks: DataFrame, store_dir: str,
                      dim: int = DEFAULT_DIM, text_col: str = "text",
                      model_name: str = DEFAULT_MODEL_NAME,
                      encoder_factory: Callable[[], object] | None = None,
                      bloom_probe_max: int = 4096,
                      ) -> tuple[DataFrame, dict]:
    """``embed_chunks`` through a CONTENT-ADDRESSED cache: embed only
    texts whose md5 is not yet in the vector store (a cow table keyed
    on content_hash under ``store_dir``), append the new vectors, and
    join every chunk to its vector by hash. For any content-pure
    encoder the result is row-for-row equal to ``embed_chunks`` —
    pinned in tests — while the encoder (the expensive stage: a real
    model burns GPU-seconds per chunk) runs only over NEW content.

    Two compounding savings at scale: an incremental refresh touching
    0.1 % of chunks encodes ~0.1 %, and duplicated content (boilerplate
    the dedup tier hasn't dropped, re-extracted unchanged chunks)
    encodes ONCE ever. The store commit is ``append_rows`` — md5 keys
    scatter across every file's range, so the merge path's bounds
    pruning would degenerate to rewrite-everything; append carries all
    files by name and the anti-join guarantees key novelty (a writer
    racing in after the probe trips append_rows' base_version guard —
    the probe's snapshot version is pinned and checked at commit).

    Returns (embedded_df, stats); stats counts distinct/new hashes.
    Empty/whitespace texts never reach the cache — their error result
    is built by the same expressions as ``embed_chunks``."""
    import os

    from pdf_parser_spark.sources.cowtable import (append_rows,
                                                   create_table,
                                                   read_manifest,
                                                   read_table)

    spark = chunks.sparkSession
    c = F.coalesce(F.col(text_col), F.lit(""))
    is_empty = F.length(F.trim(c)) == 0
    hashed = chunks.withColumn("__ch", F.md5(c))
    need = (hashed.where(~is_empty)
            .select(F.col("__ch").alias("content_hash"),
                    c.alias("__text"))
            .dropDuplicates(["content_hash"])
            .cache())
    n_distinct = need.count()
    udf = make_embed_udf(dim, encoder_factory)

    exists = os.path.exists(os.path.join(store_dir, "manifest.json"))
    probed_version = None
    if exists:
        m = read_manifest(store_dir)
        probed_version = m["version"]  # the snapshot the anti-join's
        # novelty reasoning is computed against; append_rows refuses to
        # commit if another writer advanced the store past it
        if m.get("embed_model") != model_name or m.get("embed_dim") != dim:
            raise ValueError(
                f"store {store_dir} holds {m.get('embed_model')!r}/"
                f"dim={m.get('embed_dim')} vectors; refusing to mix with "
                f"{model_name!r}/dim={dim} — one store per model")
        # small batches (the steady-state CDC refresh) anti-join
        # against the BLOOM-PRUNED store read instead of the full
        # store: collect the batch hashes (bounded: <= bloom_probe_max)
        # and keep only store files whose bloom admits one. Correct
        # without a residual filter — blooms have no false negatives,
        # so the pruned read is a superset of every possible match and
        # the anti-join itself is the exact test. A 0.1 % refresh then
        # opens O(batch) store files, not O(store).
        n_probed = None
        n_store_files = len(m["snapshots"][str(m["version"])]["files"])
        # engage only where pruning can pay: scattered keys hit ~one
        # file each, so a batch of n keys keeps ~n files — probing a
        # store with fewer than ~2n files would open most of it anyway
        # and the driver-side probe would be pure overhead
        if 0 < n_distinct <= bloom_probe_max \
                and n_store_files > 2 * n_distinct \
                and m.get("bloom_cols") == ["content_hash"]:
            from pdf_parser_spark.sources.cowtable import (files_for_values,
                                                           read_files)
            hashes = [r.content_hash
                      for r in need.select("content_hash").collect()]
            hit = files_for_values(spark, store_dir, "content_hash",
                                   hashes)
            n_probed = len(hit)
            store_keys = read_files(spark, store_dir, hit) \
                .select("content_hash")
        else:
            store_keys = read_table(spark, store_dir) \
                .select("content_hash")
        missing = need.join(store_keys, "content_hash", "left_anti")
    else:
        n_probed = None
        missing = need
    new_vecs = missing.select(
        "content_hash", udf(F.col("__text")).alias("embedding"))
    if exists:
        n_miss = missing.count()  # one cheap join; the encoder (the
        if n_miss == 0:           # real cost) has not run yet
            n_new = 0             # all cached: no commit, no churn
        else:
            # file geometry follows the DATA, not the shuffle layout: a
            # 200-row CDC refresh must append ONE well-filled file, not
            # one near-empty file per shuffle partition — tiny files
            # compound across refreshes and every later probe pays them
            rows_per_file = max(1024, (8 << 20) // (dim * 4 + 48))
            n_files = max(1, -(-n_miss // rows_per_file))
            st = append_rows(spark, store_dir,
                             new_vecs.repartition(n_files,
                                                  "content_hash"),
                             base_version=probed_version)
            n_new = st.get("rows_written", 0)
    else:
        # bloom_cols: md5 keys scatter across every file's [min,max], so
        # bounds pruning degenerates on this table — per-file Bloom
        # sidecars are what keeps point lookups (cache probes,
        # read_for_values) from opening the whole store
        create_table(spark, new_vecs, store_dir, "content_hash",
                     bloom_cols=["content_hash"],
                     extra={"embed_model": model_name, "embed_dim": dim})
        n_new = n_distinct
    need.unpersist()

    if n_probed is not None:
        # the output join needs ONLY vectors matching the batch's
        # hashes; those live in the probed files (bloom: no false
        # negatives) plus whatever this call just appended — at a
        # 10k-file store this keeps the final join O(batch) files too,
        # not just the anti-join
        from pdf_parser_spark.sources.cowtable import read_files
        try:
            m2 = read_manifest(store_dir)
            cur = m2["snapshots"][str(m2["version"])]["files"]
            prev = set(m2["snapshots"][str(probed_version)]["files"])
            appended = [f for f in cur if f not in prev]
            vecs = read_files(spark, store_dir, list(hit) + appended)
        except (KeyError, ValueError):
            # a concurrent commit (compaction, another writer) moved
            # the snapshot between probe and read: the pinned file
            # list is stale — fall back to the consistent current
            # snapshot (correct, just un-pruned) instead of dying
            # after the encoder work is done
            vecs = read_table(spark, store_dir)
    else:
        vecs = read_table(spark, store_dir)
    out = (hashed.join(vecs, hashed["__ch"] == vecs["content_hash"],
                       "left")
           .drop("content_hash")
           .withColumn("embedding",
                       F.when(is_empty, F.array().cast("array<float>"))
                        .otherwise(F.col("embedding")))
           .withColumn("model", F.lit(model_name))
           .withColumn("dimensions",
                       F.when(is_empty, 0).otherwise(dim).cast("int"))
           .withColumn("token_count",
                       F.when(is_empty, F.lit(0)).otherwise(F.length(c))
                        .cast("long"))
           .withColumn("has_error", is_empty)
           .withColumn("error",
                       F.when(is_empty, F.lit(EMPTY_TEXT_ERROR))
                        .cast("string"))
           .drop("__ch"))
    m_final = read_manifest(store_dir)
    n_files = len(m_final["snapshots"][str(m_final["version"])]["files"])
    return out, {"distinct_hashes": n_distinct, "new_embeddings": n_new,
                 "store_version": m_final["version"],
                 "store_files": n_files,
                 **({"store_files_probed": n_probed}
                    if n_probed is not None else {})}
