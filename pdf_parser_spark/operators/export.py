"""Vector-store export + RAG context assembly.

Completes the reference's query lifecycle (SURVEY §3.3) minus the LLM call:

- ``flatten_for_store``: the reference's Chroma migration schema flattening
  (reference migrate_to_chroma.py:120-150): drop invalid-embedding rows
  (F3), synthesize md5 ids (C4), coerce non-string content to a string
  (C12), JSON-stringify ``block_indices`` into flat metadata (C13) and
  reduce ``blocks``-style nested payloads to a boolean (``has_blocks``
  analog: ``has_cells``). Output is the ids/embeddings/documents/metadatas
  quadruplet shape, one row per chunk — writable to any vector store via
  its Spark connector or ``foreachPartition`` batch-add (S12).
- ``build_context``: the reference's ``_build_context``
  (reference gea_rag_agent_openai.py:190-292): top-k by cosine, dedup by
  id (U2), per-chunk headers ``[文档N] | 来源 | 轮次 | 类型 | 相似度``
  (C14), joined into ONE prompt string per query — all JVM expressions
  (collect_list over an ordered window + array_join), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.retrieval import (search_by_text,
                                                  with_chunk_id)


def flatten_for_store(chunks: DataFrame,
                      emb_col: str = "embedding") -> DataFrame:
    """Chunk rows -> flat (id, embedding, document, metadata columns)."""
    valid = chunks.where(F.col(emb_col).isNotNull()
                         & (F.size(emb_col) > 0))      # F3
    keyed = with_chunk_id(valid)                        # C4 md5 id
    return keyed.select(
        "id",
        F.col(emb_col).alias("embedding"),
        F.coalesce(F.col("text"), F.lit("")).alias("document"),   # C12
        F.col("conv_id").alias("meta_source"),
        F.col("turn_idx").alias("meta_turn"),
        F.col("chunk_type").alias("meta_type"),
        F.col("char_count").alias("meta_char_count"),
        F.to_json(F.col("block_indices")).alias("meta_block_indices"),  # C13
        F.col("table_cells").isNotNull().alias("meta_has_cells"),
    )


def format_table_cells(cells, max_rows: int = 10):
    """Nested table rows -> the reference's pretty-print (T4 truncation).

    Mirrors ``_format_table`` (reference gea_rag_agent_openai.py:269-291)
    exactly: first ``max_rows`` rows each rendered as
    ``" | ".join(cell or "")``, joined by newlines, with the literal
    suffix line ``... (还有 N 行)`` when rows were cut. Pure JVM
    (slice/transform/array_join) — no Python in the hot path.
    """
    head = F.transform(
        F.slice(cells, 1, max_rows),
        lambda row: F.array_join(
            F.transform(row, lambda c: F.coalesce(c, F.lit(""))),
            " | ", ""))
    n_more = F.size(cells) - F.lit(max_rows)
    lines = F.when(
        n_more > 0,
        F.concat(head, F.array(F.format_string("... (还有 %d 行)", n_more)))
    ).otherwise(head)
    return F.array_join(lines, "\n")


def build_context(chunks: DataFrame, query_vec: list[float],
                  top_k: int = 5, max_chars: int = 4000,
                  max_table_rows: int = 10) -> DataFrame:
    """Top-k retrieval -> one formatted context string (1-row DataFrame).

    Header format mirrors the reference (gea_rag_agent_openai.py:228-292):
    ``[文档N] 来源: <conv> | 轮次: <turn> | 类型: <type> | 相似度: <sim>``
    followed by the chunk body; chunks joined by blank lines; final
    truncation to ``max_chars`` (C9). Table chunks render their nested
    cells as ``表格内容：`` + the first ``max_table_rows`` rows with a
    ``... (还有 N 行)`` suffix (reference ``_format_chunk``/
    ``_format_table``, gea_rag_agent_openai.py:257-291) — text chunks
    (and inputs without a ``table_cells`` column) keep the linearized
    ``text``.
    """
    hits = with_chunk_id(search_by_text(chunks, query_vec, top_k=top_k)) \
        .dropDuplicates(["id"])                         # U2
    header = F.format_string(
        "[文档%d] 来源: %s | 轮次: %d | 类型: %s | 相似度: %.4f",
        F.col("rank"), F.col("conv_id"), F.col("turn_idx"),
        F.col("chunk_type"), F.col("similarity"))
    body = F.coalesce(F.col("text"), F.lit(""))
    if "table_cells" in hits.columns:
        body = F.when(
            (F.col("chunk_type") == "table")
            & F.col("table_cells").isNotNull(),
            F.concat(F.lit("表格内容：\n"),
                     format_table_cells(F.col("table_cells"),
                                        max_table_rows))
        ).otherwise(body)
    formatted = hits.select(
        F.col("rank"),
        F.concat(header, F.lit("\n"), body).alias("entry"))
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding,
                                           Window.unboundedFollowing)
    ctx = (formatted
           .withColumn("context", F.array_join(
               F.collect_list("entry").over(w), "\n\n"))
           .select("context").limit(1))
    return ctx.select(
        F.when(F.length("context") > max_chars,
               F.concat(F.substring("context", 1, max_chars), F.lit("...")))
         .otherwise(F.col("context")).alias("context"),
        F.length("context").alias("raw_chars"))


def write_to_vector_store(flat: DataFrame, client_factory,
                          batch_size: int = 100) -> dict:
    """S12: batched vector-store sink over the flattened quadruplet rows.

    The reference's migration loop (migrate_to_chroma.py:163-212) is a
    driver-side for-loop calling ``collection.add(ids, embeddings,
    documents, metadatas)`` in batches of 100 with progress accounting;
    distributed, that becomes ``foreachPartition``: each task constructs
    its OWN client (once per partition — connections are not serializable)
    and streams its partition in ``batch_size`` slices, so 10^9 rows write
    with per-executor parallelism and bounded memory.

    ``client_factory`` -> an object with
    ``add(ids, embeddings, documents, metadatas)`` (the Chroma collection
    surface; any store adapts behind it). A failing batch is logged-and-
    skipped in the reference — here it propagates to Spark's task retry,
    which is the correct distributed semantics (idempotent stores tolerate
    the replay; the reference's skip silently loses data).

    Returns {"rows", "batches"} counted via accumulators — the analog of
    the reference's final-count verification (migrate_to_chroma.py:208).
    """
    sc = flat.sparkSession.sparkContext
    rows_acc = sc.accumulator(0)
    batches_acc = sc.accumulator(0)
    meta_cols = [c for c in flat.columns
                 if c.startswith("meta_")]
    id_col, emb_col, doc_col = "id", "embedding", "document"

    def write_partition(rows):
        client = client_factory()
        ids, embs, docs, metas = [], [], [], []

        def flush():
            if not ids:
                return
            client.add(ids=list(ids), embeddings=list(embs),
                       documents=list(docs), metadatas=list(metas))
            batches_acc.add(1)
            rows_acc.add(len(ids))
            ids.clear(); embs.clear(); docs.clear(); metas.clear()

        for r in rows:
            ids.append(r[id_col])
            embs.append(list(r[emb_col]))
            docs.append(r[doc_col])
            metas.append({c[len("meta_"):]: r[c] for c in meta_cols})
            if len(ids) >= batch_size:
                flush()
        flush()

    flat.foreachPartition(write_partition)
    return {"rows": rows_acc.value, "batches": batches_acc.value}


def write_jsonl(df, path: str) -> None:
    """Write the corpus as JSONL (one JSON object per line) — the
    format trainers ingest. Spark's json sink IS jsonl (one object per
    line per part file); gzip keeps the text corpus ~4-8x smaller on
    the wire, splittable-enough at one part per task. Unicode survives
    round-trip (Spark writes UTF-8, not \\u escapes, for non-ASCII).
    """
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def read_jsonl(spark, path: str, schema: str):
    """Schema-pinned JSONL reader (never infer on a 100 TB corpus: the
    inference pass is a full extra scan, and a single corrupt line can
    silently widen a column to string)."""
    return spark.read.schema(schema).json(path)
