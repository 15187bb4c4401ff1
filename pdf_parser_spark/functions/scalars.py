"""Scalar column functions — SURVEY.md §2.8 (C1–C16) as reusable JVM
expressions.

Every function here returns a ``Column`` built purely from
``pyspark.sql.functions`` (whole-stage-codegen friendly, no Python in the
hot path). Where the reference's Python semantics can't survive a JVM
round-trip exactly (C3 table linearization with mixed cell types), the
equality-critical variant lives in the merge core instead and the
SQL-expressible approximation is provided here for analytics use.

Reference citations per function:
- C1  null-safe length          — estimate_text_length, pdf_parser.py:138-148
- C3  table linearization       — pdf_parser.py:244-256
- C4  md5 chunk ids             — gea_qa_agent.py:109, migrate_to_chroma.py:127
- C5  lowercase contains        — gea_qa_agent.py:332-343
- C6  additive score fusion     — gea_qa_agent.py:345-352 (0.5/0.3/0.2)
- C7  distance -> similarity    — gea_qa_agent_chroma.py:177-179
- C8  similarity decay          — gea_qa_agent.py:309 (0.8x)
- C9  truncate + ellipsis       — gea_qa_agent.py:580-582
- C10 image display string      — pdf_parser.py:286
- C11 bbox arithmetic           — pdf_parser.py:91-92
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_parser_spark.core.merge import (IMAGE_CONTENT_PREFIX,
                                         IMAGE_NAME_DEFAULT)


def null_safe_length(col: Column) -> Column:
    """C1: len(text) if text else 0 — NULL and '' both count 0."""
    return F.coalesce(F.length(col), F.lit(0))


def chunk_id(source: Column, idx: Column) -> Column:
    """C4: md5(f"{source}_{idx}")[:16]; built-in md5 == hashlib.md5."""
    return F.substring(
        F.md5(F.concat_ws("_", source, idx.cast("string"))), 1, 16)


def keyword_hit(col: Column, keyword: str) -> Column:
    """C5: case-insensitive containment."""
    return F.contains(F.lower(F.coalesce(col, F.lit(""))),
                      F.lit(keyword.lower()))


def additive_keyword_score(content_hit: Column, meta_hit: Column,
                           source_hit: Column, content_w: float = 0.5,
                           meta_w: float = 0.3, source_w: float = 0.2,
                           ) -> Column:
    """C6: additive fusion with the reference's 0.5/0.3/0.2 weights."""
    return (F.when(content_hit, content_w).otherwise(0.0)
            + F.when(meta_hit, meta_w).otherwise(0.0)
            + F.when(source_hit, source_w).otherwise(0.0))


def distance_to_similarity(dist: Column) -> Column:
    """C7: 1 / (1 + L2 distance)."""
    return F.lit(1.0) / (F.lit(1.0) + dist)


def similarity_decay(sim: Column, decay: float = 0.8) -> Column:
    """C8: context-expansion decay."""
    return sim * F.lit(decay)


def truncate_ellipsis(col: Column, n: int) -> Column:
    """C9: content[:n] + '...' when longer."""
    return F.when(F.length(col) > n,
                  F.concat(F.substring(col, 1, n), F.lit("..."))) \
            .otherwise(col)


def image_display(name: Column) -> Column:
    """C10: f"图像: {name or '未命名'}" — empty/NULL name falls back."""
    safe = F.when(name.isNull() | (name == ""), F.lit(IMAGE_NAME_DEFAULT)) \
            .otherwise(name)
    return F.concat(F.lit(IMAGE_CONTENT_PREFIX), safe)


def bbox_width(x0: Column, x1: Column) -> Column:
    """C11: width = x1 - x0."""
    return x1 - x0


def bbox_height(top: Column, bottom: Column) -> Column:
    """C11: height = bottom - top."""
    return bottom - top


def table_linearize_sql(cells: Column) -> Column:
    """C3 (SQL variant): rows joined ' | ', lines joined '\\n', falsy rows
    skipped, NULL cells as '' — over ``array<array<string>>``. The
    bit-exact Python variant (handles numeric cells via str()) is
    core/merge.linearize_table; this expression matches it whenever cells
    are already strings."""
    def _line(row):
        return F.array_join(F.transform(row, lambda c: F.coalesce(c, F.lit(""))),
                            " | ")

    nonempty = F.filter(cells, lambda row: F.size(row) > 0)
    return F.trim(F.array_join(F.transform(nonempty, _line), "\n"))


def estimate_cost(tokens: Column, rate_per_mtok: float = 0.75) -> Column:
    """C16: LLM cost estimate — ``tokens / 1e6 * rate`` (reference
    interactive_rag_demo.py:153, the gpt-4o-mini output rate). The data
    operation is a plain expression; only the LLM call around it was out
    of scope."""
    return F.round(tokens.cast("double") / 1_000_000.0 * rate_per_mtok, 6)
