"""Pure-Python end-to-end oracle: one conversation -> extracted chunk rows.

This is the per-turn-equality ground truth the Spark pipeline is tested
against (north rule: "matching the reference's extracted text exactly under
stable (conv_id, turn_idx) ordering"). It composes the same shared core
functions the Spark UDFs use (tokenize_turn, merge_blocks_to_chunks,
mine_repeated_lines) but runs them the way the REFERENCE runs: one process,
one conversation at a time, whole block list through the sequential merge
(reference process_pdf_with_chunks, pdf_parser.py:311-347).

The Spark pipeline takes a completely different execution route (map-only
per-turn merge + window-based global index assignment) — agreement between
the two is what the equality tests establish.
"""

from __future__ import annotations

from typing import Any

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.core.blocks import tokenize_turn
from pdf_parser_spark.core.heuristics import mine_repeated_lines
from pdf_parser_spark.core.merge import merge_blocks_to_chunks


def extract_conversation(turns: list[dict[str, Any]],
                         cfg: ExtractionConfig = ExtractionConfig(),
                         ) -> list[dict[str, Any]]:
    """Extract chunk rows for one conversation.

    ``turns``: list of dicts with keys conv_id, turn_idx, text, tool —
    any order; processed in stable (turn_idx) order.

    Returns rows shaped like the Spark ``chunks`` output:
    (conv_id, chunk_idx, turn_idx, chunk_type, text, char_count,
    block_count, block_indices, table_index, image_index, table_cells).
    """
    # data-quality rule shared with the Spark paths (_drop_null_keys):
    # null-keyed rows are dropped, never ordered/grouped
    turns = [t for t in turns
             if t.get("conv_id") is not None and t.get("turn_idx") is not None]
    turns = sorted(turns, key=lambda t: t["turn_idx"])
    conv_id = turns[0]["conv_id"] if turns else None

    repeated = None
    if cfg.clean_boilerplate:
        repeated = mine_repeated_lines([t.get("text") or "" for t in turns], cfg)

    blocks: list[dict[str, Any]] = []
    for t in turns:
        blocks.extend(tokenize_turn(t["turn_idx"], t.get("text"),
                                    t.get("tool"), cfg, repeated))

    rows = []
    for chunk_idx, chunk in enumerate(merge_blocks_to_chunks(blocks, cfg)):
        rows.append({
            "conv_id": conv_id,
            "chunk_idx": chunk_idx,
            "turn_idx": chunk["page"] - 1,
            "chunk_type": chunk["chunk_type"],
            "text": chunk["text"],
            "char_count": chunk["char_count"],
            "block_count": chunk["block_count"],
            "block_indices": chunk["block_indices"],
            "table_index": chunk["table_index"],
            "image_index": chunk["image_index"],
            "table_cells": chunk["table_cells"],
        })
    return rows


def extract_many(transcript_rows: list[dict[str, Any]],
                 cfg: ExtractionConfig = ExtractionConfig(),
                 ) -> list[dict[str, Any]]:
    """Oracle over a whole transcript table (list of turn rows)."""
    by_conv: dict[str, list[dict[str, Any]]] = {}
    for r in transcript_rows:
        if r.get("conv_id") is None or r.get("turn_idx") is None:
            continue  # same null-key drop rule as the Spark paths
        by_conv.setdefault(r["conv_id"], []).append(r)
    out: list[dict[str, Any]] = []
    for conv_id in sorted(by_conv):
        out.extend(extract_conversation(by_conv[conv_id], cfg))
    return out
