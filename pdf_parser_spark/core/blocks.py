"""Turn -> typed blocks tokenizer (pure Python, shared by UDFs and oracle).

Graft of the reference's page scanner (reference pdf_parser.py:26-125): one
PDF page becomes one transcript turn; ``page.extract_text()`` becomes the
``text`` column; ``page.extract_tables()`` / ``page.images`` become payloads
parsed from the ``tool`` column.

Internal ``page`` numbers are 1-based (``turn_idx + 1``) exactly like the
reference's ``page_idx + 1`` (reference pdf_parser.py:44), so latent quirks
that key off page truthiness (e.g. the final-flush ``current_page or 1``
fallback at reference pdf_parser.py:299) stay latent here too instead of
corrupting turn 0.

Block shapes mirror the reference's tagged-union dicts exactly
(reference pdf_parser.py:49-95):

- text:  {page, type:"text", content:<stripped>, metadata:{char_count:<raw len>}}
  NB the reference quirk: the block is emitted when the RAW text is truthy,
  content is ``raw.strip()`` but metadata.char_count is ``len(raw)`` — a
  whitespace-only page yields a block with empty content and char_count > 0
  (reference pdf_parser.py:47-57). Preserved.
- table: {page, type:"table", table_index, content:List[List[cell]],
          metadata:{rows, columns}} with columns = len(first row)
  (reference pdf_parser.py:63-75).
- image: {page, type:"image", image_index, bbox, metadata:{x0,top,x1,bottom,
          name, width, height}} with width/height derived arithmetically
  (reference pdf_parser.py:78-95).

Tool payload format (this graft's own convention — the transcript analog of
pdfplumber's extraction results): a JSON object
``{"tables": [[[cell,...],...], ...], "images": [{"x0","top","x1","bottom","name"}, ...]}``.
Cells may be strings, numbers or null (the merge's linearization applies
``str(cell)`` coercion like reference pdf_parser.py:247). Malformed / non-JSON
tool payloads contribute no blocks (the reference's error dicts short-circuit
a document; per-turn we degrade to "no structured payload" instead so one bad
turn cannot poison a 10^12-turn job).
"""

from __future__ import annotations

import json
import re
from typing import Any

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.core.heuristics import boilerplate_flags

_PARA_SPLIT = re.compile(r"\n\s*\n")


def _text_blocks_from_clean(page: int, text: str | None,
                            cfg: ExtractionConfig) -> list[dict[str, Any]]:
    """Text blocks from already-cleaned turn text (None/empty -> none)."""
    if not text:
        return []
    if cfg.tokenizer_mode == "paragraphs":
        pieces = [p for p in _PARA_SPLIT.split(text) if p]
    else:
        pieces = [text]
    blocks = []
    for piece in pieces:
        blocks.append({
            "page": page,
            "type": "text",
            "content": piece.strip(),
            "metadata": {"char_count": len(piece)},
        })
    return blocks


def _tool_payload(tool: str | None) -> dict[str, Any]:
    if not tool:
        return {}
    try:
        payload = json.loads(tool)
    except (ValueError, TypeError):
        return {}
    return payload if isinstance(payload, dict) else {}


def _table_blocks(page: int, payload: dict[str, Any]) -> list[dict[str, Any]]:
    tables = payload.get("tables")
    if not isinstance(tables, list):
        return []
    blocks = []
    for table_idx, table in enumerate(tables):
        if not isinstance(table, list):
            continue
        blocks.append({
            "page": page,
            "type": "table",
            "table_index": table_idx,
            "content": table,
            "metadata": {
                "rows": len(table),
                "columns": len(table[0]) if table else 0,
            },
        })
    return blocks


def _image_blocks(page: int, payload: dict[str, Any]) -> list[dict[str, Any]]:
    images = payload.get("images")
    if not isinstance(images, list):
        return []
    blocks = []
    for img_idx, image in enumerate(images):
        if not isinstance(image, dict):
            continue
        x0 = float(image.get("x0", 0.0))
        top = float(image.get("top", 0.0))
        x1 = float(image.get("x1", 0.0))
        bottom = float(image.get("bottom", 0.0))
        blocks.append({
            "page": page,
            "type": "image",
            "image_index": img_idx,
            "bbox": [x0, top, x1, bottom],
            "metadata": {
                "x0": x0, "top": top, "x1": x1, "bottom": bottom,
                "name": image.get("name", ""),
                "width": x1 - x0,
                "height": bottom - top,
            },
        })
    return blocks


def tokenize_turn_stats(turn_idx: int, text: str | None, tool: str | None,
                        cfg: ExtractionConfig, repeated=None,
                        ) -> tuple[list[dict[str, Any]], int, int]:
    """Tokenize one turn; return (blocks, n_lines, n_lines_dropped).

    Block order within a turn mirrors the reference's within-page order:
    text block(s), then table blocks, then image blocks
    (reference pdf_parser.py:46-95).

    The line counters are the cleaning metrics of the north rule ("blocks
    kept/dropped"): ``n_lines`` = raw newline-split lines (0 for
    null/empty), ``n_lines_dropped`` = boilerplate-stripped lines (0 in
    parity mode by construction). Boilerplate classification runs ONCE here
    and feeds both the cleaned blocks and the counters — metrics never cost
    a second tokenize pass.
    """
    page = turn_idx + 1
    lines = text.split("\n") if text else []
    if cfg.clean_boilerplate and text:
        flags = boilerplate_flags(lines, cfg, repeated)
        dropped = sum(flags)
        cleaned = "\n".join(ln for ln, f in zip(lines, flags) if not f)
    else:
        dropped = 0
        cleaned = text
    payload = _tool_payload(tool)
    blocks = (_text_blocks_from_clean(page, cleaned, cfg)
              + _table_blocks(page, payload)
              + _image_blocks(page, payload))
    return blocks, len(lines), dropped


def tokenize_turn(turn_idx: int, text: str | None, tool: str | None,
                  cfg: ExtractionConfig,
                  repeated=None) -> list[dict[str, Any]]:
    """Tokenize one turn into its ordered block list."""
    return tokenize_turn_stats(turn_idx, text, tool, cfg, repeated)[0]
