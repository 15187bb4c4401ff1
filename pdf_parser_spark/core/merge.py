"""Blocks -> chunks merge: the stateful segmentation core.

Reimplements, from scratch, the exact semantics of the reference's
``merge_blocks_to_chunks`` (reference pdf_parser.py:151-308) — the single
operator per-turn text equality depends on. Semantics preserved (each with
its reference citation):

1. Blocks are processed in list order with a running open text buffer and
   its char count (pdf_parser.py:162-168).
2. Page-boundary flush: when the page changes and the buffer is non-empty,
   a text chunk is emitted with ``page`` = the PREVIOUS page
   (pdf_parser.py:172-186).
3. A text block joins the buffer if the buffer is empty, or if
   ``current_chars + len(content) <= max_chars_per_chunk``; otherwise the
   buffer is flushed first. Quirk preserved: a size-flush stamps the emitted
   chunk with the CURRENT block's page, not the buffer's origin page
   (pdf_parser.py:211 vs :177). Chunk content is the members' contents
   joined by single spaces (pdf_parser.py:174,208); ``char_count`` is the
   SUM of member content lengths — the joining spaces are uncounted
   (pdf_parser.py:195,204 via estimate_text_length, :138-148).
4. A table block force-flushes the buffer, then emits a standalone table
   chunk whose ``text_content`` linearizes rows as
   ``" | ".join(str(cell) if cell is not None else "")`` + "\\n", skipping
   falsy rows, finally ``.strip()``-ed; ``char_count`` counts the
   UN-stripped linearization (trailing newline included)
   (pdf_parser.py:224-261).
5. An image block force-flushes the buffer, then emits an image chunk with
   content ``f"图像: {metadata.name or default}"`` and a FIXED char_count of
   10 (pdf_parser.py:264-292).
6. Final flush after the loop with ``page = current_page or 1``
   (pdf_parser.py:294-306).
7. Lineage: text-chunk ``block_indices`` = every index i whose block
   compares EQUAL to any buffer member (duplicate blocks alias — and a
   duplicate outside the buffer is still listed; pdf_parser.py:181,215);
   table/image chunks use first-match-by-equality (``list.index``,
   pdf_parser.py:258,288). The reference computes this O(n^2); we reproduce
   the VALUES with a precomputed equality-key index in O(n).

Equality keys use a canonical JSON encoding of the block dict; for the
JSON-derived value types in play (str/int/float/bool/None/list/dict) this
matches Python dict equality. (Sole divergence: a table cell ``1`` vs
``1.0`` — equal in Python, distinct here. Both the oracle and the Spark
path share this key function, so per-turn equality between them is
unaffected.)

Per-turn decomposition theorem
------------------------------
With page == turn (every turn is a new page), the text buffer can NEVER
span turns: the first block of the next turn triggers the page-boundary
flush (rule 2) before anything else, and the flush stamps the buffer's own
turn. Therefore running this merge over each turn's blocks independently and
concatenating the outputs (offsetting block indices by the count of blocks
in prior turns) yields EXACTLY the whole-conversation result — including the
duplicate-aliasing lineage, because block dicts carry ``page`` and so can
only compare equal within one turn. ``tests/test_merge_core.py`` property-
tests this equivalence. The Spark scale path (operators/merge.py) exploits
it: tokenize+merge is map-only; only global index assignment needs a
(narrow, chunk-level) window shuffle.

Overlap-aware chunking (north-rule extension, ``cfg.overlap_chars > 0``):
on a size-flush, the next chunk is seeded with the last ``overlap_chars``
characters of the flushed content as a carry prefix. The reference chunker
is strictly non-overlapping (pdf_parser.py:151-308), so this is off by
default; it is within-turn only, preserving the decomposition theorem.
"""

from __future__ import annotations

import json
from typing import Any

from pdf_parser_spark.config import ExtractionConfig

IMAGE_CONTENT_PREFIX = "图像: "
IMAGE_NAME_DEFAULT = "未命名"


def _tlen(text: str | None) -> int:
    # reference estimate_text_length (pdf_parser.py:138-148)
    return len(text) if text else 0


def _block_key(block: dict[str, Any]):
    # fast path for the dominant text variant: a plain tuple key — same
    # equality semantics (all fields compared), ~5x cheaper than json.dumps.
    # Tuple and str keys cannot collide across variants.
    if block.get("type") == "text":
        md = block.get("metadata") or {}
        return (block.get("page"), block.get("content"), md.get("char_count"))
    return json.dumps(block, sort_keys=True, ensure_ascii=False, default=str)


def linearize_table(cells: Any) -> tuple[str, int]:
    """Return (text_content, char_count) for a table's nested cell array.

    char_count counts the un-stripped linearization (incl. trailing
    newline); text_content is stripped (pdf_parser.py:244-256).
    """
    raw = ""
    if isinstance(cells, list):
        for row in cells:
            if row:
                raw += " | ".join("" if c is None else str(c) for c in row) + "\n"
    return raw.strip(), _tlen(raw)


def _coerce_cells(cells: Any) -> list[list[str | None]] | None:
    """Table cells coerced to str-or-null for the Spark output schema."""
    if not isinstance(cells, list):
        return None
    out = []
    for row in cells:
        if isinstance(row, list):
            out.append([None if c is None else str(c) for c in row])
        else:
            out.append([])
    return out


def merge_blocks_to_chunks(blocks: list[dict[str, Any]],
                           cfg: ExtractionConfig = ExtractionConfig(),
                           ) -> list[dict[str, Any]]:
    """Merge an ordered block list into flat chunk rows.

    Returns chunk dicts with keys:
    chunk_type, page, text, char_count, block_count, block_indices,
    table_index, image_index, table_cells.
    (``text`` is the per-turn-equality target: joined content for text
    chunks, stripped linearization for table chunks, the display string for
    image chunks.)
    """
    keys = [_block_key(b) for b in blocks]
    index_of_key: dict[str, list[int]] = {}
    for i, k in enumerate(keys):
        index_of_key.setdefault(k, []).append(i)

    chunks: list[dict[str, Any]] = []
    buf: list[int] = []          # positions of buffered text blocks
    buf_chars = 0
    carry = ""                   # overlap prefix (extension; "" in parity mode)
    current_page: int | None = None
    max_chars = cfg.max_chars_per_chunk

    def emit_text(page: int) -> None:
        nonlocal buf, buf_chars, carry
        member_keys = {keys[p] for p in buf}
        indices = sorted({i for k in member_keys for i in index_of_key[k]})
        joined = " ".join(blocks[p]["content"] for p in buf)
        if carry:
            joined = carry + " " + joined if joined else carry
        chunks.append({
            "chunk_type": "text",
            "page": page,
            "text": joined,
            "char_count": buf_chars + len(carry),
            "block_count": len(buf),
            "block_indices": indices,
            "table_index": None,
            "image_index": None,
            "table_cells": None,
        })

    def reset_buffer() -> None:
        nonlocal buf, buf_chars, carry
        buf = []
        buf_chars = 0
        carry = ""

    for pos, block in enumerate(blocks):
        page = block.get("page", 1)

        if current_page is not None and page != current_page and buf:
            emit_text(current_page)   # page-boundary flush: previous page
            reset_buffer()
        current_page = page

        btype = block.get("type", "text")

        if btype == "text":
            chars = _tlen(block.get("content", ""))
            if not buf:
                buf = [pos]
                buf_chars = chars
            elif buf_chars + chars <= max_chars:
                buf.append(pos)
                buf_chars += chars
            else:
                flushed_text = " ".join(blocks[p]["content"] for p in buf)
                emit_text(page)       # size-flush quirk: CURRENT block's page
                reset_buffer()
                if cfg.overlap_chars > 0:
                    carry = flushed_text[-cfg.overlap_chars:]
                buf = [pos]
                buf_chars = chars

        elif btype == "table":
            if buf:
                emit_text(page)
                reset_buffer()
            cells = block.get("content", [])
            text_content, char_count = linearize_table(cells)
            chunks.append({
                "chunk_type": "table",
                "page": page,
                "text": text_content,
                "char_count": char_count,
                "block_count": 1,
                "block_indices": [index_of_key[keys[pos]][0]],
                "table_index": block.get("table_index", 0),
                "image_index": None,
                "table_cells": _coerce_cells(cells),
            })

        elif btype == "image":
            if buf:
                emit_text(page)
                reset_buffer()
            name = block.get("metadata", {}).get("name", IMAGE_NAME_DEFAULT)
            chunks.append({
                "chunk_type": "image",
                "page": page,
                "text": f"{IMAGE_CONTENT_PREFIX}{name}",
                "char_count": cfg.image_char_count,
                "block_count": 1,
                "block_indices": [index_of_key[keys[pos]][0]],
                "table_index": None,
                "image_index": block.get("image_index", 0),
                "table_cells": None,
            })

    if buf:
        emit_text(current_page if current_page else 1)  # final flush

    return chunks


def merge_turn(blocks: list[dict[str, Any]],
               cfg: ExtractionConfig = ExtractionConfig(),
               ) -> list[dict[str, Any]]:
    """Merge ONE turn's blocks; block_indices are turn-local.

    Exactness relies on the per-turn decomposition theorem (module
    docstring): identical to running the whole-conversation merge and
    slicing this turn's chunks, modulo the caller adding the global block
    offset.
    """
    return merge_blocks_to_chunks(blocks, cfg)
