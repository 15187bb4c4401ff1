"""Unit + property tests for the pure-Python merge core.

Hand cases pin the reference quirks from SURVEY.md §2.3 (reference
pdf_parser.py:151-308); the hypothesis test proves the per-turn
decomposition theorem the Spark scale path relies on.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.config import ExtractionConfig
from pdf_parser_spark.core.merge import linearize_table, merge_blocks_to_chunks, merge_turn


def text_block(page: int, content: str) -> dict:
    return {"page": page, "type": "text", "content": content,
            "metadata": {"char_count": len(content)}}


def table_block(page: int, cells, idx: int = 0) -> dict:
    return {"page": page, "type": "table", "table_index": idx, "content": cells,
            "metadata": {"rows": len(cells), "columns": len(cells[0]) if cells else 0}}


def image_block(page: int, name: str, idx: int = 0) -> dict:
    return {"page": page, "type": "image", "image_index": idx,
            "bbox": [0.0, 0.0, 1.0, 1.0],
            "metadata": {"x0": 0.0, "top": 0.0, "x1": 1.0, "bottom": 1.0,
                         "name": name, "width": 1.0, "height": 1.0}}


def test_page_boundary_flush_uses_previous_page():
    chunks = merge_blocks_to_chunks([text_block(1, "aaa"), text_block(2, "bbb")])
    assert [(c["page"], c["text"]) for c in chunks] == [(1, "aaa"), (2, "bbb")]


def test_join_spaces_uncounted_in_char_count():
    chunks = merge_blocks_to_chunks([text_block(1, "abc"), text_block(1, "de")])
    assert len(chunks) == 1
    assert chunks[0]["text"] == "abc de"
    assert chunks[0]["char_count"] == 5  # 3 + 2, joining space uncounted
    assert chunks[0]["block_count"] == 2
    assert chunks[0]["block_indices"] == [0, 1]


def test_size_flush_splits_at_threshold():
    a, b, c = "a" * 400, "b" * 400, "c" * 10
    chunks = merge_blocks_to_chunks([text_block(1, a), text_block(1, b),
                                     text_block(1, c)])
    # a+b == 800 <= 800 stays together; c overflows -> new chunk
    assert [c2["char_count"] for c2 in chunks] == [800, 10]
    assert chunks[0]["text"] == a + " " + b
    assert chunks[1]["text"] == c


def test_single_oversized_block_is_one_chunk():
    big = "x" * 2000
    chunks = merge_blocks_to_chunks([text_block(1, big)])
    assert len(chunks) == 1 and chunks[0]["char_count"] == 2000


def test_table_flushes_buffer_and_linearizes():
    cells = [["h1", "h2"], ["v", None], [], [7, 2.5]]
    chunks = merge_blocks_to_chunks([text_block(1, "t"), table_block(1, cells)])
    assert [c["chunk_type"] for c in chunks] == ["text", "table"]
    tab = chunks[1]
    assert tab["text"] == "h1 | h2\nv | \n7 | 2.5"
    # char_count counts the UN-stripped linearization (trailing newline)
    assert tab["char_count"] == len("h1 | h2\nv | \n7 | 2.5\n")
    assert tab["table_cells"] == [["h1", "h2"], ["v", None], [], ["7", "2.5"]]
    assert tab["block_indices"] == [1]


def test_linearize_table_empty_and_all_falsy_rows():
    assert linearize_table([]) == ("", 0)
    assert linearize_table([[], []]) == ("", 0)
    assert linearize_table(None) == ("", 0)


def test_image_chunk_fixed_char_count_and_empty_name():
    chunks = merge_blocks_to_chunks([image_block(1, "")])
    assert chunks[0]["text"] == "图像: "
    assert chunks[0]["char_count"] == 10
    chunks = merge_blocks_to_chunks([image_block(1, "img_7")])
    assert chunks[0]["text"] == "图像: img_7"


def test_duplicate_block_lineage_aliasing():
    # three equal blocks; buffer flushes after first two (table forces flush)
    # -> indices list ALL equal positions, including the one not in the buffer
    blk = text_block(1, "dup")
    blocks = [dict(blk), dict(blk), table_block(1, [["x"]]), dict(blk)]
    chunks = merge_blocks_to_chunks(blocks)
    assert chunks[0]["chunk_type"] == "text"
    assert chunks[0]["block_indices"] == [0, 1, 3]  # aliasing quirk preserved
    assert chunks[0]["block_count"] == 2
    assert chunks[2]["block_indices"] == [0, 1, 3]


def test_empty_content_text_block_joins():
    chunks = merge_blocks_to_chunks([text_block(1, ""), text_block(1, "abc")])
    assert chunks[0]["text"] == " abc"  # " ".join(["", "abc"]) quirk
    assert chunks[0]["char_count"] == 3


def test_overlap_extension_carries_tail():
    cfg = ExtractionConfig(overlap_chars=5)
    a, b = "a" * 799, "b" * 10
    chunks = merge_blocks_to_chunks([text_block(1, a), text_block(1, b)], cfg)
    assert len(chunks) == 2
    assert chunks[1]["text"] == "aaaaa " + b
    assert chunks[1]["char_count"] == 15


# ---------------------------------------------------------------------------
# Per-turn decomposition theorem (the Spark scale path's correctness basis)
# ---------------------------------------------------------------------------

_contents = st.text(alphabet="ab 字\n", max_size=12)


@st.composite
def _turn_blocks(draw, page: int):
    blocks = []
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.sampled_from(["text", "text", "text", "table", "image"]))
        if kind == "text":
            blocks.append(text_block(page, draw(_contents)))
        elif kind == "table":
            ncells = draw(st.integers(0, 2))
            cells = [[draw(st.one_of(st.none(), _contents, st.integers(0, 9)))
                      for _ in range(ncells)]
                     for _ in range(draw(st.integers(0, 3)))]
            blocks.append(table_block(page, cells, draw(st.integers(0, 2))))
        else:
            blocks.append(image_block(page, draw(st.sampled_from(["", "n1", "n2"])),
                                      draw(st.integers(0, 2))))
    # force duplicates sometimes to exercise aliasing across the turn
    if blocks and draw(st.booleans()):
        blocks.append(dict(blocks[0]))
    return blocks


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 6).flatmap(
    lambda n: st.tuples(*[_turn_blocks(page=i + 1) for i in range(n)])),
    st.sampled_from([ExtractionConfig(max_chars_per_chunk=8),
                     ExtractionConfig(max_chars_per_chunk=800),
                     ExtractionConfig(max_chars_per_chunk=8, overlap_chars=3)]))
def test_per_turn_decomposition_equals_whole_conversation(turns, cfg):
    whole = merge_blocks_to_chunks([b for t in turns for b in t], cfg)

    stitched = []
    offset = 0
    for t in turns:
        for c in merge_turn(t, cfg):
            c = dict(c)
            c["block_indices"] = [i + offset for i in c["block_indices"]]
            stitched.append(c)
        offset += len(t)

    assert stitched == whole


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 5).flatmap(
    lambda n: st.tuples(*[_turn_blocks(page=i + 1) for i in range(n)])),
    st.sampled_from([ExtractionConfig(max_chars_per_chunk=8),
                     ExtractionConfig(max_chars_per_chunk=800)]))
def test_chunk_invariants(turns, cfg):
    """SURVEY §5.4 invariants (parity mode, no overlap):
    - a text chunk never exceeds max_chars unless a single block does;
    - block_count == number of buffered members for text chunks, 1 else;
    - every block index appears in >=1 chunk's lineage, and the union of
      lineages covers exactly the duplicate-aliased index set;
    - concatenating text-chunk members (via lineage) reconstructs the
      stripped block contents in order."""
    blocks = [b for t in turns for b in t]
    chunks = merge_blocks_to_chunks(blocks, cfg)
    if not blocks:
        assert chunks == []
        return
    # duplicate aliasing: an index is representable iff some equal-valued
    # block occupies it (text lineage lists ALL equal positions; table and
    # image lineage lists the first)
    covered = set()
    for c in chunks:
        assert c["block_indices"] == sorted(c["block_indices"])
        covered.update(c["block_indices"])
        if c["chunk_type"] == "text":
            if c["block_count"] > 1:
                assert c["char_count"] <= cfg.max_chars_per_chunk
            member_contents = [blocks[i]["content"]
                               for i in c["block_indices"]
                               if blocks[i].get("type", "text") == "text"]
            # every lineage member's content is a substring of the chunk
            for mc in member_contents:
                assert mc in c["text"]
        else:
            assert c["block_count"] == 1
            assert len(c["block_indices"]) == 1
    # coverage: every position is either covered or aliases an equal block
    # at a covered position
    import json as _json

    def key(b):
        return _json.dumps(b, sort_keys=True, ensure_ascii=False, default=str)

    covered_keys = {key(blocks[i]) for i in covered}
    for i, b in enumerate(blocks):
        assert i in covered or key(b) in covered_keys, (i, b)
