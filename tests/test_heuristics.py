"""Tests for main-content heuristics and the synthetic generator."""

from __future__ import annotations

from pdf_parser_spark.config import CLEANING_CONFIG, DEFAULT_CONFIG, ExtractionConfig
from pdf_parser_spark.core.blocks import tokenize_turn
from pdf_parser_spark.core.heuristics import (
    alnum_density, clean_text, is_boilerplate_line, link_ratio,
    mine_repeated_lines, normalize_line)
from pdf_parser_spark.core.oracle import extract_conversation
from pdf_parser_spark.sources.synth import generate_transcripts


def test_normalize_line():
    assert normalize_line("  Foo\t Bar  ") == "foo bar"
    assert normalize_line("") == ""


def test_link_ratio_and_density():
    assert link_ratio("see http://x.co/page now") > 0.4
    assert link_ratio("plain prose") == 0.0
    assert alnum_density("----") == 0.0
    assert alnum_density("abcd") == 1.0


def test_boilerplate_lines():
    cfg = CLEANING_CONFIG
    assert is_boilerplate_line("================", cfg)
    assert is_boilerplate_line("[home](http://e.com/1) | [next](http://e.com/2)", cfg)
    assert not is_boilerplate_line("ordinary sentence about spark plans", cfg)
    assert not is_boilerplate_line("   ", cfg)  # blank = structure, kept
    assert is_boilerplate_line("anything", cfg, repeated=frozenset(["anything"]))


def test_clean_text_drops_whole_lines_only():
    cfg = CLEANING_CONFIG
    text = "keep me\n----------------\nand me"
    assert clean_text(text, cfg) == "keep me\nand me"


def test_mine_repeated_lines_counts_distinct_turns():
    cfg = ExtractionConfig(min_repeat_turns=3)
    texts = ["HeadeR One\nbody a", "header one\nbody b",
             "header  one\nbody c\nheader one", "unique"]
    # "header one" appears in 3 distinct turns (twice in turn 3 counts once)
    assert mine_repeated_lines(texts, cfg) == frozenset(["header one"])
    cfg4 = ExtractionConfig(min_repeat_turns=4)
    assert mine_repeated_lines(texts, cfg4) == frozenset()


def test_tokenize_whitespace_only_turn_quirk():
    # raw truthy, strip-empty: block emitted with empty content,
    # char_count = raw length (reference pdf_parser.py:47-57)
    blocks = tokenize_turn(0, "   \n  ", None, DEFAULT_CONFIG)
    assert len(blocks) == 1
    assert blocks[0]["content"] == ""
    assert blocks[0]["metadata"]["char_count"] == 6
    assert tokenize_turn(0, "", None, DEFAULT_CONFIG) == []
    assert tokenize_turn(0, None, None, DEFAULT_CONFIG) == []


def test_tokenize_tool_payloads():
    tool = ('{"tables": [[["a", null, 3]]], '
            '"images": [{"x0": 1, "top": 2, "x1": 4, "bottom": 8, "name": "i"}]}')
    blocks = tokenize_turn(2, "hello", tool, DEFAULT_CONFIG)
    assert [b["type"] for b in blocks] == ["text", "table", "image"]
    assert blocks[0]["page"] == 3  # 1-based like the reference's page_idx+1
    assert blocks[1]["metadata"] == {"rows": 1, "columns": 3}
    img = blocks[2]["metadata"]
    assert img["width"] == 3.0 and img["height"] == 6.0
    # malformed payloads contribute no blocks
    assert tokenize_turn(0, None, "not json", DEFAULT_CONFIG) == []
    assert tokenize_turn(0, None, "[1,2]", DEFAULT_CONFIG) == []


def test_paragraph_mode_splits_blocks():
    cfg = ExtractionConfig(tokenizer_mode="paragraphs")
    blocks = tokenize_turn(0, "para one\n\npara two\n \npara three", None, cfg)
    assert [b["content"] for b in blocks] == ["para one", "para two", "para three"]


def test_synth_deterministic_and_shaped():
    a = generate_transcripts(20, seed=7)
    b = generate_transcripts(20, seed=7)
    assert a == b
    assert generate_transcripts(20, seed=8) != a
    cols = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert set(a[0]) == cols
    # oracle runs clean over synth data in every mode
    convs: dict[str, list] = {}
    for r in a:
        convs.setdefault(r["conv_id"], []).append(r)
    for cfg in (DEFAULT_CONFIG, CLEANING_CONFIG):
        n = sum(len(extract_conversation(t, cfg)) for t in convs.values())
        assert n > 0
