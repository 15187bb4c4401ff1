"""Shared extraction configuration.

One frozen config consumed by BOTH the pure-Python oracle (tests) and the
Spark pipeline, so heuristic thresholds can never drift between the two
(SURVEY.md §2.11: "thresholds fixed in one config struct so the oracle and
the Spark pipeline share them").

Defaults mirror the reference where a reference value exists:
- ``max_chars_per_chunk=800`` — reference ``merge_blocks_to_chunks`` default
  (reference pdf_parser.py:151).
- ``image_char_count=10`` — fixed image-chunk char count
  (reference pdf_parser.py:287).

The main-content heuristics (boilerplate stripping, repeated header/footer
removal, density / link-ratio classification) are graft extensions required
by the north rule; the reference only carries them in embryo (its block
``type`` discriminator + type filters). They are **off by default** so the
default mode reproduces the reference's extracted text bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractionConfig:
    # --- chunk merge (reference parity) ---
    max_chars_per_chunk: int = 800

    # --- tokenizer ---
    # "turn": one text block per turn (reference parity: one text block per
    #         page, reference pdf_parser.py:47-58).
    # "paragraphs": DOM-like block tree — one text block per blank-line
    #         separated paragraph (north-rule extension; exercises the
    #         stateful within-turn merge).
    tokenizer_mode: str = "turn"

    # --- main-content heuristics (north-rule extensions, flag-gated) ---
    clean_boilerplate: bool = False
    # a line is boilerplate if alnum-density < min_line_density
    min_line_density: float = 0.35
    # ... or if link-ish characters make up > max_link_ratio of the line
    max_link_ratio: float = 0.40
    # a normalized line repeated in >= min_repeat_turns distinct turns of the
    # same conversation is a header/footer and is dropped
    min_repeat_turns: int = 3
    # lines shorter than this (normalized) are never mined as repeats
    min_repeat_line_chars: int = 4

    # --- overlap-aware chunking (north-rule extension, flag-gated; the
    # reference chunker is strictly non-overlapping) ---
    overlap_chars: int = 0

    # --- constants pinned to the reference ---
    image_char_count: int = 10


DEFAULT_CONFIG = ExtractionConfig()
PARAGRAPH_CONFIG = ExtractionConfig(tokenizer_mode="paragraphs")
CLEANING_CONFIG = ExtractionConfig(tokenizer_mode="paragraphs", clean_boilerplate=True)
