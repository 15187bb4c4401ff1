"""Main-content heuristics: line-level boilerplate classification.

The north rule requires boilerplate stripping, header/footer and
repeated-element removal, and density / link-ratio classification. The
reference carries these only in embryo (a ``type`` discriminator plus type
filters, reference pdf_parser.py:102-104 / gea_qa_agent.py:247-249); the
concrete heuristics here are the graft's generalization, with all thresholds
in :class:`pdf_parser_spark.config.ExtractionConfig` so the Spark pipeline
and the pytest oracle share them exactly.

Everything here is deterministic pure Python over single strings — it runs
inside vectorized pandas UDFs on executors and inside the oracle on the
driver, and must stay dependency-free.
"""

from __future__ import annotations

import re

from pdf_parser_spark.config import ExtractionConfig

# characters that indicate navigation / link boilerplate
_LINK_TOKEN = re.compile(r"https?://\S+|www\.\S+|\[[^\]]*\]\([^)]*\)|</?a\b[^>]*>")


def normalize_line(line: str) -> str:
    """Canonical form used for repeated-element (header/footer) mining.

    Lowercase, strip, collapse internal whitespace — implemented as
    ``" ".join(line.split()).lower()`` (C-level, ~5x the regex-sub
    formulation; ``str.split()`` with no argument splits on unicode
    whitespace runs and strips, exactly the
    ``lower(trim(regexp_replace(line, '\\s+', ' ')))`` SQL twin). Both the
    Spark UDF and the oracle call THIS function, so the two sides cannot
    drift.
    """
    return " ".join(line.split()).lower()


# cheap substring pre-filter: a line without any of these cannot contain a
# link token, so the regex never runs on ordinary prose
_LINK_HINTS = ("http", "www.", "](", "<a", "</a")


def link_ratio(line: str) -> float:
    """Fraction of the line's characters occupied by link-ish tokens."""
    if not line or not any(h in line for h in _LINK_HINTS):
        return 0.0
    linked = sum(len(m.group(0)) for m in _LINK_TOKEN.finditer(line))
    return linked / len(line)


def alnum_density(line: str) -> float:
    """Fraction of alphanumeric characters (any script) in the line.

    ``str.isalnum`` per char (C loop) rather than a regex findall; both
    sides (Spark UDF + oracle) share this function, so the density
    definition is consistent by construction.
    """
    if not line:
        return 0.0
    return sum(map(str.isalnum, line)) / len(line)


def is_boilerplate_line(line: str, cfg: ExtractionConfig,
                        repeated: frozenset[str] | set[str] | None = None) -> bool:
    """True if the line should be stripped from main content.

    A line is boilerplate when any of:
    - its normalized form was mined as repeated across >= cfg.min_repeat_turns
      distinct turns of the conversation (header/footer analog),
    - link-ish tokens occupy more than cfg.max_link_ratio of it,
    - its alphanumeric density is below cfg.min_line_density (and it is
      non-empty after stripping — blank lines are kept as structure so that
      paragraph splitting is unaffected).
    """
    stripped = line.strip()
    if not stripped:
        return False  # blank lines are structure, not boilerplate
    if repeated and normalize_line(line) in repeated:
        return True
    if link_ratio(stripped) > cfg.max_link_ratio:
        return True
    if alnum_density(stripped) < cfg.min_line_density:
        return True
    return False


def boilerplate_flags(lines: list[str], cfg: ExtractionConfig,
                      repeated: frozenset[str] | set[str] | None = None,
                      ) -> list[bool]:
    """Per-line boilerplate verdicts — THE single classification pass.

    Both the tokenizer (core/blocks.tokenize_turn_stats, which also counts
    the drops for cleaning metrics) and :func:`clean_text` consume this
    one function, so the two sides cannot drift.
    """
    return [is_boilerplate_line(ln, cfg, repeated) for ln in lines]


def clean_text(text: str, cfg: ExtractionConfig,
               repeated: frozenset[str] | set[str] | None = None) -> str:
    """Remove boilerplate lines from a turn's raw text.

    Keeps original line content (and blank lines) for every surviving line so
    downstream paragraph structure is preserved; only whole lines are ever
    dropped. Returns the cleaned text (NOT stripped — stripping is the
    tokenizer's job, mirroring the reference's page_text handling at
    reference pdf_parser.py:47-53).
    """
    if not text:
        return text
    lines = text.split("\n")
    flags = boilerplate_flags(lines, cfg, repeated)
    return "\n".join(ln for ln, f in zip(lines, flags) if not f)


def mine_repeated_lines(turn_texts: list[str], cfg: ExtractionConfig) -> frozenset[str]:
    """Oracle-side repeated-element mining for ONE conversation.

    A normalized line counts once per turn; lines appearing in
    >= cfg.min_repeat_turns distinct turns are headers/footers. The Spark
    twin is an explode + groupBy(conv_id, norm_line) +
    countDistinct(turn_idx) + filter (operators/boilerplate.py) — same
    normalization, same thresholds.
    """
    counts: dict[str, int] = {}
    for text in turn_texts:
        if not text:
            continue
        seen_this_turn = set()
        for ln in text.split("\n"):
            norm = normalize_line(ln)
            if len(norm) < cfg.min_repeat_line_chars:
                continue
            seen_this_turn.add(norm)
        for norm in seen_this_turn:
            counts[norm] = counts.get(norm, 0) + 1
    return frozenset(n for n, c in counts.items() if c >= cfg.min_repeat_turns)
