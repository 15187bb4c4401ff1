"""Deterministic synthetic transcript generator.

Produces the input table from BASELINE.json's ``input_hint``:

    transcripts(conv_id string, turn_idx int32, role string, text string,
                tool string, ts timestamp)

Content is engineered to exercise every extraction code path and quirk
(SURVEY.md §7 step 0):
- repeated header/footer lines across turns (repeated-element removal),
- link-heavy nav lines and low-density separator lines (link-ratio /
  density heuristics),
- multi-paragraph prose incl. CJK (paragraph tokenizer, unicode through
  Arrow),
- duplicated paragraphs within a turn (duplicate-block lineage aliasing),
- whitespace-only and empty turns (the raw-truthy/strip quirk),
- long turns exceeding max_chars_per_chunk (size flush),
- ``tool`` JSON payloads: tables with None cells, numeric cells, falsy
  rows; images with named and empty-name entries; malformed payloads,
- zipf-skewed conversation lengths (skew handling).

Everything derives from ``random.Random(seed)`` — same seed, same table,
on any machine. No external data (driver requirement).
"""

from __future__ import annotations

import datetime as _dt
import json
import random
from typing import Any

_WORDS = ("spark shuffle partition executor driver catalyst tungsten arrow "
          "batch vector column row group join filter scan merge chunk block "
          "turn conversation transcript agent tool result plan stage task "
          "memory spill broadcast skew salt bucket lineage checkpoint resume "
          "metric throughput latency scale cluster").split()

_CJK = "数据 处理 引擎 分布式 提取 文本 表格 图像 分块 嵌入 检索 对话 轮次".split()

_ROLES = ("user", "assistant", "tool")

_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)


def _sentence(rng: random.Random, n: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.15:
        ws.insert(rng.randrange(len(ws) + 1), rng.choice(_CJK))
    return " ".join(ws)


def _paragraph(rng: random.Random) -> str:
    return ". ".join(_sentence(rng, rng.randint(4, 14))
                     for _ in range(rng.randint(1, 4))) + "."


def _nav_line(rng: random.Random) -> str:
    return rng.choice([
        f"[home](http://example.com/{rng.randrange(100)}) | "
        f"[next](http://example.com/{rng.randrange(100)})",
        f"see https://docs.example.org/page/{rng.randrange(1000)} for details "
        f"https://example.net/{rng.randrange(1000)}",
        "<a href=\"http://x.example\">click here</a> <a href=\"http://y.example\">more</a>",
    ])


def _separator_line(rng: random.Random) -> str:
    return rng.choice(["----------------", "================",
                       "* * * * * * * *", "....::::....::::...."])


def _tool_payload(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.55:
        return None
    if r < 0.60:
        return rng.choice(["not json at all", "[1,2,3]", "{\"tables\": 7}", ""])
    payload: dict[str, Any] = {}
    if rng.random() < 0.75:
        tables = []
        for _ in range(rng.randint(1, 2)):
            rows = []
            ncols = rng.randint(2, 4)
            for _r in range(rng.randint(1, 5)):
                row: list[Any] = []
                for _c in range(ncols):
                    cell_r = rng.random()
                    if cell_r < 0.12:
                        row.append(None)
                    elif cell_r < 0.25:
                        row.append(rng.randrange(10000))
                    elif cell_r < 0.30:
                        row.append(round(rng.random() * 100, 2))
                    else:
                        row.append(_sentence(rng, rng.randint(1, 3)))
                rows.append(row)
            if rng.random() < 0.15:
                rows.insert(rng.randrange(len(rows) + 1), [])  # falsy row
            tables.append(rows)
        payload["tables"] = tables
    if rng.random() < 0.45:
        images = []
        for i in range(rng.randint(1, 3)):
            x0, top = rng.random() * 400, rng.random() * 600
            images.append({
                "x0": round(x0, 2), "top": round(top, 2),
                "x1": round(x0 + rng.random() * 200, 2),
                "bottom": round(top + rng.random() * 150, 2),
                "name": "" if rng.random() < 0.2 else f"img_{rng.randrange(1000)}",
            })
        payload["images"] = images
    if not payload:
        return None
    return json.dumps(payload, ensure_ascii=False)


def _turn_text(rng: random.Random, header: str, footer: str) -> str | None:
    r = rng.random()
    if r < 0.04:
        return None
    if r < 0.07:
        return ""
    if r < 0.10:
        return "   \n  \t "  # whitespace-only: raw truthy, strip-empty quirk
    lines: list[str] = []
    if rng.random() < 0.7:
        lines.append(header)
    paras = []
    n_paras = rng.randint(1, 4)
    if rng.random() < 0.08:
        n_paras += 6  # long turn: exercises size flush in paragraph mode
    for _ in range(n_paras):
        paras.append(_paragraph(rng))
    if len(paras) >= 2 and rng.random() < 0.15:
        paras.append(paras[0])  # duplicated paragraph: lineage aliasing
    body = "\n\n".join(paras)
    if rng.random() < 0.25:
        lines.append(_nav_line(rng))
    lines.append(body)
    if rng.random() < 0.15:
        lines.append(_separator_line(rng))
    if rng.random() < 0.6:
        lines.append(footer)
    return "\n".join(lines)


def generate_transcripts(n_convs: int, seed: int = 42,
                         max_turns: int = 64) -> list[dict[str, Any]]:
    """Generate transcript rows (list of dicts, parquet-ready)."""
    rng = random.Random(seed)
    rows: list[dict[str, Any]] = []
    for c in range(n_convs):
        conv_id = f"conv_{seed}_{c:06d}"
        # zipf-ish skewed lengths: most short, a few very long
        n_turns = max(1, min(max_turns, int(rng.paretovariate(1.3))))
        if c % 97 == 0:
            n_turns = max_turns  # guaranteed heavy conversations
        header = f"=== session {conv_id} log ==="
        footer = f"-- generated by agent v{c % 5}.0 --"
        for t in range(n_turns):
            role = _ROLES[t % 3] if rng.random() < 0.8 else rng.choice(_ROLES)
            rows.append({
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _turn_text(rng, header, footer),
                "tool": _tool_payload(rng) if role == "tool" or rng.random() < 0.15 else None,
                "ts": _BASE_TS + _dt.timedelta(seconds=c * 3600 + t * 30),
            })
    return rows


def _conv_rows(conv_id: str, rng: random.Random, conv_no: int,
               max_turns: int) -> list[dict[str, Any]]:
    """All turn rows of one conversation from its own RNG."""
    n_turns = max(1, min(max_turns, int(rng.paretovariate(1.3))))
    if conv_no % 97 == 0:
        n_turns = max_turns
    header = f"=== session {conv_id} log ==="
    footer = f"-- generated by agent v{conv_no % 5}.0 --"
    rows = []
    for t in range(n_turns):
        role = _ROLES[t % 3] if rng.random() < 0.8 else rng.choice(_ROLES)
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t,
            "role": role,
            "text": _turn_text(rng, header, footer),
            "tool": (_tool_payload(rng)
                     if role == "tool" or rng.random() < 0.15 else None),
            "ts": _BASE_TS + _dt.timedelta(seconds=conv_no * 3600 + t * 30),
        })
    return rows


def generate_transcripts_distributed(spark, n_convs: int, seed: int = 42,
                                     max_turns: int = 256,
                                     partitions: int = 64):
    """Distributed generator: one independent RNG per conversation, fanned
    out over ``partitions`` tasks via mapInPandas — the synthesis itself
    scales with the cluster (generating a 10^12-turn corpus single-threaded
    is as impossible as processing it). Deterministic: conversation c's
    content depends only on (seed, c)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for c in pdf["id"]:
                c = int(c)
                rng = random.Random(f"{seed}:{c}")
                rows.extend(_conv_rows(f"conv_{seed}d_{c:08d}", rng, c,
                                       max_turns))
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            out["ts"] = out["ts"].astype("datetime64[us]")
            yield out

    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    return (spark.range(n_convs).repartition(partitions)
            .mapInPandas(gen, ddl))


def transcripts_pandas(n_convs: int, seed: int = 42, max_turns: int = 64):
    """Same rows as a typed pandas DataFrame (int32 turn_idx per input_hint)."""
    import pandas as pd

    df = pd.DataFrame(generate_transcripts(n_convs, seed, max_turns))
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42,
                              max_turns: int = 64,
                              row_group_size: int = 8192) -> int:
    """Write the synthetic table to one parquet file; returns row count.

    ``row_group_size`` is deliberately small: Spark parallelizes a parquet
    scan by byte-range splits that align to row groups, so one giant row
    group (pyarrow's default is 1Mi rows) would serialize the whole
    map-only extraction stage into a single task. At the 100 TB design
    point input splits are plentiful; small row groups emulate that
    locally.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = transcripts_pandas(n_convs, seed, max_turns)
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path, row_group_size=row_group_size)
    return len(df)
