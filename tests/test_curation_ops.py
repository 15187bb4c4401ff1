"""Curation-operator tests: decontamination, repetition filters, PII
redaction, deterministic global shuffle, and sequence packing.

The driver-contract twin (test_driver_contract.py) already checks the
five query entries against DuckDB; these tests pin the operator-level
semantics directly — twin equality for the repetition paths, hand-
computed examples, and the packing/shuffle invariants that the SQL
oracle can't state (determinism across partitionings, stream
contiguity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.curation import (decontaminate,
                                                 global_shuffle,
                                                 pack_sequences, pii_redact,
                                                 repetition_counts_py,
                                                 repetition_features,
                                                 repetition_features_expr)

REP_COLS = ["n_lines", "dup_line_frac", "dup_line_char_frac",
            "top_bigram_char_frac", "top_trigram_char_frac"]

TRICKY_DOCS = [
    (0, None),
    (1, ""),
    (2, "   \n\t\n  "),                       # blank-only lines
    (3, "one line only"),
    (4, "dup\ndup\ndup\nunique"),             # heavy line repetition
    (5, "a b a b a b a b"),                   # dominant bigram
    (6, "x y z x y z x y z"),                 # dominant trigram
    (7, "aa bb\naa bb\ncc dd"),               # line + gram repeats interact
    (8, "tie a tie b"),                       # gram-count ties -> lex max
    (9, "中文 文本 中文 文本 混合 english text"),  # CJK tokens
    (10, "word"),                             # below every gram width
    (11, " \n "),                   # U+00A0 lines: NOT Java-blank
]


@pytest.fixture(scope="module")
def tricky(spark):
    return spark.createDataFrame(TRICKY_DOCS, "doc_id int, text string")


def _rows(df):
    return {r["doc_id"]: tuple(r[c] for c in REP_COLS)
            for r in df.select("doc_id", *REP_COLS).collect()}


def test_repetition_expr_twin_matches_udf(tricky):
    got_udf = _rows(repetition_features(tricky))
    got_expr = _rows(repetition_features_expr(tricky))
    assert got_udf == got_expr


def test_repetition_counts_py_hand_examples():
    # 4 lines, 'dup' x3 -> 2 dup lines; dup chars = 3*3 = 9 of 3+3+3+6=15
    n_lines, n_dup, lc, dc, _, _, _ = repetition_counts_py(
        "dup\ndup\ndup\nunique")
    assert (n_lines, n_dup, lc, dc) == (4, 2, 15, 9)
    # 'a b' bigram occurs 4x in 'a b a b a b a b' (overlapping windows:
    # 7 windows, 'a b' at 0,2,4,6) -> covered = 4 * 3 = 12 of 15 chars
    _, _, _, _, bi, tri, n_chars = repetition_counts_py("a b a b a b a b")
    assert (bi, n_chars) == (12, 15)
    # trigram 'x y z' occurs 3x (windows 0,3,6) -> 3 * 5 = 15 of 17
    _, _, _, _, _, tri, n_chars = repetition_counts_py("x y z x y z x y z")
    assert (tri, n_chars) == (15, 17)
    # space-only lines are blank, but a tab-only line is NOT (the
    # engine-portable space-only trim rule — see _TRIM_CHARS)
    assert repetition_counts_py("   \n\t\n  ") == (1, 0, 1, 0, 0, 0, 8)
    assert repetition_counts_py(None) == (0, 0, 0, 0, 0, 0, 0)


def test_repetition_gram_tie_breaks_to_lex_greatest():
    # 'tie a' and 'tie b'... actually windows of 'tie a tie b' are
    # 'tie a', 'a tie', 'tie b' — all count 1; lex-greatest wins
    _, _, _, _, bi, _, n_chars = repetition_counts_py("tie a tie b")
    assert bi == 1 * len("tie b") and n_chars == 11


def test_decontaminate_flags_only_overlapping_docs(spark):
    base = " ".join(f"w{i}" for i in range(13))          # one 13-gram
    docs = spark.createDataFrame(
        [(1, base + " extra tail tokens here"),           # contains eval gram
         (2, "completely different words " * 5),
         (3, base)],                                      # exact eval text
        "doc_id int, text string")
    ev = spark.createDataFrame([(100, base)], "doc_id int, text string")
    out = {r["doc_id"]: r for r in decontaminate(docs, ev, n=13).collect()}
    assert set(out) == {1, 3}
    # doc 3 is the eval text itself: 1 window, fully contaminated
    assert out[3]["n_grams"] == 1 and out[3]["n_contaminated"] == 1
    assert out[3]["contamination_ratio"] == 1.0
    # doc 1: 17 tokens -> 5 windows, only the first matches
    assert out[1]["n_grams"] == 5 and out[1]["n_contaminated"] == 1


def test_pii_redact_pinned_example(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c@ex.co ssn 123-45-6789 tel 555.123.4567 "
             "ip 10.0.0.255 end")],
        "doc_id int, text string")
    r = pii_redact(df).collect()[0]
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) \
        == (1, 1, 1, 1)
    assert r["redacted_text"] == \
        "mail <EMAIL> ssn <SSN> tel <PHONE> ip <IP> end"


def test_pii_counts_are_on_original_text(spark):
    # counts are measured on the ORIGINAL text, so the SSN-shaped
    # substring inside the email counts for BOTH kinds — but redaction
    # is sequential (email first), so the replaced text has no SSN left
    df = spark.createDataFrame([(1, "x 123-45-6789@y.com z")],
                               "doc_id int, text string")
    r = pii_redact(df).collect()[0]
    assert (r["n_email"], r["n_ssn"]) == (1, 1)
    assert r["redacted_text"] == "x <EMAIL> z"


@pytest.fixture(scope="module")
def shuffle_docs(spark):
    rows = [(i, f"doc {i} " + "tok " * (i % 7)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_global_shuffle_is_a_permutation_and_deterministic(shuffle_docs):
    out = global_shuffle(shuffle_docs, "doc_id", seed=3) \
        .select("doc_id", "shuffle_pos").collect()
    pos = sorted(r["shuffle_pos"] for r in out)
    assert pos == list(range(200))
    again = global_shuffle(shuffle_docs.repartition(7), "doc_id", seed=3) \
        .select("doc_id", "shuffle_pos").collect()
    assert {r["doc_id"]: r["shuffle_pos"] for r in out} \
        == {r["doc_id"]: r["shuffle_pos"] for r in again}
    other_seed = global_shuffle(shuffle_docs, "doc_id", seed=4) \
        .select("doc_id", "shuffle_pos").collect()
    assert {r["doc_id"]: r["shuffle_pos"] for r in out} \
        != {r["doc_id"]: r["shuffle_pos"] for r in other_seed}


def test_pack_sequences_stream_is_contiguous(shuffle_docs):
    rows = pack_sequences(shuffle_docs, budget=16, seed=3) \
        .select("doc_id", "shuffle_pos", "n_tokens", "start_offset",
                "seq_first", "seq_last", "n_seqs").collect()
    by_pos = sorted(rows, key=lambda r: r["shuffle_pos"])
    offset = 0
    for r in by_pos:
        assert r["start_offset"] == offset
        offset += r["n_tokens"]
        assert r["seq_first"] == r["start_offset"] // 16
        end = max(r["start_offset"] + r["n_tokens"] - 1, r["start_offset"])
        assert r["seq_last"] == end // 16
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        assert r["n_seqs"] >= 1


def test_pack_sequences_zero_token_docs_take_no_space(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "d e")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in pack_sequences(df, budget=4, seed=0)
            .collect()}
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_seqs"] == 1
    assert rows[3]["n_tokens"] == 0 and rows[3]["n_seqs"] == 1
    total = sum(r["n_tokens"] for r in rows.values())
    assert max(r["start_offset"] + r["n_tokens"]
               for r in rows.values()) == total


def test_source_mix_resample_weights_and_copies(spark):
    from pdf_parser_spark.operators.curation import source_mix_resample
    # source A: 3 docs x 10 tokens = 30; source B: 1 doc x 10 tokens = 10
    # (total 40); source C is NOT in the spec and must vanish entirely
    ten = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, "A", ten), (2, "A", ten), (3, "A", ten),
         (4, "B", ten), (5, "C", ten)],
        "doc_id int, source string, text string")
    out = source_mix_resample(df, {"A": 0.5, "B": 0.5}).collect()
    assert all(r.source in ("A", "B") for r in out)
    # weight = share * total / src_tokens: A -> .5*40/30, B -> .5*40/10
    wa, wb = round(0.5 * 40 / 30, 6), round(0.5 * 40 / 10, 6)
    assert {r.weight for r in out if r.source == "A"} == {wa}
    assert {r.weight for r in out if r.source == "B"} == {wb}
    # B's weight is exactly 2.0: every B doc emits exactly 2 copies
    b_copies = sorted(r.copy_idx for r in out if r.source == "B")
    assert b_copies == [1, 2]
    # A's weight is fractional (<1): each A doc emits 0 or 1 copies,
    # decided by the deterministic id hash — rerun must agree exactly
    again = source_mix_resample(df, {"A": 0.5, "B": 0.5}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    assert all(r.copy_idx == 1 for r in out if r.source == "A")


def test_source_mix_resample_max_repeat_cap(spark):
    from pdf_parser_spark.operators.curation import source_mix_resample
    ten = " ".join(f"w{i}" for i in range(10))
    hundred = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, "big", hundred), (2, "tiny", ten)],
        "doc_id int, source string, text string")
    # tiny holds 10/110 tokens but is targeted at 90 % -> weight 9.9,
    # capped to 4 copies
    out = source_mix_resample(df, {"big": 0.1, "tiny": 0.9},
                              max_repeat=4).collect()
    tiny = [r for r in out if r.source == "tiny"]
    assert len(tiny) == 4 and sorted(r.copy_idx for r in tiny) == [1, 2, 3, 4]


def test_source_mix_resample_rejects_bad_spec(spark):
    from pdf_parser_spark.operators.curation import source_mix_resample
    df = spark.createDataFrame([(1, "A", "x")],
                               "doc_id int, source string, text string")
    with pytest.raises(ValueError):
        source_mix_resample(df, {})
    with pytest.raises(ValueError):
        source_mix_resample(df, {"A": -0.1})


def test_source_mix_resample_rejects_nonfinite_shares(spark):
    from pdf_parser_spark.operators.curation import source_mix_resample
    df = spark.createDataFrame([(1, "A", "x y z")],
                               "doc_id int, source string, text string")
    for bad in (float("nan"), float("inf")):
        with pytest.raises(ValueError):
            source_mix_resample(df, {"A": bad})
