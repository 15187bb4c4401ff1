"""End-to-end training-data pipeline: the composed job must agree with
applying each tested operator independently, and its funnel must be
internally consistent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs.training_pipeline import (FUNNEL_STAGES, curate, funnel_metrics,
                                    run_training_pipeline)
from pdf_parser_spark.sources.synth import write_transcripts_parquet


def test_pipeline_end_to_end(spark, tmp_path):
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=40, seed=13)
    out = str(tmp_path / "out")

    # synthetic transcript chunks are stopword-free jargon -> lang-ID
    # "und"; admit it (the flags-vs-operators test pins the filter law)
    funnel = run_training_pipeline(
        spark, src, out, cleaning=True, langs=("en", "und"),
        quality_floor=0.2, min_chars=40, max_chars=2000)

    # funnel is monotone along its stage order and internally consistent
    vals = [funnel[s] for s in FUNNEL_STAGES]
    assert vals == sorted(vals, reverse=True)
    assert funnel["extracted"] > 0 and funnel["selected"] > 0
    assert funnel["selected"] == funnel["length"]  # last filter stage

    written = spark.read.parquet(f"{out}/corpus")
    assert written.count() == funnel["selected"]
    # split partitioning materialized and labels are the default trio
    assert set(r.split for r in written.select("split").distinct()
               .collect()) <= {"train", "val", "test"}
    with open(f"{out}/funnel.json") as f:
        assert json.load(f) == funnel


def test_pipeline_flags_match_independent_operators(spark, tmp_path):
    """The fused flags equal running each operator separately."""
    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.operators.dedup import (dedup_by_components,
                                                  exact_dedup,
                                                  simhash_dup_pairs)
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.operators.textstats import text_statistics
    from pdf_parser_spark.pipeline import read_transcripts

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=25, seed=21)
    chunks = extract_chunks(read_transcripts(spark, src), CLEANING_CONFIG) \
        .where(F.col("chunk_type") == "text").drop("table_cells")
    cur = curate(chunks, langs=("en",), quality_floor=0.2,
                 min_chars=40, max_chars=2000)

    base = with_chunk_id(chunks)
    # exact dedup survivors (min-struct survivor differs from min-id only
    # if ids tie, impossible) — compare against the flag
    exact_ids = {r.id for r in
                 cur.where(F.col("f_exact_unique")).select("id").collect()}
    indep_exact = {r.id for r in
                   exact_dedup(base.select("id", "text"), "text").collect()}
    assert exact_ids == indep_exact

    # near-dup survivors over the exact tier
    ex = base.where(F.col("id").isin(list(exact_ids))).select("id", "text")
    pairs = simhash_dup_pairs(ex, "id", "text", max_hamming=3)
    indep_near = {r.id for r in
                  dedup_by_components(ex.select("id"), pairs, "id")
                  .collect()}
    near_ids = {r.id for r in
                cur.where(F.col("f_near_unique")).select("id").collect()}
    assert near_ids == indep_near

    # quality/lang/length flags match the independent operators
    stats = {r.id: r for r in text_statistics(base.select("id", "text"))
             .collect()}
    for r in cur.select("id", "f_quality", "f_language", "f_length",
                        "char_count").collect():
        s = stats[r.id]
        assert r.f_quality == (s.quality_score >= 0.2)
        assert r.f_language == (s.lang_pred == "en")
        assert r.f_length == (40 <= r.char_count <= 2000)

    m = funnel_metrics(cur)
    assert m["exact_unique"] == len(exact_ids)
    assert m["near_unique"] == len(indep_near)

def test_pipeline_layouts_agree(spark, tmp_path):
    """layout='bucketed' (zero-shuffle extraction) must produce the same
    funnel and the same written corpus rows as the windowed default on
    conversation-complete input."""
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=30, seed=31)
    funnels, rows = [], []
    for layout in ("windowed", "bucketed"):
        out = str(tmp_path / f"out_{layout}")
        funnels.append(run_training_pipeline(
            spark, src, out, cleaning=True, layout=layout,
            langs=("en", "und"), quality_floor=0.2, min_chars=40,
            max_chars=2000))
        rows.append(sorted(
            (r.id, r.split, r.text) for r in
            spark.read.parquet(f"{out}/corpus").select(
                "id", "split", "text").collect()))
    assert funnels[0] == funnels[1]
    assert rows[0] == rows[1] and rows[0]

def test_pipeline_from_extracted_table_agrees(spark, tmp_path):
    """input_kind='extracted' over run_extraction's committed chunk table
    (the staged, resumable shape) must equal extracting in-pipeline."""
    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.sources.lineage import run_extraction

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=25, seed=41)
    staged = str(tmp_path / "staged")
    run_extraction(spark, src, staged, cfg=CLEANING_CONFIG, n_buckets=4,
                   buckets_per_job=2)

    inline = run_training_pipeline(
        spark, src, str(tmp_path / "o1"), cleaning=True,
        langs=("en", "und"), quality_floor=0.2, min_chars=40,
        max_chars=2000)
    from_table = run_training_pipeline(
        spark, f"{staged}/extracted", str(tmp_path / "o2"),
        input_kind="extracted", langs=("en", "und"), quality_floor=0.2,
        min_chars=40, max_chars=2000)
    assert inline == from_table and inline["selected"] > 0

def test_pipeline_rejects_incomplete_staged_table(spark, tmp_path):
    """A run_extraction output killed mid-run must be rejected, not
    silently curated into a truncated corpus; flags that only apply to
    in-pipeline extraction are rejected with input_kind='extracted'."""
    import pytest

    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.sources.lineage import run_extraction

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=10, seed=51)
    staged = str(tmp_path / "staged")
    run_extraction(spark, src, staged, cfg=CLEANING_CONFIG, n_buckets=4,
                   buckets_per_job=1, max_jobs=2)   # killed after 2/4
    with pytest.raises(ValueError, match="incomplete"):
        run_training_pipeline(spark, f"{staged}/extracted",
                              str(tmp_path / "o"), input_kind="extracted")
    run_extraction(spark, src, staged, cfg=CLEANING_CONFIG, n_buckets=4,
                   buckets_per_job=1)               # resume to completion
    funnel = run_training_pipeline(
        spark, f"{staged}/extracted", str(tmp_path / "o"),
        input_kind="extracted", langs=("en", "und"), quality_floor=0.2,
        min_chars=40, max_chars=2000)
    assert funnel["selected"] > 0
    with pytest.raises(ValueError, match="already decided"):
        run_training_pipeline(spark, f"{staged}/extracted",
                              str(tmp_path / "o2"), input_kind="extracted",
                              cleaning=False)

def test_pipeline_optional_curation_stages(spark, tmp_path):
    """eval-set decontamination + repetition ceilings + PII redaction
    appear as funnel stages exactly when enabled, and each flag equals
    the standalone operator's verdict."""
    from pdf_parser_spark.config import DEFAULT_CONFIG
    from pdf_parser_spark.operators.curation import (decontaminate,
                                                     repetition_features)
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.pipeline import read_transcripts

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=20, seed=61)
    chunks = extract_chunks(read_transcripts(spark, src), DEFAULT_CONFIG) \
        .where(F.col("chunk_type") == "text").drop("table_cells")
    base = with_chunk_id(chunks)

    # eval set = three long chunk texts of the SAME corpus -> guaranteed
    # 13-gram contamination of at least those chunks
    eval_texts = [r.text for r in base
                  .where(F.size(F.split(F.col("text"), r"\s+")) >= 13)
                  .orderBy("id").limit(3).collect()]
    assert len(eval_texts) == 3
    eval_docs = spark.createDataFrame([(t,) for t in eval_texts],
                                      "text string")

    cur = curate(chunks, langs=("en", "und"), quality_floor=0.2,
                 min_chars=40, max_chars=2000, eval_docs=eval_docs,
                 max_dup_line_frac=0.5, max_top_ngram_frac=0.5,
                 redact_pii=True)
    funnel = funnel_metrics(cur)
    assert list(funnel) == ["extracted", "exact_unique", "near_unique",
                            "quality", "repetition", "language", "length",
                            "decontaminated", "selected"]
    vals = list(funnel.values())
    assert vals[1:] == sorted(vals[1:], reverse=True)
    assert funnel["selected"] == funnel["decontaminated"]

    # decontamination flag == standalone operator verdict; the planted
    # eval texts must actually contaminate something
    dirty = {r.id for r in
             decontaminate(base.select("id", "text"), eval_docs,
                           id_col="id")
             .select("id").collect()}
    assert dirty
    got = {r.id: r.f_decontaminated
           for r in cur.select("id", "f_decontaminated").collect()}
    assert got == {i: i not in dirty for i in got}

    # repetition flag == standalone thresholds
    rep = {r.id: r for r in
           repetition_features(base.select("id", "text")).collect()}
    for r in cur.select("id", "f_repetition").collect():
        s = rep[r.id]
        assert r.f_repetition == (s.dup_line_frac <= 0.5
                                  and s.top_bigram_char_frac <= 0.5
                                  and s.top_trigram_char_frac <= 0.5)

    # PII pass keeps its count columns (no filter stage)
    for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"):
        assert c in cur.columns
    assert "redacted_text" not in cur.columns


def test_pipeline_default_funnel_unchanged_by_new_options(spark, tmp_path):
    """With no optional pass enabled the funnel emits exactly the
    original FUNNEL_STAGES keys (driver-visible contract)."""
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=10, seed=71)
    funnel = run_training_pipeline(
        spark, src, str(tmp_path / "out"), cleaning=True,
        langs=("en", "und"), quality_floor=0.2, min_chars=40,
        max_chars=2000)
    assert tuple(funnel) == FUNNEL_STAGES


def test_pipeline_span_removal_stage(spark):
    """remove_spans_k rewrites near-unique survivors exactly like the
    standalone operator: losing cross-chunk k-token windows are cut, the
    min-id owner keeps its copy, untouched rows keep their original
    text, and char_count tracks the rewrite."""
    from pdf_parser_spark.operators.dedup import remove_duplicated_spans
    from pdf_parser_spark.operators.retrieval import with_chunk_id

    run = "common p q r s t u v w"            # 9 tokens -> two 8-windows
    rows = [
        ("c0", 0, 0, "text", f"alpha beta gamma delta {run} end0"),
        ("c1", 0, 0, "text", f"zeta eta theta iota {run} end1 tail"),
        ("c2", 0, 0, "text",
         "totally unique vocabulary sentence with plenty of distinct "
         "words to pass length"),
    ]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")

    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000, remove_spans_k=8)
    got = {r.conv_id: r for r in cur.collect()}

    assert all(r.f_near_unique for r in got.values())
    # twin equality vs the standalone operator over the same survivors
    twin = {r.id: r for r in remove_duplicated_spans(
        with_chunk_id(chunks).select("id", "text"), "id", "text",
        k=8).collect()}
    for r in got.values():
        t = twin[r.id]
        if t.n_removed_tokens > 0:
            assert r.text == t.text_clean
        else:
            assert r.text == dict((c, x) for c, _, _, _, x in rows)[r.conv_id]
        assert r.span_tokens_removed == t.n_removed_tokens
        assert r.char_count == len(r.text)
    # exactly one of c0/c1 lost the 9-token run; c2 untouched
    removed = sorted(r.span_tokens_removed for r in got.values())
    assert removed == [0, 0, 9]
    assert got["c2"].span_tokens_removed == 0
    # rewrite accounting surfaces in the funnel (after the stage counts)
    funnel = funnel_metrics(cur)
    assert funnel["span_tokens_removed"] == 9
    assert list(funnel)[-1] == "span_tokens_removed"


def test_pipeline_lm_quality_band_stage(spark):
    """The LM band flag equals the standalone unigram_logprob verdict,
    appears in the funnel between quality and repetition, and token-free
    chunks fail it (no LM evidence)."""
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.operators.textstats import unigram_logprob

    rows = [
        ("c0", 0, 0, "text", "alpha beta gamma alpha beta gamma alpha"),
        ("c1", 0, 0, "text", "alpha beta gamma delta epsilon zeta eta"),
        ("c2", 0, 0, "text", "qqq zzz xxx www vvv uuu ttt sss rrr"),
    ]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    lo = -3.0
    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000, lm_logprob_min=lo)
    got = {r.conv_id: r for r in cur.collect()}
    lm = {r.id: r.avg_logprob for r in unigram_logprob(
        with_chunk_id(chunks).select("id", "text"), "id", "text").collect()}
    for r in got.values():
        assert r.lm_logprob == lm[r.id]
        assert r.f_lm_quality == (lm[r.id] is not None and lm[r.id] >= lo)
    funnel = funnel_metrics(cur)
    keys = list(funnel)
    assert keys.index("lm_quality") == keys.index("quality") + 1
    # the funnel stays monotone with the new stage in the chain
    vals = [funnel[s] for s in keys if s != "extracted"]
    assert vals == sorted(vals, reverse=True)


def test_pipeline_semantic_prune_stage(spark):
    """The semantic tier's flag equals the standalone D4 pruner run over
    the same deterministic stub embeddings, and the stage lands last in
    the funnel chain."""
    from pdf_parser_spark.operators.embedding import make_embed_udf
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.operators.similarity import \
        cluster_prune_prototypes

    rows = [(f"c{i}", 0, 0, "text",
             f"alpha beta gamma delta w{i} epsilon zeta eta theta")
            for i in range(12)]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000,
                 semantic_prune_frac=0.25, semantic_cells=3)
    got = {r.id: r for r in cur.collect()}

    udf = make_embed_udf()
    emb = (with_chunk_id(chunks)
           .where(F.col("id").isin([i for i, r in got.items()
                                    if r.f_near_unique]))
           .select("id", udf(F.col("text")).alias("embedding")))
    kept = {r.id for r in cluster_prune_prototypes(
        emb, k=3, drop_frac=0.25, id_col="id").collect()}
    for cid, r in got.items():
        assert r.f_semantic_kept == (r.f_near_unique and cid in kept)
    assert any(not r.f_semantic_kept for r in got.values())  # prunes
    funnel = funnel_metrics(cur)
    keys = list(funnel)
    assert keys[-2:] == ["semantic_kept", "selected"]
    assert funnel["selected"] == funnel["semantic_kept"]


def test_pipeline_paragraph_dedup_stage(spark):
    """The paragraph rewrite equals the standalone dedup_paragraphs over
    the same survivors: repeated lines cut (min-(id, idx) canonical
    kept), untouched rows keep their original text, char_count tracks
    the rewrite, and the accounting lands after the stage counts."""
    from pdf_parser_spark.operators.dedup import dedup_paragraphs
    from pdf_parser_spark.operators.retrieval import with_chunk_id

    hdr = "=== session log ==="
    rows = [
        ("c0", 0, 0, "text", f"{hdr}\nunique alpha words here\nshared tail"),
        ("c1", 0, 0, "text", f"{hdr}\ndifferent beta content\nshared tail"),
        ("c2", 0, 0, "text", "no repeats at all in this one"),
    ]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000, paragraph_scope="corpus")
    got = {r.conv_id: r for r in cur.collect()}
    twin = {r.id: r for r in dedup_paragraphs(
        with_chunk_id(chunks).select("id", "text"),
        id_col="id", text_col="text", scope="corpus").collect()}
    texts = {c: x for c, _, _, _, x in rows}
    for r in got.values():
        t = twin[r.id]
        assert r.text == (t.text_clean if t.n_removed_segs > 0
                          else texts[r.conv_id])
        assert r.paragraph_segs_removed == t.n_removed_segs
        assert r.char_count == len(r.text)
    # one chunk owns the header + shared tail; the other sheds both
    removed = sorted(r.paragraph_segs_removed for r in got.values())
    assert removed == [0, 0, 2]
    assert got["c2"].paragraph_segs_removed == 0
    funnel = funnel_metrics(cur)
    assert funnel["paragraph_segs_removed"] == 2
    assert "paragraph_segs_removed" in list(funnel)[-2:]


def test_pipeline_dsir_stage(spark):
    """f_dsir equals the standalone dsir_importance verdict against the
    floor, token-less chunks fail it, and the stage slots after
    lm_quality in the funnel order."""
    from pdf_parser_spark.operators.curation import dsir_importance
    from pdf_parser_spark.operators.retrieval import with_chunk_id

    rows = [
        ("c0", 0, 0, "text", "alpha beta gamma alpha beta"),
        ("c1", 0, 0, "text", "zeta eta theta iota kappa"),
        ("c2", 0, 0, "text", "alpha zeta beta eta mixed"),
    ]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    target = spark.createDataFrame([("alpha beta gamma",)], "text string")
    # the standalone scores decide the floor: smoothing dominates tiny
    # corpora, so only the ORDER is meaningful — place the floor between
    # the extremes and the pipeline flag must reproduce the split
    twin = {r.id: r.importance for r in dsir_importance(
        with_chunk_id(chunks).select("id", "text"), target,
        id_col="id", text_col="text", n_buckets=256).collect()}
    floor = (min(twin.values()) + max(twin.values())) / 2
    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000,
                 dsir_target=target, dsir_min_importance=floor,
                 dsir_buckets=256)
    got = {r.conv_id: r for r in cur.collect()}
    for r in got.values():
        assert r.dsir_importance == twin[r.id]
        assert r.f_dsir == (twin[r.id] is not None and twin[r.id] >= floor)
    # target-vocabulary chunk passes, disjoint-vocabulary chunk fails
    assert got["c0"].f_dsir and not got["c1"].f_dsir
    funnel = funnel_metrics(cur)
    keys = list(funnel)
    assert keys.index("dsir") == keys.index("quality") + 1
    vals = [funnel[s] for s in keys if s != "extracted"]
    assert vals == sorted(vals, reverse=True)


def test_pipeline_dsir_requires_both_params(spark):
    import pytest
    chunks = spark.createDataFrame(
        [("c0", 0, 0, "text", "x", 1)],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    with pytest.raises(ValueError, match="dsir"):
        curate(chunks, dsir_min_importance=0.5)


def test_pipeline_token_budget_stage(spark):
    """The budget draw caps the OUTPUT corpus: f_budget is the last
    funnel stage, equals selected, marks a prefix of the shuffle order
    over the otherwise-selected rows, and a huge budget is a no-op."""
    from pdf_parser_spark.operators.curation import token_budget_select
    from pdf_parser_spark.operators.retrieval import with_chunk_id

    rows = [(f"c{i}", 0, 0, "text",
             " ".join(f"w{i}x{j}" for j in range(16)))
            for i in range(12)]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")

    kw = dict(langs=("en", "und"), quality_floor=0.0,
              min_chars=1, max_chars=4000)
    free = curate(chunks, **kw)
    pre_selected = {r.id for r in free.where("selected").select("id")
                    .collect()}

    budget = 8 * 16  # half the corpus when everything else passes
    cur = curate(chunks, token_budget=budget, budget_seed=5, **kw)
    got = cur.collect()
    for r in got:
        assert r.selected == r.f_budget
    drawn = {r.id for r in token_budget_select(
        with_chunk_id(chunks).where(F.col("id").isin(list(pre_selected)))
        .select("id", "text"), budget, id_col="id", seed=5).collect()}
    assert {r.id for r in got if r.f_budget} == drawn
    assert 0 < len(drawn) < len(pre_selected)
    funnel = funnel_metrics(cur)
    keys = [k for k in funnel
            if k not in ("span_tokens_removed", "paragraph_segs_removed")]
    assert keys[-2:] == ["budget", "selected"]
    assert funnel["budget"] == funnel["selected"] == len(drawn)
    # a budget beyond the corpus changes nothing
    free_funnel = funnel_metrics(curate(chunks, token_budget=10**9, **kw))
    assert free_funnel["selected"] == len(pre_selected)


def test_pipeline_domain_blocklist_stage(spark):
    """f_domain_clean equals the standalone blocklist verdict: listed
    domains and their subdomains kill the chunk, URL-free and
    clean-domain chunks pass, and the hit count is kept."""
    rows = [
        ("c0", 0, 0, "text",
         "normal words then https://ads.spam.example/x more words"),
        ("c1", 0, 0, "text", "only safe refs http://docs.ok.org/page"),
        ("c2", 0, 0, "text", "no urls in this chunk at all"),
    ]
    chunks = spark.createDataFrame(
        [(c, i, t, k, x, len(x)) for c, i, t, k, x in rows],
        "conv_id string, chunk_idx int, turn_idx int, chunk_type string, "
        "text string, char_count int")
    cur = curate(chunks, langs=("en", "und"), quality_floor=0.0,
                 min_chars=1, max_chars=4000,
                 blocked_domains=["spam.example"])
    got = {r.conv_id: r for r in cur.collect()}
    assert not got["c0"].f_domain_clean
    assert got["c0"].blocked_url_count == 1
    assert got["c1"].f_domain_clean and got["c1"].blocked_url_count == 0
    assert got["c2"].f_domain_clean and got["c2"].blocked_url_count == 0
    funnel = funnel_metrics(cur)
    assert funnel["domain_clean"] == 2
    vals = [funnel[s] for s in funnel if s != "extracted"]
    assert vals == sorted(vals, reverse=True)


def test_curriculum_stage_matches_standalone_operator(spark, tmp_path):
    """--curriculum-bands appends (band, position) to the selected
    corpus and equals the standalone operator applied to the same rows."""
    from pdf_parser_spark.operators.curation import curriculum_order

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=40, seed=13)
    out = str(tmp_path / "out")
    run_training_pipeline(spark, src, out, cleaning=True,
                          langs=("en", "und"), quality_floor=0.2,
                          min_chars=40, max_chars=2000,
                          curriculum_bands=5)
    corpus = spark.read.parquet(f"{out}/corpus")
    assert {"band", "position"} <= set(corpus.columns)
    # recompute from the written rows: same operator, same columns
    redo = curriculum_order(corpus.drop("band", "position"),
                            bands=5, id_col="id")
    a = {r.id: (r.band, r.position) for r in corpus.collect()}
    b = {r.id: (r.band, r.position) for r in redo.collect()}
    assert a == b and len(a) > 0
    # schedule is a permutation of 1..n and band 1 exists
    assert sorted(p for _, p in a.values()) == list(range(1, len(a) + 1))
    assert min(band for band, _ in a.values()) == 1


def test_jsonl_output_format(spark, tmp_path):
    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=20, seed=13)
    out = str(tmp_path / "out")
    run_training_pipeline(spark, src, out, cleaning=True,
                          langs=("en", "und"), quality_floor=0.2,
                          min_chars=40, max_chars=2000,
                          output_format="jsonl")
    back = spark.read.json(f"{out}/corpus")
    assert back.count() > 0 and "text" in back.columns


def test_pipeline_leak_safe_split_stage(spark, tmp_path):
    """--leak-safe-split: every near-dup pair shares a split; rows in no
    pair keep EXACTLY the plain split assignment; all flags (and so the
    funnel) are untouched — the option changes split keying only."""
    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.operators.dedup import (release_owned_storage,
                                                  simhash_dup_pairs)
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.pipeline import read_transcripts

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=25, seed=21)
    chunks = extract_chunks(read_transcripts(spark, src), CLEANING_CONFIG) \
        .where(F.col("chunk_type") == "text").drop("table_cells")
    # plant near-dups: one-token perturbations of the longest chunks
    # (long text -> few simhash bit flips -> within the hamming radius)
    near = (chunks.orderBy(F.desc("char_count"), "conv_id", "chunk_idx")
            .limit(6)
            .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_nd")))
            .withColumn("text", F.concat(F.col("text"), F.lit(" zz"))))
    chunks = chunks.union(near)
    kw = dict(langs=("en", "und"), quality_floor=0.2,
              min_chars=40, max_chars=2000)
    plain = curate(chunks, **kw)
    safe = curate(chunks, leak_safe_split=True, **kw)
    p = {r.id: r for r in plain.collect()}
    s = {r.id: r for r in safe.collect()}
    assert set(p) == set(s)
    flag_cols = [c for c in plain.columns if c.startswith("f_")] \
        + ["selected"]
    for i in p:
        assert all(p[i][c] == s[i][c] for c in flag_cols)

    # pairs over the exact-unique tier — exactly what curate() clusters
    base = with_chunk_id(chunks)
    exact_ids = {i for i, r in p.items() if r.f_exact_unique}
    pairs = simhash_dup_pairs(
        base.where(F.col("id").isin(list(exact_ids))).select("id", "text"),
        "id", "text", max_hamming=3).collect()
    assert pairs, "fixture must contain near-dups for this test to bite"
    paired = set()
    for pr in pairs:
        assert s[pr.id_a].split == s[pr.id_b].split
        paired |= {pr.id_a, pr.id_b}
    # un-paired rows: identical to the plain assignment (coalesce -> id)
    changed = [i for i in set(p) - paired if p[i].split != s[i].split]
    assert changed == []
    release_owned_storage(plain)
    release_owned_storage(safe)


def test_pipeline_quality_survivor_stage(spark, tmp_path):
    """--dedup-keep quality: the near-dup survivor is the highest-
    quality cluster member, EQUAL to the standalone
    keep_best_per_cluster operator on the same clusters; survivor count
    (and so the whole funnel) matches the min-id run."""
    from pdf_parser_spark.config import CLEANING_CONFIG
    from pdf_parser_spark.operators.dedup import (keep_best_per_cluster,
                                                  release_owned_storage,
                                                  simhash_dup_pairs)
    from pdf_parser_spark.operators.merge import extract_chunks
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.operators.textstats import quality_features
    from pdf_parser_spark.pipeline import read_transcripts

    src = str(tmp_path / "t.parquet")
    write_transcripts_parquet(src, n_convs=25, seed=21)
    chunks = extract_chunks(read_transcripts(spark, src), CLEANING_CONFIG) \
        .where(F.col("chunk_type") == "text").drop("table_cells")
    # plant near-dups: a tiny alnum suffix stays inside the simhash
    # hamming radius but nudges token count + alnum ratio, so the
    # perturbed copy's quality_score differs from the original's and
    # the quality rule must pick differently from min-id (the original
    # id sorts first: '#' < '_')
    near = (chunks.orderBy(F.desc("char_count"), "conv_id", "chunk_idx")
            .limit(6)
            .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_nd")))
            .withColumn("text", F.concat(F.col("text"), F.lit(" zz"))))
    chunks = chunks.union(near)
    kw = dict(langs=("en", "und"), quality_floor=0.2,
              min_chars=40, max_chars=2000)
    minid = curate(chunks, **kw)
    qual = curate(chunks, dedup_keep="quality", **kw)
    m = {r.id: r for r in minid.collect()}
    q = {r.id: r for r in qual.collect()}

    from jobs.training_pipeline import funnel_metrics
    assert funnel_metrics(minid) == funnel_metrics(qual)  # same counts

    # equality with the standalone operator over the same clusters
    base = with_chunk_id(chunks)
    exact_ids = [i for i, r in m.items() if r.f_exact_unique]
    ex = base.where(F.col("id").isin(exact_ids)).select("id", "text")
    pairs = simhash_dup_pairs(ex, "id", "text", max_hamming=3)
    assert pairs.count() > 0
    scored = quality_features(ex).select("id", "quality_score")
    best = keep_best_per_cluster(scored, pairs, id_col="id")
    want = {r.id for r in best.collect()}
    got = {i for i, r in q.items() if r.f_near_unique}
    assert got == want
    # and the rule genuinely differs from min-id on this fixture
    assert got != {i for i, r in m.items() if r.f_near_unique}
    # the survivor rule must move ONLY f_near_unique: split membership is
    # id-keyed in both runs (component keying is leak_safe_split's job)
    assert {i: r.split for i, r in q.items()} == \
           {i: r.split for i, r in m.items()}
    release_owned_storage(best)
    release_owned_storage(minid)
    release_owned_storage(qual)

    import pytest
    with pytest.raises(ValueError, match="dedup_keep"):
        curate(chunks, dedup_keep="newest", **kw)
