"""End-to-end training-data pipeline: transcripts -> curated, split corpus.

The composition a training-data user actually runs, wired from the tested
operators (extraction -> exact dedup -> simhash near-dup clusters ->
quality/language/length funnel -> deterministic split -> partitioned
write), in the engine's fused-plan shape: every per-row criterion is a
FLAG COLUMN on one DataFrame, so the funnel metrics come from ONE
aggregation pass and the final write filters the same plan — no
per-stage materialization, no repeated scans of the chunk text. The
exact-dedup verdict is a map-side-combined groupBy over the content hash
joined back on a 24-byte projection (skew-safe: a corpus-dominating
boilerplate collapses per map task instead of serializing onto one
window task); the near-dup verdict joins the LOSER set — the small side
by construction, AQE-broadcastable (operators/dedup.py documents the
shapes).

Run::

    python jobs/training_pipeline.py --input <transcripts_parquet> \
        --output <dir> [--langs en,zh] [--quality-floor 0.25] \
        [--min-chars 40] [--max-chars 4000]

Writes ``<output>/corpus`` partitioned by ``split`` and
``<output>/funnel.json`` with per-stage survivor counts.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

FUNNEL_STAGES = ("extracted", "exact_unique", "near_unique", "quality",
                 "language", "length", "selected")

# every stage the funnel can contain, in filter order; funnel_metrics
# emits the subset whose flag column exists on the curated frame, so the
# optional curation passes (repetition, decontamination) appear exactly
# when enabled and the default funnel is byte-identical to before
_STAGE_FLAGS = (("exact_unique", "f_exact_unique"),
                ("near_unique", "f_near_unique"),
                ("quality", "f_quality"),
                ("lm_quality", "f_lm_quality"),
                ("dsir", "f_dsir"),
                ("repetition", "f_repetition"),
                ("language", "f_language"),
                ("length", "f_length"),
                ("decontaminated", "f_decontaminated"),
                ("domain_clean", "f_domain_clean"),
                ("semantic_kept", "f_semantic_kept"),
                # budget is computed over rows passing EVERYTHING else,
                # so it must stay the last stage for the funnel's
                # cumulative AND to equal `selected`
                ("budget", "f_budget"))


def curate(chunks: DataFrame, langs: tuple[str, ...] = ("en",),
           quality_floor: float = 0.25, min_chars: int = 40,
           max_chars: int = 4000, max_hamming: int = 3,
           split_weights=None, eval_docs: DataFrame | None = None,
           max_dup_line_frac: float | None = None,
           max_top_ngram_frac: float | None = None,
           redact_pii: bool = False,
           remove_spans_k: int | None = None,
           lm_logprob_min: float | None = None,
           lm_logprob_max: float | None = None,
           semantic_prune_frac: float | None = None,
           semantic_cells: int = 64,
           paragraph_scope: str | None = None,
           dsir_target: DataFrame | None = None,
           dsir_min_importance: float | None = None,
           dsir_buckets: int = 4096,
           blocked_domains=None,
           token_budget: int | None = None,
           budget_seed: int = 0,
           leak_safe_split: bool = False,
           dedup_keep: str = "min_id") -> DataFrame:
    """Chunk rows -> the same rows + per-stage boolean flags, a fused
    ``selected`` flag, and a ``split`` label. Text chunks only pass the
    quality tiers; the dedup tiers key on the engine-wide content hash.

    Optional curation passes (each adds a flag/stage only when enabled):

    - ``max_dup_line_frac`` / ``max_top_ngram_frac``: Gopher repetition
      ceilings — ``f_repetition`` passes docs under the duplicate-line
      fraction and/or the top-2/3-gram character-coverage fraction;
    - ``eval_docs``: a DataFrame with a ``text`` column —
      ``f_decontaminated`` drops chunks sharing any 13-token gram with
      it (the contaminated set is tiny, so the flag join broadcasts);
    - ``redact_pii``: masks email/SSN/phone/IPv4 in the output text and
      keeps the per-kind counts as columns (not a filter stage);
    - ``remove_spans_k``: cross-document exact-substring removal (Lee et
      al. ACL 2022) over the near-unique survivors BEFORE the quality
      tiers, so quality/length judge the deduplicated text. A text
      REWRITE, not a filter: losing k-token windows are cut, the min-id
      owner keeps its copy, and only rows that actually shed tokens are
      rewritten (untouched rows keep their original whitespace — the
      rewrite join's right side is the duplicated fraction of the
      corpus, broadcastable by AQE). Adds ``span_tokens_removed``;
    - ``lm_logprob_min`` / ``lm_logprob_max``: CCNet-style LM-quality
      band (Wenzek et al. 2020) — ``f_lm_quality`` keeps chunks whose
      mean unigram log-probability under the corpus's own LM
      (``textstats.unigram_logprob``; kept as ``lm_logprob``) lies in
      the band; token-free chunks carry no LM evidence and fail it;
    - ``semantic_prune_frac``: D4-style semantic tier (SemDeDup cells +
      prototype pruning, Tirumala et al. 2023) over the NEAR-UNIQUE
      survivors: chunks are embedded with the deterministic stub
      encoder (the real-encoder seam is ``embedding.make_embed_udf``'s
      ``encoder_factory``), assigned to ``semantic_cells`` cells (the
      broadcast argmax — k in the thousands is fine), and the
      prune_frac most-prototypical rows of each cell are dropped.
      Chunks with empty embeddings (empty text) carry no semantic
      evidence and keep their flag.
    - ``paragraph_scope``: paragraph-tier dedup (RefinedWeb/Dolma) over
      the near-unique survivors, another text REWRITE before the
      quality tiers: repeated '\\n'-lines are cut, keeping the
      min-(id, idx) canonical occurrence ('corpus') or the first
      in-document occurrence ('doc'). Only rows that actually shed a
      line are rewritten. Adds ``paragraph_segs_removed``;
    - ``dsir_target`` + ``dsir_min_importance``: DSIR selection (Xie et
      al. 2023) — ``f_dsir`` keeps chunks whose hashed-unigram
      importance (target-LM vs corpus-LM log-ratio, kept as
      ``dsir_importance``) clears the floor; token-less chunks carry no
      evidence and fail it;
    - ``blocked_domains``: UT1-style domain blocklist —
      ``f_domain_clean`` drops chunks containing any URL whose host (or
      a parent suffix of it) is listed; the per-doc hit count is kept
      as ``blocked_url_count``. URL-free chunks pass;
    - ``token_budget``: "train on B tokens" — the deterministic
      seed-keyed budget draw (curation.token_budget_select) over the
      rows passing every other stage; ``f_budget`` marks the drawn set
      and becomes the final ``selected``. Always the LAST stage.
    - ``leak_safe_split``: key the train/val/test hash on the near-dup
      COMPONENT instead of the chunk id (sampling.leak_safe_split's
      policy, r4) — members of one near-dup cluster land in the same
      split, so a dropped near-duplicate can never place its surviving
      rendition's content across the train/eval boundary. Exact
      duplicates already share the survivor's content hash and are
      deselected; near-dup components reuse the SAME closure the
      dedup flag computes (no second labeling pass). Rows in no pair
      key on their own id — identical to the plain split for them.
    - ``dedup_keep``: the near-dup SURVIVOR rule — ``'min_id'`` (the
      default, the arbitrary-but-stable convention) or ``'quality'``
      (keep_best_per_cluster's policy: the highest-quality member
      survives, NULL last, ties to min id — the RefinedWeb/FineWeb
      "best rendition" choice). Same survivor COUNT either way (one per
      cluster), so the funnel numbers are unchanged; only which rows
      carry ``f_near_unique`` moves.
    """
    from pyspark import StorageLevel

    from pdf_parser_spark.operators.dedup import (content_key,
                                                  near_dup_losers,
                                                  simhash_dup_pairs)
    from pdf_parser_spark.operators.retrieval import with_chunk_id
    from pdf_parser_spark.operators.sampling import deterministic_split
    from pdf_parser_spark.operators.textstats import text_statistics

    # materialize the chunk rows ONCE: five consumers reference them
    # (survivor agg, flag join, simhash side, funnel, write) and without
    # this the extraction mapInPandas re-executes per consumer — measured
    # 5x the wall on a 591k-turn corpus. Owned by the result (released
    # via its owned_storage handles).
    base = with_chunk_id(chunks).persist(StorageLevel.MEMORY_AND_DISK)

    # exact dedup: survivor = min chunk id per content group, as a
    # map-side-combined groupBy + equi-join back. A window over __h
    # computes the same flag in one exchange, but serializes each content
    # group onto ONE task — a corpus-dominating boilerplate text (the
    # exact input a dedup pipeline exists for) becomes an unsplittable
    # straggler. The groupBy's partial aggregation collapses a hot hash
    # to one row per map task, and AQE's skew-join splitting handles the
    # join side; the agg input is a PROJECTION of the persisted base
    # (id + hash only), so re-references replay 24-byte rows, not the
    # flag chain
    survivors = (base.select(content_key(F.col("text")).alias("__h"), "id")
                 .groupBy("__h").agg(F.min("id").alias("__surv")))
    flagged = (base.withColumn("__h", content_key(F.col("text")))
               .join(survivors, "__h")
               .withColumn("f_exact_unique", F.col("id") == F.col("__surv"))
               .drop("__h", "__surv"))

    # near-dup clusters over the exact survivors (simhash pairs ->
    # connected components). The flag joins against the LOSER set — the
    # duplicates being dropped — not the survivor set: losers are the
    # small side by construction (near-dup fraction of the corpus), so
    # AQE can broadcast them, where the survivor join shuffled ~the whole
    # corpus back onto itself
    exact_side = flagged.where(F.col("f_exact_unique")).select("id", "text")
    pairs = simhash_dup_pairs(exact_side, "id", "text",
                              max_hamming=max_hamming)
    if dedup_keep not in ("min_id", "quality"):
        raise ValueError(f"dedup_keep must be 'min_id' or 'quality', "
                         f"got {dedup_keep!r}")
    comps = None
    if leak_safe_split or dedup_keep == "quality":
        # one labeling serves the loser flag, the quality-survivor pick
        # AND the split key — near_dup_losers would compute the
        # identical closure internally
        from pdf_parser_spark.operators.dedup import (_own,
                                                      connected_components)
        comps = connected_components(pairs)
        if dedup_keep == "quality":
            # keep_best_per_cluster over the SHARED closure (components=
            # passes ownership through; equality with the standalone
            # operator pinned in test_pipeline_quality_survivor_stage).
            # Survivor choice only matters INSIDE a cluster, so only the
            # clustered rows (the near-dup fraction of the corpus) pay
            # the quality regexp pass — not the whole exact-unique tier.
            from pdf_parser_spark.operators.dedup import \
                keep_best_per_cluster
            from pdf_parser_spark.operators.textstats import quality_features
            clustered = exact_side.join(comps.select("id"), "id")
            scored = (quality_features(clustered)
                      .select("id", F.col("quality_score").cast("double")
                              .alias("quality_score")))
            best = keep_best_per_cluster(scored, pairs, id_col="id",
                                         components=comps)
            loser_ids = _own(
                comps.select("id").join(
                    best.select(F.col("id").alias("__winner")),
                    F.col("id") == F.col("__winner"), "left_anti"),
                *getattr(comps, "owned_storage", ()))
        else:
            loser_ids = _own(
                comps.where(F.col("id") != F.col("component")).select("id"),
                *getattr(comps, "owned_storage", ()))
    else:
        loser_ids = near_dup_losers(pairs)  # owns the components checkpoint
    losers = loser_ids.withColumn("__loser", F.lit(True))
    flagged = (flagged.join(losers, "id", "left")
               .withColumn("f_near_unique",
                           F.col("f_exact_unique")
                           & F.col("__loser").isNull())
               .drop("__loser"))

    span_storage: tuple = ()
    if remove_spans_k is not None:
        from pdf_parser_spark.operators.dedup import remove_duplicated_spans
        rewrites = (remove_duplicated_spans(
            flagged.where(F.col("f_near_unique")).select("id", "text"),
            "id", "text", k=remove_spans_k)
            .where(F.col("n_removed_tokens") > 0)
            .select("id", "text_clean", "n_removed_tokens"))
        flagged = (flagged.join(rewrites, "id", "left")
                   .withColumn("span_tokens_removed",
                               F.coalesce("n_removed_tokens", F.lit(0)))
                   .withColumn("text",
                               F.coalesce("text_clean", F.col("text")))
                   .withColumn("char_count",
                               F.length("text").cast("int"))
                   .drop("text_clean", "n_removed_tokens"))
        span_storage = tuple(getattr(rewrites, "owned_storage", ()))

    if paragraph_scope is not None:
        from pdf_parser_spark.operators.dedup import dedup_paragraphs
        # same rewrite shape as the span stage: the right side is only
        # the rows that shed a line (the duplicated fraction — AQE
        # broadcasts it), untouched rows keep their original text
        para = (dedup_paragraphs(
            flagged.where(F.col("f_near_unique")).select("id", "text"),
            id_col="id", text_col="text", scope=paragraph_scope)
            .where(F.col("n_removed_segs") > 0)
            .select("id", F.col("text_clean").alias("__ptext"),
                    "n_removed_segs"))
        flagged = (flagged.join(para, "id", "left")
                   .withColumn("paragraph_segs_removed",
                               F.coalesce("n_removed_segs", F.lit(0)))
                   .withColumn("text",
                               F.coalesce("__ptext", F.col("text")))
                   .withColumn("char_count", F.length("text").cast("int"))
                   .drop("__ptext", "n_removed_segs"))

    # text_statistics APPENDS its columns — no join, one pass over text
    flagged = (text_statistics(flagged)
               .withColumn("f_quality",
                           F.col("quality_score") >= quality_floor)
               .withColumn("f_language", F.col("lang_pred").isin(*langs))
               .withColumn("f_length",
                           F.col("char_count").between(min_chars,
                                                       max_chars)))

    if lm_logprob_min is not None or lm_logprob_max is not None:
        from pdf_parser_spark.operators.textstats import unigram_logprob
        # per-chunk LM score over the full flag frame (the LM itself is
        # corpus-wide — dedup losers still inform the vocabulary, as
        # CCNet's fixed external LM would); one id-keyed join back
        lm = unigram_logprob(flagged.select("id", "text"), "id", "text") \
            .select("id", F.col("avg_logprob").alias("lm_logprob"))
        flagged = flagged.join(lm, "id", "left")
        ok = F.col("lm_logprob").isNotNull()
        if lm_logprob_min is not None:
            ok = ok & (F.col("lm_logprob") >= lm_logprob_min)
        if lm_logprob_max is not None:
            ok = ok & (F.col("lm_logprob") <= lm_logprob_max)
        flagged = flagged.withColumn("f_lm_quality", ok)

    if (dsir_target is None) != (dsir_min_importance is None):
        raise ValueError("dsir_target and dsir_min_importance enable the "
                         "DSIR stage together — passing one without the "
                         "other silently skips it, so it is an error")
    dsir_storage: tuple = ()
    if dsir_target is not None:
        from pdf_parser_spark.operators.curation import dsir_importance
        # raw LM over the FULL flag frame (dedup losers still inform the
        # corpus distribution, as DSIR's raw-pool LM would); one id-keyed
        # join back of (id, score)
        scored = dsir_importance(flagged.select("id", "text"), dsir_target,
                                 id_col="id", text_col="text",
                                 n_buckets=dsir_buckets)
        sc = scored.select("id",
                           F.col("importance").alias("dsir_importance"))
        flagged = (flagged.join(sc, "id", "left")
                   .withColumn("f_dsir",
                               F.col("dsir_importance").isNotNull()
                               & (F.col("dsir_importance")
                                  >= dsir_min_importance)))
        dsir_storage = tuple(getattr(scored, "owned_storage", ()))

    if max_dup_line_frac is not None or max_top_ngram_frac is not None:
        from pdf_parser_spark.operators.curation import repetition_features
        flagged = repetition_features(flagged)
        rep_ok = F.lit(True)
        if max_dup_line_frac is not None:
            rep_ok = rep_ok & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_ngram_frac is not None:
            rep_ok = (rep_ok
                      & (F.col("top_bigram_char_frac")
                         <= max_top_ngram_frac)
                      & (F.col("top_trigram_char_frac")
                         <= max_top_ngram_frac))
        flagged = flagged.withColumn("f_repetition", rep_ok) \
            .drop("n_lines", "dup_line_frac", "dup_line_char_frac",
                  "top_bigram_char_frac", "top_trigram_char_frac")

    if eval_docs is not None:
        from pdf_parser_spark.operators.curation import decontaminate
        # the contaminated set is the small side by construction (eval
        # overlap fraction of the corpus) — AQE broadcasts it, same shape
        # as the near-dup loser join above
        contaminated = decontaminate(flagged, eval_docs, id_col="id",
                                     text_col="text") \
            .select("id").withColumn("__dirty", F.lit(True))
        flagged = (flagged.join(contaminated, "id", "left")
                   .withColumn("f_decontaminated",
                               F.col("__dirty").isNull())
                   .drop("__dirty"))

    if redact_pii:
        from pdf_parser_spark.operators.curation import pii_redact
        flagged = pii_redact(flagged) \
            .withColumn("text", F.col("redacted_text")) \
            .drop("redacted_text")

    if blocked_domains is not None:
        from pdf_parser_spark.operators.textstats import \
            domain_blocklist_filter
        # UT1-style pass: one id-keyed join back of the per-doc verdict;
        # the blocklist itself is a driver-side literal (UT1 scale is
        # tens of MB — broadcast territory, documented in the operator)
        verdict = (domain_blocklist_filter(
            flagged.select("id", "text"), blocked_domains, id_col="id")
            .select("id", F.col("n_blocked").alias("blocked_url_count"),
                    F.col("blocked").alias("__blocked")))
        flagged = (flagged.join(verdict, "id", "left")
                   .withColumn("f_domain_clean",
                               ~F.coalesce("__blocked", F.lit(False)))
                   .drop("__blocked"))

    if semantic_prune_frac is not None:
        from pdf_parser_spark.operators.embedding import make_embed_udf
        from pdf_parser_spark.operators.similarity import \
            cluster_prune_prototypes
        udf = make_embed_udf()
        c = F.coalesce(F.col("text"), F.lit(""))
        emb = (flagged.where(F.col("f_near_unique"))
               .select("id",
                       F.when(F.length(F.trim(c)) == 0,
                              F.array().cast("array<float>"))
                        .otherwise(udf(c)).alias("embedding")))
        kept = cluster_prune_prototypes(
            emb.where(F.size("embedding") > 0), k=semantic_cells,
            drop_frac=semantic_prune_frac, id_col="id") \
            .select("id").withColumn("__sem_keep", F.lit(True))
        no_evidence = (emb.where(F.size("embedding") == 0)
                       .select("id").withColumn("__sem_keep", F.lit(True)))
        flagged = (flagged.join(kept.unionByName(no_evidence), "id", "left")
                   .withColumn("f_semantic_kept",
                               F.col("f_near_unique")
                               & F.col("__sem_keep").isNotNull())
                   .drop("__sem_keep"))

    sel = F.col("f_near_unique") & F.col("f_quality") \
        & F.col("f_language") & F.col("f_length")
    for opt in ("f_lm_quality", "f_dsir", "f_repetition",
                "f_decontaminated", "f_domain_clean", "f_semantic_kept"):
        if opt in flagged.columns:
            sel = sel & F.col(opt)
    flagged = flagged.withColumn("selected", sel)

    if token_budget is not None:
        from pdf_parser_spark.operators.curation import token_budget_select
        # the draw runs over the rows passing every other stage, so the
        # budget caps the OUTPUT corpus; the drawn id set is tiny
        # relative to the corpus only when the budget is — the join is a
        # plain id equality join either way (AQE picks broadcast/shuffle)
        drawn = (token_budget_select(
            flagged.where(F.col("selected")).select("id", "text"),
            token_budget, id_col="id", seed=budget_seed)
            .select("id", F.lit(True).alias("__in_budget")))
        flagged = (flagged.join(drawn, "id", "left")
                   .withColumn("f_budget",
                               F.col("selected")
                               & F.col("__in_budget").isNotNull())
                   .withColumn("selected", F.col("f_budget"))
                   .drop("__in_budget"))

    if leak_safe_split:
        # leak-safe: the split hash keys on the near-dup component
        # (sampling.leak_safe_split's policy); rows in no pair key on
        # their own id — bit-identical to the plain split for them.
        # Gated on the FLAG, not on comps existing: dedup_keep='quality'
        # alone also labels components, but must not silently change
        # which split a row lands in.
        out = (deterministic_split(
                   flagged.join(comps, "id", "left")
                          .withColumn("__splitkey",
                                      F.coalesce("component", F.col("id")))
                          .drop("component"),
                   "__splitkey", split_weights)
               .drop("__splitkey"))
    else:
        out = deterministic_split(flagged, "id", split_weights)
    # the dedup tiers pinned executor storage (simhash signatures, the
    # component labeling) — re-attach those handles to the final result
    # so run_training_pipeline (or any caller) can release them; without
    # this the joins above would orphan them into session-lifetime leaks
    out.owned_storage = ((base,)
                         + tuple(getattr(pairs, "owned_storage", ()))
                         + tuple(getattr(loser_ids, "owned_storage", ()))
                         + span_storage
                         + dsir_storage)
    return out


def funnel_metrics(curated: DataFrame) -> dict:
    """ONE aggregation pass over the flag columns. Sums coalesce to 0 so
    an empty extraction yields a zeroed funnel, not NULLs.

    Stages are the _STAGE_FLAGS subset whose flag exists on the frame,
    counted as the cumulative AND along the filter order — so the funnel
    is monotone by construction and its last stage equals ``selected``.
    With no optional passes enabled this emits exactly FUNNEL_STAGES.
    """
    def _s(col):
        return F.coalesce(F.sum(col.cast("int")), F.lit(0))

    present = [(s, f) for s, f in _STAGE_FLAGS if f in curated.columns]
    aggs = [F.count("*").alias("extracted")]
    acc = None
    for stage, flag in present:
        acc = F.col(flag) if acc is None else (acc & F.col(flag))
        aggs.append(_s(acc).alias(stage))
    aggs.append(_s(F.col("selected")).alias("selected"))
    info = []
    for acct in ("span_tokens_removed", "paragraph_segs_removed"):
        if acct in curated.columns:
            # rewrite accounting, not a filter stage: reported after the
            # stage counts so the funnel's monotone prefix stays intact
            aggs.append(F.coalesce(F.sum(acct), F.lit(0)).alias(acct))
            info.append(acct)
    row = curated.agg(*aggs).collect()[0]
    stages = (("extracted",) + tuple(s for s, _ in present)
              + ("selected",) + tuple(info))
    return {s: int(row[s]) for s in stages}


def run_training_pipeline(spark: SparkSession, input_path: str,
                          output_dir: str, cleaning: bool | None = None,
                          layout: str | None = None,
                          input_kind: str = "transcripts",
                          **curate_kwargs) -> dict:
    """``layout="bucketed"`` takes the zero-shuffle extraction route for
    input whose splits hold whole conversations contiguously (an Iceberg
    ``bucket(N, conv_id)`` table, or the distributed synth corpora) —
    ~1.5x extraction at any scale. Safe to attempt: the bucketed route's
    in-task guard RAISES on a split that cuts a conversation instead of
    mis-indexing silently; default stays the layout-agnostic window.

    ``input_kind="extracted"`` curates a chunk table that
    ``sources.lineage.run_extraction`` already wrote (its
    ``<dir>/extracted`` parquet/Iceberg output) instead of re-extracting
    transcripts — the staged shape a 100 TB deployment runs: extraction
    is checkpointed/resumable per bucket, and curation re-runs cheaply
    on top of the committed table."""
    from pdf_parser_spark.config import CLEANING_CONFIG, DEFAULT_CONFIG
    from pdf_parser_spark.operators.merge import (extract_chunks,
                                                  extract_chunks_bucketed)
    from pdf_parser_spark.pipeline import read_transcripts

    from pdf_parser_spark.operators.dedup import release_owned_storage

    from pyspark import StorageLevel

    if layout not in (None, "windowed", "bucketed"):
        raise ValueError(f"layout must be windowed|bucketed, got {layout!r}")
    if input_kind not in ("transcripts", "extracted"):
        raise ValueError(
            f"input_kind must be transcripts|extracted, got {input_kind!r}")
    if input_kind == "extracted":
        if cleaning is not None or layout is not None:
            # the staged table was extracted under its OWN config/route;
            # silently ignoring these would let a --parity run curate
            # cleaned chunks (or vice versa) with no hint why downstream
            # comparisons mismatch
            raise ValueError(
                "cleaning/layout apply to in-pipeline extraction; with "
                "input_kind='extracted' the staged table's extraction "
                "config is already decided — drop the flags")
        from pdf_parser_spark.sources.lineage import staged_run_incomplete
        if input_path.rstrip("/").endswith("/extracted"):
            gap = staged_run_incomplete(
                spark, input_path.rstrip("/").rsplit("/", 1)[0])
            if gap is not None:
                raise ValueError(
                    f"staged extraction is incomplete ({gap[0]}/{gap[1]} "
                    "buckets done) — resume run_extraction before "
                    "curating, or a silently truncated corpus results")
        chunks = spark.read.parquet(input_path).drop("bucket_id")
    else:
        extract_fn = (extract_chunks_bucketed if layout == "bucketed"
                      else extract_chunks)
        cfg = (DEFAULT_CONFIG if cleaning is False else CLEANING_CONFIG)
        chunks = extract_fn(read_transcripts(spark, input_path), cfg)
    chunks = chunks.where(F.col("chunk_type") == "text").drop("table_cells")
    # curated feeds BOTH the funnel aggregation and the write; persist it
    # so the flag joins + text-statistics UDFs execute once, not twice
    curriculum_bands = curate_kwargs.pop("curriculum_bands", None)
    output_format = curate_kwargs.pop("output_format", "parquet")
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(
            f"output_format must be parquet|jsonl, got {output_format!r}")
    curated = curate(chunks, **curate_kwargs) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        funnel = funnel_metrics(curated)
        flag_cols = [c for c in curated.columns
                     if c == "selected" or c.startswith("f_")]
        out = curated.where(F.col("selected")).drop(*flag_cols)
        if curriculum_bands:
            # easy-to-hard training schedule over the SELECTED corpus:
            # band + position columns (parquet keeps no row order; the
            # trainer sorts by them), rows laid out in schedule order
            # within files via sortWithinPartitions
            from pdf_parser_spark.operators.curation import \
                curriculum_order
            out = (curriculum_order(out, bands=curriculum_bands,
                                    id_col="id")
                   .sortWithinPartitions("band", "position"))
        writer = out.write.partitionBy("split").mode("overwrite")
        if output_format == "jsonl":
            writer.option("compression", "gzip") \
                  .json(f"{output_dir}/corpus")
        else:
            writer.parquet(f"{output_dir}/corpus")
    finally:
        # the dedup tiers' + base chunks' pinned storage rides on
        # `curated`; a driver looping over corpora must not accumulate it
        release_owned_storage(curated)
        curated.unpersist()
    if "://" in output_dir:
        # non-local filesystem: write the tiny funnel through Spark's
        # Hadoop FS writer (a local open() would fail after the whole
        # pipeline already ran)
        (spark.createDataFrame([(json.dumps(funnel),)], "funnel string")
         .coalesce(1).write.mode("overwrite")
         .text(f"{output_dir}/funnel.json"))
    else:
        with open(f"{output_dir}/funnel.json", "w") as f:
            json.dump(funnel, f, indent=2)
    return funnel


def _read_blocklist(path: str | None) -> list[str] | None:
    """One domain per line (the UT1 distribution format); '#' comments
    and blank lines ignored. None path -> stage disabled."""
    if path is None:
        return None
    with open(path) as f:
        domains = [ln.strip() for ln in f
                   if ln.strip() and not ln.lstrip().startswith("#")]
    return domains


def main() -> int:
    import argparse

    from pdf_parser_spark.session import build_session

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--quality-floor", type=float, default=0.25)
    ap.add_argument("--min-chars", type=int, default=40)
    ap.add_argument("--max-chars", type=int, default=4000)
    ap.add_argument("--parity", action="store_true",
                    help="DEFAULT_CONFIG instead of CLEANING_CONFIG")
    ap.add_argument("--layout", default="windowed",
                    choices=("windowed", "bucketed"),
                    help="bucketed = zero-shuffle extraction for "
                         "conversation-complete input splits")
    ap.add_argument("--input-kind", default="transcripts",
                    choices=("transcripts", "extracted"),
                    help="extracted = curate run_extraction's committed "
                         "chunk table without re-extracting")
    ap.add_argument("--decontaminate-eval", default=None, metavar="PARQUET",
                    help="parquet of held-out eval text (a 'text' column "
                         "is enough): drop chunks sharing any 13-token "
                         "gram with it")
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="Gopher repetition ceiling on the duplicate-line "
                         "fraction")
    ap.add_argument("--max-top-ngram-frac", type=float, default=None,
                    help="Gopher repetition ceiling on the top-2/3-gram "
                         "character-coverage fractions")
    ap.add_argument("--redact-pii", action="store_true",
                    help="mask email/SSN/phone/IPv4 in the output text "
                         "(counts kept as columns)")
    ap.add_argument("--semantic-prune-frac", type=float, default=None,
                    metavar="FRAC",
                    help="D4 semantic tier: drop this fraction of the "
                         "most-prototypical chunks per embedding cell "
                         "(stub encoder; real-encoder seam available)")
    ap.add_argument("--semantic-cells", type=int, default=64,
                    help="number of embedding cells for the semantic "
                         "tier (scale ~ corpus/target_cell_size)")
    ap.add_argument("--lm-logprob-min", type=float, default=None,
                    help="CCNet-style LM-quality band floor on the mean "
                         "unigram log-probability (corpus-self LM)")
    ap.add_argument("--lm-logprob-max", type=float, default=None,
                    help="upper bound of the LM-quality band")
    ap.add_argument("--remove-spans-k", type=int, default=None,
                    metavar="K",
                    help="cut cross-document duplicated K-token spans "
                         "from near-unique survivors before the quality "
                         "tiers (Lee et al. ACL 2022; min-id owner keeps "
                         "its copy)")
    ap.add_argument("--paragraph-dedup", default=None, metavar="SCOPE",
                    choices=("corpus", "doc"),
                    help="paragraph-tier dedup rewrite before the quality "
                         "tiers: cut repeated lines, keeping the corpus-"
                         "wide canonical occurrence ('corpus') or the "
                         "first in-document one ('doc')")
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="parquet of target-domain text (a 'text' column "
                         "is enough): enables the DSIR selection stage")
    ap.add_argument("--dsir-min-importance", type=float, default=None,
                    help="keep chunks whose DSIR importance (target-LM "
                         "vs corpus-LM hashed-unigram log-ratio) clears "
                         "this floor; required with --dsir-target")
    ap.add_argument("--blocklist-file", default=None, metavar="TXT",
                    help="text file of blocked domains, one per line "
                         "(UT1 distribution format; '#' comments and "
                         "blank lines ignored): drop chunks with any "
                         "URL on a listed domain or its subdomains")
    ap.add_argument("--token-budget", type=int, default=None, metavar="B",
                    help="cap the output corpus at B tokens via the "
                         "deterministic seed-keyed budget draw (always "
                         "the last funnel stage)")
    ap.add_argument("--output-format", default="parquet",
                    choices=("parquet", "jsonl"),
                    help="corpus sink format; jsonl (gzip) is the "
                         "trainer-facing export")
    ap.add_argument("--curriculum-bands", type=int, default=None,
                    metavar="N",
                    help="order the output corpus easy-to-hard: N "
                         "quality-decile bands + deterministic "
                         "within-band shuffle (band/position columns)")
    ap.add_argument("--budget-seed", type=int, default=0,
                    help="seed of the token-budget shuffle order")
    ap.add_argument("--dedup-keep", default="min_id",
                    choices=("min_id", "quality"),
                    help="near-dup survivor rule: stable min-id, or the "
                         "highest-quality cluster member "
                         "(keep_best_per_cluster's policy)")
    ap.add_argument("--leak-safe-split", action="store_true",
                    help="key the train/val/test hash on the near-dup "
                         "component instead of the chunk id, so near-"
                         "duplicate renditions never straddle train and "
                         "eval (reuses the dedup stage's own closure)")
    a = ap.parse_args()
    if (a.dsir_target is None) != (a.dsir_min_importance is None):
        ap.error("--dsir-target and --dsir-min-importance go together")
    if a.token_budget is not None and a.token_budget < 0:
        ap.error("--token-budget must be >= 0")
    if a.remove_spans_k is not None and a.remove_spans_k < 1:
        ap.error("--remove-spans-k must be >= 1 (a 0-token window "
                 "matches everything and would empty the corpus)")
    if a.input_kind == "extracted" and (a.parity or a.layout != "windowed"):
        ap.error("--parity/--layout apply to in-pipeline extraction; "
                 "the staged table's extraction config is already decided")
    extract_kw = ({} if a.input_kind == "extracted"
                  else {"cleaning": not a.parity, "layout": a.layout})
    spark = build_session("training-pipeline")
    try:
        eval_docs = (spark.read.parquet(a.decontaminate_eval)
                     if a.decontaminate_eval else None)
        funnel = run_training_pipeline(
            spark, a.input, a.output, input_kind=a.input_kind,
            langs=tuple(a.langs.split(",")),
            quality_floor=a.quality_floor, min_chars=a.min_chars,
            max_chars=a.max_chars, eval_docs=eval_docs,
            max_dup_line_frac=a.max_dup_line_frac,
            max_top_ngram_frac=a.max_top_ngram_frac,
            redact_pii=a.redact_pii,
            remove_spans_k=a.remove_spans_k,
            lm_logprob_min=a.lm_logprob_min,
            lm_logprob_max=a.lm_logprob_max,
            semantic_prune_frac=a.semantic_prune_frac,
            semantic_cells=a.semantic_cells,
            paragraph_scope=a.paragraph_dedup,
            dsir_target=(spark.read.parquet(a.dsir_target)
                         if a.dsir_target else None),
            dsir_min_importance=a.dsir_min_importance,
            blocked_domains=_read_blocklist(a.blocklist_file),
            token_budget=a.token_budget, budget_seed=a.budget_seed,
            leak_safe_split=a.leak_safe_split,
            dedup_keep=a.dedup_keep,
            curriculum_bands=a.curriculum_bands,
            output_format=a.output_format,
            **extract_kw)
        print(json.dumps(funnel))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
