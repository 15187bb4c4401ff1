"""Closed-form text classification: multinomial Naive Bayes over the
engine-wide token convention.

This is the quality/domain classifier tier of a training-data pipeline
(the fastText/CCNet recipe: train a cheap linear classifier on a labeled
seed, score the whole corpus, keep a band) rebuilt as pure DataFrame
aggregations. Naive Bayes is chosen deliberately: its "training" is
nothing but smoothed count ratios, so the entire train-then-score path is
one deterministic dataflow that DuckDB can recompute value-for-value —
no iterative optimizer, no RNG, no MLlib dependency.

Reference analog: the reference scores documents with hand-weighted
keyword rules (gea_qa_agent.py:332-352); this is the learned version of
the same decision, trained on whatever labeled seed the caller supplies.

Everything is JVM expressions; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_parser_spark.operators.textstats import tokens_array


def nb_class_scores(df: DataFrame, train: DataFrame, label_col: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    alpha: float = 1.0) -> DataFrame:
    """Per-(document, class) multinomial-NB log scores.

    score(d, c) = ln(N_c / N) + sum over d's terms of
                      tf * (ln(cnt(c, t) + alpha) - ln(T_c + alpha * V))

    with N_c/N the class doc-count prior, cnt(c, t) the training count of
    term t in class c, T_c the class's total training tokens and V the
    training vocabulary size (shared across classes, standard add-alpha
    smoothing — terms unseen in a class, or in training entirely,
    contribute the alpha floor). Returns (id, label, logscore) with
    logscore rounded to 6 places; token-free documents carry prior-only
    scores, so every document gets a row per class.

    Scale shape: both token streams collapse to per-key counts in their
    first groupBy (map-side combine); the per-doc tf relation is
    multiplied only by the class list (C rows, broadcast), and the
    (label, term) count join is key-partitioned on the term pair — the
    vocabulary is corpus-scale, never broadcast. Priors, totals and V are
    one tiny broadcast each. No Python.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = float(alpha)
    lbl = F.col(label_col).alias("label")

    train_toks = train.select(
        lbl, F.explode(tokens_array(F.col(text_col))).alias("term"))
    ctc = train_toks.groupBy("label", "term").agg(F.count("*").alias("c"))
    tot = ctc.groupBy("label").agg(F.sum("c").alias("t_c"))
    # class list + priors from DOC counts (a class can exist with zero
    # tokens; it still has a prior)
    n_train = train.count()
    cls = (train.groupBy(lbl).agg(F.count("*").alias("n_docs"))
           .join(tot, "label", "left")
           .select("label",
                   F.log(F.col("n_docs").cast("double")
                         / F.lit(float(n_train))).alias("prior"),
                   F.coalesce("t_c", F.lit(0)).cast("double").alias("t_c")))
    vocab = train_toks.agg(
        F.countDistinct("term").cast("double").alias("v"))

    tf = (df.select(F.col(id_col).alias("id"),
                    F.explode(tokens_array(F.col(text_col))).alias("term"))
          .groupBy("id", "term").agg(F.count("*").alias("tf")))
    contrib = (tf.crossJoin(F.broadcast(cls.select("label", "t_c")))
               .join(ctc, ["label", "term"], "left")
               .crossJoin(F.broadcast(vocab))
               .groupBy("id", "label")
               .agg(F.sum(F.col("tf")
                          * (F.log(F.coalesce(F.col("c"), F.lit(0)) + a)
                             - F.log(F.col("t_c") + a * F.col("v"))))
                    .alias("evidence")))
    base = df.select(F.col(id_col).alias("id")) \
             .crossJoin(F.broadcast(cls.select("label", "prior")))
    return (base.join(contrib, ["id", "label"], "left")
            .select("id", "label",
                    F.round(F.col("prior")
                            + F.coalesce("evidence", F.lit(0.0)), 6)
                     .alias("logscore")))


def nb_classify(df: DataFrame, train: DataFrame, label_col: str,
                id_col: str = "doc_id", text_col: str = "text",
                alpha: float = 1.0) -> DataFrame:
    """Argmax-class prediction: (id, predicted, logscore).

    Deterministic ties: (logscore DESC, label ASC). The argmax is one
    per-document window over C rows — C is the class count, a small
    constant, so the window never sees corpus-scale partitions.
    """
    scores = nb_class_scores(df, train, label_col, id_col, text_col, alpha)
    w = Window.partitionBy("id").orderBy(F.desc("logscore"),
                                         F.asc("label"))
    return (scores.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("id").alias(id_col),
                    F.col("label").alias("predicted"), "logscore"))
