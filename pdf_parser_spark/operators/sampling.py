"""Deterministic sampling / split assignment for training-data pipelines.

A training corpus needs reproducible train/validation/test membership that
is (a) stable across runs and cluster sizes, (b) independent of row order
and partitioning, and (c) recomputable by any engine auditing the split.
Content/id hashing gives all three: bucket = md5-derived integer mod B,
split = first label whose cumulative weight covers the bucket.

Everything is JVM expressions (one md5 + conv + pmod per row — the same
portable construction the MinHash family uses, operators/dedup.py), so
split assignment rides whole-stage codegen and pushes through scans
unchanged at any scale. The DuckDB oracle recomputes it verbatim
(queries.py: DOCS_SPLIT_SQL).

The reference has no splitting machinery (its corpus is 5 documents); this
is part of the training-pipeline extension surface the task brief names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket(col: Column, salt: str = "split",
                buckets: int = SPLIT_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5(salt:value).

    Engine-portable: the first 15 md5 hex digits as an integer (< 2^60,
    overflow-free in any 64-bit engine) mod ``buckets``.
    """
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
                  F.lit(buckets)).cast("int")


def deterministic_split(df: DataFrame, id_col: str,
                        weights: list[tuple[str, float]] | None = None,
                        salt: str = "split") -> DataFrame:
    """Assign each row a stable split label by id hash.

    ``weights``: ordered (label, fraction) pairs summing to 1.0 (default
    90/5/5 train/val/test). A row's label depends only on (salt, id) — not
    on order, partitioning, or cluster size — so reruns, resumes, and
    engines all agree, and adding corpus data never reshuffles existing
    rows between splits (the hash-split property that makes eval sets
    stable as a crawl grows).
    """
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if not weights:
        raise ValueError("weights must be a non-empty list")
    total = sum(f for _, f in weights)
    if any(f <= 0 for _, f in weights) or abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must be positive and sum to 1.0, got "
            f"{weights} (sum {total}) — a silent shortfall would dump the "
            "remainder onto the last label and mis-size the eval split")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    for label, frac in weights[:-1]:
        cum += frac
        bound = int(round(cum * SPLIT_BUCKETS))
        branch = (F.when(bucket < bound, F.lit(label)) if expr is None
                  else expr.when(bucket < bound, F.lit(label)))
        expr = branch
    last_label = weights[-1][0]
    expr = (F.lit(last_label) if expr is None
            else expr.otherwise(F.lit(last_label)))
    return df.withColumn("split", expr)


def sample_fraction(df: DataFrame, id_col: str, fraction: float,
                    salt: str = "sample") -> DataFrame:
    """Deterministic ~fraction subsample by id hash (same row set every
    run; complement = the rows it excludes — disjoint by construction)."""
    bound = int(round(fraction * SPLIT_BUCKETS))
    return df.where(hash_bucket(F.col(id_col), salt) < bound)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "strat") -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible twin of
    ``DataFrame.sampleBy``): each stratum keeps ~its own fraction, chosen
    by the same id-hash bucket as every other sampler here — so the kept
    set is stable across runs/partitioning/engines, and rebalancing a
    skewed corpus (e.g. downsampling the dominant language) is one
    pushdown-friendly WHERE, no shuffle, no RNG state.

    Strata absent from ``fractions`` keep ``default_fraction``. Fractions
    must be in [0, 1]; membership for a row depends only on
    (salt, id, its stratum's fraction), so growing ``fractions`` never
    reshuffles rows of untouched strata.
    """
    for s, frac in {**fractions, "__default__": default_fraction}.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], "
                             f"got {frac}")
    bucket = hash_bucket(F.col(id_col), salt)
    bound = None
    for s, frac in sorted(fractions.items()):
        b = F.lit(int(round(frac * SPLIT_BUCKETS)))
        bound = (F.when(F.col(strata_col) == s, b) if bound is None
                 else bound.when(F.col(strata_col) == s, b))
    default_b = F.lit(int(round(default_fraction * SPLIT_BUCKETS)))
    bound = default_b if bound is None else bound.otherwise(default_b)
    return df.where(bucket < bound)


def leak_safe_split(df: DataFrame, pairs: DataFrame, *,
                    id_col: str = "doc_id",
                    weights: list[tuple[str, float]] | None = None,
                    salt: str = "split") -> DataFrame:
    """Train/val/test split keyed on the NEAR-DUP CLUSTER, not the row.

    A per-document hash split leaks through near-duplicates: two
    renditions of one article hash independently, one lands in train and
    one in test, and the eval set silently overlaps the training data
    (the duplication-driven contamination Lee et al. 2022 measure).
    Keying the split hash on each document's connected-component label
    puts every member of a cluster in the SAME split by construction;
    documents in no pair key on their own id, so on a dup-free corpus
    this degenerates to :func:`deterministic_split` exactly.

    Output: ``(id_col, component, split)`` — one row per input row. One
    key-partitioned left join against the (small) component labeling +
    the same codegen hash expression every sampler here uses; the
    labeling's checkpoint blocks ride along as ``owned_storage``.
    """
    from pdf_parser_spark.operators.dedup import _own, connected_components
    comps = connected_components(pairs)
    joined = df.select(F.col(id_col)) \
               .join(comps.withColumnRenamed("id", id_col), id_col, "left")
    comp = F.coalesce(F.col("component"), F.col(id_col).cast("string")) \
        if dict(joined.dtypes)["component"] == "string" \
        else F.coalesce(F.col("component"), F.col(id_col))
    keyed = joined.select(F.col(id_col), comp.alias("component"))
    out = deterministic_split(keyed, "component", weights, salt)
    return _own(out, *getattr(comps, "owned_storage", ()))
