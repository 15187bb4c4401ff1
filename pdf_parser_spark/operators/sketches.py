"""Mergeable frequency sketches: two-pass EXACT heavy hitters.

The naive exact top-k over a 100 TB token stream shuffles the full
vocabulary (billions of distinct keys) into a groupBy. The classical
alternative (Misra-Gries summaries, which are mergeable in the sense of
Agarwal et al., "Mergeable Summaries", PODS 2012) bounds memory and
shuffle instead:

- pass 1: each partition folds its stream into a ``capacity``-entry
  Misra-Gries summary (vectorized per Arrow batch: batch histogram via
  pandas value_counts, then the standard merge — sum counts, subtract
  the (capacity+1)-th largest, keep positives). Any item with GLOBAL
  frequency > n/(capacity+1) must survive in at least one partition's
  summary (pigeonhole over the per-partition bounds), so the union of
  summaries — at most partitions x capacity tiny rows — is a guaranteed
  candidate superset of every true heavy hitter.
- pass 2: exact counts for candidates only (broadcast semi-join +
  map-side-combined groupBy over a key set of bounded size), exact
  top-k with deterministic (count DESC, value ASC) ties.

Result: EXACT answers (pass 2 recounts), sketch-bounded cost (pass 1
never materializes the vocabulary), fully recomputable by the DuckDB
oracle (which just runs the naive top-k — the sketches change cost, not
answers, provided k's winners clear the n/(capacity+1) guarantee
threshold; ``heavy_hitters_exact`` raises if they might not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, capacity: int) -> dict:
    """Merge a batch histogram into a Misra-Gries summary of at most
    ``capacity`` entries (sum, subtract (capacity+1)-th largest, keep
    positive) — the mergeable-summaries construction."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > capacity:
        vals = sorted(counters.values(), reverse=True)
        cut = vals[capacity]          # (capacity+1)-th largest
        counters = {v: c - cut for v, c in counters.items() if c > cut}
    return counters


def mg_candidates(values: DataFrame, value_col: str,
                  capacity: int = 256) -> DataFrame:
    """Pass 1: (value, weight_lower_bound) per partition summary entry.
    At most ``capacity`` rows per partition, regardless of stream size."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[value_col].dropna().value_counts()
            counters = _mg_merge(counters, vc.to_dict(), capacity)
        yield pd.DataFrame({"value": list(counters.keys()),
                            "weight_lb": list(counters.values())})

    return (values.select(F.col(value_col).cast("string").alias(value_col))
            .mapInPandas(summarize, "value string, weight_lb long"))


def heavy_hitters_exact(values: DataFrame, value_col: str, k: int = 20,
                        capacity: int = 256,
                        check_guarantee: bool = True) -> DataFrame:
    """EXACT top-k by frequency without a full-vocabulary shuffle.

    Returns (value, n, rank) — exact counts, rank by (n DESC, value ASC).
    ``check_guarantee`` (driver-side, two tiny actions) verifies that the
    k-th winner's exact count clears the sketch's miss threshold
    n_total/(capacity+1) — i.e. no non-candidate can beat it — and
    raises otherwise (raise ``capacity``). Disable only when the
    distribution is known to be skewed enough.
    """
    from pyspark.sql.window import Window

    cand = (mg_candidates(values, value_col, capacity)
            .groupBy("value").agg(F.sum("weight_lb").alias("wlb")))
    vals = values.where(F.col(value_col).isNotNull()) \
        .select(F.col(value_col).cast("string").alias("value"))
    # candidates are <= partitions x capacity rows — always broadcastable
    exact = (vals.join(F.broadcast(cand.select("value")), "value",
                       "leftsemi")
             .groupBy("value").agg(F.count("*").alias("n")))
    w = Window.orderBy(F.desc("n"), F.asc("value"))
    top = (exact.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k))
    if check_guarantee:
        rows = top.collect()
        agg = exact.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("s")) \
            .collect()[0].s
        n_total = values.where(F.col(value_col).isNotNull()).count()
        if int(agg) != n_total:
            # some stream values were evicted from every summary; the
            # result is exact ONLY if no evicted value could enter the
            # top-k: need k full ranks whose k-th count clears the
            # sketch's miss threshold (ties included)
            kth = min((r.n for r in rows), default=0)
            if len(rows) < k or kth <= n_total / (capacity + 1):
                raise ValueError(
                    f"top-{k} guarantee not met: candidate counts cover "
                    f"{agg}/{n_total} values and k-th count {kth} <= "
                    f"n/(capacity+1) = {n_total / (capacity + 1):.1f}; "
                    f"raise capacity (= {capacity})")
        return values.sparkSession.createDataFrame(
            rows, "value string, n long, rank int")
    return top
