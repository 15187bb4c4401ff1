"""Streaming heavy-hitter candidates: mergeable Misra-Gries summaries as
per-shard streaming state (``applyInPandasWithState``).

The batch tier's two-pass exact heavy hitters
(operators/sketches.heavy_hitters_exact) needs the full stream for its
recount pass; on an unbounded stream the right shape is the SKETCH tier
running continuously: values are sharded BY VALUE (consistent hashing,
so each distinct value's whole frequency lands in one shard's summary),
each shard folds every micro-batch into a capacity-bounded Misra-Gries
summary held in state, and every trigger emits the shard's refreshed
candidate set. The per-shard guarantee is the batch operator's, applied
per shard: any value with shard frequency > n_shard/(capacity+1) is in
the emitted summary — and since a value's shard frequency IS its global
frequency under value-sharding, the union of shard summaries is a
guaranteed candidate superset of every global heavy hitter. Downstream,
an exact recount over the candidate set (batch pass 2, or a filtered
streaming count) turns candidates into exact answers.

State is bounded by construction: capacity entries x n_shards,
regardless of stream length — no watermark needed (frequency summaries
never age out; use a windowed pre-aggregation upstream for
timed-decay semantics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

HH_OUT_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("value", StringType()),
    StructField("weight_lb", LongType()),    # MG lower bound, not a count
    StructField("n_seen", LongType()),       # shard stream length so far
])

HH_STATE_SCHEMA = StructType([
    StructField("vals", ArrayType(StringType())),
    StructField("cnts", ArrayType(LongType())),
    StructField("n", LongType()),
])


def make_hh_fn(capacity: int):
    from pdf_parser_spark.operators.sketches import _mg_merge

    def fn(key, pdfs, state: GroupState):
        (shard,) = key
        counters: dict = {}
        n = 0
        if state.exists:
            vals, cnts, n = state.get
            counters = dict(zip(vals, cnts))
        for pdf in pdfs:
            vc = pdf["value"].dropna().value_counts()
            n += int(vc.sum())
            counters = _mg_merge(counters, vc.to_dict(), capacity)
        state.update((list(counters.keys()),
                      [int(c) for c in counters.values()], int(n)))
        yield pd.DataFrame({
            "shard": int(shard),
            "value": list(counters.keys()),
            "weight_lb": [int(c) for c in counters.values()],
            "n_seen": int(n)})

    return fn


def stream_heavy_hitter_candidates(values: DataFrame, value_col: str,
                                   capacity: int = 256,
                                   n_shards: int = 8) -> DataFrame:
    """Streaming (shard, value, weight_lb, n_seen) candidate summaries,
    refreshed per trigger. ``values`` is a streaming DataFrame; rows with
    NULL values are ignored."""
    return (values
            .select(F.col(value_col).cast("string").alias("value"))
            .where(F.col("value").isNotNull())
            .withColumn("shard",
                        F.pmod(F.xxhash64(F.col("value")),
                               F.lit(n_shards)).cast("int"))
            .groupBy("shard")
            .applyInPandasWithState(
                make_hh_fn(capacity),
                outputStructType=HH_OUT_SCHEMA,
                stateStructType=HH_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
