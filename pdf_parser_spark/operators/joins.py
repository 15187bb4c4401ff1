"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame operators
(the task brief's preferred route for missing operators) with the
100 TB shape as the design driver:

- ``asof_join``: for every left row, the most recent right row at or
  before its timestamp (the trades/quotes classic). NOT a non-equi join
  (Spark would plan a broadcast-nested-loop or a sort-merge over an
  inequality — both explode at scale): both sides UNION into one stream,
  ONE key-partitioned window sorts it by (ts, side), and
  ``last(value, ignorenulls=True)`` carries the newest right value
  forward onto each left row. One shuffle on the join key, linear work,
  no cross product — the streaming-merge formulation of as-of.
- ``range_join_binned``: points joined to enclosing [start, end]
  intervals. The naive BETWEEN join is a cross product per key; binning
  makes it an EQUI join: each interval explodes to the fixed-width time
  bins it covers, each point maps to its single bin, the join key is
  (key, bin) and the exact BETWEEN predicate filters within the bucket.
  Fan-out is bounded by interval_length/bin_size (choose bin_size near
  the typical interval length); a point matches an interval in exactly
  one bin (its own), so no post-join dedup is needed.

DuckDB cross-checks both: its native ASOF JOIN for the former, a plain
BETWEEN join for the latter (affordable at oracle scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str, value_cols: list[str],
              suffix: str = "_asof") -> DataFrame:
    """Left rows + the latest right ``value_cols`` with right.ts <=
    left.ts (inclusive), per ``key_cols``; NULL where no right row
    precedes. Right should hold one row per (key, ts) — pre-aggregate if
    not, or the carried value is the (ts, insertion)-latest and ties are
    not deterministic.
    """
    lhs = left.withColumn("__side", F.lit(1))
    # a NULL-ts right row can never satisfy "at or before" (ASOF's
    # predicate is never true for NULL), but Spark's asc ordering is
    # NULLS FIRST and would carry its value onto every early left row —
    # drop such rows. (A NULL-ts LEFT row correctly gets NULL: it sorts
    # before every remaining right row, so last() sees nothing.)
    rhs = right.where(F.col(ts_col).isNotNull()).select(
        *key_cols, ts_col,
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols]) \
        .withColumn("__side", F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same timestamp, so an
    # equal-ts right row is visible to the left row (inclusive as-of,
    # matching DuckDB's ASOF JOIN >= semantics)
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}",
            F.last(F.col(f"__rv_{v}"), ignorenulls=True).over(w))
    return (out.where(F.col("__side") == 1)
            .drop("__side", *[f"__rv_{v}" for v in value_cols]))


def range_join_binned(points: DataFrame, intervals: DataFrame,
                      key_cols: list[str], ts_col: str,
                      start_col: str, end_col: str,
                      bin_size_sec: int = 300) -> DataFrame:
    """(point row + its enclosing interval's columns) for every point
    whose ts lies in [start, end] of an interval with matching keys.
    Points inside several overlapping intervals emit one row per
    enclosing interval.
    """
    ts_s = F.unix_timestamp(F.col(ts_col))
    start_s = F.unix_timestamp(F.col(start_col))
    end_s = F.unix_timestamp(F.col(end_col))
    # binning truncates to whole seconds, which is SAFE for candidate
    # generation (ts in [start, end] implies floor(ts) in
    # [floor(start), floor(end)]) but NOT for the exact predicate — the
    # final filter compares the full-precision timestamps themselves
    # (a unix_timestamp comparison would admit points up to ~1 s outside
    # a sub-second interval boundary)
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(start_s / bin_size_sec).cast("long"),
            F.floor(end_s / bin_size_sec).cast("long"))))
    pt = points.withColumn("__bin",
                           F.floor(ts_s / bin_size_sec).cast("long"))
    joined = pt.join(iv, [*key_cols, "__bin"])
    return (joined.where(F.col(ts_col).between(F.col(start_col),
                                               F.col(end_col)))
            .drop("__bin"))


def salted_join(big: DataFrame, small: DataFrame, key: str, *,
                n_salts: int = 16, how: str = "inner",
                salt_col: str = "__salt") -> DataFrame:
    """Skew-safe equi-join: the classic manual salting the north rule
    names ("salted repartition for skewed long conversations"), for when
    AQE's skew-join split can't help — e.g. the skewed side feeds a
    downstream aggregation that pins partitioning, or the planner can't
    see the skew (post-UDF stats).

    The BIG side gets a deterministic per-row salt in [0, n_salts); the
    SMALL side is replicated n_salts times (explode of a literal range —
    its rows multiply by n_salts, which is why this wants a small-but-
    not-broadcastable right side). The join key becomes (key, salt), so
    one hot key's rows spread over n_salts shuffle partitions instead of
    one straggler task. Row-for-row equal to the plain join (each big
    row meets exactly the one replica carrying its salt) — pinned by
    test_salted_join_equals_plain_join. The salt is md5-deterministic
    (row content, not RNG), so retries and resumes reproduce the plan.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # only join modes where an unmatched SMALL-side row never surfaces:
    # the small side is replicated n_salts times, so right/full outer
    # would emit n_salts duplicates per unmatched small row, silently
    # breaking the "row-for-row equal to the plain join" contract
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if str(how).lower().replace("_", "") not in {
            a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: "
            f"replicating the small side makes right/full-outer emit "
            f"{n_salts} copies of each unmatched small-side row")
    # salt on the FULL row content, not the key: hashing the key alone
    # would send a hot key's rows all to one salt (no spread at all);
    # monotonically_increasing_id would spread but isn't retry-stable
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns],
                             F.lit("salted-join")),
                  F.lit(n_salts)).cast("int")
    b = big.withColumn(salt_col, salt)
    s = (small.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
                  .alias(salt_col))
         .withColumn(salt_col, F.col(salt_col).cast("int")))
    return b.join(s, [key, salt_col], how).drop(salt_col)
