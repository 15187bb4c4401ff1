"""Data layout for scan pruning: Z-order (Morton) clustering.

Parquet scans skip row groups / files whose min-max stats exclude the
predicate. Sorting by one column makes its stats tight but leaves every
other column's ranges full-width; interleaving the bits of several
columns' rank codes (the Morton / Z-order curve — Delta's OPTIMIZE
ZORDER, Iceberg's sort-order zorder) makes ALL participating columns'
per-file ranges narrow simultaneously, so multi-dimensional point/range
predicates prune most files no matter which column they hit.

Implementation is pure JVM expressions: each column is rank-coded to
``bits`` levels via percentile bounds (collected once — 2^bits - 1
doubles per column, the k-centroid kind of collect), the codes' bits
are interleaved arithmetically, and the rows are cut into ``n_files``
files at EXACT rank cuts of the z-value (from an exact z histogram —
z's cardinality is bounded by construction) — not via
``repartitionByRange``'s reservoir sampling, whose bounds drift with
session state (input split sizes, AQE coalescing) and made the footer-
stats gate flaky, nor via a percentile sketch, whose merge order
follows partition layout at scale. The file id is deterministic given
(data, bits, n_files) alone, so the written layout — and the measured
pruning — is reproducible run to run at any input size. Effectiveness is MEASURED, not assumed: tests
read the written parquet footers and assert the per-file min-max widths
shrink vs the unsorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_code(col: Column, bounds: list[float]) -> Column:
    """0..len(bounds) level index: how many bounds the value exceeds —
    a branchless rank against broadcast percentile literals (NULLs
    rank 0, keeping them clustered rather than scattered)."""
    c = col.cast("double")
    code = F.lit(0)
    for b in bounds:
        code = code + F.when(c > F.lit(float(b)), 1).otherwise(0)
    return code


def zorder_value(codes: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each rank code (MSB-first across
    columns) into one long — the Morton index. Accumulates in a LONG:
    ``bits * len(codes)`` is the index width, validated <= 63 so the
    shift chain can never overflow into the sign bit and scramble the
    curve order."""
    if bits * len(codes) > 63:
        raise ValueError(
            f"z-value needs bits*len(cols) <= 63 bits of long, got "
            f"{bits} * {len(codes)} = {bits * len(codes)}; lower bits "
            f"or z-order fewer columns")
    z = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        for code in codes:
            z = F.shiftleft(z, 1) + F.shiftright(code, level).bitwiseAND(1)
    return z


def _partition_remap(df: DataFrame, n_parts: int) -> dict[int, int]:
    """int values v_0..v_{n-1} with pmod(murmur3(v_i), n_parts) == i.

    ``repartition(n, col)`` places a row in partition
    pmod(hash(col), n); remapping file id i to v_i pins file i to
    partition i EXACTLY — no sampling, no collisions, no empty files.
    One tiny probe job (F.hash IS the partitioner's Murmur3, same seed);
    the probe range grows until every partition has a representative
    (coupon-collector: a few·n rows almost always suffice).
    """
    spark = df.sparkSession
    remap: dict[int, int] = {}
    lo, step = 0, max(64, 8 * n_parts)
    while len(remap) < n_parts:
        probe = (spark.range(lo, lo + step)
                 .select(F.col("id").cast("int").alias("v"),
                         F.pmod(F.hash(F.col("id").cast("int")),
                                F.lit(n_parts)).alias("p")))
        for r in probe.groupBy("p").agg(F.min("v").alias("v")).collect():
            remap.setdefault(int(r.p), int(r.v))
        lo += step
        if lo > 1_000_000:   # pragma: no cover — pmod(hash) is uniform
            raise RuntimeError(f"could not find {n_parts} hash "
                               f"representatives in 1e6 probes")
    return remap


def zorder_layout(df: DataFrame, cols: list[str], *, bits: int = 4,
                  n_files: int = 8) -> DataFrame:
    """Return ``df`` redistributed and sorted along the Z-curve of
    ``cols`` — write the result with a plain ``.write.parquet`` and the
    footer stats do the pruning.

    Two aggregation passes (per-column percentile bounds, then an EXACT
    z-value histogram — z has <= 2^(bits*cols) distinct values by
    construction, so the full distribution collects exactly) and ONE
    shuffle: file id = rank of z against exact rank cuts, hash-remapped
    so ``repartition(n_files, ...)`` lands file i in partition i
    deterministically, then a local sort on z. 2^bits levels per
    column: 16 levels (bits=4) is plenty to separate n_files in the low
    hundreds — deeper bits only matter when file counts approach
    2^(bits*len(cols)).
    """
    if not cols or bits < 1 or n_files < 1:
        raise ValueError(f"need cols, bits>=1, n_files>=1; got "
                         f"{cols}, {bits}, {n_files}")
    # numeric/temporal only: a string column silently casts to NULL,
    # every row ranks 0, and the "clustered" layout is a no-op that
    # still costs a shuffle — fail loudly instead
    numeric = ("int", "bigint", "smallint", "tinyint", "float", "double",
               "date", "timestamp", "timestamp_ntz")
    dtypes = dict(df.dtypes)
    bad = [c for c in cols
           if not dtypes.get(c, "?").startswith(numeric)
           and not dtypes.get(c, "?").startswith("decimal")]
    if bad:
        raise ValueError(
            f"zorder columns must be numeric/temporal, got "
            f"{[(c, dtypes.get(c)) for c in bad]}; hash or dictionary-"
            f"encode strings first (locality is meaningless on a hash)")
    # single source of truth for the 63-bit width bound lives in
    # zorder_value; probe it with dummy codes BEFORE paying the
    # percentile aggregation job
    zorder_value([F.lit(0)] * len(cols), bits)
    qs = [i / (1 << bits) for i in range(1, 1 << bits)]
    row = df.agg(*[F.percentile_approx(F.col(c).cast("double"),
                                       qs, 10_000).alias(c)
                   for c in cols]).collect()[0]
    null_cols = [c for c in cols if row[c] is None]
    if null_cols:
        raise ValueError(
            f"zorder columns {null_cols} are entirely NULL (or the "
            f"input is empty): no percentile bounds exist to cluster on")
    codes = [_rank_code(F.col(c), [float(x) for x in row[c]])
             for c in cols]
    z = zorder_value(codes, bits)

    # EXACT z-value file cuts: z takes at most 2^(bits*len(cols))
    # distinct values BY CONSTRUCTION, so one map-side-combined groupBy
    # collects the full distribution exactly (<= 2^20 rows at the
    # validated widths below) and the cuts are a pure function of the
    # data — no sketch, no merge-order dependence at ANY scale. (The
    # first rendition used percentile_approx over z; its QuantileSummaries
    # compress on large inputs and the merge order follows partition
    # layout, so the "deterministic given the data" claim would have
    # silently broken exactly where it matters — r4 review finding. The
    # per-COLUMN bounds above stay approximate: their drift moves
    # clustering quality/load only, never the output rows, and exact
    # per-column quantiles over unbounded-cardinality doubles have no
    # bounded-state form.)
    with_z = df.withColumn("__z", z)
    fid_expr = F.lit(0)
    if n_files > 1:
        if bits * len(cols) > 20:
            raise ValueError(
                f"bits*len(cols) = {bits * len(cols)} > 20: the exact "
                f"z-histogram would exceed 2^20 cells; lower bits — 16 "
                f"levels/column separates file counts into the hundreds")
        hist = sorted(
            (int(r["__z"]), int(r["n"])) for r in
            with_z.groupBy("__z").agg(F.count("*").alias("n")).collect())
        total = sum(n for _, n in hist)
        zcuts, cum, want = [], 0, 1
        for zv, n in hist:
            cum += n
            # cut AFTER the z value that first reaches rank want*total/n:
            # rows of one z value never split across files (they are
            # equal on the curve), matching _rank_code's strict >
            while want < n_files and cum * n_files >= want * total:
                zcuts.append(float(zv))
                want += 1
        fid_expr = _rank_code(F.col("__z"), zcuts)
    remap = _partition_remap(df, n_files)
    pmap = F.create_map(*[F.lit(x) for kv in sorted(remap.items())
                          for x in kv])
    return (with_z
            .withColumn("__p", F.element_at(pmap, fid_expr.cast("int")))
            .repartition(n_files, "__p")
            .sortWithinPartitions("__z")
            .drop("__z", "__p"))
