"""Link-graph analytics over the corpus's URL citations.

Web-scale curation weighs documents by the authority of what they cite
(and domains by who cites them) — the classic bipartite HITS recursion
(Kleinberg 1999) over the (document, domain) link relation that
``textstats.url_domains`` already produces. Like the engine's other
iterative op (``dedup.connected_components``), each iteration is plain
joins + map-side-combined aggregations; unlike label propagation, HITS
converges in a FIXED number of rounds chosen by the caller, so the whole
computation is one deterministic dataflow an unrolled SQL oracle can
recompute value-for-value.

Everything is JVM expressions; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_bipartite(edges: DataFrame, src_col: str = "id",
                   dst_col: str = "domain", iters: int = 2) -> DataFrame:
    """Authority scores after ``iters`` full HITS rounds.

    One round: authority(d) = sum of hub(s) over in-links, then
    L1-normalize; hub(s) = sum of authority(d) over out-links, then
    L1-normalize. Hubs start uniform at 1.0; duplicate links count once
    (edges are distinct-ed). Returns (dst_col, authority) — the
    authority of the FINAL round, L1-normalized, rounded to 6 places.

    Scale shape: the edge list is the only corpus-sized relation; it is
    persisted once (fixed-width after the distinct) and owned by the
    result (release via ``dedup.release_owned_storage``). Every
    iteration is two key-partitioned joins (on src, on dst) feeding
    map-side-combined sums; normalizers are 1-row broadcasts. Score
    relations stay node-sized. Lineage grows linearly in ``iters`` —
    for deep recursions localCheckpoint per round (the
    connected_components pattern) caps it; at the 2-4 rounds HITS needs
    in practice the plain DAG is cheaper.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from pyspark import StorageLevel

    from pdf_parser_spark.operators.dedup import _own

    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    hub = e.select("src").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for _ in range(iters):
        a = e.join(hub, "src").groupBy("dst").agg(F.sum("h").alias("a"))
        asum = a.agg(F.sum("a").alias("s"))
        auth = (a.crossJoin(F.broadcast(asum))
                .select("dst", (F.col("a") / F.col("s")).alias("a")))
        h = e.join(auth, "dst").groupBy("src").agg(F.sum("a").alias("h"))
        hsum = h.agg(F.sum("h").alias("s"))
        hub = (h.crossJoin(F.broadcast(hsum))
               .select("src", (F.col("h") / F.col("s")).alias("h")))
    return _own(auth.select(F.col("dst").alias(dst_col),
                            F.round("a", 6).alias("authority")),
                e)


def top_authorities(edges: DataFrame, k: int = 20, *,
                    src_col: str = "id", dst_col: str = "domain",
                    iters: int = 2) -> DataFrame:
    """Top-k (dst, authority, rank) under (authority DESC, dst ASC) —
    the rounded score orders ties identically on both engine and oracle.
    Sort+limit compiles to TakeOrderedAndProject; the rank window runs
    over k rows only."""
    from pyspark.sql.window import Window

    from pdf_parser_spark.operators.dedup import _own

    scores = hits_bipartite(edges, src_col, dst_col, iters)
    order = [F.desc("authority"), F.asc(dst_col)]
    topk = scores.orderBy(*order).limit(k)
    return _own(topk.withColumn("rank",
                                F.row_number().over(Window.orderBy(*order))
                                 .cast("int")),
                *scores.owned_storage)


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """PageRank after a fixed number of power iterations, with proper
    dangling-node handling — the directed-graph complement to
    :func:`hits_bipartite` (same node kind on both sides, damping (the
    teleport) instead of per-round normalization).

    One iteration:  r'(v) = (1 - d) / N + d * (sum over in-links of
    r(u) / outdeg(u)  +  dangling_mass / N), where dangling_mass is the
    total rank parked on nodes with no out-links — dropping it (the
    common shortcut) leaks rank mass every round and the scores stop
    summing to 1. Duplicate edges count once; ranks start uniform 1/N.
    Returns (node, rank_score) rounded to 6 places, one row per node of
    the graph (union of sources and destinations).

    Scale shape: the distinct edge list (persisted once, owned by the
    result) joins the node-sized rank relation on src — key-partitioned
    — then one map-side-combined sum per iteration; outdegree is
    computed once; N and the dangling mass are 1-row broadcasts per
    round. Lineage grows linearly in ``iters`` (same note as HITS).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    from pyspark import StorageLevel

    from pdf_parser_spark.operators.dedup import _own

    d = float(damping)
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                    .join(outdeg, "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("r") / F.col("deg")).alias("c")))
        dangling = (ranks.join(outdeg,
                               ranks["node"] == outdeg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")))
        ranks = (nodes.join(contribs, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit((1.0 - d) / n)
                          + d * (F.coalesce(F.col("c"), F.lit(0.0))
                                 + F.col("dm") / n)).alias("r")))
    return _own(ranks.select("node", F.round("r", 6).alias("rank_score")),
                e, nodes)
