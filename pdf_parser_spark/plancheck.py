"""Physical/logical plan assertions for scale hygiene.

The one structural property the 100 TB brief keeps coming back to:
no corpus-sized data may flow through a single task. In Catalyst terms,
an unpartitioned Window (``Window.orderBy(...)`` with no partitionBy)
forces an ``Exchange SinglePartition`` of its whole input. That is fine
over an aggregated handful of rows (the offsets tables the prefix-sum
decompositions build are <= tens of thousands of rows by construction)
and catastrophic over the corpus itself.

``unpartitioned_corpus_windows`` walks the optimized logical plan and
returns every unpartitioned Window node whose subtree does NOT contain
an Aggregate — i.e. every global window that sorts raw (non-collapsed)
data on one task. Tests assert the list is empty for operators that
claim the decomposed shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _children(jnode):
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.size())]


def _iter_nodes(jnode):
    stack = [jnode]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _subtree_has_aggregate(jnode) -> bool:
    return any(n.nodeName() == "Aggregate" for n in _iter_nodes(jnode))


def unpartitioned_corpus_windows(df: DataFrame) -> list[str]:
    """Unpartitioned Window nodes over un-aggregated (corpus-sized) input.

    Returns one ``simpleString`` per offending node; empty list = the
    plan has no single-task global sort of raw data. Windows above an
    Aggregate (offsets tables, per-group count rollups) are exempt: an
    aggregation bounds their input to its group count.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for node in _iter_nodes(plan):
        if node.nodeName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        if _subtree_has_aggregate(node):
            continue
        bad.append(node.simpleString(100))
    return bad
