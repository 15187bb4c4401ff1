"""Physical/logical plan assertions for scale hygiene.

The one structural property the 100 TB brief keeps coming back to:
no corpus-sized data may flow through a single task. In Catalyst terms,
an unpartitioned Window (``Window.orderBy(...)`` with no partitionBy)
forces an ``Exchange SinglePartition`` of its whole input. That is fine
over an aggregated handful of rows (the offsets tables the prefix-sum
decompositions build are <= tens of thousands of rows by construction)
and catastrophic over the corpus itself.

``unpartitioned_corpus_windows`` walks the optimized logical plan and
returns every unpartitioned Window node whose INPUT is not provably
row-bounded — i.e. every global window that sorts raw (non-collapsed)
data on one task. Bounded means every data path feeding the window
passes through an Aggregate / limit / literal relation: a join with
even one unbounded branch is unbounded (the round-4 review found the
earlier "an Aggregate anywhere in the subtree" test exempted exactly
the corpus-join-with-broadcast-offsets shape the decomposed operators
build — the one regression this guard exists to catch). Tests assert
the list is empty for operators that claim the decomposed shape.
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


# nodes that bound their OWN output row count regardless of input
_BOUNDING = ("Aggregate", "GlobalLimit", "LocalLimit", "LocalRelation",
             "OneRowRelation")

# A Range leaf (spark.range(n)) is generator metadata, not corpus data —
# its row count is a plan-time literal. It counts as bounded only up to
# a metadata-sized element count: the bucket/offset tables the
# decomposed operators build are <= 2^20-ish rows, while an adversarial
# range(10^12) through a global window would be exactly the single-task
# catastrophe this guard exists to catch, so it stays flagged.
_RANGE_BOUND = 1 << 24


def _range_bounded(jnode) -> bool:
    try:
        return int(str(jnode.numElements())) <= _RANGE_BOUND
    except Exception:  # unexpected node shape: stay conservative
        return False


def _bounded(jnode) -> bool:
    """True when every data path into this node passes through a
    row-bounding operator. Unary nodes inherit their child; a Join (or
    Union) is bounded only if ALL branches are — one corpus-sized branch
    makes the join output corpus-sized no matter how small the other
    side is. Leaves (relation scans) are unbounded by definition, with
    one exception: a small Range (see _RANGE_BOUND)."""
    name = jnode.nodeName()
    if name in _BOUNDING:
        return True
    if name == "Range":
        return _range_bounded(jnode)
    kids = _children(jnode)
    if not kids:
        return False
    return all(_bounded(k) for k in kids)


def unpartitioned_corpus_windows(df: DataFrame) -> list[str]:
    """Unpartitioned Window nodes over un-aggregated (corpus-sized) input.

    Returns one ``simpleString`` per offending node; empty list = the
    plan has no single-task global sort of raw data. A window is exempt
    only when its input is row-bounded along EVERY branch (offsets
    tables, per-group count rollups, post-limit rankings) — an Aggregate
    sitting on a broadcast side of a corpus join does NOT exempt the
    window over that join.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for node in _iter_nodes(plan):
        if node.nodeName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        if all(_bounded(k) for k in _children(node)):
            continue
        bad.append(node.simpleString(100))
    return bad
