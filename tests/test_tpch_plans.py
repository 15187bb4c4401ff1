"""Plan hygiene for the round-4 decorrelation pack + RAG context entry:
the decorrelations must not smuggle in a corpus-sized single-task
structure, the broadcasts must actually broadcast, and the top-k entries
must TakeOrderedAndProject rather than globally sort."""

from __future__ import annotations

import pytest

from pdf_parser_spark.plancheck import unpartitioned_corpus_windows
from pdf_parser_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

DECORRELATED = [
    "q2_min_cost_supplier",      # window min: PARTITIONED by l_partkey
    "q11_important_parts",       # global scalar: one-row broadcast join
    "q15_top_supplier",          # global max window: post-Aggregate rows
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    "q4_late_shipment_orders",
    "q13_customer_order_histogram",
    "q17_small_quantity_revenue",
    "rag_context_topk",          # windows run post-limit(5)
]


@pytest.mark.parametrize("name", DECORRELATED)
def test_no_corpus_sized_single_task_structure(spark, name):
    df = QUERIES[name](spark, SF)
    assert unpartitioned_corpus_windows(df) == []


def test_q19_joins_by_hash_with_broadcast(spark):
    """The OR-of-ANDs must ride an equi hash join (broadcast here), never
    degenerate to a nested-loop cross product."""
    plan = QUERIES["q19_disjunctive_revenue"](spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_semi_join_keeps_inequality_residual(spark):
    plan = QUERIES["q4_late_shipment_orders"](spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_topk_is_take_ordered(spark):
    """ORDER BY + LIMIT 20 must plan as TakeOrderedAndProject (per-
    partition heaps + one merge), not a global sort of all suppliers."""
    plan = QUERIES["q21_sole_late_supplier"](spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q17_semi_joins_before_per_part_aggregate(spark):
    """Both decorrelation branches must pre-filter lineitem by the
    broadcast Brand#23 part set BEFORE the per-part AVG (round-4 verdict
    nit #2: aggregating the full table first wasted ~25x the work) —
    the optimized plan carries two broadcast LeftSemi joins, and the
    Aggregate computing the threshold sits ABOVE one of them."""
    df = QUERIES["q17_small_quantity_revenue"](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("LeftSemi") == 2
    # the threshold aggregate must consume a semi-joined relation: in
    # the optimized tree the Aggregate over __thresh appears, and a
    # LeftSemi join appears BELOW it (greater indentation, later line)
    lines = opt.splitlines()
    agg_i = next(i for i, l in enumerate(lines) if "__thresh" in l
                 and "Aggregate" in l)
    assert any("LeftSemi" in l for l in lines[agg_i + 1:]), \
        "threshold aggregate is not fed by the semi-joined lineitem"
