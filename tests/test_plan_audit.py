"""Unit tests for tools/plan_audit.py's BNLJ scalar classifier —
synthetic plan strings, no SparkSession needed."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(__file__), "..", "tools", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_audit)
classify_bnlj = plan_audit.classify_bnlj


SCALAR_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- Project [a#1, total#2L]
   +- BroadcastNestedLoopJoin BuildRight, Inner
      :- FileScan parquet [a#1]
      +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
         +- HashAggregate(keys=[], functions=[sum(x#3L)], output=[total#2L])
            +- FileScan parquet [x#3L]
"""


UNBOUNDED_PLAN = """\
AdaptiveSparkPlan isFinalPlan=false
+- Project [a#1, b#2]
   +- BroadcastNestedLoopJoin BuildRight, Inner, (a#1 < b#2)
      :- FileScan parquet [a#1]
      +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
         +- FileScan parquet [b#2]
"""


LITERAL_PLAN = """\
+- BroadcastNestedLoopJoin BuildLeft, Inner
   :- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
   :  +- Generate explode([0.25,0.5,0.75]), false, [q#1]
   :     +- Project
   :        +- Range (0, 1, step=1, splits=8)
   +- Window [count(1) windowspecdefinition()]
      +- FileScan parquet [v#2]
"""


# the kmv shape: an outer join whose build side is a Project over an
# inner join of two zero-key aggregates (1 x 1 = 1 row)
NESTED_SCALAR_PLAN = """\
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- HashAggregate(keys=[h#1L], functions=[max(x#2)], output=[h#1L, m#3])
   :  +- FileScan parquet [h#1L,x#2]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- Project [least(ta#4L, tb#5L) AS theta#6L]
         +- BroadcastNestedLoopJoin BuildRight, Cross
            :- Project [kth#7L AS ta#4L]
            :  +- Filter (n#8L > 0)
            :     +- HashAggregate(keys=[], functions=[count(1), max(h#9L)], output=[n#8L, kth#7L])
            :        +- FileScan parquet [h#9L]
            +- BroadcastExchange IdentityBroadcastMode, [plan_id=1]
               +- Project [kth#10L AS tb#5L]
                  +- Filter (n#11L > 0)
                     +- HashAggregate(keys=[], functions=[count(1), max(h#12L)], output=[n#11L, kth#10L])
                        +- FileScan parquet [h#12L]
"""


def test_scalar_global_aggregate_broadcast():
    assert classify_bnlj(SCALAR_PLAN) == (1, 0)


def test_unbounded_broadcast_flagged():
    assert classify_bnlj(UNBOUNDED_PLAN) == (0, 1)


def test_literal_generator_broadcast():
    assert classify_bnlj(LITERAL_PLAN) == (1, 0)


def test_nested_scalar_joins_both_pass():
    # inner (two zero-key aggs) and outer (scalar build via the inner)
    assert classify_bnlj(NESTED_SCALAR_PLAN) == (2, 0)


def test_no_bnlj_is_clean():
    assert classify_bnlj("+- FileScan parquet [a#1]") == (0, 0)
