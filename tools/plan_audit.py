"""Whole-surface physical-plan audit: the scale-killer gate.

Walks EVERY `__spark_entry__.queries()` entry at sf0.01, renders its
physical plan, and fails on the plan shapes that do not survive a 100x
scale-up, turning the per-family plan assertions (tests/test_tpch_plans,
tests/test_ann_index, the join-explosion pre-flight) into one sweeping
gate over the full query surface:

  - CartesianProduct        all-pairs blowup; never acceptable
  - BroadcastNestedLoopJoin the quiet cartesian (unequal-key join that
                            Spark salvages by broadcasting one side).
                            One shape is legitimate and PROVABLY bounded:
                            the scalar broadcast — a zero-key global
                            aggregate (exactly 1 row: a corpus total, a
                            threshold, a KMV theta; this is how Spark
                            executes every scalar subquery, e.g. TPC-H
                            Q11/Q22) or a constant literal generator
                            (e.g. the 4-element quantile probe array).
                            The audit verifies the bound STRUCTURALLY:
                            a BNLJ passes only if its broadcast subtree
                            is `HashAggregate(keys=[]...)` or a literal
                            explode/Range — anything else fails.
  - BatchEvalPython         row-at-a-time Python UDF in the hot path
                            (Arrow-batched MapInPandas /
                            FlatMapGroupsInPandas / ArrowEvalPython are
                            the sanctioned Python boundaries)

Also reports the Exchange (shuffle) count per query so round-over-round
shuffle regressions are visible in one diff.

Usage:
    python tools/plan_audit.py [sf_dir] [--out BENCH/plan_audit.json]

Exit 0 = no violations (waivered heads listed in the output); exit 1
otherwise.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# markers that prove a broadcast subtree is bounded independent of data
# scale: a zero-key (global) aggregate is exactly one row; a literal
# explode / one-row Range is a compile-time constant
_SCALAR_MARKS = ("HashAggregate(keys=[]", "explode([", "Range (0, 1,")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _indent(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*(":
        i += 1
    return i


# single-child operators that only reshape rows — walk through them to
# find the node that determines a subtree's cardinality bound
_PASS_THROUGH = (
    "Project",
    "Filter",
    "BroadcastExchange",
    "Exchange",
    "Sort",
    "AQEShuffleRead",
    "WholeStageCodegen",
    "InputAdapter",
    "ColumnarToRow",
    "Window",
    "CollectMetrics",
    "LocalLimit",
    "GlobalLimit",
    "Coalesce",
)


def _marker_col(line: str) -> int:
    """Column of this node's ':-'/'+-' tree marker (-1 for the root)."""
    best = -1
    for m in (":- ", "+- "):
        c = line.find(m)
        if c >= 0 and (best < 0 or c < best):
            best = c
    return best


def _node_name(line: str) -> str:
    c = _marker_col(line)
    return line[c + 3 :].lstrip("*( ") if c >= 0 else line.lstrip("*( ")


def _children(lines: list[str], idx: int, end: int) -> list[int]:
    c = _marker_col(lines[idx])
    want = c + 3 if c >= 0 else 0
    out = []
    for j in range(idx + 1, end):
        mc = _marker_col(lines[j])
        if mc < 0:
            continue
        if mc <= c:
            break
        if mc == want:
            out.append(j)
    return out


def _is_scalar_subtree(lines: list[str], idx: int, end: int) -> bool:
    """True iff the subtree rooted at lines[idx] provably produces a
    bounded-constant row count: walking through pass-through operators,
    its cardinality-determining node is a zero-key (global) aggregate
    or a literal generator."""
    for _ in range(12):  # bounded walk
        head = _node_name(lines[idx])
        if any(m in head for m in _SCALAR_MARKS):
            return True
        if head.startswith("BroadcastNestedLoopJoin"):
            # a nested-loop join of two scalar subtrees is itself
            # scalar (1 x 1 = 1 row) — e.g. assembling a parameter row
            # from two independent global aggregates
            kids = _children(lines, idx, end)
            return bool(kids) and all(
                _is_scalar_subtree(lines, k, end) for k in kids
            )
        if not head.startswith(_PASS_THROUGH):
            return False
        kids = _children(lines, idx, end)
        if len(kids) != 1:
            return False
        idx = kids[0]
    return False


def classify_bnlj(plan: str) -> tuple[int, int]:
    """(n_scalar, n_unbounded) BroadcastNestedLoopJoin sites.

    A site is scalar iff at least one DIRECT child subtree is provably
    a bounded-constant row set — a zero-key (global) aggregate or a
    literal generator, reached through pass-through operators
    (Project/Filter/Exchange/Sort/...). Joining a 1-row side multiplies
    the other side by exactly 1, so the join is shuffle-free constant
    work per row no matter which side Spark chose to broadcast. A
    ReusedExchange child counts only when it provably references a
    scalar-verified identity broadcast: matched by plan_id when the
    tree carries them, else only when EVERY IdentityBroadcastMode
    exchange in the plan is scalar-verified (so the reuse cannot point
    at an unbounded one)."""
    lines = plan.splitlines()
    scalar = unbounded = 0
    # inventory of identity-broadcast exchanges: plan_ids of the
    # scalar-verified ones, plus whether any non-scalar one exists
    scalar_ids: set[str] = set()
    has_scalar_identity = False
    identity_all_scalar = True
    for i in range(len(lines)):
        if (
            "BroadcastExchange IdentityBroadcastMode" in lines[i]
            and "ReusedExchange" not in lines[i]
        ):
            if _is_scalar_subtree(lines, i, len(lines)):
                has_scalar_identity = True
                m = re.search(r"plan_id=(\d+)", lines[i])
                if m:
                    scalar_ids.add(m.group(1))
            else:
                identity_all_scalar = False

    def _reuse_is_scalar(line: str) -> bool:
        if "ReusedExchange" not in line or "IdentityBroadcastMode" not in line:
            return False
        m = re.search(r"plan_id=(\d+)", line)
        if m and scalar_ids:
            return m.group(1) in scalar_ids
        return has_scalar_identity and identity_all_scalar

    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        depth = _indent(line)
        end = len(lines)
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and _indent(lines[j]) <= depth:
                end = j
                break
        kids = _children(lines, i, end)
        ok = any(_is_scalar_subtree(lines, k, end) for k in kids)
        if not ok:
            ok = any(_reuse_is_scalar(lines[k]) for k in kids)
        if ok:
            scalar += 1
        else:
            unbounded += 1
    return scalar, unbounded


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = "BENCH/plan_audit.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import __spark_entry__ as E
    from pathways2go_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="plan_audit")
    qs = E.queries()
    only = [a for a in sys.argv[2:] if not a.startswith("--") and a in qs]
    if only:
        qs = {k: qs[k] for k in only}
    report: dict[str, dict] = {}
    violations: list[str] = []
    for name, fn in sorted(qs.items()):
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as exc:  # a query that cannot even plan is a bug
            report[name] = {"error": str(exc)[:300]}
            violations.append(f"{name}: PLAN ERROR {str(exc)[:120]}")
            continue
        n_scalar, n_unbounded = classify_bnlj(plan)
        entry = {
            "exchanges": plan.count("Exchange"),
            "bnlj_scalar": n_scalar,
            "bnlj_unbounded": n_unbounded,
            "cartesian": plan.count("CartesianProduct"),
            "row_python_udf": plan.count("BatchEvalPython"),
        }
        report[name] = entry
        for marker in FORBIDDEN:
            if marker in plan:
                violations.append(f"{name}: {marker}")
        if n_unbounded:
            violations.append(
                f"{name}: BroadcastNestedLoopJoin with non-scalar "
                f"broadcast side (x{n_unbounded})"
            )

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "violations": violations,
        "scalar_bnlj_sites": sum(
            e.get("bnlj_scalar", 0) for e in report.values()
        ),
        "total_exchanges": sum(
            e.get("exchanges", 0) for e in report.values()
        ),
        "per_query": report,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    ok = not violations
    print(
        f"plan_audit: {len(qs)} queries, "
        f"{summary['total_exchanges']} exchanges, "
        f"{len(violations)} violations -> {out_path}"
    )
    for v in violations:
        print("  VIOLATION", v)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
