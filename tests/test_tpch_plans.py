"""Physical-plan assertions for the TPC-H shape suite's scale claims:
the docstring promises (one fact scan, pushed hulls, cache reuse) are
contract, not commentary — these tests pin them against regressions."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, q):
    # formatted mode: cached branches render as InMemoryTableScan nodes
    # without re-printing the cached child's file scan, so counting
    # "lineitem.parquet" counts REAL scans (executedPlan().toString()
    # re-prints the cache's child plan and double-counts)
    df = E.queries()[q](spark, SF)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def test_top_supplier_single_fact_scan(spark):
    # Q15: the persisted pre-aggregate means the broadcast-max branch
    # and the outer join share ONE lineitem scan (cache hit visible as
    # InMemoryTableScan); two scans would reintroduce the classic trap
    plan = _plan(spark, "tpch_top_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "InMemoryTableScan" in plan


def test_important_parts_single_fact_scan(spark):
    # Q11: same persist-for-broadcast-total pattern
    plan = _plan(spark, "tpch_important_parts")
    assert plan.count("lineitem.parquet") == 1
    assert "InMemoryTableScan" in plan


def test_waiting_orders_no_self_join(spark):
    # Q21: the exists/not-exists pair folded into ONE per-order
    # aggregate — exactly one scan of each fact, no fact self-join
    plan = _plan(spark, "tpch_waiting_orders")
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1


def test_dominant_supplier_window_rides_shuffle(spark):
    # Q20: the per-part total is a window over the pre-aggregate, not a
    # rejoin — one fact scan
    plan = _plan(spark, "tpch_dominant_supplier")
    assert plan.count("lineitem.parquet") == 1


def test_disjunctive_hulls_pushed_to_scans(spark):
    # Q19: the factored-out hulls must reach the parquet scans
    plan = _plan(spark, "tpch_disjunctive_revenue")
    assert "PushedFilters" in plan
    # quantity hull on the lineitem scan, size/brand hull on part
    assert "GreaterThanOrEqual(l_quantity,1" in plan
    assert "LessThanOrEqual(l_quantity,30" in plan
    assert "GreaterThanOrEqual(p_size,1" in plan
    assert "In(p_brand" in plan


def test_late_lines_date_filter_pushed(spark):
    # Q12: the shipdate range prunes at the scan, not post-join
    plan = _plan(spark, "tpch_late_lines")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
