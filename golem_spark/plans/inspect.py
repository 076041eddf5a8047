"""Physical-plan inspection: the programmatic form of the checks in
tests/test_plans.py — use in notebooks/CI to confirm a DataFrame's plan
has the scale-critical properties before running it on real data."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_properties(df: DataFrame) -> dict:
    plan = executed_plan(df)
    scans = [line for line in plan.splitlines() if "FileScan" in line]
    return {
        "n_scans": len(scans),
        "has_broadcast_join": ("BroadcastHashJoin" in plan
                               or "BroadcastNestedLoopJoin" in plan),
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "n_exchanges": plan.count("Exchange"),
        "n_shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning"),
        "bucketed_scan": "Bucketed: true" in plan,
        "has_partial_agg": plan.count("HashAggregate") >= 2,
        "has_top_k": "TakeOrderedAndProject" in plan,
        "scan_columns": scans[0].split("[")[1].split("]")[0] if scans else "",
    }
