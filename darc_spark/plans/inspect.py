"""Physical-plan inspection helpers.

The engine's performance contract is enforceable: these helpers let
tests (and operators) assert the plan *shape* — filters pushed to the
scan, joins broadcast where a side is dim-sized, Python confined to the
declared UDF boundaries — rather than hoping Catalyst did the right
thing. Used across tests/ (e.g. the canonicalizer asserts exactly one
ArrowEvalPython node; the i2p hosts extractor asserts a UDF-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def python_eval_count(df: DataFrame) -> int:
    plan = executed_plan(df)
    return (
        plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
    )


def assert_no_python(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "Python" not in plan, f"unexpected Python stage in plan:\n{plan}"


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in a PushedFilters clause."""
    plan = executed_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; got: {joined}"


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    plan = executed_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= expected, f"expected ≥{expected} BroadcastHashJoin, got {n}:\n{plan}"
