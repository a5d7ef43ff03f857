"""Physical-plan assertion helpers.

The scale guarantees this engine depends on (pushdown, pruning,
broadcast, bounded exchanges) are properties of the *executed plan*,
not the code — so tests assert them on `.explain` output. These
helpers make those assertions first-class (used by
tests/test_operators.py::TestPhysicalPlans and available for ad-hoc
plan inspection while developing an operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema_fields(df: DataFrame) -> str:
    """The ReadSchema fragment of the scan — what actually gets read
    from parquet after column pruning."""
    plan = executed_plan(df)
    if "ReadSchema" not in plan:
        return ""
    return plan.split("ReadSchema", 1)[1].split("\n", 1)[0]


def pushed_filters(df: DataFrame) -> str:
    plan = executed_plan(df)
    if "PushedFilters" not in plan:
        return ""
    return plan.split("PushedFilters", 1)[1].split("]", 1)[0] + "]"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the executed plan."""
    return executed_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def assert_columns_pruned(df: DataFrame, forbidden: list[str]) -> None:
    schema = read_schema_fields(df)
    leaked = [c for c in forbidden if c in schema]
    if leaked:
        raise AssertionError(
            f"columns {leaked} leaked into the scan ReadSchema: {schema}")


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} Exchanges (max {n}):\n{executed_plan(df)}")
