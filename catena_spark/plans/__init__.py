"""Plan-inspection utilities (SURVEY.md §4): assert that Catalyst is
doing the work catena hard-codes in its storage layer — pushdown,
broadcast, partial aggregation. Used by tests/test_plans.py."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter '{fragment}' not pushed to scan; pushed lines: {pushed}\n{plan}"
    )


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = formatted_plan(df)
    for frag in fragments:
        assert frag in plan, f"'{frag}' missing from plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = formatted_plan(df)
    for frag in fragments:
        assert frag not in plan, f"'{frag}' unexpectedly in plan:\n{plan}"
