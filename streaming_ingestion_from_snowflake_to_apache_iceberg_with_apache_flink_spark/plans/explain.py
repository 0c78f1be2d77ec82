"""Plan inspection — make "did Catalyst do what we designed for?" testable.

The engine's scale story rests on claims about physical plans: filters
reach the parquet scan, projections prune columns, small sides broadcast,
window top-k gets the group-limit pushdown. These helpers turn each claim
into an assertion so regressions show up in CI, not on the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The scan node must carry ``fragment`` in PushedFilters — i.e. the
    predicate prunes parquet row groups instead of filtering post-scan."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    if not any(fragment in ln for ln in pushed):
        raise AssertionError(
            f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}"
        )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Column pruning: the parquet ReadSchema must contain exactly
    ``columns`` — reading more decodes dead bytes at every scale."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            read = {
                part.split(":")[0].strip()
                for part in ln.split("struct<", 1)[-1].rstrip(">").split(",")
                if part.strip()
            }
            if read != columns:
                raise AssertionError(f"ReadSchema {sorted(read)} != {sorted(columns)}")
            return
    raise AssertionError("no ReadSchema found in plan")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError("expected a broadcast join in the plan")


def assert_window_group_limit(df: DataFrame) -> None:
    """rank-filter top-k must trigger WindowGroupLimit (map-side truncation
    to k rows per key before the shuffle)."""
    if "WindowGroupLimit" not in formatted_plan(df):
        raise AssertionError("expected WindowGroupLimit physical optimization")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle (Exchange) nodes — the scale currency. Counts the
    detail entries ``(N) Exchange`` so tree and detail lines aren't
    double-counted."""
    import re

    return sum(
        1
        for ln in formatted_plan(df).splitlines()
        if re.match(r"^\(\d+\) Exchange", ln.strip())
    )


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The plan's hot projection/filter spans must be codegen'd (formatted
    mode marks nodes with ``[codegen id : N]``)."""
    if "codegen id" not in formatted_plan(df):
        raise AssertionError("no WholeStageCodegen span in plan")
