"""Parse Spark ``explain`` output into checkable facts.

Works on the *final* physical plan string.  With AQE enabled the
initial plan may still show placeholder exchanges; for plan-shape
assertions we read the pre-execution formatted plan — broadcast hints,
pushdown, and scan pruning are all decided there, and AQE only ever
removes work (coalesces partitions, upgrades to broadcast).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The ``df.explain(mode)`` text as a string instead of stdout.

    Uses the same JVM helper PySpark's ``DataFrame.explain`` prints
    from; there is no public capture API.
    """
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode  # noqa: SLF001
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` entry across the plan's scans."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Every ``ReadSchema`` struct string (one per file scan)."""
    plan = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def shuffle_count(df: DataFrame) -> int:
    """Number of distinct Exchange nodes (shuffles) in the plan.

    Formatted mode numbers each operator once, so reused exchanges
    (one hash-partition feeding several window specs) count once —
    the number that matters for wall-clock at scale.
    """
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan)) + len(
        re.findall(r"\(\d+\) ShuffleExchange", plan)
    )


def assert_has_node(df: DataFrame, node: str) -> None:
    plan = explain_str(df)
    assert node in plan, f"expected {node!r} in physical plan:\n{plan}"


def assert_no_node(df: DataFrame, node: str) -> None:
    plan = explain_str(df)
    assert node not in plan, f"unexpected {node!r} in physical plan:\n{plan}"


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = shuffle_count(df)
    assert got <= n, (
        f"plan has {got} shuffles, budget is {n}:\n{explain_str(df)}"
    )
