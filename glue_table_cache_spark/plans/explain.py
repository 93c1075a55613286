"""Physical-plan inspection helpers.

Used by tests and the bench harness to assert that plans are the ones a
100 TB deployment needs: partition filters applied at the scan, data
filters pushed into the Parquet reader, broadcast joins where a side is
small, whole-stage codegen over the hot expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(...)` as a string instead of stdout."""
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def partition_filters(df: DataFrame) -> str:
    """The `PartitionFilters: [...]` clause of the scan, '' if none."""
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", explain_string(df))
    return m.group(1) if m else ""


def pushed_filters(df: DataFrame) -> str:
    """The `PushedFilters: [...]` clause of the scan, '' if none."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", explain_string(df))
    return m.group(1) if m else ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_string(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (the ``*(n)`` markers).  Under
    AQE the markers only appear once the final plan exists — execute the
    frame first."""
    return len(re.findall(r"\*\(\d+\)", explain_string(df, "simple")))


def uses_partial_aggregation(df: DataFrame) -> bool:
    """Two HashAggregate nodes (map-side partial + final) around the
    exchange — the shape that scales a groupBy."""
    return len(re.findall(r"HashAggregate", explain_string(df, "simple"))) >= 2


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan (broadcast
    exchanges excluded) — 0 on both sides of a join means the layout is
    co-located (bucketed) and no data moves."""
    plan = explain_string(df, "simple")
    return len(re.findall(r"Exchange hashpartitioning", plan)) + len(
        re.findall(r"Exchange rangepartitioning", plan)
    )


def scan_read_schema(df: DataFrame) -> str:
    m = re.search(r"ReadSchema: (struct<[^\n]*)", explain_string(df))
    return m.group(1) if m else ""
