"""Plan inspection: programmatic access to what .explain() prints, so
tests can assert that filters pushed down to the scan, small sides were
broadcast, and operators run inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the formatted physical plan (parquet/orc
    scans only report these when pushdown actually reached the reader)."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[(.*?)\]", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
