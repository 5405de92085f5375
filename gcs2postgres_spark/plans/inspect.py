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
    """Number of whole-stage-codegen subtrees (the "codegen" explain mode
    reports them; the formatted tree does not annotate codegen)."""
    out = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", out)
    return int(m.group(1)) if m else 0


def node_id(df_plan: str, node: str) -> int | None:
    """Operator id of the first `(N) <node>` detail section in a formatted
    plan — ids are assigned leaf-first, so a smaller id = earlier in the
    dataflow."""
    m = re.search(rf"\((\d+)\) {node}", df_plan)
    return int(m.group(1)) if m else None
