#!/usr/bin/env python
"""Render PLANS.md: formatted physical-plan excerpts for flagship
queries — the visible artifact of the explain-and-iterate loop. Each
excerpt keeps the lines that carry the 100 TB contract (scans with
PushedFilters/ReadSchema, joins, exchanges, aggregates, windows) and
drops codegen noise. Regenerate after plan-affecting changes."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLAGSHIPS = [
    ("q3_shipping_priority", "dims broadcast; fact scans carry pushed filters"),
    ("q18_large_orders", "agg-before-join shrinks the fact side pre-join"),
    ("topk_per_group", "WindowGroupLimit prunes per-group top-k map-side"),
    ("dedup_minhash_lsh", "banded equi-join; no cartesian anywhere"),
    ("dedup_cosine_embeddings", "blocked-GEMM: row-level pair replication + grouped applyInPandas (no corpus-scaled rows)"),
    ("part_pareto_abc", "two-phase cumsum: pid-partitioned window, no global sort"),
    ("corpus_oov_rate", "rank-bounded vocab broadcasts; token stream never shuffles by token"),
    ("asof_join_events_orders", "union+window as-of: one shuffle, no join node"),
]

KEEP = re.compile(
    r"Scan parquet|PushedFilters|ReadSchema|Join|Exchange|HashAggregate|"
    r"ObjectHashAggregate|Window|Sort |TakeOrdered|Expand|Generate|"
    r"MapInPandas|ArrowEvalPython|LocalLimit|GlobalLimit|AQEShuffleRead"
)


def excerpt(plan: str, max_lines: int = 28) -> str:
    lines = [
        line.rstrip()[:120]
        for line in plan.splitlines()
        if KEEP.search(line)
    ]
    if len(lines) > max_lines:
        lines = lines[:max_lines] + [f"... ({len(lines) - max_lines} more plan lines)"]
    return "\n".join(lines)


def main() -> None:
    from gcs2postgres_spark.plans.inspect import formatted_plan
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import get_spark

    spark = get_spark("gen-plans")
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — flagship physical plans (auto-generated)",
        "",
        "Excerpts keep the scan/join/exchange/aggregate lines that carry the",
        "100 TB contract; `tests/test_plan_shapes.py` asserts the properties,",
        "this file makes them readable. Regenerate:",
        "`python scripts/gen_plans_md.py`.",
        "",
    ]
    for name, claim in FLAGSHIPS:
        plan = formatted_plan(REGISTRY[name].fn(spark, sf))
        out.append(f"## {name}\n\n*{claim}*\n\n```\n{excerpt(plan)}\n```\n")
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md: {len(FLAGSHIPS)} flagship plans")


if __name__ == "__main__":
    main()
