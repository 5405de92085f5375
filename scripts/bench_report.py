#!/usr/bin/env python
"""Generate BASELINE.md's suite-comparison rows from ONE script so the
three numbers (like-for-like, all-variants, best-plan) can't drift
apart (round-3 verdict item 3: the bucketed variants' shared oracles
were double-counted into the DuckDB denominator when summed naively).

Runs bench.py (Spark, noop sink) and scripts/bench_duckdb.py (unique
oracles only) at the same scale dir, then prints a markdown table plus
one JSON line:

- like-for-like: plain queries only on both sides.
- all-variants: every headline query on the Spark side vs the DuckDB
  sum over DISTINCT oracles (a bucketed variant answers the same SQL).
- best-plan: for each plain/bucketed pair take the faster Spark plan;
  DuckDB side is the like-for-like denominator (it has no layout
  variants to choose between).

Usage: python scripts/bench_report.py [--sf DIR]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_bench(script: list[str], sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, *script, "--sf", sf_dir],
        capture_output=True,
        text=True,
        cwd=ROOT,
        check=True,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in {script} output:\n{proc.stdout}\n{proc.stderr}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            if not args:
                sys.exit("--sf requires a directory argument")
            sf_dir = args.pop(0)
        else:
            sys.exit(f"unknown argument {a!r}; usage: bench_report.py [--sf DIR]")

    spark = run_bench(["bench.py"], sf_dir)
    duck = run_bench(["scripts/bench_duckdb.py"], sf_dir)
    q_s, q_d = spark["queries"], duck["queries"]

    # layout variants share their plain twin's oracle (physical layout,
    # same semantics): pair them by suffix for the best-plan suite
    SUFFIXES = ("_bucketed", "_zorder")
    def variant_of(n):
        for suf in SUFFIXES:
            if n.endswith(suf):
                return n[: -len(suf)]
        return None
    pairs: dict[str, list[str]] = {}
    for n in q_s:
        base = variant_of(n)
        if base is not None:
            pairs.setdefault(base, []).append(n)
    plain = [n for n in q_s if variant_of(n) is None]
    both = [n for n in plain if n in q_d]

    s_like = sum(q_s[n] for n in both)
    d_like = sum(q_d[n] for n in both)
    s_all = sum(q_s.values())
    d_unique = duck["value"]
    s_best = sum(
        min([q_s[n]] + [q_s[v] for v in pairs.get(n, [])]) for n in both
    )

    rows = [
        (f"like-for-like ({len(both)} plain queries)", s_like, d_like),
        (f"all {len(q_s)} incl. layout variants (DuckDB oracles deduped)", s_all, d_unique),
        ("best-plan (fastest of plain/bucketed/zorder per pair)", s_best, d_like),
    ]
    print(f"| Suite (sf dir `{sf_dir}`) | Spark | DuckDB | Ratio |")
    print("|---|---|---|---|")
    for label, s, d in rows:
        print(f"| {label} | {s:.2f} s | {d:.2f} s | {s / d:.2f}x |")
    print()
    print(
        json.dumps(
            {
                "metric": "suite_comparison",
                "sf": spark.get("sf"),
                "rows": {
                    "like_for_like": {"spark": round(s_like, 3), "duckdb": round(d_like, 3)},
                    "all_variants": {"spark": round(s_all, 3), "duckdb": round(d_unique, 3)},
                    "best_plan": {"spark": round(s_best, 3), "duckdb": round(d_like, 3)},
                },
                "spark_queries": q_s,
                "duckdb_queries": q_d,
            }
        )
    )


if __name__ == "__main__":
    main()
