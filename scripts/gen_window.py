#!/usr/bin/env python
"""Generate the driver verification window (VERIFY_FRONT) mechanically.

The external driver checks the FIRST 50 registry entries each round
(CORRECTNESS_r{N}.json). The window policy, applied by this script so
it never depends on hand-curated comments staying honest:

1. NEW queries — registered but never green in any driver round —
   always lead (changed/new code outranks freshness).
2. CHANGED queries — names passed via ``--changed`` (the committer
   lists queries whose backing code changed since their newest green) —
   come next, oldest-newest-green first.
3. FRESHNESS FILL — the remaining slots take the queries whose newest
   driver green is OLDEST, so the whole registry's verify-freshness
   debt drains at 50/round.

Usage:
    python scripts/gen_window.py [--size 50] [--changed q1 q2 ...]

Prints the VERIFY_FRONT python literal plus the before/after
newest-green histograms. Paste the list into
gcs2postgres_spark/queries/__init__.py (VERIFY_DEFERRED = the next
window's head, also printed).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def newest_green(repo: str) -> tuple[dict[str, int], list[str]]:
    """query -> newest round with a passing driver row; plus the list
    of queries whose NEWEST row anywhere is a fail (must re-run)."""
    green: dict[str, int] = {}
    newest_row: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            ok = bool(row.get("rows_match")) and row.get("err") is None and (
                row.get("hash_match") is not False
            ) and (row.get("schema_match") is not False)
            if ok:
                green[name] = max(green.get(name, -1), rnd)
            if name not in newest_row or rnd > newest_row[name][0]:
                newest_row[name] = (rnd, ok)
    red = [n for n, (_, ok) in newest_row.items() if not ok]
    return green, red


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50)
    ap.add_argument("--changed", nargs="*", default=[])
    args = ap.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)

    from gcs2postgres_spark.queries import REGISTRY

    names = list(REGISTRY)
    green, red = newest_green(repo)

    new = [n for n in names if n not in green]
    changed = [
        n for n in sorted(set(args.changed), key=lambda n: green.get(n, -1))
        if n in names and n not in new
    ]
    missing = sorted(set(args.changed) - set(names))
    if missing:
        raise SystemExit(f"--changed names not in REGISTRY: {missing}")
    rest = sorted(
        (n for n in names if n not in new and n not in changed),
        key=lambda n: (green[n], n),
    )
    ordered = new + changed + rest
    front = ordered[: args.size]
    deferred = ordered[args.size :]  # full rest, freshness-ordered

    def hist(rounds: dict[str, int], after: dict[str, int] | None = None) -> str:
        src = after or rounds
        counts: dict[int, int] = {}
        for n in names:
            counts[src.get(n, -1)] = counts.get(src.get(n, -1), 0) + 1
        return " ".join(f"r{k}:{v}" for k, v in sorted(counts.items()))

    print(f"# registry: {len(names)} queries; never-green: {len(new)}; "
          f"newest-row-red: {red or 'none'}")
    print(f"# newest-green histogram now: {hist(green)}")
    projected = dict(green)
    this_round = max(green.values(), default=0) + 1
    for n in front:
        projected[n] = this_round
    print(f"# projected after r{this_round}:   {hist(green, projected)}")
    print()
    print("VERIFY_FRONT: list[str] = [")
    for n in front:
        tag = "NEW" if n in new else ("CHANGED" if n in changed else f"fill (r{green[n]})")
        print(f'    "{n}",  # {tag}')
    print("]")
    print()
    print("VERIFY_DEFERRED: list[str] = [")
    for n in deferred:
        print(f'    "{n}",  # r{green.get(n, -1)}')
    print("]")


if __name__ == "__main__":
    main()
