#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run after adding or
re-oracling queries so the doc can't drift from reality again —
round-2 verdict flagged stale rows-only labels)."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HEADER = """# QUERIES — all registered queries (auto-generated from the registry)

One row per `queries()` entry; **oracle** = value-checked against DuckDB at
sf0.01 by the driver, *rows-only* = no cross-engine SQL form exists
(engine-specific hashes / sketches); those pin correctness in pytest.

Regenerate with `python scripts/gen_queries_md.py`.

Some registered queries carry deliberate demo caps that bound their
quadratic *oracle* (or a fixture's payload count), not the Spark plan:
`ngram_jaccard_pairs` (`doc_id < 100`), `similarity_cosine_topk`
(`vec_id < 10`), `dedup_jaccard_prefix_filter` and
`dedup_incremental_batch` (`doc_id < 1000`), `events_resample_ffill` /
`events_resample_interp` (`user_id < 40`), `multimodal_wav_energy`
(`doc_id < 200`), `multimodal_join` / `multimodal_decode_features`
(`doc_id < 300/500`). The uncapped capability is the operator itself
(`operators/`), whose scale path is plan-shape-pinned in tests — the
green driver row certifies the capped subset.

| Query | Check | What it exercises |
|---|---|---|
"""


def main() -> None:
    from gcs2postgres_spark.queries import REGISTRY

    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        check = "oracle" if spec.oracle else "rows-only"
        doc = (spec.fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        if len(first) > 110:
            first = first[:107] + "..."
        rows.append(f"| `{name}` | {check} | {first} |")
    (REPO / "QUERIES.md").write_text(HEADER + "\n".join(rows) + "\n")
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    print(f"wrote QUERIES.md: {len(REGISTRY)} queries, {n_oracle} with oracle")


if __name__ == "__main__":
    main()
