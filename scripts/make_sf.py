#!/usr/bin/env python
"""Scale up the harness testdata by replication with key remapping.

Builds sfN = `factor`× copies of a source sf directory (default
sf0.1 × 10 → "sf1") for the bench-floor convergence measurement
(VERDICT round 1 item 5): every replica keeps its internal join
relationships by offsetting each key domain by replica × (max_key+1).

Cross-replica leakage is deliberately broken where it would change a
query's asymptotics rather than its scale:
- documents.text: every word gets a replica suffix, so replicas share
  NO shingles/tokens — near-dup pair counts scale ×factor (like real
  corpus growth) instead of ×factor² (cross-replica identical texts
  would make every doc a 10-way duplicate and quadratically blow up
  the LSH verify stage, which is not what "10× more data" means).
- embeddings are replicated as-is: the bench queries over them
  (top-k for 10 fixed queries, key join) are insensitive to repeats.

Events keep their timestamps (the time axis does not stretch; density
grows — same as busier traffic), written as µs timestamps (the catalog
reads both the original TIMESTAMP(NANOS) and plain TIMESTAMP).

Usage: python scripts/make_sf.py [--src /root/testdata/sf0.1] \
           [--out /root/repo/.benchdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import time

import duckdb

# table -> {column: key_domain}; key domains offset independently
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DOMAIN_SOURCE = {  # domain -> (table, column) to measure max key
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "evt": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.benchdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    con.sql("SET threads TO 32")
    # identity tz: events.ts is cast to TIMESTAMPTZ (Spark reads parquet
    # isAdjustedToUTC=true as a plain TIMESTAMP; NTZ would break ts math)
    con.sql("SET TimeZone = 'UTC'")

    strides: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        strides[dom] = (
            con.sql(f"SELECT max({col}) + 1 FROM '{args.src}/{tbl}.parquet'").fetchone()[0]
        )

    for t in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keymap in KEYED.items():
        t0 = time.time()
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'").fetchall()]
        selects = []
        for r in range(args.factor):
            exprs = []
            for c in cols:
                if c in keymap:
                    exprs.append(f"{c} + {r * strides[keymap[c]]} AS {c}")
                elif t == "documents" and c == "text":
                    # suffix every word with the replica id (see module doc)
                    exprs.append(rf"regexp_replace(text, '(\S+)', '\1x{r}', 'g') AS text")
                elif t == "documents" and c == "n_chars":
                    exprs.append(
                        rf"length(regexp_replace(text, '(\S+)', '\1x{r}', 'g')) AS n_chars"
                    )
                elif t == "events" and c == "ts":
                    exprs.append("CAST(CAST(ts AS TIMESTAMP) AS TIMESTAMPTZ) AS ts")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{args.src}/{t}.parquet'")
        union = "\nUNION ALL\n".join(selects)
        con.sql(f"COPY ({union}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
