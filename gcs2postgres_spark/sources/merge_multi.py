"""Multi-clause conditional MERGE, shared by the Delta and Iceberg
jar-less committers (the full Spark SQL MERGE clause matrix):

    MERGE INTO t USING s ON t.k = s.k
      WHEN MATCHED AND <cond> THEN UPDATE SET col = expr, ...
      WHEN MATCHED AND <cond> THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND <cond> THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND <cond> THEN UPDATE SET ... | DELETE

Semantics (identical to Spark/Delta MERGE):
- clauses within a group evaluate IN ORDER per row; the first whose
  condition holds applies, later ones are shadowed. An unconditioned
  clause therefore must be LAST in its group — anything after it is
  dead, which real engines reject and so does ``validate_clauses``.
- a matched (target, source) pair with no applicable clause leaves the
  target row untouched.
- conditions and SET expressions are Spark SQL over the aliases ``t``
  (target) and ``s`` (source); NOT MATCHED conditions see ``s`` only,
  NOT MATCHED BY SOURCE conditions see ``t`` only.

Scale shape: ONE inner equi-join target x source (shuffle-or-broadcast,
Catalyst/AQE sized) feeds every matched clause; anti-joins on the key
sets feed the insert / by-source sides — the same joins the
single-clause committers already run, so the clause matrix costs no
extra shuffle. The physical commit stays each format's row-level
protocol: deletion vectors (Delta) / position deletes (Iceberg) for the
modified rows plus an append of the rewritten/inserted rows, via the
committer the caller passes in.

Each clause is a dict: ``{"cond": str|None, "action":
"update"|"delete"|"insert", "set": dict[str, str]|None}`` where
``set=None`` on an update means full-row ``UPDATE SET *``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_clauses(
    matched: list[dict],
    not_matched: list[dict],
    not_matched_by_source: list[dict],
    table_cols: list[str],
) -> None:
    """Reject dead clause orders and malformed actions up front (parse
    time), so a misparse can never silently drop a clause."""
    if not (matched or not_matched or not_matched_by_source):
        raise ValueError("MERGE needs at least one WHEN clause")
    for group, name, actions in (
        (matched, "WHEN MATCHED", {"update", "delete"}),
        (not_matched, "WHEN NOT MATCHED", {"insert"}),
        (not_matched_by_source, "WHEN NOT MATCHED BY SOURCE", {"update", "delete"}),
    ):
        for i, cl in enumerate(group):
            if cl.get("action") not in actions:
                raise ValueError(
                    f"{name} supports {sorted(actions)}; got {cl.get('action')!r}"
                )
            if cl.get("cond") is None and i != len(group) - 1:
                raise ValueError(
                    f"unconditioned {name} clause must be LAST in its "
                    f"group — clause {i + 1} of {len(group)} shadows the "
                    "rest (dead clauses)"
                )
            bad = sorted(set(cl.get("set") or {}) - set(table_cols))
            if bad:
                raise ValueError(f"MERGE SET targets unknown columns: {bad}")
            if cl.get("action") == "delete" and cl.get("set"):
                raise ValueError("DELETE clause cannot carry SET assignments")


def _fires_any(clauses: list[dict]):
    """Column: does ANY clause of the group apply to this row (the
    row-is-modified predicate the delete side needs — which clause wins
    only matters for the rewrite side)."""
    out = F.lit(False)
    for cl in clauses:
        out = out | (F.expr(cl["cond"]) if cl["cond"] else F.lit(True))
    return out


def _pick(clauses: list[dict]):
    """Column: 0-based index of the FIRST clause whose condition holds,
    NULL when none does — first-match-wins, Spark MERGE's clause rule."""
    pick = F.lit(None).cast("int")
    chain = None
    for i, cl in enumerate(clauses):
        cond = F.expr(cl["cond"]) if cl["cond"] else F.lit(True)
        chain = (chain.when(cond, i) if chain is not None
                 else F.when(cond, F.lit(i)))
    return chain.otherwise(pick) if chain is not None else pick


def build_merge_plan(
    live: DataFrame,
    source: DataFrame,
    on: list[str],
    matched: list[dict],
    not_matched: list[dict],
    not_matched_by_source: list[dict],
):
    """Returns ``(matcher, replacement)`` for a row-level committer:
    ``matcher(tagged)`` selects the tagged live rows to delete (any
    clause modified them), ``replacement`` is the rewritten + inserted
    row set (None when no clause produces rows). The caller has already
    validated clauses and raised on duplicate source keys."""
    validate_clauses(matched, not_matched, not_matched_by_source, live.columns)
    types = {f.name: f.dataType for f in live.schema.fields}
    key_eq = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in on]
    src_keys = source.select(*on).distinct()
    live_keys = live.select(*on).distinct()

    def _full_row_ok(cl: dict, label: str) -> None:
        if cl["action"] in ("update", "insert") and cl.get("set") is None:
            missing = sorted(set(live.columns) - set(source.columns))
            if missing:
                raise ValueError(
                    f"MERGE source lacks table columns needed for "
                    f"{label}: {missing}"
                )

    for cl in matched:
        _full_row_ok(cl, "UPDATE SET *")
    for cl in not_matched:
        _full_row_ok(cl, "INSERT *")

    def matcher(tagged: DataFrame) -> DataFrame:
        parts = []
        if matched:
            parts.append(
                tagged.alias("t")
                .join(source.alias("s"), key_eq, "inner")
                .filter(_fires_any(matched))
                .select("t.*")
            )
        if not_matched_by_source:
            parts.append(
                tagged.alias("t")
                .join(src_keys, on, "left_anti")
                .filter(_fires_any(not_matched_by_source))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _rewrite(base: DataFrame, cl: dict, env: str) -> DataFrame:
        # env: "ts" (matched; t.col/s.col both visible) or "t" (by-source)
        cols = []
        for c in live.columns:
            if cl.get("set") is not None and c in cl["set"]:
                cols.append(F.expr(cl["set"][c]).cast(types[c]).alias(c))
            elif cl.get("set") is None and env == "ts":
                cols.append(F.col(f"s.{c}").cast(types[c]).alias(c))  # SET *
            else:
                cols.append(F.col(f"t.{c}").cast(types[c]).alias(c))
        return base.select(*cols)

    parts: list[DataFrame] = []
    upd_matched = [cl for cl in matched if cl["action"] == "update"]
    if upd_matched:
        joined = (
            live.alias("t")
            .join(source.alias("s"), key_eq, "inner")
            .withColumn("__clause", _pick(matched))
        )
        for i, cl in enumerate(matched):
            if cl["action"] != "update":
                continue
            parts.append(_rewrite(joined.filter(F.col("__clause") == i), cl, "ts"))
    if not_matched:
        ins = (
            source.alias("s")
            .join(live_keys, on, "left_anti")
            .filter(_fires_any(not_matched))
        )
        parts.append(
            ins.select(
                *[F.col(f"s.{c}").cast(types[c]).alias(c) for c in live.columns]
            )
        )
    upd_nmbs = [cl for cl in not_matched_by_source if cl["action"] == "update"]
    if upd_nmbs:
        anti = (
            live.alias("t")
            .join(src_keys, on, "left_anti")
            .withColumn("__clause", _pick(not_matched_by_source))
        )
        for i, cl in enumerate(not_matched_by_source):
            if cl["action"] != "update":
                continue
            parts.append(_rewrite(anti.filter(F.col("__clause") == i), cl, "t"))

    replacement: DataFrame | None = None
    for p in parts:
        replacement = p if replacement is None else replacement.unionByName(p)
    if not (matched or not_matched_by_source):
        return None, replacement
    return matcher, replacement
