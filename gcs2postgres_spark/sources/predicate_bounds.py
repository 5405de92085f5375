"""Conservative bounds extraction from SQL predicates — the bridge
between a query's WHERE clause and the planning-time file skip
(``stats_filter`` in delta_py.read_delta_py / iceberg_py.read_iceberg_py).

Only shapes that PROVABLY imply a per-column range contribute:

    col >= lit   col > lit   col <= lit   col < lit   col = lit
    lit <= col   (mirrored forms)         col BETWEEN a AND b

joined by top-level AND. Anything else — ORs, functions, column-column
comparisons, IN lists, parenthesized subtrees — contributes nothing for
its column (the file is kept). That asymmetry is the whole safety
argument: a derived bound can only ever REMOVE files no matching row
can live in, because the engine still applies the full predicate as a
row filter after the scan. A top-level OR disables extraction entirely
(each disjunct could match different files).

``>``/``<`` are widened to their inclusive forms ([v, ·] / [·, v]) —
stats ranges are inclusive, so the widening only keeps extra files,
never drops one.
"""

from __future__ import annotations

import re

_NUM = r"-?\d+(?:\.\d+)?"
_STR = r"'(?:[^']|'')*'"
_LIT = f"(?:{_NUM}|{_STR})"
_ID = r"[A-Za-z_][A-Za-z0-9_]*"

_CMP = re.compile(
    rf"^\s*(?P<col>{_ID})\s*(?P<op>>=|<=|=|==|>|<)\s*(?P<lit>{_LIT})\s*$"
)
_CMP_REV = re.compile(
    rf"^\s*(?P<lit>{_LIT})\s*(?P<op>>=|<=|=|==|>|<)\s*(?P<col>{_ID})\s*$"
)
_BETWEEN = re.compile(
    rf"^\s*(?P<col>{_ID})\s+BETWEEN\s+(?P<lo>{_LIT})\s+AND\s+(?P<hi>{_LIT})\s*$",
    re.IGNORECASE,
)
_AND_SPLIT = re.compile(r"\bAND\b", re.IGNORECASE)
_OR = re.compile(r"\bOR\b", re.IGNORECASE)

_MIRROR = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "=": "=", "==": "=="}


def _parse_lit(text: str):
    text = text.strip()
    if text.startswith("'"):
        return text[1:-1].replace("''", "'")
    return float(text) if "." in text else int(text)


def _strip_strings(pred: str) -> str:
    """The predicate with string-literal CONTENTS blanked to spaces
    (length-preserving, so split indexes found here apply to the
    original — AND/OR/paren detection never fires inside quotes)."""
    return re.sub(_STR, lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", pred)


def bounds_from_predicate(pred: str) -> dict[str, tuple]:
    """{col: (lo, hi)} implied by ``pred`` (None = unbounded side);
    empty dict when nothing is provable. Purely syntactic and
    conservative — see the module docstring for the safety argument."""
    if not pred or not pred.strip():
        return {}
    if "\\" in pred:
        # Spark SQL string literals also accept backslash-escaped
        # quotes ('isn\'t'), which the doubled-quote-only lexer below
        # would mis-tokenize — terminating the literal early and
        # deriving a WRONG bound. Any backslash anywhere → refuse
        # extraction entirely (never an error, just no file skipping),
        # preserving the conservative-by-construction guarantee.
        return {}
    blanked = _strip_strings(pred)
    if "(" in blanked or _OR.search(blanked):
        # parens could scope an OR; a top-level OR breaks implication.
        # Both are simply "no extraction", never an error.
        return {}
    # conjunct split points come from the BLANKED text (never inside
    # quotes); an AND that completes a BETWEEN (the first AND after a
    # BETWEEN keyword with no other AND in between) is not a split.
    ands = [(m.start(), m.end()) for m in _AND_SPLIT.finditer(blanked)]
    skip = set()
    for b in re.finditer(r"\bBETWEEN\b", blanked, re.IGNORECASE):
        nxt = next(((s, e) for s, e in ands if s > b.start()), None)
        if nxt:
            skip.add(nxt)
    parts, prev = [], 0
    for s, e in ands:
        if (s, e) in skip:
            continue
        parts.append(pred[prev:s])
        prev = e
    parts.append(pred[prev:])
    out: dict[str, tuple] = {}

    def _add(col: str, lo, hi) -> None:
        cur_lo, cur_hi = out.get(col, (None, None))
        if lo is not None:
            cur_lo = lo if cur_lo is None else max(cur_lo, lo)
        if hi is not None:
            cur_hi = hi if cur_hi is None else min(cur_hi, hi)
        out[col] = (cur_lo, cur_hi)

    for conjunct in parts:
        m = _BETWEEN.match(conjunct)
        if m:
            _add(m["col"], _parse_lit(m["lo"]), _parse_lit(m["hi"]))
            continue
        m = _CMP.match(conjunct)
        op = None
        if m:
            op = m["op"]
        else:
            m = _CMP_REV.match(conjunct)
            if m:
                op = _MIRROR[m["op"]]
        if not m:
            continue  # unprovable shape: contributes nothing
        col, v = m["col"], _parse_lit(m["lit"])
        if op in ("=", "=="):
            _add(col, v, v)
        elif op in (">=", ">"):
            _add(col, v, None)  # > widened to >= (inclusive stats)
        elif op in ("<=", "<"):
            _add(col, None, v)
    # a contradictory conjunction (k > 5 AND k < 3) still only SKIPS
    # files — correct, the row filter returns nothing anyway
    return out
