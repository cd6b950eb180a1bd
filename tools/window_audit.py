"""Catalog-wide single-partition-WINDOW audit (VERDICT r3 wrong #1).

A ``Window.orderBy(...)`` with no partition spec plans an ``Exchange
SinglePartition`` under the Window — every input row through one
task. Fine when the input is metadata-sized (a day/month spine, a
distinct-value or chunk-total table, a top-k-limited frame); fatal
when it scales with data. This tool finds every SinglePartition
exchange that FEEDS a Window in every catalog query's executed plan
(scalar-aggregate exchanges — global count/sum — are one-row by
construction and are skipped), then classifies its child subtree:

- ``limit``     subtree contains a Limit / TakeOrderedAndProject —
                top-k-sized input, auto-OK
- ``scalar``    keys=[] aggregate — one row, auto-OK
- ``agg<keys>`` grouped aggregate: input is GROUP-cardinality. OK
                when the grouping is a bounded spine (days, months,
                nations, chunk ids, distinct band values); a
                row-unique grouping key here is the RFM-class defect.
                Printed with its keys for review; PLANS.md carries
                the reviewed classification.
- ``ROW-SCALE`` un-collapsed row data — always a defect. Target: 0.

Usage: python tools/window_audit.py [sf_dir] [name ...]
Exits 1 if any ROW-SCALE window survives (CI-able).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stakehouse_etl_spark.queries.catalog import QUERIES  # noqa: E402
from stakehouse_etl_spark.session import get_spark  # noqa: E402


def _depth(s: str) -> int:
    return len(s) - len(s.lstrip(" +-:*"))


def _subtree(lines: list[str], idx: int) -> list[str]:
    d = _depth(lines[idx])
    out = []
    for line in lines[idx + 1 :]:
        if line.strip() and _depth(line) <= d:
            break
        out.append(line)
    return out


def _feeds_window(lines: list[str], idx: int) -> bool:
    """True iff the nearest shallower-indent ancestor chain reaches a
    Window before any other shuffle boundary."""
    d = _depth(lines[idx])
    for line in reversed(lines[:idx]):
        if not line.strip():
            continue
        dd = _depth(line)
        if dd < d:
            name = line.strip(" +-:*")
            if name.startswith(("Window", "WindowGroupLimit")):
                return True
            if name.startswith("Sort"):
                d = dd  # sort-for-window sits between; keep walking
                continue
            return False
    return False


def classify(lines: list[str], idx: int) -> str:
    sub = _subtree(lines, idx)
    subtree = "\n".join(sub)
    if any(
        m in subtree
        for m in (
            "GlobalLimit",
            "LocalLimit",
            "TakeOrderedAndProject",
            "CollectLimit",
        )
    ):
        return "limit"
    m = re.search(r"Aggregate(?:\w*)?\(keys=\[(.*?)\]", subtree)
    if m is not None:
        keys = m.group(1).strip()
        if not keys:
            return "scalar"
        return f"agg<{keys[:80]}>"
    return "ROW-SCALE"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] if len(args) > 1 else list(QUERIES)
    spark = get_spark("window-audit")
    spark.sparkContext.setLogLevel("ERROR")
    n_windows = 0
    agg_fed: list[tuple[str, str]] = []
    row_scale: list[str] = []
    counts: dict[str, int] = {}
    errors: list[str] = []
    for name in names:
        q = QUERIES[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # audit tool: record and continue
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            if not _feeds_window(lines, i):
                continue
            n_windows += 1
            kind = classify(lines, i)
            base = kind.split("<", 1)[0]
            counts[base] = counts.get(base, 0) + 1
            if kind == "ROW-SCALE":
                row_scale.append(name)
                print(f"ROW-SCALE global window: {name}")
            elif base == "agg":
                agg_fed.append((name, kind))
        spark.catalog.clearCache()
    print(
        f"\nqueries audited: {len(names) - len(errors)} "
        f"(errors: {len(errors)}); global windows found: {n_windows}"
    )
    for e in errors:
        print(f"  ERR {e}")
    for k in sorted(counts):
        print(f"  {k}: {counts[k]}")
    if agg_fed:
        print("\ngroup-cardinality global windows (review the keys):")
        for name, kind in agg_fed:
            print(f"  {name}: {kind}")
    if row_scale:
        print(f"\nROW-SCALE offenders: {sorted(set(row_scale))}")
        return 1
    print("\nzero ROW-SCALE single-partition windows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
