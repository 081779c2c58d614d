"""Physical-plan audit over every driver query (SURVEY.md §4 discipline).

For each ``queries()`` entry prints the scan pruning (ReadSchema width,
PushedFilters), exchange count, broadcast-join count, and Python-eval
operator count — the four properties that decide whether a plan survives a
100x scale-up. Run after any operator change; eyeball regressions.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from json_ld_spark.session import get_spark


def audit_plan(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan)),
        "sortmerge": len(re.findall(r"SortMergeJoin", plan)),
        "python": len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas", plan)),
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)) // 2 or len(set(re.findall(r"\*\(\d+\)", plan))),
        "scans": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        "pushed": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit_plan(plan)
            scans = "; ".join(
                f"{len(s.split(','))}col" + (f"+[{p}]" if p else "")
                for s, p in zip(
                    a["scans"], a["pushed"] + [""] * len(a["scans"])
                )
            )
            print(
                f"{name:24s} exch={a['exchanges']:2d} bcast={a['broadcasts']} "
                f"smj={a['sortmerge']} py={a['python']} scans[{scans}]"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ERROR {exc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
