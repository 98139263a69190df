"""Repeatable physical-plan audit (backs PLANS.md): prints shuffle /
join-strategy / pushdown / partition-pruning evidence per query.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

DEFAULT_QUERIES = [
    "q_tpch_pricing", "q_top_customers", "q_znorm", "q_bag_topk",
    "q_boss_1nn", "q_cosine_topk", "q_jaccard_topk", "q_index_knn",
    # r7: the canonical pushdown showcase — every Q6 predicate must
    # appear in PushedFilters and the plan must be Exchange-free up to
    # the single-row aggregate
    "q_tpch_forecast_revenue",
]


def audit(name: str, df) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(f"== {name}")
    print(
        "  exchanges:",
        len(re.findall(r"Exchange hashpartitioning", plan)),
        "| broadcast joins:",
        len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "| sort-merge joins:",
        len(re.findall(r"SortMergeJoin", plan)),
    )
    # the scan node's toString is width-truncated ("...") — capture to
    # end of line, not to the closing bracket, or real pushdowns vanish.
    # Anchor the end delimiter to the known following keys ("],
    # ReadSchema"/"], Format"): a bare "], " also occurs INSIDE
    # value-list filters like In(col, [a, b]), which would truncate the
    # reported list mid-filter.
    pf = [
        re.split(r"\], ReadSchema|\], Format", x)[0].rstrip("]")
        for x in re.findall(r"PushedFilters: \[([^\n]*)", plan)
    ]
    pf = [x for x in pf if x]
    if pf:
        print("  pushed filters:", pf[:3])
    part = re.findall(r"PartitionFilters: \[([^\]]+)\]", plan)
    if part:
        print("  partition filters:", len(part), "| dynamic pruning:",
              len(re.findall(r"dynamicpruning", plan)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as E
    from sfa_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = E.queries()
    for name in names:
        if name in qs:
            audit(name, qs[name](spark, sf_dir))


if __name__ == "__main__":
    main()
