"""Physical-plan audit: execute each audited query at a small SF and
count the plan operators that matter at 100 TB — shuffle Exchanges,
join strategies, windows, Python boundaries.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Writes a markdown table to stdout; redirect into PLAN_AUDIT.md to
record a round's plan shapes. A regression shows up as a diff in the
counts (e.g. a new Exchange on a formerly shuffle-free query) without
anyone having to eyeball full plan dumps.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

# the bench headliners plus this round's scale-pattern queries
DEFAULT = [
    "q_bag_topk", "q_sfa_words", "q_boss_1nn", "q_tfidf_fit",
    "q_tfidf_predict", "q_word_bigrams", "q_mft_sliding",
    "q_sfa_words_dft", "q_dedup_exact", "q_jaccard_topk", "q_lsh_pairs",
    "q_cosine_topk", "q_cosine_ivf", "q_bloom_decontaminate",
    "q_countmin_tokens", "q_hll_distinct", "q_salted_revenue",
    "q_tpch_shipping", "q_tpch_local_supplier", "q_semantic_dedup",
    "q_ivfpq_ann", "q_decontaminate",
    # r6 additions: maintenance bench group + new shapes
    "q_phash_neardup", "q_lsh_verified_dedup", "q_merge_changes",
    "q_snapshot_diff", "q_winsorize", "q_incremental_agg",
    "q_quantile_sketch", "q_drift_psi_quantile",
    "q_tpch_shipmode_priority", "q_tpch_big_orders",
    "q_tpch_supplier_variety",
    # r7 additions: Q17/Q21/Q22/Q15 shapes
    "q_tpch_small_qty", "q_tpch_waiting_supplier",
    "q_tpch_sales_opportunity", "q_tpch_top_supplier",
    # r7 late additions: Q6/Q7/Q9/Q13/Q14/Q19 shapes
    "q_tpch_forecast_revenue", "q_tpch_volume_shipping",
    "q_tpch_product_profit", "q_tpch_customer_distribution",
    "q_tpch_promo_effect", "q_tpch_discounted_brands",
    # r7 final additions: Q2/Q11/Q20 over the derived partsupp
    "q_tpch_min_cost_supplier", "q_tpch_important_stock",
    "q_tpch_excess_stock_supplier",
]

MARKS = [
    ("shuffles", "Exchange hashpartitioning"),
    ("bcast_join", "BroadcastHashJoin"),
    ("smj", "SortMergeJoin"),
    ("bnlj", "BroadcastNestedLoopJoin"),
    ("window", "Window"),
    ("python", "InPandas"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as E
    from sfa_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = E.queries()
    print(f"# Plan audit at {sf_dir}\n")
    print("| query | " + " | ".join(m for m, _ in MARKS) + " |")
    print("|---|" + "---|" * len(MARKS))
    for name in names:
        if name not in qs:
            continue
        try:
            d = qs[name](spark, sf_dir)
            # collect d ITSELF: .count() would materialize a different
            # plan tree, leaving d's executedPlan pre-AQE (duplicate
            # subtrees printed instead of ReusedExchange)
            d.collect()
            plan = d._jdf.queryExecution().executedPlan().toString()
            # AQE prints "== Final Plan ==" AND "== Initial Plan ==" —
            # count only the final one or every mark double-counts
            cut = plan.find("== Initial Plan ==")
            if cut >= 0:
                plan = plan[:cut]
            counts = [plan.count(pat) for _, pat in MARKS]
            print(f"| {name} | " + " | ".join(str(c) for c in counts) + " |")
        except Exception as exc:  # noqa: BLE001 — audit must not abort on one query
            print(f"| {name} | ERROR: {str(exc)[:60]} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
