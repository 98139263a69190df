"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (events → sliding z-norm → PAA →
                 equi-width SFA words → numerosity-reduced bags →
                 top-k patterns per entity) at sf0.001.
queries()      — one entry per implemented SURVEY §2 operator.
oracle_sql()   — matching DuckDB SQL for EVERY registered query (159/
                 159 since r6, zero rows-only): iterative fits are
                 replayed exactly (recursive-CTE BPE trainer) or
                 checked through invariant surrogate surfaces
                 (_predict_invariants); everything else is mirrored
                 directly.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERY_MODULES = [
    "sfa_spark.queries",
    "sfa_spark.queries_text",
    "sfa_spark.queries_spectral",
    "sfa_spark.queries_index",
    "sfa_spark.queries_ml",
    "sfa_spark.queries_streaming",
]
ORACLE_MODULES = [
    "sfa_spark.oracles",
    "sfa_spark.oracles_text",
    "sfa_spark.oracles_ml",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sfa_spark import queries as Q

    return Q.q_bag_topk(spark, "/root/testdata/sf0.001")


# Coverage rotation: the driver's correctness gate records the FIRST
# 50 registered queries each round; the union of rounds must cover all
# registered queries with no stale greens. Round-6 gate leads with
# (a) the four queries registered after the r5 cut that have NO gate
# row anywhere (VERDICT r5 task 1 — the top item), (b) the ten
# brand-new r6 queries, (c) every query whose implementation or oracle
# changed in r6 (winsorize NULL guard; jaccard guard_max_df;
# lsh_recall structural hash_sample slice — VALUES changed;
# BPE/predict/quality surrogate-oracle upgrades from rows-only;
# phash popcount verify; index-knn join rewrite; jaccard_verify
# distinct; apply_changes column drop; cross_run_dedup hash_col),
# then (d) the 18 queries whose only gate rows are round 2 (oldest
# coverage), and (e) round-3-aged queries filling to exactly 50.
# Demoted queries keep their green r3/r4/r5 rows and are replayed with
# tools/check_oracle.py before the round closes (log in COVERAGE.md).
ROTATE_FIRST = [
    # (a) registered after the r5 gate cut — never gated
    "q_debounce",
    "q_rfm_segments",
    "q_tpch_order_priority",
    "q_tpch_returned_revenue",
    # (b) NEW in r6
    "q_drift_psi_quantile",      # decile-bin PSI (outlier-robust)
    "q_bpe_merges",              # BPE fit artifact, trainer-replay oracle
    "q_quantile_sketch",         # GK sketch + rank-error invariant
    "q_tpch_shipmode_priority",  # Q12 shape
    "q_tpch_big_orders",         # Q18 shape (HAVING pre-agg)
    "q_tpch_supplier_variety",   # Q16 shape (broadcast anti join)
    "q_incremental_neardup",     # persisted-band-index near-dup probe
    "q_scd2_apply",              # incremental SCD2 == full rebuild
    "q_curation_pipeline",       # whole curation tier composed, 1 plan
    "q_stream_scd2",             # streaming SCD2 fold == batch rebuild
    # (c) implementation / oracle touched in r6
    "q_winsorize",               # NULL guard (ADVICE), oracle mirrored
    "q_jaccard_topk",            # guard_max_df raise_error gate
    "q_lsh_recall",              # structural hash_sample(0.7) slice
    "q_bpe_tokens",              # rows-only -> recursive trainer replay
    "q_weasel_predict",          # rows-only -> _predict_invariants
    "q_muse_predict",            # rows-only -> _predict_invariants
    "q_quality_classifier",      # rows-only -> rule-floor invariants
    "q_phash_neardup",           # popcount verify (30 s -> 2.5 s)
    "q_index_knn",               # broadcast/blocked path rewrite
    "q_lsh_verified_dedup",      # jaccard_verify distinct()
    "q_merge_changes",           # apply_changes dead column drop
    "q_incremental_dedup",       # cross_run_dedup hash_col param
    # (d) oldest coverage — only round-2 gate rows
    "q_stratified_sample", "q_hash_top_n", "q_domain_cap",
    "q_token_estimate", "q_pii_stats", "q_znorm", "q_rolling_stats",
    "q_sliding_count", "q_disjoint_paa", "q_sfa_words", "q_bag_topk",
    "q_equi_depth_bins", "q_equi_depth_hist", "q_word_bigrams",
    "q_sfa_words_equidepth", "q_derivatives", "q_chi2", "q_chi2_capped",
    # (e) round-3-aged fill to exactly 50
    "q_boss_ensemble_predict", "q_bossvs_predict", "q_shotgun_1nn",
    "q_shotgun_ensemble_predict", "q_tfidf_fit", "q_tfidf_predict",
    # (q_index_range, q_decontaminate and q_gopher_filter dropped from the fill to
    # keep exactly 50 when q_scd2_apply / q_curation_pipeline landed
    # late in the round — both keep their green r3 rows, the gopher
    # rules additionally run INSIDE q_curation_pipeline's gate row,
    # and both are replayed in the closing full-registry run)
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    regs: dict[str, Callable] = {}
    for modname in QUERY_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        regs.update(
            {
                name: fn
                for name, fn in vars(mod).items()
                if name.startswith("q_") and callable(fn)
            }
        )
    ordered: dict[str, Callable] = {
        name: regs[name] for name in ROTATE_FIRST if name in regs
    }
    ordered.update(regs)
    return ordered


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for modname in ORACLE_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        out.update(mod.ORACLES)
    return out
