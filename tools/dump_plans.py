#!/usr/bin/env python
"""Regenerate docs/PLANS.md: the executed physical plan of each headline
contract query at sf0.001, as evidence for the plan properties the test
suite asserts (pushdown, broadcasts, partial aggs, WindowGroupLimit,
no cartesian products, no single-partition windows).

Run:  PYTHONPATH=/root/repo python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# the queries whose plan shape carries the scale argument
HEADLINE = [
    "filtered_count",        # pushdown + codegen
    "broadcast_join_agg",    # star join broadcasts
    "topk_revenue",          # TakeOrderedAndProject
    "asof_join",             # single shuffle, no join operator
    "range_join",            # bucketized equi-join, no BNLJ
    "salted_join_agg",       # join keys include the salt
    "grouped_topk",          # WindowGroupLimit
    "profile_table",         # two clean aggregates
    "key_skew",              # no window despite entropy/HHI
    "psi_drift",             # one conditional-agg scan
    "moving_avg_daily",      # window above the daily aggregate
    "dedup_minhash_lsh",     # partial-min signature aggs
    "ks_statistic_continuous",  # ranged passes, no global sort
    "cross_cdf",             # range-partitioned histogram windows
    # round 3
    "latest_snapshot",       # Partial WindowGroupLimit below the exchange
    "cube_agg",              # one Expand pass for all grouping sets
    "heavy_hitters",         # broadcast 1-row total
    "ewma_daily",            # equi-join lookback, exact-decimal weights
    "srp_neardup_pairs",     # signature-blocked equi-join, no BNLJ
    "shipping_priority_topk",  # pushdown + broadcast dim + TakeOrdered
    "revenue_by_nation",     # 3 broadcast dims on the 5-way star
    # round 3, later additions
    "gini_revenue",          # bucket-partitioned rank windows
    "chi_squared",           # margins from cells, tiny cross join
    "grouping_sets_agg",     # one Expand pass
    "embedding_covariance",  # co-partitioned self-join, decimal sums
    "kaplan_meier",          # window over the duration aggregate
    "association_rules",     # basket-key equi self-join
    "q10_returned_items",    # pushed filters + broadcasts + TakeOrdered
    "grouped_median",        # group-partitioned cumulative window
    "wasserstein",           # bucketed windows + driver boundary fold
    "session_paths",         # in-array sort, no fact-table window
    "equidepth_histogram",   # broadcast thresholds, one bucketing scan
    "text_bigram_logprob",   # map-side bigram build, partial aggs
    # round 4
    "spearman",              # broadcast small rank map, histogram folds
    "grouped_ks",            # one conditional-agg histogram, multi-cum
    "theil_sen_slope",       # pair join on the daily frame only
    "ann_topk_pq",           # map-only encode + LUT scoring, 1 window
    # round 4, later additions
    "ann_topk_ivf_pq",       # cell-pruned ADC, broadcast LUT side
    "grouped_quantile_grid", # one histogram scan for all (group, decile)
    "boilerplate_ngrams",    # fully-partial agg + TakeOrderedAndProject
    "graph_triangles",       # hash two-hop joins, no cartesian
    "mutual_information",    # cached cells, broadcast margins
    # round 5
    "q21_suppliers_waiting",  # semi+anti sharing the build join's key
    "q19_disjunctive_revenue",  # OR-of-ANDs residual on a hash join
    "countmin_check",        # map-side cell collapse, broadcast probe
    "bloom_filter_check",    # map-only probe vs literal bitmap map
    # round 6
    "q20_volume_suppliers",  # nested semi chain, filters below aggs
    "q13_customer_order_counts",  # left outer keeps k=0, 2-level agg
    "q17_small_quantity_revenue",  # semi below agg+probe, exact cut
    "pareto_frontier",       # bucket-partitioned running max
    "ivf_neardup_pairs",     # salted cell-blocked pair join
    # round 6, third session
    "bootstrap_ci_mean",     # index-explode + map-side combine, 1 scan
    "acf_daily",             # broadcast lag self-join on daily frame
    "k_anonymity",           # one quasi-key grouped pass
    "mahalanobis_outliers",  # broadcast stats digest + TakeOrdered
    "isotonic_calibration",  # relational PAVA over bounded grids
    "graph_assortativity",   # degree joins on the canonical edge set
    # round 8
    "anderson_darling",      # bucketed cumulative, no 1-partition window
    "grouped_psi",           # group-partitioned totals window
    "jarque_bera",           # one scan of four decimal power sums
    "kendall_tau",           # daily frame materialized once, 4 branches
    "cuped_ab",              # one sufficient-statistics scan
    "logrank",               # KM histogram + duration-ordered O/E/V
    # round 9
    "minhash_query_neardup",  # broadcast query bands, no corpus self-join
    "ratio_ab_ztest",         # one conditional-agg scan per side, no join
    "sample_ratio_mismatch",  # bounded level fold above one groupBy count
    "pettitt_changepoint",    # windows on the daily frame, TakeOrdered(1)
    "dispersion_index",       # two map-side-partial aggregations
    # round 9, second session
    "welch_ttest",            # one conditional-agg scan, no join
    "brown_forsythe",         # broadcast median join-back, bounded fold
    "kruskal_wallis",         # bucketed rank cumulative, no global window
    "grouped_ztest_bh",       # BH windows on the bounded group digest
    "cmh_test",               # one conditional-agg scan, stratum fold
    "nelson_aalen",           # persisted duration histogram, 1 scan
    "durbin_watson",          # persisted daily frame, ordered folds
    "q9_product_profit",      # broadcast dim chains, integer profit
    "sequence_monotonicity",  # key-partitioned window only
    "chao1_richness",         # two partial-agg shuffles
    # round 11
    "cox_score",              # KM histogram, decimal risk sums, plain
                              # decimal U/I fold (no ordered window)
    "qte_deciles",            # one histogram scan, bucketed cumulative,
                              # all (variant, decile) cells in one agg
    # round 12
    "rmst",                   # summation-by-parts jump fold: no lag,
                              # no unpartitioned window, plain agg
    "logrank",                # bucketed at-risk cums; O/E/V as one
                              # decimal aggregate, no ordered window
    "grouped_qte",            # all (segment, variant) cells, one
                              # histogram pass, bucketed cumulative
    "decontaminate_winnow",   # distinct train fp set, int64 semi-join
]


def main() -> None:
    from datajudge_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = [
        "# Physical-plan audit (generated by tools/dump_plans.py)",
        "",
        "Executed plans of the headline contract queries at sf0.001 on "
        "`local[*]`. The properties called out inline are ASSERTED in "
        "`tests/test_plans.py`; this file is the human-readable evidence. "
        "Regenerate after plan-affecting changes.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(REPO, "docs", "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
