#!/usr/bin/env python
"""Per-family wall-time scaling audit (VERDICT r5 #7).

Reads two-or-three bench payloads (the BENCH_LATEST.json format written
by bench.py) captured at different scale factors and prints a per-family
table of empirical scaling exponents over the sf0.01 -> sf0.1 decade:

    exponent = log10( t(sf=0.1) / t(sf=0.01) )

1.0 = linear, <1 = overhead-dominated (expected for sub-second queries:
fixed session/plan cost floors the small-SF time, which UNDERSTATES the
exponent — the flag direction is conservative only for genuinely slow
queries, so the table also lists absolute t(0.1)).  Queries with
exponent > FLAG get listed individually: each needs a written
justification in BASELINE.md or a fix.

Usage:
    python tools/scaling_audit.py bench_sf001.json bench_sf01.json \
        [--flag 1.3] [--markdown]
"""

from __future__ import annotations

import argparse
import json
import math
from collections import defaultdict

FAMILIES = [
    ("streaming", ("streaming_",)),
    ("tpch", ("q1", "q2", "q4", "q5", "q6", "q7", "q8", "q9",
              "shipping_priority", "revenue_by_nation")),
    ("dedup", ("dedup_", "minhash_", "decontaminate", "srp_neardup",
               "ivf_neardup")),
    ("ann/embedding", ("ann_", "embedding_", "pq_", "srp_signature",
                       "kmeans")),
    ("text", ("text_", "ngram_", "chunk_", "doc_", "boilerplate",
              "redact", "tfidf", "lang")),
    ("multimodal", ("multimodal_",)),
    ("grouped-stats", ("grouped_",)),
    ("timeseries", ("ewma", "cusum", "zscore", "anomaly", "trend",
                    "theil", "seasonal", "moving_avg", "gap_fill",
                    "date_growth", "weekly", "interarrival", "scd2")),
    ("rank-stats", ("percentile", "weighted_percentile", "gini",
                    "spearman", "wasserstein", "mann_whitney", "ks_",
                    "cross_cdf", "mad_", "js_", "mutual_", "chi",
                    "benford", "quantile")),
    ("sketch-checks", ("approx_", "countmin", "bloom", "heavy_")),
    ("graph", ("graph_", "pagerank", "bfs", "triangle")),
]


def family(name: str) -> str:
    for fam, prefixes in FAMILIES:
        if any(name.startswith(p) for p in prefixes):
            return fam
    return "core"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small", help="bench JSON at the smaller SF")
    ap.add_argument("large", help="bench JSON at the 10x larger SF")
    ap.add_argument("--flag", type=float, default=1.3)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    with open(args.small) as fh:
        small = json.load(fh)
    with open(args.large) as fh:
        large = json.load(fh)
    qs, ql = small["queries"], large["queries"]
    shared = sorted(set(qs) & set(ql))

    rows = []
    for name in shared:
        ts, tl = qs[name], ql[name]
        if ts <= 0 or tl <= 0:
            continue
        rows.append((name, family(name), ts, tl,
                     math.log10(tl / ts)))

    by_fam: dict[str, list] = defaultdict(list)
    for name, fam, ts, tl, e in rows:
        by_fam[fam].append((name, ts, tl, e))

    sep = "|" if args.markdown else " "
    hdr = ["family", "n", "median_exp", "max_exp", "max_t(0.1)s",
           "slowest query"]
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print("  ".join(f"{h:>14s}" for h in hdr))
    for fam in sorted(by_fam):
        entries = by_fam[fam]
        exps = sorted(e for _, _, _, e in entries)
        med = exps[len(exps) // 2]
        mx = max(entries, key=lambda t: t[3])
        slow = max(entries, key=lambda t: t[2])
        cells = [fam, str(len(entries)), f"{med:.2f}", f"{mx[3]:.2f}",
                 f"{slow[2]:.2f}", slow[0]]
        if args.markdown:
            print("| " + " | ".join(cells) + " |")
        else:
            print("  ".join(f"{c:>14s}" for c in cells))

    flagged = [(n, f, ts, tl, e) for n, f, ts, tl, e in rows
               if e > args.flag]
    print()
    if flagged:
        print(f"queries with exponent > {args.flag} "
              "(justify in BASELINE.md or fix):")
        for n, f, ts, tl, e in sorted(flagged, key=lambda t: -t[4]):
            print(f"  {n} [{f}]: {ts:.3f}s -> {tl:.3f}s (exp {e:.2f})")
    else:
        print(f"no query exceeds exponent {args.flag} over the decade")


if __name__ == "__main__":
    main()
