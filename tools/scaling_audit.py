#!/usr/bin/env python
"""Per-family wall-time scaling audit (VERDICT r5 #7, three-point fit
per r6 #7).

Reads TWO OR MORE bench payloads (the BENCH_LATEST.json format written
by bench.py) captured at different scale factors and prints a per-family
table of empirical scaling exponents, least-squares-fitted over ALL
points:

    t ~ c * sf^e   =>   e = slope of log10(t) vs log10(sf)

With the full three-point ladder (sf0.001 -> 0.01 -> 0.1, two decades)
the fit is far less floored by fixed session/plan overhead than the old
single-decade ratio: an overhead-dominated sub-second query shows a
flat small-SF segment AND a steeper large-SF segment, and the fitted
slope lands between them instead of hiding the steep end.  1.0 =
linear, <1 = overhead-dominated.  Queries with fitted exponent > FLAG
get listed individually: each needs a written justification in
BASELINE.md or a fix.  The table also lists absolute t at the largest
SF — the number that actually matters.

Usage:
    python tools/scaling_audit.py bench_sf0001.json bench_sf001.json \
        bench_sf01.json [--flag 1.3] [--markdown]
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


def _fit_exponent(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log10(t) vs log10(sf)."""
    xs = [math.log10(sf) for sf, _ in points]
    ys = [math.log10(t) for _, t in points]
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "benches", nargs="+",
        help="two or more bench JSONs at distinct scale factors",
    )
    ap.add_argument("--flag", type=float, default=1.3)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    if len(args.benches) < 2:
        ap.error("need at least two bench payloads")

    payloads = []
    for path in args.benches:
        with open(path) as fh:
            payloads.append(json.load(fh))
    payloads.sort(key=lambda p: p["sf"])
    sfs = [p["sf"] for p in payloads]
    if len(set(sfs)) != len(sfs):
        ap.error(f"duplicate scale factors: {sfs}")

    shared = sorted(
        set.intersection(*[set(p["queries"]) for p in payloads])
    )
    rows = []
    for name in shared:
        pts = [(p["sf"], p["queries"][name]) for p in payloads]
        if any(t <= 0 or sf <= 0 for sf, t in pts):
            continue
        ts, tl = pts[0][1], pts[-1][1]
        rows.append((name, family(name), ts, tl, _fit_exponent(pts)))

    by_fam: dict[str, list] = defaultdict(list)
    for name, fam, ts, tl, e in rows:
        by_fam[fam].append((name, ts, tl, e))

    sep = "|" if args.markdown else " "
    hdr = ["family", "n", "median_exp", "max_exp",
           f"max_t({sfs[-1]})s", "slowest query"]
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
        print(f"queries with fitted exponent > {args.flag} over "
              f"sf {sfs[0]} -> {sfs[-1]} "
              "(justify in BASELINE.md or fix):")
        for n, f, ts, tl, e in sorted(flagged, key=lambda t: -t[4]):
            print(f"  {n} [{f}]: {ts:.3f}s -> {tl:.3f}s (exp {e:.2f})")
    else:
        print(f"no query exceeds fitted exponent {args.flag} over "
              f"sf {sfs[0]} -> {sfs[-1]}")


if __name__ == "__main__":
    main()
