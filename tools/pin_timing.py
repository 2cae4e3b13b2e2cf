#!/usr/bin/env python
"""Standalone min-of-N pin for a handful of named contract queries.

The bench suite interleaves 267 queries, so a single query's number can
carry environment noise (box stalls, worker reaping).  This pins a few
queries in ISOLATION — fresh warmed session, back-to-back min-of-N — to
separate plan changes from environment when a round-over-round bench
delta needs adjudication (VERDICT r10 #3: theil_sen_slope).

Usage:
    python tools/pin_timing.py theil_sen_slope minhash_query_recall \
        [--runs 5] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line per query: {"query": ..., "min_s": ..., "runs":
[...], "calib_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    from datajudge_spark.session import get_spark

    spark = get_spark("datajudge-spark-pin")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("lineitem", "orders", "customer", "supplier", "nation",
                 "documents", "embeddings", "events"):
        entrymod._t(spark, args.sf_dir, name).count()

    def _noop(batches):
        for b in batches:
            yield b

    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 8, 1, n_part).mapInPandas(_noop, "id long").count()

    def _calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0
            for i in range(10_000_000):
                acc += i * i
            best = min(best, time.perf_counter() - t0)
        assert acc != 0
        return round(best, 4)

    calib_s = _calibrate()
    qs = entrymod.queries()
    for name in args.queries:
        fn = qs[name]
        runs = []
        for _ in range(args.runs + 1):  # first run is warm-up, dropped
            start = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            runs.append(round(time.perf_counter() - start, 4))
        print(json.dumps({
            "query": name,
            "min_s": min(runs[1:]),
            "runs": runs[1:],
            "warmup_s": runs[0],
            "calib_s": calib_s,
            "sf_dir": args.sf_dir,
        }))


if __name__ == "__main__":
    main()
