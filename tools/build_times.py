#!/usr/bin/env python
"""Split each contract query's wall into BUILD (fn(spark, sf_dir): pure
driver-side DataFrame construction, mostly py4j round-trips) and EXEC
(collect(): analysis + optimization + jobs).  The build half never
touches executors, so a large build share marks a query whose cost is
the Python->JVM plan-construction boundary (guide §7.3), not data.

Usage:
    python tools/build_times.py [--reps 2] [query ...]
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
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from datajudge_spark.session import get_spark

    spark = get_spark("datajudge-spark-buildtimes")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("lineitem", "orders", "customer", "supplier", "nation",
                 "documents", "embeddings", "events"):
        entrymod._t(spark, args.sf_dir, name).count()
    import pandas as _pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 8, 1, n_part).mapInPandas(_noop, "id long").count()

    qs = entrymod.queries()
    if args.queries:
        qs = {k: qs[k] for k in args.queries}

    out = {}
    for _ in range(args.reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            rec = out.setdefault(
                name, {"build": float("inf"), "exec": float("inf")}
            )
            rec["build"] = min(rec["build"], t1 - t0)
            rec["exec"] = min(rec["exec"], t2 - t1)
    for rec in out.values():
        rec["build"] = round(rec["build"], 4)
        rec["exec"] = round(rec["exec"], 4)
        rec["total"] = round(rec["build"] + rec["exec"], 4)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    tb = sum(v["build"] for v in out.values())
    te = sum(v["exec"] for v in out.values())
    print(f"# build_total={tb:.1f}s exec_total={te:.1f}s")
    for name, v in sorted(out.items(), key=lambda kv: -kv[1]["build"])[:30]:
        print(f"build={v['build']:7.3f} exec={v['exec']:7.3f}  {name}")


if __name__ == "__main__":
    main()
