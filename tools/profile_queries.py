#!/usr/bin/env python
"""Per-query structural profile: wall seconds, Spark job count, stage
count and task count, gathered with a job group + StatusTracker.

Job/stage counts are deterministic (unlike wall clock on a noisy box),
so this is the instrument for finding queries that run more actions or
shuffles than their algorithm needs (guide §1: measure first; §2.4:
remove shuffles outright).

Usage:
    python tools/profile_queries.py                  # all queries
    python tools/profile_queries.py spearman ...     # a subset
    python tools/profile_queries.py --out prof.json
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
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from datajudge_spark.session import get_spark

    spark = get_spark("datajudge-spark-profile")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("lineitem", "orders", "customer", "supplier", "nation",
                 "documents", "embeddings", "events"):
        entrymod._t(spark, args.sf_dir, name).count()

    import pandas as _pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    n_part = sc.defaultParallelism
    spark.range(0, n_part * 8, 1, n_part).mapInPandas(_noop, "id long").count()

    qs = entrymod.queries()
    if args.queries:
        qs = {k: qs[k] for k in args.queries}

    tracker = sc.statusTracker()
    out = {}
    for name, fn in qs.items():
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        rows = df.collect()
        elapsed = time.perf_counter() - t0
        sc.setJobGroup("prof_idle", "idle")
        jids = tracker.getJobIdsForGroup(group)
        n_jobs = len(jids)
        n_stages = 0
        n_tasks = 0
        for jid in jids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                n_stages += 1
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_tasks += si.numTasks
        out[name] = {
            "s": round(elapsed, 3),
            "jobs": n_jobs,
            "stages": n_stages,
            "tasks": n_tasks,
            "rows": len(rows),
        }
        print(json.dumps({"q": name, **out[name]}), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    total = sum(v["s"] for v in out.values())
    print(f"# total={total:.1f}s jobs={sum(v['jobs'] for v in out.values())} "
          f"stages={sum(v['stages'] for v in out.values())}")


if __name__ == "__main__":
    main()
