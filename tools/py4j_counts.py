#!/usr/bin/env python
"""Per-query py4j round-trip counter + Python-CPU split for the BUILD
phase (fn(spark, sf_dir)).  Round-trips x ~0.3 ms = pure driver-side
plan-construction overhead; a high build wall with LOW round-trips
means the build runs eager Spark jobs (probes, training loops) instead.

Usage: python tools/py4j_counts.py [--out f.json] [query ...]
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

    spark = get_spark("datajudge-spark-py4jcount")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("lineitem", "orders", "customer", "supplier", "nation",
                 "documents", "embeddings", "events"):
        entrymod._t(spark, args.sf_dir, name).count()

    from py4j.java_gateway import GatewayClient

    counter = {"n": 0}
    orig = GatewayClient.send_command

    def counted(self, *a, **k):
        counter["n"] += 1
        return orig(self, *a, **k)

    GatewayClient.send_command = counted

    qs = entrymod.queries()
    if args.queries:
        qs = {k: qs[k] for k in args.queries}

    out = {}
    for name, fn in qs.items():
        c0 = counter["n"]
        w0 = time.perf_counter()
        p0 = time.process_time()
        df = fn(spark, args.sf_dir)
        build_rt = counter["n"] - c0
        build_w = time.perf_counter() - w0
        build_cpu = time.process_time() - p0
        c1 = counter["n"]
        w1 = time.perf_counter()
        df.collect()
        out[name] = {
            "build_rt": build_rt,
            "build_s": round(build_w, 4),
            "build_cpu": round(build_cpu, 4),
            "exec_rt": counter["n"] - c1,
            "exec_s": round(time.perf_counter() - w1, 4),
        }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    tot_rt = sum(v["build_rt"] + v["exec_rt"] for v in out.values())
    print(f"# total_roundtrips={tot_rt}")
    for name, v in sorted(out.items(), key=lambda kv: -kv[1]["build_rt"])[:25]:
        print(f"rt={v['build_rt']:6d} build={v['build_s']:7.3f} "
              f"cpu={v['build_cpu']:6.3f} exec_rt={v['exec_rt']:5d}  {name}")


if __name__ == "__main__":
    main()
