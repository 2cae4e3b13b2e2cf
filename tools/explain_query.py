#!/usr/bin/env python
"""Dump .explain("formatted") of named contract queries to files.

Usage:
    python tools/explain_query.py --suffix before spearman wasserstein
    python tools/explain_query.py --suffix after --sf-dir /root/testdata/sf0.1 spearman

Writes plans/r13/<query>_<suffix>.txt for each named query.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", required=True)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r13"))
    args = ap.parse_args()

    from datajudge_spark.session import get_spark

    spark = get_spark("datajudge-spark-explain")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)

    qs = entrymod.queries()
    for name in args.queries:
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
