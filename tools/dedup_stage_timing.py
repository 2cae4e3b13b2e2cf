#!/usr/bin/env python
"""Per-stage timing for the pair-emitting dedup family (VERDICT r9 #6).

The 100-TB claim for `dedup_jaccard` / `dedup_containment` /
`dedup_embedding_neardup` is that their super-linear top-decade wall
clock is qualifying-pair OUTPUT mass, while CANDIDATE GENERATION stays
bounded (rare-shingle blocking / label blocking).  This tool turns that
argument into a measurement: for each query it times

- **candidate**: the candidate-pair stage alone (blocked self-join +
  intersection groupBy, counted — no sizes join, no threshold filter,
  no emission), and
- **full**: the complete contract query (collect of qualifying pairs),

at each given SF dir, printing one markdown table for BASELINE.md.

Usage:
    python tools/dedup_stage_timing.py /root/testdata/sf0.1 \
        /tmp/testdata/sf1 /tmp/testdata/sf3
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from datajudge_spark.pipeline.dedup import (  # noqa: E402
    _distinct_shingles,
    md5_long,
)


def _docs(spark, sf_dir):
    return entrymod._t(spark, sf_dir, "documents")


def _shingle_candidates(spark, sf_dir):
    """jaccard/containment candidate stage: rare-shingle-blocked pair
    intersection counts (the shared front of both operators)."""
    sh = _distinct_shingles(
        _docs(spark, sf_dir), "doc_id", "text", entrymod._SHINGLE_N
    ).select("_id", md5_long("s").alias("s"))
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= entrymod._JACCARD_MAXDF)
        .select("s")
    )
    shf = sh.join(rare, "s")
    a, b = shf.alias("a"), shf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id"), F.col("b._id"))
        .agg(F.count(F.lit(1)))
    )


def _embedding_candidates(spark, sf_dir):
    """embedding near-dup candidate stage: label-blocked id pairs
    (before any cosine work)."""
    e = entrymod._t(spark, sf_dir, "embeddings")
    a = e.select(F.col("label").alias("_blk"), F.col("vec_id").alias("d1"))
    b = e.select(F.col("label").alias("_blk"), F.col("vec_id").alias("d2"))
    return a.join(b, "_blk").where(F.col("d1") < F.col("d2"))


STAGES = {
    "dedup_jaccard": _shingle_candidates,
    "dedup_containment": _shingle_candidates,
    "dedup_embedding_neardup": _embedding_candidates,
}


def main() -> None:
    sf_dirs = sys.argv[1:]
    if not sf_dirs:
        print(__doc__)
        sys.exit(2)
    from datajudge_spark.session import get_spark

    spark = get_spark("dedup-stage-timing")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    print(
        "| query | sf dir | candidates | cand s | output pairs | full s |"
    )
    print("|---|---|---|---|---|---|")
    for sf_dir in sf_dirs:
        # warm the file listing once per dir
        _docs(spark, sf_dir).count()
        entrymod._t(spark, sf_dir, "embeddings").count()
        for name, cand_fn in STAGES.items():
            best_c, best_f, n_cand, n_out = float("inf"), float("inf"), 0, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n_cand = cand_fn(spark, sf_dir).count()
                best_c = min(best_c, time.perf_counter() - t0)
                t0 = time.perf_counter()
                n_out = len(qs[name](spark, sf_dir).collect())
                best_f = min(best_f, time.perf_counter() - t0)
            print(
                f"| {name} | {sf_dir} | {n_cand} | {best_c:.2f} "
                f"| {n_out} | {best_f:.2f} |"
            )


if __name__ == "__main__":
    main()
