"""Scale-health report: the round-3 monitoring surface end to end.

Checks the properties that decide whether a table is SAFE to process at
cluster scale — key skew (will joins hot-spot?), daily-volume anomalies
(did ingestion break?), embedding normalization (is cosine math valid?)
— then prints the analytics that contextualize failures: heavy-hitter
keys, gap-filled daily series, EWMA trend, z-score flags.

Run:  PYTHONPATH=/root/repo python docs/examples/scale_health_report.py
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from datajudge_spark import WithinRequirement, get_spark
from datajudge_spark.operators.olap import heavy_hitters
from datajudge_spark.operators.timeseries import (
    daily_totals,
    ewma_daily,
    fill_daily_gaps,
    zscore_anomalies,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("scale-health-report")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. gates: fail fast before burning cluster hours ---------------
    orders = WithinRequirement.from_parquet(f"{SF_DIR}/orders.parquet")
    orders.add_heavy_hitter_share_constraint(["o_custkey"], 900_000)
    orders.add_daily_volume_anomaly_constraint(
        "o_orderdate", max_anomalies=500, threshold=6.0
    )
    vecs = WithinRequirement.from_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs.add_embedding_norm_fraction_constraint(
        "embedding", 0.0, lo=0.5, hi=50.0
    )
    for req in (orders, vecs):
        for constraint, r in zip(req, req.test(spark)):
            status = "PASS" if r.outcome else "FAIL"
            detail = r.failure_message or type(constraint).__name__
            print(f"[{status}] {detail}")

    # -- 2. context: what a failing gate would point you at -------------
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    print("\nTop heavy hitters (>=0.5% of orders):")
    hh = heavy_hitters(o, ["o_custkey"], 5_000)
    for r in hh.orderBy(F.col("n").desc()).limit(5).collect():
        print(f"  custkey={r['o_custkey']}  n={r['n']}  share={r['share']}")

    cents = F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    daily = daily_totals(o, "o_orderdate", cents, alias="cents")
    filled = fill_daily_gaps(daily, "cents")
    n_gaps = filled.where("was_gap").count()
    print(f"\nCalendar coverage: {filled.count()} days, {n_gaps} gaps")

    trend = ewma_daily(daily, "cents", lookback=14)
    last = trend.orderBy(F.col("day").desc()).limit(1).collect()[0]
    print(
        "Latest EWMA(14d) of daily revenue: "
        f"{last['ewma'] / 100:,.2f} "
        f"({last['n_terms']} terms)"
    )

    flags = zscore_anomalies(daily, "cents", window_days=7, threshold=3.0)
    n_anom = flags.where("is_anomaly").count()
    print(f"Daily-revenue z-score anomalies (|z|>3): {n_anom}")


if __name__ == "__main__":
    main()
