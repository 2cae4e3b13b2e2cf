"""Warehouse-analytics walkthrough: the profiling / drift / time-series
surface on the TPC-H-ish tables.

Each stage is one or two driver actions over lazy plans whose scale
properties are asserted in tests/test_plans.py — see docs/PLANS.md for
the executed plans.

Run:  PYTHONPATH=/root/repo python docs/examples/analytics_report.py
"""

import os

from pyspark.sql import functions as F

from datajudge_spark import get_spark
from datajudge_spark.operators.profile import (
    distribution_stats,
    grouped_topk,
    pairwise_corr,
    profile_numeric,
)
from datajudge_spark.operators.range_join import range_join
from datajudge_spark.operators.skew import salted_join
from datajudge_spark.operators.stats import psi_drift_conditional
from datajudge_spark.operators.timeseries import daily_totals, moving_stats
from datajudge_spark.sources import normalize_event_time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("analytics-report")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # get_spark sets nanosAsLong, so a TIMESTAMP(NANOS) events file scans
    # as epoch-nanos BIGINT — normalize to a real timestamp before any
    # time arithmetic (unix_timestamp on raw BIGINT parses to NULL)
    events = normalize_event_time(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    )

    # 1. profile the fact table (exact distincts: two clean aggregates)
    print("== lineitem profile ==")
    for r in profile_numeric(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).collect():
        print(f"  {r.col_name}: n={r.n_rows} nulls={r.n_nulls} "
              f"distinct={r.n_distinct} range=[{r.min_val}, {r.max_val}] "
              f"mean={r.mean_val}")

    # 2. correlations in one scan
    print("== correlations ==")
    for r in pairwise_corr(li, ["l_quantity", "l_extendedprice", "l_discount"]).collect():
        print(f"  corr({r.col_x}, {r.col_y}) = {r.corr}")

    # 3. is the join key skewed enough to need salting?
    skew = distribution_stats(li, "l_orderkey").collect()[0]
    print(f"== l_orderkey skew: top_share={skew.top_share} hhi={skew.hhi} ==")
    joined = (
        salted_join(
            li.select("l_orderkey", "l_extendedprice"),
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
            ),
            on="l_orderkey",
            num_salts=8,
        )
        if skew.top_share > 0.001  # demo threshold; production: ~0.05
        else li.join(orders, li.l_orderkey == orders.o_orderkey)
    )
    rev = joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
        .alias("revenue")
    )
    print("== revenue by priority (salted join) ==")
    for r in rev.orderBy("o_orderpriority").collect():
        print(f"  {r.o_orderpriority}: {r.revenue}")

    # 4. distribution drift between two event populations (one scan)
    psi = psi_drift_conditional(
        events, "value",
        F.col("event_type") == "click", F.col("event_type") == "view",
        lo=0.0, hi=500.0, n_buckets=10,
    ).collect()[0].psi
    print(f"== click-vs-view value PSI: {psi} "
          f"({'stable' if psi < 0.1 else 'drifted'}) ==")

    # 5. clicks inside the 2-hour window after a purchase (same user)
    window_s = 2 * 3600
    matched = range_join(
        events.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.unix_timestamp("ts").alias("p"),
        ),
        events.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_timestamp("ts").alias("start"),
            (F.unix_timestamp("ts") + window_s).alias("end"),
        ),
        "p", "start", "end", bucket_width=window_s, keys=["user_id"],
    ).count()
    print(f"== clicks within 2h after a purchase: {matched} ==")

    # 6. 7-day moving revenue (window over the daily frame only)
    daily = daily_totals(
        orders, "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"),
        alias="cents",
    )
    tail = moving_stats(daily, "cents", 7).orderBy(F.desc("day")).limit(3)
    print("== last 3 days, 7-day moving revenue ==")
    for r in sorted(tail.collect(), key=lambda r: r.day):
        print(f"  {r.day}: total={r.cents / 100:.2f} "
              f"avg7={r.moving_sum / r.window_n / 100:.2f}")

    # 7. top 3 documents per source (WindowGroupLimit)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = grouped_topk(
        docs.select("doc_id", "source", "n_chars"),
        "source", [F.col("n_chars").desc(), F.col("doc_id")], 3,
    )
    print(f"== per-source top-3 longest docs: {top.count()} rows ==")


if __name__ == "__main__":
    main()
