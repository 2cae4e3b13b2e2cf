"""Statistical-testing walkthrough: the rank / distribution / survival
surface added in round 3, plus the constraint factories that gate on it.

Every statistic here is engine-exact (integer/decimal sufficient
statistics; doubles only in final expressions) and avoids global sorts:
ranks come from bucket-partitioned cumulatives, survival curves from
the distinct-duration histogram — see docs/QUERIES.md for the per-query
scale rationale.

Run:  PYTHONPATH=/root/repo python docs/examples/statistics_report.py
"""

import os

from pyspark.sql import functions as F

from datajudge_spark import BetweenRequirement, WithinRequirement, get_spark
from datajudge_spark.operators.associations import association_rules
from datajudge_spark.operators.stats import (
    chi_squared_independence,
    gini_coefficient,
    mann_whitney_u,
    spearman_correlation,
)
from datajudge_spark.operators.timeseries import kaplan_meier
from datajudge_spark.pipeline.similarity import pca_components
from datajudge_spark.sources import normalize_event_time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("statistics-report")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    events = normalize_event_time(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )

    # 1. how concentrated is revenue across customers?
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("v")
    )
    g = gini_coefficient(per_cust, "v").first()
    print(f"== revenue gini over {g['n']} customers: {g['gini']:.4f} ==")

    # 2. do finished and open orders differ in size? (location shift)
    base = orders.select(
        cents.alias("c"), F.col("o_orderstatus").alias("g")
    )
    mw = mann_whitney_u(base, "c", "g", "F", "O").first()
    print(f"== Mann-Whitney z between F/O order totals: {mw['z']:.3f} ==")

    # 3. monotone association between quantity and price
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rho = spearman_correlation(
        li.select("l_quantity", "l_extendedprice"),
        "l_quantity",
        "l_extendedprice",
    ).first()
    print(f"== spearman(quantity, extendedprice) = {rho['rho']:.4f} ==")

    # 4. is event type independent of weekday?
    dow = F.pmod(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ),
        F.lit(7),
    )
    chi = chi_squared_independence(
        events.select(F.col("event_type").alias("et"), dow.alias("dow")),
        "et",
        "dow",
    ).first()
    print(f"== chi2(event_type x weekday) = {chi['chi2']:.2f} "
          f"(dof {chi['dof']}) ==")

    # 5. user-lifetime survival (14-day churn horizon)
    per_user = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("fd"),
        F.max(F.col("ts").cast("date")).alias("ld"),
    )
    horizon = events.agg(
        F.date_sub(F.max(F.col("ts").cast("date")), 14).alias("__h")
    )
    subj = per_user.join(F.broadcast(horizon)).select(
        F.datediff("ld", "fd").alias("dur"),
        F.when(F.col("ld") < F.col("__h"), 1).otherwise(0).alias("ev"),
    )
    tail = (
        kaplan_meier(subj, "dur", "ev")
        .orderBy(F.desc("duration"))
        .limit(1)
        .first()
    )
    print(f"== survival at the longest lifetime ({tail['duration']}d): "
          f"{tail['survival']:.3f} ==")

    # 6. which event types co-occur? (top lift)
    rules = (
        association_rules(events, "user_id", "event_type")
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(3)
        .collect()
    )
    for r in rules:
        print(f"   {r['item_a']} -> {r['item_b']}: lift {r['lift']:.3f} "
              f"confidence {r['confidence']:.3f}")

    # 7. embedding principal components (covariance in-engine, eigh on
    #    the k x k matrix driver-side)
    comps = pca_components(emb, "vec_id", "embedding", k=3, components=16)
    evs = ", ".join(f"{ev:.5f}" for ev, _ in comps)
    print(f"== top-3 eigenvalues of the embedding covariance: {evs} ==")

    # 8. the same statistics as CI gates
    req = WithinRequirement.from_parquet(f"{SF_DIR}/orders.parquet")
    req.add_gini_max_constraint("o_totalprice", max_gini=0.9)
    req.add_spearman_correlation_constraint(
        "o_custkey", "o_totalprice", min_rho=-0.3, max_rho=0.3
    )  # customer id must NOT predict order size
    breq = BetweenRequirement.from_parquets(
        f"{SF_DIR}/orders.parquet", f"{SF_DIR}/orders.parquet"
    )
    breq.add_mann_whitney_constraint("o_totalprice", "o_totalprice")
    breq.add_wasserstein_max_constraint(
        "o_totalprice", "o_totalprice", max_distance=0.0
    )  # identical snapshots: zero earth-mover drift
    for result in req.test(spark) + breq.test(spark):
        print(f"   gate: {'PASS' if result.outcome else 'FAIL'}")


if __name__ == "__main__":
    main()
