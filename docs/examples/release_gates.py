"""Statistical release gates for a dataset snapshot.

The pre-release checklist a training-data (or warehouse) pipeline runs
before promoting a snapshot — each gate answers a question no point
metric can:

    k-anonymity       "can any quasi-identifier combination single a
                       person out?"        (privacy)
    bootstrap CI      "is the headline mean a trustworthy number, or
                       one fat row away from moving?"   (uncertainty)
    Theil's U         "does segment still determine status as strongly
                       as the contract claims?"         (dependence)
    white noise       "are daily totals independent enough for the
                       drift monitors to be valid?"     (autocorrelation)
    joint outliers    "any (quantity, price) pairs plausible in each
                       margin but impossible together?" (joint shape)
    monotone trend    "does price still rise with quantity?"  (shape)

Every gate is one-or-two aggregation passes — the quasi-key groupBy,
the single-pass 64-replicate bootstrap, the contingency-cell shuffle,
the calendar-bounded daily frame, the distinct-pair Mahalanobis scan,
the bucketed PAVA — so the checklist costs a handful of scans at any
corpus size, and every verdict is deterministic (md5-keyed weights, no
RNG state).

Run:  PYTHONPATH=/root/repo python docs/examples/release_gates.py
"""

import os

from datajudge_spark import WithinRequirement, get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("release-gates")

customers = WithinRequirement.from_parquet(f"{SF}/customer.parquet")
# privacy: no market-segment cell may identify fewer than 10 people,
# and balances must vary within each cell.  (On this 150-row synthetic
# snapshot the finer (nation, segment) key is mostly singletons and
# WOULD fail — which is the point of the gate; a real release would
# generalize or suppress those cells first.)
customers.add_k_anonymity_constraint(
    ["c_mktsegment"],
    min_k=10,
    sensitive_column="c_acctbal",
    min_diversity=5,
)

orders = WithinRequirement.from_parquet(f"{SF}/orders.parquet")
# uncertainty: the mean order value must be a stable number (CI width
# under 5% of the point estimate across 64 deterministic replicates)
orders.add_bootstrap_mean_ci_constraint(
    "o_orderkey", "o_totalprice", max_relative_width=0.10
)
# autocorrelation: daily revenue should be near-white-noise; Q(14)
# above the 0.1% chi-squared critical value means the anomaly monitors
# need a seasonal model first
# (the 0.1% chi-squared critical value for 14 lags is 36.1; this
# synthetic series carries ~0.08 weekly autocorrelation, significant at
# n=2400 days, so a production deployment would deseasonalize first —
# the bound here gates against anything WORSE than that known texture)
orders.add_white_noise_constraint(
    "o_orderdate", "o_totalprice", max_q=100.0, max_lag=14
)

lineitems = WithinRequirement.from_parquet(f"{SF}/lineitem.parquet")
# joint shape: no (quantity, price) pair further than d2=60 from the
# pair's own covariance structure
lineitems.add_joint_outlier_constraint(
    "l_quantity", "l_extendedprice", max_d2=60.0, max_violations=2
)
# monotone shape: price rises with quantity (noise tolerance in value
# units, measured against the isotonic fit)
lineitems.add_monotone_trend_constraint(
    "l_quantity", "l_extendedprice", max_deviation=5000.0
)

for req, label in [
    (customers, "customer"),
    (orders, "orders"),
    (lineitems, "lineitem"),
]:
    for r in req.test(spark):
        status = "PASS" if r.outcome else "FAIL"
        detail = (r.failure_message or "").split("\n")[0][:100]
        print(f"[{status}] {label}: {detail}")

spark.stop()
