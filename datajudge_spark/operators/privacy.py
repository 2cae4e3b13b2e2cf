"""Privacy-risk digests: k-anonymity and l-diversity over quasi-identifiers.

A training-data pipeline that carries user-derived rows needs a release
gate of the form "no quasi-identifier combination is rare enough to
single a person out" (k-anonymity: every group of rows agreeing on the
quasi-identifier columns has size >= k) and "within each group the
sensitive attribute actually varies" (l-diversity: >= l distinct
sensitive values per group).  Both reduce to ONE grouped aggregation on
the quasi-identifier key — partial-aggregated, no skew hazard (a hot
group is by definition a LARGE, i.e. safe, group) — followed by a 1-row
digest, so the check costs a single shuffle at any corpus size.

Extension — no reference counterpart; the reference's uniqueness family
(/root/reference/src/datajudge/constraints/miscs.py:50-121) gates the
opposite direction (groups must be SMALL/unique); this gates re-
identification risk (groups must be LARGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    min_l: int | None = None,
) -> DataFrame:
    """One-row k-anonymity (and optional l-diversity) digest.

    Returns ``(n_rows, n_groups, min_group_size, n_small_groups,
    n_at_risk_rows, at_risk_fraction[, min_diversity,
    n_low_diversity_groups])`` where a group is the set of rows sharing
    one value combination of ``quasi_cols``; "small" means size < ``k``;
    ``n_at_risk_rows`` counts rows living in small groups.  With
    ``sensitive_col``, ``min_diversity`` is the smallest per-group
    COUNT(DISTINCT sensitive) — NULL sensitive values don't count as a
    diversity value, so an all-NULL group scores 0 — and
    ``n_low_diversity_groups`` counts groups under ``min_l``.

    NULL quasi-identifier values form their own group (SQL GROUP BY
    semantics): two rows that are both blank agree with each other.

    Plan: one partial-agg'd shuffle on the quasi key (plus the distinct
    expansion when ``sensitive_col`` is given), then a 1-row fold.
    Exact integer counts throughout; only ``at_risk_fraction`` divides,
    once, rounded to 6dp.
    """
    if k < 1:
        raise ValueError("k must be a positive group size")
    if min_l is not None and sensitive_col is None:
        raise ValueError("min_l requires sensitive_col")
    if sensitive_col is not None and min_l is None:
        min_l = 2
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__d"))
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    small = F.col("__n") < F.lit(k)
    digest = [
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("__n").cast("bigint").alias("min_group_size"),
        F.coalesce(F.sum(F.when(small, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_small_groups"),
        F.coalesce(
            F.sum(F.when(small, F.col("__n")).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_at_risk_rows"),
    ]
    if sensitive_col is not None:
        digest += [
            F.min("__d").cast("bigint").alias("min_diversity"),
            F.coalesce(
                F.sum(F.when(F.col("__d") < F.lit(min_l), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_low_diversity_groups"),
        ]
    out = groups.agg(*digest)
    frac = F.when(
        F.col("n_rows") > 0,
        F.round(
            F.col("n_at_risk_rows").cast("double") / F.col("n_rows"), 6
        ),
    )
    cols = [
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_small_groups",
        "n_at_risk_rows",
        frac.alias("at_risk_fraction"),
    ]
    if sensitive_col is not None:
        cols += ["min_diversity", "n_low_diversity_groups"]
    return out.select(*cols)


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    limit: int = 10,
) -> DataFrame:
    """The ``limit`` rarest quasi-identifier combinations under ``k``:
    ``(*quasi_cols, group_size)``, smallest groups first (ties broken by
    the quasi columns for a deterministic sample).  Counterexample feed
    for the k-anonymity gate; the sort is a capped TopK
    (TakeOrderedAndProject), never a global sort.
    """
    if k < 1:
        raise ValueError("k must be a positive group size")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .where(F.col("group_size") < k)
        .orderBy("group_size", *quasi_cols)
        .limit(limit)
    )
