"""One-scan table profiling and correlation analytics.

No reference counterpart: datajudge retrieves each statistic with its own
query (e.g. db_access.py get_min/get_max/get_uniques issue separate
SELECTs per constraint).  At 100 TB, N separate scans for N statistics is
the difference between one pass over the corpus and a day of I/O, so the
profiler folds every per-column statistic into a single aggregate and
unpivots the one resulting row driver-side (the unpivot touches |columns|
values, not data).

Scale notes
-----------
* ``profile_numeric`` with ``exact_distinct=False`` (HLL sketches) is
  ONE scan + one partial-aggregated shuffle of a single row per
  partition — the scale mode.  Exact mode runs a SECOND aggregate for
  the distinct counts and cross-joins the two 1-row frames: mixing
  multi-``count_distinct`` with ordinary aggregates in one agg makes
  Catalyst's RewriteDistinctAggregates emit an Expand plan whose
  analysis cost blows up super-linearly in the aggregate count
  (measured 4-46 s of driver planning for 4 columns x 5 stats vs a
  stable ~2 s split) — two clean aggregates beat one pathological one,
  and the extra scan reads only the profiled columns.
* ``pairwise_corr`` computes all column-pair Pearson correlations in ONE
  aggregate using Spark's numerically stable one-pass co-moment
  implementation — |pairs| running co-moments updated per row, one scan,
  no joins.
* ``grouped_topk`` is the per-group top-k: ``row_number() <= k`` compiles
  to WindowGroupLimit (Spark >= 3.5), which prunes to k rows *per
  partition before the shuffle*, so the exchange moves O(groups * k)
  rows, not the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame,
    columns: Sequence[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile of numeric columns in one scan.

    Returns one row per profiled column:
    ``col_name, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val``
    with min/max/mean as rounded doubles.  The mean is a DECIMAL(28,8)
    sum (exact, summation-order independent) cast to double and THEN
    divided — one IEEE double division of identical operands is
    bit-identical across engines, while decimal division would expose
    each engine's decimal-scale rounding at round-to-6 boundaries.
    """
    from ..pipeline._util import materialize_once, spread

    # Narrow projection, spread wide, computed once: a single-file scan
    # reads as ONE partition, which serialized BOTH aggregate passes'
    # per-row work (4 decimal sums + the multi-distinct Expand) on one
    # core — measured as two sequential ~0.8-1.0 s single-task stages.
    # spread() no-ops at real corpus scale; the persist means the exact-
    # distinct mode's second aggregate reads cached blocks instead of
    # rescanning the source.  Aggregate values are partition-count
    # independent (counts, min/max, exact decimal sums), so results are
    # identical.
    base = df.select(*columns)
    if exact_distinct:
        base = materialize_once(spread(base))
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.min(c).cast("double").alias(f"__mn_{c}"),
            F.max(c).cast("double").alias(f"__mx_{c}"),
            F.sum(F.col(c).cast("decimal(28,8)")).alias(f"__sm_{c}"),
        ]
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
    one = base.agg(*aggs)
    if exact_distinct:
        # separate distinct-only aggregate (see module docstring), glued
        # on as a 1-row x 1-row cross join
        distincts = base.agg(
            *[F.count_distinct(F.col(c)).alias(f"__nd_{c}") for c in columns]
        )
        one = one.crossJoin(distincts)

    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.round(F.col(f"__mn_{c}"), 6).alias("min_val"),
            F.round(F.col(f"__mx_{c}"), 6).alias("max_val"),
            F.round(
                F.col(f"__sm_{c}").cast("double") / F.col(f"__nn_{c}"), 6
            ).alias("mean_val"),
        )
        for c in columns
    ]
    # unpivot the single aggregated row into |columns| rows (driver-scale)
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def profile_drift(
    df1: DataFrame,
    df2: DataFrame,
    columns: Sequence[str],
    mean_rel_tol: float = 0.05,
    null_abs_tol: float = 0.01,
    distinct_rel_tol: float = 0.2,
) -> DataFrame:
    """Column-profile drift between two snapshots: one row per column
    ``(col_name, mean_a, mean_b, mean_rel_delta, null_frac_a,
    null_frac_b, distinct_a, distinct_b, drifted)``.

    The source-health gate a training pipeline runs between ingestion
    batches: both sides are one :func:`profile_numeric` scan (N columns
    of statistics per pass), the comparison joins the two |columns|-row
    profiles — nothing rescans the data per column.  Deltas are
    computed from the profile's already-rounded means (identical in
    both engines by :func:`profile_numeric`'s construction), so the
    report is deterministic cross-engine and never sits one ulp from
    a tolerance boundary.  ``drifted`` is true when any of: relative mean shift
    > ``mean_rel_tol``, null-fraction shift > ``null_abs_tol``,
    relative distinct-count shift > ``distinct_rel_tol``.

    Extension — generalizes the reference's Between requirements
    (mean/uniques deviation gates, src/datajudge/requirements.py) to a
    one-shot multi-column report.
    """
    p1 = profile_numeric(df1, columns)
    p2 = profile_numeric(df2, columns)
    a = p1.select(
        "col_name",
        F.col("n_rows").alias("__n_a"),
        F.col("n_nulls").alias("__nulls_a"),
        F.col("n_distinct").alias("distinct_a"),
        F.col("mean_val").alias("mean_a"),
    )
    b = p2.select(
        "col_name",
        F.col("n_rows").alias("__n_b"),
        F.col("n_nulls").alias("__nulls_b"),
        F.col("n_distinct").alias("distinct_b"),
        F.col("mean_val").alias("mean_b"),
    )
    j = a.join(b, "col_name")
    # guard n=0 (empty snapshot): ANSI mode throws on 0/0; NULL here is
    # then collapsed by the coalesces below
    nf_a = F.when(
        F.col("__n_a") > 0,
        F.col("__nulls_a").cast("double") / F.col("__n_a"),
    )
    nf_b = F.when(
        F.col("__n_b") > 0,
        F.col("__nulls_b").cast("double") / F.col("__n_b"),
    )
    rel = F.when(
        F.col("mean_a") != 0,
        F.abs(F.col("mean_b") - F.col("mean_a")) / F.abs(F.col("mean_a")),
    )
    # Every *_ok boolean must collapse NULL -> a definite verdict, or an
    # empty snapshot / all-null column yields drifted = NULL, which a
    # downstream `if row['drifted']` silently treats as "no drift".
    # Rule: a statistic that is NULL on BOTH sides is identical (ok);
    # NULL on one side only is a regime change (drift).
    mean_ok = F.coalesce(
        rel <= F.lit(mean_rel_tol),
        F.col("mean_b") == F.col("mean_a"),
        F.col("mean_a").isNull() & F.col("mean_b").isNull(),
    )
    null_ok = F.coalesce(
        F.abs(nf_b - nf_a) <= F.lit(null_abs_tol),
        (F.col("__n_a") == 0) & (F.col("__n_b") == 0),
    )
    dist_ok = (
        F.abs(F.col("distinct_b") - F.col("distinct_a"))
        <= F.lit(distinct_rel_tol) * F.col("distinct_a")
    )
    return j.select(
        "col_name",
        "mean_a",
        "mean_b",
        F.round(rel, 6).alias("mean_rel_delta"),
        F.round(nf_a, 6).alias("null_frac_a"),
        F.round(nf_b, 6).alias("null_frac_b"),
        "distinct_a",
        "distinct_b",
        (~(mean_ok & null_ok & dist_ok)).alias("drifted"),
    )


def pairwise_corr(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pearson correlation for every unordered column pair, one scan.

    Returns ``col_x, col_y, corr`` (x < y lexically, rounded to 6).
    """
    pairs = [
        (x, y)
        for i, x in enumerate(columns)
        for y in columns[i + 1 :]
    ]
    one = df.agg(
        *[F.corr(x, y).alias(f"__c_{i}") for i, (x, y) in enumerate(pairs)]
    )
    rows = [
        F.struct(
            F.lit(x).alias("col_x"),
            F.lit(y).alias("col_y"),
            F.round(F.col(f"__c_{i}"), 6).alias("corr"),
        )
        for i, (x, y) in enumerate(pairs)
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def grouped_topk(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-``k`` rows per group, shuffle-light.

    ``order_cols`` must be a deterministic total order (add a unique
    tiebreak column) or the selected rows are partition-order dependent.
    The rank filter compiles to WindowGroupLimit: per-partition top-k
    heaps run BEFORE the exchange, so only candidate winners shuffle.
    """
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def distribution_stats(df: DataFrame, column: str) -> DataFrame:
    """Concentration diagnostics of a key/categorical distribution.

    One row: ``n_rows, n_distinct, entropy`` (Shannon, nats), ``hhi``
    (Herfindahl-Hirschman index, sum of squared shares) and ``top_share``
    (largest key's fraction).  This is the "do I need to salt this key?"
    metric: hhi near 1/n_distinct means uniform keys (shuffle balances),
    top_share near 1 means one hot key owns the shuffle (salt it, see
    ``operators.skew.salted_join``).

    Plan: one partial-agg'd count shuffle over the corpus, then ONE
    map-side-combined aggregate over the |distinct|-row count frame —
    no window, no single-partition stage at any key cardinality.  The
    shares never materialize per key: with N = sum(c) the identities

        entropy = ln N - (sum(c * ln c)) / N
        hhi     = sum(c^2) / N^2
        top     = max(c) / N

    turn the whole computation into four plain sums/maxes of the raw
    counts, normalized in a final 1-row projection.  Values round to 6.
    """
    counts = df.where(F.col(column).isNotNull()).groupBy(column).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    c = F.col("__cnt").cast("double")
    folded = counts.agg(
        F.sum("__cnt").alias("__s1"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(c * c).alias("__s2"),
        F.sum(c * F.log(c)).alias("__s3"),
        F.max("__cnt").alias("__mx"),
    )
    n = F.col("__s1").cast("double")
    return folded.select(
        F.col("__s1").alias("n_rows"),
        "n_distinct",
        F.round(F.log(n) - F.col("__s3") / n, 6).alias("entropy"),
        F.round(F.col("__s2") / (n * n), 6).alias("hhi"),
        F.round(F.col("__mx") / n, 6).alias("top_share"),
    )
