"""Market-basket association rules over (basket, item) pairs.

Extension — no reference counterpart; the nearest in-repo relative is
the event transition matrix (timeseries queries), which counts ordered
adjacencies where this counts unordered co-occurrence.

Scale design: baskets are first deduplicated to distinct (basket, item)
rows (one shuffle, map-side partial).  The pair join is a SELF-join on
the already-shuffled basket key — co-partitioned, no re-shuffle — and
emits at most |items-per-basket|² rows per basket, with item vocabularies
(event types, categories, tags) small by nature.  Item totals and the
basket count are tiny aggregates broadcast back onto the pair counts:
nothing larger than |items|² rows ever reaches a single node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline._util import materialize_once


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
) -> DataFrame:
    """Support / confidence / lift for every ordered item pair (a, b)
    that co-occurs in at least ``min_pair_count`` baskets.

    Returns (item_a, item_b, n_a, n_b, n_ab, support, confidence,
    lift): ``support = n_ab / n_baskets``, ``confidence = n_ab / n_a``
    (a -> b), ``lift = n_ab * n_baskets / (n_a * n_b)``.  Both
    orderings of each unordered pair are emitted, so confidence is
    directional.  Counts are exact integers; the three ratios are one
    double expression each.
    """
    pairs_base = materialize_once(
        df.where(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    n_baskets = pairs_base.agg(
        F.count_distinct("basket").alias("__n_baskets")
    )
    item_counts = pairs_base.groupBy(F.col("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    left = pairs_base.select("basket", F.col("item").alias("item_a"))
    right = pairs_base.select("basket", F.col("item").alias("item_b"))
    pair_counts = (
        left.join(right, "basket")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("n").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .join(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            (
                F.col("n_ab").cast("double")
                / F.col("__n_baskets").cast("double")
            ).alias("support"),
            (
                F.col("n_ab").cast("double") / F.col("n_a").cast("double")
            ).alias("confidence"),
            (
                (F.col("n_ab") * F.col("__n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
