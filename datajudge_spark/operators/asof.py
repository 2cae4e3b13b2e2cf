"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join(left, right)`` matches every left row to the right row with
the greatest timestamp <= the left timestamp within the same key —
the standard time-series enrichment join (DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof``).

Spark-first implementation: instead of a theta join (range predicate =
O(n*m) worst case) or a per-key loop, the two sides are UNIONed, tagged,
and swept with ONE window pass::

    window = partitionBy(key).orderBy(time, side)   # right rows first
    matched = last(right_payload, ignorenulls=True) over
              rowsBetween(unboundedPreceding, currentRow)

Cost: a single shuffle on the key (same as any equi-join) plus a
per-partition sort — the minimum possible for this semantics. Skewed
keys are split by AQE; there is no driver-side state.

Ties: right rows sort before left rows at equal timestamps, so an exact
timestamp match counts as "prior" (``<=`` semantics, like ASOF JOIN).
If several right rows share the winning timestamp the one with the
greatest payload-order column wins — callers should pre-deduplicate
(key, time) on the right for full determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Enrich ``left`` with the nearest ``right`` row per key.

    ``direction="backward"`` (default) matches the greatest right time
    <= the left time; ``"forward"`` the smallest right time >= it —
    the two pandas ``merge_asof`` directions. ``tolerance`` (a Column,
    e.g. ``F.expr("INTERVAL 1 HOUR")`` or a numeric literal) nulls the
    payload when the matched time is farther than that from the left
    time. Same single-shuffle plan in every mode: only the window frame
    direction and a post-projection change.

    Returns all ``left`` columns plus ``payload_cols`` (null when no
    right row qualifies). ``on`` is the equality key present in both
    sides; ``left_time``/``right_time`` must be mutually comparable
    (both timestamps or both numerics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    fills = list(payload_cols)
    if tolerance is not None:
        fills.append("__asof_t")
        right = right.withColumn("__asof_t", F.col(right_time))
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).alias(f"_p_{c}") for c in fills],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).alias(c) for c in left.columns],
        *[F.col(c).alias(f"_p_{c}") for c in fills],
    )
    merged = lhs.unionByName(rhs)
    if direction == "backward":
        # right rows (side 0) sort before left at equal times: <= match
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left rows first at equal times, frame looks ahead: >= match
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", F.desc("_side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled: dict[str, Column] = {c: fill(f"_p_{c}") for c in fills}
    if tolerance is not None:
        gap = (
            F.col("_t") - filled["__asof_t"]
            if direction == "backward"
            else filled["__asof_t"] - F.col("_t")
        )
        in_tol = filled["__asof_t"].isNotNull() & (gap <= tolerance)
        payload_out = [
            F.when(in_tol, filled[c]).alias(c) for c in payload_cols
        ]
    else:
        payload_out = [filled[c].alias(c) for c in payload_cols]
    return (
        merged.select(*left.columns, F.col("_side"), *payload_out)
        .where(F.col("_side") == 1)
        .drop("_side")
    )
