"""Point-in-range join — the second custom join Spark lacks natively.

``range_join(points, ranges)`` matches every point row to every range
row whose ``[start, end)`` interval contains the point (optionally also
matching equality keys) — the "events within a validity window" join.

Spark-first design: a naive theta join (``p >= start AND p < end``) has
no equality key, so Spark plans BroadcastNestedLoopJoin — O(n*m) and a
driver OOM once neither side broadcasts.  Instead the domain is cut into
fixed-width buckets:

* each range EXPLODES to the buckets its interval overlaps
  (``sequence(floor(start/w), floor(end/w))`` — ~span/w rows),
* each point lands in exactly ONE bucket (``floor(p/w)``),
* the join is a plain hash EQUI-join on (bucket [, keys]) followed by
  the exact containment filter.

Because a point owns exactly one bucket, a (point, range) pair can meet
in at most one bucket — no duplicate elimination needed.  Pick
``bucket_width`` near the median range span: the explode factor stays
O(1) per range while each bucket only holds nearby candidates.  This is
the standard bucketized interval-join construction (cf. Spark's own
range-join hints for Databricks runtime, and interval trees in
single-node engines).

Columns must be numeric (epoch seconds/micros for time ranges — cast
with ``F.unix_timestamp``/``timestamp`` arithmetic before calling).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join ``points`` to ``ranges`` on interval containment
    (``start <= p < end``) plus optional equality ``keys`` (column names
    present in BOTH sides).

    Returns all point columns plus all range columns (shared ``keys``
    appear once). Non-key column names must not collide.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = (
        set(points.columns) & set(ranges.columns)
    ) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns appear on both sides: {sorted(overlap)}; "
            "rename or drop before joining"
        )

    def bucket(col: str):
        return F.floor(F.col(col) / F.lit(bucket_width)).cast("long")

    p = points.withColumn("__rj_b", bucket(point_col))
    r = ranges.withColumn(
        "__rj_b", F.explode(F.sequence(bucket(start_col), bucket(end_col)))
    )
    joined = p.join(r, ["__rj_b", *keys])
    return joined.where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    ).drop("__rj_b")
