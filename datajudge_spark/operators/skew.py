"""Skew-resistant joins via key salting.

AQE's skew-join splitting handles most skew at runtime; salting is the
explicit tool for the pathological cases AQE cannot fix (e.g. one key
holding >50% of both sides, or aggregations rather than joins). The
construction is standard: the large side gets a deterministic salt in
[0, k), the small side is replicated k times, and the join runs on
(key, salt) — splitting each hot key's rows across k reducers.

Cost model: the small side's shuffle volume multiplies by k; use only
when per-key row counts on the LARGE side are the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` with ``small`` on ``on``, salted ``num_salts`` ways.

    Semantically identical to ``large.join(small, on, how)`` for
    inner/left joins. The salt on the large side is derived
    deterministically from the whole row hash, so the result is stable
    across retries (no ``rand()``); the small side is exploded with a
    literal salt range.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_large = large.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    )
    salted_small = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return salted_large.join(salted_small, [on, _SALT], how).drop(_SALT)
