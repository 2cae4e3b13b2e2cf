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
    from ..pipeline._util import spread

    # Input-skew guard (single-file local scans read as ONE partition):
    # the salt/hash map work and the exploded replication must run wide,
    # or the whole point of salting is lost to a serial map stage.  A
    # no-op at real corpus scale (spread passes large frames through).
    large = spread(large)
    small = spread(small)
    salted_large = large.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    )
    salted_small = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    # Forbid a broadcast of the exploded small side: salting exists for
    # the case where per-key row counts overwhelm reducers, and letting
    # the planner broadcast-join instead silently rebuilds the exploded
    # relation (num_salts x |small|) as a driver-side hash table — the
    # measured cost was a ~0.9 s single-threaded broadcast build for a
    # 1.2M-row relation, serialized before any task ran.  MERGE keeps
    # the shuffled (key, salt) partitioning the construction is about.
    return salted_large.join(
        salted_small.hint("merge"), [on, _SALT], how
    ).drop(_SALT)


def join_explosion_audit(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    top_k: int = 5,
) -> DataFrame:
    """Pre-join fanout audit: what would ``left JOIN right`` on these
    keys actually emit?  One digest row ``(n_keys, output_rows,
    max_fanout, p_fanout_keys, top_keys)`` — ``output_rows`` is the
    EXACT inner-join cardinality Σ_k n_left(k)·n_right(k),
    ``max_fanout`` the largest per-key product, ``p_fanout_keys`` how
    many matched keys multiply (both sides > 1 — the many-to-many
    mass), ``top_keys`` the ``top_k`` worst offenders as
    "key=product" strings.  The "will this join blow up?" gate a
    pipeline runs BEFORE paying for the join: at 100 TB an unnoticed
    many-to-many key turns a 1x join into a 10000x one.

    Exactness: per-key counts aggregate map-side on each input (the
    only fact-sized work); the count frames join per-key (an equi-join
    of two digests, shuffling one long per key) and the products
    accumulate as DECIMAL(38,0) — a hot key can overflow int64 alone.
    The offender list is TakeOrdered(top_k), never a sort.  Extension —
    no reference counterpart.
    """
    d38 = "decimal(38,0)"
    lc = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__nl"))
    )
    rc = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__nr"))
    )
    matched = lc.join(rc, "__k").select(
        "__k",
        (F.col("__nl").cast(d38) * F.col("__nr").cast(d38))
        .cast(d38)
        .alias("__prod"),
        ((F.col("__nl") > 1) & (F.col("__nr") > 1)).alias("__fan"),
    )
    offenders = [
        f"{r['__k']}={r['__prod']}"
        for r in matched.orderBy(
            F.desc("__prod"), F.asc("__k")
        ).limit(top_k).collect()
    ]
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__prod").cast(d38).cast("string").alias("output_rows"),
        F.max("__prod").cast(d38).cast("string").alias("max_fanout"),
        F.count(F.when(F.col("__fan"), 1)).cast("bigint")
        .alias("n_fanout_keys"),
        F.lit(", ".join(offenders)).alias("top_keys"),
    )
