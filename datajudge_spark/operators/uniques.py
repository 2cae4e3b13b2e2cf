"""Distinct-value operators: uniques histogram, distinct counts, union count.

Re-expression of /root/reference/src/datajudge/db_access.py:906-964.

Null semantics (SURVEY §7.3.3): SQL ``SELECT DISTINCT`` *keeps* all-NULL
tuples, so distinct counts use ``df.distinct().count()`` — NOT
``countDistinct``, which drops them. The uniques histogram likewise includes
NULL keys; driver-side ``filter_func`` decides what to drop
(utils.filternull_*).

Scale notes: a uniques histogram collects O(|distinct|) rows to the driver —
this is the reference's own discipline (it returns a Counter, not rows;
db_access.py:906-935). For columns with huge cardinality prefer the
``get_unique_count`` scalar; the histogram is for categorical columns.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..reference import DataReference

_Plans = list[DataFrame]

#: Default driver-collect cap for :func:`get_uniques` and every
#: constraint that materializes a distinct-value Counter.  1M distinct
#: values of typical key width is O(100 MB) on the driver — safely
#: under default driver memory, while anything bigger is almost
#: certainly a mis-specified categorical gate at 100 TB.  Pass
#: ``max_uniques=None`` to explicitly opt out (the reference's own
#: unbounded discipline, SURVEY §3.4).
DEFAULT_MAX_UNIQUES = 1_000_000


def get_uniques(
    spark: SparkSession,
    ref: DataReference,
    max_uniques: int | None = DEFAULT_MAX_UNIQUES,
) -> tuple[Counter, _Plans]:
    """Value -> multiplicity Counter over the ref's column(s)
    (reference db_access.py:906-935). Scalar keys for one column, tuple keys
    for several.

    ``max_uniques`` is the 100 TB insurance on the driver collect
    (SURVEY §3.4): a column with more than that many distinct values
    raises instead of streaming them all into driver memory — the
    single LIMIT probe costs nothing when the cardinality is sane.
    Defaults to :data:`DEFAULT_MAX_UNIQUES`; callers that know the
    domain is huge AND genuinely want the full Counter must opt out
    explicitly with ``max_uniques=None``.
    """
    column_names = ref.get_columns(spark)
    if not column_names:
        return Counter({}), []
    selection = ref.get_selection(spark)
    grouped = selection.groupBy(*column_names).agg(F.count(F.lit(1)).alias("__dj_cnt"))
    if max_uniques is not None:
        # LIMIT N+1: one bounded job; if a row beyond the cap exists the
        # collect is over budget and we fail fast with the real count
        # still uncomputed (computing it exactly would scan again)
        rows = grouped.limit(max_uniques + 1).collect()
        if len(rows) > max_uniques:
            raise ValueError(
                f"get_uniques({column_names}) exceeded max_uniques="
                f"{max_uniques} distinct values; use get_unique_count "
                "for high-cardinality columns or raise the cap."
            )
    else:
        rows = grouped.collect()
    if len(column_names) == 1:
        result = Counter({row[0]: row[-1] for row in rows})
    else:
        result = Counter({tuple(row[: len(column_names)]): row[-1] for row in rows})
    return result, [grouped]


def get_unique_count(
    spark: SparkSession, ref: DataReference
) -> tuple[int, _Plans]:
    """COUNT(*) over SELECT DISTINCT (reference db_access.py:938-949)."""
    selection = ref.get_selection(spark)
    distinct = selection.distinct()
    return distinct.count(), [distinct]


def get_unique_count_union(
    spark: SparkSession, ref: DataReference, ref2: DataReference
) -> tuple[int, _Plans]:
    """count(distinct (q1 UNION q2)) (reference db_access.py:952-964).
    Positional union, like SQL UNION."""
    selection1 = ref.get_selection(spark)
    selection2 = ref2.get_selection(spark)
    unioned = selection1.union(selection2).distinct()
    return unioned.count(), [unioned]
