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


def get_uniques(
    spark: SparkSession, ref: DataReference
) -> tuple[Counter, _Plans]:
    """Value -> multiplicity Counter over the ref's column(s)
    (reference db_access.py:906-935). Scalar keys for one column, tuple keys
    for several."""
    column_names = ref.get_columns(spark)
    if not column_names:
        return Counter({}), []
    selection = ref.get_selection(spark)
    grouped = selection.groupBy(*column_names).agg(F.count(F.lit(1)).alias("__dj_cnt"))
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
