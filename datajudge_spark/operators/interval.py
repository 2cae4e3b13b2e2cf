"""Interval operators: n-dimensional overlap detection and gap detection.

Re-expression of /root/reference/src/datajudge/db_access.py:316-708.

Overlaps keep the reference's query shape (a key-equi self-join with a
range/theta predicate — Catalyst executes the equi part as a shuffled join and
evaluates the range part as a join residual). Gaps deviate deliberately
(SURVEY §4.1): instead of the reference's two globally-ranked boundary tables
NOT-EXISTS-filtered and re-joined on rank adjacency (db_access.py:499-596),
we use ONE window pass per key: sort intervals by start, track the running
maximum of interval ends, and flag a gap when the next start exceeds that
running max by more than ``legitimate_gap_size``. Same violating-key set, one
shuffle, per-key windows (no single-partition global rank).
"""

from __future__ import annotations

import operator as py_operator

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..reference import DataReference
from .rows import duplicates
from .uniques import get_unique_count

_Plans = list[DataFrame]


def _overlap_violations_df(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_columns: list[str],
    end_columns: list[str],
    end_included: bool,
) -> tuple[DataFrame, DataFrame]:
    r"""(sample_df, violating_keys_df) for n-dimensional interval overlaps.

    Overlap definition (reference db_access.py:324-346): intervals t1, t2
    overlap in one dimension iff, taking t1 as the leftmost
    (t1.start <= t2.start), ``t1.end >= t2.start`` (``>`` when
    ``end_included=False``). Overlap in n dimensions is the conjunction over
    dimensions. Violations additionally include exact duplicate rows
    (db_access.py:371-378).

    Deviation: the reference's "intervals are not identical" guard contains a
    self-comparison (``table2.end != table2.end``, db_access.py:393-402) that
    makes it degenerate to "starts differ"; we implement the evident intent —
    the pair differs in at least one start or end — which additionally catches
    same-start-different-end overlaps. All reference fixtures agree.
    """
    if len(start_columns) != len(end_columns):
        raise ValueError(
            f"Expected same dimensionality for start_columns and end_columns. "
            f"Instead, start_columns has dimensionality {len(start_columns)} and "
            f"end_columns has dimensionality {len(end_columns)}."
        )
    keys = list(key_columns) if key_columns else []
    base = ref.get_selection(spark)
    t1 = base.alias("l")
    t2 = base.alias("r")

    end_op = py_operator.ge if end_included else py_operator.gt

    def lcol(name: str) -> Column:
        return F.col(f"l.{name}")

    def rcol(name: str) -> Column:
        return F.col(f"r.{name}")

    key_cond = F.lit(True)
    for k in keys:
        key_cond = key_cond & (lcol(k) == rcol(k))

    naive_violation = F.lit(True)
    for s, e in zip(start_columns, end_columns):
        naive_violation = (
            naive_violation & (lcol(s) <= rcol(s)) & end_op(lcol(e), rcol(s))
        )

    pair_differs = F.lit(False)
    for s, e in zip(start_columns, end_columns):
        pair_differs = pair_differs | (lcol(s) != rcol(s)) | (lcol(e) != rcol(e))

    distinct_violations = t1.join(t2, key_cond & naive_violation & pair_differs).select(
        *[lcol(k).alias(k) for k in keys],
        *[lcol(s).alias(f"{s}_1") for s in start_columns],
        *[rcol(s).alias(f"{s}_2") for s in start_columns],
        *[lcol(e).alias(f"{e}_1") for e in end_columns],
        *[rcol(e).alias(f"{e}_2") for e in end_columns],
    )

    # Exact duplicates are violations too (reference db_access.py:371-378,
    # :440-459): align duplicate rows onto the violation schema with NULLs.
    dup = duplicates(base)
    dup_aligned = dup.select(
        *[F.col(k) for k in keys],
        *[F.col(s).alias(f"{s}_1") for s in start_columns],
        *[F.lit(None).cast(dict(base.dtypes)[s]).alias(f"{s}_2") for s in start_columns],
        *[F.col(e).alias(f"{e}_1") for e in end_columns],
        *[F.lit(None).cast(dict(base.dtypes)[e]).alias(f"{e}_2") for e in end_columns],
    )

    violations = dup_aligned.union(distinct_violations)

    if keys:
        violating_keys = violations.select(*keys).distinct()
    else:
        violating_keys = violations.distinct()
    return violations, violating_keys


def get_interval_overlaps_nd(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_columns: list[str],
    end_columns: list[str],
    end_included: bool,
) -> tuple[object, int, int, _Plans]:
    """Returns (sample_row, n_violation_keys, n_distinct_key_values, plans)
    — the tuple the interval constraints consume
    (reference constraints/interval.py:49-69 + db_access.py:316-472)."""
    violations, violating_keys = _overlap_violations_df(
        spark, ref, key_columns, start_columns, end_columns, end_included
    )
    keys_ref = DataReference(
        data_source=ref.data_source,
        columns=list(key_columns) if key_columns else None,
        condition=ref.condition,
    )
    n_distinct_keys, key_plans = get_unique_count(spark, keys_ref)
    sample = violations.first()
    n_violation_keys = violating_keys.count()
    return (
        (tuple(sample) if sample is not None else None),
        n_violation_keys,
        n_distinct_keys,
        [*key_plans, violations, violating_keys],
    )


def _gap_violations_df(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_column: str,
    end_column: str,
    gap_measure,
    legitimate_gap_size: float,
) -> tuple[DataFrame, DataFrame]:
    """(sample_df, violating_keys_df) for interval gaps via the islands
    pattern: per key, order intervals by (start, end); a gap exists where
    ``gap_measure(start, running_max(previous ends)) > legitimate_gap_size``.

    Replaces the reference's rank-adjacency construction
    (db_access.py:499-596) with one ``Window.partitionBy(keys)`` pass —
    semantically equal on the reference's gap fixtures, one shuffle, and no
    global (single-partition) window at scale.
    """
    base = ref.get_selection(spark)
    if not key_columns:
        key_columns = [
            c for c in base.columns if c not in (start_column, end_column)
        ]
    w = (
        Window.partitionBy(*[F.col(k) for k in key_columns])
        .orderBy(F.col(start_column), F.col(end_column))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prev = base.select(
        *key_columns,
        start_column,
        end_column,
        F.max(F.col(end_column)).over(w).alias("__dj_prev_end"),
    )
    violations = with_prev.where(
        F.col("__dj_prev_end").isNotNull()
        & (
            gap_measure(F.col(start_column), F.col("__dj_prev_end"))
            > F.lit(legitimate_gap_size)
        )
    ).select(
        *key_columns,
        F.col(start_column),
        F.col("__dj_prev_end").alias(end_column),
    )
    violating_keys = violations.select(*key_columns).distinct()
    return violations, violating_keys


def _numeric_gap_measure(start: Column, prev_end: Column) -> Column:
    # reference _numeric_gap_condition, db_access.py:678-689
    return start - prev_end


def _date_gap_measure(start: Column, prev_end: Column) -> Column:
    # reference _date_gap_condition (6 dialect variants, db_access.py:599-656)
    # collapses to one datediff in days.
    return F.datediff(start.cast("date"), prev_end.cast("date"))


def _get_interval_gaps(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_column: str,
    end_column: str,
    legitimate_gap_size: float,
    gap_measure,
) -> tuple[object, int, int, _Plans]:
    violations, violating_keys = _gap_violations_df(
        spark, ref, key_columns, start_column, end_column,
        gap_measure, legitimate_gap_size,
    )
    keys_ref = DataReference(
        data_source=ref.data_source,
        columns=list(key_columns) if key_columns else None,
        condition=ref.condition,
    )
    n_distinct_keys, key_plans = get_unique_count(spark, keys_ref)
    sample = violations.first()
    n_violation_keys = violating_keys.count()
    return (
        (tuple(sample) if sample is not None else None),
        n_violation_keys,
        n_distinct_keys,
        [*key_plans, violations, violating_keys],
    )


def get_numeric_gaps(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_column: str,
    end_column: str,
    legitimate_gap_size: float = 0,
) -> tuple[object, int, int, _Plans]:
    return _get_interval_gaps(
        spark, ref, key_columns, start_column, end_column,
        legitimate_gap_size, _numeric_gap_measure,
    )


def get_date_gaps(
    spark: SparkSession,
    ref: DataReference,
    key_columns: list[str] | None,
    start_column: str,
    end_column: str,
    legitimate_gap_size: float,
) -> tuple[object, int, int, _Plans]:
    return _get_interval_gaps(
        spark, ref, key_columns, start_column, end_column,
        legitimate_gap_size, _date_gap_measure,
    )
