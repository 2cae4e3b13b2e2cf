"""Referential-integrity operators: foreign-key orphan detection.

Extension — the reference's closest surfaces are the row set-comparison
constraints (reference row.py:84-150, uniques subset checks
reference uniques.py), which compare whole projections. A foreign-key
check differs in three ways: the key columns on the two sides may have
different names, SQL FK semantics ignore rows whose (entire) child key
is NULL, and the verdict is about *child rows*, not distinct values.

Scale notes (100 TB):
- the parent side is projected to the key columns and de-duplicated
  BEFORE the join, so the shuffle carries |distinct parent keys| rows,
  not |parent rows|; Catalyst broadcasts it when it is small enough and
  AQE converts to a broadcast join at runtime otherwise.
- ``LEFT ANTI`` join — no row multiplication, and the join output is
  exactly the violation set, so downstream aggregation is over
  violations only (usually ~0 rows).
- multi-edge reports (``fk_report``) run each edge as an independent
  1-row aggregate and union the results: edges parallelize as separate
  jobs and no edge blocks another.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame,
    child_columns: list[str],
    parent: DataFrame,
    parent_columns: list[str],
) -> DataFrame:
    """Child rows whose foreign key has no match in the parent.

    SQL FK semantics: a child row with ANY NULL key column is exempt
    (it cannot violate a foreign key), matching ANSI MATCH SIMPLE.
    """
    if len(child_columns) != len(parent_columns) or not child_columns:
        raise ValueError("child/parent key column lists must align and be non-empty")
    pk = parent.select(
        *[F.col(p).alias(f"__fk_{i}") for i, p in enumerate(parent_columns)]
    ).dropDuplicates()
    non_null = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in child_columns]
    )
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(c) == F.col(f"__fk_{i}")
            for i, c in enumerate(child_columns)
        ],
    )
    return child.where(non_null).join(pk, cond, "left_anti")


def fk_orphan_stats(
    child: DataFrame,
    child_columns: list[str],
    parent: DataFrame,
    parent_columns: list[str],
    edge: str | None = None,
) -> DataFrame:
    """1-row summary: edge label, checked child rows, orphan count.

    ``n_checked`` excludes NULL-key child rows (they are FK-exempt), so
    ``n_orphans / n_checked`` is the true violation fraction.
    """
    label = edge or (
        f"{'+'.join(child_columns)}->{'+'.join(parent_columns)}"
    )
    non_null = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in child_columns]
    )
    checked = child.where(non_null)
    orphans = fk_orphans(child, child_columns, parent, parent_columns)
    n_checked = checked.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(label).alias("edge"), F.col("n").alias("n_checked")
    )
    n_orphans = orphans.agg(
        F.count(F.lit(1)).alias("n_orphans")
    ).select(F.lit(label).alias("edge"), "n_orphans")
    return n_checked.join(n_orphans, "edge")


def fk_report(
    edges: list[tuple[DataFrame, list[str], DataFrame, list[str], str]],
) -> DataFrame:
    """Union of ``fk_orphan_stats`` over (child, child_cols, parent,
    parent_cols, label) edges — one violation report for a whole star
    schema."""
    if not edges:
        raise ValueError("fk_report needs at least one edge")
    parts = [
        fk_orphan_stats(c, cc, p, pc, edge=label)
        for c, cc, p, pc, label in edges
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
