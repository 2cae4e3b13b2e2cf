"""Filter predicates over data sources.

Parity with /root/reference/src/datajudge/condition.py:7-78. A ``Condition``
is either *atomic* (a raw SQL boolean expression string such as
``"col1 > 0"``) or *composite* (an and/or tree of sub-conditions, arbitrarily
nested). Its string form is a parenthesized SQL expression; on Spark it is
evaluated with ``F.expr(str(condition))``, which keeps the predicate JVM-side
and eligible for Catalyst pushdown into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Condition:
    """A filter narrowing down a ``DataSource`` inside a ``Constraint``.

    Atomic conditions are created with ``raw_string`` (e.g. ``"col1 > 0"``),
    composite ones with ``conditions=[...]`` and
    ``reduction_operator in ("and", "or")``. Nesting is unbounded.
    """

    raw_string: str | None = None
    conditions: Sequence["Condition"] | None = None
    reduction_operator: str | None = None

    def __post_init__(self):
        if self._is_atomic() and self.conditions is not None:
            raise ValueError(
                "Condition can either be instantiated atomically, with "
                "the raw_string parameter, or in a composite fashion, with "
                "the conditions parameter. "
                "Exactly one of them needs to be provided, yet both are."
            )
        if not self._is_atomic() and (
            self.conditions is None or len(self.conditions) == 0
        ):
            raise ValueError(
                "Condition can either be instantiated atomically, with "
                "the raw_string parameter, or in a composite fashion, with "
                "the conditions parameter. "
                "Exactly one of them needs to be provided, yet none is."
            )
        if not self._is_atomic() and self.reduction_operator not in ("and", "or"):
            raise ValueError(
                "reduction_operator has to be either 'and' or 'or' but "
                f"obtained {self.reduction_operator}."
            )

    def _is_atomic(self) -> bool:
        return self.raw_string is not None

    def __str__(self) -> str:
        if self._is_atomic():
            assert self.raw_string is not None
            return self.raw_string
        assert self.conditions is not None
        return f" {self.reduction_operator} ".join(
            f"({condition})" for condition in self.conditions
        )

    def to_column(self) -> Column:
        """Spark boolean column for this condition (single ``F.expr``)."""
        return F.expr(str(self))


def merge_conditions(
    condition1: Condition | None, condition2: Condition | None
) -> Condition | None:
    """Conjunction of two optional conditions (reference db_access.py:212-221)."""
    if condition1 is None:
        return condition2
    if condition2 is None:
        return condition1
    return Condition(conditions=[condition1, condition2], reduction_operator="and")
