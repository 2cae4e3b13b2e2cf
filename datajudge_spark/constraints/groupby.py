"""Per-group continuity gate.

Message wording stays byte-compatible with the reference
(/root/reference/src/datajudge/constraints/groupby.py); pinned by
``tests/test_message_parity.py``.  The structure is the repo's own:
the gap scan is a plain generator pipeline over the collected
per-group arrays.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from .base import Constraint, OptionalSelections

_SAY_GAPPY = (
    "{ref} has unfulfilled continuity requirement for "
    "(key, missing values): `{holes}`.{cond}"
)


class AggregateNumericRangeEquality(Constraint):
    """Per group key, the collected integers of ``aggregation_column``
    must cover the contiguous range ``[start_value, start_value + max)``
    — "every sequence number present, none skipped".  Groups with holes
    are tolerated up to a ``tolerance`` fraction of all groups.

    The per-group arrays come from one ``collect_list`` aggregation
    (``operators.get_column_array_agg``); the hole detection is
    driver-side set algebra over the already-bounded digest.
    """

    def __init__(
        self,
        ref: DataReference,
        aggregation_column: str,
        start_value: int = 0,
        name: str | None = None,
        cache_size=None,
        *,
        tolerance: float = 0,
        ref2: DataReference | None = None,
    ):
        super().__init__(ref, ref2=ref2, ref_value=object(), name=name)
        self._aggregation_column = aggregation_column
        self._tolerance = tolerance
        self._start_value = start_value

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, OptionalSelections]:
        rows, selections = ops.get_column_array_agg(
            engine, ref, self._aggregation_column
        )
        per_group = {tuple(row[:-1]): row[-1] for row in rows}
        return per_group, selections

    def _holes(self, values) -> set:
        lo = self._start_value
        want = range(lo, max(values) + lo)
        return set(want).difference(values)

    def _compare(
        self, value_factual: Any, value_target: Any
    ) -> tuple[bool, str | None]:
        gappy = {
            key: holes
            for key, values in value_factual.items()
            if (holes := self._holes(values))
        }
        within = len(gappy) / len(value_factual) <= self._tolerance
        if within:
            return True, None
        return False, _SAY_GAPPY.format(
            ref=self._ref, holes=gappy, cond=self._condition_string
        )
