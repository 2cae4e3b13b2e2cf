"""Group-by aggregation constraints (parity:
/root/reference/src/datajudge/constraints/groupby.py)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from .base import Constraint, OptionalSelections


class AggregateNumericRangeEquality(Constraint):
    """Per group, the collected values of ``aggregation_column`` must cover
    the integer range ``[start_value, start_value + max)``
    (reference groupby.py:12-58)."""

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
        result, selections = ops.get_column_array_agg(
            engine, ref, self._aggregation_column
        )
        return {fact[:-1]: fact[-1] for fact in result}, selections

    def _compare(
        self, value_factual: Any, value_target: Any
    ) -> tuple[bool, str | None]:
        def missing_from_range(values, start=0):
            return set(range(start, max(values) + start)) - set(values)

        results = {
            k: missing_from_range(v, self._start_value)
            for k, v in value_factual.items()
        }
        failed_results = {k: v for k, v in results.items() if len(v) > 0}
        if len(failed_results) / len(value_factual) > self._tolerance:
            return False, (
                f"{self._ref} has unfulfilled continuity requirement for "
                f"(key, missing values): `{failed_results}`."
                f"{self._condition_string}"
            )
        return True, None
