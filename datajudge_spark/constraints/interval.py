"""Interval constraint core (parity: /root/reference/src/datajudge/constraints/interval.py)."""

from __future__ import annotations

import abc
from typing import Any

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from .base import Constraint, OptionalSelections


class IntervalConstraint(Constraint):
    """Factual value is ``(n_violation_keys, n_distinct_key_values)``
    (reference interval.py:16-69)."""

    _DIMENSIONS = 0

    def __init__(
        self,
        ref: DataReference,
        key_columns: list[str] | None,
        start_columns: list[str],
        end_columns: list[str],
        max_relative_n_violations: float,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref_value=object(), name=name, cache_size=cache_size)
        self._key_columns = key_columns
        self._start_columns = start_columns
        self._end_columns = end_columns
        self._max_relative_n_violations = max_relative_n_violations
        self.sample: Any = None
        self._validate_dimensions()

    @abc.abstractmethod
    def _select(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, int, int, OptionalSelections]: ...

    def _validate_dimensions(self) -> None:
        if (length := len(self._start_columns)) != self._DIMENSIONS:
            raise ValueError(
                f"Expected {self._DIMENSIONS} start_column(s), got {length}."
            )
        if (length := len(self._end_columns)) != self._DIMENSIONS:
            raise ValueError(
                f"Expected {self._DIMENSIONS} end_column(s), got {length}."
            )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[tuple[int, int], OptionalSelections]:
        sample, n_violation_keys, n_distinct_key_values, selections = self._select(
            engine, ref
        )
        self.sample = sample
        return (n_violation_keys, n_distinct_key_values), selections


class NoOverlapConstraint(IntervalConstraint):
    def __init__(
        self,
        ref: DataReference,
        key_columns: list[str] | None,
        start_columns: list[str],
        end_columns: list[str],
        max_relative_n_violations: float,
        end_included: bool,
        name: str | None = None,
        cache_size=None,
    ):
        self._end_included = end_included
        super().__init__(
            ref,
            key_columns,
            start_columns,
            end_columns,
            max_relative_n_violations,
            name=name,
            cache_size=cache_size,
        )

    def _select(self, engine: SparkSession, ref: DataReference):
        return ops.get_interval_overlaps_nd(
            engine,
            ref,
            self._key_columns,
            start_columns=self._start_columns,
            end_columns=self._end_columns,
            end_included=self._end_included,
        )

    @abc.abstractmethod
    def _compare(
        self, value_factual: Any, value_target: Any
    ) -> tuple[bool, str | None]: ...


class NoGapConstraint(IntervalConstraint):
    def __init__(
        self,
        ref: DataReference,
        key_columns: list[str] | None,
        start_columns: list[str],
        end_columns: list[str],
        max_relative_n_violations: float,
        legitimate_gap_size: float,
        name: str | None = None,
        cache_size=None,
    ):
        self._legitimate_gap_size = legitimate_gap_size
        super().__init__(
            ref,
            key_columns,
            start_columns,
            end_columns,
            max_relative_n_violations,
            name=name,
            cache_size=cache_size,
        )

    @abc.abstractmethod
    def _select(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, int, int, OptionalSelections]: ...

    @abc.abstractmethod
    def _compare(
        self, value_factual: tuple[int, int], value_target: Any
    ) -> tuple[bool, str | None]: ...
