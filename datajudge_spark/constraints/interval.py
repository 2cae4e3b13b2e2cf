"""Interval-family core: the shared machinery behind every
no-overlap / no-gap gate (numeric and date, 1-D and 2-D).

The factual value of an interval gate is the pair ``(violating keys,
distinct keys)``; subclasses choose the engine operator (overlap
self-join vs lag-window gap scan) and the verdict wording.  Message
wording stays byte-compatible with the reference
(/root/reference/src/datajudge/constraints/interval.py); pinned by
``tests/test_message_parity.py``.
"""

from __future__ import annotations

import abc
from typing import Any

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from .base import Constraint, OptionalSelections


def interval_violation_verdict(
    constraint,
    counts: tuple[int, int],
    *,
    shape: str,
    empty_message: str | None = "No key values found.",
) -> tuple[bool, str | None]:
    """Shared verdict for the ratio-of-violating-keys family.

    ``shape`` is the clause naming what went wrong ("overlapping
    ranges", "a gap in the date range", ...); numeric and date variants
    differ only in that clause and in how many interval dimensions they
    name.  The reference renders each extra dimension as its own
    adjacent sentence ("...in s1 and e1.and s2 and e2.").
    """
    violators, keys = counts
    if keys == 0:
        return True, empty_message
    ratio = violators / keys
    dims = ".and ".join(
        f"{lo} and {hi}" for lo, hi in constraint.interval_axes
    )
    verdict = (
        f"{constraint._ref} has a ratio of {ratio} > "
        f"{constraint._max_relative_n_violations} keys in columns "
        f"{constraint._key_columns} with {shape} in {dims}."
        f"E.g. for: {constraint.sample}."
    )
    return ratio <= constraint._max_relative_n_violations, verdict


class IntervalConstraint(Constraint):
    """Base of the family.  ``_DIMENSIONS`` is the number of interval
    axes a subclass expects (1 for plain ranges, 2 for e.g. a
    date-range x numeric-range rectangle); the constructor validates
    the start/end column lists against it up front so a mis-wired spec
    fails at build time, not at test time.

    ``self.sample`` is a side channel: the engine operator hands back
    one violating key's row alongside the counts, and the verdict
    embeds it so the failure is actionable.
    """

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
        self._start_columns = list(start_columns)
        self._end_columns = list(end_columns)
        self._max_relative_n_violations = max_relative_n_violations
        self.sample: Any = None
        for label, cols in (
            ("start_column(s)", self._start_columns),
            ("end_column(s)", self._end_columns),
        ):
            if len(cols) != self._DIMENSIONS:
                raise ValueError(
                    f"Expected {self._DIMENSIONS} {label}, got {len(cols)}."
                )

    @property
    def interval_axes(self) -> list[tuple[str, str]]:
        """(start, end) column pair per interval dimension."""
        return list(zip(self._start_columns, self._end_columns))

    @abc.abstractmethod
    def _select(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, int, int, OptionalSelections]:
        """Run the engine operator: (sample, violators, keys, plans)."""

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[tuple[int, int], OptionalSelections]:
        self.sample, violators, keys, selections = self._select(engine, ref)
        return (violators, keys), selections


class NoOverlapConstraint(IntervalConstraint):
    """Keys whose intervals overlap (self-join engine); whether a
    shared endpoint counts as an overlap is ``end_included``."""

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
    """Keys whose interval sequence leaves a hole bigger than
    ``legitimate_gap_size`` (lag-window engine, SURVEY §4.1 rewrite —
    never a self-join)."""

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
