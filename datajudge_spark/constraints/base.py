"""Constraint kernel: ``TestResult`` + the ``Constraint`` ABC.

Parity with /root/reference/src/datajudge/constraints/base.py:33-309. A
constraint compares a *factual* value retrieved from ``ref`` against a
*target* value — either retrieved from ``ref2`` (a "between" constraint) or
given literally as ``ref_value`` (a "within" constraint); exactly one of the
two must be provided. Retrieved values are cached per instance
(``lru_cache``; ``cache_size=0`` disables, ``None`` = unbounded). On failure,
the optimized Spark plans that produced the values are rendered into the
``TestResult`` (the reference renders the compiled SQL,
base.py:268-287).
"""

from __future__ import annotations

import abc
from collections.abc import Callable, Collection, Sequence
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, TypeVar

from pyspark.sql import DataFrame, SparkSession

from ..formatter import Formatter
from ..plans import render_plans
from ..reference import DataReference
from ..utils import OutputProcessor, output_processor_limit

_T = TypeVar("_T")

_DEFAULT_FORMATTER = Formatter()

OptionalSelections = Sequence[DataFrame] | None
ToleranceGetter = Callable[[SparkSession], float]


def uncommon_substrings(string1: str, string2: str) -> tuple[str, str]:
    # reference base.py:23-30
    qualifiers1 = string1.split(".")
    qualifiers2 = string2.split(".")
    if qualifiers1[0] != qualifiers2[0]:
        return string1, string2
    if len(qualifiers1) > 1 and qualifiers1[1] != qualifiers2[0]:
        return ".".join(qualifiers1[1:]), ".".join(qualifiers2[1:])
    return qualifiers1[-1], qualifiers2[-1]


@dataclass(frozen=True)
class TestResult:
    """The result of the execution of a Constraint (reference base.py:33-101)."""

    outcome: bool
    _failure_message: str | None = field(default=None, repr=False)
    _constraint_description: str | None = field(default=None, repr=False)
    _factual_queries: list[str] | None = field(default=None, repr=False)
    _target_queries: list[str] | None = field(default=None, repr=False)

    def formatted_failure_message(self, formatter: Formatter) -> str | None:
        return (
            formatter.fmt_str(self._failure_message) if self._failure_message else None
        )

    def formatted_constraint_description(self, formatter: Formatter) -> str | None:
        return (
            formatter.fmt_str(self._constraint_description)
            if self._constraint_description
            else None
        )

    @property
    def failure_message(self) -> str | None:
        return self.formatted_failure_message(_DEFAULT_FORMATTER)

    @property
    def constraint_description(self) -> str | None:
        return self.formatted_constraint_description(_DEFAULT_FORMATTER)

    @property
    def logging_message(self) -> str:
        constraint_description_message = (
            f"/*\n\t{self.constraint_description}\n*/"
            if self.constraint_description
            else ""
        )
        failure_message = (
            f"\n\n/*\nFailure message:\n{self.failure_message}\n*/"
            if self.failure_message
            else ""
        )
        factual_query_message = ""
        if self._factual_queries is not None:
            factual_query_message = "\n\n --Factual plans: \n " + "\n".join(
                self._factual_queries
            )
        target_query_message = ""
        if self._target_queries is not None:
            target_query_message = "\n\n-- Target plans: \n " + "\n".join(
                self._target_queries
            )
        return (
            constraint_description_message
            + failure_message
            + factual_query_message
            + target_query_message
            + "\n --- \n"
        )

    @classmethod
    def success(cls) -> "TestResult":
        return cls(True)

    @classmethod
    def failure(cls, *args, **kwargs) -> "TestResult":
        return cls(False, *args, **kwargs)


class Constraint(abc.ABC):
    """Express a DataReference constraint against another DataReference
    (``ref2``) or a literal reference value (``ref_value``).

    Semantics identical to the reference Constraint (base.py:104-299); the
    execution engine argument is a ``SparkSession`` instead of a SQLAlchemy
    engine, and ``_retrieve`` triggers Spark actions instead of SQL round
    trips.
    """

    def __init__(
        self,
        ref: DataReference,
        *,
        ref2: DataReference | None = None,
        ref_value: Any = None,
        name: str | None = None,
        output_processors: OutputProcessor
        | list[OutputProcessor]
        | None = output_processor_limit,
        cache_size=None,
    ):
        self._check_if_valid_between_or_within(ref2, ref_value)
        self._ref = ref
        self._ref2 = ref2
        self._ref_value = ref_value
        self.name = name
        self._factual_selections: OptionalSelections = None
        self._target_selections: OptionalSelections = None

        self._output_processors: list[OutputProcessor] | None
        if output_processors is not None and not isinstance(output_processors, list):
            self._output_processors = [output_processors]
        else:
            self._output_processors = output_processors

        self._cache_size = cache_size
        self._setup_caching()

    def _setup_caching(self) -> None:
        # Instance-level caching (reference base.py:160-172): decorating here
        # rather than on the class keeps caches per constraint instance.
        if self._cache_size != 0:
            self._get_factual_value = lru_cache(self._cache_size)(
                self._get_factual_value
            )
            self._get_target_value = lru_cache(self._cache_size)(
                self._get_target_value
            )

    def _check_if_valid_between_or_within(
        self, ref2: DataReference | None, ref_value: Any
    ) -> None:
        class_name = self.__class__.__name__
        if ref2 is not None and ref_value is not None:
            raise ValueError(
                "Both table 2 ref and constant given to "
                f"{class_name}. Use either of them, not both."
            )
        if ref2 is None and ref_value is None:
            raise ValueError(
                "Neither table 2 ref nor constant given to "
                f"{class_name}. Use exactly either of them."
            )

    def _get_factual_value(self, engine: SparkSession) -> Any:
        factual_value, factual_selections = self._retrieve(engine, self._ref)
        self._factual_selections = factual_selections
        return factual_value

    def _get_target_value(self, engine: SparkSession) -> Any:
        if self._ref2 is None:
            return self._ref_value
        target_value, target_selections = self._retrieve(engine, self._ref2)
        self._target_selections = target_selections
        return target_value

    def get_description(self) -> str:
        if self.name is not None:
            return self.name
        if self._ref2 is None:
            data_source_string = str(self._ref.data_source)
        else:
            s1, s2 = uncommon_substrings(
                str(self._ref.data_source), str(self._ref2.data_source)
            )
            data_source_string = f"{s1} | {s2}"
        return self.__class__.__name__ + "::" + data_source_string

    @property
    def _target_prefix(self) -> str:
        return f"{self._ref2}'s " if self._ref2 is not None else ""

    @property
    def _condition_string(self) -> str:
        if self._ref.condition is None and (
            self._ref2 is None or self._ref2.condition is None
        ):
            return ""
        ref1_clause = self._ref._get_clause_string()
        if self._ref2 is None:
            return f"Condition: {ref1_clause}"
        ref2_clause = self._ref2._get_clause_string()
        if self._ref.condition == self._ref2.condition:
            return f"Condition on both tables: {ref1_clause}; "
        if self._ref.condition is None:
            return f"Condition on second table: {ref2_clause}; "
        if self._ref2.condition is None:
            return f"Condition on first table: {ref1_clause}; "
        return (
            f"Condition on first table: {ref1_clause}. "
            f"Condition on second table: {ref2_clause}. "
        )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, OptionalSelections]:
        raise NotImplementedError()

    def _compare(
        self, value_factual: Any, value_target: Any
    ) -> tuple[bool, str | None]:
        raise NotImplementedError()

    def test(self, engine: SparkSession) -> TestResult:
        value_factual = self._get_factual_value(engine)
        value_target = self._get_target_value(engine)
        is_success, assertion_message = self._compare(value_factual, value_target)
        if is_success:
            return TestResult.success()
        return TestResult.failure(
            assertion_message,
            self.get_description(),
            render_plans(self._factual_selections),
            render_plans(self._target_selections),
        )

    def _apply_output_formatting(self, values: Collection) -> Collection:
        if self._output_processors is not None:
            for output_processor in self._output_processors:
                values, _ = output_processor(values)
        return values


def format_sample(sample, ref: DataReference) -> str:
    """Render a sample row with its column names (reference base.py:302-309)."""
    if ref.columns is None:
        return str(sample)
    return " , ".join(f"{c} = {v}" for c, v in zip(ref.columns, list(sample)))
