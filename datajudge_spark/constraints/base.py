"""Constraint kernel: ``TestResult`` + the ``Constraint`` ABC.

Behavioral parity with the reference lifecycle
(/root/reference/src/datajudge/constraints/base.py:33-309), restructured
in this repo's idiom; the externally visible bytes — validation errors,
descriptions, condition strings, logging-message layout — are pinned in
tests/test_message_parity.py.

The lifecycle: a constraint pulls a *factual* value out of ``ref`` and a
*target* value out of either ``ref2`` (a "between" constraint) or the
literal ``ref_value`` (a "within" constraint — exactly one of the two),
then ``_compare``s them.  Retrievals are cached per instance
(``cache_size=0`` disables, ``None`` = unbounded), so a requirement can
re-``test`` without re-running Spark actions.  On failure the optimized
Spark plans that produced the values are rendered into the
``TestResult`` where the reference renders compiled SQL
(base.py:268-287).
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

# The two retrieval slots wrapped with per-instance caches; subclasses
# that override either hook keep the caching because the wrap happens on
# the BOUND method at construction time.
_CACHED_HOOKS = ("_get_factual_value", "_get_target_value")


def uncommon_substrings(string1: str, string2: str) -> tuple[str, str]:
    """Strip the shared leading qualifier off two dotted names — the
    description of a between-constraint reads ``schema1.t1 | schema2.t2``
    rather than repeating the database twice (reference base.py:23-30,
    branch-for-branch including the single-qualifier fallback)."""
    parts1, parts2 = string1.split("."), string2.split(".")
    if parts1[0] != parts2[0]:
        # nothing shared: keep both names whole
        return string1, string2
    if len(parts1) > 1 and parts1[1] != parts2[0]:
        # shared first qualifier only: drop it from each side
        return ".".join(parts1[1:]), ".".join(parts2[1:])
    # degenerate overlap: fall back to the final qualifier
    return parts1[-1], parts2[-1]


def _fmt_or_none(text: str | None, formatter: Formatter) -> str | None:
    return formatter.fmt_str(text) if text else None


@dataclass(frozen=True)
class TestResult:
    """The outcome of one Constraint execution plus its renderings."""

    outcome: bool
    _failure_message: str | None = field(default=None, repr=False)
    _constraint_description: str | None = field(default=None, repr=False)
    _factual_queries: list[str] | None = field(default=None, repr=False)
    _target_queries: list[str] | None = field(default=None, repr=False)

    @classmethod
    def success(cls) -> "TestResult":
        return cls(True)

    @classmethod
    def failure(cls, *args, **kwargs) -> "TestResult":
        return cls(False, *args, **kwargs)

    def formatted_failure_message(self, formatter: Formatter) -> str | None:
        return _fmt_or_none(self._failure_message, formatter)

    def formatted_constraint_description(
        self, formatter: Formatter
    ) -> str | None:
        return _fmt_or_none(self._constraint_description, formatter)

    @property
    def failure_message(self) -> str | None:
        return self.formatted_failure_message(_DEFAULT_FORMATTER)

    @property
    def constraint_description(self) -> str | None:
        return self.formatted_constraint_description(_DEFAULT_FORMATTER)

    @property
    def logging_message(self) -> str:
        # compose the present sections in their fixed order; the exact
        # bytes (headers, comment fences, trailing rule) are golden-
        # pinned — downstream alerting parses them
        sections: list[str] = []
        if self.constraint_description:
            sections.append(f"/*\n\t{self.constraint_description}\n*/")
        if self.failure_message:
            sections.append(
                f"\n\n/*\nFailure message:\n{self.failure_message}\n*/"
            )
        if self._factual_queries is not None:
            joined = "\n".join(self._factual_queries)
            sections.append(f"\n\n --Factual plans: \n {joined}")
        if self._target_queries is not None:
            joined = "\n".join(self._target_queries)
            sections.append(f"\n\n-- Target plans: \n {joined}")
        sections.append("\n --- \n")
        return "".join(sections)


class Constraint(abc.ABC):
    """Compare a factual value from ``ref`` against a target value from
    ``ref2`` (between) or the literal ``ref_value`` (within).

    Subclasses implement ``_retrieve`` (DataReference -> value +
    contributing DataFrames) and ``_compare`` (factual, target ->
    verdict + message), or override ``test``/the ``_get_*_value`` hooks
    outright for multi-probe statistics.  The execution engine is a
    ``SparkSession``; retrievals trigger Spark actions where the
    reference issues SQL round trips.
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
        self._output_processors = self._as_processor_list(output_processors)
        self._cache_size = cache_size
        self._setup_caching()

    @staticmethod
    def _as_processor_list(
        processors: OutputProcessor | list[OutputProcessor] | None,
    ) -> list[OutputProcessor] | None:
        if processors is None or isinstance(processors, list):
            return processors
        return [processors]

    def _setup_caching(self) -> None:
        # Wrap the BOUND retrieval hooks so caches live per instance —
        # a class-level decorator would share one cache across every
        # constraint (and pin instances alive); wrapping here also
        # picks up subclass overrides of either hook.
        if self._cache_size == 0:
            return
        for hook in _CACHED_HOOKS:
            setattr(
                self, hook, lru_cache(self._cache_size)(getattr(self, hook))
            )

    def _check_if_valid_between_or_within(
        self, ref2: DataReference | None, ref_value: Any
    ) -> None:
        given = (ref2 is not None) + (ref_value is not None)
        if given == 1:
            return
        class_name = self.__class__.__name__
        if given == 2:
            raise ValueError(
                "Both table 2 ref and constant given to "
                f"{class_name}. Use either of them, not both."
            )
        raise ValueError(
            "Neither table 2 ref nor constant given to "
            f"{class_name}. Use exactly either of them."
        )

    # -- retrieval slots (cached per instance, overridable) ------------

    def _get_factual_value(self, engine: SparkSession) -> Any:
        value, self._factual_selections = self._retrieve(engine, self._ref)
        return value

    def _get_target_value(self, engine: SparkSession) -> Any:
        if self._ref2 is None:
            return self._ref_value
        value, self._target_selections = self._retrieve(engine, self._ref2)
        return value

    # -- message building blocks ---------------------------------------

    def get_description(self) -> str:
        if self.name is not None:
            return self.name
        source = str(self._ref.data_source)
        if self._ref2 is not None:
            lhs, rhs = uncommon_substrings(
                source, str(self._ref2.data_source)
            )
            source = f"{lhs} | {rhs}"
        return f"{self.__class__.__name__}::{source}"

    @property
    def _target_prefix(self) -> str:
        return f"{self._ref2}'s " if self._ref2 is not None else ""

    @property
    def _condition_string(self) -> str:
        cond1 = self._ref.condition
        cond2 = self._ref2.condition if self._ref2 is not None else None
        if cond1 is None and cond2 is None:
            return ""
        clause1 = self._ref._get_clause_string()
        if self._ref2 is None:
            # within constraint: single clause, no trailing separator
            return f"Condition: {clause1}"
        clause2 = self._ref2._get_clause_string()
        if cond1 == cond2:
            return f"Condition on both tables: {clause1}; "
        if cond1 is None:
            return f"Condition on second table: {clause2}; "
        if cond2 is None:
            return f"Condition on first table: {clause1}; "
        return (
            f"Condition on first table: {clause1}. "
            f"Condition on second table: {clause2}. "
        )

    # -- subclass contract ----------------------------------------------

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Any, OptionalSelections]:
        raise NotImplementedError()

    def _compare(
        self, value_factual: Any, value_target: Any
    ) -> tuple[bool, str | None]:
        raise NotImplementedError()

    # -- the lifecycle ----------------------------------------------------

    def test(self, engine: SparkSession) -> TestResult:
        factual = self._get_factual_value(engine)
        target = self._get_target_value(engine)
        ok, assertion_message = self._compare(factual, target)
        if ok:
            return TestResult.success()
        return TestResult.failure(
            assertion_message,
            self.get_description(),
            render_plans(self._factual_selections),
            render_plans(self._target_selections),
        )

    def _apply_output_formatting(self, values: Collection) -> Collection:
        for processor in self._output_processors or ():
            values, _ = processor(values)
        return values


def format_sample(sample, ref: DataReference) -> str:
    """Render a sample row as ``col = value`` pairs when the reference
    names columns, else the row's plain repr (reference base.py:302-309)."""
    if ref.columns is None:
        return str(sample)
    return " , ".join(f"{c} = {v}" for c, v in zip(ref.columns, list(sample)))
