"""Row-count constraints (parity: /root/reference/src/datajudge/constraints/nrows.py)."""

from __future__ import annotations

import abc

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from ..utils import format_difference
from .base import Constraint, OptionalSelections, TestResult, ToleranceGetter


class NRows(Constraint, abc.ABC):
    def __init__(
        self,
        ref: DataReference,
        *,
        ref2: DataReference | None = None,
        n_rows: int | None = None,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(
            ref, ref2=ref2, ref_value=n_rows, name=name, cache_size=cache_size
        )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[int, OptionalSelections]:
        return ops.get_row_count(engine, ref)


class NRowsMin(NRows):
    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[int, OptionalSelections]:
        # LIMIT-capped count: the scan short-circuits once enough rows are
        # seen (reference rationale nrows.py:41-48).
        return ops.get_row_count(engine, ref, row_limit=self._ref_value)

    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        result = value_factual >= value_target
        assertion_text = (
            f"{self._ref} has {value_factual} "
            f"< {self._target_prefix} {value_target} rows. "
            f"{self._condition_string}"
        )
        return result, assertion_text


class NRowsMax(NRows):
    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        result = value_factual <= value_target
        factual_fmt, target_fmt = format_difference(value_factual, value_target)
        assertion_text = (
            f"{self._ref} has {factual_fmt} "
            f"> {self._target_prefix} {target_fmt} rows. "
            f"{self._condition_string}"
        )
        return result, assertion_text


class NRowsEquality(NRows):
    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        result = value_factual == value_target
        factual_fmt, target_fmt = format_difference(value_factual, value_target)
        assertion_text = (
            f"{self._ref} has {factual_fmt} row(s) "
            f"instead of {self._target_prefix} {target_fmt}. "
            f"{self._condition_string}"
        )
        return result, assertion_text


class NRowsMaxLoss(NRows):
    def __init__(
        self,
        ref: DataReference,
        ref2: DataReference,
        max_relative_loss_getter: ToleranceGetter,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref2=ref2, name=name, cache_size=cache_size)
        self._max_relative_loss_getter = max_relative_loss_getter

    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        if value_target == 0:
            return True, "Empty target table."
        if value_factual > value_target:
            return True, "Row gain."
        relative_loss = (value_target - value_factual) / value_target
        assertion_text = (
            f"The #rows from {self._ref} have decreased by "
            f"{relative_loss:%} compared to table {self._ref2}. "
            f"They were expected to decrease by at most "
            f"{self._max_relative_loss:%}. "
            f"{self._condition_string}"
        )
        return relative_loss <= self._max_relative_loss, assertion_text

    def test(self, engine: SparkSession) -> TestResult:
        self._max_relative_loss = self._max_relative_loss_getter(engine)
        return super().test(engine)


class NRowsMaxGain(NRows):
    def __init__(
        self,
        ref: DataReference,
        ref2: DataReference,
        max_relative_gain_getter: ToleranceGetter,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref2=ref2, name=name, cache_size=cache_size)
        self._max_relative_gain_getter = max_relative_gain_getter

    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        if value_target == 0:
            return True, "Empty target table."
        if value_factual < value_target:
            return True, "Row loss."
        relative_gain = (value_factual - value_target) / value_target
        assertion_text = (
            f"{self._ref} has {relative_gain:%} gain in #rows compared to "
            f"{self._ref2}. It was only allowed "
            f"to increase by {self._max_relative_gain:%}. "
            f"{self._condition_string}"
        )
        return relative_gain <= self._max_relative_gain, assertion_text

    def test(self, engine: SparkSession) -> TestResult:
        self._max_relative_gain = self._max_relative_gain_getter(engine)
        return super().test(engine)


class NRowsMinGain(NRows):
    def __init__(
        self,
        ref: DataReference,
        ref2: DataReference,
        min_relative_gain_getter: ToleranceGetter,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref2=ref2, name=name, cache_size=cache_size)
        self._min_relative_gain_getter = min_relative_gain_getter

    def _compare(self, value_factual: int, value_target: int) -> tuple[bool, str]:
        if value_target == 0:
            return True, "Empty target table."
        if value_factual < value_target:
            return False, "Row loss."
        relative_gain = (value_factual - value_target) / value_target
        assertion_text = (
            f"{self._ref} has {relative_gain:%} gain in #rows compared to "
            f"{self._ref2}. It was supposed "
            f"to increase at least by {self._min_relative_gain:%}. "
            f"{self._condition_string}"
        )
        return relative_gain >= self._min_relative_gain, assertion_text

    def test(self, engine: SparkSession) -> TestResult:
        self._min_relative_gain = self._min_relative_gain_getter(engine)
        return super().test(engine)
