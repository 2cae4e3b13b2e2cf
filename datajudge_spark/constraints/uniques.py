"""Uniques constraints (parity: /root/reference/src/datajudge/constraints/uniques.py)."""

from __future__ import annotations

import abc
import warnings
from collections import Counter
from collections.abc import Callable, Collection
from itertools import zip_longest
from math import ceil, floor

from pyspark.sql import SparkSession

from .. import operators as ops
from ..reference import DataReference
from ..operators.uniques import DEFAULT_MAX_UNIQUES
from ..utils import OutputProcessor, filternull_element, output_processor_limit
from .base import Constraint, OptionalSelections, TestResult, ToleranceGetter, _T


def _is_superset(
    values1: Collection[_T], values2: Collection[_T]
) -> tuple[bool, set[_T]]:
    """Check whether values1 is a superset of values2 (reference uniques.py:18-23)."""
    remainder = set(values2) - set(values1)
    return len(remainder) == 0, remainder


def _is_subset(
    values1: Collection[_T], values2: Collection[_T]
) -> tuple[bool, set[_T]]:
    """Check whether values1 is a subset of values2 (reference uniques.py:26-31)."""
    remainder = set(values1) - set(values2)
    return len(remainder) == 0, remainder


def _subset_violation_counts(
    values1: Collection[_T], counts: list[int], values2: Collection[_T]
) -> tuple[bool, dict]:
    """Frequencies of elements from values1 not in values2
    (reference uniques.py:34-43)."""
    remainder = {
        value: count
        for (value, count) in zip_longest(values1, counts, fillvalue=-1)
        if value not in values2
    }
    return len(remainder) == 0, remainder


class Uniques(Constraint, abc.ABC):
    """Compare unique values of column(s) against a reference set
    (reference uniques.py:46-165). NULL handling is driver-side via
    ``filter_func`` (utils.filternull_*); ``map_func``/``reduce_func`` allow
    per-value and global post-processing of collected uniques."""

    def __init__(
        self,
        ref: DataReference,
        name: str | None = None,
        cache_size=None,
        output_processors: OutputProcessor
        | list[OutputProcessor]
        | None = output_processor_limit,
        *,
        ref2: DataReference | None = None,
        uniques: Collection | None = None,
        filter_func: Callable[[list], list] | None = None,
        map_func: Callable | None = None,
        reduce_func: Callable[[Collection], Collection] | None = None,
        max_relative_violations=0,
        compare_distinct=False,
        max_uniques: int | None = DEFAULT_MAX_UNIQUES,
    ):
        ref_value: tuple[Collection, list] | None
        ref_value = (uniques, []) if uniques else None
        super().__init__(
            ref,
            ref2=ref2,
            ref_value=ref_value,
            name=name,
            cache_size=cache_size,
            output_processors=output_processors,
        )
        if filter_func is None:
            warnings.warn("Using deprecated default null filter function.")
            filter_func = filternull_element
        self._filter_func = filter_func
        self._local_func = map_func
        self._global_func = reduce_func
        self._max_relative_violations = max_relative_violations
        self._compare_distinct = compare_distinct
        self._max_uniques = max_uniques

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[tuple[list, list[int]], OptionalSelections]:
        uniques, selections = ops.get_uniques(
            engine, ref, max_uniques=self._max_uniques
        )
        values = list(uniques.keys())
        values = self._filter_func(values)
        counts = [uniques[value] for value in values]
        if self._local_func:
            values = list(map(self._local_func, values))
        if self._global_func:
            values = list(self._global_func(values))
            if not isinstance(values, Collection):
                raise ValueError(
                    "The return value from `reduce_func` is not a Collection."
                )
        return (values, counts), selections


class UniquesEquality(Uniques):
    def __init__(self, args, name: str | None = None, cache_size=None, **kwargs):
        if kwargs.get("max_relative_violations"):
            raise RuntimeError(
                "max_relative_violations is not supported for UniquesEquality."
            )
        if kwargs.get("compare_distinct"):
            raise RuntimeError("compare_distinct is not supported for UniquesEquality.")
        super().__init__(args, name=name, cache_size=cache_size, **kwargs)

    def _compare(
        self,
        value_factual: tuple[list, list[int]],
        value_target: tuple[Collection, list[int]],
    ) -> tuple[bool, str | None]:
        factual_values = set(value_factual[0])
        target_values = set(value_target[0])
        is_subset, excess_values = _is_subset(factual_values, target_values)
        is_superset, lacking_values = _is_superset(factual_values, target_values)
        if not is_subset and not is_superset:
            return False, (
                f"{self._ref} doesn't have the element(s) "
                f"'{self._apply_output_formatting(lacking_values)}' and has the "
                f"excess element(s) "
                f"'{self._apply_output_formatting(excess_values)}' when compared "
                f"with the reference values. "
                f"{self._condition_string}"
            )
        if not is_subset:
            return False, (
                f"{self._ref} has the excess element(s) "
                f"'{self._apply_output_formatting(excess_values)}' when compared "
                f"with the reference values. "
                f"{self._condition_string}"
            )
        if not is_superset:
            return False, (
                f"{self._ref} doesn't have the element(s) "
                f"'{self._apply_output_formatting(lacking_values)}' when compared "
                f"with the reference values. "
                f"{self._condition_string}"
            )
        return True, None


class UniquesSubset(Uniques):
    def _compare(
        self,
        value_factual: tuple[list, list[int]],
        value_target: tuple[Collection, list[int]],
    ) -> tuple[bool, str | None]:
        factual_values, factual_counts = value_factual
        target_values, _ = value_target

        is_subset, remainder = _subset_violation_counts(
            factual_values, factual_counts, target_values
        )
        if not self._compare_distinct:
            n_rows = sum(factual_counts)
            n_violations = sum(remainder.values())
        else:
            n_rows = len(factual_values)
            n_violations = len(remainder)

        if (
            n_rows > 0
            and (relative_violations := (n_violations / n_rows))
            > self._max_relative_violations
        ):
            output_elems, output_counts = (
                list(remainder.keys()),
                list(remainder.values()),
            )
            if self._output_processors is not None:
                for output_processor in self._output_processors:
                    output_elems, output_counts = output_processor(
                        output_elems, output_counts
                    )
            return False, (
                f"{self._ref} has a fraction of {relative_violations} > "
                f"{self._max_relative_violations} "
                f"{'DISTINCT ' if self._compare_distinct else ''}values "
                f"({n_violations} / {n_rows}) not being an element of "
                f"'{self._apply_output_formatting(set(target_values))}'. "
                f"It has excess elements "
                f"'{output_elems}' "
                f"with counts {output_counts}."
                f"{self._condition_string}"
            )
        return True, None


class UniquesSuperset(Uniques):
    def __init__(self, args, name: str | None = None, cache_size=None, **kwargs):
        if kwargs.get("compare_distinct"):
            raise RuntimeError("compare_distinct is not supported for UniquesSuperset.")
        super().__init__(args, name=name, cache_size=cache_size, **kwargs)

    def _compare(
        self,
        value_factual: tuple[list, list[int]],
        value_target: tuple[Collection, list[int]],
    ) -> tuple[bool, str | None]:
        factual_values, _ = value_factual
        target_values, _ = value_target
        is_superset, remainder = _is_superset(factual_values, target_values)
        if (
            len(factual_values) > 0
            and (
                relative_violations := (
                    (n_violations := len(remainder)) / (n_rows := len(target_values))
                )
            )
            > self._max_relative_violations
        ):
            return False, (
                f"{self._ref} has a fraction of "
                f"{relative_violations} > {self._max_relative_violations} "
                f"({n_violations} / {n_rows}) "
                f"lacking unique values of "
                f"'{self._apply_output_formatting(set(target_values))}'. It "
                f"doesn't have the unique value(s) "
                f"'{self._apply_output_formatting(list(remainder))}'."
                f"{self._condition_string}"
            )
        return True, None


class NUniques(Constraint, abc.ABC):
    def __init__(
        self,
        ref: DataReference,
        *,
        ref2: DataReference | None = None,
        n_uniques: int | None = None,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(
            ref, ref2=ref2, ref_value=n_uniques, name=name, cache_size=cache_size
        )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[int, OptionalSelections]:
        return ops.get_unique_count(engine, ref)


class NUniquesEquality(NUniques):
    def _compare(
        self, value_factual: int, value_target: int
    ) -> tuple[bool, str | None]:
        result = value_factual == value_target
        assertion_text = (
            f"{self._ref} has {value_factual} "
            f"unique(s) instead of {self._target_prefix}"
            f"{value_target}. "
            f"{self._condition_string}"
        )
        return result, assertion_text


class NUniquesMaxLoss(NUniques):
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

    def _compare(
        self, value_factual: int, value_target: int
    ) -> tuple[bool, str | None]:
        if value_target == 0 or value_factual > value_target:
            return True, None
        relative_loss = (value_target - value_factual) / value_target
        assertion_text = (
            f"{self._ref} has lost {relative_loss} "
            f"of #uniques of table {self._ref2}. It "
            f"was only allowed to decrease "
            f"{self._max_relative_loss}. "
            f"{self._condition_string}"
        )
        return relative_loss <= self._max_relative_loss, assertion_text

    def test(self, engine: SparkSession) -> TestResult:
        self._max_relative_loss = self._max_relative_loss_getter(engine)
        return super().test(engine)


class NUniquesMaxGain(NUniques):
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

    def _compare(
        self, value_factual: int, value_target: int
    ) -> tuple[bool, str | None]:
        if value_target == 0:
            return False, "Target table empty."
        if value_factual < value_target:
            return True, None
        relative_gain = (value_factual - value_target) / value_target
        assertion_text = (
            f"{self._ref} has {relative_gain} of "
            f"#uniques of {self._ref2}. It was only "
            f"allowed to increase {self._max_relative_gain} . "
            f"{self._condition_string}"
        )
        return relative_gain <= self._max_relative_gain, assertion_text

    def test(self, engine: SparkSession) -> TestResult:
        self._max_relative_gain = self._max_relative_gain_getter(engine)
        return super().test(engine)


class CategoricalBoundConstraint(Constraint):
    """Shares of specific column values must fall within per-value bounds
    (reference uniques.py:399-495)."""

    def __init__(
        self,
        ref: DataReference,
        distribution: dict,
        default_bounds: tuple[float, float] = (0, 0),
        name: str | None = None,
        cache_size=None,
        max_relative_violations: float = 0,
        max_uniques: int | None = DEFAULT_MAX_UNIQUES,
        **kwargs,
    ):
        self._default_bounds = default_bounds
        self._max_relative_violations = max_relative_violations
        self._max_uniques = max_uniques
        super().__init__(
            ref, ref_value=distribution, name=name, cache_size=cache_size, **kwargs
        )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[Counter, OptionalSelections]:
        return ops.get_uniques(engine, ref, max_uniques=self._max_uniques)

    def _compare(
        self, value_factual: Counter, value_target: dict
    ) -> tuple[bool, str | None]:
        total = value_factual.total()
        all_variants = value_factual.keys() | value_target.keys()
        min_counts = Counter(
            {
                k: value_target.get(k, self._default_bounds)[0] * total
                for k in all_variants
            }
        )
        max_counts = Counter(
            {
                k: value_target.get(k, self._default_bounds)[1] * total
                for k in all_variants
            }
        )
        violations = (value_factual - max_counts) + (min_counts - value_factual)
        if (
            relative_violations := violations.total() / total
        ) > self._max_relative_violations:
            assertion_text = (
                f"{self._ref} has {relative_violations * 100}% > "
                f"{self._max_relative_violations * 100}% of element(s) "
                f"violating the bound constraints:\n"
            )
            for variant in violations:
                actual_share = value_factual[variant] / total
                target_share = value_target.get(variant, self._default_bounds)
                assertion_text += (
                    f"'{variant}' with a share of {actual_share * 100}% "
                    f"({value_factual[variant]} out of {total}) "
                    f"while a share between {target_share[0] * 100}% "
                    f"({ceil(min_counts[variant])}) "
                    f"and {target_share[1] * 100}% ({floor(max_counts[variant])}) "
                    f"is required\n"
                )
            assertion_text += f"{self._condition_string}"
            return False, assertion_text
        return True, None
