"""Row-level set gates: equality / subset / superset via EXCEPT
DISTINCT, and the matched-rows comparison gate.

All set operations use EXCEPT-DISTINCT semantics (``subtract``), as the
reference mandates (requirements.py:2092-2095).  Message wording stays
byte-compatible with the reference
(/root/reference/src/datajudge/constraints/row.py); pinned by
``tests/test_message_parity.py``.  The structure is the repo's own: one
declarative missing-fraction core drives equality/subset/superset
through three small difference/denominator/verdict specs.
"""

from __future__ import annotations

import abc

from pyspark.sql import SparkSession

from .. import operators as ops
from ..operators import MatchAndCompare
from ..reference import DataReference
from .base import Constraint, TestResult, ToleranceGetter, format_sample

_SAY_DIFFER = (
    "{ratio} > {slack} of rows differ between {left} and {right}. "
    "E.g. for {sample}."
)
_SAY_NOT_IN = (
    "{ratio} > {slack} of rows of {holder} are not in {other}. "
    "E.g. for {sample}. {cond} "
)
_SAY_MATCH_DIFFER = (
    "{ratio} > {slack} of the rows differ on a match of {matched} rows "
    "between {left} and {right}. {cond}{spec} "
)


class Row(Constraint, abc.ABC):
    """Shared skeleton: resolve the engine-dependent tolerance, pull a
    counterexample from each set difference (both directions, so the
    verdict can show whichever side actually misses rows), then run the
    standard factual/target comparison."""

    def __init__(
        self,
        ref: DataReference,
        ref2: DataReference,
        max_missing_fraction_getter: ToleranceGetter,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref2=ref2, name=name, cache_size=cache_size)
        self._max_missing_fraction_getter = max_missing_fraction_getter

    def test(self, engine: SparkSession) -> TestResult:
        if self._ref is None or self._ref2 is None:
            raise ValueError()
        self._max_missing_fraction = self._max_missing_fraction_getter(engine)
        self._ref1_minus_ref2_sample, _ = ops.get_row_difference_sample(
            engine, self._ref, self._ref2
        )
        self._ref2_minus_ref1_sample, _ = ops.get_row_difference_sample(
            engine, self._ref2, self._ref
        )
        return super().test(engine)

    def _difference_count(self, engine: SparkSession, a, b) -> int:
        count, selections = ops.get_row_difference_count(engine, a, b)
        return count, selections


class _OneSidedContainment(Row, abc.ABC):
    """subset/superset: |holder − other| / |holder| must stay within
    tolerance.  Subclasses say which reference HOLDS the rows that must
    be contained in the other."""

    _holder_is_ref2: bool

    def _sides(self):
        if self._holder_is_ref2:
            return self._ref2, self._ref
        return self._ref, self._ref2

    def _get_factual_value(self, engine: SparkSession) -> int:
        holder, other = self._sides()
        missing, self._factual_selections = self._difference_count(
            engine, holder, other
        )
        return missing

    def _get_target_value(self, engine: SparkSession) -> int:
        holder, _other = self._sides()
        total, self._target_selections = ops.get_unique_count(engine, holder)
        return total

    def _compare(
        self, n_rows_missing: int, n_rows_total: int
    ) -> tuple[bool, str | None]:
        if n_rows_total == 0:
            return True, None
        ratio = n_rows_missing / n_rows_total
        if ratio <= self._max_missing_fraction:
            return True, None
        holder, other = self._sides()
        sample = (
            self._ref2_minus_ref1_sample
            if self._holder_is_ref2
            else self._ref1_minus_ref2_sample
        )
        return False, _SAY_NOT_IN.format(
            ratio=ratio,
            slack=self._max_missing_fraction,
            holder=holder,
            other=other,
            sample=format_sample(sample, holder),
            cond=self._condition_string,
        )


class RowSubset(_OneSidedContainment):
    _holder_is_ref2 = False


class RowSuperset(_OneSidedContainment):
    _holder_is_ref2 = True


class RowEquality(Row):
    """Symmetric difference over the distinct union:
    (|T1 − T2| + |T2 − T1|) / |T1 ∪ T2|."""

    def _get_factual_value(self, engine: SparkSession) -> tuple[int, int]:
        left_missing, left_sel = self._difference_count(
            engine, self._ref, self._ref2
        )
        right_missing, right_sel = self._difference_count(
            engine, self._ref2, self._ref
        )
        self._factual_selections = [*left_sel, *right_sel]
        return left_missing, right_missing

    def _get_target_value(self, engine: SparkSession) -> int:
        union_size, self._target_selections = ops.get_unique_count_union(
            engine, self._ref, self._ref2
        )
        return union_size

    def _compare(
        self, n_rows_missing_tuple: tuple[int, int], n_rows_total: int
    ) -> tuple[bool, str | None]:
        left_missing, right_missing = n_rows_missing_tuple
        ratio = (left_missing + right_missing) / n_rows_total
        if ratio <= self._max_missing_fraction:
            return True, None
        # show a row from whichever direction actually misses
        if left_missing > 0:
            sample = format_sample(self._ref1_minus_ref2_sample, self._ref2)
        else:
            sample = format_sample(self._ref2_minus_ref1_sample, self._ref)
        return False, _SAY_DIFFER.format(
            ratio=ratio,
            slack=self._max_missing_fraction,
            left=self._ref,
            right=self._ref2,
            sample=sample,
        )


class RowMatchingEquality(Row):
    """Among rows MATCHED on key columns, the fraction whose comparison
    columns disagree must stay within tolerance — the "same entity,
    different payload" gate."""

    def __init__(
        self,
        ref: DataReference,
        ref2: DataReference,
        matching_columns1: list[str],
        matching_columns2: list[str],
        comparison_columns1: list[str],
        comparison_columns2: list[str],
        max_missing_fraction_getter: ToleranceGetter,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(
            ref,
            ref2=ref2,
            max_missing_fraction_getter=max_missing_fraction_getter,
            name=name,
            cache_size=cache_size,
        )
        self._match_and_compare = MatchAndCompare(
            matching_columns1,
            matching_columns2,
            comparison_columns1,
            comparison_columns2,
        )

    def test(self, engine: SparkSession) -> TestResult:
        ratio, matched, _selections = ops.get_row_mismatch(
            engine, self._ref, self._ref2, self._match_and_compare
        )
        slack = self._max_missing_fraction_getter(engine)
        if ratio <= slack:
            return TestResult.success()
        return TestResult.failure(
            _SAY_MATCH_DIFFER.format(
                ratio=ratio,
                slack=slack,
                matched=matched,
                left=self._ref,
                right=self._ref2,
                cond=self._condition_string,
                spec=self._match_and_compare,
            )
        )


class SequenceMonotonicityMax(Constraint):
    """Sequence-integrity gate: within each key's ordered sequence, the
    fraction of adjacent steps where the value goes BACKWARD (or fails
    to strictly increase, ``strict=True``) may not exceed
    ``max_violation_fraction`` — clock skew, re-ingestion, and
    out-of-order backfill made visible per key.  The failure names the
    worst offender keys.  Extension, no reference counterpart.

    Engine: ``operators.rows.sequence_monotonicity`` — the only window
    is PARTITIONED BY the key (local sorts after one hash shuffle, no
    global ordering anywhere).
    """

    def __init__(
        self,
        ref: DataReference,
        key_column: str,
        order_column: str,
        value_column: str,
        max_violation_fraction: float = 0.0,
        strict: bool = False,
        name: str | None = None,
        cache_size=None,
    ):
        if not (0 <= max_violation_fraction <= 1):
            raise ValueError(
                "max_violation_fraction must be within [0, 1]"
            )
        self._key = key_column
        self._order = order_column
        self._value = value_column
        self._max_frac = max_violation_fraction
        self._strict = strict
        super().__init__(
            ref,
            ref_value=max_violation_fraction,
            name=name,
            cache_size=cache_size,
        )

    def test(self, engine: SparkSession) -> TestResult:
        from ..operators.rows import sequence_monotonicity

        row = sequence_monotonicity(
            self._ref.get_selection(engine),
            self._key,
            self._order,
            self._value,
            strict=self._strict,
        ).collect()[0]
        if row["violation_fraction"] <= self._max_frac:
            return TestResult.success()
        mode = "strictly increase" if self._strict else "stay nondecreasing"
        assertion_text = (
            f"{self._value} fails to {mode} along {self._order} within "
            f"{row['n_keys']} {self._key} sequences of {self._ref}: "
            f"{row['n_violations']} of {row['n_pairs']} adjacent steps "
            f"violate (fraction {row['violation_fraction']} > "
            f"{self._max_frac}); worst keys: {row['top_keys']}. "
            f"{self._condition_string} "
        )
        return TestResult.failure(assertion_text, self.get_description())
