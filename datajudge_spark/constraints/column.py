"""Column/schema constraints (parity: /root/reference/src/datajudge/constraints/column.py)."""

from __future__ import annotations

import abc

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .. import operators as ops
from ..reference import DataReference
from .base import Constraint, OptionalSelections


class Column(Constraint, abc.ABC):
    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[list[str], OptionalSelections]:
        return ops.get_column_names(engine, ref)


class ColumnExistence(Column):
    def __init__(
        self,
        ref: DataReference,
        columns: list[str],
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(ref, ref_value=columns, name=name, cache_size=cache_size)

    def _compare(
        self, value_factual: list[str], value_target: list[str]
    ) -> tuple[bool, str]:
        excluded_columns = [c for c in value_target if c not in value_factual]
        assertion_message = (
            f"{self._ref} doesn't have column(s) {', '.join(excluded_columns)}."
        )
        return len(excluded_columns) == 0, assertion_message


class ColumnSubset(Column):
    """ref's columns must all appear in ref2 (reference column.py:45-54)."""

    def _compare(
        self, value_factual: list[str], value_target: list[str]
    ) -> tuple[bool, str]:
        missing_columns = [c for c in value_factual if c not in value_target]
        assertion_message = (
            f"{self._ref2} doesn't have column(s) {', '.join(missing_columns)}. "
        )
        return len(missing_columns) == 0, assertion_message


class ColumnSuperset(Column):
    """ref must contain all of ref2's columns (reference column.py:57-66)."""

    def _compare(
        self, value_factual: list[str], value_target: list[str]
    ) -> tuple[bool, str]:
        missing_columns = [c for c in value_target if c not in value_factual]
        assertion_message = (
            f"{self._ref} doesn't have column(s) {', '.join(missing_columns)}."
        )
        return len(missing_columns) == 0, assertion_message


class ColumnType(Constraint):
    """Column type matches a Spark ``DataType`` (isinstance, subclasses pass)
    or a type-name string (prefix match on ``simpleString()`` with SQL-ish
    aliases normalized — reference column.py:69-116)."""

    def __init__(
        self,
        ref: DataReference,
        *,
        ref2: DataReference | None = None,
        column_type: str | T.DataType | None = None,
        name: str | None = None,
        cache_size=None,
    ):
        super().__init__(
            ref, ref2=ref2, ref_value=column_type, name=name, cache_size=cache_size
        )

    def _retrieve(
        self, engine: SparkSession, ref: DataReference
    ) -> tuple[T.DataType, OptionalSelections]:
        return ops.get_column_type(engine, ref)

    def _compare(self, value_factual, value_target) -> tuple[bool, str]:
        assertion_message = f"{self._ref} is {value_factual} instead of {value_target}."
        if isinstance(value_target, T.DataType):
            result = isinstance(value_factual, type(value_target))
        else:
            factual_name = value_factual.simpleString().lower()
            target_name = ops.normalize_type_name(value_target)
            result = factual_name.startswith(target_name)
        return result, assertion_message
