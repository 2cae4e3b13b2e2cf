"""Constraint classes — the semantic surface of the engine (SURVEY.md §2.11)."""

from . import (  # noqa: F401
    column,
    date,
    groupby,
    interval,
    miscs,
    nrows,
    numeric,
    row,
    stats,
    uniques,
    varchar,
)
from .base import Constraint, TestResult  # noqa: F401
