"""pytest collection of data tests.

Parity with /root/reference/src/datajudge/pytest_integration.py:35-56: turns
a set of requirements into one parametrized ``test_constraint``. The
``datajudge_engine`` fixture must yield a ``SparkSession`` (the name is kept
from the reference so existing test suites transliterate unchanged).
"""

from __future__ import annotations

from collections.abc import Iterable

import pytest

from .constraints.base import Constraint
from .formatter import AnsiColorFormatter, Formatter
from .requirements import Requirement


def get_formatter(pytestconfig) -> Formatter:
    color = pytestconfig.getoption("color")
    if color in ("yes", "auto"):
        return AnsiColorFormatter()
    return Formatter()


def collect_data_tests(requirements: Iterable[Requirement]):
    """Make a pytest test case checking all ``requirements``.

    Returns a function named ``test_constraint`` parametrized over all
    constraints; it requires a ``datajudge_engine`` fixture yielding a
    SparkSession.
    """
    all_constraints = [
        constraint for requirement in requirements for constraint in requirement
    ]

    @pytest.mark.parametrize(
        "constraint", all_constraints, ids=Constraint.get_description
    )
    def test_constraint(constraint, datajudge_engine, pytestconfig):
        formatter = get_formatter(pytestconfig)
        test_result = constraint.test(datajudge_engine)
        assert test_result.outcome, test_result.formatted_failure_message(formatter)

    return test_constraint
