"""The pytest-collection surface (`collect_data_tests`) exercised as a
REAL nested pytest run: a user-style spec module is written to a temp
dir, collected, and executed with `pytest.main` — the exact path the
verify recipe and the reference's own integration suite use
(reference pytest_integration.py:35-56)."""

from __future__ import annotations

import textwrap

import pytest

from datajudge_spark import WithinRequirement
from datajudge_spark.pytest_integration import collect_data_tests


class TestCollectDataTests:
    def test_returns_parametrized_function(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "c long")
        req = WithinRequirement.from_expression(df, "t")
        req.add_n_rows_equality_constraint(3)
        req.add_n_rows_equality_constraint(99)
        fn = collect_data_tests([req])
        assert fn.__name__ == "test_constraint"
        marks = [m for m in fn.pytestmark if m.name == "parametrize"]
        assert len(marks) == 1
        assert len(marks[0].args[1]) == 2  # one param per constraint

    def test_nested_pytest_run_reports_pass_and_fail(self, spark, tmp_path):
        # a user-style spec: the datajudge_engine fixture + collected tests
        parquet = str(tmp_path / "orders.parquet")
        spark.createDataFrame(
            [(i, float(i * 10)) for i in range(1, 21)], "k long, v double"
        ).write.parquet(parquet)
        spec = tmp_path / "spec_test.py"
        spec.write_text(
            textwrap.dedent(
                f"""
                import pytest
                from datajudge_spark import WithinRequirement
                from datajudge_spark.pytest_integration import (
                    collect_data_tests,
                )

                @pytest.fixture(scope="session")
                def datajudge_engine():
                    from pyspark.sql import SparkSession
                    return SparkSession.builder.getOrCreate()

                req = WithinRequirement.from_parquet({parquet!r})
                req.add_n_rows_min_constraint(10)          # pass
                req.add_uniqueness_constraint(["k"])       # pass
                req.add_n_rows_max_constraint(5)           # deliberate fail
                test_constraint = collect_data_tests([req])
                """
            )
        )
        # reuse the already-running session inside the nested run
        rc = pytest.main(["-q", "-p", "no:cacheprovider", str(spec)])
        # exit code 1 == "tests were collected and some failed" — the
        # deliberate failure proves assertions flow through; a clean
        # environment problem would be exit code 2+ instead
        assert rc == 1
