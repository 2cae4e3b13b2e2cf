"""Counterexamples and samples must be identical across partitionings
(SURVEY §7.3.8).  The reference's unordered LIMIT/first() is
nondeterministic; our operators sort before sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datajudge_spark.operators.regex import get_regex_violations
from datajudge_spark.operators.rows import (
    get_duplicate_sample,
    get_row_difference_sample,
)
from tests.conftest import make_ref


@pytest.fixture(scope="module")
def strings_df(spark):
    rows = [(f"v{i:03d}",) for i in range(50)] + [("BAD_x",), ("BAD_a",), ("BAD_m",)]
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("col_varchar", T.StringType())])
    )


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_regex_counterexamples_stable(spark, strings_df, n_parts):
    ref = make_ref(strings_df.repartition(n_parts), "t", ["col_varchar"])
    (n, examples), _ = get_regex_violations(spark, ref, False, r"^v\d+$", 2)
    assert n == 3
    assert examples == ["BAD_a", "BAD_m"]


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_regex_all_counterexamples_stable(spark, strings_df, n_parts):
    ref = make_ref(strings_df.repartition(n_parts), "t", ["col_varchar"])
    (_, examples), _ = get_regex_violations(spark, ref, False, r"^v\d+$", -1)
    assert examples == ["BAD_a", "BAD_m", "BAD_x"]


def test_regex_all_counterexamples_capped(spark, monkeypatch):
    # n_counterexamples=-1 must never collect unbounded rows: above the
    # cap it truncates (sorted prefix), warns, and keeps the exact count
    from datajudge_spark.operators import regex as regex_mod

    monkeypatch.setattr(regex_mod, "MAX_COUNTEREXAMPLES", 5)
    rows = [(f"BAD_{i:03d}",) for i in range(12)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("col_varchar", T.StringType())])
    )
    ref = make_ref(df, "t", ["col_varchar"])
    with pytest.warns(UserWarning, match="maximum of 5"):
        (n, examples), _ = get_regex_violations(spark, ref, False, r"^v\d+$", -1)
    assert n == 12
    assert examples == [f"BAD_{i:03d}" for i in range(5)]


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_row_difference_sample_stable(spark, n_parts):
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df1 = spark.createDataFrame(
        [(i, f"x{i}") for i in range(30)], schema
    ).repartition(n_parts)
    df2 = spark.createDataFrame([(i, f"x{i}") for i in range(25)], schema)
    ref1, ref2 = make_ref(df1, "t1"), make_ref(df2, "t2")
    sample, _ = get_row_difference_sample(spark, ref1, ref2)
    assert sample == (25, "x25")


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_duplicate_sample_stable(spark, n_parts):
    schema = T.StructType([T.StructField("a", T.IntegerType())])
    rows = [(i,) for i in range(20)] + [(7,), (3,), (11,)]
    df = spark.createDataFrame(rows, schema).repartition(n_parts)
    sample, _ = get_duplicate_sample(spark, make_ref(df, "t"))
    assert sample == (3,)
