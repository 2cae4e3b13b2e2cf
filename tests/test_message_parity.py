"""Byte-exact failure-message goldens for the reference-compatible
comparison layer (nrows / numeric / date).

The messages below were captured from the round-8 implementation, whose
wording is verbatim reference wording (NOTICE, docs/DERIVATION.md).
These goldens are what allows the constraint *source* to be rewritten in
the repo's own idiom (round-9 burn-down of the copied surface) without
breaking the port guarantee: a datajudge spec must keep producing
identical verdicts AND identical failure messages, because downstream
alerting parses them.
"""

from __future__ import annotations

import pytest

from datajudge_spark import BetweenRequirement, WithinRequirement


@pytest.fixture(scope="module")
def views(spark):
    spark.createDataFrame(
        [(i, float(i), f"2024-01-{(i % 27) + 1:02d}") for i in range(1, 11)],
        "k long, v double, d string",
    ).selectExpr("k", "v", "cast(d as date) as d").createOrReplaceTempView(
        "mp_small"
    )
    spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "k long, v double"
    ).createOrReplaceTempView("mp_big")
    spark.createDataFrame(
        [
            (1, "2024-01-01", "2024-01-10"),
            (1, "2024-01-05", "2024-01-20"),
            (2, "2024-02-01", "2024-02-05"),
            (2, "2024-02-10", "2024-02-15"),
        ],
        "k long, s string, e string",
    ).selectExpr(
        "k", "cast(s as date) as s", "cast(e as date) as e"
    ).createOrReplaceTempView("mp_iv")
    return spark


WITHIN_GOLDEN = [
    ("add_n_rows_min_constraint", (99,), {}, "mp_small has 10 <  99 rows. "),
    ("add_n_rows_max_constraint", (2,), {}, "mp_small has 10 >  2 rows. "),
    (
        "add_n_rows_equality_constraint",
        (3,),
        {},
        "mp_small has 10 row(s) instead of  3. ",
    ),
    (
        "add_numeric_min_constraint",
        ("v", 5.0),
        {},
        "mp_small's column(s) 'v' has min 1.0 instead of 5.0 . ",
    ),
    (
        "add_numeric_max_constraint",
        ("v", 5.0),
        {},
        "mp_small's column(s) 'v' has max 10.0 instead of 5.0. ",
    ),
    (
        "add_numeric_between_constraint",
        ("v", 2.0, 4.0, 0.9),
        {},
        "mp_small's column(s) 'v' has 0.3 < 0.9 of rows "
        "between 2.0 and 4.0. ",
    ),
    (
        "add_numeric_mean_constraint",
        ("v", 9.9, 0.01),
        {},
        "mp_small's column(s) 'v' has mean 5.5, deviating more than "
        "0.01 from  9.9. ",
    ),
    (
        "add_numeric_percentile_constraint",
        ("v", 50, 9.0),
        {"max_absolute_deviation": 0.1},
        "The 50-th percentile of mp_small's column(s) 'v' was expected "
        "to be 9.0 but was 5.0, resulting in an absolute difference of "
        "4.0. The maximally allowed absolute deviation would've been "
        "0.1.",
    ),
    (
        "add_numeric_percentile_constraint",
        ("v", 50, 9.0),
        {"max_relative_deviation": 0.001},
        "The 50-th percentile of mp_small's column(s) 'v'  was expected "
        "to be 9.0 but was 5.0, resulting in a relative difference of "
        "0.4444444444444444. The maximally allowed relative deviation "
        "would've been 0.001.",
    ),
    (
        "add_date_min_constraint",
        ("d", "'2024-01-05'"),
        {},
        "mp_small's column(s) 'd' has min 2024-01-02 <  2024-01-05. ",
    ),
    (
        "add_date_min_constraint",
        ("d", "'2023-01-01'"),
        {"use_lower_bound_reference": False},
        "mp_small's column(s) 'd' has min 2024-01-02 >  2023-01-01. ",
    ),
    (
        "add_date_max_constraint",
        ("d", "'2024-01-05'"),
        {},
        "mp_small's column(s) 'd' has max 2024-01-11 >  2024-01-05. ",
    ),
    (
        "add_date_max_constraint",
        ("d", "'2025-12-31'"),
        {"use_upper_bound_reference": False},
        "mp_small's column(s) 'd' has max 2024-01-11 <  2025-12-31. ",
    ),
    (
        "add_date_between_constraint",
        ("d", "'2024-01-01'", "'2024-01-03'", 0.9),
        {},
        "mp_small's column(s) 'd' has 0.2 < 0.9 of values between "
        "'2024-01-01' and '2024-01-03'.  ",
    ),
]


@pytest.mark.parametrize(
    "factory,args,kwargs,expected",
    WITHIN_GOLDEN,
    ids=[f"{f}-{i}" for i, (f, _, _, _) in enumerate(WITHIN_GOLDEN)],
)
def test_within_failure_messages_exact(views, factory, args, kwargs, expected):
    req = WithinRequirement.from_table("mp_small")
    getattr(req, factory)(*args, **kwargs)
    result = req.test(views)[0]
    assert result.outcome is False
    assert result.failure_message == expected


def test_date_interval_failure_messages_exact(views):
    req = WithinRequirement.from_table("mp_iv")
    req.add_date_no_overlap_constraint(
        "s", "e", key_columns=["k"], max_relative_n_violations=0.0
    )
    req.add_date_no_gap_constraint(
        "s", "e", key_columns=["k"], max_relative_n_violations=0.0
    )
    overlap, gap = req.test(views)
    assert overlap.failure_message == (
        "mp_iv's column(s) 's', 'e', 'k' has a ratio of 0.5 > 0.0 keys "
        "in columns ['k'] with overlapping date ranges in s and e."
        "E.g. for: (1, datetime.date(2024, 1, 1), "
        "datetime.date(2024, 1, 5), datetime.date(2024, 1, 10), "
        "datetime.date(2024, 1, 20))."
    )
    assert gap.failure_message == (
        "mp_iv's column(s) 's', 'e', 'k' has a ratio of 0.5 > 0.0 keys "
        "in columns ['k'] with a gap in the date range in s and e."
        "E.g. for: (2, datetime.date(2024, 2, 10), "
        "datetime.date(2024, 2, 5))."
    )


def test_between_nrows_failure_messages_exact(views):
    shrink = BetweenRequirement.from_tables("mp_small", "mp_big")
    shrink.add_n_rows_equality_constraint()
    shrink.add_n_rows_min_gain_constraint(constant_min_relative_gain=0.5)
    shrink.add_n_rows_max_loss_constraint(constant_max_relative_loss=0.1)
    eq, min_gain, max_loss = shrink.test(views)
    assert eq.failure_message == (
        "mp_small has 10 row(s) instead of mp_big's  100. "
    )
    assert (min_gain.outcome, min_gain.failure_message) == (
        False,
        "Row loss.",
    )
    assert max_loss.failure_message == (
        "The #rows from mp_small have decreased by 90.000000% compared "
        "to table mp_big. They were expected to decrease by at most "
        "10.000000%. "
    )

    grow = BetweenRequirement.from_tables("mp_big", "mp_small")
    grow.add_n_rows_max_gain_constraint(constant_max_relative_gain=0.1)
    grow.add_n_rows_min_gain_constraint(constant_min_relative_gain=20.0)
    grow.add_n_rows_max_loss_constraint(constant_max_relative_loss=0.1)
    max_gain, min_gain2, max_loss2 = grow.test(views)
    assert max_gain.failure_message == (
        "mp_big has 900.000000% gain in #rows compared to mp_small. "
        "It was only allowed to increase by 10.000000%. "
    )
    assert min_gain2.failure_message == (
        "mp_big has 900.000000% gain in #rows compared to mp_small. "
        "It was supposed to increase at least by 2000.000000%. "
    )
    # row GAIN short-circuits a max-loss gate to a clean pass
    assert max_loss2.outcome is True


@pytest.fixture(scope="module")
def views2(spark):
    spark.createDataFrame(
        [("v001",), ("v002",), ("BAD_x",), (None,)], "s string"
    ).createOrReplaceTempView("mp_str")
    spark.createDataFrame(
        [("g1", 0), ("g1", 1), ("g1", 3), ("g2", 0), ("g2", 1)],
        "k string, v int",
    ).createOrReplaceTempView("mp_agg")
    return spark


def test_varchar_failure_messages_exact(views2):
    req = WithinRequirement.from_table("mp_str")
    req.add_varchar_regex_constraint("s", r"^v\d+$")  # None present
    req.add_varchar_regex_constraint("s", r"^v\d+$", allow_none=True)
    req.add_varchar_regex_constraint_db("s", r"^v\d")
    req.add_varchar_min_length_constraint("s", 5)
    req.add_varchar_max_length_constraint("s", 4)
    none_gate, mem, db, minlen, maxlen = req.test(views2)
    assert none_gate.failure_message == (
        "The column contains a None value when it's not allowed. "
        "To ignore None values, please use `allow_none=True` option."
    )
    assert mem.failure_message == (
        "mp_str's column(s) 's' breaks regex '^v\\d+$' in "
        "0.3333333333333333 > 0.0 of the cases. In absolute terms, 1 "
        "of the 3 samples violated the regex. Some counterexamples "
        "consist of the following: ['BAD_x']. "
    )
    assert db.failure_message == (
        "mp_str's column(s) 's' breaks regex '^v\\d' in 0.25 > 0.0 of "
        "the cases. In absolute terms, 1 of the 4 samples violated the "
        "regex. Some counterexamples consist of the following: "
        "['BAD_x']. "
    )
    assert minlen.failure_message == (
        "mp_str's column(s) 's' has min length 4 instead of  5. "
    )
    assert maxlen.failure_message == (
        "mp_str's column(s) 's' has max length 5 instead of  4. "
    )


def test_groupby_failure_message_exact(views2):
    req = WithinRequirement.from_table("mp_agg")
    req.add_groupby_aggregation_constraint(["k"], "v", 0)
    result = req.test(views2)[0]
    assert result.outcome is False
    assert result.failure_message == (
        "mp_agg's column(s) 'k' has unfulfilled continuity requirement "
        "for (key, missing values): `{('g1',): {2}}`."
    )


@pytest.fixture(scope="module")
def views3(spark):
    spark.createDataFrame(
        [(i, f"x{i}") for i in range(10)], "a int, b string"
    ).createOrReplaceTempView("mp_r1")
    spark.createDataFrame(
        [(i, f"x{i}") for i in range(5)], "a int, b string"
    ).createOrReplaceTempView("mp_r2")
    spark.createDataFrame(
        [(i, f"y{i}" if i % 2 else f"x{i}") for i in range(10)],
        "a int, b string",
    ).createOrReplaceTempView("mp_r3")
    return spark


def test_row_family_failure_messages_exact(views3):
    b = BetweenRequirement.from_tables("mp_r1", "mp_r2")
    b.add_row_equality_constraint(["a", "b"], ["a", "b"], 0.1)
    b.add_row_subset_constraint(["a", "b"], ["a", "b"], 0.1)
    eq, sub = b.test(views3)
    assert eq.failure_message == (
        "0.5 > 0.1 of rows differ between mp_r1's column(s) 'a', 'b' "
        "and mp_r2's column(s) 'a', 'b'. E.g. for a = 5 , b = x5."
    )
    assert sub.failure_message == (
        "0.5 > 0.1 of rows of mp_r1's column(s) 'a', 'b' are not in "
        "mp_r2's column(s) 'a', 'b'. E.g. for a = 5 , b = x5.  "
    )
    b2 = BetweenRequirement.from_tables("mp_r2", "mp_r1")
    b2.add_row_superset_constraint(["a", "b"], ["a", "b"], 0.1)
    sup = b2.test(views3)[0]
    assert sup.failure_message == (
        "0.5 > 0.1 of rows of mp_r1's column(s) 'a', 'b' are not in "
        "mp_r2's column(s) 'a', 'b'. E.g. for a = 5 , b = x5.  "
    )
    b3 = BetweenRequirement.from_tables("mp_r1", "mp_r3")
    b3.add_row_matching_equality_constraint(["a"], ["a"], ["b"], ["b"], 0.0)
    match = b3.test(views3)[0]
    assert match.failure_message == (
        "0.5 > 0.0 of the rows differ on a match of 10 rows between "
        "mp_r1's column(s) 'a', 'b' and mp_r3's column(s) 'a', 'b'. "
        "Matched on ['a'] and ['a']. Compared on ['b'] and ['b']. "
    )


def test_miscs_failure_messages_exact(spark):
    from datajudge_spark.operators import (
        clear_primary_keys,
        declare_primary_keys,
    )

    spark.createDataFrame(
        [(1, "a", None), (1, "a", "x"), (2, "b", "y"), (3, None, "z")],
        "k int, v string, s string",
    ).createOrReplaceTempView("mp_m")
    declare_primary_keys("mp_m", ["k", "v"])
    try:
        req = WithinRequirement.from_table("mp_m")
        req.add_primary_key_definition_constraint(["k"])
        req.add_uniqueness_constraint(["k"])
        req.add_functional_dependency_constraint(["k"], ["v", "s"])
        req.add_max_null_fraction_constraint("s", 0.1)
        pk, uniq, fd, nulls = req.test(spark)
    finally:
        clear_primary_keys()
    assert pk.failure_message == (
        "mp_m incorrectly includes v as primary key."
    )
    assert uniq.failure_message == (
        "mp_m's column(s) 'k' has 4 rows > 3 uniques. This surpasses "
        "the max_duplicate_fraction of ('relative', 0). An example "
        "tuple breaking the uniqueness condition is: k = 1."
    )
    assert fd.failure_message == (
        "mp_m's column(s) 'k', 'v', 's' has violations of functional "
        "dependence (in total 2 rows):\n(1, 'a', 'x')\n(1, 'a', None)"
    )
    assert nulls.failure_message == (
        "0.25 of mp_m's column(s) 's' values are NULL while only 0.1 "
        "were allowed to be NULL."
    )


def test_uniques_family_failure_messages_exact(spark):
    from datajudge_spark.utils import filternull_element

    spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",), ("c",)], "v string"
    ).createOrReplaceTempView("mp_u")
    req = WithinRequirement.from_table("mp_u")
    fn = filternull_element
    req.add_uniques_equality_constraint(["v"], ["a", "b", "c", "d"], filter_func=fn)
    req.add_uniques_equality_constraint(["v"], ["a", "b"], filter_func=fn)
    req.add_uniques_equality_constraint(["v"], ["a", "b", "d"], filter_func=fn)
    req.add_uniques_subset_constraint(["v"], ["a", "b"], filter_func=fn)
    req.add_uniques_subset_constraint(
        ["v"], ["a", "b"], compare_distinct=True,
        max_relative_violations=0.1, filter_func=fn,
    )
    req.add_uniques_superset_constraint(["v"], ["d"], filter_func=fn)
    req.add_categorical_bound_constraint(
        ["v"], {"a": (0.5, 1.0), "b": (0.0, 1.0), "c": (0.0, 1.0)}
    )
    lack, excess, both, subset, subset_d, superset, catbound = req.test(spark)
    assert lack.failure_message == (
        "mp_u's column(s) 'v' doesn't have the element(s) '['d']' when "
        "compared with the reference values. "
    )
    assert excess.failure_message == (
        "mp_u's column(s) 'v' has the excess element(s) '['c']' when "
        "compared with the reference values. "
    )
    assert both.failure_message == (
        "mp_u's column(s) 'v' doesn't have the element(s) '['d']' and "
        "has the excess element(s) '['c']' when compared with the "
        "reference values. "
    )
    # the 2-element reference-set rendering follows Python set order
    # (hash-seed dependent) - accept either permutation, pin the rest
    for msg, kind in (
        (subset.failure_message, "values (3 / 6)"),
        (subset_d.failure_message, "DISTINCT values (1 / 3)"),
    ):
        ratio = "0.5 > 0" if "3 / 6" in kind else "0.3333333333333333 > 0.1"
        prefix_a = (
            f"mp_u's column(s) 'v' has a fraction of {ratio} {kind} not "
            "being an element of '['a', 'b']'. It has excess elements "
            "'['c']' with counts [3]."
        )
        assert msg in (prefix_a, prefix_a.replace("['a', 'b']", "['b', 'a']"))
    assert superset.failure_message == (
        "mp_u's column(s) 'v' has a fraction of 1.0 > 0 (1 / 1) lacking "
        "unique values of '['d']'. It doesn't have the unique value(s) "
        "'['d']'."
    )
    assert catbound.failure_message == (
        "mp_u's column(s) 'v' has 16.666666666666664% > 0% of "
        "element(s) violating the bound constraints:\n"
        "'a' with a share of 33.33333333333333% (2 out of 6) while a "
        "share between 50.0% (3) and 100.0% (6) is required\n"
    )


def test_n_uniques_family_failure_messages_exact(spark):
    spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",), ("c",)], "v string"
    ).createOrReplaceTempView("mp_u1")
    spark.createDataFrame(
        [("a",), ("d",)], "v string"
    ).createOrReplaceTempView("mp_u2")
    b = BetweenRequirement.from_tables("mp_u1", "mp_u2")
    b.add_n_uniques_equality_constraint(["v"], ["v"])
    b.add_n_uniques_max_gain_constraint(["v"], ["v"], 0.1)
    n_eq, n_gain = b.test(spark)
    assert n_eq.failure_message == (
        "mp_u1's column(s) 'v' has 3 unique(s) instead of "
        "mp_u2's column(s) 'v''s 2. "
    )
    assert n_gain.failure_message == (
        "mp_u1's column(s) 'v' has 0.5 of #uniques of mp_u2's column(s) "
        "'v'. It was only allowed to increase 0.1 . "
    )
    b2 = BetweenRequirement.from_tables("mp_u2", "mp_u1")
    b2.add_n_uniques_max_loss_constraint(["v"], ["v"], 0.1)
    n_loss = b2.test(spark)[0]
    assert n_loss.failure_message == (
        "mp_u2's column(s) 'v' has lost 0.3333333333333333 of #uniques "
        "of table mp_u1's column(s) 'v'. It was only allowed to "
        "decrease 0.1. "
    )


# ---------------------------------------------------------------------------
# Base-lifecycle goldens (round-10 burn-down of constraints/base.py): the
# TestResult rendering, Constraint validation/description/condition strings,
# retrieve-cache semantics, and sample formatting captured from the round-9
# implementation, whose externally visible behavior is verbatim reference
# behavior (NOTICE, docs/DERIVATION.md).  These bytes are what downstream
# alerting parses; the source may be restructured freely underneath them.
# ---------------------------------------------------------------------------


def _mk_ref(name, columns=None, condition=None, df=None, spark=None):
    from datajudge_spark.reference import DataReference
    from datajudge_spark.sources import ExpressionDataSource

    expr = df if df is not None else spark.range(1)
    return DataReference(
        ExpressionDataSource(expr, name), columns, condition
    )


class _ProbeConstraint:
    """Concrete Constraint recording _retrieve calls."""

    def __new__(cls, *args, **kwargs):
        from datajudge_spark.constraints.base import Constraint

        class Probe(Constraint):
            retrieve_calls = 0

            def _retrieve(self, engine, ref):
                Probe.retrieve_calls += 1
                return 41 + Probe.retrieve_calls, [ref.get_selection(engine)]

            def _compare(self, factual, target):
                return factual == target, f"got {factual}, wanted {target}. "

        return Probe(*args, **kwargs)


def test_testresult_logging_message_exact():
    from datajudge_spark.constraints.base import TestResult

    full = TestResult(
        False,
        "boom. ",
        "MyConstraint::t1",
        ["plan one", "plan two"],
        ["plan three"],
    )
    assert full.logging_message == (
        "/*\n\tMyConstraint::t1\n*/"
        "\n\n/*\nFailure message:\nboom. \n*/"
        "\n\n --Factual plans: \n plan one\nplan two"
        "\n\n-- Target plans: \n plan three"
        "\n --- \n"
    )
    assert TestResult(True).logging_message == "\n --- \n"
    assert TestResult.success().outcome is True
    assert TestResult.failure("m. ").failure_message == "m. "
    assert TestResult.failure("m. ").outcome is False


def test_constraint_ctor_validation_messages_exact(spark):
    r1 = _mk_ref("t1", spark=spark)
    r2 = _mk_ref("t2", spark=spark)
    with pytest.raises(ValueError) as exc1:
        _ProbeConstraint(r1, ref2=r2, ref_value=3)
    assert str(exc1.value) == (
        "Both table 2 ref and constant given to Probe. "
        "Use either of them, not both."
    )
    with pytest.raises(ValueError) as exc2:
        _ProbeConstraint(r1)
    assert str(exc2.value) == (
        "Neither table 2 ref nor constant given to Probe. "
        "Use exactly either of them."
    )


def test_constraint_description_and_uncommon_substrings(spark):
    from datajudge_spark.constraints.base import uncommon_substrings

    r1 = _mk_ref("db1.schema.t1", spark=spark)
    r2 = _mk_ref("db2.schema.t2", spark=spark)
    c = _ProbeConstraint(r1, ref2=r2)
    assert c.get_description() == "Probe::db1.schema.t1 | db2.schema.t2"
    # shared db, distinct rest: drop the common first qualifier
    r3 = _mk_ref("db.schema1.t1", spark=spark)
    r4 = _mk_ref("db.schema2.t2", spark=spark)
    assert _ProbeConstraint(r3, ref2=r4).get_description() == (
        "Probe::schema1.t1 | schema2.t2"
    )
    # within: plain source name; explicit name overrides everything
    assert _ProbeConstraint(r1, ref_value=1).get_description() == (
        "Probe::db1.schema.t1"
    )
    assert _ProbeConstraint(r1, ref_value=1, name="custom").get_description() == (
        "custom"
    )
    assert uncommon_substrings("a.b.c", "a.b.d") == ("b.c", "b.d")
    assert uncommon_substrings("x.y", "z.y") == ("x.y", "z.y")
    assert uncommon_substrings("a.a.c", "a.d") == ("c", "d")
    assert _ProbeConstraint(r1, ref2=r2)._target_prefix == "db2.schema.t2's "
    assert _ProbeConstraint(r1, ref_value=1)._target_prefix == ""


def test_constraint_condition_strings_exact(spark):
    from datajudge_spark import Condition

    ca = Condition(raw_string="id > 0")
    cb = Condition(raw_string="id < 9")
    r_plain = _mk_ref("t1", spark=spark)
    r2_plain = _mk_ref("t2", spark=spark)
    r_ca = _mk_ref("t1", condition=ca, spark=spark)
    r2_ca = _mk_ref("t2", condition=ca, spark=spark)
    r2_cb = _mk_ref("t2", condition=cb, spark=spark)
    assert _ProbeConstraint(r_plain, ref_value=1)._condition_string == ""
    assert _ProbeConstraint(r_plain, ref2=r2_plain)._condition_string == ""
    assert _ProbeConstraint(r_ca, ref_value=1)._condition_string == (
        "Condition: WHERE id > 0"
    )
    assert _ProbeConstraint(r_ca, ref2=r2_ca)._condition_string == (
        "Condition on both tables: WHERE id > 0; "
    )
    assert _ProbeConstraint(r_plain, ref2=r2_ca)._condition_string == (
        "Condition on second table: WHERE id > 0; "
    )
    assert _ProbeConstraint(r_ca, ref2=r2_plain)._condition_string == (
        "Condition on first table: WHERE id > 0; "
    )
    assert _ProbeConstraint(r_ca, ref2=r2_cb)._condition_string == (
        "Condition on first table: WHERE id > 0. "
        "Condition on second table: WHERE id < 9. "
    )


def test_constraint_retrieve_cache_semantics(spark):
    r1 = _mk_ref("t1", spark=spark)
    c = _ProbeConstraint(r1, ref_value=42)
    base_calls = type(c).retrieve_calls
    first = c.test(spark)
    second = c.test(spark)
    assert type(c).retrieve_calls == base_calls + 1  # cached by default
    assert first.outcome is second.outcome
    c0 = _ProbeConstraint(r1, ref_value=42, cache_size=0)
    base_calls = type(c0).retrieve_calls
    c0.test(spark)
    c0.test(spark)
    assert type(c0).retrieve_calls == base_calls + 2  # caching disabled
    # failure path: description + rendered factual plans in the message
    cf = _ProbeConstraint(r1, ref_value=-1)
    res = cf.test(spark)
    assert res.outcome is False
    assert res.failure_message.startswith("got ")
    assert "Probe::t1" in res.logging_message
    assert "--Factual plans:" in res.logging_message


def test_format_sample_exact(spark):
    from datajudge_spark.constraints.base import format_sample

    r_cols = _mk_ref("t1", columns=["a", "b"], spark=spark)
    r_none = _mk_ref("t1", spark=spark)
    assert format_sample((1, "x"), r_cols) == "a = 1 , b = x"
    assert format_sample((1, "x"), r_none) == "(1, 'x')"
