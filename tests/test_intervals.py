"""Interval overlap/gap constraint tests against the reference's fixture
case structure (FIXTURES.md: date_table_overlap, date_table_gap, ...)."""

from conftest import within_req


def outcomes(req, spark):
    return [r.outcome for r in req.test(spark)]


class TestDateNoOverlap:
    def test_violating_keys(self, spark, date_table_overlap):
        # keys 3 (overlap), 4 (singleton overlap, end_included), 5 (subset),
        # 6 (duplicates) violate with end_included=True -> 4/6
        req = within_req(date_table_overlap, "date_table_overlap")
        req.add_date_no_overlap_constraint(
            "date_start", "date_end", ["id1"], max_relative_n_violations=4 / 6
        )
        req.add_date_no_overlap_constraint(
            "date_start", "date_end", ["id1"], max_relative_n_violations=0.5
        )  # fail
        assert outcomes(req, spark) == [True, False]

    def test_end_excluded(self, spark, date_table_overlap):
        # end_included=False: key 4's singleton touch no longer violates -> 3/6
        req = within_req(date_table_overlap, "date_table_overlap")
        req.add_date_no_overlap_constraint(
            "date_start",
            "date_end",
            ["id1"],
            end_included=False,
            max_relative_n_violations=3 / 6,
        )
        req.add_date_no_overlap_constraint(
            "date_start",
            "date_end",
            ["id1"],
            end_included=False,
            max_relative_n_violations=0.4,
        )  # fail
        assert outcomes(req, spark) == [True, False]


class TestNumericNoOverlap:
    def test_violating_keys(self, spark, integer_table_overlap):
        req = within_req(integer_table_overlap, "integer_table_overlap")
        req.add_numeric_no_overlap_constraint(
            "range_start", "range_end", ["id1"], max_relative_n_violations=4 / 6
        )
        req.add_numeric_no_overlap_constraint(
            "range_start", "range_end", ["id1"], max_relative_n_violations=0.5
        )  # fail
        req.add_numeric_no_overlap_constraint(
            "range_start",
            "range_end",
            ["id1"],
            end_included=False,
            max_relative_n_violations=3 / 6,
        )
        assert outcomes(req, spark) == [True, False, True]


class TestDateNoGap:
    def test_gaps(self, spark, date_table_gap):
        # end_included=True (legitimate_gap_size=1): only key 4 has a real gap
        # (key 5's 1-day step is legitimate) -> 1/5
        req = within_req(date_table_gap, "date_table_gap")
        req.add_date_no_gap_constraint(
            "date_start", "date_end", ["id1"], max_relative_n_violations=1 / 5
        )
        req.add_date_no_gap_constraint(
            "date_start", "date_end", ["id1"], max_relative_n_violations=0.1
        )  # fail
        # end_included=False (legitimate_gap_size=0): keys 4 and 5 -> 2/5
        req.add_date_no_gap_constraint(
            "date_start",
            "date_end",
            ["id1"],
            end_included=False,
            max_relative_n_violations=2 / 5,
        )
        req.add_date_no_gap_constraint(
            "date_start",
            "date_end",
            ["id1"],
            end_included=False,
            max_relative_n_violations=1 / 5,
        )  # fail
        assert outcomes(req, spark) == [True, False, True, False]


class TestNumericNoGap:
    def test_gaps(self, spark, integer_table_gap):
        # key 4 has gap 10-5=5 > 0 -> 1/4 violating
        req = within_req(integer_table_gap, "integer_table_gap")
        req.add_numeric_no_gap_constraint(
            "range_start", "range_end", ["id1"], max_relative_n_violations=1 / 4
        )
        req.add_numeric_no_gap_constraint(
            "range_start", "range_end", ["id1"], max_relative_n_violations=0.1
        )  # fail
        req.add_numeric_no_gap_constraint(
            "range_start",
            "range_end",
            ["id1"],
            legitimate_gap_size=5,
            max_relative_n_violations=0,
        )  # gap of exactly 5 tolerated
        assert outcomes(req, spark) == [True, False, True]


class TestDateNoOverlap2d:
    """Reference test_integration.py:2110-2186 expectations on the
    date_table_overlap_2d fixture (conftest.py:309-438): a violation needs
    rectangle overlap in BOTH dimensions."""

    def test_per_key_conditions(self, spark, date_table_overlap_2d):
        from datajudge_spark import Condition

        req = within_req(date_table_overlap_2d, "date_table_overlap_2d")
        expected = []
        for key in (1, 2, 3, 4):  # 1d overlap only -> clean in 2d
            req.add_date_no_overlap_2d_constraint(
                "date_start1", "date_end1", "date_start2", "date_end2",
                key_columns=["id1"],
                condition=Condition(raw_string=f"id1 = {key}"),
            )
            expected.append(True)
        for key in (5, 6, 7, 8):  # real/singleton/subset/duplicate overlap
            req.add_date_no_overlap_2d_constraint(
                "date_start1", "date_end1", "date_start2", "date_end2",
                key_columns=["id1"],
                condition=Condition(raw_string=f"id1 = {key}"),
            )  # fail
            expected.append(False)
            req.add_date_no_overlap_2d_constraint(
                "date_start1", "date_end1", "date_start2", "date_end2",
                key_columns=["id1"],
                max_relative_n_violations=1,
                condition=Condition(raw_string=f"id1 = {key}"),
            )
            expected.append(True)
        assert outcomes(req, spark) == expected

    def test_fixed_key_fraction(self, spark, date_table_overlap_2d):
        # 4 of 8 keys violate
        req = within_req(date_table_overlap_2d, "date_table_overlap_2d")
        req.add_date_no_overlap_2d_constraint(
            "date_start1", "date_end1", "date_start2", "date_end2",
            key_columns=["id1"], max_relative_n_violations=0.50,
        )
        req.add_date_no_overlap_2d_constraint(
            "date_start1", "date_end1", "date_start2", "date_end2",
            key_columns=["id1"], max_relative_n_violations=0.49,
        )  # fail
        assert outcomes(req, spark) == [True, False]

    def test_end_excluded_singleton(self, spark, date_table_overlap_2d):
        # end_included=False: key 6's touch-only overlap no longer counts
        from datajudge_spark import Condition

        req = within_req(date_table_overlap_2d, "date_table_overlap_2d")
        req.add_date_no_overlap_2d_constraint(
            "date_start1", "date_end1", "date_start2", "date_end2",
            key_columns=["id1"], end_included=False,
            condition=Condition(raw_string="id1 = 6"),
        )
        assert outcomes(req, spark) == [True]
