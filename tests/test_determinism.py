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


@pytest.mark.parametrize("n_parts", [1, 3, 13])
def test_ewma_exact_decimal_sums_partition_stable(spark, n_parts):
    # double weights would make the weighted sum depend on join output
    # order; exact decimal weights must not
    import datetime as dt

    from datajudge_spark.operators.timeseries import ewma_daily

    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), 1000 + 37 * i)
        for i in range(60)
    ]
    daily = spark.createDataFrame(rows, "day date, cents long").repartition(
        n_parts
    )
    out = {
        r["day"]: (repr(r["ewma"]), r["n_terms"])
        for r in ewma_daily(daily, "cents").collect()
    }
    if not hasattr(test_ewma_exact_decimal_sums_partition_stable, "_ref"):
        test_ewma_exact_decimal_sums_partition_stable._ref = out
    assert out == test_ewma_exact_decimal_sums_partition_stable._ref


@pytest.mark.parametrize("n_parts", [1, 4, 9])
def test_norm_stats_decimal_mean_partition_stable(spark, n_parts):
    from datajudge_spark.pipeline.similarity import norm_stats

    rows = [([float(i % 7) / 3.0, 1.0, 0.5],) for i in range(500)]
    df = spark.createDataFrame(rows, "v array<float>").repartition(n_parts)
    out = norm_stats(df, "v").collect()[0].asDict()
    if not hasattr(test_norm_stats_decimal_mean_partition_stable, "_ref"):
        test_norm_stats_decimal_mean_partition_stable._ref = out
    assert out == test_norm_stats_decimal_mean_partition_stable._ref


@pytest.mark.parametrize("n_parts", [1, 5])
def test_srp_signatures_partition_stable(spark, n_parts):
    from datajudge_spark.pipeline.similarity import srp_signature_hist

    rows = [([((i * 31 + j * 7) % 13 - 6) / 5.0 for j in range(16)],)
            for i in range(200)]
    df = spark.createDataFrame(rows, "v array<float>").repartition(n_parts)
    out = sorted(
        (r["sig"], r["n_vecs"])
        for r in srp_signature_hist(df, "v", n_planes=4, dim=16).collect()
    )
    if not hasattr(test_srp_signatures_partition_stable, "_ref"):
        test_srp_signatures_partition_stable._ref = out
    assert out == test_srp_signatures_partition_stable._ref


class TestCusumChangepoint:
    def test_finds_the_level_shift(self, spark):
        import datetime as dt

        from datajudge_spark.operators.timeseries import cusum_changepoint

        # 30 days at level 100, then 30 days at level 200: the CUSUM
        # peak (in magnitude) sits exactly at the last pre-shift day
        rows = [
            (dt.date(2024, 1, 1) + dt.timedelta(days=i),
             100 if i < 30 else 200)
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "day date, total long")
        got = cusum_changepoint(df).first()
        assert got["n_days"] == 60
        assert got["change_day"] == dt.date(2024, 1, 30)
        # |D_29| = 60 * (30*100 - 30*150) ; cusum_max = |D|/n = 1500
        assert got["cusum_max"] == pytest.approx(1500.0, abs=1e-9)

    def test_flat_series_peaks_at_zero(self, spark):
        import datetime as dt

        from datajudge_spark.operators.timeseries import cusum_changepoint

        rows = [
            (dt.date(2024, 1, 1) + dt.timedelta(days=i), 42)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "day date, total long")
        got = cusum_changepoint(df).first()
        assert got["cusum_max"] == 0.0
        # ties resolve to the earliest day
        assert got["change_day"] == dt.date(2024, 1, 1)

    def test_no_int64_wrap_on_huge_series(self, spark):
        import datetime as dt

        from datajudge_spark.operators.timeseries import cusum_changepoint

        # 2000 days of ~1e15-cent totals: the n-scaled CUSUM
        # n * cumsum_t reaches ~6e21, far past int64 (9.2e18).  A
        # bigint intermediate silently wraps under non-ANSI semantics
        # and corrupts the argmax; the decimal(38,0) path stays exact.
        n, lo, hi = 2000, 10**15, 2 * 10**15
        rows = [
            (dt.date(2020, 1, 1) + dt.timedelta(days=i),
             lo if i < n // 2 else hi)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "day date, total long")
        got = cusum_changepoint(df).first()
        assert got["n_days"] == n
        assert got["change_day"] == dt.date(2020, 1, 1) + dt.timedelta(
            days=n // 2 - 1
        )
        # peak = n * shift / 4 exactly (level-shift at the midpoint)
        assert got["cusum_max"] == pytest.approx(
            n * (hi - lo) / 4, rel=1e-12
        )


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_mann_kendall_partition_stable(spark, n_parts):
    # exact integer S / decimal variance terms: the digest must be
    # byte-identical under any partitioning
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), 100 + (i * 7) % 40)
        for i in range(60)
    ]
    from datajudge_spark.operators.timeseries import mann_kendall

    df = spark.createDataFrame(rows, "day date, v long").repartition(
        n_parts
    )
    row = mann_kendall(df, "v").first()
    # pinned values (naive Python recompute): identical at every
    # partitioning
    assert (row["n_days"], row["s_stat"]) == (60, 120)
    ref = mann_kendall(
        spark.createDataFrame(rows, "day date, v long"), "v"
    ).first()
    assert row == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_gumbel_fit_partition_stable(spark, n_parts):
    import datetime as dt

    from datajudge_spark.operators.timeseries import gumbel_return_level

    base = dt.date(2023, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), 1000 + (i * 131) % 700)
        for i in range(365)
    ]
    df = spark.createDataFrame(rows, "day date, v long")
    ref = gumbel_return_level(df, "v", "month", (12,)).first()
    got = gumbel_return_level(
        df.repartition(n_parts), "v", "month", (12,)
    ).first()
    # decimal sufficient statistics: bit-identical doubles, no approx
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_ngram_novelty_partition_stable(spark, n_parts):
    from datajudge_spark.pipeline.decontam import ngram_novelty

    train = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} shared tail words") for i in range(30)],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100 + i, f"w{i} w{i+1} w{i+2} novel part {i}") for i in range(10)],
        "doc_id long, text string",
    )
    ref = ngram_novelty(train, test, "doc_id", "text", 3).first()
    got = ngram_novelty(
        train.repartition(n_parts),
        test.repartition(max(1, n_parts - 1)),
        "doc_id",
        "text",
        3,
    ).first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_rank_2sample_partition_stable(spark, n_parts):
    # DECIMAL-exact AD/CvM numerators: bit-identical at any partitioning
    from datajudge_spark.operators.stats import rank_2sample_tests

    d1 = spark.createDataFrame(
        [((i * 13) % 37,) for i in range(200)], "v int"
    )
    d2 = spark.createDataFrame(
        [((i * 7) % 41,) for i in range(150)], "v int"
    )
    ref = rank_2sample_tests(d1, d2, "v", "v").first()
    got = rank_2sample_tests(
        d1.repartition(n_parts), d2.repartition(max(1, n_parts - 1)),
        "v", "v",
    ).first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_jarque_bera_partition_stable(spark, n_parts):
    # decimal power sums -> one double expression: partition-invariant
    from datajudge_spark.operators.stats import jarque_bera

    rows = [("g" + str(i % 3), (i * 17) % 101 - 50) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    ref = sorted(jarque_bera(df, "v", group_col="g").collect())
    got = sorted(
        jarque_bera(df.repartition(n_parts), "v", group_col="g").collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_kendall_tau_partition_stable(spark, n_parts):
    import datetime as dt

    from datajudge_spark.operators.timeseries import kendall_tau_b

    base = dt.date(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), (i * 3) % 11, (i * 5) % 7)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    ref = kendall_tau_b(df, "x", "y").first()
    got = kendall_tau_b(df.repartition(n_parts), "x", "y").first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_contrastive_negatives_partition_stable(spark, n_parts):
    # md5-argmin draws: the winning negative per (query, draw) is a
    # pure function of the data — identical under any partitioning
    from datajudge_spark.pipeline.sampling import contrastive_negatives

    rows = [(i, i % 4) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    ref = contrastive_negatives(df, "vec_id", "label", [0, 1, 2], 3).collect()
    got = contrastive_negatives(
        df.repartition(n_parts), "vec_id", "label", [0, 1, 2], 3
    ).collect()
    assert got == ref


def test_contrastive_negatives_string_ids_and_labels(spark):
    # the broadcast spec derives its types from the corpus schema —
    # string ids/labels must survive the join and inequality untouched
    from datajudge_spark.pipeline.sampling import contrastive_negatives

    rows = [(f"doc-{i:03d}", f"lab{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, label string")
    out = contrastive_negatives(
        df, "doc_id", "label", ["doc-000", "doc-001"], 2
    ).collect()
    assert len(out) == 4
    lab = dict(rows)
    for r in out:
        assert r["neg_id"] != r["query_id"]
        assert r["neg_label"] != lab[r["query_id"]]
        assert isinstance(r["neg_id"], str)


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_zipf_slope_partition_stable(spark, n_parts):
    # the top-N boundary is a TOTAL order (count DESC, token ASC): the
    # selected head — and therefore the OLS fit — cannot depend on
    # which partition a tied token lands in
    from datajudge_spark.pipeline.text import zipf_slope

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (" ".join(words[(i + j) % 6] for j in range((i % 9) + 1)),)
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "text string")
    ref = zipf_slope(df, "text", top_n=4).first()
    got = zipf_slope(df.repartition(n_parts), "text", top_n=4).first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_cuped_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import cuped_adjusted_diff

    rows = [((i * 13) % 300, (i * 29) % 700, i % 2) for i in range(250)]
    df = spark.createDataFrame(rows, "x long, y long, v int")
    ref = cuped_adjusted_diff(df, "x", "y", "v").first()
    got = cuped_adjusted_diff(
        df.repartition(n_parts), "x", "y", "v"
    ).first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_logrank_partition_stable(spark, n_parts):
    from datajudge_spark.operators.timeseries import logrank_test

    rows = [
        ((i * 7) % 15 + 1, 1 if (i * 3) % 5 else 0, i % 2)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "dur int, ev int, grp int")
    ref = logrank_test(df, "dur", "ev", "grp").first()
    got = logrank_test(df.repartition(n_parts), "dur", "ev", "grp").first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_post_stratified_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import post_stratified_diff

    rows = [((i * 19) % 900, i % 2, f"s{i % 6}") for i in range(300)]
    df = spark.createDataFrame(rows, "y long, v int, s string")
    ref = post_stratified_diff(df, "y", "v", "s").first()
    got = post_stratified_diff(
        df.repartition(n_parts), "y", "v", "s"
    ).first()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_ratio_ztest_partition_stable(spark, n_parts):
    # DECIMAL sufficient statistics: the digest is a pure function of
    # the multiset of rows — byte-identical under any partitioning
    from datajudge_spark.operators.stats import ratio_metric_ztest

    rows = [((i * 7) % 23, (i % 9) + 1, i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "num long, den long, v int")
    ref = ratio_metric_ztest(df, "num", "den", "v").collect()
    got = ratio_metric_ztest(
        df.repartition(n_parts), "num", "den", "v"
    ).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_srm_partition_stable(spark, n_parts):
    # level-ORDERED cumulative fold: same doubles in the same order on
    # every partitioning
    from datajudge_spark.operators.stats import sample_ratio_mismatch

    rows = [(["a", "b", "c"][i % 3],) for i in range(333)]
    df = spark.createDataFrame(rows, "v string")
    shares = {"a": 0.4, "b": 0.35, "c": 0.25}
    ref = sample_ratio_mismatch(df, "v", shares).collect()
    got = sample_ratio_mismatch(df.repartition(n_parts), "v", shares).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_pettitt_partition_stable(spark, n_parts):
    # integer-exact U via DECIMAL mid-ranks; earliest-day argmax is a
    # total order
    import datetime as dt

    from datajudge_spark.operators.timeseries import pettitt_changepoint

    base = dt.date(2024, 3, 1)
    rows = [
        (base + dt.timedelta(days=i), ((i * 13) % 37) + (50 if i > 45 else 0))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "day date, total long")
    ref = pettitt_changepoint(df).collect()
    got = pettitt_changepoint(df.repartition(n_parts)).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_dispersion_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import dispersion_index

    rows = [((i * 11) % 17, f"g{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "c long, g string")
    ref = sorted(
        dispersion_index(df, "c", group_col="g").collect()
    )
    got = sorted(
        dispersion_index(df.repartition(n_parts), "c", group_col="g").collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_query_neardup_partition_stable(spark, n_parts):
    # broadcast query bands + md5 signatures: candidate set and
    # estimates are pure functions of the data
    from datajudge_spark.pipeline.dedup import query_neardup_candidates

    rows = [
        (i, ("alpha beta gamma delta " * 4) + (f"tail{i} " * (i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = sorted(
        query_neardup_candidates(df, "doc_id", "text", [0, 1, 2]).collect()
    )
    got = sorted(
        query_neardup_candidates(
            df.repartition(n_parts), "doc_id", "text", [0, 1, 2]
        ).collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_query_neardup_recall_partition_stable(spark, n_parts):
    from datajudge_spark.pipeline.dedup import query_neardup_recall

    rows = [
        (i, ("alpha beta gamma delta " * 4) + (f"tail{i} " * (i % 5)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = sorted(
        query_neardup_recall(df, "doc_id", "text", [0, 1, 2]).collect()
    )
    got = sorted(
        query_neardup_recall(
            df.repartition(n_parts), "doc_id", "text", [0, 1, 2]
        ).collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_diff_in_diff_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import diff_in_diff

    rows = [((i * 7) % 50, (i * 11) % 70, i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "pre long, post long, v int")
    ref = diff_in_diff(df, "pre", "post", "v").collect()
    got = diff_in_diff(df.repartition(n_parts), "pre", "post", "v").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_centroid_shift_partition_stable(spark, n_parts):
    # decimal component sums + component-ORDERED fold: byte-identical
    # under any partitioning
    from datajudge_spark.pipeline.similarity import centroid_shift

    rows = [
        ([((i * 13 + j * 5) % 21 - 10) / 7.0 for j in range(12)],
         f"g{i % 4}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "v array<float>, g string")
    ref = centroid_shift(df, "v", "g").collect()
    got = centroid_shift(df.repartition(n_parts), "v", "g").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_join_explosion_audit_partition_stable(spark, n_parts):
    from datajudge_spark.operators.skew import join_explosion_audit

    rows = [((i * 3) % 11,) for i in range(150)]
    df = spark.createDataFrame(rows, "k long")
    ref = join_explosion_audit(df, "k", df, "k").collect()
    got = join_explosion_audit(
        df.repartition(n_parts), "k", df.repartition(n_parts), "k"
    ).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_welch_ttest_partition_stable(spark, n_parts):
    # decimal sufficient stats -> one double expression: invariant
    from datajudge_spark.operators.stats import welch_ttest

    rows = [((i * 13) % 97 + (i % 2) * 11, i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "x long, v int")
    ref = welch_ttest(df, "x", "v").collect()
    got = welch_ttest(df.repartition(n_parts), "x", "v").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_brown_forsythe_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import brown_forsythe

    rows = [("g" + str(i % 4), (i * 29) % 211) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x long")
    ref = brown_forsythe(df, "x", "g").collect()
    got = brown_forsythe(df.repartition(n_parts), "x", "g").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_cmh_partition_stable(spark, n_parts):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import cmh_test

    rows = [
        ("s" + str(i % 5), i % 2 == 0, (i * 7) % 3 == 0) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    ref = cmh_test(df, "s", F.col("e"), F.col("o")).collect()
    got = cmh_test(
        df.repartition(n_parts), "s", F.col("e"), F.col("o")
    ).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_grouped_ztest_bh_partition_stable(spark, n_parts):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import grouped_ztest_bh

    rows = [
        ("g" + str(i % 6), i % 2 == 0, (i * 11) % 5 < 2) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, a boolean, o boolean")
    args = ("g", F.col("a"), ~F.col("a"), F.col("o"))
    ref = sorted(grouped_ztest_bh(df, *args).collect())
    got = sorted(grouped_ztest_bh(df.repartition(n_parts), *args).collect())
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_nelson_aalen_partition_stable(spark, n_parts):
    from datajudge_spark.operators.timeseries import nelson_aalen

    rows = [((i * 3) % 17, i % 2) for i in range(250)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    ref = sorted(nelson_aalen(df, "dur", "ev").collect())
    got = sorted(nelson_aalen(df.repartition(n_parts), "dur", "ev").collect())
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_durbin_watson_partition_stable(spark, n_parts):
    from datajudge_spark.operators.timeseries import durbin_watson

    rows = [(i, 1000 + 7 * i + (i * i * 31) % 89) for i in range(90)]
    df = spark.createDataFrame(rows, "t int, y long")
    ref = durbin_watson(df, "t", "y").collect()
    got = durbin_watson(df.repartition(n_parts), "t", "y").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_kruskal_wallis_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import kruskal_wallis

    rows = [("g" + str(i % 4), (i * 37) % 151) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, x long")
    ref = kruskal_wallis(df, "x", "g").collect()
    got = kruskal_wallis(df.repartition(n_parts), "x", "g").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_chao1_partition_stable(spark, n_parts):
    from datajudge_spark.operators.uniques import chao1_richness

    rows = [((i * i) % 37,) for i in range(300)]
    df = spark.createDataFrame(rows, "v long")
    ref = chao1_richness(df, "v").collect()
    got = chao1_richness(df.repartition(n_parts), "v").collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_rmst_partition_stable(spark, n_parts):
    from datajudge_spark.operators.timeseries import rmst

    rows = [((i * 3) % 23, i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    ref = rmst(df, "dur", "ev", 15.0).collect()
    got = rmst(df.repartition(n_parts), "dur", "ev", 15.0).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_sequence_monotonicity_partition_stable(spark, n_parts):
    from datajudge_spark.operators.rows import sequence_monotonicity

    rows = [(i % 8, i // 8, ((i * 7) % 31) - (i % 8)) for i in range(400)]
    df = spark.createDataFrame(rows, "k int, t int, v long")
    ref = sequence_monotonicity(df, "k", "t", "v").collect()
    got = sequence_monotonicity(
        df.repartition(n_parts), "k", "t", "v"
    ).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_forecast_backtest_partition_stable(spark, n_parts):
    import datetime as dt

    from datajudge_spark.operators.timeseries import forecast_backtest

    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=i), 100 + 30 * (i % 7) + (i * 13) % 11)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "day date, v long")
    ref = forecast_backtest(df, "day", "v", 14, 7).collect()
    got = forecast_backtest(df.repartition(n_parts), "day", "v", 14, 7).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_grouped_welch_bh_partition_stable(spark, n_parts):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import grouped_welch_bh

    rows = [
        ("g" + str(i % 5), i % 2 == 0, (i * 17) % 101) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, a boolean, x long")
    args = ("g", "x", F.col("a"), ~F.col("a"))
    ref = sorted(grouped_welch_bh(df, *args).collect())
    got = sorted(grouped_welch_bh(df.repartition(n_parts), *args).collect())
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_cox_score_partition_stable(spark, n_parts):
    # the round-11 claim: U/I accumulate as exact decimals of
    # pre-rounded terms, so the digest is bit-identical at ANY
    # partitioning (a plain double sum would not be)
    from datajudge_spark.operators.timeseries import cox_score_test

    rng = __import__("random").Random(17)
    rows = [
        (rng.randint(1, 40), 1 if rng.random() < 0.6 else 0,
         rng.randint(0, 10**9))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "dur int, ev int, x long")
    ref = cox_score_test(df, "dur", "ev", "x").collect()
    got = cox_score_test(
        df.repartition(n_parts), "dur", "ev", "x"
    ).collect()
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_obf_sequential_partition_stable(spark, n_parts):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import (
        obf_sequential_ztest,
        sequential_look_counts,
    )

    rng = __import__("random").Random(19)
    rows = [
        (rng.randint(1, 9), rng.randint(0, 1),
         1 if rng.random() < 0.35 else 0)
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "look int, grp int, conv int")

    def run(frame):
        return sorted(
            obf_sequential_ztest(
                sequential_look_counts(
                    frame, "look", F.col("grp") == 0, F.col("grp") == 1,
                    F.col("conv") == 1,
                )
            ).collect()
        )

    assert run(df.repartition(n_parts)) == run(df)


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_qte_partition_stable(spark, n_parts):
    from datajudge_spark.operators.stats import quantile_treatment_effect

    rng = __import__("random").Random(23)
    rows = [
        (rng.randint(0, 1), float(rng.randint(0, 50)))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "grp int, v double")
    ref = sorted(quantile_treatment_effect(df, "v", "grp").collect())
    got = sorted(
        quantile_treatment_effect(
            df.repartition(n_parts), "v", "grp"
        ).collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_grouped_qte_partition_stable(spark, n_parts):
    # integer decision rule on exact cell counts: the grid is
    # bit-identical at any partitioning
    from datajudge_spark.operators.stats import (
        grouped_quantile_treatment_effect,
    )

    rng = __import__("random").Random(23)
    rows = [
        (rng.randint(0, 1), f"s{rng.randint(0, 3)}",
         float(rng.randint(0, 500)))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "grp int, seg string, v double")
    ref = sorted(
        grouped_quantile_treatment_effect(df, "v", "grp", "seg").collect()
    )
    got = sorted(
        grouped_quantile_treatment_effect(
            df.repartition(n_parts), "v", "grp", "seg"
        ).collect()
    )
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_winnowing_contamination_partition_stable(spark, n_parts):
    # md5 fingerprints + integer counts: partitioning-invariant
    from datajudge_spark.pipeline.decontam import winnowing_contamination

    rng = __import__("random").Random(29)
    words = [f"w{i}" for i in range(40)]
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))  # noqa: E731
    train = spark.createDataFrame(
        [(i, mk(rng.randint(5, 30))) for i in range(30)],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100 + i, mk(rng.randint(5, 30))) for i in range(10)],
        "doc_id long, text string",
    )
    ref = sorted(
        winnowing_contamination(train, evals, "doc_id", "text").collect()
    )
    got = sorted(
        winnowing_contamination(
            train.repartition(n_parts),
            evals.repartition(n_parts),
            "doc_id",
            "text",
        ).collect()
    )
    assert got == ref
