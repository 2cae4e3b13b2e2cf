"""Seeded property-based differential fuzzing vs the DuckDB oracle.

The reference's identity/negation corpus is hand-picked (reference
tests/integration/test_integration.py:35-40); this layer generates random
(column, condition, percentile/fraction params, null mixes) over the
SURVEY §2 scalar and set-operation families and asserts VALUE agreement
between the package operators (Spark) and plain ANSI SQL (DuckDB) on the
same rows.  It exists to catch the tie/null/rounding edges fixtures miss
— the round-6 HALF-tie lesson was found by luck, not search.

Determinism notes baked into the generator:
- doubles are drawn from a 1/64 grid with bounded magnitude, so every
  partial sum is exactly representable and aggregation order cannot
  change a result in either engine;
- strings include multibyte codepoints (both engines compare by raw
  UTF-8 bytes);
- every percentile comparison uses the repo's single canonical form
  ``cum * 100 >= percentage * total`` on both sides.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import duckdb
import pyarrow as pa
import pytest

from datajudge_spark.condition import Condition
from datajudge_spark.operators import (
    get_fraction_between,
    get_max,
    get_max_length,
    get_mean,
    get_min,
    get_min_length,
    get_missing_fraction,
    get_percentile,
    get_row_count,
    get_row_difference_count,
    get_unique_count,
    get_unique_count_union,
)
from datajudge_spark.operators.rows import duplicates
from datajudge_spark.operators.scalars import exact_percentile_df
from datajudge_spark.reference import DataReference
from datajudge_spark.sources import ExpressionDataSource

SEED = 20260815
N_TABLES = 6
N_CASES = 322

_WORDS = ["alpha", "beta", "gamma", "héllo", "日本語", "zz", "a", ""]
_EPOCH = dt.date(2019, 1, 1)


def _gen_table(rng: random.Random):
    n = rng.randint(40, 260)
    null_p = rng.choice([0.0, 0.05, 0.2, 0.5])
    rows = []
    for _ in range(n):
        i = None if rng.random() < null_p else rng.randint(-50, 50)
        # exact double grid: k/64 with |x| <= 32 — order-independent sums
        x = None if rng.random() < null_p else rng.randint(-2048, 2048) / 64
        s = (
            None
            if rng.random() < null_p
            else rng.choice(_WORDS) + rng.choice(["", str(rng.randint(0, 9))])
        )
        d = (
            None
            if rng.random() < null_p
            else _EPOCH + dt.timedelta(days=rng.randint(0, 1500))
        )
        g = rng.choice(["a", "b", "c", None])
        rows.append((i, x, s, d, g))
    return rows


_MASTER = random.Random(SEED)
_TABLES = {f"ft{t}": _gen_table(_MASTER) for t in range(N_TABLES)}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name, rows in _TABLES.items():
        tbl = pa.table(
            {
                "i": pa.array([r[0] for r in rows], pa.int64()),
                "x": pa.array([r[1] for r in rows], pa.float64()),
                "s": pa.array([r[2] for r in rows], pa.string()),
                "d": pa.array([r[3] for r in rows], pa.date32()),
                "g": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        con.register(f"arrow_{name}", tbl)
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM arrow_{name}")
    return con


@pytest.fixture(scope="module")
def sdfs(spark):
    schema = "i bigint, x double, s string, d date, g string"
    return {
        name: spark.createDataFrame(rows, schema).coalesce(2)
        for name, rows in _TABLES.items()
    }


def _rand_condition(rng: random.Random):
    """A random predicate valid verbatim in Spark SQL and DuckDB."""
    atoms = [
        f"i {rng.choice(['>', '<=', '=', '>='])} {rng.randint(-40, 40)}",
        f"x {rng.choice(['>', '<='])} {rng.randint(-1024, 1024) / 64}",
        f"g {rng.choice(['=', '!='])} '{rng.choice(['a', 'b', 'c'])}'",
        f"s IS {rng.choice(['NOT NULL', 'NULL'])}",
        (
            f"d {rng.choice(['>=', '<'])} DATE "
            f"'2020-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}'"
        ),
    ]
    picks = rng.sample(atoms, k=rng.randint(1, 2))
    return f" {rng.choice(['AND', 'OR'])} ".join(picks)


def _ref(sdfs, name, columns=None, cond_sql=None):
    cond = Condition(raw_string=cond_sql) if cond_sql else None
    return DataReference(
        ExpressionDataSource(sdfs[name], name), columns, cond
    )


_FAMILIES = [
    "row_count",
    "min_max",
    "mean",
    "length_extremes",
    "fraction_between",
    "missing_fraction",
    "percentile",
    "distinct_count",
    "union_count",
    "except_count",
    "duplicates",
    "group_agg",
    "join_agg",
    "grouped_percentile",
]


def _case_params(case_idx: int):
    """Deterministically derive one fuzz case from its index."""
    rng = random.Random(SEED * 100_003 + case_idx)
    family = _FAMILIES[case_idx % len(_FAMILIES)]
    t1 = f"ft{rng.randrange(N_TABLES)}"
    t2 = f"ft{rng.randrange(N_TABLES)}"
    return rng, family, t1, t2


@pytest.mark.parametrize(
    "case_idx",
    range(N_CASES),
    ids=[f"{i:03d}_{_FAMILIES[i % len(_FAMILIES)]}" for i in range(N_CASES)],
)
def test_fuzz_case(spark, duck, sdfs, case_idx):
    rng, family, t1, t2 = _case_params(case_idx)
    cond = _rand_condition(rng) if rng.random() < 0.7 else None
    where = f" WHERE {cond}" if cond else ""

    if family == "row_count":
        got, _ = get_row_count(spark, _ref(sdfs, t1, None, cond))
        exp = duck.execute(f"SELECT count(*) FROM {t1}{where}").fetchone()[0]
        assert got == exp

    elif family == "min_max":
        col = rng.choice(["i", "x", "d", "s"])
        fn, agg = rng.choice([(get_min, "min"), (get_max, "max")])
        got, _ = fn(spark, _ref(sdfs, t1, [col], cond))
        exp = duck.execute(
            f"SELECT {agg}({col}) FROM {t1}{where}"
        ).fetchone()[0]
        assert got == exp

    elif family == "mean":
        col = rng.choice(["i", "x"])
        got, _ = get_mean(spark, _ref(sdfs, t1, [col], cond))
        exp = duck.execute(
            f"SELECT avg({col}) FROM {t1}{where}"
        ).fetchone()[0]
        if exp is None or got is None:
            assert got == exp
        else:
            assert math.isclose(got, exp, rel_tol=1e-12, abs_tol=1e-12)

    elif family == "length_extremes":
        fn, agg = rng.choice(
            [(get_min_length, "min"), (get_max_length, "max")]
        )
        got, _ = fn(spark, _ref(sdfs, t1, ["s"], cond))
        exp = duck.execute(
            f"SELECT {agg}(length(s)) FROM {t1}{where}"
        ).fetchone()[0]
        assert got == exp

    elif family == "fraction_between":
        col = rng.choice(["i", "x"])
        lo = rng.randint(-1536, 512) / 64
        hi = lo + rng.randint(1, 2048) / 64
        got, _ = get_fraction_between(
            spark, _ref(sdfs, t1, [col], cond), lo, hi
        )
        n_all, n_in = duck.execute(
            f"SELECT count(*), count(CASE WHEN {col} >= {lo} AND "
            f"{col} <= {hi} THEN 1 END) FROM {t1}{where}"
        ).fetchone()
        exp = (n_in / n_all) if n_all else None
        assert got == exp

    elif family == "missing_fraction":
        col = rng.choice(["i", "x", "s", "d", "g"])
        got, _ = get_missing_fraction(spark, _ref(sdfs, t1, [col], cond))
        n_all, n_null = duck.execute(
            f"SELECT count(*), count(CASE WHEN {col} IS NULL THEN 1 END) "
            f"FROM {t1}{where}"
        ).fetchone()
        exp = (n_null / n_all) if n_all else 0
        assert got == exp

    elif family == "percentile":
        col = rng.choice(["i", "x", "s", "d"])
        p = rng.choice(
            [0.5, 10.0, 25.0, 50.0, 75.0, 90.0, 99.5, 100.0]
            + [rng.uniform(0.1, 99.9)]
        )
        # numeric columns also fuzz the CONDITION path: an empty
        # selection must raise on the Spark side exactly when the
        # oracle's min(v) is NULL
        pc = cond if col in ("i", "x") else None
        nn_where = (
            f"WHERE ({pc}) AND {col} IS NOT NULL"
            if pc
            else f"WHERE {col} IS NOT NULL"
        )
        exp = duck.execute(
            f"WITH nn AS (SELECT {col} AS v FROM {t1} {nn_where}), "
            "h AS (SELECT v, count(*) AS c FROM nn GROUP BY v), "
            "cc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, "
            "sum(c) OVER () AS total FROM h) "
            f"SELECT min(v) FROM cc WHERE cum * 100 >= {p!r} * total"
        ).fetchone()[0]
        if col in ("i", "x"):
            try:
                got, _ = get_percentile(spark, _ref(sdfs, t1, [col], pc), p)
            except ValueError:
                assert exp is None
            else:
                assert got == pytest.approx(float(exp), abs=0)
        else:
            got = exact_percentile_df(sdfs[t1], col, p).first()["value"]
            assert got == exp

    elif family == "distinct_count":
        cols = rng.sample(["i", "x", "s", "d", "g"], k=rng.randint(1, 2))
        got, _ = get_unique_count(spark, _ref(sdfs, t1, cols, cond))
        exp = duck.execute(
            f"SELECT count(*) FROM (SELECT DISTINCT {', '.join(cols)} "
            f"FROM {t1}{where})"
        ).fetchone()[0]
        assert got == exp

    elif family == "union_count":
        col = rng.choice(["i", "x", "s", "g"])
        got, _ = get_unique_count_union(
            spark, _ref(sdfs, t1, [col], cond), _ref(sdfs, t2, [col], cond)
        )
        exp = duck.execute(
            f"SELECT count(*) FROM (SELECT {col} FROM {t1}{where} "
            f"UNION SELECT {col} FROM {t2}{where})"
        ).fetchone()[0]
        assert got == exp

    elif family == "except_count":
        cols = rng.sample(["i", "g"], k=rng.randint(1, 2))
        sel = ", ".join(cols)
        got, _ = get_row_difference_count(
            spark, _ref(sdfs, t1, cols, cond), _ref(sdfs, t2, cols, cond)
        )
        exp = duck.execute(
            f"SELECT count(*) FROM (SELECT {sel} FROM {t1}{where} "
            f"EXCEPT SELECT {sel} FROM {t2}{where})"
        ).fetchone()[0]
        assert got == exp

    elif family == "duplicates":
        cols = rng.sample(["i", "x", "g"], k=rng.randint(1, 2))
        sel = ", ".join(cols)
        ref = _ref(sdfs, t1, cols, cond)
        got = duplicates(ref.get_selection(spark)).count()
        exp = duck.execute(
            f"SELECT count(*) FROM (SELECT {sel} FROM {t1}{where} "
            f"GROUP BY {sel} HAVING count(*) > 1)"
        ).fetchone()[0]
        assert got == exp

    elif family == "group_agg":
        # grouped aggregate row sets must match: NULL groups group
        # together in both engines; double sums stay exact on the grid
        from pyspark.sql import functions as SF

        ref = _ref(sdfs, t1, None, cond)
        key = lambda t: (t[0] is None, t[0] or "")  # noqa: E731
        got = sorted(
            [
                (r["g"], r["n"], r["si"], r["mx"], r["ms"])
                for r in ref.get_selection(spark)
                .groupBy("g")
                .agg(
                    SF.count(SF.lit(1)).alias("n"),
                    SF.sum("i").alias("si"),
                    SF.max("x").alias("mx"),
                    SF.min("s").alias("ms"),
                )
                .collect()
            ],
            key=key,
        )
        exp = sorted(
            duck.execute(
                f"SELECT g, count(*), CAST(sum(i) AS BIGINT), max(x), "
                f"min(s) FROM {t1}{where} GROUP BY g"
            ).fetchall(),
            key=key,
        )
        assert got == exp

    elif family == "join_agg":
        # inner equi-join + fused aggregate: NULL keys never join in
        # either engine; the summed doubles stay on the exact grid
        from pyspark.sql import functions as SF

        a = _ref(sdfs, t1, None, cond).get_selection(spark).alias("a")
        b = sdfs[t2].alias("b")
        row = (
            a.join(b, SF.col("a.i") == SF.col("b.i"))
            .agg(
                SF.count(SF.lit(1)).alias("n"),
                SF.sum(SF.col("a.x") + SF.col("b.x")).alias("sx"),
            )
            .first()
        )
        n, sx = duck.execute(
            f"SELECT count(*), sum(a.x + b.x) FROM "
            f"(SELECT * FROM {t1}{where}) a JOIN {t2} b ON a.i = b.i"
        ).fetchone()
        assert row["n"] == n
        if sx is None or row["sx"] is None:
            assert row["sx"] == sx
        else:
            assert math.isclose(row["sx"], sx, rel_tol=0, abs_tol=1e-9)

    elif family == "grouped_percentile":
        # per-group exact percentile: the group-partitioned cumulative
        # must apply the same canonical acceptance form per group;
        # NULL groups form their own group in both engines
        from datajudge_spark.operators.scalars import (
            grouped_exact_percentile,
        )

        col = rng.choice(["i", "x"])
        p = rng.choice(
            [0.5, 25.0, 50.0, 75.0, 99.5, 100.0]
            + [rng.uniform(0.1, 99.9)]
        )
        ref = _ref(sdfs, t1, None, cond)
        key = lambda t: (t[0] is None, t[0] or "")  # noqa: E731
        got = sorted(
            [
                (r["grp"], r["value"])
                for r in grouped_exact_percentile(
                    ref.get_selection(spark), "g", col, p
                ).collect()
            ],
            key=key,
        )
        nn_where = (
            f"WHERE ({cond}) AND {col} IS NOT NULL"
            if cond
            else f"WHERE {col} IS NOT NULL"
        )
        exp = sorted(
            duck.execute(
                f"WITH nn AS (SELECT g, {col} AS v FROM {t1} {nn_where}), "
                "h AS (SELECT g, v, count(*) AS c FROM nn GROUP BY g, v), "
                "cc AS (SELECT g, v, sum(c) OVER (PARTITION BY g "
                "ORDER BY v) AS cum, sum(c) OVER (PARTITION BY g) "
                "AS total FROM h) "
                f"SELECT g, min(v) FROM cc "
                f"WHERE cum * 100 >= {p!r} * total GROUP BY g"
            ).fetchall(),
            key=key,
        )
        assert got == exp

    else:  # pragma: no cover
        raise AssertionError(family)


def _adversarial_strings(rng: random.Random, n: int) -> list[str]:
    """Strings that stress UTF-8 handling: multibyte, combining marks,
    NFC vs NFD spellings, emoji (incl. ZWJ sequences), '#' collisions
    with the salt separator, long repeats, digits-only, whitespace."""
    pool = [
        "", " ", "  ", "#", "a#b", "#1", "abc#boot0",
        "é", "é",  # NFC vs NFD — distinct byte sequences
        "日本語テキスト", "中文文本", "한국어",
        "🙂", "👩‍👩‍👧‍👦",  # ZWJ family emoji
        "naïve café ﬁ",  # ligature
        "\t tab \n newline",
        "0", "-1", "9223372036854775807",
        "a" * 500, "日" * 200,
        "mixed 日本 ascii 123 🙂 end",
    ]
    out = list(pool)
    alphabet = "abcéøλ中日🙂#0123456789 "
    while len(out) < n:
        out.append(
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 40))
            )
        )
    return out[:n]


def test_md5_long_portable_on_adversarial_unicode(spark, duck):
    """The 60-bit md5 fold (the basis of EVERY deterministic hash in
    the dedup/sampling/bootstrap families) must agree byte-for-byte
    with the oracle engine's reconstruction on adversarial unicode —
    Spark hashes the UTF-8 bytes of the string, and so must any engine
    that replays the pipeline."""
    from datajudge_spark.pipeline.text import md5_long

    rng = random.Random(SEED + 999)
    strs = _adversarial_strings(rng, 80)
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: (r["h"], r["hs"])
        for r in df.select(
            "s",
            md5_long("s").alias("h"),
            md5_long("s", salt="boot0").alias("hs"),
        ).collect()
    }
    con = duck
    for s in strs:
        h, hs = con.execute(
            "SELECT CAST(CAST(('0x' || substr(md5(?), 1, 15)) AS UBIGINT)"
            " AS BIGINT), "
            "CAST(CAST(('0x' || substr(md5(? || '#boot0'), 1, 15)) "
            "AS UBIGINT) AS BIGINT)",
            [s, s],
        ).fetchone()
        assert got[s] == (h, hs), f"hash mismatch for {s!r}"


# ---------------------------------------------------------------------------
# Round-7 family fuzz (VERDICT r7 item 4): Mann-Kendall plain/grouped/
# seasonal, Gumbel EVT (incl. single-block groups), source_overlap /
# per_source_novelty (1 source, empty/short texts, breadth == max_breadth
# boundary).  Oracle = independent driver-side brute force of the same
# published formulas — tie groups, degenerate-variance NULLs and the
# ubiquitous-hash exclusion are exactly where rank/tie bugs live.
# ---------------------------------------------------------------------------

_MK_SEED = 20260816


def _mk_brute(day_vals):
    """(n, S, var_s, z) over [(day, value)] — Mann-Kendall with the
    standard tie correction and continuity-corrected z."""
    n = len(day_vals)
    ordered = [v for _, v in sorted(day_vals, key=lambda p: p[0])]
    s = sum(
        (0 if ordered[j] == ordered[i] else (1 if ordered[j] > ordered[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie = 0
    for v in set(ordered):
        t = ordered.count(v)
        tie += t * (t - 1) * (2 * t + 5)
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0 if n >= 2 else None
    z = None
    if var_s is not None and var_s > 0:
        z = (
            (s - 1) / math.sqrt(var_s)
            if s > 0
            else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
        )
    return n, s, var_s, z


def _approx_eq(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return a == pytest.approx(b, rel=tol, abs=1e-12)


@pytest.mark.parametrize("case", range(8))
def test_fuzz_mann_kendall_plain_and_grouped(spark, case):
    from datajudge_spark.operators.timeseries import mann_kendall

    rng = random.Random(_MK_SEED + case)
    # heavy ties on purpose: values from a 5-point grid; group sizes
    # include the 1-day group (S=0, var NULL) and 2-day groups
    groups = ["a", "b", "c"][: rng.randint(1, 3)]
    rows = []
    for g in groups:
        n_days = rng.choice([1, 2, 3, rng.randint(4, 25)])
        days = rng.sample(range(300), n_days)
        for d in days:
            rows.append(
                (g, _EPOCH + dt.timedelta(days=d), rng.randint(0, 4))
            )
    daily = spark.createDataFrame(
        rows, "src string, day date, total long"
    )

    # plain (one group's rows only, mirroring the daily-digest shape)
    g0 = groups[0]
    got = mann_kendall(
        daily.where(f"src = '{g0}'"), "total"
    ).collect()[0]
    n, s, var_s, z = _mk_brute(
        [(d, v) for g, d, v in rows if g == g0]
    )
    assert (got["n_days"], got["s_stat"]) == (n, s), f"case {case}"
    assert _approx_eq(got["var_s"], var_s) and _approx_eq(got["z"], z)

    # grouped: one digest row per group, same formulas keyed by group
    per = {
        r["src"]: r
        for r in mann_kendall(daily, "total", group_col="src").collect()
    }
    assert set(per) == set(groups)
    for g in groups:
        n, s, var_s, z = _mk_brute(
            [(d, v) for gg, d, v in rows if gg == g]
        )
        r = per[g]
        assert (r["n_days"], r["s_stat"]) == (n, s), f"case {case} {g}"
        assert _approx_eq(r["var_s"], var_s) and _approx_eq(r["z"], z)


@pytest.mark.parametrize("case", range(6))
def test_fuzz_seasonal_mann_kendall(spark, case):
    from datajudge_spark.operators.timeseries import seasonal_mann_kendall

    rng = random.Random(_MK_SEED + 100 + case)
    n_days = rng.choice([1, 2, 7, 8, rng.randint(10, 60)])
    days = rng.sample(range(400), n_days)
    rows = [
        (_EPOCH + dt.timedelta(days=d), rng.randint(0, 3)) for d in days
    ]
    daily = spark.createDataFrame(rows, "day date, total long")
    got = seasonal_mann_kendall(daily, "total").collect()[0]

    strata: dict = {}
    for d, v in rows:
        strata.setdefault(d.weekday(), []).append((d, v))
    tot_n = tot_s = 0
    tot_var = 0.0
    for sv in strata.values():
        n, s, var_s, _ = _mk_brute(sv)
        tot_n += n
        tot_s += s
        tot_var += var_s if var_s is not None else 0.0
    z = None
    if tot_var > 0:
        z = (
            (tot_s - 1) / math.sqrt(tot_var)
            if tot_s > 0
            else ((tot_s + 1) / math.sqrt(tot_var) if tot_s < 0 else 0.0)
        )
    assert got["n_days"] == tot_n and got["n_seasons"] == len(strata)
    assert got["s_stat"] == tot_s, f"case {case}"
    assert _approx_eq(got["var_s"], tot_var) and _approx_eq(got["z"], z)


@pytest.mark.parametrize("case", range(6))
def test_fuzz_gumbel_evt(spark, case):
    from datajudge_spark.operators.timeseries import (
        EULER_GAMMA,
        gumbel_fit_from_maxima,
    )

    rng = random.Random(_MK_SEED + 200 + case)
    periods = (12, 60)
    groups = ["g0", "g1", "g2"][: rng.randint(1, 3)]
    rows = []
    for g in groups:
        # single-block groups (n=1 -> NULL fit) and zero-variance
        # groups (all maxima equal -> var_num == 0 -> NULL fit) mixed in
        shape = rng.choice(["single", "constant", "normal"])
        n_blocks = 1 if shape == "single" else rng.randint(2, 9)
        const = rng.randint(5, 500)
        for b in range(n_blocks):
            m = const if shape == "constant" else rng.randint(1, 10_000)
            rows.append((g, b, m))
    blocks = spark.createDataFrame(rows, "src string, b int, m long")
    got = {
        r["src"]: r
        for r in gumbel_fit_from_maxima(
            blocks, "m", periods, group_cols=["src"]
        ).collect()
    }
    assert set(got) == set(groups)
    for g in groups:
        ms = [m for gg, _b, m in rows if gg == g]
        n = len(ms)
        sm, ss = sum(ms), sum(m * m for m in ms)
        var_num = n * ss - sm * sm
        r = got[g]
        assert r["n_blocks"] == n and r["max_observed"] == max(ms)
        if n < 2 or var_num <= 0:
            assert r["mu"] is None and r["beta"] is None
            assert all(r[f"rl_{t}"] is None for t in periods), f"case {case}"
        else:
            mean = sm / n
            std = math.sqrt(var_num / (n * (n - 1.0)))
            beta = std * math.sqrt(6.0) / math.pi
            mu = mean - EULER_GAMMA * beta
            assert _approx_eq(r["mu"], mu) and _approx_eq(r["beta"], beta)
            for t in periods:
                rl = mu - beta * math.log(-math.log(1.0 - 1.0 / t))
                assert _approx_eq(r[f"rl_{t}"], rl), f"case {case} {g} {t}"


def _py_shingles(text: str, n: int = 3) -> set:
    toks = __import__("re").split(r"\s+", text.strip())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.parametrize("case", range(6))
def test_fuzz_source_overlap_and_novelty(spark, case):
    from datajudge_spark.pipeline.decontam import (
        per_source_novelty,
        source_overlap,
    )

    rng = random.Random(_MK_SEED + 300 + case)
    pool = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    max_breadth = 3
    n_sources = rng.choice([1, 2, 4, 5])
    sources = [f"s{i}" for i in range(n_sources)]
    rows: list = []
    did = 0
    for s in sources:
        for _ in range(rng.randint(1, 4)):
            k = rng.choice([0, 1, 2, 3, rng.randint(4, 12)])
            rows.append(
                (did, s, " ".join(rng.choice(pool) for _ in range(k)))
            )
            did += 1
    # boundary probe: one shingle present in exactly max_breadth sources
    # (KEPT) and one in max_breadth+1 (EXCLUDED), when enough sources
    kept_marker = "k1 k2 k3"
    cut_marker = "x1 x2 x3"
    for s in sources[:max_breadth]:
        rows.append((did, s, kept_marker))
        did += 1
    if n_sources >= max_breadth + 1:
        for s in sources[: max_breadth + 1]:
            rows.append((did, s, cut_marker))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")

    # brute force on shingle STRINGS (md5_long is injective here — the
    # adversarial-unicode test above pins the hash itself)
    per_src: dict = {s: set() for s in sources}
    for _d, s, t in rows:
        per_src[s] |= _py_shingles(t)
    breadth: dict = {}
    for s in sources:
        for sh in per_src[s]:
            breadth[sh] = breadth.get(sh, 0) + 1
    kept = {s: {sh for sh in per_src[s] if breadth[sh] <= max_breadth}
            for s in sources}

    ov = source_overlap(
        df, "src", "text", shingle_n=3, max_breadth=max_breadth
    ).collect()
    exp_pairs = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            shared = kept[a] & kept[b]
            if shared:
                aa, bb = min(a, b), max(a, b)
                exp_pairs[(aa, bb)] = (
                    len(shared),
                    round(len(shared) / (len(kept[aa]) + len(kept[bb]) - len(shared)), 6),
                    round(len(shared) / len(kept[aa]), 6),
                    round(len(shared) / len(kept[bb]), 6),
                )
    got_pairs = {
        (r["src_a"], r["src_b"]): (
            r["n_shared"], r["jaccard"], r["containment_a"], r["containment_b"]
        )
        for r in ov
    }
    assert got_pairs == exp_pairs, f"case {case}"

    nov = {
        r["src"]: (r["n_ngrams"], r["n_shared_elsewhere"],
                   r["novelty_fraction"])
        for r in per_source_novelty(df, "src", "text", shingle_n=3).collect()
    }
    for s in sources:
        if not per_src[s]:
            assert s not in nov  # no shingles at all -> no digest row
            continue
        n_ng = len(per_src[s])
        n_sh = sum(1 for sh in per_src[s] if breadth[sh] >= 2)
        assert nov[s] == (
            n_ng, n_sh, round((n_ng - n_sh) / n_ng, 6)
        ), f"case {case} {s}"


# ---------------------------------------------------------------------------
# Round-8 family fuzz: AD/CvM rank tests, Jarque-Bera, Kendall tau-b,
# grouped PSI — seeded random values with heavy ties and null mixes vs
# driver-side brute force of the published formulas.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case", range(6))
def test_fuzz_rank_2sample(spark, case):
    from datajudge_spark.operators.stats import rank_2sample_tests

    rng = random.Random(_MK_SEED + 400 + case)
    grid = rng.choice([3, 8, 40])  # tie density knob
    x = [rng.randint(0, grid) for _ in range(rng.randint(2, 120))]
    y = [rng.randint(0, grid) for _ in range(rng.randint(2, 120))]
    d1 = spark.createDataFrame([(v,) for v in x], "v int")
    d2 = spark.createDataFrame([(v,) for v in y], "v int")
    row = rank_2sample_tests(d1, d2, "v", "v").collect()[0]

    t1, t2 = len(x), len(y)
    n = t1 + t2
    c1 = c2 = 0
    ad = cvm = 0.0
    for v in sorted(set(x) | set(y)):
        l1, l2 = x.count(v), y.count(v)
        c1, c2 = c1 + l1, c2 + l2
        b = c1 + c2
        if b < n:
            num = n * c1 - t1 * b
            ad += (l1 + l2) / n * num * num / (b * (n - b)) \
                * (1.0 / t1 + 1.0 / t2)
        diff = c1 * t2 - c2 * t1
        cvm += (l1 + l2) * diff * diff
    cvm /= t1 * t2 * n * n
    assert (row["n1"], row["n2"]) == (t1, t2)
    assert row["ad"] == pytest.approx(ad, rel=1e-9, abs=1e-12), f"case {case}"
    assert row["cvm"] == pytest.approx(cvm, rel=1e-9, abs=1e-12), f"case {case}"


@pytest.mark.parametrize("case", range(6))
def test_fuzz_jarque_bera(spark, case):
    from datajudge_spark.operators.stats import jarque_bera

    rng = random.Random(_MK_SEED + 500 + case)
    groups = ["a", "b"][: rng.randint(1, 2)]
    rows = []
    for g in groups:
        shape = rng.choice(["normalish", "skewed", "constant", "single"])
        n = 1 if shape == "single" else rng.randint(2, 150)
        for _ in range(n):
            if shape == "constant":
                v = 7
            elif shape == "skewed":
                v = rng.randint(0, 5) ** 3
            else:
                v = rng.randint(-50, 50)
            rows.append((g, v))
        if rng.random() < 0.4:
            rows.append((g, None))  # nulls excluded everywhere
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in jarque_bera(df, "v", group_col="g").collect()}
    for g in groups:
        xs = [v for gg, v in rows if gg == g and v is not None]
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        r = got[g]
        assert r["n"] == n
        assert r["mean"] == pytest.approx(mu, abs=2e-6)
        if n < 2 or m2 == 0:
            assert r["jb"] is None, f"case {case} {g}"
            continue
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        g1, g2 = m3 / m2**1.5, m4 / m2**2
        assert r["skewness"] == pytest.approx(g1, abs=2e-6), f"case {case}"
        assert r["kurtosis"] == pytest.approx(g2, abs=2e-6)
        assert r["jb"] == pytest.approx(
            n / 6 * (g1 * g1 + (g2 - 3) ** 2 / 4), rel=1e-4, abs=2e-6
        )


@pytest.mark.parametrize("case", range(5))
def test_fuzz_kendall_tau_b(spark, case):
    from datajudge_spark.operators.timeseries import kendall_tau_b

    rng = random.Random(_MK_SEED + 600 + case)
    gx = rng.choice([2, 4, 20])
    gy = rng.choice([2, 4, 20])
    n = rng.choice([1, 2, rng.randint(3, 60)])
    pairs = [(rng.randint(0, gx), rng.randint(0, gy)) for _ in range(n)]
    rows = [
        (_EPOCH + dt.timedelta(days=i), x, y)
        for i, (x, y) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (pairs[j][0] > pairs[i][0]) - (pairs[j][0] < pairs[i][0])
            sy = (pairs[j][1] > pairs[i][1]) - (pairs[j][1] < pairs[i][1])
            c, d = c + (sx * sy > 0), d + (sx * sy < 0)
    tx = ty = 0
    for k in (0, 1):
        vals = [p[k] for p in pairs]
        t_sum = sum(
            vals.count(v) * (vals.count(v) - 1) for v in set(vals)
        )
        tx, ty = (t_sum, ty) if k == 0 else (tx, t_sum)
    den = math.sqrt((n * (n - 1) - tx) * (n * (n - 1) - ty)) / 2
    assert (r["n_days"], r["concordant"], r["discordant"]) == (n, c, d)
    if den == 0:
        assert r["tau_b"] is None, f"case {case}"
    else:
        assert r["tau_b"] == pytest.approx((c - d) / den, abs=1e-12)


@pytest.mark.parametrize("case", range(4))
def test_fuzz_grouped_psi(spark, case):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import grouped_psi

    rng = random.Random(_MK_SEED + 700 + case)
    n_buckets = rng.choice([2, 5, 10])
    lo, hi = 0.0, 100.0
    w = (hi - lo) / n_buckets
    rows = []
    for _ in range(rng.randint(30, 300)):
        rows.append((
            rng.choice(["g1", "g2", "g3", None]),
            rng.choice([1, 2]),
            None if rng.random() < 0.1
            # exact grid doubles incl. out-of-range (clamped tails)
            else rng.randint(-320, 4480) / 32,
        ))
    df = spark.createDataFrame(rows, "g string, half int, v double")
    got = {
        r["g"]: (r["n_baseline"], r["n_current"], r["psi"])
        for r in grouped_psi(
            df, "g", "v", F.col("half") == 1, F.col("half") == 2,
            lo=lo, hi=hi, n_buckets=n_buckets,
        ).collect()
    }
    per_group: dict = {}
    for g, half, v in rows:
        if g is None or v is None:
            continue
        b = min(max(int(math.floor((v - lo) / w)), 0), n_buckets - 1)
        per_group.setdefault(g, {}).setdefault(b, [0, 0])[half - 1] += 1
    for g, hist in per_group.items():
        t1 = sum(v[0] for v in hist.values())
        t2 = sum(v[1] for v in hist.values())
        psi = 0.0
        for n1, n2 in hist.values():
            p = (n1 + 0.5) / (t1 + 0.5 * n_buckets)
            q = (n2 + 0.5) / (t2 + 0.5 * n_buckets)
            psi += (p - q) * math.log(p / q)
        assert got[g][0] == t1 and got[g][1] == t2, f"case {case} {g}"
        assert got[g][2] == pytest.approx(psi, abs=2e-6), f"case {case} {g}"
    assert set(got) == set(per_group)


@pytest.mark.parametrize("case", range(5))
def test_fuzz_cuped(spark, case):
    from datajudge_spark.operators.stats import cuped_adjusted_diff

    rng = random.Random(_MK_SEED + 800 + case)
    shape = rng.choice(["corr", "noise", "const_pre", "tiny"])
    rows = []
    n = 4 if shape == "tiny" else rng.randint(20, 250)
    for i in range(n):
        v = i % 2
        if shape == "const_pre":
            x = 9
        else:
            x = rng.randint(0, 400)
        y = (
            x * 3 + rng.randint(0, 50) + (25 if v == 0 else 0)
            if shape == "corr"
            else rng.randint(0, 1000)
        )
        rows.append((x, y, v))
    df = spark.createDataFrame(rows, "x long, y long, v int")
    r = cuped_adjusted_diff(df, "x", "y", "v").collect()[0]

    nn = len(rows)
    sx = sum(x for x, _y, _v in rows); sy = sum(y for _x, y, _v in rows)
    sxx = sum(x * x for x, _y, _v in rows)
    syy = sum(y * y for _x, y, _v in rows)
    sxy = sum(x * y for x, y, _v in rows)
    a = [(x, y) for x, y, v in rows if v == 0]
    b = [(x, y) for x, y, v in rows if v == 1]
    varxn = nn * sxx - sx * sx
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    diff_raw = sum(y for _x, y in a) / len(a) - sum(y for _x, y in b) / len(b)
    assert r["diff_raw"] == pytest.approx(diff_raw, abs=2e-6), f"case {case}"
    if varxn <= 0:
        assert r["theta"] is None and r["diff_cuped"] is None
    else:
        theta = (nn * sxy - sx * sy) / varxn
        mxa = sum(x for x, _y in a) / len(a)
        mxb = sum(x for x, _y in b) / len(b)
        assert r["theta"] == pytest.approx(theta, abs=2e-6)
        assert r["diff_cuped"] == pytest.approx(
            diff_raw - theta * (mxa - mxb), abs=2e-6
        ), f"case {case}"
        varyn = nn * syy - sy * sy
        if varyn > 0:
            assert r["rho2"] == pytest.approx(
                (nn * sxy - sx * sy) ** 2 / (varxn * varyn), abs=2e-6
            )


@pytest.mark.parametrize("case", range(5))
def test_fuzz_logrank(spark, case):
    from datajudge_spark.operators.timeseries import logrank_test

    rng = random.Random(_MK_SEED + 900 + case)
    # heavy ties (duration grid 1..5), censoring mixes, group imbalance
    grid = rng.choice([3, 5, 12])
    cens_p = rng.choice([0.0, 0.3, 0.9])
    n = rng.randint(6, 150)
    subjects = [
        (rng.randint(1, grid), 1 if rng.random() >= cens_p else 0,
         0 if rng.random() < rng.choice([0.2, 0.5]) else 1)
        for _ in range(n)
    ]
    if len({g for _d, _e, g in subjects}) < 2:
        subjects += [(1, 1, 0), (1, 1, 1)]
    df = spark.createDataFrame(subjects, "dur int, ev int, grp int")
    out = logrank_test(df, "dur", "ev", "grp").collect()
    times = sorted({t for t, e, _g in subjects if e == 1})
    if not times:
        assert out == []
        return
    o1 = 0
    e1 = v = 0.0
    for t in times:
        n1 = sum(1 for d, _e, g in subjects if d >= t and g == 0)
        n2 = sum(1 for d, _e, g in subjects if d >= t and g == 1)
        d1 = sum(1 for d, e, g in subjects if d == t and e and g == 0)
        d2 = sum(1 for d, e, g in subjects if d == t and e and g == 1)
        d, tot = d1 + d2, n1 + n2
        o1 += d1
        e1 += d * n1 / tot
        if tot > 1:
            v += d * (n1 / tot) * (n2 / tot) * (tot - d) / (tot - 1)
    r = out[0]
    assert r["observed_1"] == o1, f"case {case}"
    assert r["expected_1"] == pytest.approx(e1, abs=2e-6), f"case {case}"
    if v > 0:
        assert r["chi2"] == pytest.approx((o1 - e1) ** 2 / v, abs=2e-5)
    else:
        assert r["chi2"] is None


@pytest.mark.parametrize("case", range(5))
def test_fuzz_cox_score(spark, case):
    from datajudge_spark.operators.timeseries import cox_score_test

    rng = random.Random(_MK_SEED + 950 + case)
    grid = rng.choice([3, 5, 12])
    cens_p = rng.choice([0.0, 0.3, 0.9])
    n = rng.randint(6, 150)
    # integer covariate (cents-style) so the decimal cast is exact
    subjects = [
        (rng.randint(1, grid), 1 if rng.random() >= cens_p else 0,
         rng.randint(0, 500))
        for _ in range(n)
    ]
    df = spark.createDataFrame(subjects, "dur int, ev int, x long")
    out = cox_score_test(df, "dur", "ev", "x").collect()
    times = sorted({t for t, e, _x in subjects if e == 1})
    if not times:
        assert out == []
        return
    u = info = 0.0
    n_events = 0
    for t in times:
        risk = [x for d, _e, x in subjects if d >= t]
        nn = len(risk)
        s1, s2 = sum(risk), sum(v * v for v in risk)
        d = sum(1 for dd, e, _x in subjects if dd == t and e)
        sxe = sum(x for dd, e, x in subjects if dd == t and e)
        xbar = s1 / nn
        u += sxe - d * xbar
        info += d * (s2 / nn - xbar * xbar)
        n_events += d
    r = out[0]
    assert (r["n_subjects"], r["n_events"]) == (n, n_events), f"case {case}"
    assert r["u_score"] == pytest.approx(u, abs=2e-5), f"case {case}"
    assert r["information"] == pytest.approx(info, abs=2e-5), f"case {case}"
    if info > 0:
        assert r["chi2"] == pytest.approx(u * u / info, abs=2e-4)
    else:
        assert r["chi2"] is None


@pytest.mark.parametrize("case", range(5))
def test_fuzz_obf_sequential(spark, case):
    from datajudge_spark.operators.stats import (
        norm_ppf,
        obf_sequential_ztest,
        sequential_look_counts,
    )
    from pyspark.sql import functions as F

    rng = random.Random(_MK_SEED + 960 + case)
    n_looks = rng.randint(1, 8)
    rows = []
    for look in range(1, n_looks + 1):
        for _ in range(rng.randint(0, 60)):
            grp = rng.randint(0, 1)
            # some looks deliberately one-sided / all-converting
            conv = 1 if rng.random() < rng.choice([0.0, 0.4, 1.0]) else 0
            rows.append((look, grp, conv))
    if not rows:
        rows = [(1, 0, 1), (1, 1, 0)]
    df = spark.createDataFrame(rows, "look int, grp int, conv int")
    looks = sequential_look_counts(
        df, "look", F.col("grp") == 0, F.col("grp") == 1, F.col("conv") == 1
    )
    out = {r["look"]: r for r in obf_sequential_ztest(looks).collect()}
    c = norm_ppf(0.975)
    present = sorted({lk for lk, _g, _c in rows})
    tot = len(rows)
    for lk in present:
        upto = [r for r in rows if r[0] <= lk]
        na = sum(1 for l, g, _c2 in upto if g == 0)
        sa = sum(1 for l, g, c2 in upto if g == 0 and c2)
        nb = sum(1 for l, g, _c2 in upto if g == 1)
        sb = sum(1 for l, g, c2 in upto if g == 1 and c2)
        r = out[lk]
        assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (na, sa, nb, sb)
        t = (na + nb) / tot
        assert r["info_frac"] == pytest.approx(t, abs=2e-6)
        assert r["boundary"] == pytest.approx(c / t ** 0.5, abs=2e-5)
        if na and nb:
            p = (sa + sb) / (na + nb)
            var = p * (1 - p) * (1 / na + 1 / nb)
            if var > 0:
                z = (sa / na - sb / nb) / var ** 0.5
                assert r["z"] == pytest.approx(z, abs=2e-5), f"case {case}"
                b = c / t ** 0.5
                if abs(abs(z) - b) > 1e-9:  # skip knife-edge ties
                    assert r["crossed"] == (abs(z) >= b), f"case {case}"
                continue
        assert r["z"] is None and r["crossed"] is False


def test_obf_exact_constants_and_schedule(spark):
    # the published Jennison-Turnbull Table 2.3 constants for a
    # declared schedule; fixed-horizon fallback outside the table
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import (
        norm_ppf,
        obf_critical_value,
        obf_sequential_ztest,
        sequential_look_counts,
    )

    assert obf_critical_value(1) == pytest.approx(1.960)
    assert obf_critical_value(5) == pytest.approx(2.040)
    assert obf_critical_value(10) == pytest.approx(2.087)
    # outside the table: fixed-horizon z
    assert obf_critical_value(11) == pytest.approx(norm_ppf(0.975))
    assert obf_critical_value(5, alpha=0.01) == pytest.approx(
        norm_ppf(0.995)
    )
    with pytest.raises(ValueError):
        obf_critical_value(0)

    rows = [(lk, g, c) for lk in (1, 2) for g in (0, 1) for c in (0, 1)]
    df = spark.createDataFrame(rows, "look int, grp int, conv int")
    looks = sequential_look_counts(
        df, "look", F.col("grp") == 0, F.col("grp") == 1,
        F.col("conv") == 1,
    )
    out = {
        r["look"]: r
        for r in obf_sequential_ztest(looks, n_looks=2).collect()
    }
    # boundary scales by the exact K=2 constant, not 1.96
    assert out[2]["boundary"] == pytest.approx(1.977, abs=1e-9)
    # output rounds at 6dp
    assert out[1]["boundary"] == pytest.approx(1.977 / 0.5 ** 0.5, abs=1e-5)
    # explicit critical_value overrides the schedule
    out2 = {
        r["look"]: r
        for r in obf_sequential_ztest(
            looks, critical_value=3.0, n_looks=2
        ).collect()
    }
    assert out2[2]["boundary"] == pytest.approx(3.0, abs=1e-9)


@pytest.mark.parametrize("case", range(5))
def test_fuzz_qte(spark, case):
    from datajudge_spark.operators.stats import quantile_treatment_effect

    rng = random.Random(_MK_SEED + 970 + case)
    deciles = rng.choice([4, 10])
    # heavy ties, imbalanced variants, a shift on one side
    shift = rng.choice([0, 7])
    rows = []
    for _ in range(200):
        g = 1 if rng.random() < 0.3 else 0
        rows.append((g, float(rng.randint(0, 30) + (shift if g else 0))))
    if not any(g == 1 for g, _v in rows):
        rows.append((1, 3.0))
    df = spark.createDataFrame(rows, "grp int, v double")
    out = {
        r["decile"]: r
        for r in quantile_treatment_effect(
            df, "v", "grp", deciles=deciles
        ).collect()
    }
    a = sorted(v for g, v in rows if g == 0)
    b = sorted(v for g, v in rows if g == 1)

    def q(vals, j):
        # smallest v with deciles*cum >= j*n over the sorted values
        n = len(vals)
        for i, v in enumerate(vals, start=1):
            if deciles * i >= j * n:
                return v
        return None

    assert len(out) == deciles - 1
    for j in range(1, deciles):
        qa, qb = q(a, j), q(b, j)
        r = out[j]
        assert r["q_a"] == pytest.approx(qa, abs=1e-9), f"case {case} j={j}"
        assert r["q_b"] == pytest.approx(qb, abs=1e-9), f"case {case} j={j}"
        assert r["qte"] == pytest.approx(qb - qa, abs=1e-9)


def test_qte_all_null_variant_raises(spark):
    # a discovered level whose values are all NULL has no distribution:
    # the gate must refuse loudly (NULL quantiles would pass vacuously
    # and SQL mirrors would return the global min instead)
    from datajudge_spark.operators.stats import quantile_treatment_effect

    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, None), (1, None)], "grp int, v double"
    )
    with pytest.raises(ValueError, match="no non-null 'v' values"):
        quantile_treatment_effect(df, "v", "grp").collect()


@pytest.mark.parametrize("case", range(5))
def test_fuzz_post_stratified(spark, case):
    from datajudge_spark.operators.stats import post_stratified_diff

    rng = random.Random(_MK_SEED + 1000 + case)
    n_strata = rng.choice([1, 2, 6])
    rows = []
    for i in range(rng.randint(10, 300)):
        s = rng.randrange(n_strata)
        # some strata deliberately single-variant (excluded from the
        # stratified estimate but present in raw/strata counts)
        v = 0 if (s == 0 and rng.random() < 0.95) else rng.randint(0, 1)
        rows.append((rng.randint(0, 500) * (s + 1), v, f"s{s}"))
    if not any(v == 1 for _y, v, _s in rows):
        rows.append((7, 1, "s0"))
    df = spark.createDataFrame(rows, "y long, v int, s string")
    r = post_stratified_diff(df, "y", "v", "s").collect()[0]

    strata: dict = {}
    for y, v, s in rows:
        strata.setdefault(s, {0: [], 1: []})[v].append(y)
    a = [y for y, v, _s in rows if v == 0]
    b = [y for y, v, _s in rows if v == 1]
    assert (r["n_a"], r["n_b"], r["n_strata"]) == (
        len(a), len(b), len(strata),
    )
    raw = sum(a) / len(a) - sum(b) / len(b)
    assert r["diff_raw"] == pytest.approx(raw, abs=2e-6), f"case {case}"
    wsum = wtot = 0.0
    for d in strata.values():
        if d[0] and d[1]:
            w = len(d[0]) + len(d[1])
            wsum += w * (sum(d[0]) / len(d[0]) - sum(d[1]) / len(d[1]))
            wtot += w
    if wtot > 0:
        assert r["diff_stratified"] == pytest.approx(
            wsum / wtot, abs=2e-6
        ), f"case {case}"
    else:
        assert r["diff_stratified"] is None


# ---------------------------------------------------------------------------
# Experimentation constraint FACTORIES (add_cuped_diff / add_logrank /
# add_stratified_diff): the factory gate must agree with a driver-side
# decision model on randomized frames INCLUDING the degenerate shapes
# VERDICT r8 named — zero-variance strata, single-variant strata,
# all-censored cohorts — and must never crash.
# ---------------------------------------------------------------------------

def _exp_factory_req(spark, rows, schema, name):
    from datajudge_spark import WithinRequirement

    return WithinRequirement.from_dataframe(
        spark.createDataFrame(rows, schema), name
    )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_stratified_factory(spark, case):
    rng = random.Random(_MK_SEED + 1100 + case)
    shape = [
        "zero_variance_strata",   # metric constant within every stratum
        "all_single_variant",     # no stratum has both variants
        "one_stratum",
        "mixed",
        "mixed",
        "null_heavy",
    ][case]
    rows = []
    n_strata = 1 if shape == "one_stratum" else rng.randint(2, 5)
    for i in range(rng.randint(8, 120)):
        s = i % n_strata
        if shape == "all_single_variant":
            v = s % 2  # variant fully determined by stratum
        else:
            v = rng.randint(0, 1)
        if shape == "zero_variance_strata":
            y = 100 * (s + 1)  # constant per stratum
        else:
            y = rng.randint(0, 300)
        if shape == "null_heavy" and rng.random() < 0.4:
            y = None
        rows.append((y, v, f"s{s}"))
    # ensure two assignment levels so the gate reaches the digest
    rows += [(5, 0, "s0"), (6, 1, f"s{n_strata - 1}")]
    req = _exp_factory_req(spark, rows, "y long, v int, s string", f"sf{case}")
    threshold = rng.choice([0.0, 5.0, 1e6])
    req.add_stratified_diff_constraint("y", "v", "s", threshold)
    result = req.test(spark)[0]

    # driver-side model (mirrors the operator contract)
    strata: dict = {}
    for y, v, s in rows:
        if y is None:
            continue
        strata.setdefault(s, {0: [], 1: []})[v].append(y)
    wsum = wtot = 0.0
    for d in strata.values():
        if d[0] and d[1]:
            w = len(d[0]) + len(d[1])
            wsum += w * (sum(d[0]) / len(d[0]) - sum(d[1]) / len(d[1]))
            wtot += w
    if wtot == 0:
        assert result.outcome is False, f"case {case}: undefined must fail"
        assert "undefined" in result.failure_message
    else:
        expected = abs(round(wsum / wtot, 6)) <= threshold
        assert result.outcome is expected, f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(6))
def test_fuzz_logrank_factory(spark, case):
    rng = random.Random(_MK_SEED + 1200 + case)
    shape = [
        "all_censored",         # no observed events at all
        "one_group_censored",   # every event in a single cohort
        "tied_grid",
        "mixed",
        "mixed",
        "single_subject_groups",
    ][case]
    rows = []
    n = 2 if shape == "single_subject_groups" else rng.randint(6, 120)
    for i in range(n):
        g = i % 2
        ev = 0 if shape == "all_censored" or (
            shape == "one_group_censored" and g == 1
        ) else rng.randint(0, 1)
        rows.append((rng.randint(1, 4 if shape == "tied_grid" else 30), ev, g))
    req = _exp_factory_req(spark, rows, "dur int, ev int, grp int", f"lr{case}")
    threshold = rng.choice([0.0, 3.84, 1e9])
    req.add_logrank_constraint("dur", "ev", "grp", threshold)
    result = req.test(spark)[0]

    times = sorted({d for d, e, _g in rows if e == 1})
    if not times:
        # no observed events -> vacuous pass, never a crash
        assert result.outcome is True, f"case {case}: all-censored must pass"
        return
    o1 = 0
    e1 = v = 0.0
    for t in times:
        n1 = sum(1 for d, _e, g in rows if d >= t and g == 0)
        n2 = sum(1 for d, _e, g in rows if d >= t and g == 1)
        d1 = sum(1 for d, e, g in rows if d == t and e and g == 0)
        dd = d1 + sum(1 for d, e, g in rows if d == t and e and g == 1)
        tot = n1 + n2
        o1 += d1
        e1 += dd * n1 / tot
        if tot > 1:
            v += dd * (n1 / tot) * (n2 / tot) * (tot - dd) / (tot - 1)
    if v <= 0:
        # zero-variance chi2 is undefined -> clean failure, not IndexError
        assert result.outcome is False
        assert "undefined" in result.failure_message
    else:
        expected = round((o1 - e1) ** 2 / v, 6) <= threshold
        assert result.outcome is expected, f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(6))
def test_fuzz_cuped_factory(spark, case):
    rng = random.Random(_MK_SEED + 1300 + case)
    shape = [
        "zero_pre_variance",   # constant covariate -> raw-diff fallback
        "perfect_corr",
        "anticorr",
        "mixed",
        "mixed",
        "tiny",
    ][case]
    rows = []
    n = 4 if shape == "tiny" else rng.randint(12, 160)
    for i in range(n):
        v = i % 2
        x = 7 if shape == "zero_pre_variance" else rng.randint(0, 200)
        if shape == "perfect_corr":
            y = 2 * x + (9 if v == 0 else 0)
        elif shape == "anticorr":
            y = 1000 - 3 * x + rng.randint(0, 5)
        else:
            y = rng.randint(0, 500)
        rows.append((x, y, v))
    req = _exp_factory_req(spark, rows, "x long, y long, v int", f"cu{case}")
    threshold = rng.choice([0.0, 10.0, 1e9])
    req.add_cuped_diff_constraint("x", "y", "v", threshold)
    result = req.test(spark)[0]

    nn = len(rows)
    sx = sum(x for x, _y, _v in rows); sy = sum(y for _x, y, _v in rows)
    sxx = sum(x * x for x, _y, _v in rows)
    sxy = sum(x * y for x, y, _v in rows)
    a = [(x, y) for x, y, v in rows if v == 0]
    b = [(x, y) for x, y, v in rows if v == 1]
    diff_raw = sum(y for _x, y in a) / len(a) - sum(y for _x, y in b) / len(b)
    varxn = nn * sxx - sx * sx
    if varxn <= 0:
        adjusted = diff_raw  # documented raw-difference fallback
    else:
        theta = (nn * sxy - sx * sy) / varxn
        mxa = sum(x for x, _y in a) / len(a)
        mxb = sum(x for x, _y in b) / len(b)
        adjusted = diff_raw - theta * (mxa - mxb)
    expected = abs(round(adjusted, 6)) <= threshold
    assert result.outcome is expected, f"case {case} ({shape})"


# ---------------------------------------------------------------------------
# Round-9 operator family: ratio z / SRM / Pettitt / dispersion vs brute
# force, including the degenerate shapes (zero denominators, single
# level, constant series, all-zero counts).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", range(5))
def test_fuzz_ratio_ztest(spark, case):
    from datajudge_spark.operators.stats import ratio_metric_ztest

    rng = random.Random(_MK_SEED + 1400 + case)
    shape = ["mixed", "mixed", "const_ratio", "tiny", "one_zero_den"][case]
    rows = []
    n = 5 if shape == "tiny" else rng.randint(20, 250)
    for i in range(n):
        v = i % 2
        den = 0 if (shape == "one_zero_den" and v == 0) else rng.randint(1, 40)
        num = (
            den // 2
            if shape == "const_ratio"
            else rng.randint(0, max(den, 1))
        )
        rows.append((num, den, v))
    df = spark.createDataFrame(rows, "num long, den long, v int")
    r = ratio_metric_ztest(df, "num", "den", "v").collect()[0]

    def side(v):
        xs = [(a, b) for a, b, vv in rows if vv == v]
        n_ = len(xs)
        sn = sum(a for a, _b in xs); sd = sum(b for _a, b in xs)
        if n_ < 2 or sd == 0:
            return None, None, n_, sd
        snn = sum(a * a for a, _b in xs)
        sdd = sum(b * b for _a, b in xs)
        snd = sum(a * b for a, b in xs)
        pairs = n_ * (n_ - 1)
        vn = (n_ * snn - sn * sn) / pairs
        vd = (n_ * sdd - sd * sd) / pairs
        cv = (n_ * snd - sn * sd) / pairs
        rr = sn / sd
        dbar = sd / n_
        return rr, (vn - 2 * rr * cv + rr * rr * vd) / (n_ * dbar * dbar), n_, sd
    ra, va, na, sda = side(0)
    rb, vb, nb, sdb = side(1)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    if ra is None or rb is None or va + vb <= 0:
        assert r["z"] is None, f"case {case} ({shape})"
    else:
        import math
        assert r["z"] == pytest.approx(
            (ra - rb) / math.sqrt(va + vb), abs=2e-6
        ), f"case {case} ({shape})"
        assert r["ratio_a"] == pytest.approx(ra, abs=2e-6)
        assert r["diff"] == pytest.approx(ra - rb, abs=2e-6)


@pytest.mark.parametrize("case", range(5))
def test_fuzz_srm(spark, case):
    from datajudge_spark.operators.stats import sample_ratio_mismatch

    rng = random.Random(_MK_SEED + 1500 + case)
    shape = ["uniform", "skewed", "one_level", "two_exact", "many"][case]
    k = {"one_level": 1, "two_exact": 2, "many": 6}.get(shape, 3)
    weights = [rng.randint(1, 10) for _ in range(k)]
    rows = []
    for i, w in enumerate(weights):
        rows += [(f"v{i}",)] * (w * rng.randint(5, 40))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "v string")
    use_map = shape in ("skewed", "two_exact")
    shares = None
    if use_map:
        tot = sum(weights)
        shares = {f"v{i}": w / tot for i, w in enumerate(weights)}
        # renormalize float dust so the validator's sum check passes
        shares[f"v{k-1}"] = 1.0 - sum(
            shares[f"v{i}"] for i in range(k - 1)
        )
    r = sample_ratio_mismatch(df, "v", shares).collect()[0]

    from collections import Counter
    obs = Counter(v for (v,) in rows)
    n = sum(obs.values())
    chi2 = 0.0
    for lv in sorted(obs):
        p = shares[lv] if shares else 1.0 / len(obs)
        e = n * p
        chi2 += (obs[lv] - e) ** 2 / e
    assert r["n"] == n and r["n_levels"] == len(obs)
    assert r["chi2"] == pytest.approx(chi2, abs=2e-6), f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(5))
def test_fuzz_pettitt(spark, case):
    import datetime as dt
    import math

    from datajudge_spark.operators.timeseries import pettitt_changepoint

    rng = random.Random(_MK_SEED + 1600 + case)
    shape = ["shift", "flat", "ties", "two_days", "noise"][case]
    n = 2 if shape == "two_days" else rng.randint(10, 70)
    base = dt.date(2024, 1, 1)
    vals = []
    for i in range(n):
        if shape == "flat":
            vals.append(7)
        elif shape == "ties":
            vals.append(rng.randint(0, 2))
        else:
            vals.append(rng.randint(0, 30) + (40 if i > n // 2 else 0))
    rows = [(base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, total long")
    r = pettitt_changepoint(df).collect()[0]
    best_k, best_day = -1, None
    for t in range(n):
        u = sum(
            (vals[i] > vals[j]) - (vals[i] < vals[j])
            for i in range(t + 1) for j in range(t + 1, n)
        )
        if abs(u) > best_k:
            best_k, best_day = abs(u), rows[t][0]
    p = min(1.0, 2 * math.exp(-6 * best_k**2 / (n**3 + n**2)))
    assert r["n_days"] == n
    assert r["k_stat"] == best_k, f"case {case} ({shape})"
    assert r["change_day"] == best_day
    assert r["p_value"] == pytest.approx(round(p, 6), abs=1e-9)


@pytest.mark.parametrize("case", range(4))
def test_fuzz_dispersion(spark, case):
    from datajudge_spark.operators.stats import dispersion_index

    rng = random.Random(_MK_SEED + 1700 + case)
    shape = ["poisson_ish", "bursty", "constant", "zeros"][case]
    rows = []
    for i in range(rng.randint(10, 200)):
        g = f"g{i % 3}"
        if shape == "constant":
            c = 5
        elif shape == "zeros":
            c = 0
        elif shape == "bursty":
            c = 0 if rng.random() < 0.8 else rng.randint(50, 100)
        else:
            c = rng.randint(3, 9)
        rows.append((c, g))
    df = spark.createDataFrame(rows, "c long, g string")
    got = {
        r["g"]: r for r in dispersion_index(df, "c", group_col="g").collect()
    }
    groups: dict = {}
    for c, g in rows:
        groups.setdefault(g, []).append(c)
    for g, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        r = got[g]
        assert r["n"] == n
        assert r["mean"] == pytest.approx(mean, abs=2e-6)
        if n < 2:
            assert r["variance"] is None
            continue
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        assert r["variance"] == pytest.approx(var, abs=2e-6)
        if mean == 0:
            assert r["dispersion"] is None
        else:
            assert r["dispersion"] == pytest.approx(
                var / mean, abs=2e-6
            ), f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(4))
def test_fuzz_diff_in_diff(spark, case):
    import math

    from datajudge_spark.operators.stats import diff_in_diff

    rng = random.Random(_MK_SEED + 1800 + case)
    shape = ["mixed", "parallel", "tiny", "const_delta"][case]
    rows = []
    n = 5 if shape == "tiny" else rng.randint(20, 250)
    for i in range(n):
        v = i % 2
        pre = rng.randint(0, 200)
        if shape == "const_delta":
            post = pre + 7
        elif shape == "parallel":
            post = pre + rng.randint(0, 10)
        else:
            post = rng.randint(0, 300)
        rows.append((pre, post, v))
    df = spark.createDataFrame(rows, "pre long, post long, v int")
    r = diff_in_diff(df, "pre", "post", "v").collect()[0]

    def grp(v):
        xs = [(p, q) for p, q, vv in rows if vv == v]
        n_ = len(xs)
        ds = [q - p for p, q in xs]
        md = sum(ds) / n_
        var = (
            sum((d - md) ** 2 for d in ds) / (n_ - 1) if n_ >= 2 else None
        )
        return md, var, n_
    da, va, na = grp(0)
    db, vb, nb = grp(1)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["did"] == pytest.approx(da - db, abs=2e-6)
    if va is None or vb is None or va / na + vb / nb <= 0:
        assert r["se"] is None and r["z"] is None, f"case {case} ({shape})"
    else:
        se = math.sqrt(va / na + vb / nb)
        assert r["se"] == pytest.approx(se, abs=2e-6)
        assert r["z"] == pytest.approx((da - db) / se, abs=2e-6)


@pytest.mark.parametrize("case", range(3))
def test_fuzz_centroid_shift(spark, case):
    import math

    from datajudge_spark.pipeline.similarity import centroid_shift

    rng = random.Random(_MK_SEED + 1900 + case)
    k = [1, 2, 4][case]
    dim = rng.choice([3, 8])
    rows = [
        ([round(rng.uniform(-1, 1), 4) for _ in range(dim)], f"g{i % k}")
        for i in range(rng.randint(10, 120))
    ]
    df = spark.createDataFrame(rows, "v array<float>, g string")
    out = centroid_shift(df, "v", "g").collect()
    assert len(out) == k * (k - 1) // 2
    groups: dict = {}
    for v, g in rows:
        groups.setdefault(g, []).append(v)

    def centroid(g):
        vs = groups[g]
        return [
            sum(round(float(v[j]), 6) for v in vs) / len(vs)
            for j in range(dim)
        ]
    for r in out:
        ca, cb = centroid(r["grp_a"]), centroid(r["grp_b"])
        mmd2 = sum((x - y) ** 2 for x, y in zip(ca, cb))
        assert r["mmd2"] == pytest.approx(mmd2, abs=5e-5), f"case {case}"
        assert r["dist"] == pytest.approx(math.sqrt(mmd2), abs=5e-5)
        assert r["n_a"] == len(groups[r["grp_a"]])


@pytest.mark.parametrize("case", range(4))
def test_fuzz_join_explosion(spark, case):
    from collections import Counter

    from datajudge_spark.operators.skew import join_explosion_audit

    rng = random.Random(_MK_SEED + 2000 + case)
    shape = ["one_to_one", "hot_key", "disjoint", "mixed"][case]
    if shape == "one_to_one":
        kl = list(range(30)); kr = list(range(30))
    elif shape == "hot_key":
        kl = [7] * 40 + [1, 2, 3]; kr = [7] * 25 + [2, 9]
    elif shape == "disjoint":
        kl = [1, 2, 3]; kr = [4, 5, 6]
    else:
        kl = [rng.randint(0, 12) for _ in range(120)]
        kr = [rng.randint(0, 12) for _ in range(80)]
    l = spark.createDataFrame([(k,) for k in kl], "k long")
    r = spark.createDataFrame([(k,) for k in kr], "k long")
    row = join_explosion_audit(l, "k", r, "k").collect()[0]
    cl, cr = Counter(kl), Counter(kr)
    common = sorted(set(cl) & set(cr))
    prods = {k: cl[k] * cr[k] for k in common}
    assert row["n_keys"] == len(common), f"case {case} ({shape})"
    if not common:
        assert row["output_rows"] is None and row["max_fanout"] is None
        return
    assert row["output_rows"] == str(sum(prods.values()))
    assert row["max_fanout"] == str(max(prods.values()))
    assert row["n_fanout_keys"] == sum(
        1 for k in common if cl[k] > 1 and cr[k] > 1
    )
    want_top = ", ".join(
        f"{k}={p}"
        for k, p in sorted(prods.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert row["top_keys"] == want_top


# ---------------------------------------------------------------------------
# Round-9 (session 2) operator family: Welch t / Brown-Forsythe / CMH /
# BH-FDR / Nelson-Aalen / Durbin-Watson vs brute force, incl. degenerate
# shapes (single-unit sides, constant groups, empty strata, tiny series).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", range(5))
def test_fuzz_welch_ttest(spark, case):
    import math

    from datajudge_spark.operators.stats import welch_ttest

    rng = random.Random(_MK_SEED + 1600 + case)
    shape = ["mixed", "mixed", "tiny_side", "const_both", "big_gap"][case]
    rows = []
    n = rng.randint(20, 200)
    for i in range(n):
        v = i % 2
        if shape == "tiny_side" and v == 0 and i > 0:
            continue  # leave exactly one unit on side 0
        x = (
            42
            if shape == "const_both"
            else rng.randint(0, 50) + (500 if shape == "big_gap" and v else 0)
        )
        rows.append((x, v))
    df = spark.createDataFrame(rows, "x long, v int")
    r = welch_ttest(df, "x", "v").collect()[0]

    def side(v):
        xs = [x for x, vv in rows if vv == v]
        if len(xs) < 2:
            return len(xs), (sum(xs) / len(xs) if xs else None), None
        m = sum(xs) / len(xs)
        var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
        return len(xs), m, var
    na, ma, va = side(0)
    nb, mb, vb = side(1)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    if va is None or vb is None or va / na + vb / nb <= 0:
        assert r["t"] is None, f"case {case} ({shape})"
    else:
        ta, tb = va / na, vb / nb
        t = (ma - mb) / math.sqrt(ta + tb)
        dfw = (ta + tb) ** 2 / (ta * ta / (na - 1) + tb * tb / (nb - 1))
        assert r["t"] == pytest.approx(t, abs=2e-6), f"case {case}"
        assert r["df"] == pytest.approx(dfw, abs=2e-6), f"case {case}"


@pytest.mark.parametrize("case", range(5))
def test_fuzz_brown_forsythe(spark, case):
    from datajudge_spark.operators.stats import brown_forsythe

    rng = random.Random(_MK_SEED + 1700 + case)
    shape = ["mixed", "mixed", "one_group", "const_groups", "skew"][case]
    k = 1 if shape == "one_group" else rng.randint(2, 6)
    rows = []
    for i in range(rng.randint(30, 250)):
        g = "g" + str(i % k)
        x = (
            7
            if shape == "const_groups"
            else rng.randint(0, 60) * (1 + (i % k) * (3 if shape == "skew" else 0))
        )
        rows.append((g, x))
    df = spark.createDataFrame(rows, "g string, x long")
    r = brown_forsythe(df, "x", "g").collect()[0]

    def med(v):
        s = sorted(v)
        n = len(s)
        return (s[(n - 1) // 2] + s[n // 2]) / 2
    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    zs = {g: [abs(x - med(v)) for x in v] for g, v in groups.items()}
    N = sum(len(v) for v in zs.values())
    kk = len(zs)
    assert (r["n"], r["n_groups"]) == (N, kk)
    means = {g: sum(v) / len(v) for g, v in zs.items()}
    zbar = sum(sum(v) for v in zs.values()) / N
    ssw = sum(sum((x - means[g]) ** 2 for x in v) for g, v in zs.items())
    if kk < 2 or N <= kk or ssw <= 0:
        assert r["f_stat"] is None, f"case {case} ({shape})"
    else:
        ssb = sum(len(v) * (means[g] - zbar) ** 2 for g, v in zs.items())
        f = (ssb / (kk - 1)) / (ssw / (N - kk))
        assert r["f_stat"] == pytest.approx(f, abs=2e-5), f"case {case}"


@pytest.mark.parametrize("case", range(5))
def test_fuzz_cmh(spark, case):
    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import cmh_test

    rng = random.Random(_MK_SEED + 1800 + case)
    shape = ["mixed", "mixed", "tiny_strata", "all_expose", "no_outcome"][case]
    rows = []
    k = rng.randint(2, 6)
    n = 8 if shape == "tiny_strata" else rng.randint(40, 300)
    for i in range(n):
        s = "s" + str(i % k)
        e = True if shape == "all_expose" else rng.random() < 0.5
        o = False if shape == "no_outcome" else rng.random() < 0.4
        rows.append((s, e, o))
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    r = cmh_test(df, "s", F.col("e"), F.col("o")).collect()[0]
    strata = {}
    for s, e, o in rows:
        strata.setdefault(s, []).append((e, o))
    sa = se_ = sv = orn = ord_ = 0.0
    for s, sub in strata.items():
        T = len(sub)
        a = sum(1 for e, o in sub if e and o)
        n1 = sum(1 for e, o in sub if e)
        m1 = sum(1 for e, o in sub if o)
        sa += a
        se_ += n1 * m1 / T
        if T > 1:
            sv += n1 * (T - n1) * m1 * (T - m1) / (T * T * (T - 1))
        orn += a * (T - n1 - m1 + a) / T
        ord_ += (n1 - a) * (m1 - a) / T
    assert r["n"] == len(rows) and r["n_strata"] == len(strata)
    assert r["exposed_outcome"] == int(sa)
    if sv > 0:
        assert r["chi2"] == pytest.approx((sa - se_) ** 2 / sv, abs=2e-5)
    else:
        assert r["chi2"] is None, f"case {case} ({shape})"
    if ord_ > 0:
        assert r["or_mh"] == pytest.approx(orn / ord_, abs=2e-5)
    else:
        assert r["or_mh"] is None, f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(4))
def test_fuzz_grouped_ztest_bh(spark, case):
    import math

    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import grouped_ztest_bh

    rng = random.Random(_MK_SEED + 1900 + case)
    shape = ["mixed", "mixed", "one_degenerate", "two_groups"][case]
    k = 2 if shape == "two_groups" else rng.randint(3, 10)
    rows = []
    for i in range(rng.randint(200, 800)):
        g = "g" + str(i % k)
        a = rng.random() < 0.5
        if shape == "one_degenerate" and g == "g0":
            o = False  # zero successes -> untestable group
        else:
            o = rng.random() < 0.35
        rows.append((g, a, o))
    df = spark.createDataFrame(rows, "g string, a boolean, o boolean")
    out = {
        r["group"]: r
        for r in grouped_ztest_bh(
            df, "g", F.col("a"), ~F.col("a"), F.col("o")
        ).collect()
    }
    byg = {}
    for g, a, o in rows:
        byg.setdefault(g, []).append((a, o))
    ps = {}
    for g, sub in byg.items():
        na = sum(1 for a, o in sub if a)
        nb = len(sub) - na
        s_a = sum(1 for a, o in sub if a and o)
        s_b = sum(1 for a, o in sub if not a and o)
        if na == 0 or nb == 0 or s_a + s_b == 0 or s_a + s_b == na + nb:
            continue
        pool = (s_a + s_b) / (na + nb)
        var = pool * (1 - pool) * (1 / na + 1 / nb)
        z = (s_a / na - s_b / nb) / math.sqrt(var)
        u = abs(z) / math.sqrt(2)
        t = 1 / (1 + 0.3275911 * u)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429))))
        ps[g] = (z, poly * math.exp(-u * u))
    assert set(out) == set(ps), f"case {case} ({shape})"
    m = len(ps)
    order = sorted(ps.items(), key=lambda kv: (kv[1][1], kv[0]))
    suffix = 1.0
    qs = {}
    for i in range(m - 1, -1, -1):
        g, (z, p) = order[i]
        suffix = min(suffix, p * m / (i + 1))
        qs[g] = min(suffix, 1.0)
    for g in ps:
        assert out[g]["p_value"] == pytest.approx(ps[g][1], abs=2e-6)
        assert out[g]["q_value"] == pytest.approx(qs[g], abs=2e-6)


@pytest.mark.parametrize("case", range(4))
def test_fuzz_nelson_aalen(spark, case):
    from datajudge_spark.operators.timeseries import nelson_aalen

    rng = random.Random(_MK_SEED + 2000 + case)
    shape = ["mixed", "all_events", "all_censored", "single_dur"][case]
    rows = []
    for i in range(rng.randint(20, 300)):
        dur = 5 if shape == "single_dur" else rng.randint(0, 15)
        ev = (
            1
            if shape == "all_events"
            else 0
            if shape == "all_censored"
            else rng.randint(0, 1)
        )
        rows.append((dur, ev))
    df = spark.createDataFrame(rows, "dur int, ev int")
    got = {r["duration"]: r for r in nelson_aalen(df, "dur", "ev").collect()}
    durs = sorted(set(d for d, _ in rows))
    H = V = 0.0
    for t in durs:
        nr = sum(1 for d, _ in rows if d >= t)
        de = sum(1 for d, e in rows if d == t and e == 1)
        H += de / nr
        V += de / (nr * nr)
        r = got[t]
        assert r["n_risk"] == nr and r["n_events"] == de
        assert r["cumhaz"] == pytest.approx(H, abs=2e-6)
        assert r["var_cumhaz"] == pytest.approx(V, abs=2e-6)


@pytest.mark.parametrize("case", range(4))
def test_fuzz_durbin_watson(spark, case):
    from datajudge_spark.operators.timeseries import durbin_watson

    rng = random.Random(_MK_SEED + 2100 + case)
    shape = ["noise", "trend", "tiny", "constant"][case]
    n = 2 if shape == "tiny" else rng.randint(10, 120)
    rows = []
    for t in range(n):
        y = (
            777
            if shape == "constant"
            else 100 + (7 * t if shape == "trend" else 0) + rng.randint(-20, 20)
        )
        rows.append((t, y))
    df = spark.createDataFrame(rows, "t int, y long")
    out = durbin_watson(df, "t", "y").collect()
    r = out[0]
    if n < 3:
        assert r["dw"] is None and r["slope"] is None
        return
    st = sum(t for t, _ in rows)
    sy = sum(y for _, y in rows)
    sty = sum(t * y for t, y in rows)
    stt = sum(t * t for t, _ in rows)
    b1 = (n * sty - st * sy) / (n * stt - st * st)
    b0 = (sy - b1 * st) / n
    es = [y - (b0 + b1 * t) for t, y in rows]
    den = sum(e * e for e in es)
    assert r["slope"] == pytest.approx(b1, abs=2e-6)
    if den > 0:
        dw = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n)) / den
        assert r["dw"] == pytest.approx(dw, abs=2e-6)
    else:
        assert r["dw"] is None, f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(5))
def test_fuzz_kruskal_wallis(spark, case):
    from itertools import groupby as _groupby

    from datajudge_spark.operators.stats import kruskal_wallis

    rng = random.Random(_MK_SEED + 2200 + case)
    shape = ["mixed", "mixed", "heavy_ties", "one_group", "all_tied"][case]
    k = 1 if shape == "one_group" else rng.randint(2, 6)
    rows = []
    for i in range(rng.randint(30, 400)):
        g = "g" + str(i % k)
        if shape == "all_tied":
            x = 7
        elif shape == "heavy_ties":
            x = rng.randint(0, 4)
        else:
            x = rng.randint(0, 80) + (i % k) * rng.randint(0, 10)
        rows.append((g, x))
    df = spark.createDataFrame(rows, "g string, x long")
    r = kruskal_wallis(df, "x", "g").collect()[0]
    xs = sorted(x for _, x in rows)
    N = len(xs)
    rank = {}
    pos = 1
    ties = 0
    for v, grp in _groupby(xs):
        t = len(list(grp))
        rank[v] = pos + (t - 1) / 2
        pos += t
        ties += t ** 3 - t
    byg = {}
    for g, x in rows:
        byg.setdefault(g, []).append(x)
    kk = len(byg)
    assert (r["n"], r["n_groups"]) == (N, kk)
    if kk < 2 or N <= kk:
        assert r["h"] is None and r["h_adj"] is None
        return
    H = 12 / (N * (N + 1)) * sum(
        (sum(rank[x] for x in v)) ** 2 / len(v) for v in byg.values()
    ) - 3 * (N + 1)
    assert r["h"] == pytest.approx(H, abs=2e-5), f"case {case} ({shape})"
    C = 1 - ties / (N ** 3 - N)
    if C > 0:
        assert r["h_adj"] == pytest.approx(H / C, abs=2e-5)
    else:
        assert r["h_adj"] is None, f"case {case} ({shape})"


@pytest.mark.parametrize("case", range(4))
def test_fuzz_chao1(spark, case):
    from datajudge_spark.operators.uniques import chao1_richness

    rng = random.Random(_MK_SEED + 2300 + case)
    shape = ["mixed", "all_singletons", "all_repeated", "empty"][case]
    if shape == "empty":
        rows = [(None,)]
    elif shape == "all_singletons":
        rows = [(i,) for i in range(rng.randint(5, 60))]
    elif shape == "all_repeated":
        rows = [(i % 10,) for i in range(100)]
    else:
        rows = [(rng.randint(0, 40),) for _ in range(rng.randint(20, 300))]
    df = spark.createDataFrame(rows, "v bigint")
    r = chao1_richness(df, "v").collect()[0]
    vals = [v for (v,) in rows if v is not None]
    from collections import Counter

    c = Counter(vals)
    n, d = len(vals), len(c)
    f1 = sum(1 for k in c.values() if k == 1)
    f2 = sum(1 for k in c.values() if k == 2)
    assert (r["n"], r["d_obs"], r["f1"], r["f2"]) == (n, d, f1, f2)
    if f2 > 0:
        chao = d + f1 * f1 / (2 * f2)
    else:
        chao = d + f1 * (f1 - 1) / (2 * (f2 + 1))
    assert r["chao1"] == pytest.approx(chao, abs=1e-6)
    if n > 0:
        assert r["unseen_mass"] == pytest.approx(f1 / n, abs=1e-6)
    else:
        assert r["unseen_mass"] is None


@pytest.mark.parametrize("case", range(4))
def test_fuzz_rmst(spark, case):
    from datajudge_spark.operators.timeseries import rmst

    rng = random.Random(_MK_SEED + 2400 + case)
    shape = ["mixed", "tau_inside", "tau_beyond", "all_censored"][case]
    rows = [
        (rng.randint(0, 15), 0 if shape == "all_censored" else rng.randint(0, 1))
        for _ in range(rng.randint(10, 200))
    ]
    tau = {"mixed": 8.0, "tau_inside": 3.5, "tau_beyond": 40.0,
           "all_censored": 10.0}[shape]
    df = spark.createDataFrame(rows, "dur int, ev int")
    r = rmst(df, "dur", "ev", tau).collect()[0]
    durs = sorted(set(d for d, _ in rows))
    S, area, prev_d, prev_s = 1.0, 0.0, 0.0, 1.0
    for t in durs:
        nr = sum(1 for d, _ in rows if d >= t)
        de = sum(1 for d, e in rows if d == t and e == 1)
        area += prev_s * (min(t, tau) - min(prev_d, tau))
        S = S * (1 - de / nr) if de < nr else 0.0
        prev_d, prev_s = t, S
    area += prev_s * (tau - min(prev_d, tau))
    assert r["n_durations"] == len(durs)
    assert r["rmst"] == pytest.approx(area, abs=2e-5), f"case {case}"


@pytest.mark.parametrize("case", range(4))
def test_fuzz_sequence_monotonicity(spark, case):
    from datajudge_spark.operators.rows import sequence_monotonicity

    rng = random.Random(_MK_SEED + 2500 + case)
    shape = ["mixed", "sorted", "ties", "single_key"][case]
    rows = []
    n_keys = 1 if shape == "single_key" else rng.randint(2, 8)
    for k in range(n_keys):
        v = 0
        for t in range(rng.randint(2, 60)):
            if shape == "sorted":
                v += rng.randint(0, 4)
            elif shape == "ties":
                v = rng.randint(0, 3)
                t = t // 3  # repeated order values
            else:
                v += rng.randint(-3, 5)
            rows.append((k, t, v))
    df = spark.createDataFrame(rows, "k int, t int, v long")
    strict = case % 2 == 1
    r = sequence_monotonicity(df, "k", "t", "v", strict=strict).collect()[0]
    import collections

    byk = collections.defaultdict(list)
    for k, t, v in rows:
        byk[k].append((t, v))
    nv = np_ = 0
    per = collections.Counter()
    for k, seq in byk.items():
        seq.sort()
        for i in range(1, len(seq)):
            np_ += 1
            bad = (
                seq[i][1] <= seq[i - 1][1]
                if strict
                else seq[i][1] < seq[i - 1][1]
            )
            if bad:
                nv += 1
                per[k] += 1
    top = ", ".join(
        f"{k}={c}"
        for k, c in sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert (r["n_keys"], r["n_pairs"], r["n_violations"]) == (
        len(byk), np_, nv,
    ), f"case {case} ({shape})"
    assert r["top_keys"] == top


@pytest.mark.parametrize("case", range(3))
def test_fuzz_forecast_backtest(spark, case):
    import datetime as dt

    from datajudge_spark.operators.timeseries import forecast_backtest

    rng = random.Random(_MK_SEED + 2600 + case)
    shape = ["weekly", "gappy", "short"][case]
    d0 = dt.date(2024, 1, 1)
    n = 10 if shape == "short" else rng.randint(40, 120)
    rows = []
    for i in range(n):
        if shape == "gappy" and rng.random() < 0.25:
            continue  # missing days: lookup misses shrink the test set
        rows.append(
            (d0 + dt.timedelta(days=i),
             100 + 30 * (i % 7) + rng.randint(-5, 5))
        )
    df = spark.createDataFrame(rows, "day date, v long")
    horizon, period = 14, 7
    out = forecast_backtest(df, "day", "v", horizon, period).collect()
    byd = dict(rows)
    days = sorted(byd)
    cut = days[-1] - dt.timedelta(days=horizon)
    test = [d for d in days if d > cut]
    train = [d for d in days if d <= cut]
    errs, apes = [], []
    for d in test:
        # train-only multi-step seasonal naive: step back whole
        # periods to at-or-before the cut (no holdout leakage)
        kk = ((d - cut).days + period - 1) // period
        pd_ = d - dt.timedelta(days=period * kk)
        assert pd_ <= cut
        p = byd.get(pd_)
        if p is None:
            continue
        e = abs(byd[d] - p)
        errs.append(e)
        if byd[d] != 0:
            apes.append(e / abs(byd[d]))
    if not errs:
        assert out == [] or out[0]["n_test"] == 0
        return
    r = out[0]
    ins = [
        abs(byd[d] - byd[d - dt.timedelta(days=period)])
        for d in train
        if (d - dt.timedelta(days=period)) in byd
    ]
    assert (r["n_train"], r["n_test"]) == (len(train), len(errs))
    assert r["mae"] == pytest.approx(sum(errs) / len(errs), abs=2e-6)
    if apes:
        assert r["mape_pct"] == pytest.approx(
            sum(apes) / len(apes) * 100, abs=2e-4
        )
    if ins and sum(ins) > 0:
        nm = sum(ins) / len(ins)
        assert r["naive_mae"] == pytest.approx(nm, abs=2e-6)
        assert r["mase"] == pytest.approx(
            (sum(errs) / len(errs)) / nm, abs=2e-5
        )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_grouped_welch_bh(spark, case):
    """Differential model: per-group Welch t with the EXACT scipy-free
    Student tail (constraints.stats._student_t_sf_two_sided — incomplete
    beta) and a driver-side BH step-up; the in-plan p/q must match to
    1e-6 even at n ≈ 5 per side (VERDICT r9 #5 'small_n' cases 4-5)."""
    import math

    from pyspark.sql import functions as F

    from datajudge_spark.constraints.stats import _student_t_sf_two_sided
    from datajudge_spark.operators.stats import grouped_welch_bh

    rng = random.Random(_MK_SEED + 2700 + case)
    shape = [
        "mixed", "one_constant", "tiny_sides", "two_groups",
        "small_n", "small_n",
    ][case]
    k = 2 if shape == "two_groups" else rng.randint(3, 8)
    rows = []
    if shape == "small_n":
        # n ≈ 5 per side per segment: exactly where the old normal
        # approximation was visibly wrong (df ≈ 8 -> p off by ~1e-2)
        k = rng.randint(4, 10)
        for g_i in range(k):
            g = "g" + str(g_i)
            for a in (True, False):
                for _ in range(rng.randint(4, 6)):
                    x = rng.randint(0, 40) + (
                        12 if (a and g_i % 3 == 0) else 0
                    )
                    rows.append((g, a, x))
    else:
        for i in range(rng.randint(100, 600)):
            g = "g" + str(i % k)
            a = rng.random() < 0.5
            if shape == "one_constant" and g == "g0":
                x = 7  # zero variance both sides -> excluded
            elif shape == "tiny_sides" and g == "g1" and i > 2 * k:
                continue  # g1 keeps almost no rows
            else:
                x = rng.randint(0, 80) + (15 if (a and g == "g2") else 0)
            rows.append((g, a, x))
    df = spark.createDataFrame(rows, "g string, a boolean, x long")
    out = {
        r["group"]: r
        for r in grouped_welch_bh(
            df, "g", "x", F.col("a"), ~F.col("a")
        ).collect()
    }
    import collections

    byg = collections.defaultdict(list)
    for g, a, x in rows:
        byg[g].append((a, x))
    ps = {}
    for g, sub in byg.items():
        xa = [x for a, x in sub if a]
        xb = [x for a, x in sub if not a]
        if len(xa) < 2 or len(xb) < 2:
            continue
        ma, mb = sum(xa) / len(xa), sum(xb) / len(xb)
        va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
        vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
        ta, tb = va / len(xa), vb / len(xb)
        if ta + tb <= 0:
            continue
        t = (ma - mb) / math.sqrt(ta + tb)
        df_ws = (ta + tb) ** 2 / (
            ta * ta / (len(xa) - 1) + tb * tb / (len(xb) - 1)
        )
        ps[g] = (t, _student_t_sf_two_sided(t, df_ws))
    assert set(out) == set(ps), f"case {case} ({shape})"
    m = len(ps)
    order = sorted(ps.items(), key=lambda kv: (kv[1][1], kv[0]))
    suffix = 1.0
    qs = {}
    for i in range(m - 1, -1, -1):
        g, (t, p) = order[i]
        suffix = min(suffix, p * m / (i + 1))
        qs[g] = min(suffix, 1.0)
    for g in ps:
        assert out[g]["t"] == pytest.approx(ps[g][0], abs=2e-6)
        assert out[g]["p_value"] == pytest.approx(ps[g][1], abs=1e-6)
        assert out[g]["q_value"] == pytest.approx(qs[g], abs=1e-6)


# ---------------------------------------------------------------------------
# Round-11 experimentation FACTORIES (add_cox_score /
# add_sequential_ztest / add_qte): gate decision must agree with a
# driver-side model on randomized frames including degenerate shapes
# (all-censored, constant covariate, empty looks, one-sided variants) —
# and must never crash.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", range(6))
def test_fuzz_cox_factory(spark, case):
    rng = random.Random(_MK_SEED + 1300 + case)
    shape = [
        "all_censored", "constant_covariate", "tied_grid",
        "mixed", "mixed", "single_duration",
    ][case]
    rows = []
    n = rng.randint(6, 120)
    for _i in range(n):
        ev = 0 if shape == "all_censored" else rng.randint(0, 1)
        x = 7 if shape == "constant_covariate" else rng.randint(0, 500)
        dur = 3 if shape == "single_duration" else rng.randint(
            1, 4 if shape == "tied_grid" else 30
        )
        rows.append((dur, ev, x))
    req = _exp_factory_req(
        spark, rows, "dur int, ev int, x long", f"cox{case}"
    )
    threshold = rng.choice([0.0, 3.84, 1e9])
    req.add_cox_score_constraint("dur", "ev", "x", threshold)
    result = req.test(spark)[0]

    times = sorted({d for d, e, _x in rows if e == 1})
    if not times:
        assert result.outcome is True, f"case {case}: no events must pass"
        return
    u = info = 0.0
    for t in times:
        risk = [x for d, _e, x in rows if d >= t]
        nn, s1 = len(risk), sum(risk)
        s2 = sum(v * v for v in risk)
        d = sum(1 for dd, e, _x in rows if dd == t and e)
        sxe = sum(x for dd, e, x in rows if dd == t and e)
        u += sxe - d * (s1 / nn)
        info += d * (s2 / nn - (s1 / nn) ** 2)
    if info <= 0:
        assert result.outcome is True, f"case {case}: zero info must pass"
        return
    chi2 = u * u / info
    if abs(chi2 - threshold) > 1e-3:
        assert result.outcome == (chi2 <= threshold), (
            f"case {case} ({shape}): chi2={chi2} thr={threshold}"
        )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_obf_factory(spark, case):
    from datajudge_spark import Condition
    from datajudge_spark.operators.stats import norm_ppf

    rng = random.Random(_MK_SEED + 1400 + case)
    shape = [
        "one_look", "one_sided", "all_convert", "mixed", "mixed", "sparse",
    ][case]
    rows = []
    n_looks = 1 if shape == "one_look" else rng.randint(2, 8)
    for look in range(1, n_looks + 1):
        m = rng.randint(0, 10) if shape == "sparse" else rng.randint(5, 60)
        for _ in range(m):
            g = 0 if shape == "one_sided" else rng.randint(0, 1)
            conv = 1 if shape == "all_convert" else (
                1 if rng.random() < rng.choice([0.1, 0.5]) else 0
            )
            rows.append((look, g, conv))
    if not rows:
        rows = [(1, 0, 1)]
    req = _exp_factory_req(
        spark, rows, "look int, grp int, conv int", f"obf{case}"
    )
    allowed = rng.choice([0, 1])
    req.add_sequential_ztest_constraint(
        "look",
        Condition(raw_string="grp = 0"),
        Condition(raw_string="grp = 1"),
        Condition(raw_string="conv = 1"),
        max_crossed_looks=allowed,
    )
    result = req.test(spark)[0]

    c = norm_ppf(0.975)
    tot = len(rows)
    crossings = 0
    for lk in sorted({r[0] for r in rows}):
        upto = [r for r in rows if r[0] <= lk]
        na = sum(1 for l, g, _c2 in upto if g == 0)
        sa = sum(1 for l, g, c2 in upto if g == 0 and c2)
        nb = sum(1 for l, g, _c2 in upto if g == 1)
        sb = sum(1 for l, g, c2 in upto if g == 1 and c2)
        if not na or not nb:
            continue
        p = (sa + sb) / (na + nb)
        var = p * (1 - p) * (1 / na + 1 / nb)
        if var <= 0:
            continue
        z = (sa / na - sb / nb) / var ** 0.5
        b = c / ((na + nb) / tot) ** 0.5
        if abs(abs(z) - b) < 1e-9:
            return  # knife-edge: skip the decision assert
        if abs(z) >= b:
            crossings += 1
    assert result.outcome == (crossings <= allowed), (
        f"case {case} ({shape}): crossings={crossings} allowed={allowed}"
    )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_qte_factory(spark, case):
    rng = random.Random(_MK_SEED + 1500 + case)
    shape = [
        "three_levels", "heavy_ties", "shifted", "mixed", "mixed",
        "tiny",
    ][case]
    rows = []
    n = 6 if shape == "tiny" else rng.randint(20, 200)
    levels = 3 if shape == "three_levels" else 2
    for i in range(n):
        g = i % levels
        v = float(
            rng.randint(0, 5 if shape == "heavy_ties" else 50)
            + (9 if shape == "shifted" and g == 1 else 0)
        )
        rows.append((g, v))
    req = _exp_factory_req(spark, rows, "grp int, v double", f"qte{case}")
    threshold = rng.choice([0.0, 5.0, 1e9])
    req.add_qte_constraint("v", "grp", max_abs_qte=threshold)
    result = req.test(spark)[0]

    if levels != 2:
        assert result.outcome is False
        assert "undefined" in result.failure_message
        return
    a = sorted(v for g, v in rows if g == 0)
    b = sorted(v for g, v in rows if g == 1)

    def q(vals, j):
        nn = len(vals)
        for i, v in enumerate(vals, start=1):
            if 10 * i >= j * nn:
                return v
        return None

    worst = max(abs(q(b, j) - q(a, j)) for j in range(1, 10))
    if abs(worst - threshold) > 1e-9:
        assert result.outcome == (worst <= threshold), (
            f"case {case} ({shape}): worst={worst} thr={threshold}"
        )


@pytest.mark.parametrize("case", range(5))
def test_fuzz_avi_sequential(spark, case):
    import math

    from pyspark.sql import functions as F

    from datajudge_spark.operators.stats import (
        avi_sequential_ztest,
        sequential_look_counts,
    )

    rng = random.Random(_MK_SEED + 980 + case)
    n_looks = rng.randint(1, 8)
    phi = rng.choice([None, 0.003, 0.05])
    rows = []
    for look in range(1, n_looks + 1):
        for _ in range(rng.randint(0, 60)):
            rows.append(
                (look, rng.randint(0, 1),
                 1 if rng.random() < rng.choice([0.0, 0.4, 1.0]) else 0)
            )
    if not rows:
        rows = [(1, 0, 1), (1, 1, 0)]
    df = spark.createDataFrame(rows, "look int, grp int, conv int")
    looks = sequential_look_counts(
        df, "look", F.col("grp") == 0, F.col("grp") == 1,
        F.col("conv") == 1,
    )
    out = {
        r["look"]: r
        for r in avi_sequential_ztest(looks, phi=phi).collect()
    }
    present = sorted({lk for lk, _g, _c in rows})
    assert set(out) == set(present)

    # driver-side model: cumulative counts -> theta/v -> mixture LR ->
    # running max -> p; phi default = first valid look's variance
    stats = []
    for lk in present:
        upto = [r for r in rows if r[0] <= lk]
        na = sum(1 for l, g, _c2 in upto if g == 0)
        sa = sum(1 for l, g, c2 in upto if g == 0 and c2)
        nb = sum(1 for l, g, _c2 in upto if g == 1)
        sb = sum(1 for l, g, c2 in upto if g == 1 and c2)
        th = v = None
        if na and nb:
            p = (sa + sb) / (na + nb)
            vv = p * (1 - p) * (1 / na + 1 / nb)
            if vv > 0:
                th, v = sa / na - sb / nb, vv
        stats.append((lk, th, v))
    phi_val = phi
    if phi_val is None:
        valid = [v for _lk, _th, v in stats if v is not None]
        phi_val = valid[0] if valid else 1.0
    run_max = None
    for lk, th, v in stats:
        lr = None
        if v is not None:
            lr = math.sqrt(v / (v + phi_val)) * math.exp(
                th * th * phi_val / (2 * v * (v + phi_val))
            )
            run_max = lr if run_max is None else max(run_max, lr)
        r = out[lk]
        if lr is None:
            assert r["lr"] is None
        else:
            assert r["lr"] == pytest.approx(lr, rel=1e-4), f"case {case}"
        if run_max is None:
            assert r["p_always_valid"] is None
        else:
            assert r["p_always_valid"] == pytest.approx(
                min(1.0, 1.0 / run_max), abs=2e-6
            ), f"case {case}"
        # always-valid p never increases over looks (once defined)
    ps = [out[lk]["p_always_valid"] for lk in present
          if out[lk]["p_always_valid"] is not None]
    assert all(b <= a + 1e-9 for a, b in zip(ps, ps[1:]))
