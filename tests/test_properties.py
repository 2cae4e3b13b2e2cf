"""Property-based equivalence tests (hypothesis) — an addition over the
reference's test strategy (SURVEY §5: the reference has none).

Each property checks a custom operator against an independent
implementation on randomized inputs: asof_join vs pandas.merge_asof,
sessionize vs a naive driver-side sweep, duplicate_clusters vs BFS.
Example counts are kept small: every example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 1)


def _events_strategy():
    # (key, minutes-offset) pairs; duplicates and ties included on purpose
    return st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    )


class TestAsofJoinProperty:
    @given(
        left=_events_strategy(),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 10**6)),
            min_size=0,
            max_size=40,
        ),
    )
    @settings(**SETTINGS)
    def test_matches_pandas_merge_asof(self, spark, left, right):
        from datajudge_spark.operators.asof import asof_join

        # pandas merge_asof requires unique right (key, time); dedup to
        # max payload like the headline query does
        rdf = (
            pd.DataFrame(right, columns=["k", "m", "payload"])
            .groupby(["k", "m"], as_index=False)["payload"].max()
        )
        ldf = pd.DataFrame(left, columns=["k", "m"])
        ldf["lid"] = range(len(ldf))
        ldf["t"] = ldf["m"].map(lambda m: _BASE + dt.timedelta(minutes=int(m)))
        rdf["t"] = rdf["m"].map(lambda m: _BASE + dt.timedelta(minutes=int(m)))

        sl = spark.createDataFrame(ldf[["lid", "k", "t"]])
        sr = (
            spark.createDataFrame(rdf[["k", "t", "payload"]])
            if len(rdf)
            else spark.createDataFrame([], "k long, t timestamp, payload long")
        )
        got = {
            r.lid: r.payload
            for r in asof_join(
                sl, sr, on="k", left_time="t", right_time="t",
                payload_cols=["payload"],
            ).collect()
        }

        if len(rdf) == 0:
            expected = {int(lid): None for lid in ldf["lid"]}
        else:
            expected_df = pd.merge_asof(
                ldf.sort_values(["t", "lid"]),
                rdf.sort_values("t"),
                on="t",
                by="k",
                direction="backward",
                allow_exact_matches=True,
            )
            expected = {
                int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
                for r in expected_df.itertuples()
            }
        assert got == expected


class TestSessionizeProperty:
    @given(events=_events_strategy())
    @settings(**SETTINGS)
    def test_matches_naive_sweep(self, spark, events):
        from datajudge_spark.operators.sessions import sessionize

        rows = [
            Row(k=k, t=_BASE + dt.timedelta(minutes=m)) for k, m in events
        ]
        out = sessionize(spark.createDataFrame(rows), "k", "t", "30 minutes")
        got = sorted((r.k, r.t, r.session_id) for r in out.collect())

        # naive: sort per key, new session when gap > 30 min; ties on the
        # timestamp share the lag semantics (gap 0 -> same session)
        expected = []
        by_key: dict[int, list[dt.datetime]] = {}
        for k, m in events:
            by_key.setdefault(k, []).append(_BASE + dt.timedelta(minutes=m))
        for k, ts in by_key.items():
            sid = 0
            prev = None
            for t in sorted(ts):
                if prev is None or (t - prev) > dt.timedelta(minutes=30):
                    sid += 1
                expected.append((k, t, sid))
                prev = t
        assert got == sorted(expected)


class TestClustersProperty:
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 25), st.integers(0, 25)),
            min_size=1,
            max_size=40,
        ).filter(lambda es: any(a != b for a, b in es)),
        threshold=st.sampled_from([0, 10**6]),
    )
    @settings(**SETTINGS)
    def test_matches_bfs(self, spark, edges, threshold):
        from datajudge_spark.pipeline import dedup

        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(
            [Row(d1=a, d2=b) for a, b in edges]
        )
        got = {
            r.doc_id: r.cluster_id
            for r in dedup.duplicate_clusters(
                pairs, local_threshold=threshold
            ).collect()
        }

        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expected = {}
        for start in adj:
            if start in expected:
                continue
            comp, frontier = {start}, [start]
            while frontier:
                n = frontier.pop()
                for nb in adj[n]:
                    if nb not in comp:
                        comp.add(nb)
                        frontier.append(nb)
            root = min(comp)
            for n in comp:
                expected[n] = root
        assert got == expected


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestRepetitionFoldProperty:
    @given(
        docs=st.lists(
            st.lists(st.sampled_from("abcx"), min_size=0, max_size=30),
            min_size=1,
            max_size=8,
        )
    )
    @settings(**SETTINGS)
    def test_fold_matches_counter(self, spark, docs):
        """The sorted-run fold equals an independent Counter-based
        most-frequent-bigram computation on random token streams."""
        from collections import Counter

        from datajudge_spark.pipeline.text import repetition_signals

        rows = [Row(doc_id=i, text=" ".join(toks))
                for i, toks in enumerate(docs)]
        out = {r.doc_id: r for r in
               repetition_signals(
                   spark.createDataFrame(rows), "doc_id", "text").collect()}
        for i, toks in enumerate(docs):
            # tokens('') -> [''] — mirror the engine's tokenizer
            eff = toks if toks else [""]
            bigrams = [" ".join(eff[j:j + 2]) for j in range(len(eff) - 1)]
            expected = (
                round(Counter(bigrams).most_common(1)[0][1] / len(bigrams), 6)
                if bigrams else 0.0
            )
            assert out[i].top_bigram_fraction == expected, (i, toks)
            assert out[i].n_tokens == len(eff)
            assert out[i].dup_token_fraction == round(
                1.0 - len(set(eff)) / len(eff), 6
            )


class TestPsiProperty:
    @given(
        vals=st.lists(
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
            min_size=5, max_size=40,
        )
    )
    @settings(**SETTINGS)
    def test_identical_populations_zero_and_matches_numpy(self, spark, vals):
        import math

        from datajudge_spark.operators.stats import psi_drift

        df = spark.createDataFrame([(v,) for v in vals], "v double")
        assert psi_drift(df, df, "v", 0.0, 100.0, 5).collect()[0].psi == 0.0

        # against an independent driver-side computation on a shifted copy
        shifted = [min(v + 17.0, 100.0) for v in vals]
        df2 = spark.createDataFrame([(v,) for v in shifted], "v double")
        got = psi_drift(df, df2, "v", 0.0, 100.0, 5).collect()[0].psi

        def bucket(v):
            return min(max(int(math.floor(v / 20.0)), 0), 4)

        c1, c2 = {}, {}
        for v in vals:
            c1[bucket(v)] = c1.get(bucket(v), 0) + 1
        for v in shifted:
            c2[bucket(v)] = c2.get(bucket(v), 0) + 1
        t1, t2 = len(vals) + 2.5, len(shifted) + 2.5
        expect = 0.0
        for b in range(5):
            if c1.get(b, 0) == 0 and c2.get(b, 0) == 0:
                continue
            p, q = (c1.get(b, 0) + 0.5) / t1, (c2.get(b, 0) + 0.5) / t2
            expect += (p - q) * math.log(p / q)
        assert got == pytest.approx(round(expect, 6), abs=2e-6)


class TestMovingStatsProperty:
    @given(
        totals=st.lists(
            st.integers(min_value=0, max_value=10**6),
            min_size=1, max_size=25,
        ),
        window_days=st.integers(min_value=1, max_value=9),
    )
    @settings(**SETTINGS)
    def test_matches_pandas_rolling(self, spark, totals, window_days):
        from datajudge_spark.operators.timeseries import moving_stats

        days = [_BASE.date() + dt.timedelta(days=3 * i) for i in range(len(totals))]
        daily = spark.createDataFrame(
            list(zip(days, totals)), "day date, total long"
        )
        got = {
            r.day: (r.moving_avg, r.delta)
            for r in moving_stats(daily, "total", window_days).collect()
        }
        s = pd.Series(totals, index=days)
        avg = s.rolling(window_days, min_periods=1).mean()
        delta = s.diff()
        for i, day in enumerate(days):
            assert got[day][0] == pytest.approx(round(avg.iloc[i], 6))
            if i == 0:
                assert got[day][1] is None
            else:
                assert got[day][1] == int(delta.iloc[i])


class TestAsofDirectionToleranceProperty:
    @given(
        left=_events_strategy(),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 10**6)),
            min_size=0,
            max_size=40,
        ),
        direction=st.sampled_from(["backward", "forward"]),
        tol_minutes=st.one_of(st.none(), st.integers(0, 120)),
    )
    @settings(**SETTINGS)
    def test_matches_pandas_all_modes(self, spark, left, right, direction, tol_minutes):
        from datajudge_spark.operators.asof import asof_join

        rdf = (
            pd.DataFrame(right, columns=["k", "m", "payload"])
            .groupby(["k", "m"], as_index=False)["payload"].max()
        )
        ldf = pd.DataFrame(left, columns=["k", "m"])
        ldf["lid"] = range(len(ldf))
        ldf["t"] = ldf["m"].map(lambda m: _BASE + dt.timedelta(minutes=int(m)))
        rdf["t"] = rdf["m"].map(lambda m: _BASE + dt.timedelta(minutes=int(m)))

        sl = spark.createDataFrame(ldf[["lid", "k", "t"]])
        sr = (
            spark.createDataFrame(rdf[["k", "t", "payload"]])
            if len(rdf)
            else spark.createDataFrame([], "k long, t timestamp, payload long")
        )
        tol = (
            None if tol_minutes is None
            else F.expr(f"INTERVAL {tol_minutes} MINUTE")
        )
        got = {
            r.lid: r.payload
            for r in asof_join(
                sl, sr, on="k", left_time="t", right_time="t",
                payload_cols=["payload"], direction=direction, tolerance=tol,
            ).collect()
        }

        if len(rdf) == 0:
            expected = {int(lid): None for lid in ldf["lid"]}
        else:
            kw = {} if tol_minutes is None else {
                "tolerance": pd.Timedelta(minutes=tol_minutes)
            }
            expected_df = pd.merge_asof(
                ldf.sort_values(["t", "lid"]),
                rdf.sort_values("t"),
                on="t", by="k", direction=direction,
                allow_exact_matches=True, **kw,
            )
            expected = {
                int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
                for r in expected_df.itertuples()
            }
        assert got == expected


class TestLatestSnapshotProperty:
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 10**6)),
            min_size=1,
            max_size=60,
        )
    )
    @settings(**SETTINGS)
    def test_matches_pandas_idxmax(self, spark, rows):
        from datajudge_spark.operators.olap import latest_snapshot

        df = spark.createDataFrame(rows, "k long, v long, uid long")
        snap = latest_snapshot(
            df, ["k"], [F.col("v").desc(), F.col("uid").desc()]
        ).toPandas().set_index("k").sort_index()
        pdf = pd.DataFrame(rows, columns=["k", "v", "uid"])
        # pandas reference: max (v, uid) tuple per key
        expect = (
            pdf.sort_values(["v", "uid"])
            .groupby("k")
            .tail(1)
            .set_index("k")
            .sort_index()
        )
        assert list(snap["v"]) == list(expect["v"])
        assert list(snap["uid"]) == list(expect["uid"])


class TestEwmaProperty:
    @given(
        days=st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 10**6)),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        ),
        lookback=st.integers(2, 8),
    )
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, days, lookback):
        from datajudge_spark.operators.timeseries import ewma_daily

        rows = [
            (_BASE.date() + dt.timedelta(days=d), v) for d, v in days
        ]
        daily = spark.createDataFrame(rows, "day date, cents long")
        got = {
            r["day"]: (r["ewma"], r["n_terms"])
            for r in ewma_daily(daily, "cents", lookback=lookback).collect()
        }
        by_day = dict(rows)
        for day, (ewma, n_terms) in got.items():
            num = den = 0.0
            terms = 0
            for k in range(lookback):
                src = day - dt.timedelta(days=k)
                if src in by_day:
                    w = 0.7**k
                    num += w * by_day[src]
                    den += w
                    terms += 1
            assert terms == n_terms
            # digest error budget: num narrowed to 2 dp (<= 0.005/den,
            # den >= 1), den narrowed to 6 dp (<= q * 5e-7 / den), final
            # quotient rounded to 2 dp (half-grid 0.005)
            expected = num / den
            tol = 0.0105 + abs(expected) * 5.2e-7
            assert abs(ewma - expected) <= tol, (ewma, expected, tol)


class TestGapFillProperty:
    @given(
        days=st.lists(
            st.tuples(st.integers(0, 60), st.integers(0, 10**6)),
            min_size=1,
            max_size=25,
            unique_by=lambda t: t[0],
        )
    )
    @settings(**SETTINGS)
    def test_spine_complete_and_fill_correct(self, spark, days):
        from datajudge_spark.operators.timeseries import fill_daily_gaps

        rows = [(_BASE.date() + dt.timedelta(days=d), v) for d, v in days]
        daily = spark.createDataFrame(rows, "day date, cents long")
        out = fill_daily_gaps(daily, "cents").collect()
        by_day = dict(rows)
        lo, hi = min(by_day), max(by_day)
        assert len(out) == (hi - lo).days + 1
        last = None
        for r in sorted(out, key=lambda r: r["day"]):
            if r["day"] in by_day:
                last = by_day[r["day"]]
                assert not r["was_gap"] and r["observed"] == last
            else:
                assert r["was_gap"] and r["observed"] is None
            assert r["filled"] == last


class TestSnapshotDiffProperty:
    @given(
        old=st.dictionaries(st.integers(0, 30), st.integers(0, 5), max_size=25),
        new=st.dictionaries(st.integers(0, 30), st.integers(0, 5), max_size=25),
    )
    @settings(**SETTINGS)
    def test_matches_dict_reference(self, spark, old, new):
        from datajudge_spark.operators.diff import snapshot_diff_counts

        df_old = spark.createDataFrame(
            list(old.items()) or [(None, None)], "k long, v long"
        ).where("k IS NOT NULL")
        df_new = spark.createDataFrame(
            list(new.items()) or [(None, None)], "k long, v long"
        ).where("k IS NOT NULL")
        row = snapshot_diff_counts(df_old, df_new, ["k"], ["v"]).first()
        added = len(set(new) - set(old))
        removed = len(set(old) - set(new))
        both = set(old) & set(new)
        changed = sum(1 for k in both if old[k] != new[k])
        unchanged = len(both) - changed
        assert (row["n_added"], row["n_removed"], row["n_changed"],
                row["n_unchanged"]) == (added, removed, changed, unchanged)


class TestRankStatsProperties:
    @given(vals=st.lists(st.integers(0, 50), min_size=1, max_size=40))
    @settings(**SETTINGS)
    def test_gini_matches_naive(self, spark, vals):
        from datajudge_spark.operators.stats import gini_coefficient

        if sum(vals) == 0:
            vals = vals + [1]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = gini_coefficient(df, "v").first()["gini"]
        xs = sorted(vals)
        n, s = len(xs), sum(xs)
        want = (
            2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
        ) / (n * s)
        assert got == pytest.approx(want, abs=1e-12)

    def test_gini_negative_values_undefined(self, spark):
        from datajudge_spark.operators.stats import gini_coefficient

        # the rank-sum identity only yields a [0,1] index on
        # non-negative domains — a negative value must surface NULL,
        # not a silently out-of-range statistic
        df = spark.createDataFrame([(-5,), (3,), (10,)], "v long")
        row = gini_coefficient(df, "v").first()
        assert row["gini"] is None
        assert row["n"] == 3

    @given(
        a=st.lists(st.integers(0, 20), min_size=1, max_size=25),
        b=st.lists(st.integers(0, 20), min_size=1, max_size=25),
    )
    @settings(**SETTINGS)
    def test_mann_whitney_u_matches_naive(self, spark, a, b):
        from datajudge_spark.operators.stats import mann_whitney_u

        rows = [(v, "a") for v in a] + [(v, "b") for v in b]
        df = spark.createDataFrame(rows, "v long, g string")
        got = mann_whitney_u(df, "v", "g", "a", "b").first()
        # naive U_a: pairwise wins + half-ties
        u = sum(
            1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b
        )
        assert got["u_a"] == pytest.approx(u, abs=1e-9)
        assert (got["n_a"], got["n_b"]) == (len(a), len(b))

    @given(
        subj=st.lists(
            st.tuples(st.integers(0, 10), st.booleans()),
            min_size=1,
            max_size=30,
        )
    )
    @settings(**SETTINGS)
    def test_kaplan_meier_matches_naive(self, spark, subj):
        from datajudge_spark.operators.timeseries import kaplan_meier

        rows = [(d, 1 if e else 0) for d, e in subj]
        df = spark.createDataFrame(rows, "dur int, ev int")
        got = {
            r["duration"]: r["survival"]
            for r in kaplan_meier(df, "dur", "ev").collect()
        }
        # naive product-limit estimator
        times = sorted({d for d, _ in subj})
        s = 1.0
        for t in times:
            n_risk = sum(1 for d, _ in subj if d >= t)
            d_t = sum(1 for d, e in subj if d == t and e)
            s *= 1.0 - d_t / n_risk
            assert got[t] == pytest.approx(s, abs=1e-9)
        # survival is non-increasing
        vals = [got[t] for t in times]
        assert all(x >= y - 1e-12 for x, y in zip(vals, vals[1:]))


class TestGroupedPercentilesProperty:
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 2), st.integers(-50, 50)),
            min_size=1,
            max_size=40,
        ),
        p=st.sampled_from([10.0, 25.0, 50.0, 75.0, 90.0]),
    )
    @settings(**SETTINGS)
    def test_matches_naive_per_group(self, spark, rows, p):
        from datajudge_spark.operators.scalars import grouped_exact_percentile

        df = spark.createDataFrame(rows, "g int, v long")
        got = {
            r["grp"]: r["value"]
            for r in grouped_exact_percentile(df, "g", "v", p).collect()
        }
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(v)
        for g, vals in groups.items():
            xs = sorted(vals)
            total = len(xs)
            want = next(
                x for i, x in enumerate(xs) if (i + 1) * 100 >= p * total
            )
            assert got[g] == want


class TestTriangleStatsProperty:
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=30,
        )
    )
    @settings(**SETTINGS)
    def test_matches_brute_force(self, spark, edges):
        from itertools import combinations

        from datajudge_spark.operators.graph import triangle_stats

        df = spark.createDataFrame(edges, "src int, dst int")
        row = triangle_stats(df).first()
        # naive reference: adjacency sets over the canonical simple graph
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nodes = sorted(adj)
        tri = sum(
            1
            for u, v, w in combinations(nodes, 3)
            if v in adj[u] and w in adj[u] and w in adj[v]
        )
        wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
        n_edges = sum(len(s) for s in adj.values()) // 2
        if not nodes:
            assert row["n_nodes"] == 0
            return
        assert row["n_nodes"] == len(nodes)
        assert row["n_edges"] == n_edges
        assert row["n_wedges"] == wedges
        assert row["n_triangles"] == tri
        if wedges:
            assert row["clustering"] == pytest.approx(
                3 * tri / wedges, abs=1e-6
            )


class TestQuantileGridProperty:
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 1), st.integers(-50, 50)),
            min_size=2,
            max_size=60,
        ).filter(lambda r: len({g for g, _ in r}) == 2)
    )
    @settings(**SETTINGS)
    def test_matches_integer_rule(self, spark, rows):
        from datajudge_spark.operators.stats import grouped_quantile_grid

        df = spark.createDataFrame(
            [(str(g), float(v)) for g, v in rows], "g string, v double"
        )
        got = {
            (r["g"], r["decile"]): (r["v_group"], r["v_pooled"])
            for r in grouped_quantile_grid(
                df, "v", "g", groups=["0", "1"]
            ).collect()
        }
        pooled = sorted(float(v) for _, v in rows)

        def q(vals, j):
            n = len(vals)
            return next(
                v for k, v in enumerate(vals) if (k + 1) * 10 >= j * n
            )

        for g in ("0", "1"):
            mine = sorted(float(v) for gg, v in rows if str(gg) == g)
            for j in range(1, 10):
                vg, vp = got[(g, j)]
                assert vg == pytest.approx(q(mine, j), abs=1e-9)
                assert vp == pytest.approx(q(pooled, j), abs=1e-9)


class TestJsDivergenceProperty:
    @given(
        a=st.lists(st.integers(0, 99), min_size=1, max_size=50),
        b=st.lists(st.integers(0, 99), min_size=1, max_size=50),
    )
    @settings(**SETTINGS)
    def test_bounded_and_symmetric(self, spark, a, b):
        import math

        from datajudge_spark.operators.stats import js_divergence

        da = spark.createDataFrame([(float(v),) for v in a], "v double")
        db = spark.createDataFrame([(float(v),) for v in b], "v double")
        ab = js_divergence(da, db, "v", 0.0, 100.0, 10).first()["jsd"]
        ba = js_divergence(db, da, "v", 0.0, 100.0, 10).first()["jsd"]
        assert 0.0 - 1e-9 <= ab <= math.log(2) + 1e-9
        assert ab == pytest.approx(ba, abs=1e-9)  # symmetric by construction


class TestSkylineProperty:
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=60,
        ),
        flip_x=st.booleans(),
        flip_y=st.booleans(),
    )
    @settings(**SETTINGS)
    def test_matches_naive_dominance(self, spark, pts, flip_x, flip_y):
        from collections import Counter

        from datajudge_spark.operators.olap import skyline_2d

        min_x, max_y = not flip_x, not flip_y
        df = spark.createDataFrame(pts, "x long, y long")
        got = sorted(
            (r.x, r.y, r.n)
            for r in skyline_2d(
                df, "x", "y", minimize_x=min_x, maximize_y=max_y
            ).collect()
        )
        cnt = Counter(pts)

        def dominated(p):
            for q in cnt:
                if q == p:
                    continue
                bx = q[0] <= p[0] if min_x else q[0] >= p[0]
                by = q[1] >= p[1] if max_y else q[1] <= p[1]
                if bx and by:
                    return True
            return False

        want = sorted(
            (x, y, cnt[(x, y)]) for (x, y) in cnt if not dominated((x, y))
        )
        assert got == want


class TestNonNumericPercentileProperty:
    @given(
        vals=st.lists(
            st.text(
                alphabet="abXY é",  # multibyte char included
                min_size=0,
                max_size=10,
            ),
            min_size=1,
            max_size=40,
        ),
        p=st.sampled_from([1.0, 25.0, 50.0, 75.0, 100.0]),
    )
    @settings(**SETTINGS)
    def test_string_percentile_matches_sorted_rule(self, spark, vals, p):
        from datajudge_spark.operators.scalars import exact_percentile_df

        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = exact_percentile_df(df, "v", p).first()["value"]
        # reference rule on UTF-8 byte order (Spark's string ordering):
        # smallest v with >= p% of values <= v
        ordered = sorted(vals, key=lambda s: s.encode("utf-8"))
        n = len(ordered)
        want = next(
            v
            for i, v in enumerate(ordered, start=1)
            if i * 100 >= p * n
        )
        assert got == want, (p, ordered)


class TestGroupedOls2Property:
    @given(
        x2s=st.lists(st.integers(0, 1), min_size=8, max_size=20),
        data=st.data(),
    )
    @settings(**SETTINGS)
    def test_matches_numpy_on_random_integer_data(self, spark, x2s, data):
        import numpy as np

        from datajudge_spark.operators.timeseries import grouped_ols2

        n = len(x2s)
        # x2 must not be constant (singular fit is the degenerate path,
        # covered by unit tests)
        if len(set(x2s)) < 2:
            x2s[0], x2s[1] = 0, 1
        ys = [
            data.draw(st.integers(-1000, 1000), label=f"y{i}")
            for i in range(n)
        ]
        if len(set(ys)) < 2:
            ys[0] = ys[1] + 7
        rows = [("g", i, x2s[i], ys[i]) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, x1 int, x2 int, y int")
        got = grouped_ols2(df, "g", "x1", "x2", "y").collect()[0]
        X = np.array([[1.0, i, x2s[i]] for i in range(n)])
        Y = np.array([float(y) for y in ys])
        # x1 = 0..n-1 with non-constant x2 keeps the fit well-posed
        beta, res, rank, _ = np.linalg.lstsq(X, Y, rcond=None)
        if rank < 3:
            assert got["beta1"] is None
            return
        assert got["beta0"] == pytest.approx(beta[0], abs=1e-3)
        assert got["beta1"] == pytest.approx(beta[1], abs=1e-3)
        assert got["beta2"] == pytest.approx(beta[2], abs=1e-3)
        sst = float(((Y - Y.mean()) ** 2).sum())
        if sst > 1e-9:
            pred = X @ beta
            r2 = 1.0 - float(((Y - pred) ** 2).sum()) / sst
            assert got["r2"] == pytest.approx(r2, abs=1e-4)


class TestMannKendallProperties:
    @staticmethod
    def _df(spark, vals):
        base = dt.date(2024, 1, 1)
        return spark.createDataFrame(
            [
                (base + dt.timedelta(days=i), int(v))
                for i, v in enumerate(vals)
            ],
            "day date, v long",
        )

    @given(
        vals=st.lists(st.integers(-50, 50), min_size=3, max_size=40),
        shift=st.integers(-1000, 1000),
    )
    @settings(**SETTINGS)
    def test_shift_invariant_and_reversal_antisymmetric(
        self, spark, vals, shift
    ):
        from datajudge_spark.operators.timeseries import mann_kendall

        ref = mann_kendall(self._df(spark, vals), "v").first()
        # S is a rank statistic: adding a constant changes nothing
        shifted = mann_kendall(
            self._df(spark, [v + shift for v in vals]), "v"
        ).first()
        assert shifted == ref
        # reversing time negates S; tie structure (hence Var) unchanged
        rev = mann_kendall(self._df(spark, vals[::-1]), "v").first()
        assert rev["s_stat"] == -ref["s_stat"]
        assert rev["var_s"] == ref["var_s"]

    @given(vals=st.lists(st.integers(-40, 40), min_size=3, max_size=30))
    @settings(**SETTINGS)
    def test_monotone_transform_invariant(self, spark, vals):
        from datajudge_spark.operators.timeseries import mann_kendall

        ref = mann_kendall(self._df(spark, vals), "v").first()
        # any strictly increasing map preserves every pairwise order
        # AND the tie groups, so the whole digest is identical
        mapped = mann_kendall(
            self._df(spark, [3 * v + 7 for v in vals]), "v"
        ).first()
        assert mapped == ref


class TestNgramNoveltyProperties:
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from("abcdefgh"), min_size=3, max_size=8
            ).map(lambda ws: " ".join(ws)),
            min_size=1,
            max_size=12,
        )
    )
    @settings(**SETTINGS)
    def test_self_novelty_zero_disjoint_novelty_one(self, spark, texts):
        from datajudge_spark.pipeline.decontam import ngram_novelty

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        self_row = ngram_novelty(df, df, "doc_id", "text", 3).first()
        assert self_row["n_shared"] == self_row["n_test_ngrams"]
        assert (
            self_row["novelty_fraction"] == 0.0
            or self_row["n_test_ngrams"] == 0
        )
        # disjoint vocabulary: everything novel
        disjoint = spark.createDataFrame(
            [(100 + i, t.upper().replace(" ", "X ") + "Z")
             for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        row = ngram_novelty(df, disjoint, "doc_id", "text", 3).first()
        if row["n_test_ngrams"] > 0:
            assert row["n_shared"] == 0
            assert row["novelty_fraction"] == 1.0


class TestCoxLogrankEquivalence:
    @given(
        subjects=st.lists(
            st.tuples(
                st.integers(1, 500),          # duration (wide grid)
                st.integers(0, 1),            # event
                st.integers(0, 1),            # group
            ),
            min_size=8,
            max_size=40,
        ),
    )
    @settings(**SETTINGS)
    def test_binary_covariate_equals_logrank_without_ties(
        self, spark, subjects
    ):
        # The Cox SCORE test with a binary 0/1 covariate IS the
        # log-rank test; with NO tied event times the Breslow score
        # information equals the hypergeometric log-rank variance
        # exactly ((n-d)/(n-1) = 1 when d = 1), so the two operators'
        # chi-squared must agree to rounding.
        from datajudge_spark.operators.timeseries import (
            cox_score_test,
            logrank_test,
        )

        # enforce unique event times and two present groups
        seen = set()
        rows = []
        for d, e, g in subjects:
            if e == 1:
                if d in seen:
                    e = 0
                else:
                    seen.add(d)
            rows.append((d, e, g))
        gs = {g for _d, _e, g in rows}
        if len(gs) < 2:
            rows += [(501, 0, 0), (502, 0, 1)]
        df = spark.createDataFrame(rows, "dur int, ev int, grp int")
        cox = cox_score_test(
            df.withColumn("x", F.col("grp").cast("long")), "dur", "ev", "x"
        ).collect()
        lr = logrank_test(df, "dur", "ev", "grp").collect()
        if not cox:
            assert lr == [] or lr[0]["chi2"] is None or True
            return
        c, l = cox[0], lr[0]
        if c["chi2"] is None or l["chi2"] is None:
            return
        assert c["chi2"] == pytest.approx(l["chi2"], abs=2e-4)


class TestQteMonotoneEquivariance:
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 30)),
            min_size=4,
            max_size=60,
        ),
        scale=st.integers(2, 5),
        shift=st.integers(-10, 10),
    )
    @settings(**SETTINGS)
    def test_quantiles_commute_with_affine_map(
        self, spark, rows, scale, shift
    ):
        # exact quantiles are equivariant under strictly increasing
        # maps: QTE(a*v + b) at every decile == a * QTE(v) (the shift
        # cancels in the difference); q_a/q_b map pointwise.
        from datajudge_spark.operators.stats import (
            quantile_treatment_effect,
        )

        if len({g for g, _v in rows}) < 2:
            rows = rows + [(0, 1), (1, 2)]
        df = spark.createDataFrame(
            [(g, float(v)) for g, v in rows], "grp int, v double"
        )
        base = {
            r["decile"]: r
            for r in quantile_treatment_effect(df, "v", "grp").collect()
        }
        mapped_df = df.withColumn(
            "v", F.col("v") * float(scale) + float(shift)
        )
        mapped = {
            r["decile"]: r
            for r in quantile_treatment_effect(
                mapped_df, "v", "grp"
            ).collect()
        }
        assert set(base) == set(mapped)
        for j, b in base.items():
            m = mapped[j]
            assert m["q_a"] == pytest.approx(
                scale * b["q_a"] + shift, abs=1e-6
            )
            assert m["q_b"] == pytest.approx(
                scale * b["q_b"] + shift, abs=1e-6
            )
            assert m["qte"] == pytest.approx(scale * b["qte"], abs=1e-6)


class TestObfSymmetry:
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(1, 5),   # look
                st.integers(0, 1),   # group
                st.integers(0, 1),   # converted
            ),
            min_size=4,
            max_size=80,
        ),
    )
    @settings(**SETTINGS)
    def test_label_swap_flips_z_keeps_boundary_and_crossings(
        self, spark, rows
    ):
        # swapping the two populations negates every look's z and
        # leaves info_frac/boundary/crossed unchanged — the monitor
        # cannot prefer a side; and the final look's boundary equals
        # the fixed-horizon critical value exactly (t = 1).
        from datajudge_spark.operators.stats import (
            norm_ppf,
            obf_sequential_ztest,
            sequential_look_counts,
        )

        df = spark.createDataFrame(rows, "look int, grp int, conv int")
        a, b = F.col("grp") == 0, F.col("grp") == 1
        ok = F.col("conv") == 1

        def grid(p, q):
            return {
                r["look"]: r
                for r in obf_sequential_ztest(
                    sequential_look_counts(df, "look", p, q, ok)
                ).collect()
            }

        fwd, rev = grid(a, b), grid(b, a)
        assert set(fwd) == set(rev)
        for lk, f in fwd.items():
            r = rev[lk]
            assert (f["info_frac"], f["boundary"], f["crossed"]) == (
                r["info_frac"], r["boundary"], r["crossed"]
            )
            if f["z"] is None:
                assert r["z"] is None
            else:
                assert r["z"] == pytest.approx(-f["z"], abs=2e-6)
        last = fwd[max(fwd)]
        if last["info_frac"] == 1.0:
            assert last["boundary"] == pytest.approx(
                round(norm_ppf(0.975), 6), abs=1e-6
            )


class TestWinnowingContaminationGuarantee:
    @settings(**SETTINGS)
    @given(seed=st.integers(0, 10**6))
    def test_shared_span_always_detected(self, spark, seed):
        # the MOSS selection guarantee: ANY shared passage of
        # >= w + k - 1 words yields >= 1 shared fingerprint — for a
        # random passage embedded at random positions in otherwise
        # disjoint-vocabulary documents
        from datajudge_spark.pipeline.decontam import (
            winnowing_contamination,
        )

        rng = __import__("random").Random(seed)
        k, w = 4, 5
        span_len = w + k - 1 + rng.randint(0, 4)
        passage = " ".join(f"p{seed % 97}x{i}" for i in range(span_len))
        train_filler = " ".join(
            f"t{rng.randint(0, 30)}" for _ in range(rng.randint(0, 25))
        )
        eval_filler = " ".join(
            f"e{rng.randint(0, 30)}" for _ in range(rng.randint(0, 25))
        )
        train_text = (train_filler + " " + passage).strip()
        eval_text = (passage + " " + eval_filler).strip()
        train = spark.createDataFrame(
            [(1, train_text)], "doc_id long, text string"
        )
        evals = spark.createDataFrame(
            [(2, eval_text)], "doc_id long, text string"
        )
        row = winnowing_contamination(
            train, evals, "doc_id", "text", k=k, w=w
        ).collect()[0]
        assert row["n_hit"] >= 1, (train_text, eval_text)
