"""Graph operators: PageRank + BFS, local fast path vs distributed loop.

The local path (driver numpy / dict) and the distributed path (joins +
lineage-truncated iterations) must agree: bit-for-bit for BFS (integer
state), to >9 decimals for PageRank (same expression tree, double math).
"""

import pytest
from pyspark.sql import functions as F

from datajudge_spark.operators.graph import bfs_levels, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w double")


@pytest.fixture(scope="module")
def diamond(spark):
    # a -> b, a -> c (weighted 3:1), b -> d, c -> d, d dangling
    return _edges(
        spark,
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "d", 1.0), ("c", "d", 1.0)],
    )


class TestPagerank:
    def test_mass_conserved_and_ordering(self, spark, diamond):
        rows = {
            r["node"]: r["rank"]
            for r in pagerank(diamond, weight="w", n_iterations=10).collect()
        }
        assert set(rows) == {"a", "b", "c", "d"}
        assert sum(rows.values()) == pytest.approx(1.0, abs=1e-12)
        # b receives 3x the weight c does from a -> higher rank
        assert rows["b"] > rows["c"]
        # d receives from both b and c -> highest of the non-source nodes
        assert rows["d"] > rows["b"]

    def test_local_matches_distributed(self, spark, diamond):
        local = pagerank(diamond, weight="w", n_iterations=5)
        dist = pagerank(
            diamond, weight="w", n_iterations=5, max_local_edges=0
        )
        lr = {r["node"]: r["rank"] for r in local.collect()}
        dr = {r["node"]: r["rank"] for r in dist.collect()}
        assert set(lr) == set(dr)
        for n in lr:
            assert lr[n] == pytest.approx(dr[n], abs=1e-12)
        assert [f.name for f in local.schema] == [f.name for f in dist.schema]
        assert [f.dataType for f in local.schema] == [
            f.dataType for f in dist.schema
        ]

    def test_unweighted_parallel_edges_summed(self, spark):
        # two parallel a->b edges == one edge of weight 2 (unweighted)
        e2 = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string"
        )
        rows = {
            r["node"]: r["rank"] for r in pagerank(e2, n_iterations=3).collect()
        }
        assert rows["b"] > rows["c"]

    def test_validation(self, spark, diamond):
        with pytest.raises(ValueError):
            pagerank(diamond, damping=1.0)
        with pytest.raises(ValueError):
            pagerank(diamond, n_iterations=0)
        with pytest.raises(ValueError):
            pagerank(diamond.where(F.lit(False)))


class TestBfs:
    def test_levels_and_unreachable(self, spark, diamond):
        src = spark.createDataFrame([("a",)], "node string")
        rows = {
            r["node"]: r["hops"] for r in bfs_levels(diamond, src).collect()
        }
        assert rows == {"a": 0, "b": 1, "c": 1, "d": 2}

    def test_unreachable_excluded(self, spark):
        e = _edges(spark, [("a", "b", 1.0), ("x", "y", 1.0)])
        src = spark.createDataFrame([("a",)], "node string")
        rows = {r["node"]: r["hops"] for r in bfs_levels(e, src).collect()}
        assert rows == {"a": 0, "b": 1}

    def test_max_hops_truncates(self, spark):
        e = _edges(
            spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)]
        )
        src = spark.createDataFrame([("a",)], "node string")
        rows = {
            r["node"]: r["hops"]
            for r in bfs_levels(e, src, max_hops=2).collect()
        }
        assert rows == {"a": 0, "b": 1, "c": 2}

    def test_local_matches_distributed(self, spark, diamond):
        src = spark.createDataFrame([("a",)], "node string")
        local = bfs_levels(diamond, src)
        dist = bfs_levels(diamond, src, max_local_edges=0)
        assert sorted(map(tuple, local.collect())) == sorted(
            map(tuple, dist.collect())
        )
        assert [f.dataType for f in local.schema] == [
            f.dataType for f in dist.schema
        ]

    def test_multi_source_min_hops(self, spark):
        e = _edges(
            spark, [("a", "b", 1.0), ("b", "c", 1.0), ("z", "c", 1.0)]
        )
        src = spark.createDataFrame([("a",), ("z",)], "node string")
        rows = {r["node"]: r["hops"] for r in bfs_levels(e, src).collect()}
        assert rows == {"a": 0, "z": 0, "b": 1, "c": 1}


class TestDegreeAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        from datajudge_spark.operators.graph import degree_assortativity

        edges = spark.createDataFrame(
            [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
        )
        r = degree_assortativity(edges).first()
        assert r["n_nodes"] == 7
        assert r["n_edges"] == 6
        assert r["assortativity"] == pytest.approx(-1.0, abs=1e-6)

    def test_regular_graph_undefined(self, spark):
        from datajudge_spark.operators.graph import degree_assortativity

        # 4-cycle: every degree is 2, zero variance
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
            "src string, dst string",
        )
        r = degree_assortativity(edges).first()
        assert r["assortativity"] is None

    def test_matches_naive_pearson(self, spark):
        import math

        from datajudge_spark.operators.graph import degree_assortativity

        raw = [
            ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
            ("d", "e"), ("e", "f"), ("f", "g"), ("g", "e"),
            ("b", "a"), ("c", "a"),  # duplicates/reversals collapse
        ]
        edges = spark.createDataFrame(raw, "src string, dst string")
        r = degree_assortativity(edges).first()
        canon = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
        deg: dict[str, int] = {}
        for u, v in canon:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs, ys = [], []
        for u, v in canon:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        n = len(xs)
        sx, sxy = sum(xs), sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        expected = (n * sxy - sx * sx) / (n * sxx - sx * sx)
        assert r["n_edges"] == len(canon)
        assert r["assortativity"] == pytest.approx(expected, abs=1e-6)
