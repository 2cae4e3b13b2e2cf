"""Iterative graph analytics on DataFrames: PageRank and BFS.

Extension — the reference has no graph surface; the nearest in-repo
relative is the distributed min-label propagation used for duplicate
clusters (pipeline/dedup.py:301+). Both follow the same iterative
pattern: each round is a bounded number of joins/aggregates, and
lineage is truncated per round via ``pipeline._util.iter_checkpoint``
(nested iterative plans otherwise grow exponentially; persist alone
caches data, not the plan).

Scale notes (100 TB / billions of edges):
- state per round is one (node, value) DataFrame — O(|nodes|) rows,
  shuffled on the node key; edges shuffle on src/dst only.
- PageRank's dangling-mass term is a 1-row aggregate per round
  (broadcast back), the standard formulation — never a driver-side
  loop over nodes.
- both run a FIXED number of rounds (PageRank) or until an empty
  frontier (BFS); convergence thresholds over doubles are
  deliberately avoided so results are reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline._util import iter_checkpoint, materialize_once


#: Aggregated graphs at or below this many (deduplicated) edges run
#: their power/frontier iterations on the driver instead of as Spark
#: jobs — the same small-side escape hatch as the union-find in
#: pipeline/dedup.py (≤2M edges).  An ITERATION over a tiny aggregated
#: graph (e.g. 25 nations distilled from 100 TB of lineitem) is pure
#: scheduler overhead distributed: ~10 eager jobs to move <1 kB of
#: state.  The expensive part — deriving/aggregating the edges — always
#: runs in Spark; only the O(|E|) aggregate crosses to the driver.
MAX_LOCAL_EDGES = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iterations: int = 10,
    max_local_edges: int = MAX_LOCAL_EDGES,
) -> DataFrame:
    """Weighted PageRank by ``n_iterations`` of the power method.

    ``rank'(v) = (1-d)/N + d * (sum_in rank(u) * w(u,v)/out_w(u)
    + dangling_mass / N)`` — dangling nodes (no out-edges) spread
    their rank uniformly, so total rank stays 1 each round.

    Returns (node, rank). Parallel edges are summed into one weight.
    """
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if n_iterations < 1:
        raise ValueError("n_iterations must be >= 1")
    w = F.col(weight) if weight else F.lit(1.0)
    e = materialize_once(
        edges.groupBy(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).agg(F.sum(w.cast("double")).alias("w"))
    )
    n_edges = e.count()
    if n_edges == 0:
        raise ValueError("pagerank needs at least one edge")
    if n_edges <= max_local_edges:
        return _pagerank_local(e, damping, n_iterations)
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition probability per edge; src without out-edges never appears
    trans = materialize_once(
        e.join(out_w, "src").select(
            "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
        )
    )
    nodes = materialize_once(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    has_out = out_w.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iterations):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        incoming = (
            ranks.join(trans, ranks.node == trans.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_rank"))
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        ranks = iter_checkpoint(ranks)
    return ranks


def _pagerank_local(e: DataFrame, damping: float, n_iterations: int) -> DataFrame:
    """Driver-side power iteration over an already-aggregated edge list.

    Arithmetic mirrors the distributed path expression-for-expression
    ((1-d)/N + d*(in_rank + dm/N), all doubles), so both paths agree to
    well past the 6 decimals the contract query rounds to.  State is
    O(|V|+|E|) on the driver — gated by ``max_local_edges``.
    """
    import numpy as np

    from pyspark.sql import types as T

    spark = e.sparkSession
    rows = e.collect()
    node_names = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    idx = {n: i for i, n in enumerate(node_names)}
    n = len(node_names)
    out_w = np.zeros(n)
    for r in rows:
        out_w[idx[r["src"]]] += r["w"]
    # sparse transition as parallel arrays (no scipy dependency)
    src_i = np.fromiter((idx[r["src"]] for r in rows), dtype=np.int64)
    dst_i = np.fromiter((idx[r["dst"]] for r in rows), dtype=np.int64)
    p = np.fromiter((r["w"] for r in rows), dtype=np.float64) / out_w[src_i]
    dangling = out_w == 0.0
    ranks = np.full(n, 1.0 / n)
    for _ in range(n_iterations):
        dm = float(ranks[dangling].sum())
        in_rank = np.zeros(n)
        np.add.at(in_rank, dst_i, ranks[src_i] * p)
        ranks = (1.0 - damping) / n + damping * (in_rank + dm / n)
    node_type = e.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, True),
            T.StructField("rank", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(
        [(node_names[i], float(ranks[i])) for i in range(n)], schema
    )


def bfs_levels(
    edges: DataFrame,
    source_nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 20,
    max_local_edges: int = MAX_LOCAL_EDGES,
) -> DataFrame:
    """Minimum hop count from any source node, by frontier expansion.

    ``source_nodes`` is a 1-column DataFrame of starting nodes (hops 0).
    Returns (node, hops) for every REACHABLE node within ``max_hops``.
    Each round shuffles only the current frontier joined to edges —
    O(|frontier| * avg-degree) — and stops early when no new node is
    found. All-integer state: bit-for-bit deterministic.  Small
    aggregated graphs (≤ ``max_local_edges`` distinct edges) run the
    expansion on the driver — integer-exact, so both paths agree
    bit-for-bit.
    """
    e = materialize_once(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    n_edges = e.count()
    node_col = source_nodes.columns[0]
    if n_edges <= max_local_edges:
        return _bfs_local(e, source_nodes, node_col, max_hops)
    visited = materialize_once(
        source_nodes.select(
            F.col(node_col).alias("node"), F.lit(0).alias("hops")
        ).distinct()
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        neighbors = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new_frontier = neighbors.join(visited, "node", "left_anti").select(
            "node", F.lit(hop).alias("hops")
        )
        new_frontier = iter_checkpoint(new_frontier)
        if new_frontier.limit(1).count() == 0:
            break
        visited = iter_checkpoint(visited.unionByName(new_frontier))
        frontier = new_frontier
    return visited


def _bfs_local(
    e: DataFrame, source_nodes: DataFrame, node_col: str, max_hops: int
) -> DataFrame:
    """Driver-side frontier expansion (adjacency dict). Integer state —
    identical output to the distributed loop."""
    from collections import defaultdict

    from pyspark.sql import types as T

    spark = e.sparkSession
    adj = defaultdict(list)
    for r in e.collect():
        adj[r["src"]].append(r["dst"])
    hops = {r[node_col]: 0 for r in source_nodes.collect()}
    frontier = list(hops)
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in hops:
                    hops[v] = hop
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    node_type = e.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, True),
            T.StructField("hops", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(sorted(hops.items()), schema)


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    UNDIRECTED simple graph induced by an edge list, as one digest row
    ``(n_nodes, n_edges, n_wedges, n_triangles, clustering)``.

    The community-structure health check for any derived graph
    (co-occurrence, trade, similarity): ``clustering = 3·T / W`` where
    W is the open+closed wedge count ``Σ d(d-1)/2``.

    Plan — the ordered node-iterator join, the canonical distributed
    triangle algorithm: edges canonicalize to ``u < v`` (one row per
    undirected edge), and each triangle ``u < v < w`` is found exactly
    once by the two-hop join ``e(u,v) ⋈ e(v,w) ⋈ e(u,w)`` — three hash
    equi-joins over the edge table, no node-neighborhood materialization.
    Degrees/wedges are one aggregate over the exploded endpoints.  All
    counts integer-exact; only the final ratio is double.  Skew note: at
    billions of edges, orient by (degree, id) instead of raw id so hub
    nodes sit on the small side of every join — id orientation keeps
    the digest identical (orientation never changes T), so this stays
    the oracle-checkable form.

    Extension — no reference counterpart; completes the graph family
    (PageRank, BFS, connected components).
    """
    e = materialize_once(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # counts stay INTEGRAL end-to-end: d*(d-1) in decimal(38,0) (a
    # long*long product would wrap past d ~ 3e9 hubs, a double sum
    # loses exactness past 2^53 total wedges), halved ONCE at the end
    # — both sums are even, so the decimal division is exact and the
    # bigint cast lossless
    d_dec = F.col("d").cast("decimal(38,0)")
    base = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(d_dec) / 2).cast("bigint").alias("n_edges"),
        (F.sum(d_dec * (F.col("d") - 1)) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    ab = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    bc = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    ac = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = (
        ab.join(bc, "y")
        .join(ac, ["x", "z"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return base.crossJoin(F.broadcast(tri)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        "n_edges",
        "n_wedges",
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
            ),
            6,
        ).alias("clustering"),
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Newman degree assortativity of the undirected simple graph, one
    digest row ``(n_nodes, n_edges, assortativity)``: the Pearson
    correlation of the degrees at the two ends of every edge, each edge
    counted in both orientations (the standard definition — so the
    paired series is symmetric and r lives in [-1, 1]).  Positive =
    hubs attach to hubs (social networks), negative = hub-and-spoke
    (star topologies, supply chains); the one-number summary of whether
    the graph's heavy keys concentrate on each other — which is exactly
    the skew-amplification question a distributed join planner asks.

    Exactness: degrees are integers; all five sufficient statistics
    accumulate as DECIMAL(38,0) over the per-edge degree pairs
    (symmetric, so Σx = Σy and Σx² = Σy² fold as single sums of
    ``du+dv`` / ``du²+dv²``), and r converts ONCE to double in a fixed
    expression, rounded 6dp.  Zero degree variance (every node the same
    degree — cycles, complete graphs) yields NULL, not a /0.

    Plan: edges canonicalize + distinct (one shuffle); degrees are one
    exploded-endpoint aggregate; the two degree lookups join back on
    node id (broadcast when the node set is small, hash otherwise).
    Nothing touches more than |E| rows.  Extension — no reference
    counterpart; completes the graph family's structural digests
    (triangles count closure, this measures mixing).
    """
    from ..pipeline._util import materialize_once

    e = materialize_once(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    deg = (
        e.select(
            F.explode(
                F.array(F.col("u"), F.col("v"))
            ).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    paired = e.join(du, "u").join(dv, "v")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    suff = paired.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(d38(F.col("du") + F.col("dv"))).alias("sx"),
        F.sum(d38(d19(F.col("du")) * F.col("dv")) * 2).alias("sxy"),
        F.sum(
            d38(d19(F.col("du")) * F.col("du"))
            + d38(d19(F.col("dv")) * F.col("dv"))
        ).alias("sxx"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n2 = (F.col("m") * 2).cast("decimal(38,0)")
    num = (n2 * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
    den = (n2 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return suff.crossJoin(F.broadcast(n_nodes)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("m").cast("bigint").alias("n_edges"),
        F.when(den > 0, F.round(num / den, 6)).alias("assortativity"),
    )
