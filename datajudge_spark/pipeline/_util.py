"""Shared pipeline plumbing."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def in_literal_list(col_name: str, values) -> Column:
    """``col IN (v1, v2, ...)`` as ONE parsed SQL string.

    ``Column.isin(list)`` lifts every element through ``F.lit`` — ~4
    py4j round-trips each, so a 100-id query set costs ~800 round-trips
    of pure driver time per call site.  Int and string values cover the
    id types the pipeline operators take; anything else falls back to
    the ``isin`` build (identical semantics either way)."""
    lits = []
    for v in values:
        if isinstance(v, bool):
            lits = None
            break
        if isinstance(v, int):
            lits.append(str(v) if -(2**31) <= v < 2**31 else f"{v}L")
        elif isinstance(v, str):
            escaped = v.replace("\\", "\\\\").replace("'", "\\'")
            lits.append(f"'{escaped}'")
        else:
            lits = None
            break
    if lits is None:
        return F.col(col_name).isin(list(values))
    return F.expr(f"`{col_name}` IN ({', '.join(lits)})")

#: Relations larger than this are assumed to already scan with adequate
#: parallelism; smaller ones are repartitioned before CPU-heavy map work.
SPREAD_SIZE_THRESHOLD = 1 << 30  # 1 GiB


def materialize_once(df: DataFrame) -> DataFrame:
    """Compute ``df`` at most once even when it feeds several plan
    branches (self-joins, size lookups, convergence checks).

    Spark does not share common subplans across join branches — a
    self-join of an expensive derivation (shingle explode + hashing)
    recomputes it per branch unless the exchange happens to be reused.
    ``persist(MEMORY_AND_DISK)`` stays lazy, materializes on first
    action into the block manager, and every consumer reads the cached
    blocks — while the logical plan stays attached, so a lost executor's
    blocks are *recomputed* rather than failing the job.  That
    fault-tolerance is why this is persist and NOT ``localCheckpoint``:
    checkpoint blocks are unreplicated and unrecoverable, acceptable
    only where lineage truncation is mandatory (iterative loops, see
    ``dedup.duplicate_clusters``).  Blocks are freed when the plan is
    garbage collected.
    """
    return df.persist(_PERSIST_LEVEL)


_PERSIST_LEVEL = StorageLevel.MEMORY_AND_DISK


def set_replicated_persist(enabled: bool) -> None:
    """Hardening knob for unreliable clusters (spot instances, frequent
    executor loss): when enabled, ``materialize_once`` persists with
    2x block replication (``MEMORY_AND_DISK_2``) so a cached branch
    survives a lost executor without recomputation of the (expensive)
    upstream derivation.  Off by default — replication doubles cache
    footprint and write cost, the wrong trade on a healthy cluster."""
    global _PERSIST_LEVEL
    _PERSIST_LEVEL = (
        StorageLevel.MEMORY_AND_DISK_2 if enabled else StorageLevel.MEMORY_AND_DISK
    )


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Lineage truncation for iterative loops (connected components,
    pointer doubling): each iteration MUST cut the plan or it grows
    exponentially.

    Uses *reliable* ``checkpoint()`` (HDFS/object-store, survives
    executor loss) when the application has set a checkpoint dir —
    ``spark.sparkContext.setCheckpointDir(...)`` is the cluster
    operator's opt-in — and falls back to ``localCheckpoint()``
    (executor-local blocks, unrecoverable but zero-infrastructure)
    otherwise.  Both truncate lineage; only the reliable form tolerates
    losing an executor mid-loop."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().checkpointDir().isDefined():
        return df.checkpoint()
    return df.localCheckpoint()


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure CPU-bound per-row work is spread across the cluster.

    A small parquet file scans as ONE partition, which serializes any
    expensive downstream map work (shingling, hashing, cosine folds) on a
    single core. Small relations (by Catalyst plan statistics — no job is
    triggered; ``df.rdd.getNumPartitions()`` would materialize AQE
    stages) are repartitioned up to the session's default parallelism: a
    trivially cheap shuffle at that size. Large relations already scan
    with >= parallelism partitions and pass through untouched, so this is
    a no-op at real corpus scale. Idempotent: an input whose plan root is
    already a repartition is left alone.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    execution = df._jdf.queryExecution()
    # Walk through partitioning-preserving nodes (Project/Filter/alias):
    # a frame derived from an explicit repartition by narrow ops only is
    # already spread, and repartitioning it again costs a second shuffle
    # of the same rows (pq_train's cached frame paid exactly that).
    node = execution.logical()
    while True:
        name = node.getClass().getSimpleName()
        if "Repartition" in name:
            return df
        if name in ("Project", "Filter", "SubqueryAlias") and node.children().size() == 1:
            node = node.children().head()
            continue
        break
    size = int(str(execution.optimizedPlan().stats().sizeInBytes()))
    if size < SPREAD_SIZE_THRESHOLD:
        # Hash-repartition on a deterministic synthetic key instead of
        # round-robin: every keyless repartition(n) first pays a LOCAL
        # SORT of its input (spark.sql.execution.sortBeforeRepartition,
        # on since SPARK-23207 for retry determinism) — and on the
        # single-partition scans this function exists for, that sort
        # runs the whole frame on ONE core before anything spreads
        # (measured: cube_agg 1.07 -> 0.58 s from skipping it).  The
        # key is xxhash64 of monotonically_increasing_id: deterministic
        # for a given input split (unlike rand() — SPARK-38388 row
        # loss/dup under fetch-failure retries), and 16x more distinct
        # values than partitions so the hash spreads evenly (§2.5 of
        # the tuning playbook).  Explicit numPartitions keeps AQE from
        # coalescing it back down.
        return df.repartition(
            target,
            F.pmod(
                F.xxhash64(F.monotonically_increasing_id()),
                F.lit(target * 16),
            ),
        )
    return df
