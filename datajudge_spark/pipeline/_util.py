"""Shared pipeline plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Relations larger than this are assumed to already scan with adequate
#: parallelism; smaller ones are repartitioned before CPU-heavy map work.
SPREAD_SIZE_THRESHOLD = 1 << 30  # 1 GiB


def materialize_once(df: DataFrame) -> DataFrame:
    """Compute ``df`` at most once even when it feeds several plan
    branches (self-joins, size lookups, convergence checks).

    Spark does not share common subplans across join branches — a
    self-join of an expensive derivation (shingle explode + hashing)
    recomputes it per branch unless the exchange happens to be reused.
    ``localCheckpoint(eager=False)`` stays lazy, materializes on first
    action into the block manager (memory, spilling to disk), truncates
    lineage, and every consumer reads the materialized blocks. At
    cluster scale this is the standard persist-the-reused-stage pattern;
    blocks are freed when the plan is garbage collected.
    """
    return df.localCheckpoint(eager=False)


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
    if "Repartition" in execution.logical().getClass().getSimpleName():
        return df
    size = int(str(execution.optimizedPlan().stats().sizeInBytes()))
    if size < SPREAD_SIZE_THRESHOLD:
        return df.repartition(target)
    return df
