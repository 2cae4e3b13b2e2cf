"""Sessionization: gaps-and-islands over event streams.

``sessionize`` assigns session ids per key using the classic two-window
construction: a boundary flag where the gap to the previous event
exceeds the timeout, then a running sum of flags as the session id.
Cost: ONE shuffle on the key plus a per-partition sort — the same
minimum as any per-key windowed computation; no state beyond the sort.

The streaming analog is ``F.session_window`` with a watermark (see
datajudge_spark.streaming tests) — same session semantics, incremental
state instead of a sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    timeout: str = "30 minutes",
) -> DataFrame:
    """All input columns plus ``session_id`` (1-based per key).

    A new session starts when the gap to the previous event of the same
    key exceeds ``timeout`` (a Spark interval string). Events exactly at
    the timeout boundary stay in the session (gap > timeout splits).
    """
    gap = F.col(ts).cast("timestamp") - F.lag(F.col(ts).cast("timestamp")).over(
        Window.partitionBy(key).orderBy(ts)
    )
    boundary: Column = F.when(
        gap.isNull() | (gap > F.expr(f"INTERVAL {timeout}")), 1
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(boundary).over(running))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    timeout: str = "30 minutes",
) -> DataFrame:
    """Per-session summary: (key, session_id, n_events, session_start,
    session_end). One extra groupBy over the sessionized frame — the
    (key, session_id) grouping keys are co-partitioned with the
    sessionize shuffle, so AQE plans a cheap local aggregation."""
    sess = sessionize(df, key, ts, timeout)
    return sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.col(ts).cast("timestamp")).alias("session_start"),
        F.max(F.col(ts).cast("timestamp")).alias("session_end"),
    )
