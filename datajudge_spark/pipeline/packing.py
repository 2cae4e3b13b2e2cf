"""Deterministic corpus shuffling and sequence packing for training data.

Two operations every pre-training data pipeline runs after curation:

- **shard shuffle**: assign every document a (shard, position) so that
  reading shards in parallel and positions in order yields a global
  pseudo-random document order. The assignment must be a pure function
  of the document id — stable across partitionings, re-materializations
  and engine versions — so training runs are reproducible and resumable.
- **sequence packing** (GPT-style concat-then-split): documents are
  concatenated in shuffle order and emitted as fixed token-budget
  sequences; each document's pack id and offset follow from the running
  token total. Documents may straddle a pack boundary (the standard
  concatenation objective); boundary-respecting bin packing is a greedy,
  order-dependent algorithm and deliberately NOT what this computes.

Scale design: the only shuffle is the hash-partition by ``shard``; the
ordered window runs *within* a shard (bounded by corpus_size /
n_shards, parallel across shards). At 100 TB you pick n_shards in the
tens of thousands — the same number you want for training-reader
parallelism anyway — so no per-shard partition ever approaches driver
or executor limits. Nothing is collected; position/pack assignment
ships with the rows.

The shuffle key is the md5-derived 60-bit integer also used by
``pipeline.sampling`` (deterministic, engine-portable — the DuckDB
oracle recomputes it bit-for-bit), NOT ``F.hash`` (Spark-private) or
``rand()`` (not a function of the row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["shard_shuffle", "pack_sequences"]


def _shuffle_key(id_col: str, salt: str = "shuffle"):
    """60-bit integer hash of the id — pure function of the row,
    identical in Spark and the DuckDB oracle (15 hex chars < 2^60)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))), 1, 15),
        16,
        10,
    ).cast("bigint")


def shard_shuffle(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8
) -> DataFrame:
    """(id, shard, pos): deterministic global shuffle order.

    ``shard = key mod n_shards``; ``pos`` = rank of the key within the
    shard (ties broken by id, making the order total even on hash
    collisions). Reading shards round-robin by position yields the
    shuffled corpus.
    """
    key = _shuffle_key(id_col)
    w = Window.partitionBy("shard").orderBy("__dj_key", id_col)
    return (
        df.select(
            F.col(id_col),
            key.alias("__dj_key"),
            F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__dj_key")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """(id, shard, pack_id, pack_offset): concat-then-split packing.

    Documents are laid out in shard-shuffle order; a document whose
    concatenation starts at running offset ``s`` lands in pack
    ``s div budget`` at offset ``s mod budget``. One window pass per
    shard computes the running total; no iteration, no driver state.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = _shuffle_key(id_col)
    w = (
        Window.partitionBy("shard")
        .orderBy("__dj_key", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("bigint")
    return (
        df.select(
            F.col(id_col),
            F.col(token_col),
            key.alias("__dj_key"),
            F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
        )
        .select(id_col, "shard", start.alias("__dj_start"))
        .select(
            id_col,
            "shard",
            # integer div/mod, never a double round-trip (exact at any size)
            F.expr(f"__dj_start div {int(budget)}").cast("bigint").alias("pack_id"),
            F.pmod(F.col("__dj_start"), F.lit(int(budget)))
            .cast("bigint")
            .alias("pack_offset"),
        )
    )
