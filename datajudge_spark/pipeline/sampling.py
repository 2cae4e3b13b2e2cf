"""Deterministic (hash-based) sampling for reproducible corpus splits.

No reference analog. ``df.sample()`` is seed-deterministic only for a
fixed partitioning — re-shard the input (different file sizes, AQE
coalescing, a repartition upstream) and the sample changes, which is
unacceptable for train/validation splits of a 100 TB corpus that is
re-materialized over time. Hash-based sampling decides membership from
the ROW (a stable key), not from partition-local RNG state:

    keep  <=>  md5(key) mod denominator < rate

so the split is stable across partitionings, engines, and re-runs, and
is a pure map-side filter — no shuffle, no state, pushes through any
scan. The per-stratum rate variant under-/over-samples strata (e.g.
downsample dominant languages) in the same single pass.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datajudge_spark.pipeline._util import in_literal_list
from datajudge_spark.pipeline.text import md5_long

#: Sampling rates are expressed per-mille style over this denominator.
SAMPLE_DENOMINATOR = 100


def sample_bucket(key: Column | str, salt: int | str | None = None) -> Column:
    """Stable bucket in ``[0, SAMPLE_DENOMINATOR)`` for a key column.

    ``salt`` selects an independent hash family (independent splits from
    the same key, e.g. a val split drawn independently of a test split).
    """
    key = F.col(key) if isinstance(key, str) else key
    return md5_long(key.cast("string"), salt=salt) % SAMPLE_DENOMINATOR


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: int,
    salt: int | str | None = None,
) -> DataFrame:
    """Rows whose stable bucket falls under ``rate`` (out of 100)."""
    return df.where(sample_bucket(key_col, salt=salt) < F.lit(rate))


def stratified_sample_counts(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: Mapping[str, int],
    default_rate: int,
    salt: int | str | None = None,
) -> DataFrame:
    """Audit a stratified sample in ONE pass over the corpus.

    Per stratum: total rows, rows the deterministic sample keeps at that
    stratum's rate, and the observed fraction. ``rates`` maps stratum
    value -> rate out of 100; unlisted strata use ``default_rate``. The
    rate lookup is a literal CASE expression (pure map, codegen'd) and
    the two counts come from a single conditional aggregation — one scan,
    one shuffle, regardless of corpus size.
    """
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    kept = (sample_bucket(key_col, salt=salt) < rate).cast("long")
    return (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("total"),
            F.sum(kept).alias("sampled"),
        )
        .select(
            "stratum",
            "total",
            "sampled",
            F.round(F.col("sampled") / F.col("total"), 6).alias("observed_rate"),
        )
    )


def stratified_percentile_threshold(
    df: DataFrame, strata_col: str, value_col: str, percentage: float
) -> DataFrame:
    """Exact per-stratum percentile threshold, computed scale-out.

    Returns ``(stratum, threshold)`` where ``threshold`` is the smallest
    value v such that at least ``percentage`` % of the stratum's non-null
    values are <= v (the reference's percentile definition,
    db_access.py:812-857, applied per group).

    A per-group sort of raw rows would put an entire stratum in one
    window partition — the dominant stratum of a skewed corpus becomes a
    single-task sort. Instead the window runs over the per-stratum
    VALUE HISTOGRAM: ``groupBy(stratum, value)`` with map-side partial
    counts first, so window partition sizes are bounded by the distinct
    values per stratum (e.g. document lengths), not its row count. For
    near-unique value domains use the range-bucketed two-pass
    ``operators.scalars.exact_percentile_df`` per stratum instead.
    """
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(strata_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = (
        Window.partitionBy(strata_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(strata_col)
    cum = hist.select(
        F.col(strata_col).alias("stratum"),
        F.col(value_col).alias("_v"),
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_total"),
    )
    return (
        cum.where(F.col("_cum") >= F.lit(percentage / 100.0) * F.col("_total"))
        .groupBy("stratum")
        .agg(F.min("_v").alias("threshold"))
    )


def stratified_trim_counts(
    df: DataFrame, strata_col: str, value_col: str, percentage: float
) -> DataFrame:
    """Audit a per-stratum lower-percentile trim in one extra pass.

    Per stratum: the exact ``percentage``-percentile threshold of
    ``value_col``, total rows, rows kept by ``value >= threshold``, and
    rows trimmed. The threshold table is tiny (one row per stratum) and
    is broadcast back onto the corpus — the audit pass is scan +
    broadcast join + one aggregation shuffle.
    """
    thr = stratified_percentile_threshold(df, strata_col, value_col, percentage)
    kept = (F.col(value_col) >= F.col("threshold")).cast("long")
    return (
        df.join(
            F.broadcast(thr), df[strata_col] == thr["stratum"], "inner"
        )
        .groupBy("stratum", "threshold")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(kept).alias("kept"),
        )
        .select(
            "stratum",
            "threshold",
            "total",
            "kept",
            (F.col("total") - F.col("kept")).alias("trimmed"),
        )
    )


def mixture_weights(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled sampling weights per source.

    Multi-source training mixes rarely sample proportionally: raising the
    share of each source to ``alpha < 1`` up-weights small sources
    (alpha=1 proportional, alpha=0 uniform).  Returns one row per source
    with its document count and normalized weight
    ``n^alpha / sum(n^alpha)``.

    One count-shuffle over the corpus; the normalization window runs on
    the aggregated frame (|sources| rows), so corpus size only affects
    the first aggregation — which is partial-agg'd map-side.
    """
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scaled = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    w = Window.partitionBy()
    return counts.select(
        "source",
        "n_docs",
        F.round(scaled / F.sum(scaled).over(w), 6).alias("weight"),
    )


def group_split_counts(
    df: DataFrame,
    group_col: str,
    val_rate: int = 10,
    salt: int | str = "split",
    agg_cols: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Audit a leakage-safe train/validation split.

    The split is drawn at the *group* level (e.g. source domain): every
    row of a group lands in the same split, so near-duplicates within a
    group can never straddle train and validation.  Membership is the
    stable md5 bucket of the group key — re-running on re-partitioned or
    re-materialized data yields the identical split.

    Returns one row per split with row count and group count (plus any
    ``agg_cols``).  One conditional-aggregation scan; nothing but the
    two-row digest reaches the driver.
    """
    split = F.when(
        sample_bucket(group_col, salt=salt) < F.lit(val_rate), F.lit("val")
    ).otherwise(F.lit("train"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(group_col)).alias("n_groups"),
    ]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    return df.groupBy(split.alias("split")).agg(*aggs)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: int | str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): each row draws a reproducible uniform ``u`` in
    (0, 1] from the md5 hash of its key, gets priority ``ln(u) / w``,
    and the ``k`` rows with the LARGEST priority form the sample —
    distributionally identical to sequential weighted draws without
    replacement, but embarrassingly parallel and replay-stable.

    The training-data use case: sample a fixed-size corpus slice where
    long/high-quality documents are proportionally more likely, without
    an RNG whose state would make re-materialization non-reproducible.

    Scale: ``orderBy(priority).limit(k)`` compiles to
    ``TakeOrderedAndProject`` (per-partition heaps; only k rows per
    partition reach the driver-side merge) — no global sort.  The hash
    is the engine-portable md5 fold (``text.md5_long``), and ln/division
    are IEEE-identical cross-engine (same precedent as the
    mutual-information / JS-divergence oracles), so the sampled SET is
    oracle-checkable.  Rows with NULL keys or non-positive/NULL weights
    are excluded (ln(u)/w flips sign for w < 0, silently corrupting the
    ranking — exclusion is the only safe semantics).

    Returns ``(key, weight, priority)`` with priority rounded to 6dp.
    """
    if k < 1:
        raise ValueError("k must be >= 1.")
    two60 = float(2**60)
    base = df.where(
        F.col(key_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("double").alias("weight"),
        md5_long(F.col(key_col).cast("string"), salt=salt).alias("__h"),
    )
    u = (F.col("__h").cast("double") + 1.0) / F.lit(two60 + 1.0)
    pri = F.log(u) / F.col("weight")
    return (
        base.select("key", "weight", pri.alias("__p"))
        .orderBy(F.col("__p").desc(), F.col("key").asc())
        .limit(k)
        .select("key", "weight", F.round("__p", 6).alias("priority"))
    )


def contrastive_negatives(
    df: DataFrame,
    id_col: str,
    label_col: str,
    query_ids: list,
    n_negatives: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each query id ``q`` and draw index ``j`` in ``1..n_negatives``,
    the negative is the row of ``df`` with a DIFFERENT label minimizing
    ``md5(id#q#j)`` — an independent uniform draw per (q, j) with no
    RNG state, reproducible across engines and runs (the property that
    makes negative sets auditable and resumable).

    Plan: the query rows are collected (``len(query_ids)`` rows — the
    query set is the SMALL side by definition) and cross-joined as a
    broadcast literal spec of (q, q_label, j) onto the corpus; the
    map-side partial ``min_by`` means the shuffle carries one candidate
    per (q, j) PER TASK, never the expanded corpus — the same scale
    shape as a top-k heap.  Output: one row per (query_id, draw) with
    the chosen negative id/label and the winning hash.
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if n_negatives < 1:
        raise ValueError("n_negatives must be >= 1")
    spark = df.sparkSession
    qlab = {
        r["q"]: r["lab"]
        for r in df.where(in_literal_list(id_col, query_ids))
        .select(F.col(id_col).alias("q"), F.col(label_col).alias("lab"))
        .collect()
    }
    missing = [q for q in query_ids if q not in qlab]
    if missing:
        raise ValueError(f"query ids not found in corpus: {missing}")
    # Derive the spec schema from the corpus columns so string/decimal
    # ids and labels keep their types through the broadcast join (a
    # hardcoded long/int spec would miscast or fail at createDataFrame).
    id_type = df.schema[id_col].dataType
    label_type = df.schema[label_col].dataType
    spec_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("q_label", label_type),
            T.StructField("draw", T.IntegerType()),
        ]
    )
    spec = spark.createDataFrame(
        [
            (q, qlab[q], j)
            for q in query_ids
            for j in range(1, n_negatives + 1)
        ],
        spec_schema,
    )
    h = md5_long(
        F.concat_ws(
            "#",
            F.col(id_col).cast("string"),
            F.col("query_id").cast("string"),
            F.col("draw").cast("string"),
        )
    )
    cand = (
        df.select(id_col, label_col)
        .crossJoin(F.broadcast(spec))
        .where(
            (F.col(label_col) != F.col("q_label"))
            & (F.col(id_col) != F.col("query_id"))
        )
        .withColumn("h", h)
    )
    return (
        cand.groupBy("query_id", "draw")
        .agg(
            F.min_by(F.col(id_col), F.col("h")).alias("neg_id"),
            F.min_by(F.col(label_col), F.col("h")).alias("neg_label"),
            F.min("h").alias("h"),
        )
        .orderBy("query_id", "draw")
    )
