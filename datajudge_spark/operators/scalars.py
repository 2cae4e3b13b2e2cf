"""Scalar / aggregate metric operators.

Spark-first re-expression of the aggregate queries in
/root/reference/src/datajudge/db_access.py (row counts :740-756, min/max
:789-800, mean :803-809, percentile :812-857, lengths :860-875, fraction
between :878-903, missing fraction :967-986, date span :224-299, date growth
:302-313).

Every operator returns ``(value, [DataFrame, ...])`` — the DataFrames are the
lazy plans that produced the value, rendered into failure messages only when a
constraint fails (see ``plans.py``). Only O(1) values cross the driver
boundary; all O(rows) work stays on executors inside whole-stage codegen.

Scale notes (100 TB design):
- counts/min/max/avg/length extremes are single-pass partial aggregations —
  Catalyst plans map-side partial + final agg, no full shuffle.
- ``get_row_count(row_limit=n)`` uses ``df.limit(n)`` so the scan
  short-circuits (LocalLimit) instead of counting 100 TB to answer "are there
  at least n rows" (reference rationale: constraints/nrows.py:41-48).
- the exact percentile avoids a global row_number window (single-partition
  hazard, reference db_access.py:821-825): it aggregates to the distinct-value
  histogram first (one shuffle over |distinct| rows), then takes a cumulative
  sum over values — identical result, bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..condition import Condition, merge_conditions
from ..reference import DataReference

_Plans = list[DataFrame]


def get_row_count(
    spark: SparkSession, ref: DataReference, row_limit: int | None = None
) -> tuple[int, _Plans]:
    """Number of rows, optionally capped at ``row_limit``
    (reference db_access.py:740-756)."""
    selection = ref.get_selection(spark)
    if row_limit:
        selection = selection.limit(row_limit)
    return selection.count(), [selection]


def _get_column_agg(
    spark: SparkSession, ref: DataReference, agg_col
) -> tuple[object, _Plans]:
    """Single-scalar aggregate over the ref's only column
    (reference get_column, db_access.py:759-786)."""
    column = ref.get_column(spark)
    selection = ref.get_selection(spark)
    agg_df = selection.select(agg_col(F.col(column)).alias("value"))
    row = agg_df.first()
    return (row["value"] if row is not None else None), [agg_df]


def get_min(spark: SparkSession, ref: DataReference) -> tuple[object, _Plans]:
    return _get_column_agg(spark, ref, F.min)


def get_max(spark: SparkSession, ref: DataReference) -> tuple[object, _Plans]:
    return _get_column_agg(spark, ref, F.max)


def get_mean(spark: SparkSession, ref: DataReference) -> tuple[object, _Plans]:
    """``avg(cast(col AS double))`` (reference casts to DECIMAL,
    db_access.py:803-809; we document double precision — Spark's avg over
    integers is already exact in double for < 2^53 sums)."""
    value, plans = _get_column_agg(
        spark, ref, lambda c: F.avg(c.cast("double"))
    )
    return (float(value) if value is not None else None), plans


def get_min_length(spark: SparkSession, ref: DataReference) -> tuple[object, _Plans]:
    return _get_column_agg(spark, ref, lambda c: F.min(F.length(c)))


def get_max_length(spark: SparkSession, ref: DataReference) -> tuple[object, _Plans]:
    return _get_column_agg(spark, ref, lambda c: F.max(F.length(c)))


def get_fraction_between(
    spark: SparkSession,
    ref: DataReference,
    lower_bound: str | float,
    upper_bound: str | float,
) -> tuple[float | None, _Plans]:
    """Fraction of rows with ``lower <= col <= upper``
    (reference db_access.py:878-903 runs two counts; we fuse them into ONE
    scan: conditional aggregation avoids the second pass over 100 TB)."""
    column = ref.get_column(spark)
    between = Condition(
        conditions=[
            Condition(raw_string=f"{column} >= {lower_bound}"),
            Condition(raw_string=f"{column} <= {upper_bound}"),
        ],
        reduction_operator="and",
    )
    selection = ref.get_selection(spark)
    agg_df = selection.select(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(between.to_column(), 1)).alias("n_filtered"),
    )
    row = agg_df.first()
    n_all = row["n_all"] if row is not None else 0
    n_filtered = row["n_filtered"] if row is not None else 0
    if n_all == 0:
        return None, [agg_df]
    return n_filtered / n_all, [agg_df]


def get_missing_fraction(
    spark: SparkSession, ref: DataReference
) -> tuple[float, _Plans]:
    """NULL fraction of the ref's column, one scan
    (reference db_access.py:967-986 uses two counts)."""
    column = ref.get_column(spark)
    selection = ref.get_selection(spark)
    agg_df = selection.select(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col(column).isNull(), 1)).alias("n_missing"),
    )
    row = agg_df.first()
    if row is None or row["n_total"] == 0:
        return 0, [agg_df]
    return row["n_missing"] / row["n_total"], [agg_df]


#: Range-bucket count for the two-pass exact percentile.
PERCENTILE_BUCKETS = 4096

#: Refine the target range-bucket while it still holds more rows than
#: this — the bound on what the final single-partition cumulative
#: window is ever asked to sort.
PERCENTILE_REFINE_ROWS = 65536


def _order_proxy_expr(non_null, column: str, dtype: str):
    """A numeric Column that is (non-strictly) MONOTONE in ``column``'s
    sort order, used only to range-bucket non-numeric orderable types —
    never to compare values (ties at proxy granularity just share a
    bucket, and the final cumulative window orders by the true value).

    - date: days since epoch (exact, strictly monotone)
    - timestamp / timestamp_ntz: microseconds since epoch (exact; µs
      magnitudes ~1e15 stay below 2^53, so the double is exact)
    - string: the first 6 bytes AFTER the column-wide common prefix,
      zero-right-padded and read big-endian as a 48-bit integer.  Spark
      and DuckDB both order strings by unsigned UTF-8 byte comparison,
      so the byte prefix is monotone; the zero padding keeps shorter
      strings ordered before their extensions; 48 bits stay exact in a
      double.  Stripping the shared prefix (computed from one min/max
      agg) is what gives key-style columns ('Customer#000…') a usable
      spread instead of one hot bucket.

    The returned expression reads the column via the alias ``__pv_src``
    (callers project ``column AS __pv_src`` first — sidesteps SQL
    identifier quoting inside the string branch's ``expr``).  Returns
    None for types without a cheap monotone proxy (binary, boolean, …) —
    callers fall back to the distinct-value histogram.
    """
    if dtype == "date":
        return F.datediff(
            F.col("__pv_src"), F.lit("1970-01-01")
        ).cast("double")
    if dtype in ("timestamp", "timestamp_ntz"):
        ts = F.col("__pv_src")
        if dtype == "timestamp_ntz":
            ts = ts.cast("timestamp")
        return F.unix_micros(ts).cast("double")
    if dtype == "string":
        mm = non_null.agg(
            F.min(column).alias("lo"), F.max(column).alias("hi")
        ).first()
        if mm is None or mm["lo"] is None:
            return F.lit(0.0)  # empty selection; caught by total == 0
        blo = mm["lo"].encode("utf-8")
        bhi = mm["hi"].encode("utf-8")
        k = 0
        while k < len(blo) and k < len(bhi) and blo[k] == bhi[k]:
            k += 1
        return F.expr(
            "CAST(conv(hex(rpad(substring(CAST(__pv_src AS BINARY), "
            f"{k + 1}, 6), 6, x'00')), 16, 10) AS DOUBLE)"
        )
    return None


def exact_percentile_df(df, column: str, percentage: float):
    """Exact percentile as a 1-row DataFrame, computed scale-out.

    Semantics (reference db_access.py:812-857): the smallest value v such
    that at least ``percentage`` % of non-null values are <= v.
    ``percentile_approx`` is deliberately NOT used (breaks exact
    semantics, SURVEY §7.3.1).

    A naive construction sorts ALL (distinct) values under one global
    window — a single-partition bottleneck on near-unique columns
    (SURVEY §4.4). Instead, two fully-parallel passes:

    1. range-bucket histogram: counts per ``PERCENTILE_BUCKETS`` equal
       ranges (one groupBy; B rows to the driver),
    2. driver cumsum over B bucket counts locates the target bucket,
    3. the cumulative window runs only over the *distinct values of the
       target bucket* (expected |distinct|/B rows; degenerates to the
       naive plan only if every value lands in one bucket).

    The result is identical to the naive construction — the bucketing is
    a partitioning of the sorted domain, not an approximation.

    Non-numeric orderable columns (date/timestamp/string) range-bucket
    on a MONOTONE numeric proxy (:func:`_order_proxy_expr` — day number
    / epoch microseconds / prefix bytes) and then run the exact same
    two-pass plan; the cumulative window still orders by the TRUE value,
    restricted to the target bucket, so a near-unique timestamp column
    no longer degenerates into one global single-partition window.
    Types with no cheap proxy (binary/boolean) keep the distinct-value
    histogram fallback (bounded by |distinct values|).

    Every "have we reached the percentile" test uses the ONE comparison
    form ``cum * 100 >= percentage * total`` — mixing formulations (e.g.
    ``cum >= total*percentage/100`` in one place and ``cum*100/total >=
    percentage`` in another) can disagree by 1 ulp at exact boundaries and
    select off-by-one values.
    """
    from ..pipeline._util import materialize_once

    # The two driver probes (min/max/total, per-bucket counts) and the
    # final target-bucket histogram each scan the input: persist the
    # single-column projection ONCE so passes 2 and 3 read cached
    # blocks instead of re-running the upstream derivation / re-reading
    # the source (callers like mad_outliers and theil_sen pay this
    # three-scan pattern twice per call — measured seconds of the
    # build).  One column persists at ~data/width cost; the cache is
    # freed when the plan is GC'd.
    from ..pipeline._util import spread

    # spread before persisting: the cache keeps its build partitioning,
    # and a single-file scan would otherwise pin every probe pass (the
    # bucket histograms, the refinement min/max, the final window) to
    # the scan's 1-3 tasks.  No-op at real corpus scale.
    non_null = materialize_once(
        spread(df.where(F.col(column).isNotNull()).select(column))
    )
    dtype = dict(df.dtypes)[column]
    numeric = dtype in ("tinyint", "smallint", "int", "bigint", "float",
                        "double") or dtype.startswith("decimal")

    def _locate_bucket(src, bucket_col, cum_before: int, total: int):
        """One bucket-histogram probe: walk the per-bucket counts in
        bucket order with the single canonical comparison form and
        return (target_bucket, cum_before, target_count)."""
        bucket_counts = dict(
            src.groupBy(bucket_col.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        target_bucket = PERCENTILE_BUCKETS - 1
        for b in sorted(bucket_counts):
            if (cum_before + bucket_counts[b]) * 100 >= percentage * total:
                target_bucket = b
                break
            cum_before += bucket_counts[b]
        return target_bucket, cum_before, bucket_counts.get(target_bucket, 0)

    def _cum_select(hist, cum_before: int, total: int):
        w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select(
            "value", (F.sum("cnt").over(w) + F.lit(cum_before)).alias("cum_cnt")
        )
        return cum.where(
            F.col("cum_cnt") * 100 >= F.lit(percentage * total)
        ).select(F.min("value").alias("value"))

    if not numeric:
        pv = _order_proxy_expr(non_null, column, dtype)
        if pv is None:
            # no cheap monotone proxy: distinct-value histogram under
            # one cumulative window (bounded by |distinct values|)
            total = non_null.count()
            if total == 0:
                raise ValueError(
                    "Percentile selection could not be fetched."
                )
            hist = non_null.groupBy(F.col(column).alias("value")).agg(
                F.count(F.lit(1)).alias("cnt")
            )
            return _cum_select(hist, 0, total)
        proj = non_null.select(
            F.col(column).alias("__pv_src")
        ).select(F.col("__pv_src").alias("value"), pv.alias("__pv"))
        stats = proj.agg(
            F.min("__pv").alias("lo"),
            F.max("__pv").alias("hi"),
            F.count(F.lit(1)).alias("total"),
        ).first()
        if stats is None or stats["total"] == 0 or stats["lo"] is None:
            raise ValueError("Percentile selection could not be fetched.")
        lo, hi, total = (
            float(stats["lo"]), float(stats["hi"]), int(stats["total"])
        )
        if hi == lo:
            # proxy cannot split the domain (single value, or strings
            # identical through 6 bytes past the common prefix): the
            # histogram stays bounded by |distinct values|
            hist = proj.groupBy("value").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            return _cum_select(hist, 0, total)
        # iterative range refinement (see the numeric branch below):
        # re-bucket within the target bucket while it still holds more
        # rows than one window task should sort
        cum_before, src = 0, proj
        while True:
            bucket = F.least(
                F.floor(
                    (F.col("__pv") - lo) / (hi - lo) * PERCENTILE_BUCKETS
                ),
                F.lit(PERCENTILE_BUCKETS - 1),
            ).cast("int")
            target_bucket, cum_before, tb_count = _locate_bucket(
                src, bucket, cum_before, total
            )
            src = src.where(bucket == target_bucket)
            if tb_count <= PERCENTILE_REFINE_ROWS:
                break
            sub = src.agg(
                F.min("__pv").alias("lo"), F.max("__pv").alias("hi")
            ).first()
            lo2, hi2 = float(sub["lo"]), float(sub["hi"])
            if hi2 == lo2:
                break
            lo, hi = lo2, hi2
        hist = src.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
        return _cum_select(hist, cum_before, total)

    stats = non_null.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count(F.lit(1)).alias("total"),
    ).first()
    if stats is None or stats["total"] == 0 or stats["lo"] is None:
        raise ValueError("Percentile selection could not be fetched.")
    lo, hi, total = float(stats["lo"]), float(stats["hi"]), int(stats["total"])
    value_col = F.col(column).cast("double")
    if hi == lo:
        return non_null.agg(F.min(column).alias("value"))
    # Iterative range REFINEMENT: on heavy-tailed domains (pairwise
    # slopes, deviations) the outlier-stretched [lo, hi] puts nearly all
    # mass in one linear bucket, and the final cumulative window would
    # sort that bucket's distinct values on ONE task — the §4.4 hazard
    # this two-pass plan exists to avoid (measured: 1.28M of theil_sen's
    # 2.9M pair slopes in a single bucket).  Re-bucket WITHIN the target
    # bucket (filter by bucket id — a pure partition of the sorted
    # domain, so the selected value is identical) until it is small;
    # each level is one cheap probe over the cached projection and
    # shrinks the range by up to PERCENTILE_BUCKETS x.
    cum_before, src = 0, non_null
    while True:
        bucket = F.least(
            F.floor((value_col - lo) / (hi - lo) * PERCENTILE_BUCKETS),
            F.lit(PERCENTILE_BUCKETS - 1),
        ).cast("int")
        target_bucket, cum_before, tb_count = _locate_bucket(
            src, bucket, cum_before, total
        )
        src = src.where(bucket == target_bucket)
        if tb_count <= PERCENTILE_REFINE_ROWS:
            break
        sub = src.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).first()
        lo2, hi2 = float(sub["lo"]), float(sub["hi"])
        if hi2 == lo2:
            break
        lo, hi = lo2, hi2
    hist = (
        src.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _cum_select(hist, cum_before, total)


def exact_percentiles_df(df, column: str, percentages: list[float]):
    """Several exact percentiles from ONE shared histogram pass.

    Same semantics per target as :func:`exact_percentile_df` (smallest v
    with >= p%% of non-null values <= v, identical single comparison
    form), but the expensive work is shared: one stats pass, one
    range-bucket histogram, and ONE filtered scan covering the union of
    target buckets — 3 scans total for ANY number of percentiles, where
    repeated single calls would pay 3 each. The per-bucket cumulative
    windows stay bounded by |distinct values in bucket| exactly as in
    the single-target construction.

    Numeric columns only (the monitoring use case: p50/p90/p99 bands in
    one pass). Returns one row with a ``p{pct:g}`` column per target.
    """
    if not percentages:
        raise ValueError("At least one percentage is required.")
    from ..pipeline._util import materialize_once, spread

    # same three-pass sharing discipline as exact_percentile_df: the
    # stats probe, the bucket histogram and the union-of-target-buckets
    # scan all read ONE spread, persisted single-column projection
    # instead of re-scanning the source serially (a single-file scan
    # reads as 1 task; spread no-ops at corpus scale)
    non_null = materialize_once(
        spread(df.where(F.col(column).isNotNull()).select(column))
    )
    stats = non_null.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.count(F.lit(1)).alias("total"),
    ).first()
    if stats is None or stats["total"] == 0 or stats["lo"] is None:
        raise ValueError("Percentile selection could not be fetched.")
    lo, hi, total = float(stats["lo"]), float(stats["hi"]), int(stats["total"])

    def _name(p: float) -> str:
        return f"p{p:g}".replace(".", "_")

    if hi == lo:
        single = non_null.agg(F.min(column).alias("v"))
        return single.select(
            *[F.col("v").alias(_name(p)) for p in percentages]
        )
    value_col = F.col(column).cast("double")
    bucket = F.least(
        F.floor((value_col - lo) / (hi - lo) * PERCENTILE_BUCKETS),
        F.lit(PERCENTILE_BUCKETS - 1),
    ).cast("int")
    bucket_counts = dict(
        non_null.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # per-target bucket + its preceding cumulative count (driver fold
    # over <= PERCENTILE_BUCKETS integers)
    targets: dict[float, int] = {}
    cum_before_map: dict[int, int] = {}
    for pct in percentages:
        cum_before, target_bucket = 0, PERCENTILE_BUCKETS - 1
        for b in sorted(bucket_counts):
            if (cum_before + bucket_counts[b]) * 100 >= pct * total:
                target_bucket = b
                break
            cum_before += bucket_counts[b]
        targets[pct] = target_bucket
        cum_before_map[target_bucket] = cum_before
    needed = sorted(set(targets.values()))
    offset_entries = []
    for b in needed:
        offset_entries += [F.lit(b), F.lit(cum_before_map[b])]
    offsets = F.create_map(*offset_entries)
    hist = (
        non_null.where(bucket.isin(needed))
        .groupBy(bucket.alias("b"), F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("b")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "b",
        "value",
        (F.sum("cnt").over(w) + offsets[F.col("b")]).alias("cum_cnt"),
    )
    # one aggregate emits every band: conditional min per target, the
    # same single comparison form as the single-target operator
    aggs = [
        F.min(
            F.when(
                (F.col("b") == targets[pct])
                & (F.col("cum_cnt") * 100 >= F.lit(pct * total)),
                F.col("value"),
            )
        ).alias(_name(pct))
        for pct in percentages
    ]
    return cum.agg(*aggs)


def get_percentile(
    spark: SparkSession, ref: DataReference, percentage: float
) -> tuple[float, _Plans]:
    """Exact percentile metric (see :func:`exact_percentile_df`)."""
    column = ref.get_column(spark)
    selection = ref.get_selection(spark)
    candidates = exact_percentile_df(selection, column, percentage)
    row = candidates.first()
    if row is None or row["value"] is None:
        raise ValueError("Percentile selection could not be fetched.")
    return float(row["value"]), [candidates]


def get_date_span(
    spark: SparkSession, ref: DataReference, date_column_name: str
) -> tuple[float, _Plans]:
    """``datediff(day, min(col), max(col))`` as float — the reference needs six
    dialect variants for this (db_access.py:224-299); Spark needs one."""
    selection = ref.get_selection(spark)
    agg_df = selection.select(
        F.datediff(
            F.max(F.col(date_column_name)).cast("date"),
            F.min(F.col(date_column_name)).cast("date"),
        ).alias("span")
    )
    row = agg_df.first()
    if row is None or row["span"] is None:
        raise ValueError("Date span could not be fetched.")
    span = float(row["span"])
    if span < 0:
        raise ValueError(f"Date span has negative value: {span}. It must be positive.")
    return span, [agg_df]


def get_date_growth_rate(
    spark: SparkSession,
    ref: DataReference,
    ref2: DataReference,
    date_column: str,
    date_column2: str,
) -> tuple[float, _Plans]:
    """date_span(ref)/date_span(ref2) - 1 (reference db_access.py:302-313)."""
    span1, plans1 = get_date_span(spark, ref, date_column)
    span2, plans2 = get_date_span(spark, ref2, date_column2)
    if span2 == 0:
        raise ValueError("Reference date span is not allowed to be zero.")
    return span1 / span2 - 1, [*plans1, *plans2]


def exact_weighted_percentile_df(
    df, column: str, weight_column: str, percentage: float
):
    """Exact WEIGHTED percentile as a 1-row DataFrame (extension; the
    reference's percentile is unweighted, db_access.py:812-857).

    Semantics: the smallest value v such that the cumulative weight of
    rows with value <= v reaches ``percentage`` % of the total weight.
    With all weights 1 this is exactly :func:`exact_percentile_df`.

    Weights must be non-negative integers (counts, cents, token counts)
    so every cumulative sum is exact — no float accumulation order to
    disagree about; a negative ``min(weight)`` raises (it would break
    the monotone cumulative and silently return a wrong value). The
    plan is the same two fully-parallel passes as the unweighted
    operator: a range-bucket histogram of SUM(weight) (B rows to the
    driver), a driver cumsum to locate the target bucket, then a
    cumulative window over the distinct values of that bucket only.
    The boundary test keeps the ONE comparison form, with
    ``percentage`` expanded to an exact rational p_num/p_den:
    ``cum * 100 * p_den >= p_num * total`` — all-integer on both the
    driver and the engine, so the two never disagree even when
    ``percentage * total`` exceeds double's 2^53 (keep ``percentage``
    a short decimal; a 15-digit repeating fraction inflates p_den and
    with it the decimal width headroom).
    """
    from fractions import Fraction

    from ..pipeline._util import materialize_once

    # same three-pass shape as exact_percentile_df: persist the 2-column
    # projection so the stats probe, bucket-weights probe and final
    # target-bucket histogram scan the source once, not three times
    non_null = materialize_once(
        df.where(
            F.col(column).isNotNull() & F.col(weight_column).isNotNull()
        ).select(column, weight_column)
    )
    w = F.col(weight_column).cast("decimal(38,0)")
    # percentage as an exact rational (Fraction parses the decimal
    # string exactly), so the boundary test is INTEGER arithmetic on
    # both the driver and the engine — a double RHS degrades to 2^53
    # precision and can disagree with the driver-side bucket selection
    # for petabyte-scale weight totals
    frac = Fraction(str(percentage))
    p_num, p_den = frac.numerator, frac.denominator

    def _cum_select(hist, cum_before: int, total: int):
        win = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select(
            "value",
            (F.sum("wsum").over(win) + F.lit(cum_before).cast("decimal(38,0)"))
            .alias("cum_w"),
        )
        rhs = F.lit(str(p_num * total)).cast("decimal(38,0)")
        return cum.where(
            F.col("cum_w") * (100 * p_den) >= rhs
        ).select(F.min("value").alias("value"))

    stats = non_null.agg(
        F.min(column).alias("lo"),
        F.max(column).alias("hi"),
        F.sum(w).alias("total"),
        F.min(w).alias("wmin"),
    ).first()
    if stats is None or stats["total"] is None or int(stats["total"]) <= 0:
        raise ValueError("Weighted percentile could not be fetched.")
    if int(stats["wmin"]) < 0:
        raise ValueError(
            "Weighted percentile requires non-negative weights; "
            f"min({weight_column}) = {stats['wmin']}."
        )
    lo, hi, total = float(stats["lo"]), float(stats["hi"]), int(stats["total"])
    if hi == lo:
        return non_null.agg(F.min(column).alias("value"))
    value_col = F.col(column).cast("double")
    bucket = F.least(
        F.floor((value_col - lo) / (hi - lo) * PERCENTILE_BUCKETS),
        F.lit(PERCENTILE_BUCKETS - 1),
    ).cast("int")
    bucket_weights = dict(
        non_null.groupBy(bucket.alias("b")).agg(F.sum(w).alias("ws")).collect()
    )
    cum_before, target_bucket = 0, PERCENTILE_BUCKETS - 1
    for b in sorted(bucket_weights):
        if (cum_before + int(bucket_weights[b])) * 100 * p_den >= p_num * total:
            target_bucket = b
            break
        cum_before += int(bucket_weights[b])
    hist = (
        non_null.where(bucket == target_bucket)
        .groupBy(F.col(column).alias("value"))
        .agg(F.sum(w).alias("wsum"))
    )
    return _cum_select(hist, cum_before, total)


def grouped_exact_percentile(
    df: DataFrame, group_col: str, value_col: str, percentage: float
) -> DataFrame:
    """Exact per-group percentile (smallest v such that at least
    ``percentage``% of the group's non-null values are <= v) — the
    grouped form of :func:`exact_percentile_df`, one row per group.

    The cumulative window is PARTITIONED BY GROUP over each group's
    distinct-VALUE histogram — parallel across groups, and within a
    group bounded by |distinct values| (best on bounded domains:
    quantities, ratings, day counts; a near-unique column concentrated
    in ONE group degenerates to that group's sort, at which point the
    two-pass bucketed single-group form is the right tool).

    The acceptance test uses the single comparison form
    ``cum * 100 >= percentage * total`` (see exact_percentile_df's
    ulp-boundary note).
    """
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "grp",
        "v",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        cum.where(F.col("cum") * 100 >= F.lit(percentage) * F.col("total"))
        .groupBy("grp")
        .agg(F.min("v").alias("value"))
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentages: list,
) -> DataFrame:
    """Several exact per-group percentiles in ONE pass: one row per
    group with a ``p{n}`` column per requested percentage (smallest v
    such that at least n% of the group's non-null values are <= v).

    Any number of percentiles shares the single group-partitioned
    cumulative window and ONE aggregate — never a pass per quantile
    (the multi-quantile form of :func:`grouped_exact_percentile`; same
    bounded-domain caveat, same single comparison form).
    """
    if not percentages:
        raise ValueError("percentages must be non-empty")
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "grp",
        "v",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    def _alias(p):
        return f"p{int(p)}" if float(p).is_integer() else f"p{p}".replace(".", "_")
    aggs = [
        F.min(
            F.when(
                F.col("cum") * 100 >= F.lit(float(p)) * F.col("total"),
                F.col("v"),
            )
        ).alias(_alias(p))
        for p in percentages
    ]
    return cum.groupBy("grp").agg(*aggs)


def winsorized_stats(
    df, column: str, p_lo: float = 1.0, p_hi: float = 99.0
):
    """Winsorized digest of an INTEGER-valued column: one row
    ``(n, lo_cut, hi_cut, n_clipped_lo, n_clipped_hi, winsorized_mean)``
    where values below the exact ``p_lo`` percentile clip up to it,
    values above the exact ``p_hi`` percentile clip down, and the mean
    is taken over the clipped values — the robust location estimate a
    monitoring gate wants when a fat tail would drag the plain mean
    (the trimming companion to the MAD outlier gates).

    Exactness/scale design:

    - both cut points come from ONE shared range-bucketed histogram
      pass (:func:`exact_percentiles_df` — reference percentile
      semantics, no global sort at any cardinality);
    - the cuts broadcast into a single aggregate over the fact scan —
      two scans total regardless of table size, no window over rows;
    - the clipped mean divides a DECIMAL(38,0)-exact integer sum by the
      exact count, so it is partition-order independent (a double
      running mean is not); input must be integer-valued (cents, ids,
      counts) — the decimal cast truncates fractions.
    """
    if not (0.0 < p_lo < p_hi < 100.0):
        raise ValueError("need 0 < p_lo < p_hi < 100")

    def _name(p: float) -> str:
        return f"p{p:g}".replace(".", "_")

    cuts = exact_percentiles_df(df, column, [p_lo, p_hi]).select(
        F.col(_name(p_lo)).alias("__lo"), F.col(_name(p_hi)).alias("__hi")
    )
    x = F.col(column)
    clipped = F.least(F.greatest(x, F.col("__lo")), F.col("__hi"))
    return (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(cuts))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("lo_cut"),
            F.first("__hi").alias("hi_cut"),
            F.sum(F.when(x < F.col("__lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(x > F.col("__hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.round(
                F.sum(clipped.cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
    )
