"""Time-series rollups: moving averages and growth over daily totals.

No reference counterpart (datajudge's date operators stop at span/gap
checks, db_access.py:302-313); this is the standard monitoring surface a
warehouse team expects next to them.

Scale design: the ordered window NEVER runs over raw rows.  The corpus
first aggregates to one row per day (partial-agg'd shuffle on the date),
and the ``ORDER BY date`` window runs on that frame, whose size is
|distinct dates| — bounded by the calendar (decades ~ 10^4 rows), not by
the 100 TB fact table.  Same bounded-domain argument as the cross-CDF
histogram construction (operators/stats.py).  A single-partition sort of
10^4 rows is microseconds; the expensive part (the scan + daily agg)
stays fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_totals(
    df: DataFrame, date_col: str, value: Column, alias: str = "total"
) -> DataFrame:
    """One row per day: ``day, total`` (partial-agg'd single shuffle)."""
    return (
        df.groupBy(F.col(date_col).cast("date").alias("day"))
        .agg(value.alias(alias))
    )


def moving_stats(
    daily: DataFrame,
    value_col: str = "total",
    window_days: int = 7,
) -> DataFrame:
    """Trailing moving average and previous-period delta over a daily
    frame.

    ``moving_avg`` = mean of the last ``window_days`` *present* rows
    (standard trailing window over observed days), ``delta`` = change vs
    the previous present day.  ``moving_sum``/``window_n`` are the exact
    integer numerator/denominator of the average — for integer inputs
    they are the lossless form (an avg of large integers rounds at
    double's ulp boundary, which different engines resolve differently;
    digests that must hash-match cross-engine should use sum+n, not the
    rounded avg).  Input must already be one-row-per-day
    (:func:`daily_totals`) so the ordered window is calendar-bounded.
    """
    w_trail = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    w_lag = Window.orderBy("day")
    return daily.select(
        "day",
        value_col,
        F.round(F.avg(value_col).over(w_trail), 6).alias("moving_avg"),
        F.sum(value_col).over(w_trail).alias("moving_sum"),
        F.count(value_col).over(w_trail).alias("window_n"),
        F.round(
            F.col(value_col) - F.lag(value_col, 1).over(w_lag), 6
        ).alias("delta"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    time_col: str,
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity period,
    counted in every period they were active.

    Returns ``(cohort, period, n_users)``.  Plan shape at event-log
    scale: first-activity is one partial-agg'd min per user; the
    distinct (user, period) activity set is one partial-agg'd distinct;
    they hash-join on the user key (both sides already shuffled by it),
    and the final count aggregates to |cohorts| x |periods| rows —
    calendar-bounded, like every frame the ordered analytics run on.
    """
    first = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.date_trunc(granularity, F.min(time_col)).alias("cohort")
    )
    active = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(granularity, F.col(time_col)).alias("period"),
    ).distinct()
    return (
        first.join(active, "__u")
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
