"""Metric layer: every relational operation the engine can express, as
functions ``(spark, DataReference, ...) -> (value, [lazy plan DataFrames])``.

This package is the Spark analog of the reference's ``db_access.py``
(/root/reference/src/datajudge/db_access.py) — the single choke point where
declarative constraints turn into executable plans. See SURVEY.md §2 for the
operator inventory mapping.

DataFrame-first operators with no reference counterpart live in their own
modules and are imported from there directly (not re-exported here):
``asof`` (point-in-time join), ``range_join`` (interval containment),
``sessions`` (gaps-and-islands), ``skew`` (salted join), ``profile``
(table profiler / correlations / per-group top-k / key diagnostics),
``timeseries`` (calendar-bounded moving stats), ``stats`` additionally
holds the PSI drift functions.
"""

from .interval import (
    get_date_gaps,
    get_interval_overlaps_nd,
    get_numeric_gaps,
)
from .regex import get_regex_violations
from .rows import (
    MatchAndCompare,
    duplicates,
    get_column_array_agg,
    get_duplicate_sample,
    get_functional_dependency_violations,
    get_row_difference_count,
    get_row_difference_sample,
    get_row_mismatch,
)
from .scalars import (
    get_date_growth_rate,
    get_date_span,
    get_fraction_between,
    get_max,
    get_max_length,
    get_mean,
    get_min,
    get_min_length,
    get_missing_fraction,
    get_percentile,
    get_row_count,
)
from .schema import (
    clear_primary_keys,
    declare_primary_keys,
    get_column_names,
    get_column_type,
    get_primary_keys,
    normalize_type_name,
)
from .stats import get_cross_cdf, get_ks_2sample
from .uniques import (
    DEFAULT_MAX_UNIQUES,
    get_unique_count,
    get_unique_count_union,
    get_uniques,
)

__all__ = [
    "MatchAndCompare",
    "clear_primary_keys",
    "declare_primary_keys",
    "duplicates",
    "get_column_array_agg",
    "get_column_names",
    "get_column_type",
    "get_cross_cdf",
    "get_date_gaps",
    "get_date_growth_rate",
    "get_date_span",
    "get_duplicate_sample",
    "get_fraction_between",
    "get_functional_dependency_violations",
    "get_interval_overlaps_nd",
    "get_ks_2sample",
    "get_max",
    "get_max_length",
    "get_mean",
    "get_min",
    "get_min_length",
    "get_missing_fraction",
    "get_numeric_gaps",
    "get_percentile",
    "get_primary_keys",
    "get_regex_violations",
    "get_row_count",
    "get_row_difference_count",
    "get_row_difference_sample",
    "get_row_mismatch",
    "get_unique_count",
    "get_unique_count_union",
    "get_uniques",
    "DEFAULT_MAX_UNIQUES",
    "normalize_type_name",
]
