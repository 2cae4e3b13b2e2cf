"""Driver-side post-processing of collected (small) results.

The names here are public API surface shared with the reference's
``datajudge.utils`` (users pass ``filternull_*`` as ``filter_func`` and
``output_processor_*`` as ``output_processors``), and the behavior is
contract: digit-diff highlighting feeds the formatter's tag vocabulary,
the sort/limit processors shape counterexample listings, and the
none-aware sort defines how NULL-bearing tuples order in failure
messages.  Everything operates on already-collected driver data — never
on executor-side frames.
"""

from __future__ import annotations

from itertools import zip_longest
from collections.abc import Collection
from typing import Protocol


def format_difference(
    n1: float | int, n2: float | int, decimal_separator: bool = True
) -> tuple[str, str]:
    """Render two numbers with the digits AFTER their first divergence
    wrapped in ``[numDiff]`` tags (the formatter decides how those
    render — stripped in logs, cyan in terminals).  Grouping separators
    participate in the comparison, so ``1,200`` vs ``1,300`` highlights
    ``300``, not the whole string."""
    rendered = (
        (f"{n1:,}", f"{n2:,}") if decimal_separator else (str(n1), str(n2))
    )
    split = 0
    for a, b in zip_longest(*rendered):
        if a != b:
            break
        split += 1

    def tag_suffix(text: str) -> str:
        head, tail = text[:split], text[split:]
        return head + (f"[numDiff]{tail}[/numDiff]" if tail else "")

    return tag_suffix(rendered[0]), tag_suffix(rendered[1])


class OutputProcessor(Protocol):
    def __call__(
        self,
        collection: Collection,
        counts: Collection | None = None,
    ) -> tuple[Collection, Collection | None]: ...


def output_processor_sort(
    collection: Collection, counts: Collection | None = None
) -> tuple[Collection, Collection | None]:
    """Order counterexamples by count descending, ties by element
    ascending (none-aware).  Scalar collections are packaged as
    1-tuples, sorted, and unpacked, so the same processor serves
    single- and multi-column listings."""
    items = list(collection)
    if not items:
        return items, counts
    if not isinstance(items[0], tuple):
        wrapped, sorted_counts = output_processor_sort(
            [(value,) for value in items], counts
        )
        return [value for (value,) in wrapped], sorted_counts

    if counts is None:
        return sort_tuple_none_aware(items), counts
    if len(items) != len(counts):
        raise ValueError("collection and counts must have the same length")
    if len(items) <= 1:
        return items, counts

    # negate counts and prepend: one none-aware ascending sort then
    # gives count-descending, element-ascending
    keyed = sort_tuple_none_aware(
        [(-count, *item) for item, count in zip(items, counts)]
    )
    return [row[1:] for row in keyed], [-row[0] for row in keyed]


def output_processor_limit(
    collection: Collection, counts: Collection | None = None, limit: int = 100
) -> tuple[Collection, Collection | None]:
    """Cap a listing at ``limit`` entries, appending an explicit
    truncation notice so a shortened message can never be mistaken for
    a complete one."""
    items = list(collection)
    kept = items[:limit]
    kept_counts = None if counts is None else list(counts)[:limit]
    if len(items) > limit:
        notice = (
            f"<SHORTENED OUTPUT, displaying the first {limit} / "
            f"{len(items)} {{what}} above>"
        )
        kept.append(notice.format(what="elements"))
        if kept_counts is not None:
            kept_counts.append(notice.format(what="counts"))
    return kept, kept_counts


def filternull_element(values: list) -> list:
    return [value for value in values if value is not None]


def filternull_never(values: list) -> list:
    return values


def _tuple_nulls(value, mode) -> bool:
    return isinstance(value, tuple) and mode(x is None for x in value)


def filternull_element_or_tuple_all(values: list) -> list:
    return [
        value
        for value in values
        if value is not None and not _tuple_nulls(value, all)
    ]


def filternull_element_or_tuple_any(values: list) -> list:
    return [
        value
        for value in values
        if value is not None and not _tuple_nulls(value, any)
    ]


def sort_tuple_none_aware(
    collection: Collection[tuple], ascending: bool = True
) -> Collection[tuple]:
    """Stable sort of equal-length tuples where ``None`` participates
    as the column type's zero value (0, 0.0, "") — so NULL-bearing rows
    interleave deterministically instead of raising on ``None < int``.
    Each column's type is inferred from its first non-None value; an
    all-None column compares as integers."""
    rows = list(collection)
    if len(rows) <= 1:
        return rows
    width = len(rows[0])
    if any(not isinstance(row, tuple) or len(row) != width for row in rows):
        raise ValueError("all elements must be tuples and have the same length")

    def column_zero(idx: int):
        type_of_first_value = next(
            (type(row[idx]) for row in rows if row[idx] is not None), int
        )
        return type_of_first_value()

    zeros = [column_zero(idx) for idx in range(width)]

    def null_safe_key(row: tuple) -> tuple:
        return tuple(
            zero if value is None else value
            for value, zero in zip(row, zeros)
        )

    return sorted(rows, key=null_safe_key, reverse=not ascending)
