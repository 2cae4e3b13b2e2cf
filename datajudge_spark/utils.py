"""Driver-side helper utilities: output processors, null filters, none-aware sort.

Behavioral parity with the reference's ``datajudge.utils``
(/root/reference/src/datajudge/utils.py:7-194): these helpers post-process
*collected* (small) results on the driver — they never touch executor-side data.
"""

from __future__ import annotations

from collections.abc import Collection
from typing import Protocol


def _fmt_diff_part(s: str, d: int) -> str:
    return f"[numDiff]{s[d:]}[/numDiff]" if d < len(s) else ""


def format_difference(
    n1: float | int, n2: float | int, decimal_separator: bool = True
) -> tuple[str, str]:
    """Highlight how two numbers differ, using BBCode-ish tags.

    Mirrors reference utils.py:11-51: find the first differing character of the
    two (comma-grouped) renderings and wrap the differing suffix in
    ``[numDiff]...[/numDiff]``.
    """
    if decimal_separator:
        s1, s2 = f"{n1:,}", f"{n2:,}"
    else:
        s1, s2 = str(n1), str(n2)

    min_len = min(len(s1), len(s2))
    diff_idx = next((i for i in range(min_len) if s1[i] != s2[i]), min_len)
    return (
        f"{s1[:diff_idx]}{_fmt_diff_part(s1, diff_idx)}",
        f"{s2[:diff_idx]}{_fmt_diff_part(s2, diff_idx)}",
    )


class OutputProcessor(Protocol):
    def __call__(
        self,
        collection: Collection,
        counts: Collection | None = None,
    ) -> tuple[Collection, Collection | None]: ...


def output_processor_sort(
    collection: Collection, counts: Collection | None = None
) -> tuple[Collection, Collection | None]:
    """Sort elements descending by count, breaking ties by element ascending.

    Parity with reference utils.py:62-95, including the 1-tuple packaging of
    scalar collections and the none-aware tuple sort.
    """
    collection = list(collection)
    if len(collection) == 0:
        return collection, counts
    if not isinstance(collection[0], tuple):
        packaged = [(elem,) for elem in collection]
        res_main, res_counts = output_processor_sort(packaged, counts)
        return [elem[0] for elem in res_main], res_counts

    if counts is None:
        return sort_tuple_none_aware(collection), counts

    if len(collection) != len(counts):
        raise ValueError("collection and counts must have the same length")

    if len(collection) <= 1:
        return collection, counts

    lst = sort_tuple_none_aware(
        [(-count, *elem) for count, elem in zip(counts, collection)]
    )
    return [elem[1:] for elem in lst], [-elem[0] for elem in lst]


def output_processor_limit(
    collection: Collection, counts: Collection | None = None, limit: int = 100
) -> tuple[Collection, Collection | None]:
    """Truncate to the first ``limit`` elements, appending a truncation notice.

    Parity with reference utils.py:98-122.
    """
    collection = list(collection)
    ret_collection = collection[:limit]
    ret_counts = None if counts is None else list(counts)[:limit]
    if len(collection) > limit:
        ret_collection.append(
            f"<SHORTENED OUTPUT, displaying the first {limit} / "
            f"{len(collection)} elements above>"
        )
        if ret_counts is not None:
            ret_counts.append(
                f"<SHORTENED OUTPUT, displaying the first {limit} / "
                f"{len(collection)} counts above>"
            )
    return ret_collection, ret_counts


def filternull_element(values: list) -> list:
    return [value for value in values if value is not None]


def filternull_never(values: list) -> list:
    return values


def filternull_element_or_tuple_all(values: list) -> list:
    return [
        value
        for value in values
        if value is not None
        and not (isinstance(value, tuple) and all(x is None for x in value))
    ]


def filternull_element_or_tuple_any(values: list) -> list:
    return [
        value
        for value in values
        if value is not None
        and not (isinstance(value, tuple) and any(x is None for x in value))
    ]


def sort_tuple_none_aware(
    collection: Collection[tuple], ascending: bool = True
) -> Collection[tuple]:
    """Stable sort of equal-length tuples where ``None`` sorts as the column
    type's default value (0, 0.0, "").

    Parity with reference utils.py:151-194.
    """
    lst = list(collection)
    if len(lst) <= 1:
        return lst

    if not all(isinstance(elem, tuple) and len(elem) == len(lst[0]) for elem in lst):
        raise ValueError("all elements must be tuples and have the same length")

    dtypes: list[type | None] = [None] * len(lst[0])
    for idx in range(len(dtypes)):
        for elem in lst:
            if elem[idx] is not None:
                dtypes[idx] = type(elem[idx])
                break
        else:
            dtypes[idx] = int

    def _with_defaults(elem):
        return tuple(
            ((dtype() if dtype else None) if sub is None else sub)
            for dtype, sub in zip(dtypes, elem)
        )

    return sorted(lst, key=_with_defaults, reverse=not ascending)
