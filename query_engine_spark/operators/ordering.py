"""The ``__ord`` ordering-column convention.

The reference's working set is an ordered ``Vec<&PostV1>``
(/root/reference/src/main.rs:1386): input blocks append in order (bag union,
main.rs:1424-1426), ``input.post`` prepends (main.rs:1782), `duplicates` keeps
the first occurrence (main.rs:1916-1918), and `limit.posts_per_user` keeps the
first N per author *in current order* (main.rs:2349-2373). DataFrames are
unordered, so every order-sensitive operator threads an explicit ``__ord``
column:

    __ord = block_seq * 2^40 + within_block_rank

``block_seq`` increments per input/sort block; ``within_block_rank`` is the
rank of the row inside that block (for scans: id order, matching the
reference's BTreeMap range iteration; for sorts: the sort rank). 2^40 rows per
block is comfortably beyond any single block's output.

Sorting re-stamps ``__ord`` from the sort rank, so downstream order-sensitive
ops (dedup-first, per-user-top-N, final limit) observe the sorted order —
exactly the reference's in-place `sort_by` semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

ORD = "__ord"
_BLOCK_SHIFT = 1 << 40

__all__ = ["ORD", "stamp_ord", "next_block_ord", "restamp_from_sort"]


def stamp_ord(df: DataFrame, order_by: Sequence[Column | str], block_seq: int = 0) -> DataFrame:
    """Assign ``__ord`` from a total order given by `order_by` columns.

    `order_by` must be a total order (include a unique key as tiebreaker) so
    the stamp is deterministic across runs and engines.
    """
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    return df.withColumn(
        ORD, (F.lit(block_seq * _BLOCK_SHIFT) + F.row_number().over(w)).cast("long")
    )


def next_block_ord(block_seq: int) -> int:
    return block_seq * _BLOCK_SHIFT


def restamp_from_sort(df: DataFrame, sort_cols: Sequence[Column], block_seq: int) -> DataFrame:
    """Re-stamp ``__ord`` after a sort block (reference sorts in place)."""
    w = Window.orderBy(*sort_cols)
    return df.withColumn(
        ORD, (F.lit(block_seq * _BLOCK_SHIFT) + F.row_number().over(w)).cast("long")
    )
