"""Set-operation blocks: union semantics + the named stash (SURVEY §2.5).

The reference's working set unions are bag unions in append order
(/root/reference/src/main.rs:1424-1426); `stash` moves the working set into a
named slot (main.rs:2316-2318), `pop` appends it back (main.rs:2319-2326), and
`subtract` anti-joins the working set against the stash by post key
(main.rs:2327-2341).

`Stash` is a plain name→DataFrame registry on the driver — DataFrames are
lazy plans, so stashing is free; nothing materializes until the final action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from query_engine_spark.operators.ordering import ORD

__all__ = ["append_union", "Stash"]


def append_union(first: DataFrame, second: DataFrame) -> DataFrame:
    """Bag union preserving append order: `second` follows `first`.

    Callers stamp __ord per block (ordering.py) so the union's order is the
    blocks' append order; columns are matched by name with missing columns
    null-filled (the reference appends full PostV1 refs; shapes always agree
    there, ours may differ by computed columns).
    """
    return first.unionByName(second, allowMissingColumns=True)


class Stash:
    """Named working-set slots (main.rs:1387, 2311-2341)."""

    def __init__(self) -> None:
        self._slots: dict[str, DataFrame] = {}

    def stash(self, name: str, df: DataFrame) -> None:
        """Move the working set into the slot (main.rs:2316-2318).
        The reference clears the working set; the caller replaces it with an
        empty DataFrame (plans/blocks.py does)."""
        self._slots[name] = df

    def pop(self, name: str, current: DataFrame, block_seq: int | None = None) -> DataFrame:
        """Append the stashed set back (bag union, main.rs:2319-2326).

        The reference CLONES the stashed Vec on pop — the slot survives, so a
        key can be popped any number of times (main.rs:2325-2326) — and
        hard-errors when the key does not exist (main.rs:2320-2324).

        The reference appends to the END of the current Vec; with the __ord
        convention that means re-stamping the stashed rows into a NEW block
        (preserving their relative order) so they sort after `current`.
        """
        stashed = self._slots.get(name)
        if stashed is None:
            from query_engine_spark.errors import PipelineError

            raise PipelineError(f"stash pop failed: no stash with key {name!r} (main.rs:2320-2324)")
        if block_seq is not None and ORD in stashed.columns:
            from query_engine_spark.operators.ordering import stamp_ord

            stashed = stamp_ord(
                stashed.withColumnRenamed(ORD, "__old_ord"), ["__old_ord"], block_seq
            ).drop("__old_ord")
        return append_union(current, stashed)

    def subtract(self, name: str, current: DataFrame, key: str = "key") -> DataFrame:
        """Anti-join by post key, bag-preserving on the left
        (main.rs:2327-2341); errors on a missing key like the reference
        (main.rs:2328-2333)."""
        stashed = self._slots.get(name)
        if stashed is None:
            from query_engine_spark.errors import PipelineError

            raise PipelineError(f"stash subtract failed: no stash with key {name!r} (main.rs:2328-2333)")
        return current.join(stashed.select(key).distinct(), key, "left_anti")

    def get(self, name: str) -> DataFrame | None:
        return self._slots.get(name)
