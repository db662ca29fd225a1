"""Physical data layout: Z-order (Morton-curve) clustering for
multi-dimensional data skipping.

A parquet scan prunes row groups whose column min/max stats exclude the
predicate. A layout sorted by ONE column gives perfect skipping on that
column and none on any other; interleaving the BITS of two (or more)
normalized dimensions into one sort key clusters rows so every row group
covers a small rectangle of the combined space — a 2-D box predicate then
touches only the row groups its rectangle overlaps. This is the
`OPTIMIZE ... ZORDER BY` technique of lakehouse engines (Delta/Iceberg),
built here from pure column arithmetic:

  1. normalize each dimension to a `bits`-bit integer grid with min/max
     scalars (broadcast one-row agg — in-plan, no driver collect);
  2. interleave the bits (Morton code) with shift/or expressions;
  3. `repartitionByRange` + `sortWithinPartitions` on the z-value and
     write — row-group stats then bound BOTH dimensions tightly.

The z-value is metadata, not semantics: reading back with any predicate
returns exactly the same rows as the unordered table (the registry's
`events_zorder_box` hash-verifies that against DuckDB on the RAW table),
while the parquet footers let the scan skip most of the file — measured
by `tests/test_bucketing.py::test_zorder_rowgroup_skipping` straight from
footer min/max stats, engine-independently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["z_value", "write_zordered"]


def _normalize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max scale a numeric column onto the [0, 2^bits) integer grid.
    Constant dimensions (mx == mn) map to 0."""
    span = (mx - mn).cast("double")
    scaled = F.floor(
        (col.cast("double") - mn.cast("double")) * ((1 << bits) - 1) / span
    ).cast("long")
    return F.when(span > 0, scaled).otherwise(F.lit(0))


def z_value(cols: Sequence[Column], mins: Sequence[Column], maxs: Sequence[Column], bits: int = 16) -> Column:
    """Morton code of k dimensions: bit j of normalized dimension i lands at
    interleaved position j*k + i. Pure shift/or integer expressions — the
    whole key computes scan-side in codegen; k*bits must stay < 63."""
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"{k} dims x {bits} bits overflows a signed 64-bit key")
    z = F.lit(0).cast("long")
    for i, (c, mn, mx) in enumerate(zip(cols, mins, maxs)):
        q = _normalize(c, mn, mx, bits)
        for j in range(bits):
            z = z.bitwiseOR(F.shiftleft(F.shiftright(q, j).bitwiseAND(F.lit(1)), j * k + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Sequence[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Rewrite `df` as parquet clustered on the Morton code of `dims`.

    The min/max scalars come from one broadcast agg over the same plan —
    no driver round-trip — and the z-key is dropped before writing (it is
    derivable, storing it would just widen the table). Range partitioning
    on z + an in-partition sort gives each output file AND each row group
    inside it a tight bounding box in every clustered dimension.
    """
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"__mn_{d}"), F.max(d).alias(f"__mx_{d}")]
    stats = df.agg(*aggs)
    with_z = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z",
        z_value(
            [F.col(d) for d in dims],
            [F.col(f"__mn_{d}") for d in dims],
            [F.col(f"__mx_{d}") for d in dims],
            bits,
        ),
    )
    out = (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__mn_{d}" for d in dims], *[f"__mx_{d}" for d in dims])
    )
    out.write.mode("overwrite").parquet(path)
