"""Distinct-count sketching that is deterministic ACROSS engines.

Spark's `approx_count_distinct` (HyperLogLog++) and DuckDB's
`approx_count_distinct` use different hash functions, so their estimates
can't be compared bit-for-bit. This module implements a KMV (k-minimum-
values) distinct sketch on md5 hashes instead — md5 is identical
everywhere, so the estimate is reproducible in any engine with md5 + hex
parsing, which keeps it inside this repo's oracle-hash contract (see
registry module docstring).

KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"): hash every value uniformly into [0, 1); if the k-th smallest
distinct hash is R_k, then E[distinct] ≈ (k-1)/R_k. With k=64 the
standard error is ~1/sqrt(k-2) ≈ 13%.

Scale note: the shuffle operates on DISTINCT (group, hash) pairs — the
`.distinct()` gets map-side partial aggregation for free, so a 100 TB
scan reduces to |groups|·|distinct values| rows before the window rank.
For groups with billions of distinct values, a pre-filter
``hash < (few·k/n_est)·2^60`` from a cheap first-pass estimate bounds the
ranked set; not needed at test scale and omitted for clarity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["kmv_distinct", "md5_hash60"]

# hashes are 60-bit ints (15 md5 hex chars): exact in a signed 64-bit on
# both engines, and 2^60 is exactly representable as a double for the
# normalization divide
_H_MAX = float(1 << 60)


def md5_hash60(col: Column | str) -> Column:
    """First 15 hex chars of md5(value-as-string) as a 60-bit bigint.

    Engine-portable: DuckDB ``('0x' || substr(md5(x::VARCHAR), 1, 15))
    ::BIGINT`` yields the identical integer.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate of `value_col`.

    Output: group_cols + `exact_distinct` (bigint — exact distinct-hash
    count, equal to the true distinct count modulo md5 collisions, which
    are deterministic and shared with any md5-based oracle) +
    `kmv_distinct` (double) — the sketch estimate, exact when the group
    has fewer than k distinct values.

    All arithmetic after the hash is IEEE-double on exact ≤60-bit ints, so
    any engine reproduces the estimate bit-for-bit; callers should still
    round for display.
    """
    groups = list(group_cols)
    d = df.select(*groups, md5_hash60(value_col).alias("__h")).distinct()
    w = Window.partitionBy(*groups).orderBy("__h")
    r = d.withColumn("__rk", F.row_number().over(w))
    agg = r.groupBy(*groups).agg(
        F.count("*").alias("exact_distinct"),
        F.max(F.when(F.col("__rk") <= k, F.col("__h"))).alias("__kth"),
    )
    est = F.when(
        F.col("exact_distinct") < k, F.col("exact_distinct").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_H_MAX) / F.col("__kth").cast("double")
    )
    return agg.select(*groups, "exact_distinct", est.alias("kmv_distinct"))
