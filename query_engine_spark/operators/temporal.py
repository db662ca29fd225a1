"""Temporal operators Spark lacks natively: as-of join, range (interval)
join, and hypertable-style time-bucket rollups with gap-fill/LOCF.

These are the classic time-series operators (kdb+ `aj`, Pandas `merge_asof`,
TimescaleDB `time_bucket_gapfill`, Flink interval joins) re-expressed as
compositions of DataFrame ops, per the build contract's custom-operator
ladder: composition first, Pandas UDF only if semantics demand it (they
don't — every operator here is pure Column algebra, fully inside
whole-stage codegen).

Scale notes (100 TB):

- `asof_join` is ONE hash shuffle of (left ∪ right) on the key plus a
  per-partition sort — the same cost as the shuffle phase of a sort-merge
  join, with no join blow-up and no per-row Python. A skewed key (one user
  with 10⁸ events) lands in one partition; mitigate upstream with key
  salting + re-merge, or pre-aggregate the right side.
- `range_join` replaces the O(|P|·|I|) cross-join-filter Spark would plan
  for a pure inequality join with an equi-join on overlap bins: intervals
  replicate into ceil(len/bin_width)+1 bins, points hash into exactly one,
  so each candidate pair is produced exactly once (no dedup pass). Pick
  `bin_width` ≈ the typical interval length: too small inflates the
  interval side, too large inflates candidate pairs.
- `rollup_gapfill`'s dense spine is generated per key from that key's own
  [min, max] bucket range — no driver-side series, no global cross join;
  LOCF is a running `last(ignorenulls)` window per key, one shuffle total
  shared with the aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "asof_join",
    "range_join",
    "time_bucket",
    "hopping_windows",
    "rollup_gapfill",
    "truncated_ema",
    "ema_weights",
    "ohlc",
    "rolling_anomaly",
    "anomaly_baseline",
    "anomaly_score_static",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    value_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach `value_cols` from the right
    row with the same key that is the LATEST with ``right.ts <= left.ts``
    (direction="backward", the default — Pandas ``merge_asof`` / DuckDB
    ``ASOF LEFT JOIN`` semantics), the EARLIEST with ``right.ts >=
    left.ts`` ("forward"), or whichever of those two is closer in time
    ("nearest", exact-distance ties → backward). Unmatched → NULL.

    Implementation is the union+LOCF formulation, not a join: tag right
    rows side=0 and left rows side=1, union, then one window
    ``last(<right payload>, ignorenulls=True)`` per key ordered by
    (ts, side) carries the most recent right payload forward onto each
    left row (mirrored with ``first`` over the following range frame for
    the forward direction; "nearest" evaluates both windows over the SAME
    exchange and sort — still one shuffle total). Equal timestamps match
    in every direction. No join explosion.

    `tolerance` (in the ts columns' own units — use epoch micros) NULLs the
    match when it is more than `tolerance` away on the direction's side.

    The right side must be unique per (key, ts) — as-of semantics are
    ambiguous otherwise; pre-dedup with a deterministic rule (the registry
    fixture keeps the max-id row) so results are engine-reproducible.

    Timestamps may be any orderable numeric/timestamp type, but `tolerance`
    and direction="nearest" require a numeric (epoch-micros) ts.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    on = list(on)
    rv = list(value_cols)
    payload = F.struct(
        F.col(right_ts).alias("__match_ts"), *[F.col(c).alias(c) for c in rv]
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__payload"].dataType).alias("__payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # RANGE frames ordered by __ats alone: a right row tied with a left row is
    # a frame PEER, so it lands in both the preceding and following frame
    # regardless of intra-tie row order (right is unique per (key, ts), so the
    # tied right row is always the extreme non-null payload of its frame).
    # Identical partitioning + ordering for both windows → Catalyst plans ONE
    # Exchange and ONE Sort even for "nearest".
    wb = (
        Window.partitionBy(*on)
        .orderBy("__ats")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy("__ats")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction in ("backward", "nearest"):
        u = u.withColumn("__pb", F.last("__payload", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        u = u.withColumn("__pf", F.first("__payload", ignorenulls=True).over(wf))
    matched = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction in ("backward", "nearest"):
            okb = (F.col("__ats") - F.col("__pb.__match_ts")) <= F.lit(tolerance)
            matched = matched.withColumn("__pb", F.when(okb, F.col("__pb")))
        if direction in ("forward", "nearest"):
            okf = (F.col("__pf.__match_ts") - F.col("__ats")) <= F.lit(tolerance)
            matched = matched.withColumn("__pf", F.when(okf, F.col("__pf")))
    if direction == "backward":
        chosen = F.col("__pb")
    elif direction == "forward":
        chosen = F.col("__pf")
    else:
        db = F.col("__ats") - F.col("__pb.__match_ts")
        df_ = F.col("__pf.__match_ts") - F.col("__ats")
        chosen = (
            F.when(F.col("__pb").isNull(), F.col("__pf"))
            .when(F.col("__pf").isNull(), F.col("__pb"))
            .when(df_ < db, F.col("__pf"))
            .otherwise(F.col("__pb"))  # ties → backward
        )
    matched = matched.withColumn("__chosen", chosen)
    out = matched.select(
        *[c for c in left.columns],
        F.col("__chosen.__match_ts").alias(right_ts + suffix),
        *[F.col(f"__chosen.{c}").alias(c + suffix) for c in rv],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair every point row with every interval
    row where ``start <= point <= end`` (inclusive), without the cross-join
    Spark plans for a bare inequality condition.

    Binning: each interval explodes into its covering bins
    ``[floor(start/w) .. floor(end/w)]``; each point hashes into exactly
    one bin ``floor(point/w)``; an equi-join on the bin plus the exact
    containment filter yields each qualifying pair EXACTLY once (the
    point's single bin is covered by the interval at most once), so no
    dedup pass is needed. Columns must be integral (epoch micros).

    Same shape Databricks' range-join "bin" hint and Flink's interval join
    use. Output: all point columns + all interval columns (names must not
    collide).
    """
    ivl = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    cond = (
        (pts["__bin"] == ivl["__bin"])
        & (pts[point_col] >= ivl[start_col])
        & (pts[point_col] <= ivl[end_col])
    )
    return pts.join(ivl, cond, how).drop("__bin")


def time_bucket(col: Column | str, width: int) -> Column:
    """TimescaleDB-style time_bucket over an epoch-micros column: the
    bucket's own start in epoch micros, ``floor(ts / width) * width``.

    Portable: DuckDB's ``(ts_us // width) * width`` reproduces it
    bit-for-bit for the non-negative epochs used here (for a 60-bit µs
    epoch the double quotient is exact within 5e-11 of the true value, so
    FLOOR can't cross an integer boundary; negative-epoch semantics differ
    between engines' integer division and are out of scope).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def ohlc(
    df: DataFrame,
    ts_col: str,
    order_col: str,
    value_col: str,
    keys: list[str],
    width_us: int,
) -> DataFrame:
    """OHLC candle rollup per (keys, time bucket): open/close are the value
    at the first/last row under the TOTAL order (ts, order_col) — the
    tiebreaker makes the candle engine-portable when timestamps collide —
    plus high/low/n. One shuffle: both row_number windows and the final
    aggregate share the (keys, bucket) partitioning, so the plan is
    exchange → two window passes → partial/final agg, no second shuffle.
    The hypertable "candlestick_agg" shape re-expressed as DataFrame ops.
    """
    bucket = time_bucket(F.col(ts_col), width_us).alias("bucket_us")
    base = df.select(*keys, ts_col, order_col, value_col, bucket)
    part = [*keys, "bucket_us"]
    asc = Window.partitionBy(*part).orderBy(F.col(ts_col), F.col(order_col))
    desc = Window.partitionBy(*part).orderBy(F.col(ts_col).desc(), F.col(order_col).desc())
    tagged = base.withColumn("__ra", F.row_number().over(asc)).withColumn(
        "__rd", F.row_number().over(desc)
    )
    return tagged.groupBy(*part).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("__ra") == 1, F.col(value_col))).alias("open"),
        F.max(F.col(value_col)).alias("high"),
        F.min(F.col(value_col)).alias("low"),
        F.max(F.when(F.col("__rd") == 1, F.col(value_col))).alias("close"),
    )


def hopping_windows(
    df: DataFrame,
    ts_us_col: str,
    width_us: int,
    slide_us: int,
    start_col: str = "window_start_us",
) -> DataFrame:
    """Assign each row to EVERY hopping (sliding) window containing it —
    the batch analog of Structured Streaming's ``F.window(ts, width,
    slide)``, kept as explicit epoch-micros arithmetic so any SQL engine
    reproduces the window starts bit-for-bit.

    A row at t belongs to windows [s, s+width) for every s ≡ 0 (mod slide)
    with s <= t < s+width — that's start indexes
    ``floor((t - width)/slide) + 1 .. floor(t/slide)`` (width/slide of
    them when width is a multiple of slide). Explode is a narrow op; the
    downstream per-window aggregation is where the (deliberate,
    width/slide-fold) row multiplication gets reduced — at scale prefer
    aggregating tumbling `slide_us` buckets first and rolling those up
    into hops if the agg is algebraic. Assumes non-negative epochs (see
    `time_bucket`).
    """
    t = F.col(ts_us_col)
    lo = (F.floor((t - width_us) / slide_us) + 1).cast("long")
    hi = F.floor(t / slide_us).cast("long")
    # explode must be top-level in its projection; scale to µs after
    out = df.withColumn("__hop_idx", F.explode(F.sequence(lo, hi)))
    return out.withColumn(
        start_col, F.col("__hop_idx") * slide_us
    ).drop("__hop_idx")


def rollup_gapfill(
    df: DataFrame,
    keys: Sequence[str],
    ts_us_col: str,
    width_us: int,
    aggs: dict[str, Column],
    zero_cols: Sequence[str] = (),
    locf_cols: Sequence[str] = (),
    interp_cols: Sequence[str] = (),
) -> DataFrame:
    """Hypertable rollup: aggregate into fixed `width_us` buckets per key,
    then densify each key's series over its own [min, max] bucket range and
    fill gaps — count-like columns to 0 (`zero_cols`), gauge-like columns by
    last-observation-carried-forward (`locf_cols`) or linear interpolation
    between the surrounding observed buckets (`interp_cols`, TimescaleDB
    `interpolate` semantics: NULL when no observation on either side);
    anything else stays NULL in gap rows.

    The spine (dense bucket sequence) is derived per key with
    ``sequence(min_bucket, max_bucket, width)`` — distributed, no
    driver-side date arithmetic, and naturally bounded per key. The
    gap-fill left join broadcasts nothing and reuses the rollup's key
    partitioning; LOCF is one running window per key.

    Output: keys + `bucket_us` + the agg columns (gap-filled).
    """
    keys = list(keys)
    b = df.withColumn("bucket_us", time_bucket(ts_us_col, width_us))
    agg = b.groupBy(*keys, "bucket_us").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    spine = (
        agg.groupBy(*keys)
        .agg(F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi"))
        .withColumn(
            "bucket_us",
            F.explode(F.sequence("__lo", "__hi", F.lit(width_us).cast("long"))),
        )
        .drop("__lo", "__hi")
    )
    full = spine.join(agg, keys + ["bucket_us"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in zero_cols:
        full = full.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c in locf_cols:
        full = full.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if interp_cols:
        wf = (
            Window.partitionBy(*keys)
            .orderBy("bucket_us")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        int_types = {"bigint", "long", "int", "integer", "smallint", "tinyint"}
        for c in interp_cols:
            known_b = F.when(F.col(c).isNotNull(), F.col("bucket_us"))
            prev_v = F.last(c, ignorenulls=True).over(w)
            prev_b = F.last(known_b, ignorenulls=True).over(w)
            next_v = F.first(c, ignorenulls=True).over(wf)
            next_b = F.first(known_b, ignorenulls=True).over(wf)
            if dict(full.dtypes).get(c) in int_types:
                # integral gauge (pre-quantized): EXACT interpolation —
                # prev + floor((next-prev)·elapsed_buckets / gap_buckets).
                # Rounding a double interp at a decimal boundary flips
                # differently across engines (Spark rounds the shortest
                # decimal repr, DuckDB the binary value — observed at
                # sf0.001); the integer form has no boundary. Elapsed/gap
                # normalize to BUCKET counts so every term stays ≤ ~2^40:
                # the double division is then exact enough that floor() is
                # the true floor (quotient ulp ≪ 1/gap), identically in
                # both engines.
                eb = ((F.col("bucket_us") - prev_b) / F.lit(width_us)).cast("long")
                gb = ((next_b - prev_b) / F.lit(width_us)).cast("long")
                interp = prev_v + F.floor((next_v - prev_v) * eb / gb).cast("long")
            else:
                # gap rows: prev + (next-prev) * elapsed/gap — plain double
                # math, identical expression order on the oracle side
                interp = prev_v + (next_v - prev_v) * (
                    (F.col("bucket_us") - prev_b) / (next_b - prev_b)
                )
            full = full.withColumn(
                c, F.when(F.col(c).isNotNull(), F.col(c)).otherwise(interp)
            )
    return full


def ema_weights(alpha: float = 0.5, k: int = 8, quant: int = 2**20) -> list[int]:
    """Integer EMA kernel: w_j = round(α·(1-α)^j · quant) for j = 0..k-1.
    Computed ONCE in Python and inlined as literals, so Spark and any SQL
    oracle share the exact same integers — `pow` on doubles is not
    correctly-rounded everywhere, so it must never run per-engine."""
    return [round(alpha * (1 - alpha) ** j * quant) for j in range(k)]


def truncated_ema(
    df: DataFrame,
    value_col: str,
    *,
    key_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    alpha: float = 0.5,
    k: int = 8,
    vquant: int = 1000,
) -> DataFrame:
    """Truncated exponential moving average per key — the classic
    time-series smoother, made distributed + engine-exact. True EMA is a
    sequential recurrence (unbounded lookback → unexpressible without a
    per-key scan); truncating the kernel at `k` terms keeps >1-(1-α)^k of
    the mass (99.6% for α=.5, k=8) and becomes k LAG columns inside ONE
    key-partitioned window — whole-stage codegen, one shuffle by key.

    All arithmetic is integer: values floor-quantize to `vquant`, kernel
    weights are Python-precomputed literals (`ema_weights`), and the
    normalizer re-sums only the PRESENT terms so sequence heads (fewer
    than k predecessors) renormalize instead of biasing toward zero.
    Returns the input keys + ``(ts, id, value_q, ema_q)``.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    weights = ema_weights(alpha, k)
    vq = F.floor(F.col(value_col) * vquant).cast("long")
    out = df.withColumn("value_q", vq)
    num = None
    den = None
    for j, wj in enumerate(weights):
        term = F.lag("value_q", j).over(w) if j else F.col("value_q")
        contrib = F.when(term.isNotNull(), term * wj).otherwise(F.lit(0))
        present = F.when(term.isNotNull(), F.lit(wj)).otherwise(F.lit(0))
        num = contrib if num is None else num + contrib
        den = present if den is None else den + present
    return out.select(
        *key_cols,
        F.col(ts_col),
        F.col(id_col),
        "value_q",
        F.floor(num / den).cast("long").alias("ema_q"),
    )


def rolling_anomaly(
    df: DataFrame,
    value_col: str = "value",
    *,
    key_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    lookback: int = 64,
    min_n: int = 16,
    z: int = 3,
    vquant: int = 1000,
) -> DataFrame:
    """Rolling z-score anomaly detection per key, engine-exact: flag a
    point whose deviation from the trailing `lookback`-row mean exceeds
    `z` standard deviations of that same trailing window (the current row
    is excluded from its own baseline — a spike must not mask itself).

    The test is evaluated with NO float sqrt/mean anywhere: with
    n/s/ss = count/sum/sum-of-squares of the quantized trailing values,
        z² < (x·n − s)² / (n·ss − s²)
    cross-multiplies to the pure-int64 predicate
        (x·n − s)² > z² · (n·ss − s²),
    so the boundary can't flip between engines the way a float
    stddev comparison can. One key-partitioned codegen window (three
    aggregates share the frame), one shuffle by key; bounded frames keep
    state O(lookback) per partition at any history length — the same
    restartable shape a streaming deployment needs.

    Returns input keys + (ts, id, value_q, n_base, dev2, thr2) for rows
    where n_base >= min_n, variance > 0, and the predicate fires.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, -1)
    )
    vq = F.round(F.col(value_col) * vquant).cast("long")
    # int64 budget for the cross-multiplied predicate: the largest term is
    # z²·n·ss ≤ z²·lookback²·vq², so |value_q| must stay under
    # sqrt(int64max / (2·z²·lookback²)) (factor 2 headroom for the s²
    # subtraction). Silently wrapping would make __nvar negative and
    # SUPPRESS genuine spikes — fail loudly in-plan instead; callers with
    # wider-range metrics lower `vquant` or pre-center values per key.
    # dev = x·n − s can reach 2·lookback·|vq| so dev² reaches 4·L²·vq²,
    # which dominates z²·n·ss = z²·L²·vq² whenever z < 2 — size the budget
    # by max(4, 2·z²) so the guard holds for small z too.
    vq_bound = int(
        ((2**63 - 1) // (max(4, 2 * z * z) * lookback * lookback)) ** 0.5
    )
    guard = F.assert_true(
        F.abs(vq) <= F.lit(vq_bound),
        F.format_string(
            "rolling_anomaly: |value*%d| exceeds %d — the int64 "
            "cross-multiplied z-score would overflow (z=%d, lookback=%d); "
            "lower vquant or center values per key.",
            F.lit(vquant),
            F.lit(vq_bound),
            F.lit(z),
            F.lit(lookback),
        ),
    )
    base = df.filter(guard.isNull()).select(
        *key_cols,
        F.col(ts_col),
        F.col(id_col),
        vq.alias("value_q"),
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("value_q").over(w)
    ss = F.sum(F.col("value_q") * F.col("value_q")).over(w)
    stats = base.select(
        *key_cols,
        ts_col,
        id_col,
        "value_q",
        n.alias("n_base"),
        (F.col("value_q") * n - s).alias("__dev"),
        (n * ss - s * s).alias("__nvar"),
    )
    return (
        stats.filter(
            (F.col("n_base") >= min_n)
            & (F.col("__nvar") > 0)
            & (F.col("__dev") * F.col("__dev") > z * z * F.col("__nvar"))
        )
        .select(
            *key_cols,
            ts_col,
            id_col,
            "value_q",
            F.col("n_base").cast("long").alias("n_base"),
            (F.col("__dev") * F.col("__dev")).alias("dev2"),
            (F.lit(z * z) * F.col("__nvar")).alias("thr2"),
        )
    )


def anomaly_baseline(
    df: DataFrame,
    value_col: str = "value",
    *,
    key_cols: Sequence[str] = ("event_type",),
    vquant: int = 1000,
) -> DataFrame:
    """Per-key baseline moments for `anomaly_score_static` — the offline
    half of the train-offline / score-the-stream anomaly deployment (same
    split as the hashed classifier and DSIR: the model is a tiny keyed
    table, the stream never aggregates). One hash-agg, map-side
    combinable. The intermediate sum-of-squares DOES scale with n, so the
    agg carries max(|vq|) and asserts n·max² fits int64 post-agg — a
    wrapped sum fails loudly instead of silently suppressing anomalies.

    Unlike rolling_anomaly — whose frame is bounded at `lookback` rows, so
    the exact cross-multiplied predicate (x·n−s)² > z²·(n·ss−s²) stays
    inside int64 — a reference-window baseline has UNBOUNDED n, and n²·var
    overflows. The baseline therefore stores floor-quantized moments
    (mean_q = s div n, var_q = ss div n − mean_q²): integer div is
    identical in Spark and DuckDB, so the scorer's predicate is still
    engine-exact, and every quantity is bounded by the value range alone
    — no n² term at any corpus size. Emits key_cols + (n, mean_q, var_q).
    """
    vq = F.round(F.col(value_col) * vquant).cast("long")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vq).alias("__s"),
        F.sum(vq * vq).alias("__ss"),
        F.max(F.abs(vq)).alias("__maxabs"),
    )
    # sum(vq²) ≤ n·max(|vq|)² — if that bound fits in int64 the summed __ss
    # cannot have wrapped. Under this repo's sessions ANSI is ON (Spark 4
    # default), so the vq·vq multiply itself raises ARITHMETIC_OVERFLOW
    # before this guard is reached; the assert is the safety net for
    # ANSI-off deployments, where the wrap would be SILENT and a garbage
    # var_q would suppress genuine anomalies downstream. n and max(|vq|)
    # are computed exactly regardless, so the post-agg assert fails loudly
    # (with an actionable message) on exactly the inputs whose __ss is
    # untrustworthy; callers lower `vquant` or pre-partition hot keys. One
    # comparison per key row, no extra shuffle.
    agg = agg.filter(
        F.assert_true(
            # stepwise div keeps every intermediate in int64 even when
            # maxabs² alone would wrap: n ≤ (M div a) div a ⟺ n·a² ≤ M.
            # A key whose values are ALL null has __maxabs null — its
            # moments come out null and downstream var_q>0 filters drop it;
            # the guard must not turn that into a spurious raise
            # (assert_true treats NULL conditions as failures). n counts
            # null-valued rows too, so for partially-null keys the bound is
            # conservative — it can only over-protect, never under.
            F.col("__maxabs").isNull()
            | (F.col("__maxabs") == 0)
            | (F.col("n") <= F.expr(f"({2**63 - 1} div __maxabs) div __maxabs")),
            F.format_string(
                "anomaly_baseline: n*max(|value*%d|)^2 exceeds int64 — the "
                "sum-of-squares may have wrapped; lower vquant.",
                F.lit(vquant),
            ),
        ).isNull()
    )
    # FLOOR division, explicitly: BOTH Spark's `div` and DuckDB's integer
    # `//` truncate (s=-10, n=3 → -3 in both), so floor semantics must be
    # spelled out with the same sign correction on both sides (the SQL
    # oracle carries the identical CASE). Floor is the right mean for a
    # threshold baseline: truncation biases negative means toward zero.
    # n > 0 always; __ss >= 0 so its div == floor already.
    mean_q = F.expr(
        "__s div n - (CASE WHEN __s % n != 0 AND __s < 0 THEN 1 ELSE 0 END)"
    )
    return agg.select(
        *key_cols,
        "n",
        mean_q.alias("mean_q"),
        (F.expr("__ss div n") - mean_q * mean_q).alias("var_q"),
    )


def anomaly_score_static(
    df: DataFrame,
    baseline: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    min_n: int = 16,
    z: int = 3,
    vquant: int = 1000,
) -> DataFrame:
    """Score points against a pretrained per-key baseline:
    (x − mean_q)² > z²·var_q over `anomaly_baseline`'s floor-quantized
    integer moments — engine-exact (both engines compute identical
    integers), with in-plan asserts that dev² and z²·var_q fit int64 (see
    anomaly_baseline on why the unbounded-n case can't reuse
    rolling_anomaly's cross-multiplied form). The baseline broadcasts
    (one row per key) and the scoring is a map-only stream-static join —
    no watermark, no state, append output: the shape that runs unchanged
    on a `readStream` firehose. Unlike rolling_anomaly the baseline is
    FIXED (trained on a reference window), which is what a monitoring
    deployment wants: the alert threshold must not drift with the
    anomalies it is measuring.

    Returns only the anomalous rows: keys + (ts, id, value_q, n_base,
    dev2, thr2).
    """
    vq = F.round(F.col(value_col) * vquant).cast("long")
    scored = df.select(
        *key_cols, F.col(ts_col), F.col(id_col), vq.alias("value_q")
    ).join(F.broadcast(baseline), list(key_cols), "inner")
    dev = F.col("value_q") - F.col("mean_q")
    # dev² and z²·var_q must not wrap: |dev| ≤ floor(sqrt(int64max)) guards
    # the square; var_q ≤ int64max div z² guards the threshold. Under ANSI
    # (the repo default) the multiplies raise natively; the assert is the
    # ANSI-off safety net with an actionable message. Map-side comparisons,
    # no extra shuffle.
    dev_bound = int((2**63 - 1) ** 0.5)
    # Explicit NULL escape, mirroring anomaly_baseline's sibling guard: a
    # null value or a null-moment baseline row (all-null key) makes the
    # bound comparison NULL, and assert_true raises on NULL conditions.
    # The shipped composition happens to survive because Catalyst infers
    # IsNotNull from the downstream var_q>0 / dev*dev filters and pushes
    # them below the guard — but that inference breaks if the filters are
    # separated (persist/checkpoint), reordered, or constraint propagation
    # is disabled, so the guard must tolerate NULL itself. Null rows are
    # dropped by the downstream filters either way.
    guard = F.assert_true(
        dev.isNull()
        | F.col("var_q").isNull()
        | (
            (F.abs(dev) <= F.lit(dev_bound))
            & (F.col("var_q") <= F.lit((2**63 - 1) // max(1, z * z)))
        ),
        F.format_string(
            "anomaly_score_static: |value_q - mean_q| or z^2*var_q exceeds "
            "the int64 budget (vquant=%d, z=%d) — lower vquant.",
            F.lit(vquant),
            F.lit(z),
        ),
    )
    return (
        scored.filter(guard.isNull())
        .filter(
            (F.col("n") >= min_n)
            & (F.col("var_q") > 0)
            & (dev * dev > z * z * F.col("var_q"))
        )
        .select(
            *key_cols,
            ts_col,
            id_col,
            "value_q",
            F.col("n").cast("long").alias("n_base"),
            (dev * dev).alias("dev2"),
            (F.lit(z * z) * F.col("var_q")).alias("thr2"),
        )
    )
