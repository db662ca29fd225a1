"""Filter/predicate blocks (SURVEY §2.2, F1–F15).

Every reference filter is ``posts.retain(pred)`` with dual keep/remove
polarity (/root/reference/src/main.rs:1796-2150). Here each builder returns a
pure ``Column`` predicate; ``apply_filter`` applies it with the polarity. Pure
Column predicates stay inside whole-stage codegen and push down to the parquet
scan — the 100 TB behavior we want (the reference instead re-scans its RAM
vector per block).

Null semantics: the reference's fields are non-null (ingest defaults,
main.rs:3477-3530), so predicates here wrap nullable inputs with coalesce
where the reference would have seen a default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from query_engine_spark.operators.ordering import ORD

__all__ = [
    "apply_filter",
    "is_reply",
    "has_labels",
    "image_count_is",
    "count_cmp",
    "language_is",
    "in_list",
    "keep_first_duplicates",
    "keep_non_duplicates",
    "embed_kind",
    "has_any_label",
    "is_video",
    "regex_match",
    "REGEX_TARGETS",
]


def apply_filter(df: DataFrame, pred: Column, *, keep: bool = True) -> DataFrame:
    """keep → retain(pred); remove → retain(!pred)  (main.rs:1800-1816 shape)."""
    return df.filter(pred if keep else ~pred)


# F1 — item kind: reply test is `parent != ""` (main.rs:4324-4326);
# has_labels / has_no_labels (main.rs:1808-1815)
def is_reply(parent: str = "parent") -> Column:
    return F.coalesce(F.col(parent), F.lit("")) != ""


def has_labels(labels: str = "labels") -> Column:
    return F.size(F.coalesce(F.col(labels), F.array())) > 0


# F2 — image_count 0 / 1 / 2+ (main.rs:1817-1830)
def image_count_is(value: str, col: str = "image_count") -> Column:
    if value == "2+":
        return F.col(col) >= 2
    return F.col(col) == int(value)


# F3/F4/F5 — count comparisons < > == != (main.rs:1831-1884)
_OPS = {
    "<": lambda c, v: c < v,
    ">": lambda c, v: c > v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<=": lambda c, v: c <= v,
    ">=": lambda c, v: c >= v,
}


def count_cmp(col: str, op: str, value: float) -> Column:
    if op not in _OPS:
        raise ValueError(f"unsupported comparison {op!r}")
    return _OPS[op](F.col(col), F.lit(value))


# F6 — language membership in the `langs` set, default "en" (main.rs:1885-1902)
def language_is(lang: str = "en", langs: str = "langs") -> Column:
    return F.array_contains(F.coalesce(F.col(langs), F.array()), lang)


# F7 — list membership = semi/anti join on author (main.rs:1903-1915).
# `broadcast` because lists are small dimension sets; at 100 TB a shuffled
# semi-join of the fact table against a tiny list would be the bottleneck.
def in_list(df: DataFrame, list_df: DataFrame, on: str, *, keep: bool = True) -> DataFrame:
    how = "left_semi" if keep else "left_anti"
    return df.join(F.broadcast(list_df.select(on).distinct()), on, how)


# F8/F9 — order-sensitive dedup: keep first occurrence / keep only 2nd+
# (main.rs:1916-1921). The occurrence rank is a window PARTITIONED by the key
# — no global sort. Pass `order_by` columns directly when the working-set
# order is expressible from natural columns (skips the global __ord stamp
# entirely, the scalable path); default uses the __ord convention.
def _occurrence_rank(key_cols: Sequence[str], order_by: Sequence[Column]) -> Column:
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return F.row_number().over(w)


def _order_cols(df: DataFrame, order_by: Sequence[Column | str] | None) -> list[Column]:
    if order_by is not None:
        return [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [F.col(ORD)]


def keep_first_duplicates(
    df: DataFrame, key_cols: Sequence[str], order_by: Sequence[Column | str] | None = None
) -> DataFrame:
    return (
        df.withColumn("__occ", _occurrence_rank(key_cols, _order_cols(df, order_by)))
        .filter(F.col("__occ") == 1)
        .drop("__occ")
    )


def keep_non_duplicates(
    df: DataFrame, key_cols: Sequence[str], order_by: Sequence[Column | str] | None = None
) -> DataFrame:
    return (
        df.withColumn("__occ", _occurrence_rank(key_cols, _order_cols(df, order_by)))
        .filter(F.col("__occ") > 1)
        .drop("__occ")
    )


# F10 — embed kind on the `record` ref: none / feed… / post… (main.rs:1922-1935)
def embed_kind(value: str, record: str = "record") -> Column:
    rec = F.coalesce(F.col(record), F.lit(""))
    if value == "none":
        return rec == ""
    return rec.startswith(value)


# F11 — label anti-membership (main.rs:1936-1951); label keys are
# "self/<val>" or "<labeler_did>/<val>" (main.rs:3261, 3964-3974)
def has_any_label(wanted: Sequence[str], labels: str = "labels") -> Column:
    return F.arrays_overlap(
        F.coalesce(F.col(labels), F.array()),
        F.array(*[F.lit(x) for x in wanted]),
    )


# F13 — video presence (main.rs:1972-1981)
def is_video(video: str = "video") -> Column:
    return F.col(video).isNotNull()


# F14 — regex block (main.rs:1982-2150).
# Targets: text, alt_text, link, and their | combinations (main.rs:2093-2140);
# links are concatenated before matching (main.rs:2100). caseSensitive=false
# prepends (?i) (main.rs:2001-2005); the Rust engine rewrites \b to (?-u:\b)
# (main.rs:1983-1987) — Java regex \b is already ASCII-ish there, so we rewrite
# it back.
REGEX_TARGETS = {
    "text": ("text",),
    "alt_text": ("alt_text",),
    "link": ("link",),
    "text|alt_text": ("text", "alt_text"),
    "alt_text|link": ("alt_text", "link"),
    "text|link": ("text", "link"),
    "text|alt_text|link": ("text", "alt_text", "link"),
}


def _java_pattern(pattern: str, case_sensitive: bool) -> str:
    # the Rust engine rewrites BOTH \b and \B to its ASCII boundary (?-u:\b)
    # (main.rs:1983-1987 — yes, \B becomes a word BOUNDARY there); feeds
    # written against the reference depend on that observable behavior, so
    # replicate it, then translate the Rust form back to Java's \b
    pattern = pattern.replace("\\B", "(?-u:\\b)")
    pattern = pattern.replace("(?-u:\\b)", "\\b")
    if not case_sensitive:
        pattern = "(?i)" + pattern
    return pattern


def regex_match(
    pattern: str,
    target: str = "text",
    *,
    case_sensitive: bool = False,
    invert: bool = False,
    columns: dict[str, Column] | None = None,
) -> Column:
    """OR of rlike over the target columns; `columns` maps logical target
    names (text / alt_text / link) to actual Columns (link defaults to the
    concatenated `links` array, matching main.rs:2100)."""
    if target not in REGEX_TARGETS:
        raise ValueError(f"unknown regex target {target!r}")
    columns = columns or {}
    pat = _java_pattern(pattern, case_sensitive)
    pred: Column | None = None
    for name in REGEX_TARGETS[target]:
        col = columns.get(name)
        if col is None:
            # links are matched on their no-separator concatenation
            # (`p.links.concat()`, main.rs:2100)
            col = F.array_join(F.col("links"), "") if name == "link" else F.col(name)
        this = F.coalesce(col, F.lit("")).rlike(pat)
        pred = this if pred is None else (pred | this)
    assert pred is not None
    return ~pred if invert else pred
