"""Fixed schemas for the SkyFeed domain, re-expressed as Spark StructTypes.

The reference hard-codes Rust structs and coerces loosely-typed upstream JSON
into them with null-tolerant defaults (``process_post``
/root/reference/src/main.rs:3447-3682, ``process_profile`` main.rs:3684-3718).
We declare the equivalent StructTypes once, and `normalize_posts` applies the
same defaulting (missing → ""/[]/0/null) as column expressions at ingest.

Improvement over the reference: `created_at` is parsed to a native
TimestampType `ts` column once at ingest (the reference re-parses RFC3339 per
query, main.rs:4332-4336), so every history-window predicate is a native
timestamp comparison that prunes parquet partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "VIDEO_TYPE",
    "POST_SCHEMA",
    "PROFILE_SCHEMA",
    "LIKE_SCHEMA",
    "LABEL_SCHEMA",
    "FOLLOW_SCHEMA",
    "LIST_MEMBERSHIP_SCHEMA",
    "normalize_posts",
]

# PostV1Video — main.rs:4258-4268
VIDEO_TYPE = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("size", T.LongType()),
        T.StructField("alt", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("captions_text", T.StringType()),
    ]
)

# PostV1 — main.rs:4213-4256 (counts u32→int; sets→array<string>; TID id)
POST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # TID, lexicographically time-ordered
        T.StructField("key", T.LongType(), False),  # interned surrogate (main.rs:4226)
        T.StructField("author", T.StringType()),  # "plc_…" / "web_…" key form
        T.StructField("author_key", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("alt_text", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("langs", T.ArrayType(T.StringType())),
        T.StructField("mentions", T.ArrayType(T.StringType())),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("parent", T.StringType()),  # "" = not a reply (main.rs:4324-4326)
        T.StructField("root", T.StringType()),
        T.StructField("record", T.StringType()),  # embed ref "post:…"/"feed:…"
        T.StructField("created_at", T.StringType()),  # RFC3339 as ingested
        T.StructField("ts", T.TimestampType()),  # parsed once at ingest
        T.StructField("reply_count", T.IntegerType()),
        T.StructField("repost_count", T.IntegerType()),
        T.StructField("like_count", T.IntegerType()),
        T.StructField("quote_count", T.IntegerType()),  # always 0 (main.rs:3652)
        T.StructField("image_count", T.IntegerType()),
        T.StructField("video", VIDEO_TYPE),
        T.StructField("via", T.StringType()),
        T.StructField("bridgy_original_url", T.StringType()),
    ]
)

# Profile — main.rs:4270-4290
PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("handle", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("has_avatar", T.BooleanType()),
        T.StructField("has_banner", T.BooleanType()),
        T.StructField("follower_count", T.IntegerType()),
        T.StructField("following_count", T.IntegerType()),
    ]
)

# like edge — main.rs:3335-3362 (both bitmap directions collapse to one edge table)
LIKE_SCHEMA = T.StructType(
    [
        T.StructField("user_key", T.LongType(), False),
        T.StructField("post_key", T.LongType(), False),
        T.StructField("like_id", T.StringType()),  # TID-ordered
    ]
)

# label stream with retractions — main.rs:3957-3995 (neg=true retracts)
LABEL_SCHEMA = T.StructType(
    [
        T.StructField("labeler_did", T.StringType()),
        T.StructField("val", T.StringType()),
        T.StructField("post_id", T.StringType()),
        T.StructField("neg", T.BooleanType()),
        T.StructField("seq", T.LongType()),
    ]
)

# follow edge — backs following/followers/mutuals/2-hop list resolution
# (main.rs:3037-3044)
FOLLOW_SCHEMA = T.StructType(
    [
        T.StructField("src_did", T.StringType(), False),
        T.StructField("dst_did", T.StringType(), False),
    ]
)

# Bluesky list membership — main.rs:1226-1227, 3110-3112
LIST_MEMBERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("list_uri", T.StringType(), False),
        T.StructField("member_did", T.StringType(), False),
    ]
)

_STRING_DEFAULTS = [
    "author", "text", "alt_text", "parent", "root", "record", "created_at",
]
_ARRAY_DEFAULTS = ["tags", "links", "langs", "mentions", "labels"]
_COUNT_DEFAULTS = ["reply_count", "repost_count", "like_count", "quote_count", "image_count"]


def normalize_posts(df: DataFrame) -> DataFrame:
    """Apply the reference's null-tolerant ingest defaulting as expressions.

    Mirrors ``process_post`` (main.rs:3447-3682): missing strings → "",
    missing sets → [], missing counts → 0; `ts` derived from `created_at`.
    Input may omit any nullable column; output conforms to POST_SCHEMA order.
    """
    cols = set(df.columns)
    out = df
    for c in _STRING_DEFAULTS:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")) if c in cols else F.lit(""))
    for c in _ARRAY_DEFAULTS:
        base = F.col(c) if c in cols else F.lit(None).cast(T.ArrayType(T.StringType()))
        out = out.withColumn(c, F.coalesce(base, F.array().cast(T.ArrayType(T.StringType()))))
    for c in _COUNT_DEFAULTS:
        base = F.col(c) if c in cols else F.lit(None)
        out = out.withColumn(c, F.coalesce(base.cast("int"), F.lit(0)))
    if "ts" not in cols:
        out = out.withColumn("ts", F.to_timestamp("created_at"))
    else:
        out = out.withColumn("ts", F.coalesce(F.col("ts"), F.to_timestamp("created_at")))
    if "author_key" not in cols:
        out = out.withColumn("author_key", F.lit(None).cast("long"))
    for c in ("video",):
        if c not in cols:
            out = out.withColumn(c, F.lit(None).cast(VIDEO_TYPE))
    for c in ("via", "bridgy_original_url"):
        if c not in cols:
            out = out.withColumn(c, F.lit(None).cast("string"))
    return out.select([f.name for f in POST_SCHEMA.fields])
