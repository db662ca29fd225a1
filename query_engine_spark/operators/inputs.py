"""Input/scan blocks (SURVEY §2.1, S1–S11).

Each input block appends rows to the working set (bag union, order-
preserving). Builders here return DataFrames stamped with ``__ord`` by the
caller (plans/blocks.py). Every "history window" in the reference is a TID
string range scan (/root/reference/src/main.rs:1424); we keep a native
timestamp column instead, so the same predicate is a parquet partition-prune +
row-group min/max skip — the correct 100 TB scan shape.

`now` is passed explicitly everywhere (the reference uses Utc::now()); tests
and oracle queries pin it to a deterministic value (e.g. max(ts)).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, functions as F

from query_engine_spark.operators.scoring import weight_fn

__all__ = [
    "window_pred",
    "input_firehose",
    "input_list",
    "input_tags",
    "input_labels",
    "input_feed",
    "input_did",
    "input_post",
    "input_archived",
    "input_liked_weighted",
    "input_liked_by_likers",
]


def window_pred(now: _dt.datetime | Column, seconds: int, ts: str = "ts") -> Column:
    """ts >= now - seconds (main.rs:1417-1424 cutoff-TID range).

    `now` may be a Column (e.g. a broadcast-scalar "data max" column attached
    by PipelineContext) so the cutoff stays in-plan — no driver round-trip.
    A datetime `now` folds to a literal, which parquet min/max skipping and
    partition pruning can use directly."""
    if isinstance(now, Column):
        return F.col(ts) >= now - F.expr(f"INTERVAL {int(seconds)} SECOND")
    cutoff = now - _dt.timedelta(seconds=seconds)
    return F.col(ts) >= F.lit(cutoff)


def input_firehose(posts: DataFrame, now: _dt.datetime, seconds: int = 86400) -> DataFrame:
    """S1 — main.rs:1410-1426 (default firehoseSeconds=86400)."""
    return posts.filter(window_pred(now, seconds))


def input_list(
    posts: DataFrame,
    list_df: DataFrame,
    now: _dt.datetime,
    seconds: int = 604800,
    *,
    author: str = "author_key",
) -> DataFrame:
    """S2 — posts by list members within historySeconds (main.rs:1427-1452).
    Lists are small → broadcast semi-join."""
    members = list_df.select(F.col(list_df.columns[0]).alias(author)).distinct()
    return posts.join(F.broadcast(members), author, "left_semi").filter(window_pred(now, seconds))


def input_tags(
    posts: DataFrame,
    tags: list[str],
    now: _dt.datetime,
    seconds: int = 604800,
    *,
    tags_col: str = "tags",
) -> DataFrame:
    """S3 — union of per-tag postings within window (main.rs:1606-1668).
    The reference unions tag bitmaps; `arrays_overlap` on the lowered tag
    array is the same set, one scan."""
    wanted = F.array(*[F.lit(t.lower()) for t in tags])
    lowered = F.transform(F.coalesce(F.col(tags_col), F.array()), F.lower)
    return posts.filter(F.arrays_overlap(lowered, wanted)).filter(window_pred(now, seconds))


def input_labels(
    posts: DataFrame,
    labels: list[str],
    now: _dt.datetime,
    seconds: int = 604800,
    *,
    labels_col: str = "labels",
) -> DataFrame:
    """S4 — main.rs:1669-1703; label keys "self/<val>" / "<did>/<val>"."""
    wanted = F.array(*[F.lit(x) for x in labels])
    return posts.filter(
        F.arrays_overlap(F.coalesce(F.col(labels_col), F.array()), wanted)
    ).filter(window_pred(now, seconds))


def input_feed(posts: DataFrame, feed_ids: DataFrame, *, id_col: str = "id") -> DataFrame:
    """S5 — external feed skeleton ids semi-joined against the store,
    preserving the feed's order (main.rs:1704-1737). `feed_ids` carries
    (id, __feed_ord); rows missing from the store drop out (inner join)."""
    return (
        feed_ids.join(posts, id_col, "inner")
    )


def input_did(
    posts: DataFrame,
    author_key,
    *,
    author: str = "author_key",
    collection: str = "post",
    likes: DataFrame | None = None,
    reposts: DataFrame | None = None,
    parent_col: str = "parent",
    key_col: str = "key",
    user_col: str = "user_key",
    post_col: str = "post_key",
) -> DataFrame:
    """S6 — one user's rows by the `collection` matrix (prefetch
    main.rs:1300-1344, SQL templates main.rs:3755-3757):

        starts_with "post"   → authored top-level posts (parent == "")
        contains    "reply"  → authored replies (parent != "")
        contains    "repost" → posts the user reposted (edge table)
        ends_with   "like"   → posts the user liked (edge table)

    Parts union in that order (the reference appends sequentially). With full
    history in parquet the reference's "fetch remote" special case disappears:
    each part is a pruned scan or a broadcast semi-join on one user's edges.
    `withCounts` is an ingest concern here — counts are refreshed by
    streaming.ingest.merge_counts, not per query."""
    authored = posts.filter(F.col(author) == F.lit(author_key))
    has_parent = parent_col in posts.columns
    parts: list[DataFrame] = []
    if collection.startswith("post"):
        # tables without a parent ref have no reply notion — all rows are posts
        parts.append(
            authored.filter(F.coalesce(F.col(parent_col), F.lit("")) == "") if has_parent else authored
        )
    if "reply" in collection and has_parent:
        parts.append(authored.filter(F.coalesce(F.col(parent_col), F.lit("")) != ""))
    if "repost" in collection:
        if reposts is None:
            raise ValueError("collection includes 'repost' but no reposts edge table given")
        keys = reposts.filter(F.col(user_col) == F.lit(author_key)).select(F.col(post_col).alias(key_col))
        parts.append(posts.join(F.broadcast(keys.distinct()), key_col, "left_semi"))
    if collection.endswith("like"):
        if likes is None:
            raise ValueError("collection includes 'like' but no likes edge table given")
        keys = likes.filter(F.col(user_col) == F.lit(author_key)).select(F.col(post_col).alias(key_col))
        parts.append(posts.join(F.broadcast(keys.distinct()), key_col, "left_semi"))
    if not parts:
        return posts.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def input_post(posts: DataFrame, post_id, *, id_col: str = "id") -> DataFrame:
    """S7 — single post by id; the caller PREPENDS it (main.rs:1780-1791)."""
    return posts.filter(F.col(id_col) == F.lit(post_id))


def input_archived(
    posts: DataFrame,
    pred: Column | None,
    limit: int = 1000,
    *,
    newest_first: bool = True,
    ts: str = "ts",
    tiebreak: str = "id",
) -> DataFrame:
    """S8 — cold archive scan with pushed-down predicates and a ≤1000 cap
    (main.rs:706-974, 1354-1376). On parquet this is just scan+filter+top-N:
    Catalyst pushes the predicate to the footer level and
    ``orderBy().limit()`` runs as TakeOrderedAndProject."""
    df = posts if pred is None else posts.filter(pred)
    order = [F.col(ts).desc(), F.col(tiebreak).desc()] if newest_first else [F.col(ts).asc(), F.col(tiebreak).asc()]
    return df.orderBy(*order).limit(min(limit, 1000))


def input_liked_weighted(
    likes: DataFrame,
    posts: DataFrame,
    list_df: DataFrame,
    *,
    base_like_count: int = 0,
    user_col: str = "user_key",
    post_col: str = "post_key",
    key_col: str = "key",
    edges_distinct: bool = False,
    cache: bool = False,
) -> DataFrame:
    """S9 — posts liked by list members, scored Σ 1/(baseLikeCount +
    user_total_likes) (main.rs:1453-1514). Returns posts + `__batch_score`,
    sorted desc by it (caller normalizes into `score` via scoring.add_score).

    Shape: likes ⋈ list (broadcast semi) → per-user like totals (agg) →
    per-post weight sum (agg) → join posts. Two shuffles on likes, both
    keyed — the minimum for this computation.

    `edges_distinct=True` skips the dedup shuffle when the edge table is
    already unique per (user, post) — make that an INGEST invariant at scale
    (the reference's bitmaps are deduped at ingest, main.rs:3335-3362), not a
    per-query full shuffle of the 100 TB edge table.

    `cache=True` persists the member-filtered edge set, which BOTH the
    user-totals aggregate and the weight sum consume — without it each branch
    re-scans and re-dedups the edge table. Opt-in because the cached blocks
    live until `cache.clear_tracked_cache()`; batch/bench paths clear between
    queries, a serving driver must do its own housekeeping.
    """
    if not edges_distinct:
        likes = likes.select(user_col, post_col).distinct()  # bitmap edges are distinct
    members = list_df.select(F.col(list_df.columns[0]).alias(user_col)).distinct()
    member_likes = likes.join(F.broadcast(members), user_col, "left_semi")
    if cache:
        from query_engine_spark.cache import tracked_persist

        member_likes = tracked_persist(member_likes)
    user_totals = member_likes.groupBy(user_col).agg(F.count("*").alias("__user_likes"))
    scored = (
        member_likes.join(user_totals, user_col)
        .withColumn("__w", F.lit(1.0) / (F.lit(float(base_like_count)) + F.col("__user_likes")))
        .groupBy(post_col)
        .agg(F.sum("__w").alias("__batch_score"))
    )
    return posts.join(scored, posts[key_col] == scored[post_col], "inner").drop(post_col)


def input_liked_by_likers(
    likes: DataFrame,
    posts: DataFrame,
    seed_posts: DataFrame,
    *,
    user_score_function: str = "f1",
    score_exponent: float = 1.0,
    user_col: str = "user_key",
    post_col: str = "post_key",
    key_col: str = "key",
    edges_distinct: bool = False,
    cache: bool = False,
) -> DataFrame:
    """S10 — 2-hop collaborative filtering (main.rs:1515-1605).

    Hop 1 (main.rs:1544-1562): for each seed post, each of its likers gains
    curator weight ``f(<liker count of that seed post>)`` — defaults
    userScoreFunction="f1", scoreExponent=1.3 — summed over the seed posts
    they liked; weights ≤ 0 are dropped before accumulating (main.rs:1558).
    Hop 2 (main.rs:1568-1589): every post any curator liked is scored
    Σ curator_weight; the working set is REPLACED by these posts sorted by
    score desc (posts.clear(), main.rs:1592-1599).

    Shape: two passes over the likes edge table (seed⋈likes → curators;
    curators⋈likes → posts), each a keyed agg. The seed set is small
    (a feed working set) → broadcast. The per-seed-post liker totals are
    computed from the seed-filtered edges (identical: seed_likes holds ALL
    likers of each seed post), never a full-table aggregate. `cache=True`
    persists the deduped edge table shared by both hops (see S9 docstring
    for the cleanup contract).
    """
    # the reference's like edges are Roaring bitmaps → (user, post) pairs are
    # implicitly distinct (main.rs:61-62); dedupe the edge table to match
    # unless the caller guarantees it at ingest (edges_distinct)
    if not edges_distinct:
        likes = likes.select(user_col, post_col).distinct()
    if cache:
        from query_engine_spark.cache import tracked_persist

        likes = tracked_persist(likes)
    seed_keys = seed_posts.select(F.col(key_col).alias(post_col)).distinct()
    seed_likes = likes.join(F.broadcast(seed_keys), post_col, "left_semi")
    post_totals = seed_likes.groupBy(post_col).agg(F.count("*").alias("__post_likers"))
    per_like_w = seed_likes.join(F.broadcast(post_totals), post_col).withColumn(
        "__w", weight_fn(user_score_function, F.col("__post_likers"), score_exponent)
    )
    curators = (
        per_like_w.filter(F.col("__w") > 0.0)
        .groupBy(user_col)
        .agg(F.sum("__w").alias("__curator_w"))
    )
    curated = (
        likes.join(curators, user_col)
        .groupBy(post_col)
        .agg(F.sum("__curator_w").alias("__batch_score"))
    )
    return posts.join(curated, posts[key_col] == curated[post_col], "inner").drop(post_col)
