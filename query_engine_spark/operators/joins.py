"""Join operators (SURVEY §2.6): the `replace` family + graph expansions.

The reference has no general join operator, but its `replace` block
(/root/reference/src/main.rs:2396-2488) is a family of real joins on the
post-id self-referencing FKs (`parent`, `root`, `record`), and list
resolution (main.rs:3037-3112) is a family of graph-edge joins.

All joins are equi-joins on ids. Forward lookups (replace with=parent/root/
record) are fact⋈fact self-joins on `id` — at 100 TB both sides shuffle on
the id, or better: the posts table is bucketed by id so the self-join is
co-located with zero shuffle. Inverted lookups (direct_replies/all_replies/
quote_posts) are semi-joins of the big table against the (small) working set
→ broadcast the working-set keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from query_engine_spark.operators.ordering import ORD

__all__ = [
    "replace_with_ref",
    "replace_with_inverse",
    "following",
    "followers",
    "mutuals",
    "following_following",
    "top_moots",
]


def replace_with_ref(
    current: DataFrame,
    posts: DataFrame,
    ref_col: str,
    *,
    keep_missing_ref: bool = True,
    id_col: str = "id",
    strip_prefix: int = 0,
) -> DataFrame:
    """`replace with=parent|root|record` (main.rs:2402-2440).

    Each working-set row is replaced by the post its `ref_col` points at.
    Semantics (main.rs:2402-2414): a row whose ref is EMPTY is kept as-is when
    `keepItemsWithMissingTarget` (default true), else dropped; a row whose ref
    is non-empty but points at a post missing from the store is always
    dropped. `strip_prefix` handles `record` refs shaped "post:<id>"
    (main.rs:2431, `[5..]`).

    Shape: left join working set → posts on ref=id, then per row pick the
    joined post (or the original when ref empty). The working set is small
    (post-limit) so Catalyst broadcasts it against the big posts side under
    AQE; __ord is preserved from the original row (the reference replaces in
    place, main.rs:2449-2468 keeps order).
    """
    ref = F.coalesce(F.col(ref_col), F.lit(""))
    if strip_prefix:
        ref = F.when(ref == "", ref).otherwise(F.substring(ref, strip_prefix + 1, 1 << 20))
    cur = current.withColumn("__ref", ref)

    target_cols = [c for c in posts.columns]
    tgt = posts.select([F.col(c).alias(f"__t_{c}") for c in target_cols])
    joined = cur.join(tgt, cur["__ref"] == tgt[f"__t_{id_col}"], "left")

    has_ref = F.col("__ref") != ""
    found = F.col(f"__t_{id_col}").isNotNull()
    if keep_missing_ref:
        keep = (~has_ref) | found
    else:
        keep = has_ref & found
    joined = joined.filter(keep)

    out_cols = []
    passthrough = set(current.columns) - set(target_cols)
    for c in target_cols:
        if c in current.columns:
            out_cols.append(F.when(has_ref & found, F.col(f"__t_{c}")).otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(f"__t_{c}").alias(c))
    for c in current.columns:
        if c in passthrough:
            out_cols.append(F.col(c))
    return joined.select(out_cols)


def replace_with_inverse(
    current: DataFrame,
    posts: DataFrame,
    ref_col: str,
    *,
    id_col: str = "id",
    strip_prefix: int = 0,
) -> DataFrame:
    """`replace with=direct_replies|all_replies|quote_posts`
    (main.rs:2441-2488): the working set becomes every post whose `ref_col`
    points INTO it. Physical shape: semi-join of the big posts table against
    the broadcast working-set id set."""
    keys = current.select(F.col(id_col).alias("__k")).distinct()
    ref = F.coalesce(F.col(ref_col), F.lit(""))
    if strip_prefix:
        ref = F.when(ref == "", ref).otherwise(F.substring(ref, strip_prefix + 1, 1 << 20))
    big = posts.withColumn("__ref", ref).filter(F.col("__ref") != "")
    out = big.join(F.broadcast(keys), big["__ref"] == keys["__k"], "left_semi").drop("__ref")
    return out


# ---------------------------------------------------------------------------
# Graph expansions backing list resolution (main.rs:3037-3044, fetch_list
# main.rs:3046-3140): follows is an edge DataFrame (src_did, dst_did).


def following(follows: DataFrame, user: str) -> DataFrame:
    """Accounts `user` follows → one column `did`."""
    return follows.filter(F.col("src_did") == user).select(F.col("dst_did").alias("did")).distinct()


def followers(follows: DataFrame, user: str) -> DataFrame:
    return follows.filter(F.col("dst_did") == user).select(F.col("src_did").alias("did")).distinct()


def mutuals(follows: DataFrame, user: str) -> DataFrame:
    """following ∩ followers (main.rs:3040-3042)."""
    return following(follows, user).intersect(followers(follows, user))


def following_following(follows: DataFrame, user: str) -> DataFrame:
    """2-hop expansion: accounts followed by accounts `user` follows
    (main.rs:3038-3039). Self-join of the edge table; the 1-hop frontier of a
    single user is small → broadcast it."""
    hop1 = following(follows, user)
    hop2 = (
        follows.join(F.broadcast(hop1), follows["src_did"] == hop1["did"], "left_semi")
        .select(F.col("dst_did").alias("did"))
        .distinct()
    )
    return hop2


def top_moots(
    follows: DataFrame,
    likes: DataFrame,
    posts: DataFrame,
    user,
    n: int = 50,
    *,
    user_col: str = "user_key",
    post_col: str = "post_key",
    key_col: str = "key",
    author_col: str = "author_key",
) -> DataFrame:
    """`skygraph://<did>/topMoots` (main.rs:3072-3089): the user's mutual
    follows ranked by interaction weight. The reference loads precomputed
    per-user (toDid, weight) lists from a skygraph file (main.rs:130-141);
    this derives the same shape from the likes/follows edges when no
    precomputed table exists: weight(m) = likes by `user` on posts authored
    by m + likes by m on posts authored by `user`. Zero-interaction mutuals
    rank last (weight 0).

    `likes` must be distinct per (user, post) — the reference's bitmap-edge
    ingest invariant (main.rs:3335-3362).

    Shape: the one-user mutual set is tiny → broadcast it into both
    directions' semi-joins; each direction is one keyed aggregation over the
    (pre-filtered) likes edges; returns ≤n rows (TakeOrderedAndProject).
    """
    muts = mutuals(follows, user)  # (did)
    authors = posts.select(F.col(key_col).alias(post_col), F.col(author_col).alias("did"))
    # likes BY `user` on a mutual's posts → outbound weight for that mutual
    outbound = (
        likes.filter(F.col(user_col) == F.lit(user))
        .select(post_col)
        .join(authors, post_col)
        .join(F.broadcast(muts), "did", "left_semi")
        .groupBy("did")
        .agg(F.count(F.lit(1)).alias("__w_out"))
    )
    # likes BY a mutual on `user`'s posts → inbound weight for that mutual
    my_posts = authors.filter(F.col("did") == F.lit(user)).select(post_col)
    inbound = (
        likes.join(F.broadcast(my_posts), post_col, "left_semi")
        .select(F.col(user_col).alias("did"))
        .join(F.broadcast(muts), "did", "left_semi")
        .groupBy("did")
        .agg(F.count(F.lit(1)).alias("__w_in"))
    )
    # outbound/inbound are per-mutual aggregates (≤ |mutuals| rows) → broadcast
    # them as the build sides of the left joins
    w = (
        muts.join(F.broadcast(outbound), "did", "left")
        .join(F.broadcast(inbound), "did", "left")
        .select(
            "did",
            (F.coalesce(F.col("__w_out"), F.lit(0)) + F.coalesce(F.col("__w_in"), F.lit(0))).alias("weight"),
        )
    )
    return w.orderBy(F.col("weight").desc(), F.col("did")).limit(n)
