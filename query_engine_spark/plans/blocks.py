"""JSON block-pipeline → DataFrame translator (SURVEY §3, entry point 1).

The reference interprets the block list row-at-a-time over an in-memory Vec
(/root/reference/src/main.rs:1229-2594). Here translation builds ONE lazy
DataFrame expression chain — Catalyst then does what the reference never
could: pushes filters into the scan, prunes columns, reorders/broadcasts the
joins, and fuses everything into whole-stage codegen. Executing the plan is
the driver's final `.collect()` of ≤500 id rows.

Differences from the reference, by design:
- `now` is an explicit parameter (determinism; the reference calls
  Utc::now() per block).
- `sort.random` takes an optional seed.
- remote fetches (feed skeletons, list resolution) are injected as
  DataFrames/callables on PipelineContext — I/O stays at the edges.

Score state: a (key → score) side table exactly like the reference's
`post_score_global` map (main.rs:1399) — kept as a DataFrame so scores
survive stash/pop and working-set replacement, joined on demand by
score-reading blocks (`where`, `sort.score`).

Admission control matches main.rs:1240-1281: ≤32 blocks, ≤10 regex blocks;
the implicit final LIMIT 500 matches main.rs:2510-2512.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from query_engine_spark.operators import filters as Fi
from query_engine_spark.operators import inputs as In
from query_engine_spark.operators import joins as J
from query_engine_spark.operators import scoring as Sc
from query_engine_spark.operators import sorts as So
from query_engine_spark.operators.ordering import ORD, stamp_ord
from query_engine_spark.operators.setops import Stash, append_union
from query_engine_spark.functions.scripting import translate_script

from query_engine_spark.errors import PipelineError

__all__ = ["PipelineContext", "translate_pipeline", "PipelineError"]

MAX_BLOCKS = 32  # main.rs:1240-1254
MAX_REGEX_BLOCKS = 10  # main.rs:1256-1281
FINAL_LIMIT = 500  # main.rs:2510-2512


@dataclass
class PipelineContext:
    spark: SparkSession
    posts: DataFrame
    likes: DataFrame | None = None
    reposts: DataFrame | None = None
    follows: DataFrame | None = None
    lists: dict[str, DataFrame] = field(default_factory=dict)  # listUri → member keys
    feeds: dict[str, DataFrame] = field(default_factory=dict)  # feedUri → (id, __feed_ord)
    now: _dt.datetime = field(default_factory=lambda: _dt.datetime.now(_dt.timezone.utc))
    random_seed: int | None = None
    # opt-in for the sandboxed pandas-UDF script tier (scripting.py): scripts
    # beyond the SQL grammar (reassignment, while, return) run interpreted
    allow_udf_scripts: bool = False

    def resolve_list(self, block: dict[str, Any]) -> DataFrame:
        """fetch_list (main.rs:3046-3140): Bluesky list membership or a graph
        expansion around a DID (following/followers/mutuals/2-hop)."""
        if "listUri" in block:
            uri = block["listUri"]
            if uri not in self.lists:
                raise PipelineError(f"unknown listUri {uri!r}")
            return self.lists[uri]
        list_type = block.get("listType", "following")
        did = block.get("did")
        if did is None or self.follows is None:
            raise PipelineError("list block needs listUri, or did + follows edges")
        if list_type == "following":
            return J.following(self.follows, did)
        if list_type == "followers":
            return J.followers(self.follows, did)
        if list_type == "mutuals":
            return J.mutuals(self.follows, did)
        if list_type == "following_following":
            return J.following_following(self.follows, did)
        raise PipelineError(f"unsupported listType {list_type!r}")


def _empty_like(posts: DataFrame) -> DataFrame:
    return posts.limit(0).withColumn(ORD, F.lit(0).cast("long"))


def _seconds(block: dict[str, Any], key: str, default: int) -> int:
    v = block.get(key, default)
    return int(v) if v is not None else default


class _ScoreState:
    """post_score_global as a (key, score) DataFrame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.df: DataFrame | None = None

    def add(self, batch: DataFrame) -> None:
        """batch: (key, __batch_score) — already normalized by the caller.

        The reference builds the batch map with `post_score.insert(key, s)` —
        per-key OVERWRITE (main.rs:2166-2207), so duplicate rows in the
        working set contribute once. The per-row score is a pure function of
        the post, so max == the overwritten value.
        """
        contrib = batch.groupBy("key").agg(F.max("__batch_score").alias("__s"))
        if self.df is None:
            self.df = contrib.select("key", F.col("__s").alias("score"))
        else:
            self.df = (
                self.df.join(contrib, "key", "full_outer")
                .select(
                    "key",
                    (F.coalesce(F.col("score"), F.lit(0.0)) + F.coalesce(F.col("__s"), F.lit(0.0))).alias("score"),
                )
            )

    def join_onto(self, df: DataFrame, *, default: float = 0.0) -> DataFrame:
        if self.df is None:
            return df.withColumn("score", F.lit(default))
        out = df.join(self.df, "key", "left")
        return out.withColumn("score", F.coalesce(F.col("score"), F.lit(default)))

    def inner_scored(self, df: DataFrame) -> DataFrame:
        if self.df is None:
            return df.limit(0).withColumn("score", F.lit(0.0))
        return df.join(self.df, "key", "inner")


def _normalized_batch(batch: DataFrame, block: dict[str, Any]) -> DataFrame:
    """Apply the reference's default max-normalization
    (add_post_score_to_global_normalized, main.rs:2626-2657)."""
    normalize = block.get("normalize", True)
    if not normalize:
        return batch
    mult = float(block.get("scoreNormalizationMultiplier", "1.0"))
    # batch max as a broadcast scalar (agg + crossJoin broadcast), not an
    # unpartitioned window — same pattern as registry._with_max_ts
    mx_df = batch.agg(F.max("__batch_score").alias("__qe_mx"))
    mx = F.col("__qe_mx")
    return (
        batch.crossJoin(F.broadcast(mx_df))
        .withColumn(
            "__batch_score",
            F.when(mx != 0.0, F.col("__batch_score") / mx * F.lit(mult)).otherwise(F.lit(0.0)),
        )
        .drop("__qe_mx")
    )


def translate_pipeline(blocks: list[dict[str, Any]], ctx: PipelineContext) -> DataFrame:
    """Compose the block list into one DataFrame; returns the final working
    set ordered by __ord and truncated to 500, with (id, key, score, __ord)
    plus all post columns."""
    if len(blocks) > MAX_BLOCKS:
        raise PipelineError(f"Too many blocks ({len(blocks)} > {MAX_BLOCKS})")
    n_regex = sum(1 for b in blocks if b.get("type") == "regex")
    if n_regex > MAX_REGEX_BLOCKS:
        raise PipelineError(f"Too many regex blocks ({n_regex} > {MAX_REGEX_BLOCKS})")

    posts = ctx.posts
    cur = _empty_like(posts)
    stash = Stash()
    scores = _ScoreState(ctx.spark)
    seq = 1
    prepend_seq = -1
    now_epoch = int(ctx.now.timestamp())
    now_us = int(round(ctx.now.timestamp() * 1_000_000))

    def scored_cols(df: DataFrame) -> DataFrame:
        return scores.join_onto(df)

    i = -1
    for block in blocks:
        i += 1
        b_type = block.get("type")
        if b_type == "input":
            cur, seq, prepend_seq = _input_block(block, ctx, cur, posts, scores, seq, prepend_seq)
        elif b_type in ("keep", "remove", "regex"):
            cur = _filter_block(block, ctx, cur, scores, now_epoch)
        elif b_type == "score":
            _score_block(block, ctx, cur, scores, now_epoch, now_us)
        elif b_type == "sort":
            # peephole: sort immediately followed by a plain limit fuses into
            # TakeOrderedAndProject (partial per-partition top-N) instead of a
            # global single-partition window — the 100 TB-safe shape
            nxt = blocks[i + 1] if i + 1 < len(blocks) else None
            fuse_n = None
            if nxt and nxt.get("type") == "limit" and nxt.get("limitType") != "posts_per_user":
                fuse_n = int(nxt.get("count", 100))
            cur = _sort_block(block, ctx, cur, scores, seq, fuse_n=fuse_n)
            seq += 1
        elif b_type == "limit":
            if block.get("limitType") != "posts_per_user" and i > 0 and blocks[i - 1].get("type") == "sort":
                continue  # consumed by the sort→limit fusion above
            cur = _limit_block(block, cur)
        elif b_type == "stash":
            action = block.get("action", "stash")
            key = block["key"]
            if action == "stash":
                stash.stash(key, cur)
                cur = _empty_like(posts)
            elif action == "pop":
                cur = stash.pop(key, cur, block_seq=seq)
                seq += 1
            elif action == "subtract":
                cur = stash.subtract(key, cur)
            else:
                raise PipelineError(f"unknown stash action {action!r}")
        elif b_type == "replace":
            cur = _replace_block(block, cur, posts, seq)
            seq += 1
        elif b_type == "remember_posts":
            pass  # feed-lineage recording (main.rs:2385-2395) — a sink concern
        else:
            raise PipelineError(f"unknown block type {b_type!r}")

    cur = scores.join_onto(cur)
    cur = So.apply_limit(cur, FINAL_LIMIT)
    return cur.orderBy(ORD)


def _input_block(block, ctx, cur, posts, scores, seq, prepend_seq):
    input_type = block.get("inputType", "firehose")
    order_keys = ["id"]
    if input_type == "firehose":
        new = In.input_firehose(posts, ctx.now, _seconds(block, "firehoseSeconds", 86400))
    elif input_type == "list":
        new = In.input_list(posts, ctx.resolve_list(block), ctx.now, _seconds(block, "historySeconds", 604800))
    elif input_type == "tags":
        new = In.input_tags(posts, list(block.get("tags", [])), ctx.now, _seconds(block, "historySeconds", 604800))
    elif input_type == "labels":
        new = In.input_labels(posts, list(block.get("labels", [])), ctx.now, _seconds(block, "historySeconds", 604800))
    elif input_type == "did":
        new = In.input_did(
            posts,
            block["did"],
            collection=block.get("collection", "post"),
            likes=ctx.likes,
            reposts=ctx.reposts,
        )
    elif input_type == "feed":
        uri = block.get("feedUri")
        if uri not in ctx.feeds:
            raise PipelineError(f"unknown feedUri {uri!r}")
        new = In.input_feed(posts, ctx.feeds[uri])
        order_keys = ["__feed_ord"]
    elif input_type == "post":
        new = In.input_post(posts, block.get("postId", block.get("postUri")))
        new = stamp_ord(new, order_keys, prepend_seq)
        return append_union(cur, new.drop("__feed_ord") if "__feed_ord" in new.columns else new), seq, prepend_seq - 1
    elif input_type == "archived":
        newest_first = not block.get("oldestFirst", False)
        limit = int(block.get("limit", 1000))
        pred = _archived_children_pred(block.get("children", []))
        new = In.input_archived(posts, pred, limit, newest_first=newest_first)
        order_keys = ["ts", "id"] if not newest_first else [F.col("ts").desc(), F.col("id").desc()]
    elif input_type == "custom_likedweighted":
        if ctx.likes is None:
            raise PipelineError("custom_likedweighted needs likes edges")
        new = In.input_liked_weighted(
            ctx.likes, posts, ctx.resolve_list(block), base_like_count=int(block.get("baseLikeCount", 0))
        )
        seconds = _seconds(block, "historySeconds", 604800)
        if seconds < 604800:
            new = new.filter(In.window_pred(ctx.now, seconds))
        scores.add(_normalized_batch(new.select("key", "__batch_score"), block))
        # S9 REPLACES the working set, sorted by batch score desc (main.rs:1500-1510)
        new = stamp_ord(new, [F.col("__batch_score").desc(), F.col("key").desc()], seq).drop("__batch_score")
        return new, seq + 1, prepend_seq
    elif input_type == "custom_likedbylikers":
        if ctx.likes is None:
            raise PipelineError("custom_likedbylikers needs likes edges")
        new = In.input_liked_by_likers(
            ctx.likes,
            posts,
            cur if cur is not None else posts.limit(0),
            user_score_function=block.get("userScoreFunction", "f1"),
            score_exponent=float(block.get("scoreExponent", "1.3")),
        )
        seconds = _seconds(block, "historySeconds", 604800)
        if seconds < 604800:
            new = new.filter(In.window_pred(ctx.now, seconds))
        scores.add(_normalized_batch(new.select("key", "__batch_score"), block))
        new = stamp_ord(new, [F.col("__batch_score").desc(), F.col("key").desc()], seq).drop("__batch_score")
        return new, seq + 1, prepend_seq
    else:
        raise PipelineError(f"unknown inputType {input_type!r}")
    new = stamp_ord(new, order_keys, seq)
    if "__feed_ord" in new.columns:
        new = new.drop("__feed_ord")
    return append_union(cur, new), seq + 1, prepend_seq


def _archived_children_pred(children):
    """Nested filters of input.archived (main.rs:784-899), ANDed and pushed
    into the cold scan BEFORE the limit:
    - regex with target key `regexType` (same targets as F14)
    - keep/remove like_count with `min` → like_count >= min
    - keep/remove videos → video presence
    - tags child: dead code in the reference (collected, never applied)
    """
    pred = None

    def conj(p):
        nonlocal pred
        pred = p if pred is None else (pred & p)

    for child in children:
        c_type = child.get("type")
        if c_type == "regex":
            conj(
                Fi.regex_match(
                    child["value"],
                    child.get("regexType", "text"),
                    case_sensitive=child.get("caseSensitive", False),
                    invert=child.get("invert", False),
                )
            )
        elif c_type in ("keep", "remove"):
            subject = child.get("subject")
            if subject == "like_count" and "min" in child:
                conj(F.col("like_count") >= int(child["min"]))
            elif subject == "videos":
                conj(Fi.is_video() if c_type == "keep" else ~Fi.is_video())
            elif subject == "tags":
                pass  # dead code in the reference (main.rs:883-888)
            else:
                raise PipelineError(f"unsupported archived child subject {subject!r}")
        else:
            raise PipelineError(f"unsupported archived child type {c_type!r}")
    return pred


def _filter_block(block, ctx, cur, scores, now_epoch):
    b_type = block["type"]
    if b_type == "regex":
        pred = Fi.regex_match(
            block["value"],
            block.get("target", "text"),
            case_sensitive=block.get("caseSensitive", False),
            invert=block.get("invert", False),
        )
        return cur.filter(pred)

    keep = b_type == "keep"
    subject = block.get("subject")
    # NOTE: the reference IGNORES keep/remove polarity for item / image_count /
    # count-comparison / language subjects — both spellings remove matching
    # posts (main.rs:1796-1902; e.g. `keep item value=post` RETAINS replies).
    # Polarity is honored only for list / where / videos below.
    if subject == "item":
        value = block.get("value") or "reply"  # default "reply" (main.rs:1801-1805)
        if value == "post":
            return cur.filter(Fi.is_reply())  # remove non-replies (main.rs:1807-1808)
        if value == "reply":
            return cur.filter(~Fi.is_reply())
        if value == "repost":
            return cur  # no-op in the reference (main.rs:1811)
        if value == "has_labels":
            return cur.filter(~Fi.has_labels())
        if value == "has_no_labels":
            return cur.filter(Fi.has_labels())
        raise PipelineError(f"unknown item value {value!r}")
    if subject == "image_count":
        value = str(block.get("value") or "0")
        # remove-matching in both polarities (main.rs:1817-1830)
        return cur.filter(~Fi.image_count_is(value))
    if subject in ("reply_count", "repost_count", "like_count"):
        # default operator "<"; remove-matching: `< v` retains >= v
        # (main.rs:1831-1884); value is required there (unwrap)
        if "value" not in block:
            raise PipelineError(f"{subject} filter requires a value (main.rs:1832)")
        op = block.get("operator") or "<"
        if op not in ("<", ">", "==", "!="):
            raise PipelineError(f"unsupported {subject} operator {op!r}")
        return cur.filter(~Fi.count_cmp(subject, op, int(block["value"])))
    if subject == "language":
        # key is `language` (default "en"), default operator "!=";
        # "==" removes posts IN the language, "!=" removes posts NOT in it
        # (main.rs:1885-1902). `value` accepted as a lenient fallback key.
        op = block.get("operator") or "!="
        lang = block.get("language", block.get("value", "en")) or "en"
        member = Fi.language_is(lang)
        if op == "==":
            return cur.filter(~member)
        if op == "!=":
            return cur.filter(member)
        return cur  # other operators: no retain call at all (main.rs:1896-1901)
    if subject == "list":
        return Fi.in_list(cur, ctx.resolve_list(block), "author_key", keep=keep)
    if subject == "duplicates":
        return Fi.keep_first_duplicates(cur, ["key"])
    if subject == "non_duplicates":
        return Fi.keep_non_duplicates(cur, ["key"])
    if subject == "embed":
        value = block.get("value", "none")
        # reference REMOVES matching rows in both polarities here
        # (main.rs:1922-1935: keep/remove both call retain(!pred))
        return cur.filter(~Fi.embed_kind({"feed": "feed", "post": "post", "none": "none"}[value]))
    if subject == "labels":
        # always REMOVES matching posts regardless of polarity, labels
        # lowercased first (main.rs:1936-1951)
        wanted = [str(x).lower() for x in block.get("labels", [])]
        return cur.filter(~Fi.has_any_label(wanted))
    if subject == "where":
        pred = translate_script(
            block["value"],
            now_epoch_expr=str(now_epoch),
            allow_udf=ctx.allow_udf_scripts,
            boolean=True,
        )
        return Fi.apply_filter(scores.join_onto(cur), pred, keep=keep).drop("score")
    if subject == "videos":
        return Fi.apply_filter(cur, Fi.is_video(), keep=keep)
    raise PipelineError(f"unknown filter subject {subject!r}")


def _score_block(block, ctx, cur, scores, now_epoch, now_us):
    if block.get("scoreType", "add") != "add":
        raise PipelineError("only scoreType=add exists (main.rs:2151-2162)")
    if "value" in block:
        col = translate_script(
            block["value"], now_epoch_expr=str(now_epoch), allow_udf=ctx.allow_udf_scripts
        ).cast("double")
        batch = scores.join_onto(cur).withColumn("__batch_score", col)
    else:
        from_ = block.get("from", "likes")
        if from_ in ("like_count", "likes"):
            batch = cur.withColumn("__batch_score", F.col("like_count").cast("double"))
        elif from_ == "repost_count":
            batch = cur.withColumn("__batch_score", F.col("repost_count").cast("double"))
        elif from_ == "reply_count":
            batch = cur.withColumn("__batch_score", F.col("reply_count").cast("double"))
        elif from_ == "hn":
            gravity = float(block.get("gravity", "1.8"))
            age_us = F.lit(now_us) - F.unix_micros(F.col("ts"))
            batch = cur.withColumn("__batch_score", Sc.hn_score_from_micros(F.col("like_count"), age_us, gravity))
        elif from_ == "created_at":
            # main.rs:2201-2208: score = epoch millis / 1000 (integer division)
            batch = cur.withColumn("__batch_score", F.floor(F.unix_millis(F.col("ts")) / 1000).cast("double"))
        else:
            raise PipelineError(f"unknown score from {from_!r}")
    scores.add(_normalized_batch(batch.select("key", "__batch_score"), block))


def _sort_block(block, ctx, cur, scores, seq, fuse_n=None):
    sort_type = block.get("sortType", "created_at")
    asc = block.get("sortDirection", block.get("direction", "desc")) == "asc"

    def finish(df, keys, extra_drop=()):
        """Apply the sort: fused top-N when a plain limit follows, else a
        full __ord restamp (Rust stable sort → previous __ord breaks ties)."""
        tie = [F.col("id")] if "id" in df.columns else []
        if ORD in df.columns:
            tie.append(F.col(ORD))
        keys = list(keys) + tie
        if fuse_n is not None:
            out = So.top_n_with_ord(df, keys, fuse_n, seq)
        else:
            out = So.sort_by(df, keys, seq, tiebreak=())
        return out.drop(*extra_drop) if extra_drop else out

    if sort_type == "created_at":
        return finish(cur, [F.col("ts").asc() if asc else F.col("ts").desc()])
    if sort_type == "hn":
        gravity = float(block.get("gravity", "1.8"))
        age_us = F.lit(int(round(ctx.now.timestamp() * 1_000_000))) - F.unix_micros(F.col("ts"))
        s = Sc.hn_score_from_micros(F.col("like_count"), age_us, gravity)
        cur = cur.withColumn("__hn", s)
        return finish(cur, [F.col("__hn").asc() if asc else F.col("__hn").desc()], extra_drop=("__hn",))
    if sort_type in ("likes", "repost_count", "reply_count"):
        col = {"likes": "like_count", "repost_count": "repost_count", "reply_count": "reply_count"}[sort_type]
        return finish(cur, [F.col(col).asc() if asc else F.col(col).desc()])
    if sort_type == "random":
        cur = cur.withColumn("__r", F.rand(ctx.random_seed) if ctx.random_seed is not None else F.rand())
        return finish(cur, [F.col("__r")], extra_drop=("__r",))
    if sort_type == "score":
        # join global scores (inner: unscored drop — main.rs:2286-2307),
        # dedup by key keeping first occurrence, sort by score
        scored = scores.inner_scored(cur)
        scored = Fi.keep_first_duplicates(scored, ["key"])
        c = F.col("score").asc() if asc else F.col("score").desc()
        # ties keep descending key order (BTreeMap .iter().rev() + stable sort)
        if fuse_n is not None:
            return So.top_n_with_ord(scored, [c, F.col("key").desc()], fuse_n, seq).drop("score")
        return So.sort_by(scored, [c, F.col("key").desc()], seq, tiebreak=()).drop("score")
    raise PipelineError(f"unknown sortType {sort_type!r}")


def _limit_block(block, cur):
    if block.get("limitType") == "posts_per_user":
        n = int(block.get("count", 3 if "count" in block else 5))
        return So.posts_per_user(cur, n)
    return So.apply_limit(cur, int(block.get("count", 100)))


def _replace_block(block, cur, posts, seq):
    target = block.get("with", "parent")
    keep_missing = block.get("keepItemsWithMissingTarget", True)
    if target == "parent":
        return J.replace_with_ref(cur, posts, "parent", keep_missing_ref=keep_missing)
    if target == "root":
        return J.replace_with_ref(cur, posts, "root", keep_missing_ref=keep_missing)
    if target == "record":
        # record refs are "post:<id>" — strip the 5-char prefix (main.rs:2431)
        return J.replace_with_ref(cur, posts, "record", keep_missing_ref=keep_missing, strip_prefix=5)
    # inverse targets REBUILD the working set from the store (main.rs:2441-2488,
    # iteration over the id-ordered map) → stamp fresh order by id
    if target == "direct_replies":
        return stamp_ord(J.replace_with_inverse(cur, posts, "parent"), ["id"], seq)
    if target == "all_replies":
        return stamp_ord(J.replace_with_inverse(cur, posts, "root"), ["id"], seq)
    if target == "quote_posts":
        return stamp_ord(J.replace_with_inverse(cur, posts, "record", strip_prefix=5), ["id"], seq)
    raise PipelineError(f"unknown replace target {target!r}")
