"""Unit tests for filter builders (SURVEY §2.2) on reference-shaped fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from query_engine_spark.operators import filters as Fi
from query_engine_spark.operators.ordering import stamp_ord


def keys(df):
    return sorted(r["key"] for r in df.select("key").collect())


def test_is_reply(posts):
    assert keys(posts.filter(Fi.is_reply())) == [4, 8]
    assert keys(posts.filter(~Fi.is_reply())) == [1, 2, 3, 5, 6, 7]


def test_has_labels(posts):
    assert keys(posts.filter(Fi.has_labels())) == [3]


def test_image_count(posts):
    assert keys(posts.filter(Fi.image_count_is("1"))) == [1]
    assert keys(posts.filter(Fi.image_count_is("2+"))) == [7]
    assert keys(posts.filter(Fi.image_count_is("0"))) == [2, 3, 4, 5, 6, 8]


def test_count_cmp_polarity(posts):
    # keep(p) and remove(p) partition the working set (property from SURVEY §5)
    pred = Fi.count_cmp("like_count", ">", 5)
    kept = keys(Fi.apply_filter(posts, pred, keep=True))
    removed = keys(Fi.apply_filter(posts, pred, keep=False))
    assert sorted(kept + removed) == keys(posts)
    assert kept == [1, 3, 5, 6]


def test_language(posts):
    assert keys(posts.filter(Fi.language_is("de"))) == [2, 3]
    assert keys(posts.filter(Fi.language_is("en"))) == [1, 2, 4, 5, 6, 7, 8]


def test_in_list_semi_anti(spark, posts):
    lst = spark.createDataFrame([(1,), (3,)], "author_key long")
    assert keys(Fi.in_list(posts, lst, "author_key", keep=True)) == [1, 2, 5, 6]
    assert keys(Fi.in_list(posts, lst, "author_key", keep=False)) == [3, 4, 7, 8]


def test_duplicates_partition(posts):
    # duplicate the working set: keep-first picks one copy, non-dup the other
    doubled = stamp_ord(posts.unionByName(posts), ["key"], 1)
    first = Fi.keep_first_duplicates(doubled, ["key"])
    rest = Fi.keep_non_duplicates(doubled, ["key"])
    assert keys(first) == keys(posts)
    assert keys(rest) == keys(posts)
    assert doubled.count() == first.count() + rest.count()


def test_embed_kind(posts):
    assert keys(posts.filter(Fi.embed_kind("none"))) == [1, 2, 3, 4, 6, 7, 8]
    assert keys(posts.filter(Fi.embed_kind("post"))) == [5]


def test_labels_filter(posts):
    assert keys(posts.filter(Fi.has_any_label(["self/nsfw"]))) == [3]
    assert keys(posts.filter(~Fi.has_any_label(["self/nsfw"]))) == [1, 2, 4, 5, 6, 7, 8]


def test_videos(posts):
    assert keys(posts.filter(Fi.is_video())) == [5]


def test_regex_targets(posts):
    # case-insensitive by default (main.rs:2001-2005)
    assert keys(posts.filter(Fi.regex_match("spark", "text"))) == [1]
    # multi-target OR: alt_text hits key 7
    assert keys(posts.filter(Fi.regex_match("zebra|spark", "text|alt_text"))) == [1, 7]
    # link target matches the concatenated links
    assert keys(posts.filter(Fi.regex_match("example\\.com", "link"))) == [2]
    # case sensitive: "Spark" only in... text "hello spark world" is lower
    assert keys(posts.filter(Fi.regex_match("Tuning", "text", case_sensitive=True))) == [2]
    assert keys(posts.filter(Fi.regex_match("tuning", "text", case_sensitive=True))) == []
    # invert
    inv = keys(posts.filter(Fi.regex_match("spark", "text", invert=True)))
    assert inv == [2, 3, 4, 5, 6, 7, 8]
    # the Rust engine's (?-u:\b) rewrite is translated back to Java \b
    assert keys(posts.filter(Fi.regex_match(r"(?-u:\b)spark(?-u:\b)", "text"))) == [1]
    # bug-for-bug parity: the reference rewrites \B to a word BOUNDARY too
    # (main.rs:1983-1987), so \Bspark\B behaves like \bspark\b
    assert keys(posts.filter(Fi.regex_match(r"\Bspark\B", "text"))) == [1]
