from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import SparkSession

from query_engine_spark.session import get_spark
from query_engine_spark.datamodel import normalize_posts

UTC = dt.timezone.utc

# a fixed "now" for deterministic window predicates
NOW = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC)


def ts(days_ago: float) -> dt.datetime:
    return NOW - dt.timedelta(days=days_ago)


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", shuffle_partitions=4)
    yield s


def _post(key, *, days_ago=0.5, author=1, text="", likes=0, replies=0, reposts=0,
          images=0, tags=(), langs=("en",), labels=(), links=(), parent="", root="",
          record="", video=None, alt_text=""):
    t = ts(days_ago)
    return {
        "id": f"p{key:04d}",
        "key": key,
        "author": f"plc_u{author}",
        "author_key": author,
        "text": text,
        "alt_text": alt_text,
        "tags": list(tags),
        "links": list(links),
        "langs": list(langs),
        "mentions": [],
        "labels": list(labels),
        "parent": parent,
        "root": root,
        "record": record,
        "created_at": t.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
        "ts": t.replace(tzinfo=None),
        "reply_count": replies,
        "repost_count": reposts,
        "like_count": likes,
        "quote_count": 0,
        "image_count": images,
        "video": video,
        "via": None,
        "bridgy_original_url": None,
    }


POSTS_FIXTURE = [
    _post(1, days_ago=0.1, author=1, text="hello spark world", likes=10, replies=2, images=1,
          tags=["Spark", "data"], langs=["en"]),
    _post(2, days_ago=0.2, author=1, text="regex Tuning post", likes=5, reposts=3,
          tags=["spark"], langs=["en", "de"], links=["https://example.com/a"]),
    _post(3, days_ago=0.5, author=2, text="ein deutscher beitrag", likes=50,
          langs=["de"], labels=["self/nsfw"]),
    _post(4, days_ago=1.5, author=2, text="reply here", parent="p0001", root="p0001",
          likes=1, replies=0),
    _post(5, days_ago=2.0, author=3, text="quoting things", record="post:p0002", likes=7,
          video={"height": 720, "width": 1280, "size": 1000, "alt": "", "media_type": "video/mp4",
                 "captions_text": ""}),
    _post(6, days_ago=6.5, author=3, text="old post outside day window", likes=100,
          tags=["SPARK", "olap"]),
    _post(7, days_ago=0.3, author=4, text="", alt_text="alt text with keyword zebra", images=2),
    _post(8, days_ago=0.4, author=4, text="reply to missing", parent="p9999", likes=3),
]


@pytest.fixture(scope="session")
def posts(spark):
    from query_engine_spark.datamodel import POST_SCHEMA

    df = spark.createDataFrame(POSTS_FIXTURE, schema=POST_SCHEMA)
    return normalize_posts(df)


LIKES_FIXTURE = [
    # (user_key, post_key, like_id)
    (10, 1, "l1"), (10, 2, "l2"), (10, 3, "l3"),
    (11, 1, "l4"), (11, 5, "l5"),
    (12, 3, "l6"), (12, 5, "l7"), (12, 6, "l8"),
    (13, 6, "l9"),
]


@pytest.fixture(scope="session")
def likes(spark):
    from query_engine_spark.datamodel import LIKE_SCHEMA

    return spark.createDataFrame(LIKES_FIXTURE, schema=LIKE_SCHEMA)


FOLLOWS_FIXTURE = [
    ("a", "b"), ("b", "a"),          # mutuals
    ("a", "c"), ("c", "d"),          # 2-hop a->c->d
    ("e", "a"),
]


@pytest.fixture(scope="session")
def follows(spark):
    from query_engine_spark.datamodel import FOLLOW_SCHEMA

    return spark.createDataFrame(
        [{"src_did": s, "dst_did": d} for s, d in FOLLOWS_FIXTURE], schema=FOLLOW_SCHEMA
    )
