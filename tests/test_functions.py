"""Tests for ID codecs and the script translator (SURVEY §1.2, §2.9)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from query_engine_spark.functions.ids import (
    at_uri_to_post_id_col,
    datetime_to_tid,
    did_to_key_col,
    key_to_did_col,
    post_id_to_uri_col,
    tid_to_datetime,
)
from query_engine_spark.functions.scripting import ScriptTranslationError, translate_script

UTC = dt.timezone.utc


def test_tid_roundtrip_and_order():
    times = [
        dt.datetime(2024, 1, 1, tzinfo=UTC),
        dt.datetime(2024, 1, 1, 0, 0, 0, 1, tzinfo=UTC),
        dt.datetime(2024, 6, 15, 12, 30, tzinfo=UTC),
        dt.datetime(2025, 1, 1, tzinfo=UTC),
    ]
    tids = [datetime_to_tid(t) for t in times]
    # lexicographic order == time order (the property S1/S3/S4 windows rely on)
    assert tids == sorted(tids)
    assert len(set(tids)) == len(tids)
    for t, tid in zip(times, tids):
        assert len(tid) == 13
        assert tid_to_datetime(tid) == t


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_did_to_key(spark):
    assert _one(spark, did_to_key_col(F.lit("did:plc:abc123"))) == "plc_abc123"
    # web: '.'→'_' and '-'→'__' (main.rs:4151-4170)
    assert _one(spark, did_to_key_col(F.lit("did:web:a-b.example.com"))) == "web_a__b_example_com"
    assert _one(spark, did_to_key_col(F.lit("did:key:xyz"))) is None  # unsupported
    assert _one(spark, did_to_key_col(F.lit("did:plc:ABC"))) is None  # fails key regex


def test_key_to_did(spark):
    assert _one(spark, key_to_did_col(F.lit("plc_abc"))) == "plc:abc"


def test_post_uri_roundtrip(spark):
    uri = "at://did:plc:abc123/app.bsky.feed.post/3kabc"
    pid = _one(spark, at_uri_to_post_id_col(F.lit(uri)))
    assert pid == "post:3kabc_plc_abc123"
    back = _one(spark, post_id_to_uri_col(F.lit(pid)))
    assert back == uri


def test_post_uri_web_host(spark):
    pid = _one(spark, at_uri_to_post_id_col(F.lit("at://did:web:a-b.c/app.bsky.feed.post/3k")))
    assert pid == "post:3k_web_a__b_c"
    assert _one(spark, post_id_to_uri_col(F.lit(pid))) == "at://did:web:a-b.c/app.bsky.feed.post/3k"


def test_uri_rejects(spark):
    assert _one(spark, at_uri_to_post_id_col(F.lit("at://did:plc:x/other.collection/3k"))) is None
    assert _one(spark, at_uri_to_post_id_col(F.lit("at://did:plc:x/app.bsky.feed.post/UPPER"))) is None


def test_script_translation(spark, posts):
    pred = translate_script("likeCount > 5 && replyCount == 2", now_epoch_expr="0")
    got = sorted(r["key"] for r in posts.filter(pred).collect())
    assert got == [1]

    score = translate_script("likeCount * 2 + imageCount", now_epoch_expr="0")
    row = posts.filter(F.col("key") == 1).select(score.cast("double").alias("s")).collect()[0]
    assert row["s"] == 21.0


def test_script_lang_and_age(spark, posts):
    from tests.conftest import NOW

    pred = translate_script('lang == "de"', now_epoch_expr=str(int(NOW.timestamp())))
    got = sorted(r["key"] for r in posts.filter(pred).collect())
    # lang = FIRST element of langs (main.rs:2613-2617): key2 langs=[en,de] → en
    assert got == [3]

    pred = translate_script("ageSeconds > 86400", now_epoch_expr=str(int(NOW.timestamp())))
    got = sorted(r["key"] for r in posts.filter(pred).collect())
    assert got == [4, 5, 6]


def test_script_rejects_unknown():
    with pytest.raises(ScriptTranslationError):
        translate_script("likeCount > 5; drop table posts")
    with pytest.raises(ScriptTranslationError):
        translate_script("unknownVar > 5")
    with pytest.raises(ScriptTranslationError):
        translate_script("likeCount.method()")
