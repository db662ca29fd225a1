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


def test_script_let_and_if_sql_tier(spark, posts):
    # let bindings inline; if/else becomes CASE WHEN — still pure SQL (no UDF)
    script = """
        let e = likeCount + repostCount;
        if e > 20 { e * 2 } else { e }
    """
    col = translate_script(script, now_epoch_expr="0").cast("double")
    rows = {r["key"]: r["v"] for r in posts.select("key", col.alias("v")).collect()}
    # key1: 10+0=10 → 10; key3: 50 → 100; key2: 5+3=8 → 8; key6: 100 → 200
    assert rows[1] == 10.0 and rows[3] == 100.0 and rows[2] == 8.0 and rows[6] == 200.0


def test_script_else_if_chain(spark, posts):
    script = 'if likeCount > 50 { "hot" } else if likeCount > 5 { "warm" } else { "cold" }'
    col = translate_script(script, now_epoch_expr="0")
    rows = {r["key"]: r["v"] for r in posts.select("key", col.alias("v")).collect()}
    assert rows[6] == "hot" and rows[1] == "warm" and rows[2] == "cold"


def test_script_imperative_requires_opt_in():
    with pytest.raises(ScriptTranslationError, match="allow_udf"):
        translate_script("let x = 1; x = x + likeCount; x")


def test_script_udf_tier_interpreter(spark, posts):
    # reassignment + while + return run in the sandboxed interpreter
    script = """
        let x = likeCount;
        let steps = 0;
        while x > 1 { x = x / 2; steps = steps + 1; }
        steps
    """
    posts = posts.withColumn("score", F.lit(0.0))
    col = translate_script(script, now_epoch_expr="0", allow_udf=True)
    rows = {r["key"]: r["v"] for r in posts.select("key", col.alias("v")).collect()}
    import math

    def steps(n):
        # Rhai i64 division truncates (main.rs:2602-2621 scope is i64)
        s, x = 0, n
        while x > 1:
            x //= 2
            s += 1
        return float(s)

    assert rows[1] == steps(10) and rows[3] == steps(50) and rows[6] == steps(100) and rows[7] == 0.0

    pred = translate_script(
        'if likeCount >= 10 { return true; } false', now_epoch_expr="0", allow_udf=True, boolean=True
    )
    got = sorted(r["key"] for r in posts.filter(pred).collect())
    assert got == [1, 3, 6]


def test_script_rhai_integer_semantics(spark, posts):
    from query_engine_spark.functions.scripting import _eval, _parse, ScriptRuntimeError

    # SQL tier: int ÷ int truncates like Rust (5/2 == 2, -7/2 == -3)
    col = translate_script("likeCount / 3", now_epoch_expr="0")
    rows = {r["key"]: r["v"] for r in posts.select("key", col.alias("v")).collect()}
    assert rows[1] == 10 // 3 and rows[3] == 50 // 3  # truncated, still int
    # float operand keeps f64 division
    col = translate_script("likeCount / 4.0", now_epoch_expr="0")
    rows = {r["key"]: r["v"] for r in posts.select("key", col.alias("v")).collect()}
    assert rows[1] == 2.5
    # interpreter tier agrees, including Rust sign rules
    assert _eval(_parse("7 / 2")[2], {}) == 3
    assert _eval(_parse("0 - 7 / 2")[2], {}) == -3  # trunc toward zero, not floor
    assert _eval(_parse("(0 - 7) % 2")[2], {}) == -1  # remainder keeps dividend sign
    assert _eval(_parse("7.0 / 2")[2], {}) == 3.5
    # int division by zero hard-errors (reference unwrap, main.rs:1965)
    import pytest as _pytest

    with _pytest.raises(ScriptRuntimeError):
        _eval(_parse("1 / 0")[2], {})


def test_script_udf_tier_fails_loud_on_non_bool(spark, posts):
    # boolean-context script returning a number must error, not null-drop
    posts = posts.withColumn("score", F.lit(0.0))
    pred = translate_script(
        "let x = likeCount; x = x + 1; x", now_epoch_expr="0", allow_udf=True, boolean=True
    )
    with pytest.raises(Exception, match="expected bool"):
        posts.filter(pred).count()


def test_script_udf_tier_matches_sql_tier(spark, posts):
    # the two tiers agree on the shared grammar
    script = "let e = likeCount * 2 + replyCount; if e > 10 { e } else { 0 }"
    posts = posts.withColumn("score", F.lit(0.0))
    sql_col = translate_script(script, now_epoch_expr="0").cast("double")
    ast = __import__("query_engine_spark.functions.scripting", fromlist=["_parse"])
    udf_col = ast._udf_column(ast._parse(script), "0", boolean=False)
    mism = posts.select(sql_col.alias("a"), udf_col.alias("b")).filter(F.col("a") != F.col("b")).count()
    assert mism == 0
