"""Tests for the null-tolerant ingest defaulting (process_post parity,
main.rs:3447-3682)."""

from __future__ import annotations

from pyspark.sql import Row

from query_engine_spark.datamodel import POST_SCHEMA, normalize_posts


def test_defaults_for_missing_fields(spark):
    # a minimal upstream record: only id/key/created_at present
    raw = spark.createDataFrame(
        [Row(id="p1", key=1, created_at="2024-03-01T10:00:00.000Z")]
    )
    out = normalize_posts(raw).collect()[0]
    assert out["text"] == "" and out["parent"] == "" and out["record"] == ""
    assert out["tags"] == [] and out["langs"] == [] and out["labels"] == []
    assert out["like_count"] == 0 and out["image_count"] == 0
    assert out["video"] is None and out["via"] is None
    # ts derived from created_at (parsed once at ingest)
    assert out["ts"].year == 2024 and out["ts"].hour == 10


def test_nulls_coerced_not_propagated(spark):
    raw = spark.createDataFrame(
        [("p2", 2, "2024-03-01T10:00:00.000Z", None, None, None, None)],
        "id string, key long, created_at string, text string, "
        "tags array<string>, like_count int, parent string",
    )
    out = normalize_posts(raw).collect()[0]
    assert out["text"] == "" and out["tags"] == [] and out["like_count"] == 0
    assert out["parent"] == ""


def test_schema_conformance(spark):
    raw = spark.createDataFrame([Row(id="p3", key=3, created_at="2024-03-01T10:00:00Z")])
    out = normalize_posts(raw)
    assert [f.name for f in out.schema.fields] == [f.name for f in POST_SCHEMA.fields]
