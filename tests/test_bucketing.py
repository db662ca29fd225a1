"""Bucketing: pre-partitioned storage makes the replace-family self-joins
co-located — no Exchange on either side (SURVEY §4; the 100 TB layout for
the posts table)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf → tables land in ./spark-warehouse
    # (gitignored); dropped on teardown
    df = spark.range(10_000).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit("p"), ((F.col("id") + 1) % 10_000).cast("string")).alias("parent"),
        (F.col("id") % 97).alias("author_key"),
    ).withColumn("id", F.concat(F.lit("p"), F.col("id")))
    spark.sql("DROP TABLE IF EXISTS posts_bucketed")
    df.write.bucketBy(8, "id").sortBy("id").saveAsTable("posts_bucketed")
    yield spark.table("posts_bucketed")
    spark.sql("DROP TABLE IF EXISTS posts_bucketed")


def test_bucketed_self_join_no_shuffle(spark, bucketed):
    # replace-with-parent shape: posts ⋈ posts on parent = id
    left = bucketed.alias("l")
    right = bucketed.alias("r")
    # force sort-merge (broadcast would hide the bucketing benefit)
    joined = left.hint("merge").join(right, F.col("l.parent") == F.col("r.id"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the probe side joins on `parent` (not the bucket key) → it may shuffle,
    # but the build side (bucketed on id) must NOT
    assert "SortMergeJoin" in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan[:2000]
    assert joined.count() == 10_000


def test_bucketed_agg_no_shuffle(spark, bucketed):
    # aggregation keyed on the bucket column reads pre-partitioned data
    agg = bucketed.groupBy("id").agg(F.count("*"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() == 10_000
