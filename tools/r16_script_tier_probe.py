"""Script-tier throughput probe (r16, verdict r15 ask #5): the SAME
predicate evaluated on the SQL tier (Catalyst expression, whole-stage
codegen) vs the sandboxed pandas-UDF interpreter tier, over the posts
view at a given scale — the measured number behind the "10-100× slow
path" label now that _NeedsUdf routing can land whole queries on the
interpreter silently (tier visibility shipped alongside in
api.generate_feed_skeleton's debug payload).

The two scripts are semantically identical filters; the second uses a
statement-position `if` so the translator MUST route it to the UDF
tier (same rows out — asserted).

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=32 \
        python tools/r16_script_tier_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from query_engine_spark.functions.scripting import (
        translate_script_with_tier,
    )
    from query_engine_spark.sources.testdata import posts_view
    from query_engine_spark.session import get_spark

    spark = get_spark("r16_script_tier_probe")
    spark.sparkContext.setLogLevel("ERROR")

    posts = (
        posts_view(spark, sf_dir)
        .withColumn("score", F.lit(0.0))
        .withColumn("quote_count", F.lit(0))
    )
    posts.persist().count()

    sql_script = "likeCount > 100 && replyCount < 5 && imageCount != 2"
    udf_script = """
        let ok = false;
        if likeCount > 100 { if replyCount < 5 { if imageCount != 2 {
            ok = true; } } }
        ok
    """
    p_sql, tier_sql, _ = translate_script_with_tier(
        sql_script, now_epoch_expr="0", boolean=True)
    p_udf, tier_udf, why = translate_script_with_tier(
        udf_script, now_epoch_expr="0", allow_udf=True, boolean=True)
    assert tier_sql == "sql" and tier_udf == "udf", (tier_sql, tier_udf, why)

    n_sql = posts.filter(p_sql).count()
    n_udf = posts.filter(p_udf).count()
    assert n_sql == n_udf, (n_sql, n_udf)

    def timed(pred):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            posts.filter(pred).select("id").write.format(
                "noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    t_sql = timed(p_sql)
    t_udf = timed(p_udf)
    print(json.dumps({
        "sf_dir": sf_dir,
        "rows_in": posts.count(),
        "rows_out": n_sql,
        "sql_tier_s": t_sql,
        "udf_tier_s": t_udf,
        "udf_over_sql": round(t_udf / t_sql, 1) if t_sql else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
