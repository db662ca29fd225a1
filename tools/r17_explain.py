"""Capture .explain("formatted") for headline queries into plans/r17/.

Usage: python tools/r17_explain.py <suffix> [query ...]
  suffix: "before" or "after" (file becomes plans/r17/<query>_<suffix>.txt)
  with no query list, captures every bench.py HEADLINE query.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale,
so plan shapes match what the bench times; AQE initial plans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.session import get_spark
from query_engine_spark import registry


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r17-explain")
    from query_engine_spark.llmdata import clear_llmdata_cache

    for name in names:
        spec = registry.REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        clear_llmdata_cache()
        print(f"captured {name}_{suffix}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
