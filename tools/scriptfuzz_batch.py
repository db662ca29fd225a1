"""In-session script-tier differential batches (r15 verdict ask #5:
bring the imperative layer's cumulative volume to parity with the
expression layer — ~13.2k expr vs ~4.5k imperative entering r15).

Reuses tests/test_scripting_differential.py's machinery verbatim:
- imperative mode: _ImpGen scripts through the REAL pandas-UDF tier
  (S._udf_column over a Spark DataFrame) vs the test-local reference
  interpreter, exact float equality per row.
- expression mode: _Gen scripts through the SQL tier vs the UDF tier
  (_compare_chunk), exact equality per row.

Usage:
    PYTHONPATH=/root/repo python tools/scriptfuzz_batch.py imperative 3000 [seed0]
    PYTHONPATH=/root/repo python tools/scriptfuzz_batch.py expression 2000 [seed0]

Seeds default past every previously-used range (tests use 0..1200 and
20000..20500; r13/r14 in-session batches used 30000+/50000+) — pass an
explicit seed0 to extend. Prints a one-line summary; exits nonzero on
any divergence.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from query_engine_spark.functions import scripting as S  # noqa: E402

import test_scripting_differential as T  # noqa: E402


def run_imperative(spark, n: int, seed0: int) -> int:
    df = T._posts_df(spark)
    names = list(S.RHAI_SCOPE_COLUMNS)
    rows = df.select(
        *[F.expr(S.RHAI_SCOPE_COLUMNS[c].replace("__now_epoch__", T.NOW)).alias(c)
          for c in names]
    ).toPandas()
    bad = 0
    t0 = time.time()
    for i0 in range(0, n, 50):
        chunk = []
        for seed in range(seed0 + i0, seed0 + min(i0 + 50, n)):
            g = T._ImpGen(random.Random(seed))
            chunk.append(g.imperative_script())
        cols, asts = [], []
        for k, script in enumerate(chunk):
            ast = S._parse(script)
            asts.append(ast)
            cols.append(S._udf_column(ast, T.NOW, boolean=False).alias(f"u_{k}"))
        got = df.select(*cols).toPandas()
        for k, (script, ast) in enumerate(zip(chunk, asts)):
            for r in range(len(rows)):
                scope = {c: rows.iloc[r][c] for c in names}
                scope = {c: (v.item() if hasattr(v, "item") else v)
                         for c, v in scope.items()}
                try:
                    want = T._ref_eval_block(ast, [scope])
                except T._RefReturn as ret:
                    want = ret.v
                have = got.iloc[r][f"u_{k}"]
                if float(want) != have:
                    bad += 1
                    print(f"DIVERGENCE {script!r} row {r}: ref={want} udf={have}")
        done = i0 + len(chunk)
        if done % 500 == 0:
            print(f"  {done}/{n} ({time.time()-t0:.0f}s)", file=sys.stderr)
    return bad


def run_expression(spark, n: int, seed0: int) -> int:
    df = T._posts_df(spark)
    bad = 0
    t0 = time.time()
    for i0 in range(0, n, 50):
        chunk = []
        for seed in range(seed0 + i0, seed0 + min(i0 + 50, n)):
            g = T._Gen(random.Random(seed))
            chunk.append(g.script())
        try:
            T._compare_chunk(spark, df, chunk)
        except AssertionError as e:
            bad += 1
            print(f"DIVERGENCE in chunk at {seed0 + i0}: {e}")
        done = i0 + len(chunk)
        if done % 500 == 0:
            print(f"  {done}/{n} ({time.time()-t0:.0f}s)", file=sys.stderr)
    return bad


def main() -> int:
    mode = sys.argv[1]
    n = int(sys.argv[2])
    seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else (
        70000 if mode == "imperative" else 80000)
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    bad = (run_imperative if mode == "imperative" else run_expression)(
        spark, n, seed0)
    spark.stop()
    print(f"{mode}: {n} scripts from seed {seed0}, {bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
