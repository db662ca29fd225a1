"""Same-session interleaved cadence table: pagerank checkpoint_every on the
graph_pagerank edge set at higher iteration counts. The declared queries run
iters=3 (cadence off, plans unchanged); this measures where cutting the
unrolled lineage starts to pay so the docstring guidance carries a number.

First run's findings:
- at iters=12 the UNCUT lineage OOMs the 8g driver heap during
  planning/collect (java.lang.OutOfMemoryError on collectToPython) — so the
  uncut-12 attempt runs LAST, guarded, after every other cell of the table
  is recorded;
- `localCheckpoint` is EAGER: the checkpoint jobs (all pre-checkpoint
  iterations) run during DataFrame *construction*, so the timed region must
  include construction, not just the noop write — `noop()` takes a thunk."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def noop(mk) -> float:
    """Time construction + noop write: localCheckpoint is eager, so the
    checkpoint-side jobs run at construction time."""
    t0 = time.time()
    mk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "2"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.operators import behavior as B

    spark = get_spark("r16_ab_pagerank")
    ev = load_table(spark, sf_dir, "events")
    edges = ev.select(
        F.col("user_id").alias("src"), (F.col("event_id") % 25).alias("dst")
    )

    def run(iters, ck):
        return B.pagerank(edges, iters=iters, checkpoint_every=ck)

    # parity at iters=8 (uncut still plannable there)
    want = sorted(map(tuple, run(8, None).collect()))
    for ck in (2, 4):
        got = sorted(map(tuple, run(8, ck).collect()))
        print(f"iters=8 cadence={ck}: identical={got == want} ({len(want)} nodes)", flush=True)

    noop(lambda: run(3, None))  # warm
    for iters in (3, 8):
        times = {}
        for _ in range(n):
            for ck in (None, 2, 4):
                spark.sparkContext.setJobDescription(f"pagerank iters={iters} ck={ck}")
                times.setdefault(ck, []).append(noop(lambda: run(iters, ck)))
        row = "  ".join(
            f"ck={ck}: {min(ts):.3f}s {sorted(round(t, 3) for t in ts)}"
            for ck, ts in times.items()
        )
        print(f"iters={iters}  {row}", flush=True)

    for ck in (2, 4):
        ts = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"pagerank iters=12 ck={ck}")
            ts.append(noop(lambda: run(12, ck)))
        print(f"iters=12  ck={ck}: {min(ts):.3f}s {sorted(round(t, 3) for t in ts)}", flush=True)

    # the driver-fatal cell, last and guarded
    try:
        spark.sparkContext.setJobDescription("pagerank iters=12 ck=None (guarded)")
        t = noop(lambda: run(12, None))
        print(f"iters=12  ck=None: {t:.3f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"iters=12  ck=None: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
