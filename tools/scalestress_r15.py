"""r15 scale-stress probes for the HTML fix bundle (SCALESTRESS_r15).

The round's hot-path change is protect_quoted_angles v3b: the anchors
gained a lazy tag-open prefix and the pass count doubled (2 -> 4, for
the four-per-tag capacity), plus a CDATA strip joined
strip_nontext_blocks. Both are per-page column expressions — this tool
measures the constant-factor price the same way SCALESTRESS_r14 did:

1. throughput: 20k ~2 KB conforming pages (grammar BOTH versions
   handle: plain '=', quoted values — the r14 contract), warm,
   local[8], noop-write action, STEADY-STATE MIN over 5 alternating
   old/new rounds (single passes drift as the JIT warms; the
   interleaved min-fold is the honest comparison). OLD = the pre-r15
   warc.py (git show <pre-bundle>:...), NEW = live.
2. flood linearity: 256 KB adversarial floods through all four NEW
   chains, including the bundle's new anchor shapes (unquoted-value
   flood, spaced-eq flood, text-level '="' flood, CDATA openers).

Usage:
    PYTHONPATH=/root/repo python tools/scalestress_r15.py [old_rev]
"""

from __future__ import annotations

import importlib.util
import os
import random
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_PAGES = 20_000
ROUNDS = 5


def load_old(rev: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:query_engine_spark/llmdata/warc.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    with tempfile.NamedTemporaryFile("w", suffix="_warc_old.py", delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("warc_old", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["warc_old"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    old_rev = sys.argv[1] if len(sys.argv) > 1 else "26acfc2~1"
    from pyspark.sql import SparkSession, functions as F

    from query_engine_spark.llmdata import warc as NEW

    OLD = load_old(old_rev)

    import test_html_differential as H

    class _PlainGen(H._PageGen):
        # the r14 grammar both versions handle: plain '=', quoted values
        def eq(self):
            return "="

        def q_or_unq(self, v, force=None):
            return self.q(v, force)

    class _NoAngleGen(_PlainGen):
        # realistic corpus: raw angles inside quoted attribute values
        # are RARE in real crawls — this measures the gated common case
        # (comments/scripts/styles still present)
        def attr_value(self, angles=True):
            return super().attr_value(angles=False)

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {}
    for label, gen_cls in (("angle-dense", _PlainGen),
                           ("angle-free (realistic)", _NoAngleGen)):
        pages = []
        for seed in range(N_PAGES):
            g = gen_cls(random.Random(900000 + seed))
            pages.append((seed,
                          f"https://h{seed % 31}.example/d{seed % 7}/p{seed}.html",
                          g.page()))
        d = spark.createDataFrame(
            pages, "i int, url string, html string").persist()
        d.count()
        corpora[label] = d

    def chains(W):
        m = W.html_metadata(F.col("html"))
        return {
            "html_metadata": lambda d: d.select(
                m["title"], m["canonical"], m["description"],
                m["og_title"], m["lang"]),
            "outlink_edges": lambda d: W.outlink_edges(
                d, html_col="html", url_col="url"),
            "image_refs": lambda d: W.image_refs(
                d, html_col="html", url_col="url"),
            "html_to_text": lambda d: d.select(
                W.html_to_text(F.col("html")).alias("t")),
        }

    for label, df in corpora.items():
        best = {("old", k): float("inf") for k in chains(OLD)}
        best.update({("new", k): float("inf") for k in chains(NEW)})
        for rnd in range(ROUNDS):
            for tag, W in (("old", OLD), ("new", NEW)):
                for name, fn in chains(W).items():
                    t0 = time.time()
                    fn(df).write.format("noop").mode("overwrite").save()
                    wall = time.time() - t0
                    best[(tag, name)] = min(best[(tag, name)], wall)
            print(f"{label}: round {rnd + 1}/{ROUNDS} done", file=sys.stderr)

        print(f"\n## throughput, {label} corpus (pages/s, min-fold over "
              f"{ROUNDS} alternating rounds, {N_PAGES} pages)\n")
        print("| extractor chain | old | new | delta |")
        print("|---|---|---|---|")
        for name in chains(NEW):
            po = N_PAGES / best[("old", name)]
            pn = N_PAGES / best[("new", name)]
            print(f"| {name} | {po:,.0f} pages/s | {pn:,.0f} pages/s "
                  f"| {pn / po - 1:+.0%} |")

    floods = {
        "unclosed_comment_openers": "<!-- x " * 31300,
        "unclosed_script_openers": "<script " * 32768,
        "eq_quote_anchor": '="a' * 87381,
        "angle_flood": "<>" * 131072,
        "opener_unclosed_tail": '<a "' * 32768 + "a" * 131072,
        "mixed_order_angles": '<div data-x="c>d c>d a<b">' * 10082,
        "unquoted_value_flood": "<a href=/x>" * 23831,
        "spaced_eq_flood": '<p class = "x">' * 17476,
        "text_level_eq_quote": 'w x=" ' * 43690,
        "cdata_openers": "<![CDATA[ x " * 21845,
        "four_angle_tags": '<div data-x="a<b<c<d<e c>d c>d c>d c>d">' * 6553,
    }
    print("\n## flood linearity through all four NEW chains (256 KB)\n")
    print("| flood shape | size | all four chains |")
    print("|---|---|---|")
    ch = chains(NEW)
    for name, s in floods.items():
        fdf = spark.createDataFrame(
            [(0, "https://f.example/p", s)], "i int, url string, html string")
        t0 = time.time()
        for fn in ch.values():
            fn(fdf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        print(f"| {name} | {len(s) // 1024} KB | {wall:.2f} s |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
