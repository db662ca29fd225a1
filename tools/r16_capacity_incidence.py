"""Round-16 incidence probe for the three surviving pinned HTML capacity
shapes (r15 verdict ask #2): measure how often each shape occurs — and
how often it actually DIVERGES from the html.parser references — on a
real-crawl-shaped corpus, then decide fix-or-accept with data.

The three shapes under measurement (pins in tests/test_bombs.py and
test_html_differential.py::test_html_known_divergences_pinned):

  S1  a literal '<!--' / '<script' / '<style' inside a QUOTED attribute
      value (legal attribute text for a browser) opens a strip block in
      strip_nontext_blocks and swallows page content — the riskiest
      carrier is inline-JS attributes (onclick handlers whose strings
      legitimately contain '<script ...>' markup for document.write /
      innerHTML injection).
  S2  MULTI-INSTANCE metadata resolves by pattern priority
      (disc-before-value scanned over the whole page), not document
      order — a browser/crawler takes the FIRST instance with a
      non-empty value.
  S3  og:title's property discriminator accepts QUOTED values only;
      'property=og:title' unquoted is legal HTML5 (':' is in the
      unquoted-value class).

Corpus model (priors stated inline; everything below is from public
knowledge of web-authoring practice, not from any crawl we can run
offline — the honest output is CONDITIONAL divergence rates per shape
plus a modeled per-page rate under the stated priors):

  * inline event-handler attributes (onclick etc.) appear on a
    substantial minority of real pages (legacy CMS output, tracking
    snippets); we attach one to ~20%% of generated pages so the
    carrier-attribute machinery is well exercised.
  * of handler VALUES, the overwhelming majority are tracking/nav
    one-liners with no markup; document.write / innerHTML strings that
    embed a literal block opener are the rare tail. We draw 10%% of
    handler values from the risky pool — far ABOVE any realistic rate,
    deliberately, so the conditional rate is measured on a usable
    sample; the modeled per-page incidence then multiplies the
    conditional rate by a realistic carrier fraction instead.
  * multi-instance og:title/description blocks: duplicated metadata is
    common on template-assembled pages (plugin + theme both emitting
    OpenGraph). We emit a second instance on 25%% of pages carrying the
    field.
  * unquoted discriminator values: rare but legal; 10%% of og:title
    instances here.

Usage:
    PYTHONPATH=/root/repo python tools/r16_capacity_incidence.py [n_pages]

Prints a JSON summary; COVERAGE.md's round-16 delta records it.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Realistic inline-handler values: tracking, nav, UI toggles — the bulk
# of real-world onclick content. None contain a block-opener literal.
SAFE_JS = [
    "ga('send','event','nav','click');",
    "return confirm('Are you sure?');",
    "window.open(this.href); return false;",
    "dataLayer.push({event:'cta'});",
    "document.getElementById('menu').classList.toggle('open');",
    "this.form.submit();",
    "location.href='/signup';",
    "void(0)",
    "if (a<b && c>d) { track('x'); }",   # raw angles, no opener
    "$('#m').slideToggle(200);",
    "fbq('track','Lead');",
    "history.back(); return false;",
]

# The rare tail: handler/JS-string values that legitimately CONTAIN a
# block-opener literal as text (document.write injection, innerHTML
# templates, conditional-comment strings). A browser treats all of
# these as plain attribute text. Single-quote-only by construction so
# the attribute wraps in double quotes without entity escaping (the
# generator contract keeps attr values entity-free).
RISKY_JS = [
    "document.write('<script src=/ads.js><\\/script>');",
    "el.innerHTML = '<style>.x{display:none}<\\/style>';",
    "var tpl = '<!--[if IE]><p>old</p><![endif]-->';",
    "inject('<script>init()<\\/script>');",
    "note.title = 'see <!-- docs --> section';",
]

HANDLER_ATTRS = ["onclick", "onmouseover", "onsubmit", "onload"]


class ShapeStats(dict):
    def hit(self, k):
        self[k] = self.get(k, 0) + 1


def build_corpus(n_pages: int, seed: int = 0):
    """Returns (pages, marks): pages = [(i, url, html)], marks[i] = set of
    shape tags the page carries ('s1', 's1_risky', 's2_og', 's2_desc',
    's3')."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import test_html_differential as H

    pages, marks = [], {}

    class _RealGen(H._PageGen):
        """_PageGen plus the real-crawl-shaped carriers under test."""

        def __init__(self, rng, mark):
            super().__init__(rng)
            self.mark = mark

        def extra_attrs(self, n=2):
            attrs = super().extra_attrs(n)
            r = self.rng
            # the r16 base grammar adds its own handler sometimes —
            # don't stack a second one on the same tag (the multi-
            # handler shape is measured SEPARATELY below as s1_multi:
            # it is the documented residual capacity, not the
            # single-handler shape the fix targets)
            handlers = [a for a in attrs if a.split("=")[0].strip()
                        in ("onclick", "onmouseover", "onsubmit", "onload")]
            if not handlers and r.random() < 0.20:
                risky = r.random() < 0.10
                # pool values are double-quote-free by construction
                v = r.choice(RISKY_JS if risky else SAFE_JS)
                attrs.append(r.choice(HANDLER_ATTRS) + self.eq()
                             + '"' + v + '"')
                handlers = [attrs[-1]]
            if handlers:
                risky = any(("<script" in h) or ("<style" in h)
                            or ("<!--" in h) for h in handlers)
                if r.random() < 0.02:
                    attrs.append("onload" + self.eq() + '"'
                                 + r.choice(RISKY_JS) + '"')
                    self.mark.add("s1_multi")
                else:
                    self.mark.add("s1_risky" if risky else "s1_safe")
            return attrs

        def head(self):
            out = super().head()
            r = self.rng
            # S2/S3 carriers: extra OpenGraph/description instances
            # (plugin + theme both emitting), attr order varying,
            # sometimes an unquoted discriminator; spliced at a random
            # end of the head so document order vs pattern priority is
            # genuinely exercised (the base generator may have emitted
            # its own single instance already — marking counts the
            # FINAL head's instances, not just the injected ones)
            extra = []
            if r.random() < 0.5:
                unq = r.random() < 0.10
                disc = "property=og:title" if unq \
                    else 'property="og:title"'
                inst = f'<meta {disc} content="OG-A {r.randint(0, 999)}">'
                if r.random() < 0.5:
                    inst = (f'<meta content="OG-A {r.randint(0, 999)}"'
                            f" {disc}>")
                extra.append(inst)
                if unq:
                    self.mark.add("s3")
                if r.random() < 0.25:
                    extra.append(
                        '<meta property="og:title" content="OG-B dup">')
            if r.random() < 0.3:
                extra.append('<meta name="description" content="alt d">')
            lo = out.lower()
            start = lo.index("<head")
            start = out.index(">", start) + 1
            body_part = out[start:-7]
            if r.random() < 0.5:
                body_part = " ".join(extra) + " " + body_part
            else:
                body_part = body_part + " " + " ".join(extra)
            joined = out[:start] + body_part + "</head>"
            if joined.lower().count("og:title") >= 2:
                self.mark.add("s2_og")
            if joined.lower().count("description") >= 2:
                self.mark.add("s2_desc")
            return joined

    for i in range(n_pages):
        mark = set()
        g = _RealGen(random.Random(77000 + i), mark)
        pages.append((i, f"https://r{i % 23}.example/d{i % 7}/p{i}.html",
                      g.page()))
        marks[i] = mark
    return pages, marks


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import test_html_differential as H

    from query_engine_spark.session import get_spark

    spark = get_spark("r16_capacity_incidence")
    spark.sparkContext.setLogLevel("ERROR")

    pages, marks = build_corpus(n_pages)
    div = H._run_differential(spark, pages)
    bad_pages = {}
    for kind, items in div.items():
        for item in items:
            bad_pages.setdefault(item[0], set()).add(kind)

    carriers = ShapeStats()
    diverged = ShapeStats()
    for i, mark in marks.items():
        for m in mark:
            carriers.hit(m)
            if i in bad_pages:
                diverged.hit(m)
    # divergent pages carrying NO marked shape = generator/extractor
    # disagreement outside the three shapes (must be zero, or the
    # corpus model itself found a new bug)
    unmarked_div = [i for i in bad_pages if not marks[i]]

    out = {
        "n_pages": n_pages,
        "carriers": dict(sorted(carriers.items())),
        "diverged": dict(sorted(diverged.items())),
        "conditional_rates": {
            k: round(diverged.get(k, 0) / carriers[k], 4)
            for k in sorted(carriers)
        },
        "unmarked_divergent_pages": unmarked_div[:10],
        "n_unmarked_divergent": len(unmarked_div),
        "examples": {
            k: v[:2] for k, v in div.items() if v
        } and {k: [i for i, *_ in v[:5]] for k, v in div.items() if v},
    }
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
