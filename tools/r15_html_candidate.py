"""r15 HTML fix-bundle candidate: builder + validator (authored round 14).

The r14 HTML differential pinned four known divergences vs html.parser
(tests/test_html_differential.py::test_html_known_divergences_pinned)
whose fixes all ride the SAME seven HTML-family registry queries and
therefore wait for the r15 window (the r14 window spent every slot on
the 41-name r7-era drain + 9 touched riders). This tool makes that r15
touch mechanical and pre-validated:

``build_candidate(src)`` applies the full fix bundle to warc.py source
text as exact-string replaces (an assert fires if the live source has
drifted):

  (a) protect_quoted_angles v3b — the angle-protection anchors gain a
      lazy tag-open prefix ``<\\w[^<>]*?=\\s*`` so a BODY-TEXT '="'
      (always preceded by a closed tag's '>') can never sentinel real
      markup, while in-tag anchors keep working across earlier
      attributes (the prefix crosses quotes). A single-char-class lazy
      star is ITERATIVE in java.util.regex — not the
      alternation-under-star shape that StackOverflowed in r12. The
      naive tag-context prefix ADVICE-r13 sketched was probed and
      FAILS multi-attribute tags (it cannot cross an earlier quoted
      value); an attr-hop marking design was also probed and fails on
      raw angles in earlier values (hop scans need protection that
      has not run yet). v3b has neither problem. New capacity line:
      4 of each angle kind per TAG (vs 2 per value today).
  (b) every html_metadata pull accepts ``\\s*=\\s*`` around the
      attribute equals (valid HTML5; the outlink/image pulls already
      did) — including the rel/name/property discriminators and lang.
  (c) unquoted attribute values (HTML5 class, spelled
      ``[^\\s\\x22\\x27<>=\\x60]+``) as a third pattern in every
      attribute pull (href, src, alt, content, canonical href, lang).

``main`` builds the candidate from the LIVE warc.py, then runs the
html.parser differential (tests/test_html_differential machinery) over
generated pages in an EXTENDED grammar: spaced '=', unquoted values,
and text-level '="' shapes — exactly the classes the pinned r14
generator excludes.

Round-14 validation record (in-session, these code paths): 2,000
extended-grammar + 1,500 original-grammar pages, ZERO divergences
across html_metadata / outlink_edges / image_refs / html_to_text;
floods linear (openers, eq-whitespace, 256 KB quoted tail,
eq-quote-text: 0.25–0.52 s per 256 KB each).

r15 checklist: apply build_candidate's transforms to
query_engine_spark/llmdata/warc.py, flip the four pinned divergence
assertions in test_html_differential.py to the fixed behavior, fold
the extended grammar into _PageGen, re-run this tool plus the full
differential, and take the seven HTML riders as touched slots.

Usage:
    PYTHONPATH=/root/repo python tools/r15_html_candidate.py [n_pages]
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HTML5 unquoted-value chars; quotes/backtick via hex escapes so the
# class embeds in any quoting context
UNQ_CLASS = r"[^\s\x22\x27<>=\x60]+"


def build_candidate(src: str) -> str:
    """Apply the r15 fix bundle to warc.py source text."""
    # ------------------------------------------------------------ (a)
    old_protect = (
        '    c = F.regexp_replace(col, f"[{_LT_SENT}{_GT_SENT}]", " ")\n'
        "    for _ in range(_PROTECT_PASSES):\n"
        "        c = F.regexp_replace(c, '(=\"[^\"<]*)<', \"$1\" + _LT_SENT)\n"
        "        c = F.regexp_replace(c, '(=\"[^\">]*)>', \"$1\" + _GT_SENT)\n"
        "        c = F.regexp_replace(c, \"(='[^'<]*)<\", \"$1\" + _LT_SENT)\n"
        "        c = F.regexp_replace(c, \"(='[^'>]*)>\", \"$1\" + _GT_SENT)\n"
        "    return c"
    )
    new_protect = (
        '    c = F.regexp_replace(col, f"[{_LT_SENT}{_GT_SENT}]", " ")\n'
        "    # r15 v3b: the lazy tag-open prefix <\\w[^<>]*? cannot cross a\n"
        "    # '>', so a BODY-TEXT '=\"' (always after a closed tag) can\n"
        "    # never protect real markup; in-tag anchors keep working\n"
        "    # across earlier attributes (the prefix crosses quotes).\n"
        "    # Single-char-class lazy star: iterative in java.util.regex,\n"
        "    # no alternation-under-star stack risk. One angle of each\n"
        "    # kind per TAG per pass -> capacity 4 of each kind per tag.\n"
        "    for _ in range(4):\n"
        "        c = F.regexp_replace(c, '(<\\\\w[^<>]*?=\\\\s*\"[^\"<]*)<', \"$1\" + _LT_SENT)\n"
        "        c = F.regexp_replace(c, '(<\\\\w[^<>]*?=\\\\s*\"[^\">]*)>', \"$1\" + _GT_SENT)\n"
        "        c = F.regexp_replace(c, \"(<\\\\w[^<>]*?=\\\\s*'[^'<]*)<\", \"$1\" + _LT_SENT)\n"
        "        c = F.regexp_replace(c, \"(<\\\\w[^<>]*?=\\\\s*'[^'>]*)>\", \"$1\" + _GT_SENT)\n"
        "    return c"
    )
    assert old_protect in src, "protect block drifted — update this tool"
    src = src.replace(old_protect, new_protect)

    # ------------------------------------------------------------ (b+c)
    old_pats = (
        "        for pat in (\n"
        "            rf'(?is)<{tag}\\b[^<>]*{disc}[^<>]*{value_attr}=\"([^\"]*)\"',\n"
        "            rf\"(?is)<{tag}\\b[^<>]*{disc}[^<>]*{value_attr}='([^']*)'\",\n"
        "            rf'(?is)<{tag}\\b[^<>]*{value_attr}=\"([^\"]*)\"[^<>]*{disc}',\n"
        "            rf\"(?is)<{tag}\\b[^<>]*{value_attr}='([^']*)'[^<>]*{disc}\",\n"
        "        ):"
    )
    new_pats = (
        "        for pat in (\n"
        "            rf'(?is)<{tag}\\b[^<>]*{disc}[^<>]*{value_attr}\\s*=\\s*\"([^\"]*)\"',\n"
        "            rf\"(?is)<{tag}\\b[^<>]*{disc}[^<>]*{value_attr}\\s*=\\s*'([^']*)'\",\n"
        "            rf'(?is)<{tag}\\b[^<>]*{value_attr}\\s*=\\s*\"([^\"]*)\"[^<>]*{disc}',\n"
        "            rf\"(?is)<{tag}\\b[^<>]*{value_attr}\\s*=\\s*'([^']*)'[^<>]*{disc}\",\n"
        "            rf'(?is)<{tag}\\b[^<>]*{disc}[^<>]*{value_attr}\\s*=\\s*(" + UNQ_CLASS + ")',\n"
        "            rf'(?is)<{tag}\\b[^<>]*{value_attr}\\s*=\\s*(" + UNQ_CLASS + ")[^<>]*{disc}',\n"
        "        ):"
    )
    assert old_pats in src, "_attr_value pattern block drifted"
    src = src.replace(old_pats, new_pats)

    old_disc = (
        '    canonical = _attr_value("link", r"""rel=["\']canonical["\']""", "href")\n'
        '    description = _attr_value("meta", r"""name=["\']description["\']""", "content")\n'
        '    og_title = _attr_value("meta", r"""property=["\']og:title["\']""", "content")\n'
        '    lang_dq = F.regexp_extract(col, r\'(?is)<html\\b[^<>]*lang="([^"]+)"\', 1)\n'
        '    lang_sq = F.regexp_extract(col, r"""(?is)<html\\b[^<>]*lang=\'([^\']+)\'""", 1)\n'
        '    lang = restore_angles(F.when(lang_dq != "", lang_dq).otherwise(lang_sq))'
    )
    new_disc = (
        '    canonical = _attr_value("link", r"""rel\\s*=\\s*["\']?canonical["\']?""", "href")\n'
        '    description = _attr_value("meta", r"""name\\s*=\\s*["\']?description["\']?""", "content")\n'
        '    og_title = _attr_value("meta", r"""property\\s*=\\s*["\']og:title["\']""", "content")\n'
        '    lang_dq = F.regexp_extract(col, r\'(?is)<html\\b[^<>]*lang\\s*=\\s*"([^"]+)"\', 1)\n'
        '    lang_sq = F.regexp_extract(col, r"""(?is)<html\\b[^<>]*lang\\s*=\\s*\'([^\']+)\'""", 1)\n'
        "    lang_uq = F.regexp_extract(col, r'(?is)<html\\b[^<>]*lang\\s*=\\s*(" + UNQ_CLASS + ")', 1)\n"
        '    lang = restore_angles(F.when(lang_dq != "", lang_dq).otherwise(\n'
        '        F.when(lang_sq != "", lang_sq).otherwise(lang_uq)))'
    )
    assert old_disc in src, "html_metadata discriminator block drifted"
    src = src.replace(old_disc, new_disc)

    old_href = (
        '    href_sq = F.regexp_extract(\n'
        '        F.col("_tag"), r"""(?is)\\bhref\\s*=\\s*\'([^\']*)\'""", 1\n'
        "    )"
    )
    new_href = (
        old_href + "\n"
        "    href_uq = F.regexp_extract(\n"
        "        F.col(\"_tag\"), r'(?is)\\bhref\\s*=\\s*(" + UNQ_CLASS + ")', 1\n"
        "    )"
    )
    assert old_href in src, "href block drifted"
    src = src.replace(old_href, new_href)

    old_pick = (
        '        restore_angles(\n'
        '            F.when(href_dq != "", href_dq).otherwise(href_sq)\n'
        '        ).alias("_link"),'
    )
    new_pick = (
        '        restore_angles(\n'
        '            F.when(href_dq != "", href_dq).otherwise(\n'
        '                F.when(href_sq != "", href_sq).otherwise(href_uq))\n'
        '        ).alias("_link"),'
    )
    assert old_pick in src, "href pick drifted"
    src = src.replace(old_pick, new_pick)

    old_attr = (
        "    def _attr(name: str) -> Column:\n"
        "        dq = F.regexp_extract(\n"
        "            tag, rf'(?is)\\b{name}\\s*=\\s*\"([^\"]*)\"', 1\n"
        "        )\n"
        "        sq = F.regexp_extract(tag, rf\"(?is)\\b{name}\\s*=\\s*'([^']*)'\", 1)\n"
        "        return restore_angles(F.when(dq != \"\", dq).otherwise(sq))"
    )
    new_attr = (
        "    def _attr(name: str) -> Column:\n"
        "        dq = F.regexp_extract(\n"
        "            tag, rf'(?is)\\b{name}\\s*=\\s*\"([^\"]*)\"', 1\n"
        "        )\n"
        "        sq = F.regexp_extract(tag, rf\"(?is)\\b{name}\\s*=\\s*'([^']*)'\", 1)\n"
        "        uq = F.regexp_extract(tag, rf'(?is)\\b{name}\\s*=\\s*(" + UNQ_CLASS + ")', 1)\n"
        "        return restore_angles(F.when(dq != \"\", dq).otherwise(\n"
        "            F.when(sq != \"\", sq).otherwise(uq)))"
    )
    assert old_attr in src, "image _attr block drifted"
    src = src.replace(old_attr, new_attr)
    return src


def _ext_gen_class(H):
    """Extended-grammar generator over the repo's pinned _PageGen."""

    class _ExtGen(H._PageGen):
        """r14 grammar + spaced '=', unquoted values, text-level '="'."""

        def eq(self):
            return self.rng.choice(["=", " = ", "= ", " =", "="])

        def q_or_unq(self, v, force=None):
            r = self.rng
            if force is None and r.random() < 0.3 and v and not any(
                    c in v for c in " \t\n\"'<>=`"):
                return v
            return self.q(v, force)

        def extra_attrs(self, n=2):
            r = self.rng
            out = []
            for _ in range(r.randint(0, n)):
                name = r.choice(["class", "id", "data-x", "data-y", "style"])
                out.append(name + self.eq() + self.q_or_unq(self.attr_value()))
            return out

        def head(self):
            r = self.rng
            bits = []
            if r.random() < 0.85:
                bits.append(
                    self.tag("title", []) + self.words(1, 5)
                    + "</" + self.tagcase("title")
                    + r.choice(["", " "]) + ">")
            if r.random() < 0.8:
                bits.append(self.tag("meta", [
                    "name" + self.eq() + self.q_or_unq("description"),
                    "content" + self.eq() + self.q(self.attr_value()),
                ] + self.extra_attrs(1), selfclose=True))
            if r.random() < 0.6:
                bits.append(self.tag("meta", [
                    "property" + self.eq() + self.q("og:title"),
                    "content" + self.eq() + self.q(self.attr_value()),
                ], selfclose=True))
            if r.random() < 0.6:
                url = "http://c.example/" + r.choice(H.WORDS)
                bits.append(self.tag("link", [
                    "rel" + self.eq() + self.q_or_unq("canonical"),
                    "href" + self.eq() + self.q_or_unq(url),
                ], selfclose=True))
            r.shuffle(bits)
            if r.random() < 0.3:
                bits.insert(r.randint(0, len(bits)),
                            "<!-- head comment with <fake tag=1> inside -->")
            html_attrs = self.extra_attrs(1)
            if r.random() < 0.7:
                html_attrs.append("lang" + self.eq() + self.q_or_unq(
                    r.choice(["en", "fr-CA", "de", "pt-br"])))
            r.shuffle(html_attrs)
            return (self.tag("html", html_attrs) + self.tag("head", [])
                    + " ".join(bits) + "</head>")

        def body(self):
            r = self.rng
            bits = []
            for _ in range(r.randint(2, 8)):
                k = r.random()
                if k < 0.25:
                    blk = r.choice(["p", "div", "li", "h1", "h2",
                                    "blockquote"])
                    bits.append(self.tag(blk, self.extra_attrs())
                                + self.words(1, 6)
                                + f"</{self.tagcase(blk)}>")
                elif k < 0.4:
                    href = self.link()
                    bits.append(self.tag("a", ["href" + self.eq()
                                               + self.q_or_unq(href)]
                                         + self.extra_attrs())
                                + self.words(1, 3) + "</a>")
                elif k < 0.55:
                    src = self.link() or "/i.png"
                    attrs = ["src" + self.eq() + self.q_or_unq(src)]
                    if r.random() < 0.7:
                        attrs.append("alt" + self.eq()
                                     + self.q(self.attr_value()))
                    bits.append(self.tag("img", attrs + self.extra_attrs(1),
                                         selfclose=True))
                elif k < 0.65:
                    bits.append("<!-- " + self.words(1, 4, ents=False)
                                + r.choice(["", " <p>fake</p>",
                                            " <a href='x'>",
                                            " <img src=/fake.png>"])
                                + " -->")
                elif k < 0.75:
                    t = r.choice(["script", "style"])
                    body = r.choice([
                        "var x = 1;",
                        'if (a<b && c>d) { go("x"); }',
                        "document.write(\"<a href='http://fake.example/w'"
                        ">y</a>\");",
                    ])
                    bits.append(self.tag(t, self.extra_attrs(1))
                                + body + f"</{t}>")
                elif k < 0.85:
                    # the r14-pinned TEXT-LEVEL '="' shape — the fixed
                    # protect must no longer sentinel the real tag
                    bits.append(self.words(1, 3, ents=False)
                                + ' x=" ' + self.words(1, 2, ents=False)
                                + " <b>" + self.words(1, 2, ents=False)
                                + "</b>")
                else:
                    bits.append(self.words(2, 8))
                if r.random() < 0.3:
                    bits.append(r.choice(["<br>", "<br/>", "<BR >"]))
            return "<body>" + " ".join(bits) + "</body></html>"

    return _ExtGen


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    live = open(
        os.path.join(repo, "query_engine_spark/llmdata/warc.py")).read()
    path = None
    if "r15 v3b" in live:
        # Bundle landed (round 15): validate the LIVE module — this tool
        # stays as an out-of-band extended-grammar sweep; the standing
        # in-repo coverage is tests/test_html_differential.py's _PageGen,
        # which folded this grammar in.
        from query_engine_spark.llmdata import warc as W15
    else:
        candidate = build_candidate(live)
        with tempfile.NamedTemporaryFile(
                "w", suffix="_warc_r15.py", delete=False) as f:
            f.write(candidate)
            path = f.name
        spec = importlib.util.spec_from_file_location("warc_r15", path)
        W15 = importlib.util.module_from_spec(spec)
        sys.modules["warc_r15"] = W15
        spec.loader.exec_module(W15)

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(repo, "tests"))
    import test_html_differential as H
    H.W = W15  # point the shared differential machinery at the candidate

    gen_cls = _ext_gen_class(H)
    pages = []
    for seed in range(n):
        g = gen_cls(random.Random(300000 + seed))
        pages.append((seed, f"https://x{seed % 13}.example/e{seed % 3}/"
                            f"p{seed}.html", g.page()))
    div = H._run_differential(spark, pages)
    bad = {k: len(v) for k, v in div.items() if v}
    for k, v in div.items():
        for item in v[:4]:
            print(" ", k, repr(item)[:400])
    spark.stop()
    if path:
        os.unlink(path)
    if bad:
        print(f"DIVERGENCES: {bad}")
        return 1
    print(f"r15 candidate green on {n} extended-grammar pages")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
