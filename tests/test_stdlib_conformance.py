"""Cross-validation of the repo's container codecs against the Python
STANDARD LIBRARY's independent implementations, in BOTH directions —
the r8 lesson generalized: an external conformance anchor is cheaper
and stronger than a hand-authored golden wherever the stdlib ships a
reader/writer (tar already cross-validates against `tarfile`; this
module adds ZIP/ZIP64 vs `zipfile`, WAV vs `wave`, AU vs `sunau`, AIFF
vs `aifc`). Roundtrip tests inside a co-developed encode/decode pair
cannot catch mirrored misinterpretations; stdlib agreement can.

`sunau`/`aifc` are deprecated (removed in 3.13) — gated with
importorskip so the suite survives an interpreter upgrade; the in-repo
goldens remain the permanent anchors.
"""

from __future__ import annotations

import io
import os
import struct
import sys
import warnings

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.llmdata import archives as A
from query_engine_spark.llmdata import multimodal as MM

_MEMBERS = [
    ("a.txt", b"hello stdlib"),
    ("dir/b.bin", bytes(range(256)) * 3),
    ("empty", b""),
    ("unicode-é.txt", "café   text".encode("utf-8")),
]

_SAMPLES = [((i * 37) % 65536) - 32768 for i in range(120)]


class _KeepOpen(io.BytesIO):
    """BytesIO whose close() is a no-op — aifc/wave close the underlying
    file inside their own close(), which must not discard the buffer."""

    def close(self) -> None:  # noqa: D401
        pass


# ---------------------------------------------------------------------------
# ZIP / ZIP64 vs zipfile


@pytest.mark.parametrize("zip64", [False, True], ids=["classic", "zip64"])
def test_zipfile_reads_our_archives(zip64):
    blob = A.build_zip(_MEMBERS, zip64=zip64)
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.testzip() is None  # stdlib CRC check over every member
        got = [(n, zf.read(n)) for n in zf.namelist()]
    assert got == _MEMBERS


def test_we_read_zipfile_archives_stored_and_deflated():
    import zipfile

    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", method) as zf:
            for n, d in _MEMBERS:
                zf.writestr(n, d)
        assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_forced_zip64():
    """zipfile's force_zip64 writes the sentinel local sizes + 0x0001
    extras + ZIP64 EOCD/locator — the exact wire shape our reader's
    ZIP64 path claims to implement, produced by an independent writer."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            with zf.open(n, "w", force_zip64=True) as f:
                f.write(d)
    assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_with_archive_comment():
    """An EOCD trailed by an archive comment moves the record off the
    file tail — the up-to-64KiB backward comment window (APPNOTE 4.3.16)
    must still find it. zipfile is the independent comment writer."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            zf.writestr(n, d)
        zf.comment = b"corpus export manifest v3 " * 40
    assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_streamed_with_data_descriptors():
    """zipfile writing through a NON-SEEKABLE stream sets general-purpose
    flag bit 3 and emits post-payload data descriptors with zeroed local
    header sizes — the wire shape of piped exports. A central-directory-
    driven reader (sizes from the CD, data offset from the local header)
    is immune; a local-header-walking reader would misread every
    member."""
    import zipfile

    class _NoSeek:
        def __init__(self):
            self.buf = bytearray()

        def write(self, b):
            self.buf += b
            return len(b)

        def flush(self):
            pass

    ns = _NoSeek()
    with zipfile.ZipFile(ns, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            zf.writestr(n, d)
    blob = bytes(ns.buf)
    assert blob[6] & 0x08, "zipfile should have set the descriptor flag"
    assert A.read_zip(blob) == _MEMBERS


def test_zip_crossed_roundtrip_through_both_engines():
    """ours -> zipfile re-write -> ours: content survives a full trip
    through the foreign implementation."""
    import zipfile

    blob = A.build_zip(_MEMBERS, zip64=True)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        rebuf = io.BytesIO()
        with zipfile.ZipFile(rebuf, "w", zipfile.ZIP_DEFLATED) as out:
            for n in zf.namelist():
                out.writestr(n, zf.read(n))
    assert A.read_zip(rebuf.getvalue()) == _MEMBERS


# ---------------------------------------------------------------------------
# WAV vs wave


def test_wave_reads_our_wav():
    import wave

    blob = MM.make_wav(3, 100)
    with wave.open(io.BytesIO(blob)) as wf:
        assert (wf.getnchannels(), wf.getsampwidth(), wf.getframerate()) == (
            1, 2, wf.getframerate(),
        )
        frames = wf.readframes(wf.getnframes())
    got = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    want = [((3 * 131 + i * 17) % 65536) - 32768 for i in range(100)]
    assert got == want


def test_we_read_wave_written_pcm16():
    import wave

    buf = _KeepOpen()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(16000)
    ww.writeframes(b"".join(struct.pack("<h", s) for s in _SAMPLES))
    ww.close()
    rate, n, _dur, sample_sum, peak, first = MM.decode_wav(buf.getvalue())
    assert (rate, n, first) == (16000, len(_SAMPLES), _SAMPLES[0])
    assert sample_sum == sum(_SAMPLES)  # decode_wav's fold is the SIGNED sum
    assert peak == max(_SAMPLES)


# ---------------------------------------------------------------------------
# AU vs sunau (deprecated stdlib — skip cleanly if removed)


def test_sunau_reads_our_au():
    sunau = pytest.importorskip("sunau")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        blob = MM.make_au(4, 60, 8000)
        sf = sunau.open(io.BytesIO(blob))
        assert (sf.getnchannels(), sf.getsampwidth(), sf.getframerate(),
                sf.getnframes()) == (1, 2, 8000, 60)
        frames = sf.readframes(60)
    got = list(struct.unpack(">60h", frames))
    want = [((4 * 131 + i * 17) % 65536) - 32768 for i in range(60)]
    assert got == want


def test_we_read_sunau_written_linear16():
    sunau = pytest.importorskip("sunau")
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        sw = sunau.open(buf, "wb")
        # sunau's writer DEFAULTS to comptype 'ULAW' (a historical trap:
        # PCM input would be written byte-truncated under a mu-law
        # encoding tag) — request linear explicitly
        sw.setcomptype("NONE", "not compressed")
        sw.setnchannels(1)
        sw.setsampwidth(2)
        sw.setframerate(8000)
        sw.writeframes(b"".join(struct.pack(">h", s) for s in _SAMPLES))
        sw.close()
    rate, n, samples = MM.decode_au(buf.getvalue())
    assert (rate, n) == (8000, len(_SAMPLES))
    assert samples == _SAMPLES


def test_we_read_sunau_written_mulaw():
    """sunau comptype ULAW CONVERTS linear input to mu-law bytes on
    write (via audioop.lin2ulaw) — our G.711 expansion of those bytes
    must agree sample-for-sample with audioop's own ulaw2lin, the
    independent implementation of the same table."""
    sunau = pytest.importorskip("sunau")
    audioop = pytest.importorskip("audioop")
    # audioop (and therefore sunau's ULAW conversion) treats linear
    # fragments as NATIVE-endian — pack accordingly and unpack audioop's
    # expansion the same way
    pcm = b"".join(struct.pack("=h", s) for s in _SAMPLES)
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        sw = sunau.open(buf, "wb")
        sw.setcomptype("ULAW", "")
        sw.setnchannels(1)
        sw.setsampwidth(2)
        sw.setframerate(8000)
        sw.writeframes(pcm)
        sw.close()
        ulaw_bytes = audioop.lin2ulaw(pcm, 2)
        want = list(
            struct.unpack(
                f"={len(_SAMPLES)}h", audioop.ulaw2lin(ulaw_bytes, 2)
            )
        )
    rate, n, samples = MM.decode_au(buf.getvalue())
    assert (rate, n) == (8000, len(_SAMPLES))
    assert samples == want


def test_our_mulaw_table_equals_audioop_expansion():
    """The repo's 256-entry G.711 mu-law LUT (shared by the WAV tag-7
    and AU encoding-1 paths) must equal audioop's st_ulaw2linear16 —
    the independent CCITT-derived implementation — on EVERY byte."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        expanded = audioop.ulaw2lin(bytes(range(256)), 2)
    want = np.frombuffer(expanded, dtype="=i2").astype(np.int64)
    ours = np.asarray(MM._MULAW_LUT[np.arange(256)], dtype=np.int64)
    assert (ours == want).all()


def test_our_alaw_table_equals_audioop_expansion():
    """Same anchor for the A-law LUT (WAV format tag 6) vs audioop's
    alaw2lin."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        expanded = audioop.alaw2lin(bytes(range(256)), 2)
    want = np.frombuffer(expanded, dtype="=i2").astype(np.int64)
    ours = np.asarray(MM._ALAW_LUT[np.arange(256)], dtype=np.int64)
    assert (ours == want).all()


# ---------------------------------------------------------------------------
# AIFF vs aifc (deprecated stdlib — skip cleanly if removed)


def test_aifc_reads_our_aiff():
    aifc = pytest.importorskip("aifc")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        blob = MM.make_aiff(5, 60, 8000)
        af = aifc.open(io.BytesIO(blob))
        assert (af.getnchannels(), af.getsampwidth(), af.getframerate(),
                af.getnframes()) == (1, 2, 8000, 60)
        frames = af.readframes(60)
    got = list(struct.unpack(">60h", frames))
    want = [((5 * 131 + i * 17) % 65536) - 32768 for i in range(60)]
    assert got == want


def test_we_read_aifc_written_pcm16():
    aifc = pytest.importorskip("aifc")
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        aw = aifc.open(buf, "wb")
        aw.aiff()  # plain AIFF, not AIFF-C
        aw.setnchannels(1)
        aw.setsampwidth(2)
        aw.setframerate(11025)
        aw.writeframes(b"".join(struct.pack(">h", s) for s in _SAMPLES))
        aw.close()
    rate, n, samples = MM.decode_aiff(buf.getvalue())
    assert (rate, n) == (11025, len(_SAMPLES))
    assert samples == _SAMPLES


# ---------------------------------------------------------------------------
# MBOX vs mailbox — the r11 sweep extension (the r10 ZIP sweep found a
# real wire-format bug, so the pattern earns its keep). Our framing is
# mboxrd (quotes ^>*From, unquotes one level of ^>+From); stdlib's is
# mboxo (quotes only ^From, never unquotes). The two dialects agree on
# BOUNDARIES always and on content whenever the original body carries no
# pre-quoted ">+From " lines — the divergence on such lines is a format
# ambiguity both dialects document, not a reader bug, and is pinned
# explicitly below so a refactor can't silently change which side we are.


_MAIL_BODIES = [
    "plain body\nFrom here it escalates\nend",
    "no hazards at all",
    "ends with blank lines\n\n\n",
    "From the very first line",
    "",
]


def _mail_messages():
    from query_engine_spark.llmdata import mail as M

    return [
        M.build_message(
            from_addr=f"user{i}@host{i}.example",
            subject=f"subject {i}",
            body=b,
            html="alt" if i % 2 else None,
        )
        for i, b in enumerate(_MAIL_BODIES)
    ]


def test_mailbox_reads_our_mbox(tmp_path):
    """stdlib mailbox.mbox over our build_mbox output: same message
    count, same subjects, and per-message bytes that (after reversing
    OUR mboxrd quoting) equal what our own split_mbox recovers — the
    boundary detection is the cross-validated part; a body line the
    framing failed to quote would split one message into two here."""
    import mailbox

    from query_engine_spark.llmdata import mail as M

    msgs = _mail_messages()
    path = tmp_path / "ours.mbox"
    path.write_bytes(M.build_mbox(msgs))
    mb = mailbox.mbox(str(path))
    try:
        assert len(mb) == len(msgs)
        for k, raw in zip(sorted(mb.keys()), msgs):
            got = mb[k]
            want = M.extract_message(raw)
            assert str(got["Subject"]) == want["subject"]
            # stdlib returns the still-quoted wire form; our unquote rule
            # over it must reproduce the original message bytes
            unquoted = b"\n".join(
                line[1:]
                if line.startswith(b">") and line.lstrip(b">").startswith(b"From ")
                else line
                for line in mb.get_bytes(k).split(b"\n")
            )
            assert unquoted.rstrip(b"\n") == raw.rstrip(b"\n")
    finally:
        mb.close()


def test_we_read_mailbox_written_mbox(tmp_path):
    """Our split_mbox + extract_message over a file stdlib mailbox wrote:
    same count, and subject/domain/text agree with stdlib email parsing
    of the originals. Bodies avoid pre-quoted '>From ' lines — stdlib
    writes mboxo (which leaves them bare) while we read mboxrd (which
    would unquote them): the documented dialect divergence, pinned in
    its own test below."""
    import email
    import mailbox

    from query_engine_spark.llmdata import mail as M

    msgs = [m for m, b in zip(_mail_messages(), _MAIL_BODIES) if ">From" not in b]
    path = tmp_path / "stdlib.mbox"
    mb = mailbox.mbox(str(path))
    try:
        for raw in msgs:
            mb.add(email.message_from_bytes(raw))
        mb.flush()
    finally:
        mb.close()
    parts = M.split_mbox(path.read_bytes())
    assert len(parts) == len(msgs)
    for part, raw in zip(parts, msgs):
        got = M.extract_message(part)
        want = M.extract_message(raw)
        assert got["subject"] == want["subject"]
        assert got["from_domain"] == want["from_domain"]
        # trailing-newline count is a frame-boundary ambiguity in EVERY
        # mbox dialect (the writer must end the message with \n before
        # the next 'From ' line, so 'body' and 'body\n' are the same
        # wire bytes) — normalize exactly that, nothing else
        assert got["text"].rstrip("\n") == want["text"].rstrip("\n")
        assert got["text"].rstrip("\n") != ""  or want["text"].rstrip("\n") == ""


def test_mboxo_vs_mboxrd_divergence_pinned():
    """The ONE case the dialects disagree on: a body line that already
    starts with '>From ' survives stdlib's mboxo writer unquoted, so our
    mboxrd reader strips one '>' level. Pin the behavior (and that our
    own writer+reader pair roundtrips the same body losslessly) so a
    future change to either side is a conscious one."""
    from query_engine_spark.llmdata import mail as M

    raw = M.build_message(
        from_addr="z@q.example", subject="quoting", body=">From before\nok"
    )
    # our own mboxrd pair is lossless on exactly this shape (the MIME
    # layer itself appends the final \n — set_content's canonical form)
    back = M.split_mbox(M.build_mbox([raw]))
    assert len(back) == 1
    assert M.extract_message(back[0])["text"] == ">From before\nok\n"
    # the mboxo wire form (line left bare by stdlib's writer) loses one
    # '>' through an mboxrd reader — the known cross-dialect hazard
    # (the trailing \n also folds into the frame boundary, as everywhere)
    mboxo = b"From x Thu Jan  1 00:00:00 2024\n" + raw + b"\n"
    got = M.extract_message(M.split_mbox(mboxo)[0])["text"]
    assert got.rstrip("\n") == "From before\nok"


# ---------------------------------------------------------------------------
# TAR vs tarfile over ARBITRARY names (hypothesis) — the directed
# GNU/PAX cross-reads live in test_archives.py; this walks the name
# alphabet the same way the ZIP property that caught flag-bit-11 does.


from hypothesis import given, settings, strategies as st  # noqa: E402

# no control chars (NUL is illegal in names; tarfile normalizes \r\n),
# no trailing '/' (tarfile classifies those as directories, ours are
# regular-file corpora by contract)
_TAR_NAME = st.text(
    alphabet=st.characters(codec="utf-8", blacklist_categories=("Cs", "Cc")),
    min_size=1,
    max_size=140,  # crosses the 100-byte ustar field -> long-name records
).filter(lambda n: not n.endswith("/"))
_TAR_MEMBER = st.tuples(_TAR_NAME, st.binary(max_size=600))


@given(
    st.lists(_TAR_MEMBER, min_size=1, max_size=6, unique_by=lambda m: m[0]),
    st.sampled_from(["gnu", "pax"]),
)
@settings(max_examples=60, deadline=None)
def test_tar_roundtrip_and_tarfile_crossread_arbitrary_names(members, style):
    import tarfile

    blob = A.build_tar(members, longname_style=style)
    assert A.read_tar(blob) == members
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
            if m.isfile()
        ]
    assert got == members


@given(
    st.lists(_TAR_MEMBER, min_size=1, max_size=6, unique_by=lambda m: m[0]),
    st.sampled_from(["gnu", "pax"]),
)
@settings(max_examples=60, deadline=None)
def test_we_read_tarfile_written_arbitrary_names(members, style):
    import tarfile

    fmt = tarfile.GNU_FORMAT if style == "gnu" else tarfile.PAX_FORMAT
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    assert A.read_tar(buf.getvalue()) == members


# ---------------------------------------------------------------------------
# HTML regex extraction vs html.parser — the metadata/outlink/image-ref
# pulls are INDEPENDENTLY implemented (RE2-safe column expressions, by
# design: they must run at scan speed and be DuckDB-replayable), so a
# real parser is the right external anchor. The reference extractors
# below use stdlib HTMLParser event callbacks — no regexes — over
# well-formed fixtures that vary attribute order, quote style, tag case
# and whitespace; agreement means the regex layer reads the same
# structure a spec parser does on the HTML shapes the pipeline ingests.


class _MetaRef:
    """html.parser-backed reference for html_metadata's five fields."""

    def __init__(self, html: str) -> None:
        from html.parser import HTMLParser

        fields = {"title": "", "canonical": "", "description": "",
                  "og_title": "", "lang": ""}

        class P(HTMLParser):
            in_title = False

            def handle_starttag(self, tag, attrs):
                a = dict(attrs)
                if tag == "title":
                    self.in_title = True
                elif tag == "html" and a.get("lang") and not fields["lang"]:
                    fields["lang"] = a["lang"]
                elif tag == "link" and a.get("rel") == "canonical":
                    if not fields["canonical"]:
                        fields["canonical"] = a.get("href") or ""
                elif tag == "meta":
                    if a.get("name") == "description" and not fields["description"]:
                        fields["description"] = a.get("content") or ""
                    if a.get("property") == "og:title" and not fields["og_title"]:
                        fields["og_title"] = a.get("content") or ""

            def handle_endtag(self, tag):
                if tag == "title":
                    self.in_title = False

            def handle_data(self, data):
                if self.in_title:
                    fields["title"] += data

        p = P(convert_charrefs=False)  # the regex layer reads raw bytes
        p.feed(html)
        self.fields = fields


_HTML_PAGES = [
    # attribute orders swapped, both quote styles, case variance
    """<html lang="en"><head><title>Alpha Page</title>
    <link rel="canonical" href="https://a.example/x">
    <meta name="description" content="first page, with commas">
    <meta property="og:title" content="Alpha OG"></head>
    <body><p>hi</p></body></html>""",
    """<HTML LANG='fr-CA'><HEAD><TITLE>Page Beta</TITLE>
    <link href='https://b.example/y?q=1' rel='canonical'>
    <meta content='desc with "quotes" inside' name='description'>
    <meta content="OG's title" property="og:title"></HEAD></HTML>""",
    """<html><head><title>No Meta At All</title></head><body></body></html>""",
    """<html lang="de">
    <head><meta property="og:title" content="Nur OG"><title>Gamma</title>
    <link rel="canonical" href="http://c.example/"></head></html>""",
]


def test_html_metadata_vs_html_parser(spark):
    from pyspark.sql import functions as F

    from query_engine_spark.llmdata import warc as W

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(_HTML_PAGES)], "page_id int, html string"
    )
    cols = W.html_metadata(F.col("html"))
    got = {
        r["page_id"]: r
        for r in df.select("page_id", *(c.alias(k) for k, c in cols.items()))
        .collect()
    }
    for i, html in enumerate(_HTML_PAGES):
        want = _MetaRef(html).fields
        for k in ("title", "canonical", "description", "og_title", "lang"):
            assert got[i][k] == want[k], (i, k, got[i][k], want[k])


class _LinkRef:
    """html.parser-backed reference for outlink_edges' host resolution."""

    def __init__(self, pages: list[tuple[str, str]]) -> None:
        import re as _re
        from collections import Counter
        from html.parser import HTMLParser

        edges: Counter = Counter()
        for url, html in pages:
            src_host = _re.match(
                r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", url
            ).group(1).lower()
            hrefs: list[str] = []

            class P(HTMLParser):
                def handle_starttag(self, tag, attrs):
                    if tag == "a":
                        a = dict(attrs)
                        if "href" in a and a["href"] is not None:
                            hrefs.append(a["href"])

            p = P(convert_charrefs=False)
            p.feed(html)
            for link in hrefs:
                if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", link):
                    dst = _re.match(
                        r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", link
                    ).group(1).lower()
                elif link.startswith("//"):
                    m = _re.match(r"^//([^/?#]+)", link)
                    dst = m.group(1).lower() if m else None
                elif (_re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", link)
                      or link.startswith("#") or link == ""):
                    dst = None
                else:
                    dst = src_host
                if dst:
                    edges[(src_host, dst)] += 1
        self.edges = dict(edges)


_LINK_PAGES = [
    ("https://news.example/a", """<html><body>
      <a href="https://other.example/story">abs</a>
      <a href='//cdn.example/img'>proto-rel</a>
      <a href="/local/path">root-rel</a>
      <a href="sibling.html">path-rel</a>
      <a href="mailto:x@y.z">mail</a>
      <a href="#frag">frag</a>
      <a href="">empty</a>
      <A HREF="HTTPS://Other.Example/dup">case</A>
      <a name="anchor-no-href">no href</a>
    </body></html>"""),
    ("http://blog.example/p?x=1", """<html><body>
      <a href='https://news.example/'>back</a>
      <a href="javascript:void(0)">js</a>
      <a href="post2.html">rel</a>
    </body></html>"""),
]


def test_outlink_edges_vs_html_parser(spark):
    from query_engine_spark.llmdata import warc as W

    df = spark.createDataFrame(
        [(u, h) for u, h in _LINK_PAGES], "url string, html string"
    )
    got = {
        (r["src_host"], r["dst_host"]): r["links"]
        for r in W.outlink_edges(df).collect()
    }
    assert got == _LinkRef(_LINK_PAGES).edges


def test_image_refs_vs_html_parser(spark):
    from html.parser import HTMLParser

    from query_engine_spark.llmdata import warc as W

    pages = [
        ("https://shop.example/cat/page.html", """<html><body>
          <img src="https://cdn.example/a.jpg" alt="first">
          <img alt='second "quoted"' src='/images/b.png'>
          <img src="c.gif">
          <img src="//cdn2.example/d.webp" alt="">
          <img src="data:image/gif;base64,R0lGOD" alt="inline">
          <IMG SRC="../up.jpg" ALT="dots">
        </body></html>"""),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = sorted(
        (r["page_url"], r["img_url"], r["alt"])
        for r in W.image_refs(df).collect()
    )

    # reference: html.parser events + RFC-3986-lite resolution (same
    # host-granularity contract the extractor documents)
    import re as _re

    url, html = pages[0]
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)", url)
    scheme, host, path = m.group(1).lower(), m.group(2).lower(), m.group(3)
    basedir = _re.sub(r"[^/]*$", "", path) or "/"
    tags: list[dict] = []

    class P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            if tag == "img":
                tags.append(dict(attrs))

    p = P(convert_charrefs=False)
    p.feed(html)
    # r15: resolution is RFC 3986 — urljoin IS the stdlib reference now
    # ('../up.jpg' collapses; the old hand-rolled reference glued it
    # onto the directory verbatim). scheme/host/basedir stay above to
    # document the pre-r15 contract this section replaced.
    from urllib.parse import urljoin

    del scheme, host, basedir
    want = []
    for a in tags:
        src, alt = a.get("src"), a.get("alt") or ""
        if not src:
            continue
        if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:(?!//)", src):
            continue  # data:, blob: — opaque schemes drop
        want.append((url, urljoin(url, src), alt))
    assert got == sorted(want)


def test_rfc3986_section54_vector_suite(spark):
    """r16 independent-reference hunt (one per round, r15 verdict ask
    #4): the PUBLISHED RFC 3986 §5.4 reference-resolution examples —
    the spec's own normal AND abnormal vector suite over base
    'http://a/b/c/d;p?q' — run through image_refs as <img src=...>
    references, checked against the spec's literal expected strings AND
    urllib.parse.urljoin (two independent references; urljoin implements
    the same section). Scheme-bearing refs ('g:h', 'http:g') and the
    empty reference are excluded: the extractor DROPS non-fetch schemes
    and srcless tags by documented contract (they are not resolution
    cases for an image corpus)."""
    from urllib.parse import urljoin

    from query_engine_spark.llmdata import warc as W

    base = "http://a/b/c/d;p?q"
    vectors = {
        # --- §5.4.1 normal examples
        "g": "http://a/b/c/g",
        "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/",
        "/g": "http://a/g",
        "//g": "http://g",
        "?y": "http://a/b/c/d;p?y",
        "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q#s",
        "g#s": "http://a/b/c/g#s",
        "g?y#s": "http://a/b/c/g?y#s",
        ";x": "http://a/b/c/;x",
        "g;x": "http://a/b/c/g;x",
        "g;x?y#s": "http://a/b/c/g;x?y#s",
        ".": "http://a/b/c/",
        "./": "http://a/b/c/",
        "..": "http://a/b/",
        "../": "http://a/b/",
        "../g": "http://a/b/g",
        "../..": "http://a/",
        "../../": "http://a/",
        "../../g": "http://a/g",
        # --- §5.4.2 abnormal examples
        "../../../g": "http://a/g",
        "../../../../g": "http://a/g",
        "/./g": "http://a/g",
        "/../g": "http://a/g",
        "g.": "http://a/b/c/g.",
        ".g": "http://a/b/c/.g",
        "g..": "http://a/b/c/g..",
        "..g": "http://a/b/c/..g",
        "./../g": "http://a/b/g",
        "./g/.": "http://a/b/c/g/",
        "g/./h": "http://a/b/c/g/h",
        "g/../h": "http://a/b/c/h",
        "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y",
        "g?y/./x": "http://a/b/c/g?y/./x",
        "g?y/../x": "http://a/b/c/g?y/../x",
        "g#s/./x": "http://a/b/c/g#s/./x",
        "g#s/../x": "http://a/b/c/g#s/../x",
    }
    # urljoin agrees with the spec's answers on every kept vector —
    # pin that first so a stdlib drift can't silently weaken the suite
    for ref, want in vectors.items():
        assert urljoin(base, ref) == want, (ref, urljoin(base, ref))

    refs = list(vectors)
    rows = [(base, f'<img src="{r}" alt="v{i}">')
            for i, r in enumerate(refs)]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["alt"]: r["img_url"]
           for r in W.image_refs(df).collect()}
    bad = {refs[i]: (vectors[refs[i]], got.get(f"v{i}"))
           for i in range(len(refs)) if got.get(f"v{i}") != vectors[refs[i]]}
    assert not bad, f"RFC 3986 §5.4 divergences: {bad}"


def test_html_to_text_vs_html_parser(spark):
    """Tag-stripping cross-check: the SIGNIFICANT TEXT (whitespace-
    normalized, space-joined) our regex pipeline keeps equals what
    html.parser's data events yield outside script/style/comments, over
    fixtures confined to the entities both sides decode. Whitespace
    STRUCTURE differs by design (the regex layer inserts newlines at
    block boundaries for the chunker), so the comparison collapses it —
    a leaked tag, eaten word, or mis-decoded entity still fails."""
    from html.parser import HTMLParser

    from pyspark.sql import functions as F

    from query_engine_spark.llmdata import warc as W

    pages = [
        """<html><head><title>T</title><script>var x = "<p>no</p>";</script>
        <style>p { color: red }</style></head>
        <body><h1>Header One</h1><p>alpha &amp; beta &lt;tag&gt; done</p>
        <!-- a comment with <p>markup</p> inside -->
        <ul><li>one</li><li>two</li></ul>
        <div>closing&nbsp;words</div></body></html>""",
        """<p>plain &quot;quoted&quot; and &#39;apos&#39; text</p>""",
    ]

    def ref_text(html: str) -> str:
        chunks: list[str] = []
        skip = {"script", "style"}

        class P(HTMLParser):
            depth = 0

            def handle_starttag(self, tag, attrs):
                if tag in skip:
                    self.depth += 1

            def handle_endtag(self, tag):
                if tag in skip and self.depth:
                    self.depth -= 1

            def handle_data(self, data):
                if not self.depth:
                    chunks.append(data)

        p = P(convert_charrefs=True)  # stdlib decodes the entities
        p.feed(html)
        return " ".join(" ".join(chunks).split())

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "i int, html string"
    )
    got = {
        r["i"]: " ".join(r["txt"].split())
        for r in df.select(
            "i", W.html_to_text(F.col("html")).alias("txt")
        ).collect()
    }
    for i, html in enumerate(pages):
        want = ref_text(html).replace("\xa0", " ")  # &nbsp; -> plain space
        want = " ".join(want.split())
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# gzip wrap vs stdlib gzip module — gzip_bytes/gunzip_bytes are zlib-
# based but the FRAMING choices (no mtime/filename header, single-member
# strictness) are ours; the gzip module is the independent wire anchor.


def test_gzip_module_reads_our_gzip_and_back():
    import gzip

    payload = b"corpus member bytes " * 200 + bytes(range(256))
    ours = A.gzip_bytes(payload)
    assert gzip.decompress(ours) == payload
    # stdlib-written stream (carries mtime/OS header fields ours omits)
    theirs = gzip.compress(payload, 7)
    assert A.gunzip_bytes(theirs) == payload
    # gzip module with filename metadata (FNAME flag) — the header shape
    # real tools (gzip(1)) emit
    buf = io.BytesIO()
    with gzip.GzipFile(filename="corpus.tar", mode="wb", fileobj=buf) as gf:
        gf.write(payload)
    assert A.gunzip_bytes(buf.getvalue()) == payload


# ---------------------------------------------------------------------------
# Randomized html_metadata check (r11): the 4 directed html.parser
# fixtures vary attribute order / quote style / case by hand; this
# generates hundreds of WELL-FORMED metadata heads (random field
# subsets, orders, quote choices, inter-attribute whitespace, tag case)
# with the expected fields known BY CONSTRUCTION — an oracle the
# generator carries, which is what the html.parser reference would
# compute on these shapes (the directed tests pin that equivalence).
# Generation stays inside the extractors' documented contract: values
# avoid the quote character used around them and '>'/newlines inside
# tags (a scan-speed regex layer cannot parse those; a spec parser can —
# that boundary is a design fact, not a drift to hunt).


def _meta_page(rng) -> tuple:
    def q(v: str) -> str:
        c = "'" if rng.random() < 0.5 else '"'
        return c + v + c

    def maybe_case(t: str) -> str:
        return t.upper() if rng.random() < 0.3 else t

    ws = lambda: " " * rng.randint(1, 3)
    fields = {}
    parts = []
    if rng.random() < 0.8:
        fields["lang"] = f"l{rng.randint(0, 9)}-X{rng.randint(0, 9)}"
        html_tag = f"<{maybe_case('html')}{ws()}lang={q(fields['lang'])}>"
    else:
        fields["lang"] = ""
        html_tag = f"<{maybe_case('html')}>"
    if rng.random() < 0.8:
        fields["title"] = f"Title {rng.randint(0, 999)} with words"
        parts.append(
            f"<{maybe_case('title')}>{fields['title']}</{maybe_case('title')}>"
        )
    else:
        fields["title"] = ""
    if rng.random() < 0.8:
        fields["canonical"] = f"https://h{rng.randint(0, 99)}.example/p/{rng.randint(0, 999)}"
        attrs = [f"rel={q('canonical')}", f"href={q(fields['canonical'])}"]
        if rng.random() < 0.5:
            attrs.reverse()
        parts.append(f"<{maybe_case('link')}{ws()}{ws().join(attrs)}>")
    else:
        fields["canonical"] = ""
    if rng.random() < 0.8:
        fields["description"] = f"desc {rng.randint(0, 999)}, punct; and words"
        attrs = [f"name={q('description')}", f"content={q(fields['description'])}"]
        if rng.random() < 0.5:
            attrs.reverse()
        parts.append(f"<{maybe_case('meta')}{ws()}{ws().join(attrs)}>")
    else:
        fields["description"] = ""
    if rng.random() < 0.8:
        fields["og_title"] = f"OG {rng.randint(0, 999)} title"
        attrs = [f"property={q('og:title')}", f"content={q(fields['og_title'])}"]
        if rng.random() < 0.5:
            attrs.reverse()
        parts.append(f"<{maybe_case('meta')}{ws()}{ws().join(attrs)}>")
    else:
        fields["og_title"] = ""
    rng.shuffle(parts)
    head = "".join(parts)
    return (
        f"{html_tag}<head>{head}</head><body><p>body</p></body></html>",
        fields,
    )


def test_html_metadata_randomized_vs_reference(spark):
    import random

    from pyspark.sql import functions as F

    from query_engine_spark.llmdata import warc as W

    rng = random.Random(1111)
    pages = [_meta_page(rng) for _ in range(240)]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(pages)], "page_id int, html string"
    )
    cols = W.html_metadata(F.col("html"))
    got = {
        r["page_id"]: r
        for r in df.select(
            "page_id", *(c.alias(k) for k, c in cols.items())
        ).collect()
    }
    for i, (_page, want) in enumerate(pages):
        for k in ("title", "canonical", "description", "og_title", "lang"):
            assert got[i][k] == want[k], (i, k, got[i][k], want[k], _page)


# ---------------------------------------------------------------------------
# robots.txt vs urllib.robotparser (r11): the crawl-gating engine
# (parse_robots/robots_allowed) is independently implemented to RFC 9309
# — longest-match precedence with the allow tiebreak on equal-length
# rules (§2.2.2). stdlib urllib.robotparser evaluates rules FIRST-MATCH-
# IN-FILE-ORDER, a documented pre-RFC behavior, so the two agree
# everywhere except order/tie shapes — where OURS is the compliant one.
# The differential below checks ours against a 12-line RFC reference
# evaluator on every generated case, counts stdlib agreement, and pins
# the two divergence shapes directedly so a refactor can't silently
# flip which side we are.


def _rfc_allowed(rules, agent: str, path: str) -> bool:
    group = rules["groups"].get(agent.lower()) or rules["groups"].get("*")
    if not group:
        return True
    best = None  # (match_len, kind)
    for kind, pat in group:
        if pat == "" or path.startswith(pat):
            ln = len(pat)
            if best is None or ln > best[0] or (
                ln == best[0] and kind == "allow"
            ):
                best = (ln, kind)
    return best is None or best[1] == "allow"


def test_robots_vs_urllib_robotparser_differential():
    import random
    import urllib.robotparser as RP

    from query_engine_spark.llmdata import warc as W

    rng = random.Random(99)
    stdlib_agree = total = 0
    for _ in range(300):
        paths = [f"/{a}/" for a in ("img", "api", "private", "pub", "data")]
        paths += ["/", "/tmp"]
        lines = []
        agents = ["*"] + [f"bot{k}" for k in range(rng.randrange(0, 3))]
        rng.shuffle(agents)
        for ag in agents:
            lines.append(f"User-agent: {ag}")
            for _ in range(rng.randrange(1, 4)):
                kind = rng.choice(["Allow", "Disallow"])
                p = rng.choice(paths) + rng.choice(["", "x", "deep/y"])
                lines.append(f"{kind}: {p}")
        txt = "\n".join(lines) + "\n"
        rp = RP.RobotFileParser()
        rp.parse(txt.split("\n"))
        rules = W.parse_robots(txt)
        for agent in ("bot0", "somebody"):
            for probe in ("/", "/img/", "/img/x", "/api/deep/y",
                          "/private/x", "/tmp", "/other"):
                total += 1
                ours = W.robots_allowed(rules, agent, probe)
                # the hard invariant: ours == the RFC evaluator, always
                assert ours == _rfc_allowed(rules, agent, probe), (
                    txt, agent, probe,
                )
                stdlib_agree += ours == rp.can_fetch(agent, probe)
    # stdlib agrees except on the order/tie shapes — overwhelming but
    # not total agreement is the EXPECTED signature; total disagreement
    # (or total agreement) would mean one side changed semantics
    assert stdlib_agree / total > 0.98, (stdlib_agree, total)
    assert stdlib_agree < total, "stdlib became RFC-ordered? re-check tiebreak pins"


def test_robots_rfc_precedence_where_stdlib_diverges():
    """The two divergence shapes, pinned directedly per RFC 9309 §2.2.2:
    (a) equal-length allow/disallow tie -> ALLOW wins (stdlib takes
    whichever appears first); (b) longest match wins regardless of file
    order (stdlib stops at the first matching rule)."""
    from query_engine_spark.llmdata import warc as W

    tie = W.parse_robots(
        "User-agent: *\nDisallow: /private/x\nAllow: /private/x\n"
    )
    assert W.robots_allowed(tie, "anybot", "/private/x") is True
    order = W.parse_robots(
        "User-agent: *\nAllow: /api/\nDisallow: /api/deep/y\n"
    )
    assert W.robots_allowed(order, "anybot", "/api/deep/y") is False
    assert W.robots_allowed(order, "anybot", "/api/other") is True


# ---------------------------------------------------------------------------
# HTTP response envelope vs http.client (r11): _http_split is a
# deliberately tolerant splitter (WARC response blocks are whatever the
# crawler captured); http.client.HTTPResponse is the spec parser. On
# well-formed envelopes — folded whitespace, weird casing, multiple
# headers, status reasons with spaces — the two must agree on status,
# content-type and body bytes.


def test_http_split_vs_http_client():
    import http.client
    import socket

    from query_engine_spark.llmdata.warc import _http_split

    cases = [
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: 5\r\n\r\nhello",
        b"HTTP/1.0 404 Not Found At All\r\ncontent-type:  text/plain ; charset=utf-8\r\n"
        b"X-Other: y\r\n\r\nbody bytes \x00\xff here",
        b"HTTP/1.1 301 Moved Permanently\r\nLocation: /new\r\n"
        b"CONTENT-TYPE: image/png\r\n\r\n\x89PNG\r\n\x1a\n....",
        b"HTTP/1.1 204 No Content\r\n\r\n",
    ]

    class _Sock:
        def __init__(self, payload: bytes) -> None:
            self._f = io.BytesIO(payload)

        def makefile(self, *a, **k):
            return self._f

    for raw in cases:
        status, ctype, body = _http_split(raw)
        resp = http.client.HTTPResponse(_Sock(raw))  # type: ignore[arg-type]
        resp.begin()
        assert status == resp.status, raw
        want_ct = resp.getheader("Content-Type")
        got_ct = ctype.strip() if ctype else ctype
        want_ct = want_ct.strip() if want_ct else want_ct
        assert got_ct == want_ct, raw
        # body: http.client honors Content-Length when present; compare
        # the prefix it reads against our split's start, and the full
        # tail when no length header bounds it
        want_body = resp.read()
        assert body[: len(want_body)] == want_body or body == want_body, raw


def test_html_to_text_unescaped_lt_divergence_pinned(spark):
    """DOCUMENTED DIVERGENCE (r12, the mboxo/mboxrd precedent): on
    INVALID html carrying an unescaped '<' before a letter in body text,
    html.parser (and the HTML5 tokenizer) treats '<y ok</p' as one tag
    and swallows to the next '>' — which is exactly the quadratic
    rescan the r12 CPU-bomb fix removed ([^<>] tag interiors). Our
    linear extractor instead KEEPS the '<y ok' text and strips only the
    real '</p>' — the better failure mode for a training-data text
    extractor (content is retained, not silently dropped). This pins
    BOTH sides of the divergence so a future 'fix' toward either
    behavior is a conscious choice; escaped input ('&lt;') and
    space/digit-led '<' (text per the HTML5 spec too) agree on both."""
    from html.parser import HTMLParser

    from pyspark.sql import functions as F

    from query_engine_spark.llmdata.warc import html_to_text

    page = "<p>x<y ok</p>more</p>"

    class Collect(HTMLParser):
        def __init__(self):
            super().__init__()
            self.data = []

        def handle_data(self, d):
            self.data.append(d)

    ref = Collect()
    ref.feed(page)
    ref.close()
    # html.parser: '<y ok</p' is a TAG — the words are dropped
    assert "".join(ref.data) == "xmore"
    got = (
        spark.createDataFrame([(page,)], "html string")
        .select(html_to_text(F.col("html")).alias("t"))
        .collect()[0]["t"]
    )
    # ours: the words survive (with the stray '<'), the real tags strip
    # ('</p>' is a block closer, so it lands as the paragraph newline)
    assert got == "x<y ok\nmore"
    # agreement cases: escaped '<', and '< ' / '<3' (text per HTML5 too)
    agree = "<p>a &lt;b&gt; c < d or i<3 u</p>"
    got2 = (
        spark.createDataFrame([(agree,)], "html string")
        .select(html_to_text(F.col("html")).alias("t"))
        .collect()[0]["t"]
    )
    assert got2 == "a <b> c < d or i<3 u"
