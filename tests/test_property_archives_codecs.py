"""Property-based tests (hypothesis) for the surfaces round 10 touched:
ZIP pack/unpack over ARBITRARY member names (including the non-ASCII
names whose flag-bit-11 handling this round fixed) cross-read by
stdlib zipfile, and QOI encode/decode over ARBITRARY pixel content
(the registry fixture exercises all five op kinds, but only on formula
pixels — hypothesis walks the op-selection boundaries the formula never
hits)."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings, strategies as st

from query_engine_spark.llmdata import archives as A
from query_engine_spark.llmdata import multimodal as MM

# ZIP member names: printable unicode without surrogates; exclude names
# differing only by cp437-undecodable quirks — any codepoint utf-8 can
# encode is legal in the container. Unique names keep the zipfile
# comparison order-unambiguous.
_NAME = st.text(
    alphabet=st.characters(
        codec="utf-8",
        blacklist_categories=("Cs", "Cc"),
    ),
    min_size=1,
    max_size=24,
)
_MEMBER = st.tuples(_NAME, st.binary(max_size=512))


@given(
    st.lists(_MEMBER, min_size=1, max_size=8, unique_by=lambda m: m[0]),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_zip_roundtrip_and_zipfile_crossread_arbitrary_names(members, zip64):
    blob = A.build_zip(members, zip64=zip64)
    # our own roundtrip
    assert A.read_zip(blob) == members
    # junk-prefixed (the self-extracting shape)
    assert A.read_zip(b"#!/bin/sh\n" + blob) == members
    # stdlib cross-read: zipfile must see the same names AND content —
    # this is exactly what the missing UTF-8 flag broke for non-ASCII
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.testzip() is None
        got = [(n, zf.read(zf.namelist()[i])) for i, n in enumerate(zf.namelist())]
    assert got == members


_PIXEL = st.tuples(
    st.integers(0, 255), st.integers(0, 255),
    st.integers(0, 255), st.integers(0, 255),
)


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.data(),
)
@settings(max_examples=80, deadline=None)
def test_qoi_roundtrip_arbitrary_pixels(w, h, data):
    px = data.draw(
        st.lists(_PIXEL, min_size=w * h, max_size=w * h), label="pixels"
    )
    blob = MM.encode_qoi(w, h, px, channels=4)
    w2, h2, chans, out = MM.decode_qoi(blob)
    assert (w2, h2, chans) == (w, h, 4)
    assert out == px


@given(st.lists(_PIXEL, min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_qoi_run_heavy_roundtrip(px):
    """Bias toward long runs (the 62-length chunking boundary): repeat
    each drawn pixel a pseudo-random 1..70 times derived from its own
    channel values — crosses the run-62 split and the run-then-index
    interactions."""
    expanded: list[tuple[int, int, int, int]] = []
    for p in px:
        expanded.extend([p] * (1 + (p[0] * 3 + p[1]) % 70))
        if len(expanded) >= 600:
            break
    w = len(expanded)
    blob = MM.encode_qoi(w, 1, expanded, channels=3)
    w2, h2, chans, out = MM.decode_qoi(blob)
    assert (w2, h2, chans) == (w, 1, 3)
    assert out == expanded


# mbox framing over ARBITRARY bodies (r11): the directed tests pin the
# known hazards (From-quoting, blank-line tails); hypothesis walks body
# shapes the fixtures never spell — leading/nested '>'*From lines,
# whitespace-only lines, unicode — through the full
# build_message -> build_mbox -> split_mbox -> extract_message chain.
# Trailing-newline count is a frame-boundary ambiguity in every mbox
# dialect (the writer must end each message with \n), so exactly that is
# normalized; everything else must roundtrip byte-for-byte.

_BODY_LINE = st.one_of(
    st.text(
        alphabet=st.characters(codec="utf-8", blacklist_categories=("Cs", "Cc")),
        max_size=40,
    ),
    st.builds(
        lambda q, rest: ">" * q + "From " + rest,
        st.integers(0, 3),
        st.text(alphabet=st.characters(codec="ascii", min_codepoint=32), max_size=20),
    ),
)


@given(
    st.lists(
        st.lists(_BODY_LINE, min_size=0, max_size=8).map("\n".join),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=120, deadline=None)
def test_mbox_roundtrip_arbitrary_bodies(bodies):
    from query_engine_spark.llmdata import mail as M

    msgs = [
        M.build_message(
            from_addr=f"u{i}@example.org",
            subject=f"s{i}",
            body=b,
            cte="quoted-printable" if i % 2 else "base64",
        )
        for i, b in enumerate(bodies)
    ]
    parts = M.split_mbox(M.build_mbox(msgs))
    assert len(parts) == len(msgs)
    for part, raw, body in zip(parts, msgs, bodies):
        got = M.extract_message(part)
        want = M.extract_message(raw)
        assert got["subject"] == want["subject"]
        assert got["from_domain"] == want["from_domain"]
        assert got["text"].rstrip("\n") == want["text"].rstrip("\n")
        # and the MIME layer itself preserved the drawn body
        assert want["text"].rstrip("\n") == body.rstrip("\n")
