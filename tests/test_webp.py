"""WebP lossless (llmdata/webp.py): the plane-code distance table pinned
to the spec's published values, THREE hand-authored golden bitstreams
assembled with a LOCAL bit packer (independent of the co-developed
encoder — simple codes, the full code-length-coded form with 17/18 zero
runs, and a 2D plane-code backward reference), the full
encode/decode roundtrip matrix, boundaries, and mutation fuzz."""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.llmdata import webp as W


def test_webp_plane_code_anchors():
    """The 120-entry 2D distance map, pinned IN FULL against the spec's
    published table in its yoffset*16 + (8 - xoffset) hex form. The full
    pin exists because the generator once admitted dy=8 / dx=-8
    candidates, corrupting codes 97-120 (e.g. code 97 decoded (0, 8)
    instead of the spec's (8, 0)) while the first-16 anchor and the
    roundtrip suite stayed green — the in-repo encoder never emits codes
    >= 97. The literal below is the spec's table restated entry by
    entry, not generator output re-derived at test time."""
    table = W._PLANE_CODES
    assert len(table) == 120
    assert len(set(table)) == 120
    hexes = [dy * 16 + (8 - dx) for dx, dy in table]
    assert hexes == [
        0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
        0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
        0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
        0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
        0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
        0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
        0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
        0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
        0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
        0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
        0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
        0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
    ]
    # the spec's window: dy 0..7, dx -7..8, every entry strictly backward
    for dx, dy in table:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0
    # code 97 is the spec's (8, 0) — the entry the pre-round-9 generator
    # displaced with (0, 8)
    assert table[96] == (8, 0)
    # distances clamp to >= 1 when dx + dy*xsize would go non-positive
    assert W._plane_to_distance(4, 1) == 1  # (-1, 1) on a 1-wide image
    assert W._plane_to_distance(121, 999) == 1  # direct code 121 -> 1


class _Bits:
    """LOCAL bit packer restating VP8L's LSB-first convention — the
    goldens must not be assembled by the encoder under test."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:  # LSB-first field
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:  # MSB-first code
        for j in range(length - 1, -1, -1):
            self.bits.append((code >> j) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for p, b in enumerate(self.bits):
            if b:
                out[p >> 3] |= 1 << (p & 7)
        return bytes(out)


def _riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _simple_code_1(bits: _Bits, sym: int) -> None:
    """Write a single-symbol simple code (zero bits per use)."""
    bits.put(1, 1)  # simple
    bits.put(0, 1)  # one symbol
    if sym <= 1:
        bits.put(0, 1)
        bits.put(sym, 1)
    else:
        bits.put(1, 1)
        bits.put(sym, 8)


def test_webp_golden_simple_codes():
    """2x2 image, all five codes in the simple form, greens 5/200."""
    bits = _Bits()
    bits.put(1, 14)  # width - 1
    bits.put(1, 14)  # height - 1
    bits.put(0, 1)  # alpha hint
    bits.put(0, 3)  # version
    bits.put(0, 1)  # no transforms
    bits.put(0, 1)  # no color cache
    bits.put(0, 1)  # no meta prefix codes
    # green: simple, two symbols 5 and 200
    bits.put(1, 1)
    bits.put(1, 1)
    bits.put(1, 1)  # first symbol in 8 bits
    bits.put(5, 8)
    bits.put(200, 8)
    _simple_code_1(bits, 10)  # red
    _simple_code_1(bits, 20)  # blue
    _simple_code_1(bits, 255)  # alpha
    _simple_code_1(bits, 0)  # distance (unused)
    # pixels: greens 5, 200, 200, 5 -> canonical 1-bit codes 0/1
    for b in (0, 1, 1, 0):
        bits.put_code(b, 1)
    w, h, px = W.decode_webp(_riff(b"\x2f" + bits.bytes()))
    assert (w, h) == (2, 2)
    assert px == [
        W._argb(255, 10, 5, 20),
        W._argb(255, 10, 200, 20),
        W._argb(255, 10, 200, 20),
        W._argb(255, 10, 5, 20),
    ]


def test_webp_golden_code_length_coded_green():
    """1x3 image whose green code uses the FULL code-length-coded form:
    zero runs via symbols 17 and 18 (with their 3- and 7-bit extras),
    lengths [g7->1, g9->2, g11->2], the _CL_ORDER table, and canonical
    assignment — every value here computed by hand."""
    bits = _Bits()
    bits.put(0, 14)  # width 1
    bits.put(2, 14)  # height 3
    bits.put(0, 1)
    bits.put(0, 3)
    bits.put(0, 1)  # no transforms
    bits.put(0, 1)  # no cache
    bits.put(0, 1)  # no meta
    # green, full form
    bits.put(0, 1)
    # CL lengths: {17:3, 18:2, 0:2, 1:3, 2:2} -> order prefix of 5
    bits.put(1, 4)  # num_code_lengths - 4 = 1 -> 5 entries
    for cl_len in (3, 2, 2, 3, 2):  # order: 17, 18, 0, 1, 2
        bits.put(cl_len, 3)
    bits.put(0, 1)  # no max_symbol cutoff
    # canonical CL codes: (2,0)=00 (2,2)=01 (2,18)=10 (3,1)=110 (3,17)=111
    bits.put_code(0b111, 3)  # 17: run of zeros
    bits.put(4, 3)  # 3 + 4 = 7 zeros (symbols 0..6)
    bits.put_code(0b110, 3)  # 1: g7 -> length 1
    bits.put_code(0b00, 2)  # 0: g8 zero
    bits.put_code(0b01, 2)  # 2: g9 -> length 2
    bits.put_code(0b00, 2)  # 0: g10 zero
    bits.put_code(0b01, 2)  # 2: g11 -> length 2
    bits.put_code(0b10, 2)  # 18: long zero run
    bits.put(127, 7)  # 11 + 127 = 138 zeros (g12..g149)
    bits.put_code(0b10, 2)  # 18 again
    bits.put(119, 7)  # 11 + 119 = 130 zeros (g150..g279)
    _simple_code_1(bits, 33)  # red
    _simple_code_1(bits, 44)  # blue
    _simple_code_1(bits, 255)  # alpha
    _simple_code_1(bits, 0)  # distance
    # canonical green codes: g7 -> 0 (1 bit), g9 -> 10, g11 -> 11
    bits.put_code(0b0, 1)
    bits.put_code(0b10, 2)
    bits.put_code(0b11, 2)
    w, h, px = W.decode_webp(_riff(b"\x2f" + bits.bytes()))
    assert (w, h) == (1, 3)
    assert [(p >> 8) & 255 for p in px] == [7, 9, 11]
    assert all((p >> 16) & 255 == 33 and p & 255 == 44 for p in px)


def test_webp_golden_plane_code_backref():
    """4x2 image: four literals then one LZ77 copy of length 4 at 2D
    plane code 1 = (0,1) = one row up. Green code carries a literal AND
    the length-4 symbol (259), so the full form is required; the zero
    runs around symbols 50 and 259 are hand-sized 18-runs."""
    bits = _Bits()
    bits.put(3, 14)  # width 4
    bits.put(1, 14)  # height 2
    bits.put(0, 1)
    bits.put(0, 3)
    bits.put(0, 1)  # no transforms
    bits.put(0, 1)  # no cache
    bits.put(0, 1)  # no meta
    # green full form: lengths {50:1, 259:1}
    bits.put(0, 1)
    # CL lengths: {1:1, 18:1} -> order prefix [17,18,0,1] = 4 entries
    bits.put(0, 4)
    for cl_len in (0, 1, 0, 1):  # 17, 18, 0, 1
        bits.put(cl_len, 3)
    bits.put(0, 1)  # no cutoff
    # canonical CL codes: (1,1)=0, (1,18)=1
    bits.put_code(1, 1)  # 18: zeros
    bits.put(39, 7)  # 11+39 = 50 zeros (g0..g49)
    bits.put_code(0, 1)  # 1: g50 -> length 1
    bits.put_code(1, 1)
    bits.put(127, 7)  # 138 zeros (g51..g188)
    bits.put_code(1, 1)
    bits.put(59, 7)  # 70 zeros (g189..g258)
    bits.put_code(0, 1)  # 1: g259 (length code 3 = copy length 4)
    bits.put_code(1, 1)
    bits.put(9, 7)  # 20 zeros (g260..g279)
    _simple_code_1(bits, 60)  # red
    _simple_code_1(bits, 70)  # blue
    _simple_code_1(bits, 255)  # alpha
    _simple_code_1(bits, 0)  # distance: symbol 0 -> code value 1
    # canonical green: g50 -> 0, g259 -> 1
    for _ in range(4):
        bits.put_code(0, 1)  # four literals, green 50
    bits.put_code(1, 1)  # length symbol: length 4, no extra bits
    # distance symbol decodes with zero bits; code value 1 -> plane (0,1)
    w, h, px = W.decode_webp(_riff(b"\x2f" + bits.bytes()))
    assert (w, h) == (4, 2)
    assert px == [W._argb(255, 60, 50, 70)] * 8


def test_webp_roundtrip_matrix():
    rng = random.Random(5)
    w, h = 11, 6
    px = [
        W._argb(255, rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    variants = [
        {},
        {"subtract_green": True},
        *({"predictor": m} for m in range(14)),
        {"cross_color": (130, 77, 250)},
        {"subtract_green": True, "predictor": 11},
        {"lz77": True},
        {"cache_bits": 5},
        {"lz77": True, "cache_bits": 3, "subtract_green": True},
        {"meta_bits": 2},
        {"meta_bits": 3, "cache_bits": 2},
    ]
    for kw in variants:
        got = W.decode_webp(W.encode_webp(w, h, px, **kw))
        assert got == (w, h, px), kw
    # palettes at every bundling width + unbundled, incl. non-divisible
    # widths (partial last packed byte)
    for ncolors in (2, 3, 4, 5, 16, 17, 40):
        pal = [W._argb(255, j * 6 % 256, j, 255 - j) for j in range(ncolors)]
        ppx = [pal[(x + 2 * y) % ncolors] for y in range(h) for x in range(w)]
        got = W.decode_webp(W.encode_webp(w, h, ppx, palette=True))
        assert got == (w, h, ppx), ncolors
    # alpha-varying pixels survive
    apx = [W._argb((x * 29 + y) % 256, x % 256, y % 256, 7) for y in range(h) for x in range(w)]
    assert W.decode_webp(W.encode_webp(w, h, apx)) == (w, h, apx)


def test_webp_boundaries_refuse_loudly():
    blob = W.encode_webp(2, 2, [W._argb(255, 1, 2, 3)] * 4)
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        W.decode_webp(b"not a webp at all....")
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp(blob[:12] + b"VP8 " + blob[16:])
    with pytest.raises(NotImplementedError, match="VP8X"):
        W.decode_webp(blob[:12] + b"VP8X" + blob[16:])
    with pytest.raises(ValueError, match="signature"):
        W.decode_webp(blob[:20] + b"\x00" + blob[21:])
    with pytest.raises(ValueError, match="truncated|chunk|past end"):
        W.decode_webp(blob[:-3])
    # palette + spatial transform combos refuse at both ends
    with pytest.raises(ValueError, match="palette"):
        W.encode_webp(2, 2, [W._argb(255, 1, 2, 3)] * 4, palette=True,
                      subtract_green=True)


def test_webp_mutation_fuzz():
    """600 mutated WebP files: decode returns pixels or raises a
    contract error — never hangs, never leaks an unrelated type."""
    rng = random.Random(17)
    blobs = [
        W.make_webp(m, 9 + m % 4, 8 + m % 3) for m in range(6)
    ] + [W.make_webp_palette(1, 8, 6, 11)]
    for _ in range(600):
        bad = bytearray(rng.choice(blobs))
        op = rng.randrange(3)
        if op == 0:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        elif op == 1:
            bad = bad[: rng.randrange(len(bad))]
        else:
            bad += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        try:
            w, h, px = W.decode_webp(bytes(bad))
        except (ValueError, NotImplementedError):
            continue
        assert len(px) == w * h


def test_webp_spark_stage_map_only(spark):
    import pandas as pd

    ids = spark.createDataFrame(pd.DataFrame({"media_id": range(8)}))

    def pack(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        W.make_webp(int(i), 9 + int(i) % 4, 8 + int(i) % 3)
                        for i in pdf["media_id"]
                    ],
                }
            )

    media = ids.mapInPandas(pack, "media_id long, payload binary")
    feats = W.webp_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    for m in range(8):
        w, h = 9 + m % 4, 8 + m % 3
        want_r = sum(
            (m * 31 + y * 7 + x * 3) % 256 for y in range(h) for x in range(w)
        )
        assert (rows[m]["width"], rows[m]["height"]) == (w, h)
        assert rows[m]["r_sum"] == want_r
        assert rows[m]["top_left_r"] == (m * 31) % 256
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_webp_anim_golden_hand_assembled_container():
    """Animated-container conformance anchored outside encode_webp_anim:
    VP8X/ANIM/ANMF assembled byte-by-byte (halved offsets, minus-one
    dims, the blend/dispose flag bits) around the HAND-AUTHORED
    simple-code VP8L payload from the static golden — a 2x2 frame
    pasted at (2, 0) on a 6x4 canvas over the transparent start."""
    bits = _Bits()
    bits.put(1, 14)
    bits.put(1, 14)
    bits.put(0, 1)
    bits.put(0, 3)
    bits.put(0, 1)
    bits.put(0, 1)
    bits.put(0, 1)
    bits.put(1, 1)
    bits.put(1, 1)
    bits.put(1, 1)
    bits.put(5, 8)
    bits.put(200, 8)
    _simple_code_1(bits, 10)
    _simple_code_1(bits, 20)
    _simple_code_1(bits, 255)
    _simple_code_1(bits, 0)
    for b in (0, 1, 1, 0):
        bits.put_code(b, 1)
    vp8l_payload = b"\x2f" + bits.bytes()

    def chunk(cc, payload):
        out = cc + len(payload).to_bytes(4, "little") + payload
        return out + (b"\x00" if len(payload) & 1 else b"")

    vp8x = chunk(
        b"VP8X",
        bytes([0x02]) + b"\x00\x00\x00"
        + (5).to_bytes(3, "little") + (3).to_bytes(3, "little"),
    )
    anim = chunk(b"ANIM", bytes([17, 13, 9, 255]) + (0).to_bytes(2, "little"))
    anmf = chunk(
        b"ANMF",
        (1).to_bytes(3, "little")      # x = 2, stored halved
        + (0).to_bytes(3, "little")    # y = 0
        + (1).to_bytes(3, "little")    # w - 1
        + (1).to_bytes(3, "little")    # h - 1
        + (70).to_bytes(3, "little")   # duration
        + bytes([0x02])                # no-blend, no dispose
        + chunk(b"VP8L", vp8l_payload),
    )
    body = vp8x + anim + anmf
    blob = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
    cw, ch, frames = W.decode_webp_frames(blob)
    assert (cw, ch) == (6, 4)
    assert len(frames) == 1 and frames[0]["dur_ms"] == 70
    canvas = frames[0]["canvas"]
    want_px = [
        W._argb(255, 10, 5, 20), W._argb(255, 10, 200, 20),
        W._argb(255, 10, 200, 20), W._argb(255, 10, 5, 20),
    ]
    assert canvas[2] == want_px[0] and canvas[3] == want_px[1]
    assert canvas[6 + 2] == want_px[2] and canvas[6 + 3] == want_px[3]
    # everything outside the pasted rect stays transparent black
    assert sum(1 for p in canvas if p == 0) == 20


def test_webp_anim_boundaries_refuse_loudly():
    blob = W.make_webp_animated(3)
    # static decode of an animated file points at the frames decoder
    with pytest.raises(NotImplementedError, match="decode_webp_frames"):
        W.decode_webp(blob)
    # lossy frame subchunk
    bad = blob.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises((NotImplementedError, ValueError)):
        W.decode_webp_frames(bad)
    # VP8X without the animation flag
    i = blob.index(b"VP8X") + 8
    static = blob[:i] + bytes([blob[i] & ~0x02]) + blob[i + 1:]
    with pytest.raises(NotImplementedError, match="animation flag"):
        W.decode_webp_frames(static)
    # fractional alpha under the blend mode refuses
    cw, ch = 4, 4
    base = [W._argb(255, 1, 2, 3)] * 16
    semi = [W._argb(128, 1, 2, 3)] * 4
    frames = [
        {"x": 0, "y": 0, "w": 4, "h": 4, "pixels": base, "blend": "none"},
        {"x": 0, "y": 0, "w": 2, "h": 2, "pixels": semi, "blend": "alpha"},
    ]
    semi_blob = W.encode_webp_anim(cw, ch, frames)
    with pytest.raises(NotImplementedError, match="fractional-alpha"):
        W.decode_webp_frames(semi_blob)
    # ...but the same frame under no-blend copies exactly
    frames[1]["blend"] = "none"
    _, _, out = W.decode_webp_frames(W.encode_webp_anim(cw, ch, frames))
    assert out[1]["canvas"][0] == W._argb(128, 1, 2, 3)
    # odd offsets refuse at encode (the container stores x/2)
    with pytest.raises(ValueError, match="even"):
        W.encode_webp_anim(
            4, 4,
            [{"x": 1, "y": 0, "w": 2, "h": 2, "pixels": semi, "blend": "none"}],
        )
    # frame rect outside the canvas refuses at both ends
    with pytest.raises(ValueError, match="canvas"):
        W.encode_webp_anim(
            4, 4,
            [{"x": 4, "y": 0, "w": 2, "h": 2, "pixels": semi, "blend": "none"}],
        )


def test_webp_anim_mutation_fuzz():
    rng = random.Random(23)
    blobs = [W.make_webp_animated(m) for m in range(4)]
    for _ in range(400):
        bad = bytearray(rng.choice(blobs))
        op = rng.randrange(3)
        if op == 0:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        elif op == 1:
            bad = bad[: rng.randrange(len(bad))]
        else:
            bad += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        try:
            cw, ch, frames = W.decode_webp_frames(bytes(bad))
        except (ValueError, NotImplementedError):
            continue
        assert frames and all(len(f["canvas"]) == cw * ch for f in frames)


from hypothesis import given, settings, strategies as st


@st.composite
def _webp_images(draw):
    w = draw(st.integers(1, 14))
    h = draw(st.integers(1, 12))
    px = [
        W._argb(
            draw(st.integers(0, 255)), draw(st.integers(0, 255)),
            draw(st.integers(0, 255)), draw(st.integers(0, 255)),
        )
        for _ in range(w * h)
    ]
    variant = draw(
        st.sampled_from(
            [
                {},
                {"subtract_green": True},
                {"cross_color": (130, 77, 250)},
                {"lz77": True},
                {"cache_bits": 4},
                {"lz77": True, "cache_bits": 2, "subtract_green": True},
                {"meta_bits": 2},
            ]
        )
    )
    if draw(st.booleans()):
        variant = dict(variant)
        variant["predictor"] = draw(st.integers(0, 13))
        variant.pop("meta_bits", None)
    return w, h, px, variant


@given(_webp_images())
@settings(max_examples=120, deadline=None)
def test_webp_roundtrip_property(img):
    """Property: decode(encode(x)) == x for ARBITRARY ARGB images across
    every transform/entropy variant — beyond the fixed-seed matrix; the
    co-developed pair must agree on every pixel pattern hypothesis can
    invent (the wire format itself is anchored by the hand goldens)."""
    w, h, px, kw = img
    assert W.decode_webp(W.encode_webp(w, h, px, **kw)) == (w, h, px)


@given(st.integers(1, 4096))
@settings(max_examples=300, deadline=None)
def test_webp_prefix_value_coding_inverse(v):
    """PrefixEncode/PrefixDecode are exact inverses over the whole
    length/distance value domain (1..4096)."""
    code, extra_bits, extra_val = W._prefix_encode_value(v)
    assert 0 <= code < 40
    assert extra_val < (1 << extra_bits) if extra_bits else extra_val == 0
    bw = W._BitWriter()
    bw.write(extra_val, extra_bits)
    br = W._BitReader(bw.bytes() or b"\x00")
    assert W._prefix_decode_value(code, br) == v


def test_vp8_lossy_header_layer():
    """RFC 6386 §9.1 keyframe header: frame tag bit layout (type /
    version / show_frame / 19-bit first-partition size), the 0x9D012A
    start code, and 14-bit dims with 2-bit scale codes — the real
    structural layer under the documented probability-table boundary."""
    import pytest

    b = W.make_webp_lossy(5, 33, 21)
    assert b[12:16] == b"VP8 "
    payload = b[20 : 20 + int.from_bytes(b[16:20], "little")]
    m = W.parse_vp8_meta(payload)
    assert (m["width"], m["height"]) == (33, 21)
    assert m["version"] == 5 % 4 and m["show_frame"] == 1
    assert (m["xscale"], m["yscale"]) == (5 % 4, 5 % 3)
    assert m["part0_size"] == 11 + 5 % 5
    # hand-built header, every field a literal: type 0, version 2,
    # show 1, part0 3 bytes -> tag = 3<<5 | 1<<4 | 2<<1 = 0x74
    hand = bytes([0x74, 0, 0]) + b"\x9d\x01\x2a" + bytes(
        [0x0F, 0x40, 0x0B, 0x80]  # w=15 xscale=1, h=11 yscale=2
    ) + b"xyz"
    m2 = W.parse_vp8_meta(hand)
    assert (m2["width"], m2["xscale"], m2["height"], m2["yscale"]) == (
        15, 1, 11, 2,
    )
    assert (m2["version"], m2["show_frame"], m2["part0_size"]) == (2, 1, 3)
    # boundaries refuse loudly
    with pytest.raises(ValueError, match="interframe"):
        W.parse_vp8_meta(bytes([0x75, 0, 0]) + hand[3:])
    with pytest.raises(ValueError, match="start code"):
        W.parse_vp8_meta(bytes([0x74, 0, 0]) + b"\x9d\x01\x2b" + hand[6:])
    with pytest.raises(ValueError, match="runs past"):
        W.parse_vp8_meta(hand[:-1])
    with pytest.raises(ValueError, match="shorter than"):
        W.parse_vp8_meta(hand[:9])
    # pixel decode names the exact boundary (the probability tables)
    with pytest.raises(NotImplementedError, match="probability tables"):
        W.decode_webp(b)


def test_webp_meta_census_all_kinds():
    """webp_meta: the scan-speed kind/dims/frames census agrees with the
    decoders on files the decoders CAN read, and reads lossy headers
    they cannot."""
    import pytest

    assert W.webp_meta(W.make_webp_lossy(7, 40, 30)) == {
        "kind": "vp8", "width": 40, "height": 30, "n_frames": 1,
        "lossy_version": 3,
    }
    lossless = W.make_webp(3, 6, 5)
    w, h, _ = W.decode_webp(lossless)
    assert W.webp_meta(lossless) == {
        "kind": "vp8l", "width": w, "height": h, "n_frames": 1,
        "lossy_version": -1,
    }
    anim = W.make_webp_animated(7)
    cw, ch, frames = W.decode_webp_frames(anim)
    m = W.webp_meta(anim)
    assert (m["kind"], m["width"], m["height"], m["n_frames"]) == (
        "vp8x", cw, ch, len(frames),
    )
    with pytest.raises(ValueError, match="not a WebP"):
        W.webp_meta(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="RIFF size past end"):
        W.webp_meta(W.make_webp_lossy(7, 40, 30)[:-3])
    # a truncated ANIMATION must refuse, not undercount frames — review
    # pass-2 finding: a min(len, riff_end) clamp silently censused a
    # partially-downloaded file with fewer ANMF chunks
    with pytest.raises(ValueError, match="RIFF size past end"):
        W.webp_meta(anim[: len(anim) - 10])

def test_webp_golden_overlapping_lz77_copy():
    """8x1 image: ONE literal then a copy of LENGTH 7 at DISTANCE 1 (the
    RLE-via-LZ77 overlap real encoders emit for flat areas) — the copy
    source extends as the copy appends, so a bulk slice reading only
    pre-copy pixels would truncate. Stream assembled with the LOCAL
    packer: distance prefix value 2 = plane code 2 = (1, 0) = dist 1;
    length prefix value 7 = green symbol 261 + one 0 extra bit. Pins the
    chunked-replication rewrite of the copy loop against hand-derived
    wire bits."""
    bits = _Bits()
    bits.put(7, 14)  # width 8
    bits.put(0, 14)  # height 1
    bits.put(0, 1)
    bits.put(0, 3)
    bits.put(0, 1)  # no transforms
    bits.put(0, 1)  # no cache
    bits.put(0, 1)  # no meta
    # green full form: lengths {50:1, 261:1}
    bits.put(0, 1)
    bits.put(0, 4)  # 4 CL entries: order 17, 18, 0, 1
    for cl_len in (0, 1, 0, 1):
        bits.put(cl_len, 3)
    bits.put(0, 1)  # no cutoff
    # canonical CL codes: (1,1)=0, (1,18)=1
    bits.put_code(1, 1)  # 18: zeros
    bits.put(39, 7)  # 11+39 = 50 zeros (g0..g49)
    bits.put_code(0, 1)  # g50 -> length 1
    bits.put_code(1, 1)
    bits.put(127, 7)  # 138 zeros (g51..g188)
    bits.put_code(1, 1)
    bits.put(61, 7)  # 11+61 = 72 zeros (g189..g260)
    bits.put_code(0, 1)  # g261 -> length 1 (copy-length prefix code 5)
    bits.put_code(1, 1)
    bits.put(7, 7)  # 11+7 = 18 zeros (g262..g279)
    _simple_code_1(bits, 60)  # red
    _simple_code_1(bits, 70)  # blue
    _simple_code_1(bits, 255)  # alpha
    _simple_code_1(bits, 1)  # distance: symbol 1 -> prefix value 2
    # body: one literal (green 50), then the length-7 copy
    bits.put_code(0, 1)  # g50 literal
    bits.put_code(1, 1)  # g261: length code 5, base 7
    bits.put(0, 1)  # length extra bit -> 7
    # distance symbol decodes with zero bits (single-symbol code);
    # prefix value 2 -> plane code 2 = (1, 0) -> distance 1
    w, h, px = W.decode_webp(_riff(b"\x2f" + bits.bytes()))
    assert (w, h) == (8, 1)
    assert px == [W._argb(255, 60, 50, 70)] * 8


def test_webp_lz77_overlap_roundtrip_and_cache_parity():
    """Overlapping and non-overlapping copies through the encode/decode
    pair, with and without the color cache — the cache must see every
    COPIED pixel (a bulk copy that skips cache updates desyncs any later
    cache hit). Differential: the chunked copy equals a local scalar
    restatement of the per-pixel loop on random traces."""
    rng = random.Random(11)
    w, h = 16, 9
    # flat rows + repeats: encoder emits long, often overlapping copies
    px = [
        W._argb(255, (y * 13) % 256, (y * 29) % 256, ((x // 11) * 9) % 256)
        for y in range(h)
        for x in range(w)
    ]
    for kw in ({"lz77": True}, {"lz77": True, "cache_bits": 4}):
        assert W.decode_webp(W.encode_webp(w, h, px, **kw)) == (w, h, px), kw
    # local scalar restatement of the overlap semantics
    for _ in range(200):
        n_prev = rng.randrange(1, 40)
        prev = [rng.randrange(1 << 32) for _ in range(n_prev)]
        dist = rng.randrange(1, n_prev + 1)
        length = rng.randrange(1, 50)
        base = len(prev) - dist
        scalar = list(prev)
        for k in range(length):
            scalar.append(scalar[base + k])
        if dist >= length:
            chunk = prev[base : base + length]
        else:
            pattern = prev[base:]
            chunk = (pattern * (length // dist + 1))[:length]
        assert prev + chunk == scalar, (n_prev, dist, length)


def test_webp_meta_mutation_fuzz():
    """400-case bit-flip / truncation / trailing-bytes fuzz over the
    metadata census parsers (parse_vp8_meta / webp_meta): every mutation
    either parses to a well-typed dict or raises a contract error —
    never crashes with an internal exception type."""
    rng = random.Random(99)
    bases = [
        W.make_webp_lossy(5, 33, 21),
        W.make_webp(3, 6, 5),
        W.make_webp_animated(7),
    ]
    allowed = (ValueError, NotImplementedError)
    for trial in range(400):
        blob = bytearray(rng.choice(bases))
        mode = trial % 3
        if mode == 0 and len(blob) > 1:  # bit flip
            p = rng.randrange(len(blob))
            blob[p] ^= 1 << rng.randrange(8)
        elif mode == 1:  # truncate
            blob = blob[: rng.randrange(len(blob))]
        else:  # trailing junk
            blob += bytes(rng.randrange(1, 9))
        try:
            m = W.webp_meta(bytes(blob))
        except allowed:
            continue
        assert isinstance(m, dict) and set(m) == {
            "kind", "width", "height", "n_frames", "lossy_version",
        }, m


def test_webp_meta_tolerates_trailing_bytes():
    """Review finding (r9 pass 1): the VP8X ANMF walk must stop at the
    RIFF-declared payload end — crawl files carry trailing padding that
    decode_webp_frames already tolerates, and junk past the payload must
    neither raise nor miscount frames."""
    anim = W.make_webp_animated(7)
    clean = W.webp_meta(anim)
    padded = anim + b"\xde\xad\xbe\xef" + b"\xff" * 8
    assert W.webp_meta(padded) == clean
    cw, ch, frames = W.decode_webp_frames(padded)
    assert (cw, ch, len(frames)) == (clean["width"], clean["height"], clean["n_frames"])
    # static kinds tolerate trailing bytes too
    assert W.webp_meta(W.make_webp_lossy(7, 40, 30) + b"junk")["width"] == 40
    assert W.webp_meta(W.make_webp(3, 6, 5) + b"\x00\x00")["kind"] == "vp8l"


def test_webp_lz77_randomized_roundtrip_fuzz():
    """120-trial randomized encode/decode roundtrip biased toward
    copy-heavy content (flat runs, repeated rows, tiled patterns) across
    the lz77/cache variant grid — regression depth for the bulk-copy
    rewrite beyond the fixed-seed matrix. Every trial must roundtrip
    pixel-exact."""
    rng = random.Random(2024)
    for trial in range(120):
        w = rng.randrange(1, 24)
        h = rng.randrange(1, 16)
        style = trial % 4
        px = []
        for y in range(h):
            for x in range(w):
                if style == 0:  # flat runs -> overlapping copies
                    v = (y * 3) % 7
                elif style == 1:  # repeated rows -> row-distance copies
                    v = (x * 11 + (y % 2) * 5) % 256
                elif style == 2:  # tiled pattern
                    v = ((x % 4) * 16 + (y % 3) * 7) % 256
                else:  # noise (few copies)
                    v = rng.randrange(256)
                px.append(W._argb(255, v, (v * 3) % 256, (v * 7) % 256))
        kw = {"lz77": True}
        if trial % 3 == 1:
            kw["cache_bits"] = rng.randrange(1, 7)
        if trial % 5 == 2:
            kw["subtract_green"] = True
        got = W.decode_webp(W.encode_webp(w, h, px, **kw))
        assert got == (w, h, px), (trial, w, h, kw)
