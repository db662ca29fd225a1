"""WebP lossless (VP8L) — the dominant modern-web image format: a REAL
decoder over the public VP8L bitstream specification (RFC 9649 / the
"WebP Lossless Bitstream Specification"), plus a deterministic encoder
for fixtures:

- RIFF/WEBP container walk ("VP8 " lossy and "VP8X" extended files raise
  honest boundaries),
- the LSB-first bit reader, canonical prefix codes in the DEFLATE
  convention (code-length-coded with 16/17/18 repeats, the max_symbol
  cutoff, and the 2-symbol "simple code" form),
- LZ77 backward references with the 2D plane-code distance map and the
  color cache (0x1e35a7bd multiplicative hash),
- meta prefix codes (the entropy image selecting per-tile code groups),
- all four transforms, applied in reverse stream order: PREDICTOR (all
  14 modes, contiguous-buffer top-right wrap), COLOR (cross-color with
  signed 3.5 fixed-point deltas), SUBTRACT_GREEN, and COLOR_INDEXING
  (delta-coded palette incl. sub-byte pixel bundling at <=16 colors).

ANIMATED WebP decodes too: the VP8X + ANIM/ANMF container walk with
lossless frames composited over a persistent canvas (no-blend copies,
alpha blending for the exact 0/255 alpha domain, dispose-to-background
after display — the GIF-compositing event model). Remaining honest
boundaries: VP8 lossy PIXEL decode (the header layer — frame tag, start
code, dimensions — is real; the entropy-coded data is undecodable
without RFC 6386's literal probability tables, ~3000 published constants
unavailable in this offline build: see the VP8-section note below),
static VP8X features (ALPH/EXIF/ICC), fractional-alpha blending (the
spec formula is real-valued and implementations round differently), and
combining COLOR_INDEXING with the spatial transforms (real encoders
never emit it). `webp_meta` gives the scan-speed kind/dims/frame-count
census over a mixed lossy/lossless/animated corpus without decoding.

Spark shape: decode is one map-only Arrow `mapInPandas` pass over opaque
payloads, the same single-scan plan as every other codec stage.

Semantic spec for the engine surface: /root/reference/src/main.rs (the
reference's ingest surface); the bitstream layout from the public RFC
9649 specification.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within little-endian bytes, like DEFLATE


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        for i in range(n):
            p = self.pos + i
            v |= ((self.buf[p >> 3] >> (p & 7)) & 1) << i
        self.pos = end
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.buf) * 8:
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def bytes(self) -> bytes:
        return bytes(self.out)


# --------------------------------------------------------------------------
# canonical prefix codes (DEFLATE convention: codes assigned by
# (length, symbol) order; bits stream MSB-of-code-first)


class _Huffman:
    """Decode table from code lengths. A single-symbol code (the VP8L
    "simple" form with one symbol) decodes with ZERO bits read."""

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][1]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        kraft = sum(1 << (15 - l) for l, _ in used)
        if kraft != 1 << 15:
            raise ValueError("prefix code is not complete")
        self.single = None
        self.table = {}
        code = 0
        prev_len = 0
        for l, s in sorted(used):
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1
        self.max_len = prev_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in the same convention as _Huffman."""
    used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in used:
        code <<= l - prev_len
        prev_len = l
        out[s] = (code, l)
        code += 1
    return out


def _build_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Huffman code lengths (max 15) for fixture-sized alphabets via the
    classic two-queue merge; raises if depth would exceed 15 (never for
    the fixtures this encoder serves)."""
    import heapq

    items = sorted((f, s) for s, f in freqs.items() if f > 0)
    if not items:
        raise ValueError("empty histogram")
    if len(items) == 1:
        lengths = [0] * alphabet
        lengths[items[0][1]] = 1
        return lengths
    heap: list[tuple[int, int, object]] = []
    for i, (f, s) in enumerate(items):
        heapq.heappush(heap, (f, i, s))
    tick = len(items)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, tick, (n1, n2)))
        tick += 1
    lengths = [0] * alphabet

    def walk(node, depth):
        if isinstance(node, tuple):
            walk(node[0], depth + 1)
            walk(node[1], depth + 1)
        else:
            if depth > 15:
                raise ValueError("fixture Huffman deeper than 15 bits")
            lengths[node] = max(depth, 1)

    walk(heap[0][2], 0)
    return lengths


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """The full prefix-code form: 3-bit code-length-code lengths in
    _CL_ORDER, then symbol lengths with repeats 16 (prev, default 8,
    3-6x), 17 (zeros 3-10) and 18 (zeros 11-138), optionally cut off at
    max_symbol."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        sym = cl.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet:
                raise ValueError("code-length repeat past alphabet")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet:
            raise ValueError("code-length zeros past alphabet")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huffman:
    if br.read_bit():  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read_bit()
        s0 = br.read(8 if first_8bits else 1)
        if s0 >= alphabet:
            raise ValueError("simple-code symbol out of alphabet")
        if num_symbols == 1:
            return _SingleSymbol(s0)
        s1 = br.read(8)
        if s1 >= alphabet or s1 == s0:
            raise ValueError("bad second simple-code symbol")
        lengths = [0] * alphabet
        lengths[s0] = lengths[s1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet))


class _SingleSymbol(_Huffman):
    def __init__(self, sym: int):  # noqa: super-init-not-called
        self.single = sym
        self.table = {}
        self.max_len = 0


# --------------------------------------------------------------------------
# the 2D plane-code distance map (distance codes 1..120)


def _plane_code_table() -> list[tuple[int, int]]:
    """The spec's 120-entry (dx, dy) map, generated by its ordering rule:
    all offsets with dy in 0..7 and dx in -7..8, strictly-backward
    (dy > 0 or dx > 0), sorted by euclidean distance, ties by larger dy,
    then positive dx before negative. The candidate box is EXACTLY the
    published table's span — dy never reaches 8 and dx never reaches -8
    (a wider box admits e.g. (0, 8) at distance 64, displacing the real
    code 97 = (8, 0); that bug shipped until round 9 and was invisible to
    the roundtrip suite because the in-repo encoder only emits codes
    7/24/25). The box holds exactly 120 offsets, so no truncation is
    involved; all 120 entries pin to the spec's published table in
    test_webp_plane_code_anchors, in the spec's yoffset*16 + 8 - xoffset
    hex form ((0,1)->0x18, (1,0)->0x07, ..., (8,7)->0x70)."""
    cand = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(cand) == 120
    return cand


_PLANE_CODES = _plane_code_table()


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


# --------------------------------------------------------------------------
# LZ77 prefix-coded values (lengths and distance codes share the form)


def _prefix_decode_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(v: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits, extra_value); inverse of the above."""
    if v <= 4:
        return v - 1, 0, 0
    vm = v - 1
    extra = vm.bit_length() - 2
    offset = (2 + ((vm >> extra) & 1)) << extra
    return 2 * extra + ((vm >> extra) & 1) + 2, extra, vm - offset


# --------------------------------------------------------------------------
# pixel helpers (ARGB packed in a Python int; channels mod-256)


def _argb(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255


def _add_px(p: int, q: int) -> int:
    """Per-channel mod-256 addition (the predictor residual merge)."""
    return (
        (((p >> 24) + (q >> 24)) & 255) << 24
        | (((p >> 16) + (q >> 16)) & 255) << 16
        | (((p >> 8) + (q >> 8)) & 255) << 8
        | ((p + q) & 255)
    )


def _sub_px(p: int, q: int) -> int:
    return (
        (((p >> 24) - (q >> 24)) & 255) << 24
        | (((p >> 16) - (q >> 16)) & 255) << 16
        | (((p >> 8) - (q >> 8)) & 255) << 8
        | ((p - q) & 255)
    )


def _avg2(p: int, q: int) -> int:
    return (
        ((((p >> 24) & 255) + ((q >> 24) & 255)) >> 1) << 24
        | ((((p >> 16) & 255) + ((q >> 16) & 255)) >> 1) << 16
        | ((((p >> 8) & 255) + ((q >> 8) & 255)) >> 1) << 8
        | ((((p) & 255) + ((q) & 255)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, left: int, top: int, top_left: int, top_right: int) -> int:
    """The 14 VP8L spatial predictors (spec §4.2.1.1)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return _avg2(_avg2(left, top_right), top)
    if mode == 6:
        return _avg2(left, top_left)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(top_left, top)
    if mode == 9:
        return _avg2(top, top_right)
    if mode == 10:
        return _avg2(_avg2(left, top_left), _avg2(top, top_right))
    if mode == 11:
        # Select: the neighbor (L or T) closer (manhattan, all channels)
        # to the gradient estimate L + T - TL; ties go to TOP
        dl = dt = 0
        for sh in (24, 16, 8, 0):
            lc = (left >> sh) & 255
            tc = (top >> sh) & 255
            tlc = (top_left >> sh) & 255
            est = lc + tc - tlc
            dl += abs(est - lc)
            dt += abs(est - tc)
        return top if dt <= dl else left
    if mode == 12:
        out = 0
        for sh in (24, 16, 8, 0):
            c = _clamp(
                ((left >> sh) & 255) + ((top >> sh) & 255)
                - ((top_left >> sh) & 255)
            )
            out |= c << sh
        return out
    if mode == 13:
        ave = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 255
            b = (top_left >> sh) & 255
            # C truncating division: int(x / 2), not floor
            d = a - b
            half = d // 2 if d >= 0 else -((-d) // 2)
            out |= _clamp(a + half) << sh
        return out
    raise ValueError(f"invalid predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """Cross-color delta: signed(t) * signed(c) >> 5 (3.5 fixed point)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# --------------------------------------------------------------------------
# decoder


def _decode_image(br: _BitReader, w: int, h: int, *, level0: bool):
    """Decode one VP8L-coded image (spec "entropy-coded image"): returns
    (pixels, transforms) where transforms only populate at level 0.
    Sub-resolution images (transform data, entropy image, palette) run
    the same path without transforms or meta codes."""
    transforms: list[tuple] = []
    xsize = w
    if level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 3:  # COLOR_INDEXING
                if seen - {3}:
                    raise NotImplementedError(
                        "color-indexing combined with spatial transforms"
                        " not supported"
                    )
                psize = br.read(8) + 1
                palette, _ = _decode_image(br, psize, 1, level0=False)
                # palette entries are delta-coded against the previous
                for i in range(1, psize):
                    palette[i] = _add_px(palette[i], palette[i - 1])
                if psize <= 2:
                    wb = 3
                elif psize <= 4:
                    wb = 2
                elif psize <= 16:
                    wb = 1
                else:
                    wb = 0
                transforms.append(("palette", palette, wb))
                if wb:
                    xsize = (xsize + (1 << wb) - 1) >> wb
            elif ttype in (0, 1):  # PREDICTOR / COLOR
                if 3 in seen:
                    raise NotImplementedError(
                        "color-indexing combined with spatial transforms"
                        " not supported"
                    )
                bits = br.read(3) + 2
                tw = (xsize + (1 << bits) - 1) >> bits
                th = (h + (1 << bits) - 1) >> bits
                tiles, _ = _decode_image(br, tw, th, level0=False)
                transforms.append(
                    ("predictor" if ttype == 0 else "color", bits, tw, tiles)
                )
            else:  # 2: SUBTRACT_GREEN
                transforms.append(("subtract_green",))
    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("color-cache bits out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix codes (level 0 only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta, _ = _decode_image(br, mw, mh, level0=False)
        n_groups = max((((p >> 8) & 0xFFFF) for p in meta), default=0) + 1
        meta_w = mw
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    npix = xsize * h
    pixels: list[int] = []
    while len(pixels) < npix:
        if meta is not None:
            x = len(pixels) % xsize
            y = len(pixels) // xsize
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            gidx = (mp >> 8) & 0xFFFF
            if gidx >= n_groups:
                raise ValueError("meta prefix index out of range")
            g_code, r_code, b_code, a_code, d_code = groups[gidx]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        sym = g_code.decode(br)
        if sym < 256:
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            px = _argb(a, r, sym, b)
            pixels.append(px)
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif sym < 280:
            length = _prefix_decode_value(sym - 256, br)
            dcode = _prefix_decode_value(d_code.decode(br), br)
            dist = _plane_to_distance(dcode, xsize)
            if dist > len(pixels):
                raise ValueError("LZ77 distance before image start")
            if len(pixels) + length > npix:
                raise ValueError("LZ77 copy past image end")
            base = len(pixels) - dist
            # bulk the copy: a non-overlapping run is one slice; an
            # overlapping run is the dist-sized pattern replicated
            # cyclically — exactly the per-pixel LZ77 semantics
            # (bit-parity-tested against the scalar loop)
            if dist >= length:
                chunk = pixels[base : base + length]
            else:
                pattern = pixels[base:]
                chunk = (pattern * (length // dist + 1))[:length]
            pixels.extend(chunk)
            if cache is not None:
                for px in chunk:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            idx = sym - 280
            if idx >= len(cache):
                raise ValueError("color-cache index out of range")
            px = cache[idx]
            pixels.append(px)
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
    return pixels, transforms


def _apply_inverse_transforms(
    pixels: list[int], w: int, h: int, transforms: list[tuple]
) -> list[int]:
    """Inverse transforms in reverse stream order (spec §4.2)."""
    for t in reversed(transforms):
        kind = t[0]
        if kind == "subtract_green":
            out = []
            for p in pixels:
                a, r, g, b = _chans(p)
                out.append(_argb(a, (r + g) & 255, g, (b + g) & 255))
            pixels = out
        elif kind == "color":
            _, bits, tw, tiles = t
            out = []
            for i, p in enumerate(pixels):
                x, y = i % w, i // w
                cte = tiles[(y >> bits) * tw + (x >> bits)]
                g2r = cte & 255  # blue channel
                g2b = (cte >> 8) & 255  # green channel
                r2b = (cte >> 16) & 255  # red channel
                a, r, g, b = _chans(p)
                nr = (r + _ct_delta(g2r, g)) & 255
                nb = (b + _ct_delta(g2b, g) + _ct_delta(r2b, nr)) & 255
                out.append(_argb(a, nr, g, nb))
            pixels = out
        elif kind == "predictor":
            _, bits, tw, tiles = t
            out = []
            for i, p in enumerate(pixels):
                x, y = i % w, i // w
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = out[i - 1]  # top row: L
                elif x == 0:
                    pred = out[i - w]  # left column: T
                else:
                    mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 255
                    if mode > 13:
                        raise ValueError(f"invalid predictor mode {mode}")
                    left = out[i - 1]
                    top = out[i - w]
                    top_left = out[i - w - 1]
                    # contiguous-buffer wrap: TR of the rightmost pixel
                    # is the first pixel of the current row
                    top_right = out[i - w + 1]
                    pred = _predict(mode, left, top, top_left, top_right)
                out.append(_add_px(p, pred))
            pixels = out
        elif kind == "palette":
            _, palette, wb = t
            out = []
            if wb:
                ppb = 1 << wb  # pixels per packed byte
                bitsz = 8 >> wb
                mask = (1 << bitsz) - 1
                packed_w = (w + ppb - 1) >> wb
                for y in range(h):
                    for x in range(w):
                        px = pixels[y * packed_w + (x >> wb)]
                        idx = ((px >> 8) >> ((x % ppb) * bitsz)) & mask
                        if idx >= len(palette):
                            raise ValueError("palette index out of range")
                        out.append(palette[idx])
            else:
                for p in pixels:
                    idx = (p >> 8) & 255
                    if idx >= len(palette):
                        raise ValueError("palette index out of range")
                    out.append(palette[idx])
            pixels = out
        else:  # pragma: no cover
            raise ValueError(f"unknown transform {kind}")
    return pixels


def _decode_vp8l_payload(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode one VP8L chunk payload (signature byte + bitstream) —
    shared by the static path and the per-frame animation path."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    # cap before _decode_image's pixel-list allocation (r12 bomb sweep:
    # 14-bit dims allow a 268M-pixel declared canvas from a tiny file)
    from query_engine_spark.llmdata.bounds import check_dims

    check_dims(w, h, "VP8L")
    pixels, transforms = _decode_image(br, w, h, level0=True)
    return w, h, _apply_inverse_transforms(pixels, w, h, transforms)


def decode_webp(blob: bytes) -> tuple[int, int, list[int]]:
    """Decode a lossless WebP file: returns (width, height, ARGB pixel
    list, raster order). Lossy ("VP8 ") payloads and non-animation VP8X
    features raise honest boundaries; animated files decode through
    `decode_webp_frames`."""
    if len(blob) < 20 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    riff_len = int.from_bytes(blob[4:8], "little")
    if riff_len + 8 > len(blob):
        raise ValueError("RIFF size past end of file")
    fourcc = blob[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError(
            "lossy WebP (VP8) pixel decode not supported: the bitstream"
            " needs RFC 6386's literal probability tables (default"
            " coefficient probs §13.5, update probs §13.4, keyframe"
            " B-mode probs §11.4), unavailable in this build — header"
            " metadata parses via webp_meta/parse_vp8_meta"
        )
    if fourcc == b"VP8X":
        raise NotImplementedError(
            "extended WebP (VP8X) static features not supported; animated"
            " files decode through decode_webp_frames, canvas metadata"
            " through webp_meta"
        )
    if fourcc != b"VP8L":
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    chunk_len = int.from_bytes(blob[16:20], "little")
    payload = blob[20 : 20 + chunk_len]
    if len(payload) != chunk_len:
        raise ValueError("VP8L chunk truncated")
    return _decode_vp8l_payload(payload)


# --------------------------------------------------------------------------
# encoder (deterministic fixtures; every emitted construct is decoded by
# the reader above AND, for the anchored subset, by the hand-authored
# golden tests)


def _write_code(bw: _BitWriter, code: int, length: int) -> None:
    for j in range(length - 1, -1, -1):
        bw.write((code >> j) & 1, 1)


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Write one prefix code (simple form when legal, else the full
    code-length-coded form) and return symbol -> (code, len)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    if len(used) == 1:
        raise ValueError(
            "single-symbol code with symbol >= 256 needs a different fixture"
        )
    bw.write(0, 1)  # full form
    # code-length symbol sequence: literal lengths, zero runs via 17/18
    seq: list[tuple[int, int, int]] = []  # (cl_symbol, extra_bits, extra_val)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                seq.append((18, 7, take - 11))
                run -= take
            while run >= 3:
                take = min(run, 10)
                seq.append((17, 3, take - 3))
                run -= take
            for _ in range(run):
                seq.append((0, 0, 0))
            i = j
        else:
            seq.append((lengths[i], 0, 0))
            i += 1
    cl_freq: dict[int, int] = {}
    for s, _, _ in seq:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    if len(cl_freq) == 1:
        # a degenerate CL code: give the lone symbol a partner so the
        # tree is complete (symbol 15 is never a real length here)
        partner = 15 if next(iter(cl_freq)) != 15 else 14
        cl_lengths = [0] * 19
        cl_lengths[next(iter(cl_freq))] = 1
        cl_lengths[partner] = 1
    else:
        cl_lengths = _build_lengths(cl_freq, 19)
    if max(cl_lengths) > 7:
        raise ValueError("code-length code deeper than 7 bits")
    num_cl = 0
    for idx, sym in enumerate(_CL_ORDER):
        if cl_lengths[sym] > 0:
            num_cl = idx + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for idx in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[idx]], 3)
    bw.write(0, 1)  # no max_symbol cutoff: all positions written
    cl_codes = _canonical_codes(cl_lengths)
    for s, eb, ev in seq:
        c, l = cl_codes[s]
        _write_code(bw, c, l)
        if eb:
            bw.write(ev, eb)
    return _canonical_codes(lengths)


def _cache_idx(px: int, cache_bits: int) -> int:
    return (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)


# plane-code lookup for the distances the fixture matcher uses
_PLANE_INDEX = {dxdy: i + 1 for i, dxdy in enumerate(_PLANE_CODES)}


def _tokenize(
    pixels: list[int], xsize: int, *, cache_bits: int, lz77: bool
) -> list[tuple]:
    """Greedy tokens over the coded image: backward-reference runs at
    distances 1 / xsize / xsize+1 (emitted as 2D plane codes when the
    offset maps, exercising the distance table), color-cache hits, else
    literals. Mirrors the decoder's cache update rule exactly: every
    written pixel inserts."""
    toks: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    npix = len(pixels)
    i = 0
    while i < npix:
        if lz77 and i > 0:
            best_len = 0
            best_dist = 0
            for dist in (1, xsize, xsize + 1):
                if dist > i:
                    continue
                ln = 0
                while i + ln < npix and ln < 4096 and pixels[i + ln] == pixels[i + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                if best_dist == 1:
                    dcode = _PLANE_INDEX[(1, 0)]
                elif best_dist == xsize:
                    dcode = _PLANE_INDEX[(0, 1)]
                elif best_dist == xsize + 1 and xsize >= 2:
                    # (1, 1) maps to 1 + xsize only when dx=1 is in range
                    dcode = _PLANE_INDEX[(1, 1)]
                else:
                    dcode = best_dist + 120
                toks.append(("copy", best_len, dcode))
                if cache is not None:
                    for k in range(best_len):
                        px = pixels[i + k]
                        cache[_cache_idx(px, cache_bits)] = px
                i += best_len
                continue
        px = pixels[i]
        if cache is not None and cache[_cache_idx(px, cache_bits)] == px:
            toks.append(("cache", _cache_idx(px, cache_bits)))
        else:
            a, r, g, b = _chans(px)
            toks.append(("lit", a, r, g, b))
        if cache is not None:
            cache[_cache_idx(px, cache_bits)] = px
        i += 1
    return toks


def _encode_entropy_image(
    bw: _BitWriter,
    pixels: list[int],
    xsize: int,
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    level0: bool = False,
    meta: tuple | None = None,
) -> None:
    """Write color-cache flag, the meta-prefix flag (level 0 only, per
    the stream grammar — sub-images have no such bit), the prefix code
    group(s), and the token stream. `meta` is (meta_bits, tile_map,
    n_groups) with tile_map the per-tile group index list."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    tile_map = None
    meta_bits = 0
    if level0:
        if meta is not None:
            meta_bits, tile_map, n_groups = meta
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
            # the entropy image: group index lives in (red<<8 | green)
            epix = [_argb(255, (g >> 8) & 255, g & 255, 0) for g in tile_map]
            _encode_entropy_image(bw, epix, mw)
        else:
            bw.write(0, 1)
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    toks = _tokenize(pixels, xsize, cache_bits=cache_bits, lz77=lz77)
    # assign each token to its prefix group by the position of the pixel
    # it starts at
    assign: list[int] = []
    if tile_map is not None:
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        pos = 0
        for t in toks:
            x, y = pos % xsize, pos // xsize
            assign.append(tile_map[(y >> meta_bits) * mw + (x >> meta_bits)])
            pos += t[1] if t[0] == "copy" else 1
    else:
        assign = [0] * len(toks)
    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(n_groups)
    ]
    for gi, t in zip(assign, toks):
        f = freqs[gi]
        if t[0] == "lit":
            _, a, r, g, b = t
            f["g"][g] = f["g"].get(g, 0) + 1
            f["r"][r] = f["r"].get(r, 0) + 1
            f["b"][b] = f["b"].get(b, 0) + 1
            f["a"][a] = f["a"].get(a, 0) + 1
        elif t[0] == "copy":
            _, ln, dcode = t
            lc, _, _ = _prefix_encode_value(ln)
            dc, _, _ = _prefix_encode_value(dcode)
            f["g"][256 + lc] = f["g"].get(256 + lc, 0) + 1
            f["d"][dc] = f["d"].get(dc, 0) + 1
        else:
            f["g"][280 + t[1]] = f["g"].get(280 + t[1], 0) + 1
    codes = []
    for gi in range(n_groups):
        f = freqs[gi]
        group = {}
        for key, alphabet in (
            ("g", green_alpha), ("r", 256), ("b", 256), ("a", 256), ("d", 40)
        ):
            hist = f[key] or {0: 1}  # unused code: write a trivial one
            group[key] = _write_prefix_code(
                bw, _build_lengths(hist, alphabet)
            )
        codes.append(group)
    for gi, t in zip(assign, toks):
        group = codes[gi]
        if t[0] == "lit":
            _, a, r, g, b = t
            _write_code(bw, *group["g"][g])
            _write_code(bw, *group["r"][r])
            _write_code(bw, *group["b"][b])
            _write_code(bw, *group["a"][a])
        elif t[0] == "copy":
            _, ln, dcode = t
            lc, leb, lev = _prefix_encode_value(ln)
            _write_code(bw, *group["g"][256 + lc])
            bw.write(lev, leb)
            dc, deb, dev = _prefix_encode_value(dcode)
            _write_code(bw, *group["d"][dc])
            bw.write(dev, deb)
        else:
            _write_code(bw, *group["g"][280 + t[1]])


def _encode_vp8l_payload(
    w: int,
    h: int,
    pixels: list[int],
    *,
    subtract_green: bool = False,
    predictor: int | None = None,
    cross_color: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int | None = None,
) -> bytes:
    """VP8L chunk payload (signature byte + bitstream) for ARGB pixels.
    Transforms are applied in stream order (the decoder inverse-applies
    in reverse): subtract-green, then one whole-image-tile predictor
    mode or cross-color element; or a palette (alone, like real
    encoders). `meta_bits` splits the image into 2^bits tiles with one
    prefix-code group per tile ROW (exercising meta prefix codes)."""
    if len(pixels) != w * h:
        raise ValueError("pixel count does not match dimensions")
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    if palette and (subtract_green or predictor is not None or cross_color is not None):
        raise ValueError("palette fixtures do not combine with spatial transforms")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(any((p >> 24) & 255 != 255 for p in pixels)), 1)
    bw.write(0, 3)  # version
    coded = list(pixels)
    xsize = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        coded = [
            _argb(a, (r - g) & 255, g, (b - g) & 255)
            for a, r, g, b in map(_chans, coded)
        ]
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode out of range")
        bits = max(2, (max(w, h) - 1).bit_length())
        if bits > 9:
            raise ValueError("image too large for a one-tile predictor fixture")
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        _encode_entropy_image(
            bw, [_argb(255, 0, predictor, 0)], 1
        )
        resid = []
        for i, p in enumerate(coded):
            x, y = i % w, i // w
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = coded[i - 1]
            elif x == 0:
                pred = coded[i - w]
            else:
                pred = _predict(
                    predictor, coded[i - 1], coded[i - w],
                    coded[i - w - 1], coded[i - w + 1],
                )
            resid.append(_sub_px(p, pred))
        coded = resid
    if cross_color is not None:
        g2r, g2b, r2b = cross_color
        bits = max(2, (max(w, h) - 1).bit_length())
        if bits > 9:
            raise ValueError("image too large for a one-tile color fixture")
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        _encode_entropy_image(
            bw, [_argb(255, r2b & 255, g2b & 255, g2r & 255)], 1
        )
        out = []
        for p in coded:
            a, r, g, b = _chans(p)
            sr = (r - _ct_delta(g2r & 255, g)) & 255
            sb = (b - _ct_delta(g2b & 255, g) - _ct_delta(r2b & 255, r)) & 255
            out.append(_argb(a, sr, g, sb))
        coded = out
    if palette:
        order: list[int] = []
        index: dict[int, int] = {}
        for p in coded:
            if p not in index:
                index[p] = len(order)
                order.append(p)
        if len(order) > 256:
            raise ValueError("more than 256 colors for a palette fixture")
        psize = len(order)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(psize - 1, 8)
        deltas = [order[0]] + [
            _sub_px(order[i], order[i - 1]) for i in range(1, psize)
        ]
        _encode_entropy_image(bw, deltas, psize)
        if psize <= 2:
            wb = 3
        elif psize <= 4:
            wb = 2
        elif psize <= 16:
            wb = 1
        else:
            wb = 0
        if wb:
            ppb = 1 << wb
            bitsz = 8 >> wb
            packed_w = (w + ppb - 1) >> wb
            packed = []
            for y in range(h):
                for px_ in range(packed_w):
                    byte = 0
                    for k in range(ppb):
                        x = (px_ << wb) + k
                        if x < w:
                            byte |= index[coded[y * w + x]] << (k * bitsz)
                    packed.append(_argb(255, 0, byte, 0))
            coded = packed
            xsize = packed_w
        else:
            coded = [_argb(255, 0, index[p], 0) for p in coded]
    bw.write(0, 1)  # end of the transform list
    meta = None
    if meta_bits is not None:
        if palette:
            raise ValueError("meta fixture does not combine with palette")
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        # one prefix group per tile row: distinct histograms per band
        tile_map = [ty % max(mh, 1) for ty in range(mh) for _ in range(mw)]
        meta = (meta_bits, tile_map, max(tile_map) + 1)
    _encode_entropy_image(
        bw, coded, xsize, cache_bits=cache_bits, lz77=lz77,
        level0=True, meta=meta,
    )
    return b"\x2f" + bw.bytes()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks


def encode_webp(w: int, h: int, pixels: list[int], **kw) -> bytes:
    """Encode ARGB pixels as a real (static) lossless WebP file. See
    `_encode_vp8l_payload` for the transform/entropy options."""
    return _riff(_chunk(b"VP8L", _encode_vp8l_payload(w, h, pixels, **kw)))


# --------------------------------------------------------------------------
# fixtures + the distributed decode stage


def make_webp(media_id: int, w: int, h: int) -> bytes:
    """Deterministic lossless-WebP fixture over the shared pixel formula
    (media_id*31 + y*7 + x*3 + c*11) % 256: the transform/entropy
    variant cycles by media_id — plain literals, subtract-green, each
    spatial predictor in turn, cross-color, LZ77 + color cache, and
    meta prefix codes — so every decoder path carries formula pixels."""
    px = [
        _argb(
            255,
            (media_id * 31 + y * 7 + x * 3) % 256,
            (media_id * 31 + y * 7 + x * 3 + 11) % 256,
            (media_id * 31 + y * 7 + x * 3 + 22) % 256,
        )
        for y in range(h)
        for x in range(w)
    ]
    variant = media_id % 6
    if variant == 0:
        return encode_webp(w, h, px)
    if variant == 1:
        return encode_webp(w, h, px, subtract_green=True)
    if variant == 2:
        return encode_webp(w, h, px, predictor=1 + media_id % 13)
    if variant == 3:
        return encode_webp(
            w, h, px,
            cross_color=(media_id % 256, (media_id * 3) % 256, (media_id * 7) % 256),
        )
    if variant == 4:
        return encode_webp(
            w, h, px, lz77=True, cache_bits=1 + media_id % 6,
            subtract_green=True,
        )
    return encode_webp(w, h, px, meta_bits=2, cache_bits=3)


def make_webp_palette(media_id: int, w: int, h: int, ncolors: int) -> bytes:
    """Palette-transform fixture: ncolors formula colors, index
    (x*3 + y) % ncolors — <=16 colors exercises sub-byte bundling at
    every width (8/4/2 pixels per byte), more the plain index path."""
    pal = [
        _argb(
            255,
            (j * 37 + media_id) % 256,
            (j * 11) % 256,
            (j * 5 + 3) % 256,
        )
        for j in range(ncolors)
    ]
    px = [pal[(x * 3 + y) % ncolors] for y in range(h) for x in range(w)]
    return encode_webp(w, h, px, palette=True)


_WEBP_SCHEMA = (
    "media_id long, width int, height int, r_sum long, g_sum long,"
    " b_sum long, px_sum long, top_left_r int"
)


def webp_features(df: DataFrame) -> DataFrame:
    """Distributed lossless-WebP decode (Arrow mapInPandas, map-only):
    per-channel sums + the top-left red byte — the same integer feature
    fold the other image codecs hash-verify with."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_webp(bytes(blob))
                r_sum = g_sum = b_sum = 0
                for p in px:
                    r_sum += (p >> 16) & 255
                    g_sum += (p >> 8) & 255
                    b_sum += p & 255
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "r_sum": r_sum,
                        "g_sum": g_sum,
                        "b_sum": b_sum,
                        "px_sum": r_sum + g_sum + b_sum,
                        "top_left_r": (px[0] >> 16) & 255 if px else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "r_sum", "g_sum",
                    "b_sum", "px_sum", "top_left_r",
                ],
            ).astype({"width": "int32", "height": "int32", "top_left_r": "int32"})

    return df.select("media_id", "payload").mapInPandas(run, _WEBP_SCHEMA)


# --------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF with lossless frames): the sticker /
# short-loop shape of the modern web, composited exactly like the
# animated-GIF path


def encode_webp_anim(
    cw: int,
    ch: int,
    frames: list[dict],
    *,
    bg_argb: int = 0,
    loop: int = 0,
) -> bytes:
    """Encode an animated lossless WebP: VP8X (animation flag, canvas
    dims), ANIM (background color in the container's BGRA byte order,
    loop count), then one ANMF per frame — frame offsets are stored
    HALVED (the container stores x/2, y/2, so offsets must be even),
    each carrying a VP8L subchunk. Frame dicts: x, y, w, h, pixels,
    dur_ms, blend ("alpha" or "none"), dispose (bool), plus optional
    VP8L encoder kwargs under "vp8l"."""
    if not (1 <= cw <= 1 << 24 and 1 <= ch <= 1 << 24):
        raise ValueError("canvas dimensions out of VP8X range")
    body = _chunk(
        b"VP8X",
        bytes([0x02]) + b"\x00\x00\x00"
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little"),
    )
    a, r, g, b = _chans(bg_argb)
    body += _chunk(
        b"ANIM", bytes([b, g, r, a]) + loop.to_bytes(2, "little")
    )
    for f in frames:
        if f["x"] % 2 or f["y"] % 2:
            raise ValueError("ANMF frame offsets must be even (stored /2)")
        if f["x"] + f["w"] > cw or f["y"] + f["h"] > ch:
            raise ValueError("frame rect outside the canvas")
        flags = (0 if f.get("blend", "alpha") == "alpha" else 2) | (
            1 if f.get("dispose") else 0
        )
        payload = (
            (f["x"] // 2).to_bytes(3, "little")
            + (f["y"] // 2).to_bytes(3, "little")
            + (f["w"] - 1).to_bytes(3, "little")
            + (f["h"] - 1).to_bytes(3, "little")
            + int(f.get("dur_ms", 40)).to_bytes(3, "little")
            + bytes([flags])
            + _chunk(
                b"VP8L",
                _encode_vp8l_payload(
                    f["w"], f["h"], f["pixels"], **f.get("vp8l", {})
                ),
            )
        )
        body += _chunk(b"ANMF", payload)
    return _riff(body)


def decode_webp_frames(blob: bytes) -> tuple[int, int, list[dict]]:
    """Decode an animated lossless WebP into COMPOSITED canvases:
    (canvas_w, canvas_h, [ {dur_ms, canvas} ]) with one full-canvas ARGB
    pixel list per displayed frame. The canvas starts transparent black;
    "alpha" blending supports per-pixel alpha 0 (keep canvas) and 255
    (replace) and REFUSES fractional alpha — the spec's blend formula is
    real-valued and implementations round differently, so guessing would
    silently diverge from every real decoder; "none" blending copies the
    rect including alpha. Disposal fills the frame rect with the ANIM
    background color AFTER the frame displays (the container-spec rule).
    Lossy VP8 frames raise."""
    if len(blob) < 20 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    if blob[12:16] != b"VP8X":
        raise ValueError("not an extended WebP (no VP8X chunk)")
    pos = 12
    vp8x = None
    bg = 0
    frames_out: list[dict] = []
    canvas: list[int] | None = None
    cw = ch = 0
    end = 8 + int.from_bytes(blob[4:8], "little")
    if end > len(blob):
        raise ValueError("RIFF size past end of file")
    while pos + 8 <= end:
        fourcc = blob[pos : pos + 4]
        clen = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        payload = blob[pos + 8 : pos + 8 + clen]
        if len(payload) != clen:
            raise ValueError(f"{fourcc!r} chunk truncated")
        pos += 8 + clen + (clen & 1)
        if fourcc == b"VP8X":
            if clen != 10:
                raise ValueError("VP8X payload must be 10 bytes")
            vp8x = payload
            if not payload[0] & 0x02:
                raise NotImplementedError(
                    "VP8X without the animation flag (static alpha/EXIF/ICC)"
                    " not supported"
                )
            cw = int.from_bytes(payload[4:7], "little") + 1
            ch = int.from_bytes(payload[7:10], "little") + 1
            # cap before the canvas allocation (r12 bomb sweep: VP8X
            # dims are 24-bit, so a declared canvas can reach 2^48 px)
            from query_engine_spark.llmdata.bounds import check_dims

            check_dims(cw, ch, "VP8X canvas")
            canvas = [0] * (cw * ch)
        elif fourcc == b"ANIM":
            if len(payload) < 6:
                raise ValueError("ANIM payload too short")
            b_, g_, r_, a_ = payload[0], payload[1], payload[2], payload[3]
            bg = _argb(a_, r_, g_, b_)
        elif fourcc == b"ANMF":
            if vp8x is None or canvas is None:
                raise ValueError("ANMF before VP8X")
            if len(payload) < 16:
                raise ValueError("ANMF header truncated")
            fx = int.from_bytes(payload[0:3], "little") * 2
            fy = int.from_bytes(payload[3:6], "little") * 2
            fw = int.from_bytes(payload[6:9], "little") + 1
            fh = int.from_bytes(payload[9:12], "little") + 1
            dur = int.from_bytes(payload[12:15], "little")
            flags = payload[15]
            if fx + fw > cw or fy + fh > ch:
                raise ValueError("frame rect outside the canvas")
            sub_cc = payload[16:20]
            sub_len = int.from_bytes(payload[20:24], "little")
            sub = payload[24 : 24 + sub_len]
            if sub_cc == b"VP8 ":
                raise NotImplementedError("lossy VP8 animation frames not supported")
            if sub_cc == b"ALPH":
                raise NotImplementedError("ALPH (lossy alpha) frames not supported")
            if sub_cc != b"VP8L":
                raise ValueError(f"unexpected ANMF subchunk {sub_cc!r}")
            if len(sub) != sub_len:
                raise ValueError("ANMF frame data truncated")
            dw, dh, px = _decode_vp8l_payload(sub)
            if (dw, dh) != (fw, fh):
                raise ValueError("ANMF header dims disagree with the VP8L frame")
            blend_none = bool(flags & 2)
            for yy in range(fh):
                row = (fy + yy) * cw + fx
                for xx in range(fw):
                    p = px[yy * fw + xx]
                    if blend_none:
                        canvas[row + xx] = p
                    else:
                        alpha = (p >> 24) & 255
                        if alpha == 255:
                            canvas[row + xx] = p
                        elif alpha != 0:
                            raise NotImplementedError(
                                "fractional-alpha blending is rounding-"
                                "implementation-defined; only 0/255 supported"
                            )
            frames_out.append({"dur_ms": dur, "canvas": list(canvas)})
            if flags & 1:  # dispose to background AFTER display
                for yy in range(fh):
                    row = (fy + yy) * cw + fx
                    for xx in range(fw):
                        canvas[row + xx] = bg
        elif fourcc in (b"EXIF", b"XMP ", b"ICCP"):
            raise NotImplementedError(f"VP8X metadata chunk {fourcc!r} not supported")
        else:
            raise ValueError(f"unknown WebP chunk {fourcc!r}")
    if vp8x is None:
        raise ValueError("missing VP8X chunk")
    if not frames_out:
        raise ValueError("animated WebP with no ANMF frames")
    return cw, ch, frames_out


def make_webp_animated(media_id: int) -> bytes:
    """Deterministic animated-WebP fixture over the GIF-compositing
    event model: frame 0 is a full-canvas opaque no-blend base; frames
    1..3 are half-size alpha-blended rects at even offsets whose pixels
    go TRANSPARENT on the (x+y+f) % 5 == 0 schedule (canvas must show
    through), and even frames >= 2 dispose their rect to the opaque ANIM
    background afterwards. Entropy variants cycle per frame."""
    cw, ch = 14 + media_id % 4, 10 + media_id % 3
    bg = _argb(255, 9, 13, 17)
    frames = []
    for f in range(4):
        if f == 0:
            fx = fy = 0
            fw, fh = cw, ch
        else:
            fw, fh = cw // 2, ch // 2
            fx = 2 * (f % ((cw - fw) // 2 + 1))
            fy = 2 * (f % ((ch - fh) // 2 + 1))
        px = []
        for yy in range(fh):
            for xx in range(fw):
                gx, gy = fx + xx, fy + yy
                if f > 0 and (gx + gy + f) % 5 == 0:
                    px.append(0)  # transparent: canvas shows through
                else:
                    base = media_id * 31 + f * 97 + gy * 7 + gx * 3
                    px.append(
                        _argb(255, base % 256, (base + 11) % 256, (base + 22) % 256)
                    )
        variants = [
            {},
            {"subtract_green": True},
            {"predictor": 2},
            {"lz77": True, "cache_bits": 3},
        ]
        frames.append(
            {
                "x": fx, "y": fy, "w": fw, "h": fh, "pixels": px,
                "dur_ms": 40 + 10 * f,
                "blend": "none" if f == 0 else "alpha",
                "dispose": f >= 2 and f % 2 == 0,
                "vp8l": variants[(media_id + f) % 4],
            }
        )
    return encode_webp_anim(cw, ch, frames, bg_argb=bg, loop=media_id % 3)


_WEBP_ANIM_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, dur_ms int,"
    " r_sum long, g_sum long, b_sum long, a_sum long"
)


def webp_anim_features(df: DataFrame) -> DataFrame:
    """Distributed animated-WebP decode+composite (Arrow mapInPandas,
    map-only): one row per DISPLAYED frame with full-canvas channel sums
    — a wrong overlay, a transparent hole filled, or a disposal leak
    shifts the sums and fails the hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                cw, ch, frames = decode_webp_frames(bytes(blob))
                for fi, fr in enumerate(frames):
                    r_sum = g_sum = b_sum = a_sum = 0
                    for p in fr["canvas"]:
                        a_sum += (p >> 24) & 255
                        r_sum += (p >> 16) & 255
                        g_sum += (p >> 8) & 255
                        b_sum += p & 255
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": fi,
                            "width": cw, "height": ch,
                            "dur_ms": fr["dur_ms"],
                            "r_sum": r_sum, "g_sum": g_sum,
                            "b_sum": b_sum, "a_sum": a_sum,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "dur_ms",
                    "r_sum", "g_sum", "b_sum", "a_sum",
                ],
            ).astype(
                {
                    "frame_idx": "int32", "width": "int32",
                    "height": "int32", "dur_ms": "int32",
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, _WEBP_ANIM_SCHEMA)


# --------------------------------------------------------------------------
# VP8 lossy WebP: the HEADER layer (RFC 6386 §9.1), parsed for crawl
# metadata at scan speed. Pixel decode of lossy VP8 remains an honest
# boundary in THIS build for a specific, documented reason: the bitstream
# is undecodable without RFC 6386's literal probability tables — the
# 4x8x3x11 default coefficient probabilities (§13.5), the equally-sized
# coefficient-update probabilities (§13.4), and the 10x10x9 keyframe
# B-mode probabilities (§11.4) — ~3000 constants that exist only as
# published tables and cannot be transcribed in this offline environment
# (any invented values would bool-decode real files into garbage rather
# than failing). The structural layer BEFORE the entropy-coded data is
# fully public arithmetic and is implemented for real: the 3-byte frame
# tag (frame type / version / show_frame / 19-bit first-partition size),
# the 0x9D012A keyframe start code, and the 14-bit width/height with
# their 2-bit upscaling codes — enough for the dimension/type statistics
# a crawl curation pass wants without decoding anything.


def parse_vp8_meta(payload: bytes) -> dict:
    """Parse the uncompressed header of a VP8 (lossy) keyframe payload:
    frame tag + start code + dimensions per RFC 6386 §9.1. Interframes
    (frame type 1) are rejected — a standalone 'VP8 ' chunk must hold a
    keyframe. The first-partition size is bounds-checked against the
    chunk so a truncated stream raises instead of reporting metadata
    from garbage."""
    if len(payload) < 10:
        raise ValueError("VP8 payload shorter than the keyframe header")
    tag = int.from_bytes(payload[0:3], "little")
    frame_type = tag & 1
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    part0_size = tag >> 5
    if frame_type != 0:
        raise ValueError("standalone VP8 chunk holds an interframe")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    hor = int.from_bytes(payload[6:8], "little")
    ver = int.from_bytes(payload[8:10], "little")
    if 10 + part0_size > len(payload):
        raise ValueError("VP8 first partition runs past the chunk")
    return {
        "version": version,
        "show_frame": show_frame,
        "part0_size": part0_size,
        "width": hor & 0x3FFF,
        "xscale": hor >> 14,
        "height": ver & 0x3FFF,
        "yscale": ver >> 14,
    }


def make_webp_lossy(media_id: int, w: int, h: int) -> bytes:
    """Deterministic lossy-WebP fixture: a spec-layout VP8 keyframe
    HEADER (frame tag, start code, dimensions) followed by a deterministic
    filler first partition — the entropy-coded partitions are opaque to
    this build (see the module boundary note), so the fixture carries
    unparsed filler where a real encoder would put bool-coded data. The
    header fields are real and formula-known; decode_webp refuses the
    payload with the table-boundary message."""
    version = media_id % 4
    part0 = bytes((media_id * 7 + k) % 251 for k in range(11 + media_id % 5))
    tag = (len(part0) << 5) | (1 << 4) | (version << 1) | 0
    hdr = (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + (((media_id % 4) << 14) | w).to_bytes(2, "little")
        + (((media_id % 3) << 14) | h).to_bytes(2, "little")
    )
    return _riff(_chunk(b"VP8 ", hdr + part0))


def webp_meta(blob: bytes) -> dict:
    """Container-level WebP metadata WITHOUT pixel decode — the triage
    statistics (kind, dimensions, frame count) a 100 TB crawl pass
    computes at scan speed: 'VP8 ' keyframe headers (real RFC 6386 §9.1
    arithmetic), 'VP8L' 14-bit header dims, and 'VP8X' canvas dims
    (24-bit minus-one fields) with the ANMF frame count. Returns
    kind/width/height/n_frames/lossy_version (-1 for non-lossy)."""
    if len(blob) < 20 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    riff_end = 8 + int.from_bytes(blob[4:8], "little")
    if riff_end > len(blob):
        # a partially-downloaded crawl file: the census must refuse, not
        # undercount (same contract as decode_webp/decode_webp_frames)
        raise ValueError("RIFF size past end of file")
    fourcc = blob[12:16]
    size = int.from_bytes(blob[16:20], "little")
    payload = blob[20 : 20 + size]
    if len(payload) != size:
        raise ValueError(f"{fourcc!r} chunk truncated")
    if fourcc == b"VP8 ":
        m = parse_vp8_meta(payload)
        return {
            "kind": "vp8",
            "width": m["width"],
            "height": m["height"],
            "n_frames": 1,
            "lossy_version": m["version"],
        }
    if fourcc == b"VP8L":
        if not payload or payload[0] != 0x2F:
            raise ValueError("bad VP8L signature byte")
        br = _BitReader(payload[1:])
        return {
            "kind": "vp8l",
            "width": br.read(14) + 1,
            "height": br.read(14) + 1,
            "n_frames": 1,
            "lossy_version": -1,
        }
    if fourcc == b"VP8X":
        if size != 10:
            raise ValueError("VP8X chunk must be 10 bytes")
        cw = int.from_bytes(payload[4:7], "little") + 1
        ch = int.from_bytes(payload[7:10], "little") + 1
        n_frames = 0
        pos = 20 + size + (size & 1)
        # bound the walk by the RIFF-declared payload end, not by
        # len(blob): crawl files routinely carry trailing padding past
        # the RIFF payload (decode_webp_frames uses the same bound; a
        # SHORT file already refused above, so riff_end <= len(blob))
        while pos + 8 <= riff_end:
            cc = blob[pos : pos + 4]
            clen = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            if pos + 8 + clen > riff_end:
                raise ValueError(f"{cc!r} chunk truncated")
            if cc == b"ANMF":
                n_frames += 1
            pos += 8 + clen + (clen & 1)
        return {
            "kind": "vp8x",
            "width": cw,
            "height": ch,
            "n_frames": n_frames,
            "lossy_version": -1,
        }
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


_WEBP_META_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int,"
    " lossy_version int"
)


def webp_meta_features(df: DataFrame) -> DataFrame:
    """Distributed WebP metadata triage (Arrow mapInPandas, map-only):
    one row per file with kind/dims/frame-count — the scan-speed census
    over a mixed lossy/lossless/animated crawl corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                m = webp_meta(bytes(blob))
                rows.append({"media_id": mid, **m})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "n_frames",
                    "lossy_version",
                ],
            ).astype(
                {
                    "width": "int32", "height": "int32",
                    "n_frames": "int32", "lossy_version": "int32",
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, _WEBP_META_SCHEMA)
