"""Decompression-bomb and pixel-bomb guards for the untrusted-bytes
decoders (r12 fuzz find — the class the r11 mutation fuzz missed because
it asserted exception CONTRACTS, not resource bounds).

Two attack shapes, both real at crawl scale where one adversarial payload
must not OOM an executor decoding a whole partition:

1. **Pixel bombs**: a header's declared dimensions drive a canvas
   allocation before any against-the-data validation can bound them. A
   bit-flipped BITMAPINFOHEADER measured 21.5 GB RSS in decode_avi_rle8
   (`[[0]*width for _ in range(height)]` at 46000x46000) — and RLE8/GIF
   LZW/PNG-interlace canvases cannot be bounded by input length because
   those codings legally early-terminate or expand. `check_dims` caps the
   canvas at MAX_DECODE_PIXELS; over-cap raises NotImplementedError — a
   capacity boundary ("this build doesn't decode canvases this large"),
   NOT corruption, so the dispatch census lands an honest NULL row
   (corrupt=false) exactly like the other variant boundaries.

2. **Inflate bombs**: `zlib.decompress(data)` with no max_length lets a
   small compressed input expand ~1000:1 (bzip2 up to ~10^6:1) before the
   decoder's size-equality check runs — the check validated the SIZE but
   only after the allocation already happened. `bounded_inflate` streams
   through a decompressobj with max_length so a stream that WOULD exceed
   its declared/expected size (or the absolute cap when nothing declares
   a size) fails after at most cap+1 bytes are produced. Over-expected
   raises ValueError — a stream that inflates past its own declared size
   is structurally invalid, i.e. corruption.

The caps are deliberately generous (16.7M pixels = 4096x4096; 256 MiB per
compressed stream) — far above every fixture and the realistic web-corpus
shapes, so conforming payloads never notice, while a bomb is refused at
roughly 1/100th of executor memory. Reference parity: main.rs has no codec
surface (this module guards driver-mandated LLM-pipeline scope).
"""

from __future__ import annotations

import bz2
import lzma
import zlib

# 16.7M pixels (4096x4096): the canvas-allocation cap. Decoders
# materialize int-per-pixel rows, so this bounds a single payload's
# decode at ~hundreds of MB worst case instead of "whatever 32 bits of
# declared dims say".
MAX_DECODE_PIXELS = 1 << 24

# 256 MiB: the per-stream inflate cap used when no size is declared
# (PDF content streams, whole-file tarball wrappers, WARC members).
MAX_INFLATE_BYTES = 1 << 28


def check_dims(width: int, height: int, what: str) -> None:
    """Validate header-declared canvas dimensions BEFORE any allocation
    keyed on them. Non-positive dims are corruption (ValueError); a
    larger-than-cap canvas is a capacity boundary (NotImplementedError,
    honest-NULL in the dispatch census)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid {what} dims {width}x{height}")
    if width * height > MAX_DECODE_PIXELS:
        raise NotImplementedError(
            f"{what} canvas {width}x{height} exceeds the "
            f"{MAX_DECODE_PIXELS}-pixel decode cap"
        )


def bounded_inflate(
    data: bytes,
    *,
    wbits: int = 15,
    expected: int | None = None,
    cap: int = MAX_INFLATE_BYTES,
    what: str = "stream",
) -> bytes:
    """zlib inflate that can never produce more than min(expected, cap)+1
    bytes. With `expected` (a size the container declared), producing MORE
    is itself a structural error and raises ValueError even under the cap;
    the caller still owns exact-equality and CRC checks. zlib errors
    normalize to ValueError (the parser contract rule)."""
    limit = cap if expected is None else min(expected, cap)
    d = zlib.decompressobj(wbits)
    try:
        out = d.decompress(data, limit + 1)
        # drain: with max_length, unprocessed INPUT parks in
        # unconsumed_tail — keep going until it's empty or the output
        # bound is crossed (never d.flush() while input remains: flush
        # ignores max_length and would hand the bomb straight back)
        while d.unconsumed_tail and len(out) <= limit:
            out += d.decompress(d.unconsumed_tail, limit + 1 - len(out))
        if len(out) <= limit:
            # completed (or truncated) stream: the remainder is at most
            # zlib's 32 KiB window, and the final bound check below
            # still applies to it
            out += d.flush()
    except zlib.error as e:
        raise ValueError(f"{what}: inflate failed: {e}") from e
    if len(out) > limit:
        raise ValueError(
            f"{what}: inflated output exceeds "
            + (f"declared size {expected}" if expected is not None
               and expected < cap else f"{cap}-byte decompression cap")
        )
    if not d.eof:
        # one-shot zlib.decompress raised on truncated streams; the
        # decompressobj path returns the partial output instead, and
        # call sites without a size check (PDF streams, compressed text
        # rows) would silently keep it (r12 review find) — restore the
        # fail-loud contract. Trailing bytes after stream end stay
        # tolerated, matching the one-shot semantics call sites had.
        raise ValueError(f"{what}: truncated compressed stream")
    return out


def reject_xml_dtd(data: bytes | str, what: str) -> None:
    """Refuse XML carrying a document type declaration BEFORE it reaches
    xml.etree (r12 review find: expat expands internal entities, so a
    nested billion-laughs DTD inflates to 10^10 chars in memory; stdlib
    ElementTree has no switch to forbid it). Entity declarations are only
    legal inside the DTD, so rejecting '<!DOCTYPE' closes the whole
    class. Real-corpus sitemaps/feeds/SVG/OPF essentially never carry an
    internal DTD subset — and a document that does gets an honest
    ValueError, the same contract as any other malformed input."""
    probe = data.encode("utf-8", "ignore") if isinstance(data, str) else data
    if b"<!DOCTYPE" in probe:
        raise ValueError(
            f"{what}: document type declarations are not accepted "
            "(entity-expansion guard)"
        )


def _bounded_multistream(mk_decompressor, err_types, data: bytes,
                         cap: int, what: str) -> bytes:
    """Concatenated-stream decompress under the cap — stdlib
    bz2.decompress/lzma.decompress read MULTI-stream inputs (pbzip2/
    multi-block xz are real corpus shapes), so the bounded replacements
    must too (r12 review find, fourth pass: the first single-stream
    version raised 'trailing bytes' on them). Trailing garbage that is
    not another stream raises through err_types → ValueError, exactly
    like the stdlib one-shot calls the call sites used to make."""
    out = bytearray()
    rest = data
    while True:
        d = mk_decompressor()
        try:
            out += d.decompress(rest, cap + 1 - len(out))
            while not d.eof and not d.needs_input and len(out) <= cap:
                out += d.decompress(b"", cap + 1 - len(out))
        except err_types as e:
            raise ValueError(f"{what} corrupt: {e}") from e
        if len(out) > cap:
            raise ValueError(
                f"{what}: exceeds {cap}-byte decompression cap"
            )
        if not d.eof:
            raise ValueError(f"{what} truncated")
        rest = d.unused_data
        if not rest:
            return bytes(out)


def bounded_bz2(data: bytes, *, cap: int = MAX_INFLATE_BYTES,
                what: str = "bzip2 stream") -> bytes:
    """bz2 decompress under the cap — bzip2's worst-case expansion is
    ~10^6:1 (a 46 KB bomb decompresses to 46 GB), so the whole-stream
    stdlib call is never safe on untrusted bytes."""
    return _bounded_multistream(
        bz2.BZ2Decompressor, (OSError, ValueError), data, cap, what
    )


def bounded_xz(data: bytes, *, cap: int = MAX_INFLATE_BYTES,
               what: str = "xz stream") -> bytes:
    """lzma decompress under the cap (same shape as bounded_bz2)."""
    return _bounded_multistream(
        lzma.LZMADecompressor, (lzma.LZMAError,), data, cap, what
    )
