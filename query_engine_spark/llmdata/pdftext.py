"""PDF text extraction: the document half of a web-scale training corpus
(papers, reports, scans-with-text-layer). A REAL minimal PDF parser over
the public PDF 1.4 specification (ISO 32000-1):

- trailer/`startxref` discovery from the file tail, classic xref TABLE
  parsing (PDF 1.5 cross-reference STREAMS and encrypted documents raise
  honest boundaries),
- indirect-object fetch by byte offset, dictionary + stream parsing,
- the Pages tree walk (/Root -> /Pages -> /Kids, nested page-tree nodes),
- per-page /Contents streams (single or array), FlateDecode via stdlib
  zlib (the only filter generated PDFs actually use for text; others
  raise),
- a content-stream tokenizer for the text-showing operators Tj, ' and
  TJ (array form with kerning numbers), decoding literal strings with
  the FULL escape grammar — balanced unescaped parens, \\n \\r \\t \\b
  \\f \\( \\) \\\\, octal \\ooo, line-continuation — hex strings
  <...>, and UTF-16BE strings (BOM FE FF).

Spark shape: extraction is one map-only Arrow `mapInPandas` pass over
opaque PDF payloads — the same single-scan plan as every other codec
stage; only the extracted text statistics leave the executor.

Semantic spec for what the engine must expose: /root/reference/src/main.rs
(the reference's ingest surface); the PDF layout from the public Adobe /
ISO 32000 specification.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# writer: deterministic single-font PDFs for fixtures


def _pdf_escape(s: str) -> bytes:
    """PDF literal-string escaping (spec §7.3.4.2): backslash, parens,
    and control chars; latin-1 code points as octal escapes."""
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if ch == "\\":
            out += b"\\\\"
        elif ch == "(":
            out += b"\\("
        elif ch == ")":
            out += b"\\)"
        elif 32 <= o < 127:
            out.append(o)
        elif o < 256:
            out += f"\\{o:03o}".encode("ascii")
        else:
            raise ValueError(
                "non-latin-1 text needs a UTF-16BE string; use hex=True"
            )
    return bytes(out)


def _pdf_utf16_hex(s: str) -> bytes:
    """UTF-16BE hex string with BOM (spec §7.9.2.2) — how generated PDFs
    carry non-latin text."""
    return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().upper().encode() + b">"


def build_pdf(pages: list[list[str]], *, compress: bool = True) -> bytes:
    """Build a real single-font PDF 1.4: catalog, pages tree, one content
    stream per page (FlateDecode when `compress`), a classic xref table
    with hand-correct byte offsets, trailer, %%EOF. Each page is a list
    of text lines; lines cycle through the three text-showing forms real
    generators emit — `(...) Tj`, a kerned `[...] TJ` array, and a
    UTF-16BE hex string — so the extractor's whole operator surface is
    exercised by every fixture."""
    objects: list[bytes] = []  # 1-indexed

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[int] = []
    content_ids: list[int] = []
    for lines in pages:
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                parts.append(b"0 -14 Td")
            if k % 3 == 0:
                parts.append(b"(" + _pdf_escape(line) + b") Tj")
            elif k % 3 == 1:
                # kerned array: split the line in two around a kern number
                mid = max(1, len(line) // 2)
                parts.append(
                    b"[ ("
                    + _pdf_escape(line[:mid])
                    + b") -120 ("
                    + _pdf_escape(line[mid:])
                    + b") ] TJ"
                )
            else:
                parts.append(_pdf_utf16_hex(line) + b" Tj")
        parts.append(b"ET")
        raw = b" ".join(parts)
        if compress:
            data = zlib.compress(raw, 6)
            stream = (
                b"<< /Length " + str(len(data)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream"
            )
        else:
            stream = (
                b"<< /Length " + str(len(raw)).encode()
                + b" >>\nstream\n" + raw + b"\nendstream"
            )
        content_ids.append(add(stream))
        page_ids.append(0)  # patched below once the pages-tree id is known
    pages_id = len(objects) + len(pages) + 1
    for i, cid in enumerate(content_ids):
        body = (
            b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R"
            b" /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >>"
            b" /Contents " + str(cid).encode() + b" 0 R >>"
        )
        page_ids[i] = add(body)
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [ " + kids + b" ] /Count "
        + str(len(page_ids)).encode() + b" >>"
    )
    assert real_pages_id == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# --------------------------------------------------------------------------
# reader


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer over a bytes window."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def skip_ws(self) -> None:
        b = self.buf
        while self.pos < len(b):
            c = b[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < len(b) and b[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def token(self) -> bytes:
        self.skip_ws()
        b, p = self.buf, self.pos
        if p >= len(b):
            raise ValueError("unexpected end of PDF object data")
        c = b[p]
        if c == ord("<") and p + 1 < len(b) and b[p + 1] == ord("<"):
            self.pos += 2
            return b"<<"
        if c == ord(">") and p + 1 < len(b) and b[p + 1] == ord(">"):
            self.pos += 2
            return b">>"
        if c in _DELIM:
            if c == ord("/"):
                q = p + 1
                while q < len(b) and b[q] not in _WS and b[q] not in _DELIM:
                    q += 1
                self.pos = q
                return b[p:q]
            self.pos += 1
            return b[p : p + 1]
        q = p
        while q < len(b) and b[q] not in _WS and b[q] not in _DELIM:
            q += 1
        self.pos = q
        return b[p:q]


def _parse_object(lx: _Lexer):
    """Parse one PDF object (dict/array/name/number/string/ref/bool)."""
    tok = lx.token()
    if tok == b"<<":
        d: dict[bytes, object] = {}
        while True:
            lx.skip_ws()
            if lx.buf[lx.pos : lx.pos + 2] == b">>":
                lx.pos += 2
                return d
            key = lx.token()
            if not key.startswith(b"/"):
                raise ValueError("dictionary key must be a name")
            d[key] = _parse_object(lx)
    if tok == b"[":
        arr: list[object] = []
        while True:
            lx.skip_ws()
            if lx.buf[lx.pos] == ord("]"):
                lx.pos += 1
                return arr
            arr.append(_parse_object(lx))
    if tok == b"(":
        lx.pos -= 1
        s, lx.pos = _parse_literal_string(lx.buf, lx.pos)
        return s
    if tok == b"<":
        end = lx.buf.index(b">", lx.pos)
        hexstr = bytes.fromhex(
            lx.buf[lx.pos : end].translate(None, _WS).decode("ascii")
        )
        lx.pos = end + 1
        return hexstr
    if tok.startswith(b"/") or tok in (b"true", b"false", b"null"):
        return tok
    # number, or an indirect reference "N G R"
    try:
        num = int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok
    save = lx.pos
    try:
        tok2 = lx.token()
        if re.fullmatch(rb"\d+", tok2):
            tok3 = lx.token()
            if tok3 == b"R":
                return ("ref", num, int(tok2))
        lx.pos = save
    except ValueError:
        lx.pos = save
    return num


def _parse_literal_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Decode a ( ... ) literal string from `pos` (at the opening paren):
    balanced unescaped parens, the full escape set, octal \\ooo,
    backslash-newline continuation. Returns (raw bytes, end position)."""
    assert buf[pos] == ord("(")
    pos += 1
    depth = 1
    out = bytearray()
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while pos < len(buf):
        c = buf[pos]
        if c == ord("\\"):
            pos += 1
            if pos >= len(buf):
                break
            c2 = buf[pos]
            if c2 in esc:
                out.append(esc[c2])
                pos += 1
            elif ord("0") <= c2 <= ord("7"):
                oct_digits = bytearray()
                while pos < len(buf) and len(oct_digits) < 3 and ord("0") <= buf[pos] <= ord("7"):
                    oct_digits.append(buf[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif c2 in b"\r\n":  # line continuation
                pos += 1
                if c2 == ord("\r") and pos < len(buf) and buf[pos] == ord("\n"):
                    pos += 1
            else:  # spec: lone backslash is dropped
                out.append(c2)
                pos += 1
            continue
        if c == ord("("):
            depth += 1
        elif c == ord(")"):
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
        out.append(c)
        pos += 1
    raise ValueError("unterminated PDF literal string")


def _pdf_text_of(raw: bytes) -> str:
    """Decode a PDF string's bytes: UTF-16BE when BOM'd, else latin-1
    (PDFDocEncoding's printable range coincides for fixture text)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be")
    return raw.decode("latin-1")


class _Pdf:
    def __init__(self, blob: bytes):
        self.buf = blob
        if not blob.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF header)")
        tail = blob[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("missing startxref")
        self.offsets = self._parse_xref(int(m.group(1)))
        lx = _Lexer(blob, blob.index(b"trailer", int(m.group(1))) + len(b"trailer"))
        self.trailer = _parse_object(lx)
        if b"/Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDFs not supported")

    def _parse_xref(self, off: int) -> dict[int, int]:
        buf = self.buf
        if buf[off : off + 4] != b"xref":
            # PDF 1.5+ cross-reference stream: an indirect object here
            raise NotImplementedError(
                "cross-reference streams (PDF 1.5+) not supported; classic xref tables only"
            )
        lx = _Lexer(buf, off + 4)
        offsets: dict[int, int] = {}
        while True:
            lx.skip_ws()
            if buf[lx.pos : lx.pos + 7] == b"trailer":
                return offsets
            first = int(lx.token())
            count = int(lx.token())
            lx.skip_ws()
            for i in range(count):
                ent = buf[lx.pos : lx.pos + 20]
                if len(ent) < 18:
                    raise ValueError("truncated xref entry")
                if ent[17:18] == b"n":
                    offsets[first + i] = int(ent[0:10])
                lx.pos += 20 if ent[18:20] in (b" \n", b" \r", b"\r\n") else 19

    def object(self, num: int):
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"object {num} not in xref")
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.buf[off : off + 64])
        if m is None or int(m.group(1)) != num:
            raise ValueError(f"xref offset for object {num} does not point at it")
        lx = _Lexer(self.buf, off + m.end())
        val = _parse_object(lx)
        lx.skip_ws()
        if self.buf[lx.pos : lx.pos + 6] == b"stream":
            p = lx.pos + 6
            if self.buf[p : p + 2] == b"\r\n":
                p += 2
            elif self.buf[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(val.get(b"/Length"))
            if not isinstance(length, (int, float)) or int(length) < 0:
                raise ValueError("stream without a numeric /Length")
            data = self.buf[p : p + int(length)]
            filt = val.get(b"/Filter")
            if filt == b"/FlateDecode":
                try:
                    data = zlib.decompress(data)
                except zlib.error as e:
                    raise ValueError(f"content stream corrupt: {e}") from e
            elif filt is not None:
                raise NotImplementedError(f"stream filter {filt!r} not supported")
            return val, data
        return val, None

    def resolve(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v, _ = self.object(v[1])
        return v


def _page_text(content: bytes) -> str:
    """Extract text-showing operator arguments from a content stream:
    `(s) Tj`, `(s) '` and `[ ... ] TJ` (string elements concatenated,
    kern numbers skipped). Text objects separated by Td/T* boundaries
    are joined with newlines."""
    lx = _Lexer(content, 0)
    lines: list[str] = []
    cur: list[str] = []
    stack: list[object] = []
    while True:
        lx.skip_ws()
        if lx.pos >= len(content):
            break
        c = content[lx.pos]
        if c == ord("("):
            s, lx.pos = _parse_literal_string(content, lx.pos)
            stack.append(s)
            continue
        if c == ord("<") and content[lx.pos : lx.pos + 2] != b"<<":
            end = content.index(b">", lx.pos)
            stack.append(
                bytes.fromhex(
                    content[lx.pos + 1 : end].translate(None, _WS).decode("ascii")
                )
            )
            lx.pos = end + 1
            continue
        if c == ord("["):
            lx.pos += 1
            arr: list[object] = []
            while True:
                lx.skip_ws()
                if content[lx.pos] == ord("]"):
                    lx.pos += 1
                    break
                if content[lx.pos] == ord("("):
                    s, lx.pos = _parse_literal_string(content, lx.pos)
                    arr.append(s)
                elif content[lx.pos] == ord("<"):
                    end = content.index(b">", lx.pos)
                    arr.append(
                        bytes.fromhex(
                            content[lx.pos + 1 : end].translate(None, _WS).decode("ascii")
                        )
                    )
                    lx.pos = end + 1
                else:
                    # kern adjustments: numeric tokens must not survive
                    # as bytes or they would concatenate into the text
                    t = lx.token()
                    if re.fullmatch(rb"[+-]?\d+(\.\d+)?", t):
                        arr.append(float(t))
                    else:
                        raise ValueError(f"unexpected TJ array element {t!r}")
            stack.append(arr)
            continue
        tok = lx.token()
        if tok in (b"Tj", b"'"):
            if not stack or not isinstance(stack[-1], bytes):
                raise ValueError(f"{tok.decode()} without a string operand")
            cur.append(_pdf_text_of(stack.pop()))
        elif tok == b"TJ":
            if not stack or not isinstance(stack[-1], list):
                raise ValueError("TJ without an array operand")
            arr = stack.pop()
            cur.append(
                "".join(_pdf_text_of(e) for e in arr if isinstance(e, bytes))
            )
        elif tok in (b"Td", b"TD", b"T*"):
            if cur:
                lines.extend(cur)
                cur = []
            stack.clear()
        else:
            stack.append(tok)
    lines.extend(cur)
    return "\n".join(lines)


def extract_pdf_text(blob: bytes) -> list[str]:
    """Parse a PDF and return per-page extracted text (one string per
    page, lines joined with newlines). Raises on encrypted documents,
    xref streams, and non-Flate filters — honest boundaries with
    specific messages; silent empty-string extraction is how corpora
    fill with blank documents. Truncated object data surfaces as
    ValueError (the parser indexes untrusted bytes; a bare IndexError
    at the API boundary would read as a bug, not a bad input)."""
    try:
        return _extract_pdf_text(blob)
    except IndexError as e:
        raise ValueError("truncated PDF object data") from e


def _extract_pdf_text(blob: bytes) -> list[str]:
    pdf = _Pdf(blob)
    if not isinstance(pdf.trailer, dict):
        raise ValueError("trailer is not a dictionary")
    root = pdf.resolve(pdf.trailer.get(b"/Root"))
    if not isinstance(root, dict):
        raise ValueError("/Root is not a dictionary")
    pages_obj = pdf.resolve(root.get(b"/Pages"))
    texts: list[str] = []

    def walk(node) -> None:
        node = pdf.resolve(node)
        if not isinstance(node, dict):
            raise ValueError("pages-tree node is not a dictionary")
        typ = node.get(b"/Type")
        if typ == b"/Pages":
            for kid in pdf.resolve(node.get(b"/Kids")):
                walk(kid)
            return
        if typ != b"/Page":
            raise ValueError(f"unexpected pages-tree node {typ!r}")
        contents = node.get(b"/Contents")
        if contents is None:
            texts.append("")
            return
        refs = contents if isinstance(contents, list) else [contents]
        data = b""
        for r in refs:
            if not (isinstance(r, tuple) and r[0] == "ref"):
                raise ValueError("/Contents must be stream references")
            _, stream = pdf.object(r[1])
            if stream is None:
                raise ValueError("/Contents reference is not a stream")
            data += stream + b"\n"
        texts.append(_page_text(data))

    walk(pages_obj)
    return texts


_PDF_SCHEMA = "media_id long, pages int, chars long, fp string"


def pdf_text_features(df: DataFrame) -> DataFrame:
    """Distributed PDF text extraction (Arrow mapInPandas, map-only):
    one row per document with page count, total extracted characters,
    and the md5 of the page texts joined by form-feed — the
    corpus-ingest fingerprint the registry oracle hash-checks."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, blob in zip(pdf_batch["media_id"], pdf_batch["payload"]):
                pages = extract_pdf_text(bytes(blob))
                joined = "\f".join(pages)
                rows.append(
                    {
                        "media_id": mid,
                        "pages": len(pages),
                        "chars": len(joined),
                        "fp": hashlib.md5(joined.encode("utf-8")).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "pages", "chars", "fp"])

    return df.select("media_id", "payload").mapInPandas(run, _PDF_SCHEMA)
