"""PDF text extraction (llmdata/pdftext.py): a golden stream assembled
INDEPENDENTLY of the co-developed build_pdf (different object layout,
different operators — the quote operator and T*, an uncompressed stream,
an object emitted out of numeric order so xref offsets really drive the
fetch), literal-string escape-grammar edges, boundaries, and mutation
fuzz."""

from __future__ import annotations

import os
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.llmdata import pdftext as P


def _assemble_golden() -> bytes:
    """Hand-assemble a PDF with its own layout: objects written 4,1,2,3
    (xref must be consulted, a linear walk gives the wrong answer), an
    UNcompressed content stream using Tj, the quote operator ' and T*,
    octal and nested-paren escapes."""
    content = (
        b"BT /F1 10 Tf 10 700 Td"
        b" (Hi (nested) \\164ext) Tj"       # octal \164 = 't'
        b" T* (second line) '"
        b" ET"
    )
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"
        ),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in (4, 1, 2, 3):  # deliberately out of order
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + bodies[num] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in (1, 2, 3, 4):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
        + str(xref_off).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def test_pdf_golden_hand_assembled_stream():
    texts = P.extract_pdf_text(_assemble_golden())
    assert texts == ["Hi (nested) text\nsecond line"]


def _assemble_golden_15_incremental() -> bytes:
    """Hand-assemble a PDF 1.5 INCREMENTAL UPDATE independent of
    build_pdf_15: a classic-xref base whose content object is then
    REPLACED by an appended section indexed by an UNCOMPRESSED xref
    stream with /W [1 2 1] (different widths than the writer's), a
    partial /Index [4 2], and /Prev pointing at the classic table. A
    reader that ignores shadowing, /Prev, or xref streams extracts the
    wrong text."""
    old = b"BT (old text MUST NOT survive) Tj ET"
    new = b"BT (new text) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< /Length " + str(len(old)).encode() + b" >>\nstream\n"
            + old + b"\nendstream"),
    }
    for num in (1, 2, 3, 4):
        offs[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + bodies[num] + b"\nendobj\n"
    x0 = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in (1, 2, 3, 4):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
            + str(x0).encode() + b"\n%%EOF\n")
    # ---- appended update: replacement content + xref stream ----
    off4b = len(out)
    out += (b"4 0 obj\n<< /Length " + str(len(new)).encode()
            + b" >>\nstream\n" + new + b"\nendstream\nendobj\n")
    x1 = len(out)
    # /W [1 2 1]: entries for objects 4 and 5 only (see /Index)
    entries = (
        b"\x01" + off4b.to_bytes(2, "big") + b"\x00"
        + b"\x01" + x1.to_bytes(2, "big") + b"\x00"
    )
    out += (
        b"5 0 obj\n<< /Type /XRef /Size 6 /Root 1 0 R /W [1 2 1]"
        b" /Index [ 4 2 ] /Prev " + str(x0).encode()
        + b" /Length " + str(len(entries)).encode() + b" >>\nstream\n"
        + entries + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(x1).encode() + b"\n%%EOF\n"
    return bytes(out)


def test_pdf_golden_xref_stream_incremental_update():
    texts = P.extract_pdf_text(_assemble_golden_15_incremental())
    assert texts == ["new text"]


def _assemble_golden_15_objstm() -> bytes:
    """Hand-assemble a PDF 1.5 with an UNCOMPRESSED object stream whose
    members are stored out of numeric order (page, catalog, pages — only
    the header pair table gives correct offsets) and a predictor-coded
    xref stream whose Up filter is applied by LOCAL arithmetic here, not
    by the library's encoder."""
    content = b"BT (via objstm) Tj T* (line two) ' ET"
    out = bytearray(b"%PDF-1.5\n")
    off4 = len(out)
    out += (b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    members = [
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"),
    ]
    header = bytearray()
    body = bytearray()
    for onum, ob in members:
        header += str(onum).encode() + b" " + str(len(body)).encode() + b" "
        body += ob + b" "
    stm = bytes(header) + bytes(body)
    off5 = len(out)
    out += (b"5 0 obj\n<< /Type /ObjStm /N 3 /First " + str(len(header)).encode()
            + b" /Length " + str(len(stm)).encode() + b" >>\nstream\n"
            + stm + b"\nendstream\nendobj\n")
    x = len(out)
    # /W [1 2 1], columns = 4; rows for objects 0..6, Up-filtered by
    # local arithmetic (restating the predictor semantics independently)
    member_idx = {3: 0, 1: 1, 2: 2}
    rows = [bytes([0, 0, 0, 255])]  # obj 0: free
    for num in (1, 2, 3):
        rows.append(bytes([2, 0, 5, member_idx[num]]))
    rows.append(bytes([1]) + off4.to_bytes(2, "big") + b"\x00")  # 4
    rows.append(bytes([1]) + off5.to_bytes(2, "big") + b"\x00")  # 5
    rows.append(bytes([1]) + x.to_bytes(2, "big") + b"\x00")     # 6
    filtered = bytearray()
    prev = bytes(4)
    for row in rows:
        filtered.append(2)  # Up
        filtered += bytes((c - p) & 0xFF for c, p in zip(row, prev))
        prev = row
    data = zlib.compress(bytes(filtered), 9)
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [1 2 1]"
        b" /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns 4 >>"
        b" /Length " + str(len(data)).encode() + b" >>\nstream\n"
        + data + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(x).encode() + b"\n%%EOF\n"
    return bytes(out)


def test_pdf_golden_objstm_predictor_stream():
    texts = P.extract_pdf_text(_assemble_golden_15_objstm())
    assert texts == ["via objstm\nline two"]


def test_pdf_15_writer_is_transport():
    """build_pdf_15 output (objstm + xref stream, either predictor mode)
    extracts IDENTICAL text to build_pdf for the same pages — the 1.5
    container is transport, not semantics."""
    pages = [
        ["alpha beta", "gamma (delta)", "♪ wide line"],
        ["page two"],
        ["x\\y (z)", "épée"],
    ]
    want = P.extract_pdf_text(P.build_pdf(pages))
    assert P.extract_pdf_text(P.build_pdf_15(pages, predictor=True)) == want
    assert P.extract_pdf_text(P.build_pdf_15(pages, predictor=False)) == want


def test_pdf_literal_string_escape_grammar():
    """The full §7.3.4.2 escape set on raw strings: named escapes, octal
    (1-3 digits), line continuation, lone backslash dropped-to-literal,
    balanced unescaped parens."""
    cases = [
        (rb"(a\nb)", b"a\nb"),
        (rb"(a\tb\rc\bd\fe)", b"a\tb\rc\bd\fe"),
        (rb"(oct \101\102\7!)", b"oct AB\x07!"),
        (b"(cont\\\nnext)", b"contnext"),
        (rb"(lone \q)", b"lone q"),
        (b"(bal (anced (deep)) ok)", b"bal (anced (deep)) ok"),
        (rb"(\0053)", b"\x053"),  # 2-digit octal then literal '3'
    ]
    for raw, want in cases:
        got, end = P._parse_literal_string(raw, 0)
        assert got == want and end == len(raw), raw
    with pytest.raises(ValueError, match="unterminated"):
        P._parse_literal_string(b"(never closes", 0)


def test_pdf_boundaries_refuse_loudly():
    blob = P.build_pdf([["x"]])
    enc = blob.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.extract_pdf_text(enc)
    with pytest.raises(ValueError, match="startxref"):
        P.extract_pdf_text(b"%PDF-1.4\nno tail here")
    with pytest.raises(ValueError, match="%PDF"):
        P.extract_pdf_text(b"GIF89a not a pdf")
    # startxref points at a non-/XRef object: a parse error, not a crash
    ob = blob.index(b"1 0 obj")
    tampered = blob[: blob.rindex(b"startxref")] + (
        b"startxref\n" + str(ob).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="/XRef"):
        P.extract_pdf_text(tampered)
    # hybrid-reference files refuse loudly
    hybrid = blob.replace(b"/Size", b"/XRefStm 99 /Size")
    with pytest.raises(NotImplementedError, match="hybrid"):
        P.extract_pdf_text(hybrid)
    # 1.5 boundaries: /Extends objstm chains and xref-dict /Encrypt
    import re as _re

    blob15 = P.build_pdf_15([["x"]])
    ins = b" /Extends 9 0 R"
    ext = blob15.replace(b"/Type /ObjStm", b"/Type /ObjStm" + ins)
    # the insertion sits inside the objstm body, shifting the xref
    # stream that follows it: repoint startxref by the inserted length
    old_sx = int(_re.search(rb"startxref\s+(\d+)", blob15[-64:]).group(1))
    ext = ext.replace(
        b"startxref\n" + str(old_sx).encode(),
        b"startxref\n" + str(old_sx + len(ins)).encode(),
    )
    with pytest.raises(NotImplementedError, match="Extends"):
        P.extract_pdf_text(ext)
    enc15 = blob15.replace(b"/Type /XRef", b"/Type /XRef /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.extract_pdf_text(enc15)
    # non-Flate filter refuses — equal-length name so xref offsets hold
    lzw = blob.replace(b"/FlateDecode", b"/LZWDecodeXX")
    assert b"/LZWDecodeXX" in lzw
    with pytest.raises(NotImplementedError, match="filter"):
        P.extract_pdf_text(lzw)


def test_pdf_mutation_fuzz():
    """400 mutated PDFs: the extractor must return page texts or raise a
    contract error — never hang, never crash with an unrelated type."""
    import random

    rng = random.Random(99)
    pages = [["alpha beta", "gamma (delta)", "♪ wide line"], ["page two"]]
    blobs = [
        P.build_pdf(pages, compress=True),
        P.build_pdf_15(pages, predictor=True),
        P.build_pdf_15(pages, predictor=False),
    ]
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
            out = P.extract_pdf_text(bytes(bad))
        except (ValueError, NotImplementedError):
            # the STRICT parser contract (r12: the loose allowlist that
            # also tolerated KeyError/UnicodeDecodeError/OverflowError/
            # RecursionError was stale — a 2000-case probe showed zero
            # such leaks, so pin the tight contract like WARC/TAR/ZIP)
            continue
        assert isinstance(out, list)


def test_pdf_spark_stage_map_only(spark):
    """The Spark stage is one map-only Arrow pass — zero exchanges."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"media_id": range(6)})
    )

    def pack(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        P.build_pdf([[f"doc {int(i)}"]]) for i in pdf["media_id"]
                    ],
                }
            )

    media = docs.mapInPandas(pack, "media_id long, payload binary")
    feats = P.pdf_text_features(media)
    got = {(r["media_id"], r["pages"]) for r in feats.collect()}
    assert got == {(i, 1) for i in range(6)}
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
