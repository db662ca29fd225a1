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
    # xref stream (PDF 1.5): startxref points at an object, not 'xref'
    ob = blob.index(b"1 0 obj")
    tampered = blob[: blob.rindex(b"startxref")] + (
        b"startxref\n" + str(ob).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="cross-reference streams"):
        P.extract_pdf_text(tampered)
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
    blob = P.build_pdf(
        [["alpha beta", "gamma (delta)", "♪ wide line"], ["page two"]],
        compress=True,
    )
    for _ in range(400):
        bad = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        elif op == 1:
            bad = bad[: rng.randrange(len(bad))]
        else:
            bad += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        try:
            out = P.extract_pdf_text(bytes(bad))
        except (ValueError, NotImplementedError, KeyError):
            continue
        except (UnicodeDecodeError, OverflowError, MemoryError, RecursionError):
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
