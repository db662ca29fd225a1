"""EPUB ingestion: the book half of a text corpus. An EPUB is a ZIP
(read through the verified `archives.read_zip`, CRC-checked) with a
fixed discovery chain the reader must follow — not a directory listing:

  META-INF/container.xml  →  rootfile full-path (the OPF)
  OPF <manifest>          →  id → href of every chapter document
  OPF <spine>             →  the READING ORDER as idref sequence

Chapter XHTML is well-formed XML, so text extraction is exact
(ElementTree over the body's heading/paragraph elements). The spine is
authoritative for order: archives routinely store members in arbitrary
zip order and list the manifest shuffled — a reader that walks the zip
instead of the spine emits chapters scrambled, which is why the fixture
does both on purpose.

Public layout: the IDPF/W3C EPUB OCF + OPF specifications.
"""

from __future__ import annotations

import hashlib
import posixpath
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from query_engine_spark.llmdata.archives import build_zip, read_zip

_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_XHTML_NS = "{http://www.w3.org/1999/xhtml}"


def make_epub(book_id: int, chapters: list[tuple[str, list[str]]]) -> bytes:
    """Build a real EPUB: STORED `mimetype` first (the OCF requirement),
    container.xml, an OPF whose manifest is listed in REVERSED chapter
    order while the spine carries the true reading order, and XHTML
    chapter documents stored in the zip in reversed order too — so only
    a spine-driven reader reconstructs the book."""
    n = len(chapters)
    xhtmls: list[tuple[str, bytes]] = []
    for k, (title, paras) in enumerate(chapters):
        body = "".join(f"<p>{p}</p>" for p in paras)
        xhtmls.append(
            (
                f"OEBPS/ch{k}.xhtml",
                (
                    '<?xml version="1.0" encoding="utf-8"?>'
                    '<html xmlns="http://www.w3.org/1999/xhtml">'
                    f"<head><title>{title}</title></head>"
                    f"<body><h1>{title}</h1>{body}</body></html>"
                ).encode("utf-8"),
            )
        )
    manifest = "".join(
        f'<item id="c{k}" href="ch{k}.xhtml" media-type="application/xhtml+xml"/>'
        for k in range(n - 1, -1, -1)  # manifest deliberately reversed
    )
    spine = "".join(f'<itemref idref="c{k}"/>' for k in range(n))
    opf = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"'
        ' unique-identifier="uid">'
        f"<metadata><dc:identifier xmlns:dc=\"http://purl.org/dc/elements/1.1/\""
        f' id="uid">book-{book_id}</dc:identifier></metadata>'
        f"<manifest>{manifest}</manifest>"
        f"<spine>{spine}</spine>"
        "</package>"
    ).encode("utf-8")
    container = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<container version="1.0"'
        ' xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\""
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    ).encode("utf-8")
    members = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", container),
        ("OEBPS/content.opf", opf),
        *reversed(xhtmls),  # zip order reversed as well
    ]
    return build_zip(members)


def _xhtml_chapter_text(blob: bytes) -> str:
    """Exact chapter text: the body's h1/h2/h3/p element texts joined
    with newlines (XHTML is well-formed XML — no tag-soup heuristics
    needed, unlike crawl HTML)."""
    import xml.etree.ElementTree as ET

    from query_engine_spark.llmdata.bounds import reject_xml_dtd

    reject_xml_dtd(blob, "chapter XHTML")
    try:
        root = ET.fromstring(blob)
    except ET.ParseError as e:
        raise ValueError(f"malformed chapter XHTML: {e}") from e
    body = root.find(f"{_XHTML_NS}body")
    if body is None:
        raise ValueError("chapter without <body>")
    keep = {f"{_XHTML_NS}{t}" for t in ("h1", "h2", "h3", "p")}
    parts = [
        "".join(el.itertext()) for el in body.iter() if el.tag in keep
    ]
    return "\n".join(parts)


def epub_chapters(blob: bytes) -> list[str]:
    """Extract a book's chapter texts IN SPINE ORDER: container.xml →
    OPF → manifest id→href → spine idrefs; hrefs resolve relative to
    the OPF's directory per OCF. Missing chain links raise — a book
    silently read in zip order is corrupt training data."""
    import xml.etree.ElementTree as ET

    members = dict(read_zip(blob))
    if members.get("mimetype") != b"application/epub+zip":
        raise ValueError("not an EPUB (missing/incorrect mimetype member)")
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("EPUB without META-INF/container.xml")
    from query_engine_spark.llmdata.bounds import reject_xml_dtd

    reject_xml_dtd(container, "container.xml")
    try:
        croot = ET.fromstring(container)
    except ET.ParseError as e:
        raise ValueError(f"malformed container.xml: {e}") from e
    rootfile = croot.find(
        f"{_CONTAINER_NS}rootfiles/{_CONTAINER_NS}rootfile"
    )
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("container.xml without a rootfile")
    opf_path = rootfile.get("full-path")
    opf_blob = members.get(opf_path)
    if opf_blob is None:
        raise ValueError(f"rootfile {opf_path!r} not in the archive")
    reject_xml_dtd(opf_blob, "OPF")
    try:
        opf = ET.fromstring(opf_blob)
    except ET.ParseError as e:
        raise ValueError(f"malformed OPF: {e}") from e
    base = posixpath.dirname(opf_path)
    hrefs: dict[str, str] = {}
    for item in opf.iter(f"{_OPF_NS}item"):
        iid, href = item.get("id"), item.get("href")
        if iid and href:
            hrefs[iid] = posixpath.join(base, href) if base else href
    texts: list[str] = []
    spine = opf.find(f"{_OPF_NS}spine")
    if spine is None:
        raise ValueError("OPF without a <spine>")
    for ref in spine.findall(f"{_OPF_NS}itemref"):
        idref = ref.get("idref")
        path = hrefs.get(idref or "")
        if path is None:
            raise ValueError(f"spine idref {idref!r} not in the manifest")
        chapter = members.get(path)
        if chapter is None:
            raise ValueError(f"manifest href {path!r} not in the archive")
        texts.append(_xhtml_chapter_text(chapter))
    return texts


_EPUB_SCHEMA = "book_id long, chapters int, chars long, fp string"


def epub_features(df: DataFrame, *, id_col: str = "book_id") -> DataFrame:
    """Distributed EPUB ingestion (Arrow mapInPandas, map-only): per
    book the chapter count, total characters, and the md5 of the
    form-feed-joined chapter texts in SPINE order — so a zip-order
    reader fails the hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf["payload"]):
                texts = epub_chapters(bytes(blob))
                joined = "\f".join(texts)
                rows.append(
                    {
                        "book_id": bid,
                        "chapters": len(texts),
                        "chars": len(joined),
                        "fp": hashlib.md5(joined.encode("utf-8")).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["book_id", "chapters", "chars", "fp"])

    return df.select(id_col, "payload").mapInPandas(run, _EPUB_SCHEMA)
