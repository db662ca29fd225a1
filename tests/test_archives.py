"""Archive ingestion (llmdata/archives.py): ZIP per PKWARE APPNOTE and
gzipped POSIX ustar TAR — golden hand-authored streams anchoring the
readers outside the co-developed build/read pairs, corruption loudness,
junk-prefix tolerance, and the Spark pack→extract roundtrip shape."""

from __future__ import annotations

import os
import struct
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.llmdata import archives as A


def _sample_members():
    return [
        ("docs/doc00000000.txt", b""),  # empty member: 0-size edge
        ("docs/doc00000001.txt", b"hello world " * 50),  # deflates
        ("docs/doc00000002.txt", bytes(range(256)) * 2),  # repetitive binary: deflates
        ("docs/doc00000003.txt", os.urandom(64)),  # incompressible: STORED
        # non-ASCII name sets flag bit 11 -> the strict UTF-8 name-decode
        # path runs under the mutation fuzz (review r11: the _decoded
        # normalization initially missed read_zip's member name, and the
        # ASCII-only corpus could never reach the leak)
        ("docs/résumé-ü.txt", b"utf-8 named member"),
    ]


def test_zip_roundtrip_mixed_methods():
    members = _sample_members()
    blob = A.build_zip(members)
    assert A.read_zip(blob) == members
    # at least one member each way (mixed-method archive, like real zips)
    methods = set()
    pos = 0
    sig = struct.pack("<I", 0x04034B50)
    while True:
        pos = blob.find(sig, pos)
        if pos < 0:
            break
        methods.add(struct.unpack_from("<H", blob, pos + 8)[0])
        pos += 4
    assert methods == {0, 8}


def test_zip_golden_hand_authored_archive():
    """ZIP conformance anchored outside the co-developed pair: a
    one-member STORED archive laid out BY HAND from APPNOTE 4.3 — local
    header, central directory entry and EOCD with every offset and the
    CRC-32 written as literals."""
    name = b"a.txt"
    data = b"Hi!"
    crc = 0x799EC5DA  # zlib.crc32(b"Hi!"), pinned as a literal
    local = (
        struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, 0, 0, 0, crc, 3, 3, 5, 0)
        + name
        + data
    )
    cdir = (
        struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, 0, 0, 0, crc, 3, 3, 5, 0, 0, 0, 0, 0, 0,
        )
        + name
    )
    eocd = struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cdir), len(local), 0
    )
    assert A.read_zip(local + cdir + eocd) == [("a.txt", b"Hi!")]


def test_zip_junk_prefix_and_comment_suffix():
    """Self-extracting archives prepend bytes; zips may carry an EOCD
    comment. Both shift the EOCD position — the reader must apply the
    standard offset fixup (prefix) and scan past the comment (suffix)."""
    members = _sample_members()
    blob = A.build_zip(members)
    assert A.read_zip(b"#!/bin/sh junk prefix\n" + blob) == members
    # a trailing comment: rewrite EOCD comment length and append bytes
    comment = b"corpus release v1"
    patched = blob[:-2] + struct.pack("<H", len(comment)) + comment
    assert A.read_zip(patched) == members


def test_zip_corruption_raises():
    members = _sample_members()
    blob = A.build_zip(members)
    sig = struct.pack("<I", 0x04034B50)
    # member 1 (deflated): flip a payload byte
    first = blob.find(sig)
    second = blob.find(sig, first + 4)
    nlen = struct.unpack_from("<H", blob, second + 26)[0]
    bad = bytearray(blob)
    bad[second + 30 + nlen + 3] ^= 0x55
    with pytest.raises(ValueError):
        A.read_zip(bytes(bad))
    # stored member: CRC catches the flip
    offs = []
    pos = 0
    while True:
        pos = blob.find(sig, pos)
        if pos < 0:
            break
        offs.append(pos)
        pos += 4
    last = offs[-1]
    nlen = struct.unpack_from("<H", blob, last + 26)[0]
    bad = bytearray(blob)
    bad[last + 30 + nlen] ^= 0x55
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        A.read_zip(bytes(bad))


def test_zip64_roundtrip_and_golden():
    """ZIP64 (APPNOTE 4.3.14/4.5.3): forced-zip64 archives roundtrip
    (incl. junk-prefixed), >65535 members auto-switch, and a
    hand-authored one-member STORED ZIP64 archive — sentinel sizes,
    0x0001 extras, ZIP64 EOCD + locator, every offset a literal —
    anchors the layout outside the co-developed pair."""
    members = _sample_members()
    z = A.build_zip(members, zip64=True)
    assert A.read_zip(z) == members
    assert A.read_zip(b"#!junk\n" + z) == members
    # classic output unchanged when under the limits
    assert b"PK\x06\x06" not in A.build_zip(members)
    assert b"PK\x06\x06" in z
    # auto-switch at the member-count limit
    big = [(f"m{i:06d}", b"x") for i in range(65535)]
    got = A.read_zip(A.build_zip(big))
    assert len(got) == 65535 and got[-1] == ("m065534", b"x")
    # --- hand-authored golden ---
    name = b"b.txt"
    data = b"Yo!"
    crc = zlib.crc32(data) & 0xFFFFFFFF
    local = (
        struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 45, 0, 0, 0, 0, crc,
            0xFFFFFFFF, 0xFFFFFFFF, 5, 20,
        )
        + name
        + struct.pack("<HHQQ", 0x0001, 16, 3, 3)
        + data
    )
    cdir = (
        struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 45, 45, 0, 0, 0, 0, crc,
            0xFFFFFFFF, 0xFFFFFFFF, 5, 28, 0, 0, 0, 0, 0xFFFFFFFF,
        )
        + name
        + struct.pack("<HHQQQ", 0x0001, 24, 3, 3, 0)
    )
    z64_eocd = struct.pack(
        "<IQHHIIQQQQ",
        0x06064B50, 44, 45, 45, 0, 0, 1, 1, len(cdir), len(local),
    )
    locator = struct.pack(
        "<IIQI", 0x07064B50, 0, len(local) + len(cdir), 1
    )
    eocd = struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, 0xFFFFFFFF, 0xFFFFFFFF, 0
    )
    golden = local + cdir + z64_eocd + locator + eocd
    assert A.read_zip(golden) == [("b.txt", b"Yo!")]
    assert A.read_zip(b"PREFIX--" + golden) == [("b.txt", b"Yo!")]
    # sentinel fields without a locator refuse
    with pytest.raises(ValueError, match="locator"):
        A.read_zip(local + cdir + eocd)


def test_zip64_extensible_data_sector():
    """APPNOTE 4.3.14.4: the ZIP64 EOCD record may carry an extensible
    data sector, so its length exceeds the 56-byte minimum — readers
    must locate the record by its own size-of-record field, not by a
    fixed locator-adjacency offset (the pre-round-9 bug rejected such
    spec-legal archives). The adversarial variant plants the record
    SIGNATURE inside the sector, exercising the backward rescan."""
    members = _sample_members()
    z = bytearray(A.build_zip(members, zip64=True))
    eocd = z.rfind(struct.pack("<I", 0x06054B50))
    z64_pos = z.rfind(struct.pack("<I", 0x06064B50), 0, eocd - 20)
    assert z64_pos == eocd - 20 - 56  # the writer emits the minimal record
    for sector in (b"\x07" * 24, b"ab" + struct.pack("<I", 0x06064B50) + b"cd"):
        zz = bytearray(z)
        rsize = struct.unpack_from("<Q", zz, z64_pos + 4)[0]
        struct.pack_into("<Q", zz, z64_pos + 4, rsize + len(sector))
        zz[eocd - 20 : eocd - 20] = sector  # insert before the locator
        assert A.read_zip(bytes(zz)) == members
        assert A.read_zip(b"#!junk\n" + bytes(zz)) == members
    # a record whose size field does not reach the locator still refuses —
    # with the r11 distinct triage error (a signature EXISTS but fails
    # coherence, different failure from no signature at all)
    zz = bytearray(z)
    struct.pack_into("<Q", zz, z64_pos + 4, 60)
    with pytest.raises(ValueError, match="failed coherence checks"):
        A.read_zip(bytes(zz))
    # no signature anywhere keeps the original error
    zz = bytearray(z)
    zz[z64_pos : z64_pos + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="locator without an adjoining"):
        A.read_zip(bytes(zz))


def test_zip64_nonconforming_writer_fallback():
    """ADVICE r10 (low): full fixed-field coherence (ZIP64
    version-needed >= 45, matching disk fields, classic-EOCD agreement)
    rejected archives from NONCONFORMING but real writers. The reader
    now falls back to the locator's stored offset when no candidate
    anywhere passes full coherence, provided the stored position carries
    the signature and its size field ends exactly at the locator — a
    position the writer itself pointed at, so the forged-sig-in-sector
    attack the strict check targets cannot arise. Junk-prefixed
    nonconforming archives stay rejected (the stored offset no longer
    points at the record and nothing can be safely trusted), with the
    distinct coherence error."""
    members = _sample_members()
    base = A.build_zip(members, zip64=True)
    eocd = base.rfind(struct.pack("<I", 0x06054B50))
    z64_pos = base.rfind(struct.pack("<I", 0x06064B50), 0, eocd - 20)
    # vneed (offset 14 into the record: sig 4 + rsize 8 + vmade 2) -> 20
    low_vneed = bytearray(base)
    struct.pack_into("<H", low_vneed, z64_pos + 14, 20)
    assert A.read_zip(bytes(low_vneed)) == members
    # mismatched disk-number fields (d_this=1 vs d_cd=0) also rescued
    bad_disks = bytearray(base)
    struct.pack_into("<I", bad_disks, z64_pos + 16, 1)
    assert A.read_zip(bytes(bad_disks)) == members
    # junk-prefixed nonconforming archive: stored offset misses the
    # record, no coherent candidate -> distinct triage error
    with pytest.raises(ValueError, match="failed coherence checks"):
        A.read_zip(b"#!junk\n" + bytes(low_vneed))
    # ADVICE r11 (low): the fallback still requires agreement with the
    # classic EOCD's NON-SENTINEL fields (entry counts / CD geometry) —
    # real nonconforming writers diverge on vneed/disk fields, never on
    # those, so a stored-offset record whose total entry count
    # contradicts the classic EOCD is a parser differential vs stricter
    # readers and stays rejected (n_tot at record offset 32; the classic
    # EOCD's 16-bit count is non-sentinel for this small archive)
    bad_counts = bytearray(low_vneed)
    struct.pack_into("<Q", bad_counts, z64_pos + 24, len(members) + 7)
    struct.pack_into("<Q", bad_counts, z64_pos + 32, len(members) + 7)
    with pytest.raises(ValueError, match="failed coherence checks"):
        A.read_zip(bytes(bad_counts))


def test_zip_corrupt_utf8_name_raises_contract_valueerror():
    """Review r11: a UTF-8-flagged member name (flag bit 11) with
    corrupted name bytes must raise the contract ValueError, not leak
    UnicodeDecodeError — the _decoded normalization applied to every
    other header field initially missed read_zip's name decode, and the
    fuzz corpus's ASCII-only names (cp437 decode is total) could never
    reach it."""
    blob = bytearray(A.build_zip([("docs/é.txt", b"payload")]))
    # corrupt the name's UTF-8 continuation byte in the CENTRAL directory
    # (the copy read_zip decodes) — find the second occurrence
    raw = "docs/é.txt".encode("utf-8")
    local = blob.find(raw)
    cd = blob.find(raw, local + 1)
    assert cd > local > 0
    blob[cd + raw.index(b"\xa9")] = 0xFF  # invalid continuation
    with pytest.raises(ValueError, match="undecodable ZIP member name"):
        A.read_zip(bytes(blob))


def test_zip64_fake_record_inside_extensible_sector():
    """ADVICE r9 (low): size-of-record adjacency alone can be forged —
    adversarial bytes inside a real record's extensible data sector that
    spell sig+matching-size must not mislocate the record start. The
    reader now trusts the locator's stored offset first (shift 0 — the
    unprefixed case never scans at all) and requires fixed-field
    coherence (ZIP64 version-needed, matching disk numbers, per-disk ==
    total entry counts, classic-EOCD agreement) before accepting any
    backward-scan candidate, so the fake below — a full record image
    with a size field ending exactly at the locator but incoherent
    counts — is rejected on both the unprefixed and junk-prefixed
    paths."""
    members = _sample_members()
    z = bytearray(A.build_zip(members, zip64=True))
    eocd = z.rfind(struct.pack("<I", 0x06054B50))
    z64_pos = z.rfind(struct.pack("<I", 0x06064B50), 0, eocd - 20)
    fake = struct.pack(
        "<IQHHIIQQQQ", 0x06064B50, 44, 45, 45, 0, 0, 7, 9, 1, 1
    )
    assert len(fake) == 56
    rsize = struct.unpack_from("<Q", z, z64_pos + 4)[0]
    struct.pack_into("<Q", z, z64_pos + 4, rsize + len(fake))
    z[eocd - 20 : eocd - 20] = fake  # extensible data sector = the fake
    assert A.read_zip(bytes(z)) == members
    assert A.read_zip(b"#!junk\n" + bytes(z)) == members


def test_zip64_extensible_sector_adversarial_fuzz():
    """Randomized form of the forged-record pin: 80 trials of random
    junk prefixes x random extensible data sectors seeded with fake
    ZIP64-EOCD signatures at random offsets — fake size fields chosen to
    END EXACTLY AT THE LOCATOR half the time (the adjacency the old scan
    trusted), random fixed fields. The reader must extract the true
    members every time; a mislocated record start would either raise or
    ship wrong names/content, both caught by the equality."""
    import random

    members = _sample_members()
    base = A.build_zip(members, zip64=True)
    rng = random.Random(4171)
    for trial in range(80):
        z = bytearray(base)
        eocd = z.rfind(struct.pack("<I", 0x06054B50))
        z64_pos = z.rfind(struct.pack("<I", 0x06064B50), 0, eocd - 20)
        sector = bytearray(rng.randrange(24, 200))
        for i in range(len(sector)):
            sector[i] = rng.randrange(256)
        # plant 1-2 fake signatures; half get a size field that makes the
        # fake record end exactly at the (new) locator position
        for _ in range(rng.randrange(1, 3)):
            off = rng.randrange(0, max(1, len(sector) - 12))
            sector[off : off + 4] = struct.pack("<I", 0x06064B50)
            if rng.random() < 0.5:
                want = len(sector) - off - 12
                sector[off + 4 : off + 12] = struct.pack("<Q", max(want, 0))
        rsize = struct.unpack_from("<Q", z, z64_pos + 4)[0]
        struct.pack_into("<Q", z, z64_pos + 4, rsize + len(sector))
        z[eocd - 20 : eocd - 20] = bytes(sector)
        prefix = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        if prefix:
            # a junk prefix must not itself start with a local-header sig
            # (that would legitimately change archive semantics)
            prefix = b"#" + prefix[1:]
        assert A.read_zip(prefix + bytes(z)) == members, trial


def test_tar_golden_hand_authored_header():
    """ustar conformance anchored outside the co-developed pair: a
    header block laid out BY HAND per POSIX.1-1988 — octal size, magic,
    and the checksum computed manually with the chksum field as eight
    spaces — followed by padded content and the two-zero-block
    terminator."""
    hdr = bytearray(512)
    hdr[0:5] = b"b.txt"
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = b"00000000003\x00"  # size 3
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156] = ord("0")
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chksum = sum(hdr)
    hdr[148:156] = f"{chksum:06o}\x00 ".encode("ascii")
    blob = bytes(hdr) + b"Yo!" + b"\x00" * 509 + b"\x00" * 1024
    assert A.read_tar(blob) == [("b.txt", b"Yo!")]


def test_tar_gz_roundtrip_and_corruption():
    members = _sample_members()
    raw = A.build_tar(members)
    assert A.read_tar(raw) == members
    assert A.read_tar(A.gunzip_bytes(A.gzip_bytes(raw))) == members
    tampered = bytearray(raw)
    tampered[0] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        A.read_tar(bytes(tampered))
    with pytest.raises(ValueError, match="terminator"):
        A.read_tar(raw[:-1024])
    with pytest.raises(ValueError):
        A.gunzip_bytes(A.gzip_bytes(raw)[:-4])
    with pytest.raises(ValueError, match="trailing"):
        A.gunzip_bytes(A.gzip_bytes(raw) + b"garbage")
    # non-regular members (symlink typeflag) refuse
    link = bytearray(A.build_tar([("c.txt", b"x")]))
    link[156] = ord("2")
    chk = sum(link[:148]) + 8 * 32 + sum(link[156:512])
    link[148:156] = f"{chk:06o}\x00 ".encode("ascii")
    with pytest.raises(ValueError, match="non-regular"):
        A.read_tar(bytes(link))


def test_spark_archive_roundtrip_and_plan(spark):
    """The Spark shape: pack = exactly one shuffle keyed on archive_id;
    extract = map-only over archive payloads (no exchange below the
    member walk). Values checked member-exact against the inputs."""
    import pandas as pd

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(20), "text": [f"text-{i} " * (i + 1) for i in range(20)]}
        )
    )
    for fmt in ("zip", "tar.gz"):
        packed = A.pack_archives(docs, fmt=fmt, group_size=8)
        assert packed.count() == 3  # ceil(20 / 8)
        got = A.archive_members(packed, fmt=fmt).orderBy("doc_id").toPandas()
        assert list(got["doc_id"]) == list(range(20))
        assert list(got["chars"]) == [len(f"text-{i} " * (i + 1)) for i in range(20)]
        plan = A.archive_members(packed, fmt=fmt)._jdf.queryExecution().executedPlan().toString()
        # one aggregate-side exchange from the groupBy; the member walk
        # itself adds none beyond it
        assert plan.count("Exchange") <= 1, plan


def test_archive_parsers_mutation_fuzz():
    """Mutation fuzz over the new container parsers: flip/truncate/extend
    valid archives 400 ways — the reader must either return correct
    members or raise ValueError/NotImplementedError; it must never hang,
    never crash with an unrelated exception type, and never return a
    member whose bytes fail its own CRC contract."""
    import random

    rng = random.Random(1234)
    members = _sample_members()
    # PLAIN tar paths included deliberately (r11): the gzip wrapper
    # absorbs most mutations before the TAR layer is reached, which hid
    # UnicodeDecodeError leaks from read_tar's strict header-field
    # decodes (checksum/size octal, GNU long name, member name) — now
    # normalized to ValueError via _decoded (the parse_warc fix's class)
    long_members = members + [("deep/" + "n" * 120 + "-é.txt", b"long" * 64)]
    for corpus, build, read in (
        (members, A.build_zip, A.read_zip),
        (members, lambda m: A.build_zip(m, zip64=True), A.read_zip),
        (members, lambda m: A.gzip_bytes(A.build_tar(m)),
         lambda b: A.read_tar(A.gunzip_bytes(b))),
        (long_members, lambda m: A.build_tar(m, longname_style="gnu"), A.read_tar),
        (long_members, lambda m: A.build_tar(m, longname_style="pax"), A.read_tar),
    ):
        blob = build(corpus)
        for _ in range(200):
            bad = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
            elif op == 1:
                bad = bad[: rng.randrange(len(bad))]
            else:
                bad += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
            try:
                out = read(bytes(bad))
            except (ValueError, NotImplementedError):
                continue
            except struct.error:
                continue  # truncated fixed-width header fields
            # parsed despite mutation: members must still satisfy the
            # reader's own integrity contract (CRC/checksum verified
            # inside read_*), so only name/metadata-harmless flips land here
            assert isinstance(out, list)


def test_tar_codec_autodetect_and_mixed():
    """bz2 and xz tarballs roundtrip through the SAME reader via magic
    auto-detection; unknown magic refuses; compress_stream rejects
    unknown codec names."""
    members = _sample_members()
    raw = A.build_tar(members)
    for codec in ("gz", "bz2", "xz"):
        assert A.read_tar(A.decompress_auto(A.compress_stream(raw, codec))) == members
    with pytest.raises(ValueError, match="magic"):
        A.decompress_auto(b"\x00\x01\x02junk")
    with pytest.raises(ValueError, match="unknown stream codec"):
        A.compress_stream(raw, "zstd")
    # corrupt bz2/xz payloads raise ValueError, not codec-internal types
    for codec in ("bz2", "xz"):
        blob = bytearray(A.compress_stream(raw, codec))
        blob[len(blob) // 2] ^= 0xFF
        with pytest.raises(ValueError):
            A.read_tar(A.decompress_auto(bytes(blob)))


def test_epub_spine_order_and_boundaries():
    """EPUB: the spine is authoritative for reading order (chapters are
    stored reversed in the zip and listed reversed in the manifest —
    a zip-order reader scrambles the book); discovery-chain breaks
    (wrong mimetype, missing container/rootfile/spine, dangling idref)
    refuse with specific messages."""
    import pytest

    from query_engine_spark.llmdata import ebooks as E

    chapters = [
        ("Chapter 0", ["alpha one", "alpha two"]),
        ("Chapter 1", ["beta one", "beta two"]),
        ("Chapter 2", ["gamma"]),
    ]
    blob = E.make_epub(9, chapters)
    texts = E.epub_chapters(blob)
    assert texts == ["\n".join([t] + ps) for t, ps in chapters]
    # zip member order really is reversed (the trap a naive reader hits)
    names = [n for n, _ in A.read_zip(blob)]
    assert names[3:] == ["OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml", "OEBPS/ch0.xhtml"]

    # consistent-but-wrong mimetype: rebuild the zip with a bad value
    members = A.read_zip(blob)
    bad = A.build_zip([("mimetype", b"application/zip")] + members[1:])
    with pytest.raises(ValueError, match="mimetype"):
        E.epub_chapters(bad)
    bad = A.build_zip([m for m in members if m[0] != "META-INF/container.xml"])
    with pytest.raises(ValueError, match="container.xml"):
        E.epub_chapters(bad)
    bad = A.build_zip([m for m in members if not m[0].endswith("ch1.xhtml")])
    with pytest.raises(ValueError, match="not in the archive"):
        E.epub_chapters(bad)
    # spine idref pointing at a manifest id that does not exist
    opf = dict(members)["OEBPS/content.opf"].replace(b'idref="c1"', b'idref="zz"')
    bad = A.build_zip(
        [(n, opf if n == "OEBPS/content.opf" else b) for n, b in members]
    )
    with pytest.raises(ValueError, match="not in the manifest"):
        E.epub_chapters(bad)


def test_epub_mutation_fuzz():
    import random

    from query_engine_spark.llmdata import ebooks as E

    rng = random.Random(404)
    blob = E.make_epub(2, [("T", ["one", "two"]), ("U", ["three"])])
    for _ in range(300):
        bad = bytearray(blob)
        op = rng.randrange(3)
        if op == 0:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        elif op == 1:
            bad = bad[: rng.randrange(len(bad))]
        else:
            bad += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
        try:
            out = E.epub_chapters(bytes(bad))
        except (ValueError, NotImplementedError, struct.error):
            # the UnicodeDecodeError allowance that used to sit here is
            # GONE (r11): read_zip now normalizes corrupt member-name
            # bytes to the contract ValueError like every other field
            continue
        assert isinstance(out, list)


def test_mbox_from_quoting_and_boundaries():
    """The mboxrd quote dance: bodies containing 'From ' and already-
    quoted '>From ' lines roundtrip exactly; a splitter without the
    unquoting would truncate (pinned by message count); text-part
    selection never picks HTML; missing text/plain refuses."""
    import pytest

    from query_engine_spark.llmdata import mail as M

    tricky = "From a\n>From b\n>>From c\nplain\n"
    box = M.build_mbox(
        [
            M.build_message(
                from_addr="a@x.example", subject="s1", body=tricky
            ),
            M.build_message(
                from_addr="b@y.example", subject="s2", body="short\n",
                html="twin",
            ),
        ]
    )
    msgs = M.split_mbox(box)
    assert len(msgs) == 2  # no mid-body splits despite three From-ish lines
    assert M.extract_message(msgs[0])["text"] == tricky
    assert M.extract_message(msgs[1])["text"] == "short\n"
    with pytest.raises(ValueError, match="not an mbox"):
        M.split_mbox(b"To: someone\n\nbody\n")
    html_only = (
        b"From: a@x.example\nSubject: h\nMIME-Version: 1.0\n"
        b'Content-Type: text/html; charset="utf-8"\n\n<p>only html</p>\n'
    )
    with pytest.raises(ValueError, match="text/plain"):
        M.extract_message(html_only)
    with pytest.raises(ValueError, match="From address"):
        M.extract_message(b"Subject: x\n\nno sender\n")


def test_mbox_mutation_fuzz():
    import random

    from query_engine_spark.llmdata import mail as M

    rng = random.Random(808)
    box = M.build_mbox(
        [
            M.build_message(
                from_addr=f"u{k}@d{k}.example", subject=f"s{k}",
                body=f"Body {k}\nFrom here\n",
                cte="base64" if k % 2 else "quoted-printable",
            )
            for k in range(3)
        ]
    )
    for _ in range(300):
        bad = bytearray(box)
        op = rng.randrange(3)
        if op == 0:
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        elif op == 1:
            bad = bad[: rng.randrange(len(bad))]
        else:
            bad += bytes(rng.randrange(32, 127) for _ in range(rng.randrange(1, 9)))
        try:
            for raw in M.split_mbox(bytes(bad)):
                M.extract_message(raw)
        except (ValueError, NotImplementedError):
            continue  # extract_message normalizes stdlib email errors


def test_tar_longnames_roundtrip_and_stdlib_cross_validation():
    """GNU '@LongLink' and PAX 'x' long-name records, conformance
    anchored OUTSIDE the co-developed pair in both directions: stdlib
    tarfile reads our output, and we read stdlib tarfile's GNU_FORMAT
    and PAX_FORMAT output — for >100-byte member paths."""
    import io
    import tarfile

    long_name = "docs/" + "verydeep/" * 14 + "doc00000042.txt"
    assert len(long_name) > 100
    members = [
        ("docs/short.txt", b"abc"),
        (long_name, b"hello world " * 10),
        ("docs/other.txt", b"x"),
    ]
    for style in ("gnu", "pax"):
        t = A.build_tar(members, longname_style=style)
        assert A.read_tar(t) == members, style
        with tarfile.open(fileobj=io.BytesIO(t)) as tf:
            assert tf.extractfile(long_name).read() == b"hello world " * 10
    for fmt, label in ((tarfile.GNU_FORMAT, "gnu"), (tarfile.PAX_FORMAT, "pax")):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            for n, d in members:
                ti = tarfile.TarInfo(n)
                ti.size = len(d)
                tf.addfile(ti, io.BytesIO(d))
        assert A.read_tar(buf.getvalue()) == members, label
    # stacked long-name records are malformed: prepend a complete
    # @LongLink record (header + padded name content) before another
    t = A.build_tar([(long_name, b"z")], longname_style="gnu")
    with pytest.raises(ValueError, match="stacked"):
        A.read_tar(t[:1024] + t)
    # a PAX global header refuses loudly
    g = bytearray(A.build_tar([("docs/a.txt", b"y")]))
    # flip the first header's typeflag to 'g' and re-checksum
    g[156] = ord("g")
    g[148:156] = b" " * 8
    chk = sum(g[:512])
    g[148:156] = f"{chk:06o}\x00 ".encode("ascii")
    with pytest.raises(NotImplementedError, match="global"):
        A.read_tar(bytes(g))


def test_tar_longname_property_roundtrip():
    """Property: arbitrary member names (unicode, any length up to the
    fixture bound) roundtrip through BOTH long-name styles and remain
    stdlib-readable — incl. names whose byte length exceeds their char
    length (the PAX byte-truncation regression class)."""
    import io
    import tarfile

    from hypothesis import given, settings, strategies as st

    name_chars = st.sampled_from(list("abzé日/_.-"))

    @given(
        st.lists(
            st.tuples(
                st.text(name_chars, min_size=1, max_size=160),
                st.binary(max_size=64),
            ),
            min_size=1,
            max_size=4,
        ),
        st.sampled_from(["gnu", "pax"]),
    )
    @settings(max_examples=80, deadline=None)
    def prop(raw_members, style):
        # tar member names must not start/end with '/', collide, or be
        # '.'-like; normalize into validity while keeping the byte-vs-
        # char length property intact
        members = []
        seen = set()
        for i, (n, d) in enumerate(raw_members):
            n = f"m{i}_" + n.strip("/").replace("//", "/")
            if not n or n in seen:
                return
            seen.add(n)
            members.append((n, d))
        t = A.build_tar(members, longname_style=style)
        assert A.read_tar(t) == members
        with tarfile.open(fileobj=io.BytesIO(t)) as tf:
            for n, d in members:
                assert tf.extractfile(n).read() == d

    prop()
