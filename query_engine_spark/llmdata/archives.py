"""Archive-corpus ingestion: real-world training corpora arrive as ZIP
archives and gzip-compressed ustar TAR files of member documents (data
dumps, scraped site exports, academic corpus releases). These are the
distributed pack/unpack stages:

- ZIP per APPNOTE.TXT (PKWARE 6.3.x public spec): local file headers,
  raw-DEFLATE (method 8) or STORED (method 0) members, CRC-32
  verification, central directory + end-of-central-directory record.
  The READER is central-directory-driven — it trusts the EOCD/CD chain,
  not a linear local-header walk, exactly like production unzippers
  (self-extracting and concatenated archives prepend junk bytes).
- TAR per POSIX.1-1988 ustar: 512-byte headers with octal size fields
  and the space-normalized header checksum, content padded to whole
  blocks, two zero blocks as terminator; the archive byte stream is
  wrapped in gzip (RFC 1952 via stdlib zlib), bzip2, or xz — the three
  codecs corpus releases actually ship under — with the reader
  auto-detecting by magic bytes, so heterogeneous (mixed-codec) corpora
  ingest through one path.

Spark shape (the 100-TB story): packing groups documents into
bounded-size archives with ONE shuffle keyed on archive id
(`groupBy(archive_id).applyInPandas`); member extraction is a pure
map-only Arrow `mapInPandas` pass over archive payloads — each archive
is self-contained, so the unpack parallelism is the archive count and
no shuffle ever touches the member bytes.

Semantic spec for what the engine must expose: /root/reference/src/main.rs
(the reference's ingest surface); archive layouts from the public
PKWARE APPNOTE and POSIX ustar specifications.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

from query_engine_spark.llmdata.bounds import (
    MAX_INFLATE_BYTES,
    bounded_bz2,
    bounded_inflate,
    bounded_xz,
)

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_ZIP_LOCAL_SIG = 0x04034B50
_ZIP_CDIR_SIG = 0x02014B50
_ZIP_EOCD_SIG = 0x06054B50
_ZIP64_EOCD_SIG = 0x06064B50
_ZIP64_LOCATOR_SIG = 0x07064B50


def build_zip(
    members: list[tuple[str, bytes]], *, level: int = 6, zip64: bool = False
) -> bytes:
    """Pack (name, bytes) members into a ZIP: DEFLATE (method 8) when it
    shrinks the member, STORED (method 0) otherwise — the mixed-method
    layout real zips have. ZIP64 (APPNOTE 4.3.14/4.5.3) engages when
    `zip64` is forced (how big-data tools write every archive) or
    automatically past the classic limits (>65535 members / 4 GiB
    offsets — at crawl scale these are ordinary): sentinel 0xFFFFFFFF
    fields, 0x0001 extended-information extras, and the ZIP64
    end-of-central-directory record + locator before the classic EOCD."""
    out = bytearray()
    cdir = bytearray()
    # >= : exactly 65535 members would collide with the reader's
    # sentinel check, so it switches one early (spec-legal either way)
    use64 = zip64 or len(members) >= 0xFFFF
    for name, data in members:
        raw = name.encode("utf-8")
        # APPNOTE appendix D: names are cp437 UNLESS general-purpose flag
        # bit 11 declares UTF-8 — standard readers (zipfile, Info-ZIP)
        # honor the flag, so writing UTF-8 bytes without it mojibakes
        # every non-ASCII name downstream (stdlib-conformance finding)
        flags = 0x0800 if not name.isascii() else 0
        crc = zlib.crc32(data) & 0xFFFFFFFF
        comp = zlib.compressobj(level, zlib.DEFLATED, -15)
        deflated = comp.compress(data) + comp.flush()
        if len(deflated) < len(data):
            method, payload = 8, deflated
        else:
            method, payload = 0, data
        offset = len(out)
        if offset > 0xFFFFFFFF - len(payload):
            use64 = True
        if use64:
            # local header: sentinel sizes + 0x0001 extra (usize, csize)
            extra = struct.pack("<HHQQ", 0x0001, 16, len(data), len(payload))
            header = struct.pack(
                "<IHHHHHIIIHH",
                _ZIP_LOCAL_SIG, 45, flags, method, 0, 0,
                crc, 0xFFFFFFFF, 0xFFFFFFFF, len(raw), len(extra),
            )
            out += header + raw + extra + payload
            cextra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(payload), offset
            )
            cdir += struct.pack(
                "<IHHHHHHIIIHHHHHII",
                _ZIP_CDIR_SIG, 45, 45, flags, method, 0, 0,
                crc, 0xFFFFFFFF, 0xFFFFFFFF, len(raw), len(cextra),
                0, 0, 0, 0, 0xFFFFFFFF,
            ) + raw + cextra
        else:
            header = struct.pack(
                "<IHHHHHIIIHH",
                _ZIP_LOCAL_SIG, 20, flags, method, 0, 0,
                crc, len(payload), len(data), len(raw), 0,
            )
            out += header + raw + payload
            cdir += struct.pack(
                "<IHHHHHHIIIHHHHHII",
                _ZIP_CDIR_SIG, 20, 20, flags, method, 0, 0,
                crc, len(payload), len(data), len(raw), 0, 0, 0, 0, 0, offset,
            ) + raw
    cd_off = len(out)
    out += cdir
    if use64:
        z64_off = len(out)
        out += struct.pack(
            "<IQHHIIQQQQ",
            _ZIP64_EOCD_SIG, 44, 45, 45, 0, 0,
            len(members), len(members), len(cdir), cd_off,
        )
        out += struct.pack("<IIQI", _ZIP64_LOCATOR_SIG, 0, z64_off, 1)
        out += struct.pack(
            "<IHHHHIIH",
            _ZIP_EOCD_SIG, 0, 0,
            min(len(members), 0xFFFF), min(len(members), 0xFFFF),
            0xFFFFFFFF, 0xFFFFFFFF, 0,
        )
    else:
        out += struct.pack(
            "<IHHHHIIH",
            _ZIP_EOCD_SIG, 0, 0, len(members), len(members), len(cdir), cd_off, 0,
        )
    return bytes(out)


def _zip64_extra(blob: bytes, pos: int, elen: int, wanted: int) -> list[int]:
    """Pull `wanted` 8-byte values from the 0x0001 extended-information
    extra field in the extra block at [pos, pos+elen)."""
    end = pos + elen
    while pos + 4 <= end:
        (hid, hsize) = struct.unpack_from("<HH", blob, pos)
        if hid == 0x0001:
            if hsize < 8 * wanted or pos + 4 + hsize > end:
                raise ValueError("ZIP64 extra field too short")
            return list(struct.unpack_from(f"<{wanted}Q", blob, pos + 4))
        pos += 4 + hsize
    raise ValueError("sentinel size without a ZIP64 extra field")


def read_zip(blob: bytes) -> list[tuple[str, bytes]]:
    """Extract ZIP members via the central directory (EOCD scanned from
    the tail over the up-to-64 KiB comment window, per APPNOTE 4.3.16),
    verifying each member's CRC-32 — a corrupted member raises instead
    of shipping wrong training text."""
    window = blob[-(0xFFFF + 22):]
    eocd = window.rfind(struct.pack("<I", _ZIP_EOCD_SIG))
    if eocd < 0:
        raise ValueError("not a ZIP (no end-of-central-directory record)")
    eocd += len(blob) - len(window)
    (sig, _dn, _cdn, _n_disk, n_total, cd_size, cd_off, _clen) = struct.unpack_from(
        "<IHHHHIIH", blob, eocd
    )
    has_locator = (
        eocd >= 20
        and struct.unpack_from("<I", blob, eocd - 20)[0] == _ZIP64_LOCATOR_SIG
    )
    if has_locator:
        # ZIP64 (APPNOTE 4.3.15): the locator precedes the classic EOCD;
        # the ZIP64 EOCD record ends where the locator begins, but its
        # LENGTH is not fixed — v2 records and records with an extensible
        # data sector (4.3.14.4) run past the 56-byte minimum, so the
        # record is found by scanning backward for its signature and
        # validated against its own size-of-record field (which counts
        # everything after the 12-byte sig+size prefix). The record also
        # recovers the junk-prefix shift from its stored self-offset.
        (_lsig, _ldisk, z64_stored, _ndisks) = struct.unpack_from(
            "<IIQI", blob, eocd - 20
        )
        sig64 = struct.pack("<I", _ZIP64_EOCD_SIG)

        def _z64_record_adjacent(p: int) -> bool:
            """Structural floor both acceptance tiers share: signature at
            `p` and a size-of-record field ending exactly at the locator.
            Alone it is also the last-resort acceptance for NONCONFORMING
            writers (e.g. version-needed < 45 in the ZIP64 EOCD,
            mismatched disk fields) at the locator's own stored offset —
            a position the writer explicitly pointed at, not one found by
            scanning, so the adversarial sig-inside-data-sector shape the
            full check guards against (ADVICE r9) cannot arise there."""
            if p < 0 or p + 56 > eocd - 20 or blob[p : p + 4] != sig64:
                return False
            (_s, rsize) = struct.unpack_from("<IQ", blob, p)
            return rsize >= 44 and p + 12 + rsize == eocd - 20

        def _z64_record_ok(p: int) -> bool:
            """True iff a structurally consistent ZIP64 EOCD record at
            `p` ends exactly at the locator. Size-of-record alone is not
            enough (ADVICE r9): adversarial bytes inside a real record's
            extensible data sector can spell sig+matching-size, but they
            won't ALSO carry a ZIP64 version-needed, coherent disk
            numbers, per-disk == total entry counts, and agreement with
            the classic EOCD's non-sentinel fields."""
            if not _z64_record_adjacent(p):
                return False
            (_s, _rsize, _vmade, vneed, d_this, d_cd, n_disk, n_tot,
             z_size, z_off) = struct.unpack_from("<IQHHIIQQQQ", blob, p)
            if vneed < 45 or d_this != d_cd or n_disk != n_tot:
                return False
            return _z64_classic_agree(p)

        def _z64_classic_agree(p: int) -> bool:
            """The classic-EOCD non-sentinel agreement checks alone —
            the part of _z64_record_ok real nonconforming writers still
            satisfy (they diverge on vneed/disk fields, never on entry
            counts or CD geometry; ADVICE r11), so the last-resort
            fallback acceptance requires it too: a record at the stored
            offset whose counts CONTRADICT the classic EOCD is a parser
            differential vs stricter readers, not a sloppy writer."""
            (_s, _rsize, _vmade, _vneed, _d_this, _d_cd, _n_disk, n_tot,
             z_size, z_off) = struct.unpack_from("<IQHHIIQQQQ", blob, p)
            if n_total != 0xFFFF and n_total != n_tot:
                return False
            if cd_size != 0xFFFFFFFF and cd_size != z_size:
                return False
            if cd_off != 0xFFFFFFFF and cd_off != z_off:
                return False
            return True

        if _z64_record_ok(z64_stored):
            # unprefixed archive: the locator's stored offset is the
            # record position itself (shift 0) — trust it before any scan
            z64_pos = z64_stored
        else:
            # junk-prefixed archive: scan backward for the real record
            # start, accepting only fully validated candidates
            any_sig = z64_pos = blob.rfind(sig64, 0, eocd - 20)
            while z64_pos >= 0 and not _z64_record_ok(z64_pos):
                z64_pos = blob.rfind(sig64, 0, z64_pos)
            if (
                z64_pos < 0
                and _z64_record_adjacent(z64_stored)
                and _z64_classic_agree(z64_stored)
            ):
                # nonconforming writer: no candidate anywhere passes full
                # coherence, but the stored offset itself carries the
                # signature, ends exactly at the locator (ADVICE r10),
                # AND agrees with the classic EOCD's non-sentinel entry
                # counts / CD geometry (ADVICE r11) — only the vneed/disk
                # coherence the sloppy writers actually get wrong is
                # waived here
                z64_pos = z64_stored
            if z64_pos < 0:
                # distinct errors to aid triage (ADVICE r10): a signature
                # that exists (any_sig, from the scan above — no second
                # whole-blob pass) but fails coherence is a different
                # failure from no signature at all
                if any_sig >= 0:
                    raise ValueError(
                        "ZIP64 EOCD candidate(s) failed coherence checks"
                    )
                raise ValueError(
                    "ZIP64 locator without an adjoining ZIP64 EOCD"
                )
        shift = z64_pos - z64_stored
        if shift < 0:
            raise ValueError("ZIP64 EOCD offset past its own position")
        (_sig64, _rsize, _vm, _vn, _d1, _d2, _nd, n_total, cd_size, cd_off) = (
            struct.unpack_from("<IQHHIIQQQQ", blob, z64_pos)
        )
    else:
        if 0xFFFFFFFF in (cd_size, cd_off) or n_total == 0xFFFF:
            raise ValueError("ZIP64 sentinel fields without a ZIP64 locator")
        # self-extracting / junk-prefixed archives: every stored offset is
        # relative to the original archive start, so the actual prefix
        # length is the EOCD position minus where the CD claims to end —
        # add it to every offset (the standard unzip fixup)
        shift = eocd - (cd_off + cd_size)
        if shift < 0:
            raise ValueError("central directory overlaps the EOCD record")
    members: list[tuple[str, bytes]] = []
    pos = cd_off + shift
    for _ in range(n_total):
        (sig, _vmade, _vneed, _flags, method, _t, _d, crc, csize, usize,
         nlen, elen, clen, _disk, _iattr, _eattr, lho) = struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", blob, pos
        )
        if sig != _ZIP_CDIR_SIG:
            raise ValueError("central directory signature mismatch")
        raw_name = blob[pos + 46 : pos + 46 + nlen]
        # APPNOTE appendix D: UTF-8 only when flag bit 11 is set; the
        # default is cp437 (total — every byte maps), matching zipfile.
        # The UTF-8 path can reject corrupt name bytes — normalize to the
        # contract ValueError like every other header field (review r11:
        # the _decoded fix class initially missed this one)
        name = _decoded(
            raw_name, "ZIP member name",
            "utf-8" if _flags & 0x0800 else "cp437",
        )
        sentinels = [v == 0xFFFFFFFF for v in (usize, csize, lho)]
        if any(sentinels):
            vals = _zip64_extra(blob, pos + 46 + nlen, elen, sum(sentinels))
            it = iter(vals)
            usize = next(it) if sentinels[0] else usize
            csize = next(it) if sentinels[1] else csize
            lho = next(it) if sentinels[2] else lho
        pos += 46 + nlen + elen + clen
        lho += shift
        (lsig, _v, _f, lmethod, _lt, _ld, _lcrc, _lcs, _lus, lnlen, lelen) = (
            struct.unpack_from("<IHHHHHIIIHH", blob, lho)
        )
        if lsig != _ZIP_LOCAL_SIG:
            raise ValueError("local header signature mismatch")
        data_off = lho + 30 + lnlen + lelen
        payload = blob[data_off : data_off + csize]
        if len(payload) != csize:
            raise ValueError("member payload truncated")
        if lmethod == 8:
            # bounded by the CD-declared uncompressed size (r12 fuzz
            # find: the unbounded inflate ran BEFORE the usize equality
            # check, so a small bomb member could balloon first)
            data = bounded_inflate(
                payload, wbits=-15, expected=usize, what=f"member {name!r}"
            )
        elif lmethod == 0:
            data = payload
        else:
            raise NotImplementedError(f"ZIP compression method {lmethod} not supported")
        if len(data) != usize:
            raise ValueError(f"member {name!r}: size mismatch after inflate")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"member {name!r}: CRC-32 mismatch")
        members.append((name, data))
    return members


def _tar_header(name: str, size: int, *, typeflag: bytes = b"0",
                gnu_magic: bool = False) -> bytes:
    """One tar header block: octal size, the checksum computed with the
    chksum field as eight spaces; 'ustar\\0'+'00' POSIX magic or the GNU
    'ustar  \\0' variant for @LongLink entries."""
    raw = name.encode("utf-8")
    if len(raw) > 100:
        raise ValueError("header name field limited to 100 bytes")
    hdr = bytearray(512)
    hdr[0 : len(raw)] = raw
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}\x00".encode("ascii")
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156] = typeflag[0]
    if gnu_magic:
        hdr[257:265] = b"ustar  \x00"
    else:
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
    chksum = sum(hdr)
    hdr[148:156] = f"{chksum:06o}\x00 ".encode("ascii")
    return bytes(hdr)


def _pad512(data: bytes) -> bytes:
    return data + b"\x00" * (-len(data) % 512)


def build_tar(
    members: list[tuple[str, bytes]], *, longname_style: str = "gnu"
) -> bytes:
    """Pack members into a tar stream: header block + content padded to
    512, two zero blocks at the end. Names past ustar's 100-byte field
    get a long-name record first — GNU style (a '././@LongLink' entry
    with typeflag 'L' whose content is the full name) or PAX style (an
    'x' extended header carrying a `path=` record) — the two mechanisms
    real corpus tarballs actually use."""
    if longname_style not in ("gnu", "pax"):
        raise ValueError(f"unknown longname style {longname_style!r}")
    out = bytearray()
    for name, data in members:
        raw = name.encode("utf-8")
        if len(raw) > 100:
            if longname_style == "gnu":
                payload = raw + b"\x00"
                out += _tar_header(
                    "././@LongLink", len(payload), typeflag=b"L",
                    gnu_magic=True,
                )
                out += _pad512(payload)
            else:
                body = f" path={name}\n"
                # the length prefix counts ITSELF: fixed-point iterate
                ln = len(body.encode("utf-8"))
                while len(str(ln)) + len(body.encode("utf-8")) != ln:
                    ln = len(str(ln)) + len(body.encode("utf-8"))
                rec = (str(ln) + body).encode("utf-8")
                # the x-entry's own name is advisory; truncate by BYTES
                # (a char slice can overflow 100 bytes on non-ASCII)
                pax_name = ("./PaxHeaders/" + name).encode("utf-8")[:100]
                out += _tar_header(
                    pax_name.decode("utf-8", "ignore"), len(rec),
                    typeflag=b"x",
                )
                out += _pad512(rec)
            header_name = raw[:100].decode("utf-8", "ignore")
        else:
            header_name = name
        out += _tar_header(header_name, len(data))
        out += _pad512(data)
    out += b"\x00" * 1024
    return bytes(out)


def _decoded(raw: bytes, what: str, codec: str = "utf-8") -> str:
    """Strict decode normalized to the contract exception type: corrupt
    bytes in a header field are a bad-input fact, not a
    UnicodeDecodeError leak (r11 fuzz find — same class as parse_warc's
    header-name leak; the mbox rule)."""
    try:
        return raw.decode(codec)
    except UnicodeDecodeError as e:
        raise ValueError(f"undecodable {what}: {e}") from e


def _parse_pax_records(data: bytes) -> dict[str, str]:
    """PAX extended-header records: '<len> <key>=<value>\\n' repeated,
    with <len> counting the WHOLE record including its own digits."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.index(b" ", pos)
        ln = int(_decoded(data[pos:sp], "PAX record length", "ascii"))
        if ln <= 0 or pos + ln > len(data):
            raise ValueError("PAX record length out of bounds")
        rec = data[sp + 1 : pos + ln]
        if not rec.endswith(b"\n"):
            raise ValueError("PAX record missing newline terminator")
        key, _, value = _decoded(rec[:-1], "PAX record").partition("=")
        if not key:
            raise ValueError("PAX record without a key")
        out[key] = value
        pos += ln
    return out


def read_tar(blob: bytes) -> list[tuple[str, bytes]]:
    """Walk ustar headers, verifying the space-normalized checksum and
    the ustar magic (POSIX and GNU variants); stops at the zero-block
    terminator. GNU '@LongLink' ('L') entries and PAX extended headers
    ('x', `path=` record) override the following member's name — the
    two long-name mechanisms real corpus tarballs use. Only regular
    files (typeflag '0'/NUL) are returned; links/dirs raise — a corpus
    tar carrying anything else is malformed for this pipeline."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    pending_name: str | None = None
    while pos + 512 <= len(blob):
        hdr = blob[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        if hdr[257:262] != b"ustar":
            raise ValueError("missing ustar magic")
        stored = int(_decoded(hdr[148:156].rstrip(b"\x00 "), "tar checksum field", "ascii"), 8)
        if sum(hdr[:148]) + 8 * 32 + sum(hdr[156:]) != stored:
            raise ValueError("tar header checksum mismatch")
        typeflag = hdr[156]
        size = int(_decoded(hdr[124:136].rstrip(b"\x00 "), "tar size field", "ascii"), 8)
        start = pos + 512
        data = blob[start : start + size]
        if len(data) != size:
            raise ValueError("tar member truncated")
        pos = start + size + (-size % 512)
        if typeflag == ord("L"):  # GNU longname: applies to the NEXT entry
            if pending_name is not None:
                raise ValueError("stacked long-name records")
            pending_name = _decoded(data.rstrip(b"\x00"), "GNU long name")
            continue
        if typeflag == ord("x"):  # PAX extended header for the NEXT entry
            if pending_name is not None:
                raise ValueError("stacked long-name records")
            recs = _parse_pax_records(data)
            pending_name = recs.get("path")
            continue
        if typeflag == ord("g"):
            raise NotImplementedError(
                "PAX global extended headers not supported"
            )
        if typeflag not in (0, ord("0")):
            raise ValueError(f"non-regular tar member (typeflag {typeflag!r})")
        name = pending_name or _decoded(hdr[:100].rstrip(b"\x00"), "tar member name")
        pending_name = None
        members.append((name, data))
    else:
        raise ValueError("tar terminator missing")
    return members


def gzip_bytes(data: bytes, *, level: int = 6) -> bytes:
    """RFC 1952 gzip wrap (stdlib zlib, wbits=31 — deterministic: no
    mtime/filename in the header)."""
    comp = zlib.compressobj(level, zlib.DEFLATED, 31)
    return comp.compress(data) + comp.flush()


def gunzip_bytes(blob: bytes) -> bytes:
    """RFC 1952 gzip unwrap; trailing-garbage and multi-member streams
    raise (corpus tarballs are single-member). Output is capped at
    MAX_INFLATE_BYTES (r12: a ~1000:1 gzip bomb must not OOM the
    executor before the tar layer ever sees a header)."""
    d = zlib.decompressobj(47)  # auto-detect zlib/gzip headers
    cap = MAX_INFLATE_BYTES
    try:
        out = d.decompress(blob, cap + 1)
        while d.unconsumed_tail and len(out) <= cap:
            out += d.decompress(d.unconsumed_tail, cap + 1 - len(out))
    except zlib.error as e:
        raise ValueError(f"gzip stream corrupt: {e}") from e
    if len(out) > cap:
        raise ValueError(f"gzip stream exceeds {cap}-byte decompression cap")
    if not d.eof:
        raise ValueError("truncated gzip stream")
    if d.unused_data:
        raise ValueError("trailing bytes after gzip stream")
    return out + d.flush()


def compress_stream(data: bytes, codec: str, *, level: int = 6) -> bytes:
    """Whole-stream compression for tarball wrapping: gz (RFC 1952),
    bz2, or xz (both stdlib) — the three codecs corpus releases actually
    ship under."""
    if codec == "gz":
        return gzip_bytes(data, level=level)
    if codec == "bz2":
        import bz2

        return bz2.compress(data, compresslevel=max(1, level))
    if codec == "xz":
        import lzma

        return lzma.compress(data, preset=level)
    raise ValueError(f"unknown stream codec {codec!r}")


def decompress_auto(blob: bytes) -> bytes:
    """Codec auto-detection by magic bytes — how real tar readers pick
    the decompressor: gzip 1F 8B, bzip2 'BZh', xz FD '7zXZ' 00. Unknown
    magic raises rather than guessing."""
    if blob[:2] == b"\x1f\x8b":
        return gunzip_bytes(blob)
    if blob[:3] == b"BZh":
        # bounded: bzip2's worst case is ~10^6:1 — a 46 KB bomb is 46 GB
        return bounded_bz2(blob)
    if blob[:6] == b"\xfd7zXZ\x00":
        return bounded_xz(blob)
    raise ValueError("unknown compression magic (expected gzip/bzip2/xz)")


def _member_name(doc_id: int, *, deep: bool = False) -> str:
    if deep:
        # >100-byte member paths (the long-name tarball shape): the
        # depth prefix forces GNU/PAX long-name records
        return "docs/" + "shard-level/" * 9 + f"doc{doc_id:08d}.txt"
    return f"docs/doc{doc_id:08d}.txt"


def _doc_id_of(name: str) -> int:
    base = name.rsplit("/", 1)[-1]
    if not (base.startswith("doc") and base.endswith(".txt")):
        raise ValueError(f"unexpected member name {name!r}")
    return int(base[len("doc") : -len(".txt")])


def pack_archives(
    docs: DataFrame,
    *,
    fmt: str = "zip",
    group_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    deep_names: bool = False,
) -> DataFrame:
    """Group documents into bounded archives — archive_id = doc_id //
    group_size, members ordered by doc_id within the archive — and build
    one ZIP (or compressed ustar TAR) per group. `fmt` is "zip",
    "zip64" (forced ZIP64 structures — how big-data tools write every
    archive), "tar.gz", "tar.bz2", "tar.xz", or "tar.mixed" (codec
    cycles gz/bz2/xz by archive_id — the heterogeneous-release corpus
    shape; readers auto-detect by magic). `deep_names` gives members
    >100-byte paths, forcing GNU @LongLink records (even archives) or
    PAX extended headers (odd archives) on the tar paths. ONE shuffle on
    archive_id; the build itself is an Arrow applyInPandas over each
    group. Returns (archive_id long, payload binary)."""
    if fmt not in ("zip", "zip64", "tar.gz", "tar.bz2", "tar.xz", "tar.mixed"):
        raise ValueError(f"unknown archive format {fmt!r}")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        aid = int(pdf["archive_id"].iloc[0])
        members = [
            (_member_name(int(i), deep=deep_names), str(t).encode("utf-8"))
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        if fmt in ("zip", "zip64"):
            blob = build_zip(members, zip64=fmt == "zip64")
        else:
            codec = (
                ("gz", "bz2", "xz")[aid % 3]
                if fmt == "tar.mixed"
                else fmt.split(".", 1)[1]
            )
            style = ("gnu", "pax")[aid % 2] if deep_names else "gnu"
            blob = compress_stream(
                build_tar(members, longname_style=style), codec
            )
        return pd.DataFrame({"archive_id": [aid], "payload": [blob]})

    grouped = docs.select(
        F.col(id_col), F.col(text_col),
        (F.col(id_col) / group_size).cast("long").alias("archive_id"),
    )
    return grouped.groupBy("archive_id").applyInPandas(
        build, "archive_id long, payload binary"
    )


_MEMBER_SCHEMA = "doc_id long, chars long, fp string"


def archive_members(df: DataFrame, *, fmt: str = "zip") -> DataFrame:
    """Extract archive members distributed (Arrow mapInPandas, map-only
    — archives are self-contained, so no shuffle touches member bytes):
    one row per member with the recovered text's char count and md5, the
    losslessness fingerprint the ingest oracle hash-checks against the
    ORIGINAL documents table."""
    if fmt not in ("zip", "zip64") and not fmt.startswith("tar"):
        raise ValueError(f"unknown archive format {fmt!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["payload"]:
                b = bytes(blob)
                # tar codec is auto-detected by magic, so one reader
                # handles gz/bz2/xz and mixed-codec corpora alike
                members = (
                    read_zip(b) if fmt.startswith("zip")
                    else read_tar(decompress_auto(b))
                )
                for name, data in members:
                    rows.append(
                        {
                            "doc_id": _doc_id_of(name),
                            "chars": len(data.decode("utf-8")),
                            "fp": hashlib.md5(data).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "chars", "fp"])

    return df.select("payload").mapInPandas(run, _MEMBER_SCHEMA)


_DOC_SCHEMA = "doc_id long, text string"


def archive_documents(df: DataFrame, *, fmt: str = "zip") -> DataFrame:
    """Extract archive members as full documents — (doc_id, text) — the
    corpus-landing form of `archive_members` (same map-only Arrow pass,
    same CRC/checksum verification; this one ships the text to the sink
    instead of a fingerprint). Used by the streaming crawl ingest."""
    if fmt not in ("zip", "zip64") and not fmt.startswith("tar"):
        raise ValueError(f"unknown archive format {fmt!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["payload"]:
                b = bytes(blob)
                members = (
                    read_zip(b) if fmt.startswith("zip")
                    else read_tar(decompress_auto(b))
                )
                for name, data in members:
                    rows.append(
                        {"doc_id": _doc_id_of(name), "text": data.decode("utf-8")}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return df.select("payload").mapInPandas(run, _DOC_SCHEMA)
