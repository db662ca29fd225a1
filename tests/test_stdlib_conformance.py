"""Cross-validation of the repo's container codecs against the Python
STANDARD LIBRARY's independent implementations, in BOTH directions —
the r8 lesson generalized: an external conformance anchor is cheaper
and stronger than a hand-authored golden wherever the stdlib ships a
reader/writer (tar already cross-validates against `tarfile`; this
module adds ZIP/ZIP64 vs `zipfile`, WAV vs `wave`, AU vs `sunau`, AIFF
vs `aifc`). Roundtrip tests inside a co-developed encode/decode pair
cannot catch mirrored misinterpretations; stdlib agreement can.

`sunau`/`aifc` are deprecated (removed in 3.13) — gated with
importorskip so the suite survives an interpreter upgrade; the in-repo
goldens remain the permanent anchors.
"""

from __future__ import annotations

import io
import os
import struct
import sys
import warnings

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_engine_spark.llmdata import archives as A
from query_engine_spark.llmdata import multimodal as MM

_MEMBERS = [
    ("a.txt", b"hello stdlib"),
    ("dir/b.bin", bytes(range(256)) * 3),
    ("empty", b""),
    ("unicode-é.txt", "café   text".encode("utf-8")),
]

_SAMPLES = [((i * 37) % 65536) - 32768 for i in range(120)]


class _KeepOpen(io.BytesIO):
    """BytesIO whose close() is a no-op — aifc/wave close the underlying
    file inside their own close(), which must not discard the buffer."""

    def close(self) -> None:  # noqa: D401
        pass


# ---------------------------------------------------------------------------
# ZIP / ZIP64 vs zipfile


@pytest.mark.parametrize("zip64", [False, True], ids=["classic", "zip64"])
def test_zipfile_reads_our_archives(zip64):
    blob = A.build_zip(_MEMBERS, zip64=zip64)
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.testzip() is None  # stdlib CRC check over every member
        got = [(n, zf.read(n)) for n in zf.namelist()]
    assert got == _MEMBERS


def test_we_read_zipfile_archives_stored_and_deflated():
    import zipfile

    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", method) as zf:
            for n, d in _MEMBERS:
                zf.writestr(n, d)
        assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_forced_zip64():
    """zipfile's force_zip64 writes the sentinel local sizes + 0x0001
    extras + ZIP64 EOCD/locator — the exact wire shape our reader's
    ZIP64 path claims to implement, produced by an independent writer."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            with zf.open(n, "w", force_zip64=True) as f:
                f.write(d)
    assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_with_archive_comment():
    """An EOCD trailed by an archive comment moves the record off the
    file tail — the up-to-64KiB backward comment window (APPNOTE 4.3.16)
    must still find it. zipfile is the independent comment writer."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            zf.writestr(n, d)
        zf.comment = b"corpus export manifest v3 " * 40
    assert A.read_zip(buf.getvalue()) == _MEMBERS


def test_we_read_zipfile_streamed_with_data_descriptors():
    """zipfile writing through a NON-SEEKABLE stream sets general-purpose
    flag bit 3 and emits post-payload data descriptors with zeroed local
    header sizes — the wire shape of piped exports. A central-directory-
    driven reader (sizes from the CD, data offset from the local header)
    is immune; a local-header-walking reader would misread every
    member."""
    import zipfile

    class _NoSeek:
        def __init__(self):
            self.buf = bytearray()

        def write(self, b):
            self.buf += b
            return len(b)

        def flush(self):
            pass

    ns = _NoSeek()
    with zipfile.ZipFile(ns, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in _MEMBERS:
            zf.writestr(n, d)
    blob = bytes(ns.buf)
    assert blob[6] & 0x08, "zipfile should have set the descriptor flag"
    assert A.read_zip(blob) == _MEMBERS


def test_zip_crossed_roundtrip_through_both_engines():
    """ours -> zipfile re-write -> ours: content survives a full trip
    through the foreign implementation."""
    import zipfile

    blob = A.build_zip(_MEMBERS, zip64=True)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        rebuf = io.BytesIO()
        with zipfile.ZipFile(rebuf, "w", zipfile.ZIP_DEFLATED) as out:
            for n in zf.namelist():
                out.writestr(n, zf.read(n))
    assert A.read_zip(rebuf.getvalue()) == _MEMBERS


# ---------------------------------------------------------------------------
# WAV vs wave


def test_wave_reads_our_wav():
    import wave

    blob = MM.make_wav(3, 100)
    with wave.open(io.BytesIO(blob)) as wf:
        assert (wf.getnchannels(), wf.getsampwidth(), wf.getframerate()) == (
            1, 2, wf.getframerate(),
        )
        frames = wf.readframes(wf.getnframes())
    got = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    want = [((3 * 131 + i * 17) % 65536) - 32768 for i in range(100)]
    assert got == want


def test_we_read_wave_written_pcm16():
    import wave

    buf = _KeepOpen()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(16000)
    ww.writeframes(b"".join(struct.pack("<h", s) for s in _SAMPLES))
    ww.close()
    rate, n, _dur, sample_sum, peak, first = MM.decode_wav(buf.getvalue())
    assert (rate, n, first) == (16000, len(_SAMPLES), _SAMPLES[0])
    assert sample_sum == sum(_SAMPLES)  # decode_wav's fold is the SIGNED sum
    assert peak == max(_SAMPLES)


# ---------------------------------------------------------------------------
# AU vs sunau (deprecated stdlib — skip cleanly if removed)


def test_sunau_reads_our_au():
    sunau = pytest.importorskip("sunau")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        blob = MM.make_au(4, 60, 8000)
        sf = sunau.open(io.BytesIO(blob))
        assert (sf.getnchannels(), sf.getsampwidth(), sf.getframerate(),
                sf.getnframes()) == (1, 2, 8000, 60)
        frames = sf.readframes(60)
    got = list(struct.unpack(">60h", frames))
    want = [((4 * 131 + i * 17) % 65536) - 32768 for i in range(60)]
    assert got == want


def test_we_read_sunau_written_linear16():
    sunau = pytest.importorskip("sunau")
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        sw = sunau.open(buf, "wb")
        # sunau's writer DEFAULTS to comptype 'ULAW' (a historical trap:
        # PCM input would be written byte-truncated under a mu-law
        # encoding tag) — request linear explicitly
        sw.setcomptype("NONE", "not compressed")
        sw.setnchannels(1)
        sw.setsampwidth(2)
        sw.setframerate(8000)
        sw.writeframes(b"".join(struct.pack(">h", s) for s in _SAMPLES))
        sw.close()
    rate, n, samples = MM.decode_au(buf.getvalue())
    assert (rate, n) == (8000, len(_SAMPLES))
    assert samples == _SAMPLES


def test_we_read_sunau_written_mulaw():
    """sunau comptype ULAW CONVERTS linear input to mu-law bytes on
    write (via audioop.lin2ulaw) — our G.711 expansion of those bytes
    must agree sample-for-sample with audioop's own ulaw2lin, the
    independent implementation of the same table."""
    sunau = pytest.importorskip("sunau")
    audioop = pytest.importorskip("audioop")
    # audioop (and therefore sunau's ULAW conversion) treats linear
    # fragments as NATIVE-endian — pack accordingly and unpack audioop's
    # expansion the same way
    pcm = b"".join(struct.pack("=h", s) for s in _SAMPLES)
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        sw = sunau.open(buf, "wb")
        sw.setcomptype("ULAW", "")
        sw.setnchannels(1)
        sw.setsampwidth(2)
        sw.setframerate(8000)
        sw.writeframes(pcm)
        sw.close()
        ulaw_bytes = audioop.lin2ulaw(pcm, 2)
        want = list(
            struct.unpack(
                f"={len(_SAMPLES)}h", audioop.ulaw2lin(ulaw_bytes, 2)
            )
        )
    rate, n, samples = MM.decode_au(buf.getvalue())
    assert (rate, n) == (8000, len(_SAMPLES))
    assert samples == want


def test_our_mulaw_table_equals_audioop_expansion():
    """The repo's 256-entry G.711 mu-law LUT (shared by the WAV tag-7
    and AU encoding-1 paths) must equal audioop's st_ulaw2linear16 —
    the independent CCITT-derived implementation — on EVERY byte."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        expanded = audioop.ulaw2lin(bytes(range(256)), 2)
    want = np.frombuffer(expanded, dtype="=i2").astype(np.int64)
    ours = np.asarray(MM._MULAW_LUT[np.arange(256)], dtype=np.int64)
    assert (ours == want).all()


def test_our_alaw_table_equals_audioop_expansion():
    """Same anchor for the A-law LUT (WAV format tag 6) vs audioop's
    alaw2lin."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        expanded = audioop.alaw2lin(bytes(range(256)), 2)
    want = np.frombuffer(expanded, dtype="=i2").astype(np.int64)
    ours = np.asarray(MM._ALAW_LUT[np.arange(256)], dtype=np.int64)
    assert (ours == want).all()


# ---------------------------------------------------------------------------
# AIFF vs aifc (deprecated stdlib — skip cleanly if removed)


def test_aifc_reads_our_aiff():
    aifc = pytest.importorskip("aifc")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        blob = MM.make_aiff(5, 60, 8000)
        af = aifc.open(io.BytesIO(blob))
        assert (af.getnchannels(), af.getsampwidth(), af.getframerate(),
                af.getnframes()) == (1, 2, 8000, 60)
        frames = af.readframes(60)
    got = list(struct.unpack(">60h", frames))
    want = [((5 * 131 + i * 17) % 65536) - 32768 for i in range(60)]
    assert got == want


def test_we_read_aifc_written_pcm16():
    aifc = pytest.importorskip("aifc")
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        aw = aifc.open(buf, "wb")
        aw.aiff()  # plain AIFF, not AIFF-C
        aw.setnchannels(1)
        aw.setsampwidth(2)
        aw.setframerate(11025)
        aw.writeframes(b"".join(struct.pack(">h", s) for s in _SAMPLES))
        aw.close()
    rate, n, samples = MM.decode_aiff(buf.getvalue())
    assert (rate, n) == (11025, len(_SAMPLES))
    assert samples == _SAMPLES
