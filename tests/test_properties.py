"""Property-based tests (hypothesis) for wide-input-space components."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from query_engine_spark.functions.ids import datetime_to_tid, tid_to_datetime
from query_engine_spark.functions.scripting import RHAI_SCOPE_COLUMNS, translate_script

UTC = dt.timezone.utc

# micros range: 2000-01-01 .. 2100-01-01 (TID uses unix_micros << 9, u64)
_MICROS = st.integers(min_value=946_684_800_000_000, max_value=4_102_444_800_000_000)


@given(_MICROS)
@settings(max_examples=200, deadline=None)
def test_tid_roundtrip(us):
    t = dt.datetime.fromtimestamp(us / 1_000_000, tz=UTC)
    t = dt.datetime.fromtimestamp(us // 1_000_000, tz=UTC) + dt.timedelta(microseconds=us % 1_000_000)
    tid = datetime_to_tid(t)
    assert len(tid) == 13
    assert tid_to_datetime(tid) == t


@given(_MICROS, _MICROS)
@settings(max_examples=200, deadline=None)
def test_tid_order_preserving(a, b):
    ta = dt.datetime.fromtimestamp(a // 1_000_000, tz=UTC) + dt.timedelta(microseconds=a % 1_000_000)
    tb = dt.datetime.fromtimestamp(b // 1_000_000, tz=UTC) + dt.timedelta(microseconds=b % 1_000_000)
    assert (datetime_to_tid(ta) < datetime_to_tid(tb)) == (ta < tb)


_num = st.integers(min_value=0, max_value=1000)
_ident = st.sampled_from(["likeCount", "replyCount", "repostCount", "imageCount"])
_cmp = st.sampled_from([">", "<", ">=", "<=", "==", "!="])
_bool_op = st.sampled_from(["&&", "||"])


@st.composite
def scripts(draw):
    """Random conjunctions of comparisons — the observed Rhai usage shape."""
    n = draw(st.integers(min_value=1, max_value=3))
    parts = []
    for _ in range(n):
        parts.append(f"{draw(_ident)} {draw(_cmp)} {draw(_num)}")
    out = parts[0]
    for p in parts[1:]:
        out += f" {draw(_bool_op)} {p}"
    return out


@given(scripts(), st.integers(0, 500), st.integers(0, 50), st.integers(0, 50), st.integers(0, 4))
@settings(max_examples=60, deadline=None)
def test_script_translation_matches_python(spark, script, likes, replies, reposts, images):
    """The translated Catalyst expression must agree with a direct Python
    evaluation of the same expression over the same scope."""
    col = translate_script(script, now_epoch_expr="0")
    # evaluate in python
    py = (
        script.replace("&&", " and ")
        .replace("||", " or ")
        .replace("likeCount", str(likes))
        .replace("replyCount", str(replies))
        .replace("repostCount", str(reposts))
        .replace("imageCount", str(images))
    )
    expected = bool(eval(py))  # noqa: S307 — generated from a fixed grammar

    row = spark.createDataFrame(
        [(likes, replies, reposts, 0, images)],
        "like_count int, reply_count int, repost_count int, quote_count int, image_count int",
    ).select(col.alias("v")).collect()[0]
    assert bool(row["v"]) == expected


def test_script_scope_is_complete():
    # every scope variable the reference exposes translates (main.rs:2596-2624)
    for ident in RHAI_SCOPE_COLUMNS:
        translate_script(f"{ident} == {ident}", now_epoch_expr="0")




# --- multimodal codecs: decode(make(...)) over the whole parameter space ----

from query_engine_spark.llmdata import multimodal as MM  # noqa: E402


@given(
    mid=st.integers(min_value=0, max_value=10**9),
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(mid, w, h):
    gw, gh, bpp, px_sum, top_left = MM.decode_bmp(MM.make_bmp(mid, w, h))
    assert (gw, gh, bpp) == (w, h, 24)
    assert px_sum == sum(
        (mid * 31 + y * 7 + x * 3 + c) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )
    assert top_left == mid * 31 % 256


@given(
    mid=st.integers(min_value=0, max_value=10**9),
    n=st.integers(min_value=1, max_value=500),
    rate=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(mid, n, rate):
    grate, gn, dur, amp_sum, peak, first = MM.decode_wav(MM.make_wav(mid, n, rate))
    samples = [((mid * 131 + i * 17) % 65536) - 32768 for i in range(n)]
    assert (grate, gn, dur) == (rate, n, n * 1000 // rate)
    assert (amp_sum, peak, first) == (sum(samples), max(samples), samples[0])


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_decoders_never_silently_accept_garbage(data):
    import pytest

    for decode in (MM.decode_bmp, MM.decode_wav):
        try:
            decode(data)
        except (ValueError, NotImplementedError, IndexError):
            pass
        else:  # pragma: no cover - random bytes forming a valid file
            pytest.fail("decoder accepted random garbage")


@given(
    mid=st.integers(min_value=0, max_value=10**9),
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=12),
    nf=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_property(mid, w, h, nf):
    gw, gh, frames = MM.demux_avi(MM.make_avi(mid, w, h, nf))
    assert (gw, gh, len(frames)) == (w, h, nf)
    stride = (w * 3 + 3) & ~3
    f = nf - 1
    want = sum(
        (mid * 31 + f * 97 + y * 7 + x * 3 + c) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )
    got = sum(sum(frames[f][r * stride : r * stride + w * 3]) for r in range(h))
    assert got == want


@given(
    st.binary(min_size=0, max_size=4000),
    st.sampled_from([2, 4, 8]),
)
@settings(max_examples=100, deadline=None)
def test_lzw_roundtrip_property(data, mcs):
    """GIF LZW: decompress(compress(x)) == x for arbitrary byte streams
    whose symbols fit the code size — covers width growth, KwKwK runs, and
    (via long inputs elsewhere) dictionary resets."""
    from query_engine_spark.llmdata.multimodal import _lzw_compress, _lzw_decompress

    clipped = bytes(b % (1 << mcs) for b in data)
    assert _lzw_decompress(_lzw_compress(clipped, mcs), mcs) == clipped


@given(st.integers(min_value=0, max_value=500), st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_property(mid, w, h):
    """decode(make_gif(...)) reproduces the generator arithmetic for any
    size, including single-pixel and wide/flat shapes."""
    from query_engine_spark.llmdata.multimodal import decode_gif, make_gif

    gw, gh, idx_sum, rgb_sum, tl = decode_gif(make_gif(mid, w, h))
    exp = [(mid * 31 + y * 7 + x * 3) % 256 for y in range(h) for x in range(w)]
    assert (gw, gh) == (w, h)
    assert idx_sum == sum(exp)
    assert rgb_sum == sum(v + (v * 3) % 256 + (v * 7) % 256 for v in exp)
    assert tl == exp[0]


@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300))
@settings(max_examples=25, deadline=None)
def test_countmin_one_sided_property(spark, items):
    """est >= exact for EVERY item, on arbitrary multisets and a deliberately
    tiny (collision-heavy) sketch."""
    import pyspark.sql.functions as F
    from query_engine_spark.operators import sketches as Sk

    df = spark.createDataFrame([(i,) for i in items], "user_id long")
    sketch = Sk.countmin_sketch(df, "user_id", d=3, w=8)
    est = {r.user_id: r.cm_est for r in
           Sk.countmin_estimate(sketch, df.distinct(), "user_id", d=3, w=8).collect()}
    exact = {r.user_id: r.cnt for r in
             df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(est[u] >= c for u, c in exact.items())
    # total mass conservation per row: sum of sketch counts == d * n
    mass = sum(r.cnt for r in sketch.collect())
    assert mass == 3 * len(items)


@given(
    st.text(alphabet="abcdef gh", min_size=20, max_size=60),
    st.text(alphabet="mnopqr st", min_size=20, max_size=60),
    st.text(alphabet="uvwxyz ab", min_size=8, max_size=30),
)
@settings(max_examples=20, deadline=None)
def test_winnowing_shared_substring_guarantee(spark, pre, post, shared):
    """Schleimer'03 theorem, property form: any two docs sharing a substring
    of length >= w + k - 1 (= 8 at k=5, w=4) share >= 1 fingerprint hash."""
    from query_engine_spark.llmdata import textstats as Tx

    docs = spark.createDataFrame(
        [(1, pre + shared + post), (2, post + shared + pre)],
        "doc_id long, text string",
    )
    out = Tx.winnow_fingerprints(docs, k=5, w=4)
    fps = {}
    for r in out.collect():
        fps.setdefault(r.doc_id, set()).add(r.fph)
    if len(shared) >= 8:
        assert fps.get(1, set()) & fps.get(2, set()), (pre, post, shared)


@given(st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_cusum_reflection_identity(steps):
    """The no-reset closed form S_t = U_t - min(0, cummin U) used by
    cusum_batch equals the direct recursion S_t = max(0, S_{t-1} + step)
    ... for the no-reset variant the recursion is S_t = U_t - running
    floor; prove the reflection identity over arbitrary integer steps."""
    u, umin = 0, 0
    s_closed = []
    for x in steps:
        u += x
        umin = min(umin, u)
        s_closed.append(u - min(0, umin))
    # direct max(0, .) recursion
    s = 0
    s_rec = []
    for x in steps:
        s = max(0, s + x)
        s_rec.append(s)
    assert s_closed == s_rec


@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=9, max_value=40),
    st.integers(min_value=8, max_value=30),
    st.integers(min_value=2, max_value=3),
)
@settings(max_examples=60, deadline=None)
def test_dhash_invariant_under_integer_upscale(media_id, w, h, k):
    """dHash's purpose, as a property: a nearest-neighbor kx upscale
    samples back to the identical 9x8 grid for ANY image and integer k."""
    from query_engine_spark.llmdata.multimodal import make_bmp, resize_bmp, dhash_bmp_bands

    blob = make_bmp(media_id, w, h)
    up = resize_bmp(blob, w * k, h * k)
    assert dhash_bmp_bands(blob) == dhash_bmp_bands(up)


@given(
    st.integers(min_value=0, max_value=2**16 - 1),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=2, max_value=10),
)
@settings(max_examples=60, deadline=None)
def test_audio_mask_level_invariant(media_id, n32, gain):
    """The above-mean loudness mask is level-invariant: scaling every
    sample by a constant gain scales each frame energy AND the total
    equally, so energy*32 > total is unchanged (as long as nothing
    clips int16)."""
    import struct
    from query_engine_spark.llmdata.multimodal import (
        make_wav_tone, audio_envelope_bands, _pack_wav_pcm,
    )

    n = 32 * n32
    base = make_wav_tone(media_id, n)
    # make_wav_tone samples are in [0, 1996]; gain<=10 stays within int16
    pos, data = 12, b""
    end = 8 + struct.unpack_from("<I", base, 4)[0]
    while pos + 8 <= end:
        cid = base[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", base, pos + 4)
        if cid == b"data":
            data = base[pos + 8:pos + 8 + csize]
        pos += 8 + csize + (csize & 1)
    scaled = b"".join(
        struct.pack("<h", struct.unpack_from("<h", data, 2 * i)[0] * gain)
        for i in range(len(data) // 2)
    )
    assert audio_envelope_bands(base) == audio_envelope_bands(_pack_wav_pcm(scaled, 8000))
