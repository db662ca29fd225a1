"""ID codecs: TID ↔ datetime, DID ↔ key, at:// URI ↔ post id.

Semantics match /root/reference/src/main.rs:4101-4199. TIDs are the
base32-sortable encoding (alphabet "234567abcdefghijklmnopqrstuvwxyz") of
``unix_micros << 9`` — lexicographic order == time order, which is what made
the reference's history windows B-tree range scans. Our engine keeps a native
timestamp column instead and only needs these codecs at the API boundary, so
the TID codec is plain Python (driver-side, per-request scalars); the
DID/URI rewrites are pure Column expressions (JVM-side, codegen'd) because
they appear in row-level transforms.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, functions as F

__all__ = [
    "datetime_to_tid",
    "tid_to_datetime",
    "did_to_key_col",
    "key_to_did_col",
    "post_id_to_uri_col",
    "at_uri_to_post_id_col",
]

_B32_SORT = "234567abcdefghijklmnopqrstuvwxyz"
_B32_INDEX = {c: i for i, c in enumerate(_B32_SORT)}


def datetime_to_tid(dt: _dt.datetime) -> str:
    """base32-sort(unix_micros << 9) — main.rs:4195-4199 (13 chars for a
    64-bit value, matching data_encoding's unpadded big-endian encode)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    # exact integer micros — float timestamp()*1e6 drops the last µs
    micros = (dt - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)) // _dt.timedelta(microseconds=1)
    v = (micros << 9) & ((1 << 64) - 1)
    # 64 bits → 13 base32 chars (ceil(64/5)=13), value left-aligned like
    # data_encoding's bit-stream encode of the 8 big-endian bytes
    bits = v.to_bytes(8, "big")
    out = []
    acc = 0
    nbits = 0
    for byte in bits:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= 5:
            out.append(_B32_SORT[(acc >> (nbits - 5)) & 31])
            nbits -= 5
    if nbits:
        out.append(_B32_SORT[(acc << (5 - nbits)) & 31])
    return "".join(out)


def tid_to_datetime(tid: str) -> _dt.datetime:
    """Inverse of datetime_to_tid (for API interop / tests)."""
    acc = 0
    nbits = 0
    data = bytearray()
    for ch in tid:
        acc = (acc << 5) | _B32_INDEX[ch]
        nbits += 5
        while nbits >= 8:
            data.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    v = int.from_bytes(data[:8], "big")
    micros = v >> 9
    return _dt.datetime.fromtimestamp(micros / 1_000_000, tz=_dt.timezone.utc)


def did_to_key_col(did: Column) -> Column:
    """did:plc:x → plc_x; did:web:a-b.c → web_a__b_c (main.rs:4151-4170).
    Unsupported DID methods yield NULL (reference errors)."""
    plc = F.concat(F.lit("plc_"), F.substring(did, 9, 1 << 20))
    web_host = F.substring(did, 9, 1 << 20)
    web = F.concat(
        F.lit("web_"),
        F.regexp_replace(F.regexp_replace(web_host, "-", "__"), "\\.", "_"),
    )
    key = F.when(did.startswith("did:plc:"), plc).when(did.startswith("did:web:"), web)
    return F.when(key.rlike("^(plc|web)_[a-z0-9_]+$"), key)


def key_to_did_col(key: Column) -> Column:
    """unsafe_key_to_did — every '_' → ':' (main.rs:4172-4174)."""
    return F.regexp_replace(key, "_", ":")


def post_id_to_uri_col(post_id: Column) -> Column:
    """convert_post_id_to_uri (main.rs:4105-4125): "post:<rkey>_<method>_<id>"
    → "at://did:<method>:<id>/app.bsky.feed.post/<rkey>"; web hosts undo the
    `__`→'-' and '_'→'.' rewrites."""
    last = F.element_at(F.split(post_id, ":"), -1)
    rkey = F.regexp_extract(last, "^([^_]+)_", 1)
    method = F.regexp_extract(last, "^[^_]+_([^_]+)_", 1)
    rest = F.regexp_replace(last, "^[^_]+_[^_]+_", "")
    host = F.when(
        method == "web",
        # reverse order of did_to_key: "__"→"-" first, then "_"→"."
        F.regexp_replace(F.regexp_replace(rest, "__", "-"), "_", "."),
    ).otherwise(rest)
    return F.concat(F.lit("at://did:"), method, F.lit(":"), host, F.lit("/app.bsky.feed.post/"), rkey)


def at_uri_to_post_id_col(uri: Column) -> Column:
    """at_uri_to_post_id (main.rs:4127-4149): at://<did>/<collection>/<rkey>
    → "<post|list>:<rkey>_<did_key>"; unsupported collections/dids → NULL."""
    parts = F.split(uri, "/")
    # try_element_at: under ANSI (Spark 4 default) element_at THROWS on
    # a too-short split — a malformed URI must yield NULL per this
    # function's contract, not crash the query (r13 hardening, same
    # class as the scripting scope's empty-langs fix)
    hostname = F.try_element_at(parts, F.lit(3))
    collection_raw = F.try_element_at(parts, F.lit(4))
    rkey = F.try_element_at(parts, F.lit(5))
    collection = (
        F.when(collection_raw == "app.bsky.feed.post", F.lit("post"))
        .when(collection_raw == "app.bsky.graph.list", F.lit("list"))
    )
    did_key = did_to_key_col(hostname)
    valid_rkey = rkey.rlike("^[a-z0-9\\-]+$")
    return F.when(
        collection.isNotNull() & did_key.isNotNull() & valid_rkey,
        F.concat(collection, F.lit(":"), rkey, F.lit("_"), did_key),
    )
