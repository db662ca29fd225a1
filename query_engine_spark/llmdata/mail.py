"""Email-corpus ingestion: mailing-list archives are a classic text
corpus and they ship as MBOX files of MIME messages. The pipeline logic
this module owns:

- MBOX FRAMING (mboxrd): messages are delimited by lines starting
  ``From `` — so any BODY line starting with ``From `` is quoted with a
  ``>`` on write and unquoted on read (``>From`` → one ``>`` stripped,
  per mboxrd). Splitting on unquoted ``From `` without the quote dance
  truncates messages mid-body — the classic mbox corpus bug.
- TEXT-PART SELECTION: multipart/alternative messages contribute their
  text/plain part only; transfer encodings (quoted-printable, base64)
  decode through the stdlib `email` package (the reference
  implementation, used the way zlib is used for DEFLATE).
- HEADER EXTRACTION: RFC 2047 encoded-word subjects decode; the From
  address reduces to its domain (the grouping key list-corpus curation
  actually uses).

Spark shape: one map-only Arrow pass per mbox payload; only the
extracted rows leave the executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def build_message(
    *, from_addr: str, subject: str, body: str, html: str | None = None,
    cte: str = "quoted-printable",
) -> bytes:
    """One MIME message: text/plain (with the requested transfer
    encoding), optionally wrapped in multipart/alternative next to an
    HTML part the extractor must NOT pick."""
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = from_addr
    msg["Subject"] = subject
    msg["Date"] = "Thu, 01 Jan 2024 00:00:00 +0000"
    msg.set_content(body, cte=cte)
    if html is not None:
        msg.add_alternative(f"<html><body><p>{html}</p></body></html>",
                            subtype="html")
    return msg.as_bytes()


def build_mbox(messages: list[bytes]) -> bytes:
    """Frame messages as mboxrd: an envelope ``From `` line before each
    message, body lines matching ``^>*From `` quoted with one more
    ``>``."""
    out = bytearray()
    for k, raw in enumerate(messages):
        out += f"From corpus@example Thu Jan  1 00:00:0{k % 10} 2024\n".encode()
        for line in raw.split(b"\n"):
            stripped = line.lstrip(b">")
            if stripped.startswith(b"From "):
                out += b">"
            out += line + b"\n"
        out += b"\n"
    return bytes(out)


def split_mbox(blob: bytes) -> list[bytes]:
    """Split an mboxrd file back into raw messages, reversing the
    ``>From`` quoting. A file not starting with ``From `` raises —
    that is not an mbox."""
    if not blob.startswith(b"From "):
        raise ValueError("not an mbox (missing leading 'From ' envelope)")
    # the framing adds exactly one line-terminator (when the message
    # lacked one) plus one separator newline; reversing must remove
    # exactly that much — rstrip-ALL would eat blank lines a message
    # legitimately ends with (code-review finding). Normalize the EOF
    # form first so the final message splits like a mid-file one.
    if blob.endswith(b"\n"):
        blob = blob[:-1]
    messages: list[bytes] = []
    cur: list[bytes] | None = None

    def _emit(parts: list[bytes]) -> None:
        joined = b"\n".join(parts)
        messages.append(joined[:-1] if joined.endswith(b"\n") else joined)

    for line in blob.split(b"\n"):
        if line.startswith(b"From "):
            if cur is not None:
                _emit(cur)
            cur = []
            continue
        stripped = line.lstrip(b">")
        if stripped.startswith(b"From ") and line.startswith(b">"):
            line = line[1:]  # un-quote one level
        assert cur is not None
        cur.append(line)
    if cur is not None:
        _emit(cur)
    return messages


def extract_message(raw: bytes) -> dict:
    """Decode one message: RFC 2047 subject, From domain, and the
    text/plain body (transfer-decoded). Messages without a text/plain
    part raise — silently substituting HTML changes the corpus."""
    import email
    import email.policy

    # stdlib email leaks its own exception types on malformed headers,
    # unknown charsets and broken transfer encodings — normalize all of
    # them to ValueError so callers see ONE contract exception type.
    # Failures are intentionally LOUD at the job level (the repo-wide
    # corrupt-input posture: a bad message fails the batch rather than
    # silently landing wrong text); a skip-and-flag wrapper belongs in
    # the caller that wants lossy ingest, not here
    try:
        msg = email.message_from_bytes(raw, policy=email.policy.default)
        subject = msg["Subject"]
        from_addr = msg["From"]
        if from_addr is None or "@" not in str(from_addr):
            raise ValueError("message without a parseable From address")
        domain = str(from_addr).rsplit("@", 1)[1].strip(">").lower()
        body_part = msg.get_body(preferencelist=("plain",))
        if body_part is None:
            raise ValueError("message without a text/plain part")
        return {
            "subject": str(subject) if subject is not None else None,
            "from_domain": domain,
            "text": body_part.get_content(),
        }
    except (LookupError, UnicodeDecodeError, KeyError, TypeError,
            AttributeError) as e:
        raise ValueError(f"undecodable message: {e}") from e


_MBOX_SCHEMA = (
    "box_id long, msg_idx int, subject string, from_domain string, "
    "chars long, fp string"
)


def mbox_messages(df: DataFrame, *, id_col: str = "box_id") -> DataFrame:
    """Distributed mbox ingestion (Arrow mapInPandas, map-only): one row
    per message with the decoded subject, sender domain, and the
    text/plain body's char count + md5 — the list-corpus curation
    fingerprint."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, payload in zip(pdf[id_col], pdf["payload"]):
                for k, raw in enumerate(split_mbox(bytes(payload))):
                    meta = extract_message(raw)
                    rows.append(
                        {
                            "box_id": bid,
                            "msg_idx": k,
                            "subject": meta["subject"],
                            "from_domain": meta["from_domain"],
                            "chars": len(meta["text"]),
                            "fp": hashlib.md5(
                                meta["text"].encode("utf-8")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "box_id", "msg_idx", "subject", "from_domain", "chars", "fp",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(run, _MBOX_SCHEMA)
