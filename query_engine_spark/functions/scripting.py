"""Rhai-script → Spark Column translator (SURVEY §2.9).

The reference's only UDF mechanism is Rhai scripts in two places: the `where`
filter (/root/reference/src/main.rs:1952-1971) and `score value` blocks
(main.rs:2162-2175), both evaluated per post against the fixed scope of
`create_rhai_scope_for_post` (main.rs:2596-2624):

    likeCount, replyCount, repostCount, quoteCount, imageCount : int
    lang     : first element of langs ("" if empty)
    tsMillis : created_at epoch millis
    ageSeconds : now - created_at, whole seconds
    score    : accumulated global score (float; `where` only)

Observed scripts are arithmetic/boolean expressions over that scope. We
translate them to a Spark SQL expression (JVM-side, codegen'd — the fast
path); scripts using Rhai features beyond the expression grammar are rejected
with ``ScriptTranslationError`` so callers can surface a clear error (a
sandboxed Python UDF fallback would be the slow path; not wired by default
because nothing in the observed surface needs it).

Translation is a strict tokenizer + identifier mapping, not a regex splice:
unknown identifiers/operators fail loudly rather than producing wrong SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

__all__ = ["ScriptTranslationError", "translate_script", "RHAI_SCOPE_COLUMNS"]


class ScriptTranslationError(ValueError):
    pass


# scope name → SQL expression over the posts schema (datamodel.POST_SCHEMA).
# `now` placeholders are substituted by the caller for determinism.
RHAI_SCOPE_COLUMNS: dict[str, str] = {
    "likeCount": "like_count",
    "replyCount": "reply_count",
    "repostCount": "repost_count",
    "quoteCount": "quote_count",
    "imageCount": "image_count",
    "lang": "coalesce(element_at(langs, 1), '')",
    "tsMillis": "unix_millis(ts)",
    "ageSeconds": "(__now_epoch__ - unix_seconds(ts))",
    "score": "score",
}

_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||==|!=|<=|>=|[-+*/%<>!()])
    """,
    re.VERBOSE,
)

_OP_MAP = {"&&": " AND ", "||": " OR ", "!": " NOT ", "==": " = "}
_KEYWORDS = {"true": "true", "false": "false"}


def translate_script(script: str, *, now_epoch_expr: str = "unix_seconds(current_timestamp())") -> Column:
    """Translate a Rhai expression to a Column; raises on anything outside
    the expression grammar (statements, lets, method calls, indexing...)."""
    out: list[str] = []
    pos = 0
    for m in _TOKEN_RE.finditer(script):
        if m.start() != pos:
            raise ScriptTranslationError(f"unexpected character at {pos}: {script[pos:pos+10]!r}")
        pos = m.end()
        if m.group(0).isspace():
            continue
        if m.group("num"):
            out.append(m.group("num"))
        elif m.group("str"):
            body = m.group("str")[1:-1].replace("''", "''").replace("'", "''")
            out.append(f"'{body}'")
        elif m.group("ident"):
            ident = m.group("ident")
            if ident in _KEYWORDS:
                out.append(_KEYWORDS[ident])
            elif ident in RHAI_SCOPE_COLUMNS:
                out.append(RHAI_SCOPE_COLUMNS[ident].replace("__now_epoch__", now_epoch_expr))
            else:
                raise ScriptTranslationError(f"unknown identifier {ident!r}")
        elif m.group("op"):
            op = m.group("op")
            out.append(_OP_MAP.get(op, op))
        else:
            raise ScriptTranslationError(f"unsupported token at {m.start()}")
    if pos != len(script):
        raise ScriptTranslationError(f"unexpected trailing input: {script[pos:]!r}")
    if not out:
        raise ScriptTranslationError("empty script")
    return F.expr("(" + "".join(out) + ")")
