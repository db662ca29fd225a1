"""SQL-tier vs UDF-tier differential fuzz for the Rhai translator
(r12 verdict ask #3): the two tiers are independent implementations of
the same script semantics, and the UDF tier is rows-only at the driver
(no SQL oracle can see it), so this differential is the ONLY check that
tier's semantics ever get. Scripts are generated in the SHARED grammar
(expressions, let bindings, if/else with else) with a typed,
magnitude-bounded generator so every script is well-typed, free of
division-by-zero and of i64 overflow — the documented divergence
classes — and the two tiers must then agree EXACTLY on every row.

Round-13 finds, fixed in scripting.py and pinned in the directed cases
below:
  1. float literals emitted bare ('0.1') parse as DECIMAL in Spark, so
     `0.1 + 0.2 == 0.3` was TRUE on the SQL tier and FALSE on the
     interpreter (Rhai floats are f64 — the interpreter was right);
     now emitted as CAST(0.1 AS DOUBLE).
  2. the interpreter's flat-dict env leaked block-local `let`s into
     the enclosing scope, so a branch-local shadow of a scope column
     changed LATER reads (SQL tier block-scopes bindings — it was
     right); now a Rhai-style _Env scope chain.
  3. string `+` concatenated on the interpreter but emitted numeric
     `+` (AnalysisException) on the SQL tier; now both tiers do
     both-string concat and raise on mixed operands.

Round-14 (ADVICE r13): cross-type COMPARISONS no longer raise — Rhai
1.x defaults an unregistered comparison pair (string vs number, bool vs
number, unit vs anything else) to `==` false / `!=` true / ordering
false, so a script like `lang == 5 || likeCount > 3` that runs in the
reference must run on BOTH tiers. The generator now emits mixed-type
comparison pairs (the r13 well-typed generator could not see this
class), the test-local reference interpreter implements the same Rhai
default, and the directed cases pin the ADVICE examples.

Round-15 (ADVICE r14): two corrections to the above.
  1. Rhai's default-comparison fallback is gated on type1 != type2, so
     a SAME-type pair with no registered ordering (`true < false`,
     `() < ()`) raises ErrorFunctionNotFound at runtime — the r14 code
     wrongly folded it to false on both tiers. Both tiers now raise
     (the generator emits only ==/!= for bool-bool pairs).
  2. Statically-detected ill-typed operands (non-bool in boolean
     contexts, arithmetic on string/bool/unit, bool ordering) are
     RUNTIME errors in Rhai, so short-circuit can skip them — the SQL
     tier now raises _NeedsUdf instead of ScriptTranslationError, and
     the interpreter tier (short-circuit preserved) is the semantics
     authority for them.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from query_engine_spark.functions import scripting as S

NOW = "100000000"

# value magnitudes for the generated posts (the generator's bound
# arithmetic below depends on these staying small)
_COUNT_BOUND = 64
_TS_BOUND = 10**8
_SCORE_BOUND = 100.0
_MUL_CAP = 2**50  # |a*b| must stay far under i64 (and float-exact 2**53)

_INT_VARS = {
    "likeCount": _COUNT_BOUND,
    "replyCount": _COUNT_BOUND,
    "repostCount": _COUNT_BOUND,
    "quoteCount": _COUNT_BOUND,
    "imageCount": _COUNT_BOUND,
    "tsMillis": _TS_BOUND * 1000,
    "ageSeconds": _TS_BOUND * 2,
}
_STR_POOL = ["", "en", "de", "abc", "zz"]


class _Gen:
    """Typed, magnitude-bounded random script generator. Each expression
    is produced for a target type in {'i','f','b','s'} and returns
    (text, bound) where bound is a static bound on |value| for numeric
    types (None otherwise). Denominators are nonzero literals only."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.lets: list[tuple[str, str, float | None, str]] = []  # name, ty, bound, text

    def int_lit(self):
        return str(self.rng.randint(0, 9)), 9

    def float_lit(self):
        v = round(self.rng.uniform(0.0, 9.0), 3)
        return f"{v:.3f}", 9.0

    def expr(self, ty: str, depth: int):
        r = self.rng.random()
        if depth <= 0 or r < 0.25:
            return self.terminal(ty)
        if ty == "b":
            pick = self.rng.random()
            if pick < 0.2:
                t, _ = self.expr("b", depth - 1)
                return f"!({t})", None
            if pick < 0.45:
                op = self.rng.choice(["&&", "||"])
                a, _ = self.expr("b", depth - 1)
                b, _ = self.expr("b", depth - 1)
                return f"({a}) {op} ({b})", None
            if pick < 0.8:
                op = self.rng.choice(["==", "!=", "<", "<=", ">", ">="])
                if self.rng.random() < 0.1:
                    # r16 (verdict r15 ask #7): the 2^53 as-f64
                    # promotion boundary is IN the grammar — mixed
                    # int/float comparisons around it must agree
                    # between Spark's bigint-vs-double cast and the
                    # interpreter's float() promotion (r15 review find)
                    base = 9007199254740992  # 2^53
                    ai = base + self.rng.randint(-2, 3)
                    bf = float(base + self.rng.randint(-2, 3))
                    if self.rng.random() < 0.5:
                        return f"({ai}) {op} ({bf!r})", None
                    return f"({bf!r}) {op} ({ai})", None
                nt = self.rng.choice(["i", "f"])
                a, _ = self.expr(nt, depth - 1)
                b, _ = self.expr(self.rng.choice(["i", "f"]), depth - 1)
                return f"({a}) {op} ({b})", None
            if pick < 0.9:
                op = self.rng.choice(["==", "!=", "<", "<=", ">", ">="])
                a, _ = self.expr("s", depth - 1)
                b, _ = self.expr("s", depth - 1)
                return f"({a}) {op} ({b})", None
            if pick < 0.96:
                # cross-type / bool comparison: Rhai defaults an
                # unregistered CROSS-type pair to ==false / !=true /
                # ordering false on both tiers (r14; the r13 generator
                # was well-typed so could never exercise this class).
                # bool-bool is restricted to ==/!= — same-type
                # unregistered ORDERING is a runtime error (r15,
                # ADVICE r14), covered by the directed cases
                ta, tb = self.rng.choice([
                    ("s", "i"), ("s", "f"), ("b", "i"),
                    ("b", "f"), ("b", "s"), ("b", "b"),
                ])
                op = self.rng.choice(
                    ["==", "!="] if (ta, tb) == ("b", "b")
                    else ["==", "!=", "<", "<=", ">", ">="])
                if self.rng.random() < 0.5:
                    ta, tb = tb, ta
                a, _ = self.expr(ta, depth - 1)
                b, _ = self.expr(tb, depth - 1)
                return f"({a}) {op} ({b})", None
            return self.if_expr("b", depth)
        if ty == "s":
            pick = self.rng.random()
            if pick < 0.4:
                a, _ = self.expr("s", depth - 1)
                b, _ = self.expr("s", depth - 1)
                return f"({a}) + ({b})", None
            if pick < 0.6:
                # r16 (ADVICE r15): string `+` with a non-string operand
                # is MoreStringPackage append/prepend, not a type error.
                # int and bool render identically on both tiers, so the
                # fuzz can exercise them freely; float display diverges
                # between Spark CAST and Rhai, so float operands stay in
                # the directed interpreter-tier cases only.
                ot = self.rng.choice(["i", "b"])
                a, _ = self.expr("s", depth - 1)
                b, _ = self.expr(ot, depth - 1)
                if self.rng.random() < 0.5:
                    return f"({a}) + ({b})", None
                return f"({b}) + ({a})", None
            if pick < 0.75:
                return self.if_expr("s", depth)
            return self.terminal("s")
        # numeric
        pick = self.rng.random()
        if pick < 0.15:
            t, bound = self.expr(ty, depth - 1)
            return f"-({t})", bound
        if pick < 0.35:
            return self.if_expr(ty, depth)
        if pick < 0.55:
            op = self.rng.choice(["+", "-"])
            ta = ty if ty == "i" else self.rng.choice(["i", "f"])
            tb = ty if ty == "i" else ("f" if ta == "i" else self.rng.choice(["i", "f"]))
            a, ba = self.expr(ta, depth - 1)
            b, bb = self.expr(tb, depth - 1)
            return f"({a}) {op} ({b})", ba + bb
        if pick < 0.75:
            ta = ty if ty == "i" else self.rng.choice(["i", "f"])
            tb = ty if ty == "i" else ("f" if ta == "i" else self.rng.choice(["i", "f"]))
            a, ba = self.expr(ta, depth - 1)
            b, bb = self.expr(tb, depth - 1)
            if ba * bb < _MUL_CAP:
                return f"({a}) * ({b})", ba * bb
            return f"({a}) + ({b})", ba + bb
        # division / modulo by a NONZERO literal (div-by-zero is a
        # documented tier divergence, not a bug to fuzz for)
        op = self.rng.choice(["/", "%"])
        if ty == "i":
            a, ba = self.expr("i", depth - 1)
            d = self.rng.randint(1, 9)
            return f"({a}) {op} {d}", ba
        a, ba = self.expr(self.rng.choice(["i", "f"]), depth - 1)
        d = round(self.rng.uniform(0.5, 4.0), 3)
        return f"({a}) {op} {d:.3f}", max(ba / 0.5, ba)

    def if_expr(self, ty: str, depth: int):
        c, _ = self.expr("b", depth - 1)
        a, ba = self.expr(ty, depth - 1)
        b, bb = self.expr(ty, depth - 1)
        # optionally a branch-local let inside the then-block (exercises
        # block scoping — find #2)
        prefix = ""
        if self.rng.random() < 0.25 and ty in ("i", "f"):
            prefix = f"let _t = {a}; "
            a = "_t"
        body = f"if {c} {{ {prefix}{a} }} else {{ {b} }}"
        bound = None
        if ty in ("i", "f"):
            bound = max(ba, bb)
        return f"({body})", bound

    def terminal(self, ty: str):
        lets = [x for x in self.lets if x[1] == ty]
        if lets and self.rng.random() < 0.4:
            name, _, bound, _ = self.rng.choice(lets)
            return name, bound
        if ty == "i":
            if self.rng.random() < 0.5:
                v = self.rng.choice(list(_INT_VARS))
                return v, _INT_VARS[v]
            return self.int_lit()
        if ty == "f":
            if self.rng.random() < 0.4:
                return "score", _SCORE_BOUND
            return self.float_lit()
        if ty == "b":
            return self.rng.choice(["true", "false"]), None
        if self.rng.random() < 0.4:
            return "lang", None
        s = self.rng.choice(_STR_POOL)
        return '"' + s + '"', None

    def script(self) -> tuple[str, str]:
        """Generate (script_text, final_type)."""
        stmts = []
        for i in range(self.rng.randint(0, 3)):
            ty = self.rng.choice(["i", "f", "b", "s"])
            name = f"v{chr(97 + i)}"
            text, bound = self.expr(ty, self.rng.randint(1, 3))
            stmts.append(f"let {name} = {text};")
            self.lets.append((name, ty, bound, text))
        final_ty = self.rng.choice(["b", "b", "i", "f"])
        final, _ = self.expr(final_ty, self.rng.randint(1, 4))
        return " ".join(stmts + [final]), final_ty


def _posts_df(spark):
    rng = random.Random(7)
    rows = []
    for i in range(24):
        rows.append((
            rng.randint(0, _COUNT_BOUND), rng.randint(0, _COUNT_BOUND),
            rng.randint(0, _COUNT_BOUND), rng.randint(0, _COUNT_BOUND),
            rng.randint(0, 4),
            [rng.choice(_STR_POOL[1:])] if i % 5 else [],
            rng.randint(0, _TS_BOUND),
            float(round(rng.uniform(-_SCORE_BOUND, _SCORE_BOUND), 3)),
        ))
    df = spark.createDataFrame(
        rows,
        "like_count long, reply_count long, repost_count long, "
        "quote_count long, image_count long, langs array<string>, "
        "ts_sec long, score double",
    )
    return df.withColumn("ts", F.timestamp_seconds("ts_sec")).drop("ts_sec")


DIRECTED = [
    # find #1: decimal-vs-double literal arithmetic
    ("0.1 + 0.2 == 0.3", "b"),
    ("0.1 + 0.2", "f"),
    # find #2: branch-local let must NOT leak over a scope column
    ("let r = if likeCount >= 0 { let likeCount = 99; likeCount } "
     "else { 0 }; r + likeCount", "i"),
    # find #3: string concat agrees across tiers
    ('lang + "x" == "enx"', "b"),
    ('(lang + lang) + "q" != ""', "b"),
    # truncating int division / Rust remainder on negatives
    ("(0 - 7) / 2", "i"),
    ("(0 - 7) % 3", "i"),
    ("7 % (0 - 3)", "i"),
    # let shadowing a scope column at top level (legal, both tiers)
    ("let likeCount = 3; likeCount * 2", "i"),
    # nested if/else with lets in both branches
    ("let va = if score > 0.0 { let t = score * 2.0; t } "
     "else { let t = score - 1.0; t }; va + 0.5", "f"),
    # r14 (ADVICE r13): cross-type comparisons follow Rhai's
    # default-false/true — never an error on either tier
    ("lang == 5 || likeCount > 3", "b"),   # the ADVICE example
    ("lang != 5", "b"),                     # unregistered != -> true
    ("lang < 5", "b"),                      # unregistered ordering -> false
    ('5.0 >= "abc"', "b"),
    ("(likeCount > 3) == 1", "b"),          # bool vs int == -> false
    ("(likeCount > 3) != likeCount", "b"),  # bool vs int != -> true
    ("(score > 0.0) == (likeCount > 3)", "b"),  # bool==bool is REAL
    ('lang >= ""', "b"),                    # string ordering is REAL
    ('"en" < lang + "x"', "b"),
    # r15 review find: mixed INT/FLOAT comparison promotes the int to
    # f64 like Rhai's builtin (and Spark's bigint-vs-double cast) —
    # exact-Python comparison diverged above 2^53. 2^53+1 promotes to
    # 2^53, so == is TRUE and > is FALSE on both tiers.
    ("9007199254740993 == 9007199254740992.0", "b"),
    ("9007199254740993 > 9007199254740992.0", "b"),
    ("9007199254740993.0 != 9007199254740992", "b"),
    ("9007199254740991 < 9007199254740992.0", "b"),  # under 2^53: exact
    # r16 (ADVICE r15): string `+` with int/bool operands is
    # MoreStringPackage append/prepend on BOTH tiers — the ADVICE
    # example `lang + 1` plus prepend, bool rendering, and chains
    ('lang + 1 == lang + "1"', "b"),
    ('1 + lang == "1" + lang', "b"),
    ('likeCount + lang != ""', "b"),
    ('("n=" + likeCount) + ("," + replyCount) != ""', "b"),
    ('(lang + (likeCount > 3)) == (lang + (likeCount > 3))', "b"),
    ('((likeCount > 3) + lang) != "x"', "b"),
    ('let s = "c:" + quoteCount; s + 0 == s + "0"', "b"),
]


def _compare_chunk(spark, df, chunk):
    cols = []
    for k, (script, final_ty) in enumerate(chunk):
        ast = S._parse(script)
        sql, _ty = S._block_to_sql_typed(ast, {}, NOW)
        sql_col = F.expr(sql)
        if final_ty in ("i", "f"):
            sql_col = sql_col.cast("double")
        cols.append(sql_col.alias(f"sql_{k}"))
        cols.append(
            S._udf_column(ast, NOW, boolean=(final_ty == "b")).alias(f"udf_{k}")
        )
    pdf = df.select(*cols).toPandas()
    for k, (script, final_ty) in enumerate(chunk):
        a, b = pdf[f"sql_{k}"], pdf[f"udf_{k}"]
        if not (a.isna().equals(b.isna()) and (a.dropna() == b.dropna()).all()):
            bad = pdf[[f"sql_{k}", f"udf_{k}"]][a.ne(b) | (a.isna() != b.isna())]
            raise AssertionError(
                f"tier divergence on {script!r}:\n{bad.head(5)}"
            )


def test_directed_divergence_cases(spark):
    _compare_chunk(spark, _posts_df(spark), DIRECTED)


@pytest.mark.parametrize("block", range(4))
def test_fuzz_sql_vs_udf_tier(spark, block):
    """1200 generated scripts (300 per block x 4 blocks), 24 rows each:
    the SQL emission and the sandboxed interpreter must agree exactly."""
    df = _posts_df(spark)
    scripts = []
    for seed in range(block * 300, (block + 1) * 300):
        g = _Gen(random.Random(seed))
        scripts.append(g.script())
    for i in range(0, len(scripts), 50):
        _compare_chunk(spark, df, scripts[i:i + 50])


def test_parser_random_soup_contract():
    """Random printable byte soup must either parse or raise the contract
    ScriptTranslationError — never RecursionError, never any other
    exception type, never a hang (extends the r12 nesting/token caps
    with unstructured input; 20k soups probed in-session r13, 5k pinned)."""
    import random
    import string

    from query_engine_spark.functions.scripting import (
        ScriptTranslationError,
        _parse,
    )

    ok = err = 0
    for i in range(5000):
        rng = random.Random(i)
        s = "".join(
            rng.choice(string.printable) for _ in range(rng.randint(0, 120))
        )
        try:
            _parse(s)
            ok += 1
        except ScriptTranslationError:
            err += 1
    # both outcomes must occur (a generator bug could make this vacuous)
    assert ok > 50 and err > 1000


# ---------------------------------------------------------------------------
# Imperative-grammar differential: the UDF tier vs a test-local REFERENCE
# interpreter. while/assign/return scripts never reach the SQL tier, so
# the fuzz above cannot see them — this reference is written with
# deliberately different machinery (explicit scope STACK of dicts, an
# iterative statement walker) so a shared bug is unlikely to cancel.


class _RefReturn(Exception):
    def __init__(self, v):
        self.v = v


def _ref_eval_block(block, scopes):
    _, stmts, final = block
    out = None
    for s in stmts:
        out = _ref_stmt(s, scopes)
    if final is not None:
        out = _ref_expr(final, scopes)
    return out


def _ref_stmt(node, scopes):
    k = node[0]
    if k == "let":
        scopes[-1][node[1]] = _ref_expr(node[2], scopes)
        return None
    if k == "assign":
        v = _ref_expr(node[2], scopes)
        for sc in reversed(scopes):
            if node[1] in sc:
                sc[node[1]] = v
                return None
        raise AssertionError(f"assign to undeclared {node[1]}")
    if k == "return":
        raise _RefReturn(_ref_expr(node[1], scopes))
    if k == "while":
        n = 0
        while _ref_expr(node[1], scopes):
            _ref_eval_block(node[2], scopes + [{}])
            n += 1
            assert n < 10_000, "reference loop runaway"
        return None
    return _ref_expr(node, scopes)


def _ref_expr(node, scopes):
    k = node[0]
    if k in ("num", "str", "bool"):
        return node[1]
    if k == "var":
        for sc in reversed(scopes):
            if node[1] in sc:
                return sc[node[1]]
        raise AssertionError(f"unknown {node[1]}")
    if k == "un":
        v = _ref_expr(node[2], scopes)
        return (not v) if node[1] == "!" else -v
    if k == "if":
        if _ref_expr(node[1], scopes):
            return _ref_eval_block(node[2], scopes + [{}])
        if node[3] is not None:
            return _ref_eval_block(node[3], scopes + [{}])
        return None
    if k == "bin":
        op = node[1]
        a = _ref_expr(node[2], scopes)
        if op == "&&":
            return bool(a) and bool(_ref_expr(node[3], scopes))
        if op == "||":
            return bool(a) or bool(_ref_expr(node[3], scopes))
        b = _ref_expr(node[3], scopes)
        if op == "/":
            if isinstance(a, int) and isinstance(b, int):
                q = abs(a) // abs(b)
                return q if (a >= 0) == (b >= 0) else -q
            return a / b
        if op == "%":
            if isinstance(a, int) and isinstance(b, int):
                r = abs(a) % abs(b)
                return r if a >= 0 else -r
            import math as _m

            return _m.fmod(a, b)
        if op in ("==", "!=", "<", "<=", ">", ">="):
            # Rhai default comparisons, written with different machinery
            # from scripting._rhai_eq (type() categories, not isinstance
            # chains) so a shared bug is unlikely to cancel
            def cat(v):
                if type(v) is bool:
                    return "bool"
                if type(v) is str:
                    return "str"
                if v is None:
                    return "unit"
                return "num"
            ca, cb = cat(a), cat(b)
            # Rhai promotes mixed INT/FLOAT comparison operands with
            # `as f64` (r15 review find) — different machinery from
            # scripting's isinstance split: promote whenever the pair
            # is numeric and heterogeneous by type()
            if ca == cb == "num" and type(a) is not type(b):
                a, b = a * 1.0, b * 1.0
            if op in ("==", "!="):
                eq = (a == b) if ca == cb else False
                return eq if op == "==" else not eq
            if ca == cb and ca in ("bool", "unit"):
                # same-type unregistered ordering errors in Rhai (r15);
                # the r15 generator never emits this shape — loud fail
                # here means a generator regression, not a semantics q
                raise AssertionError(f"unregistered ordering {op} on {ca}")
            if ca != cb or ca not in ("num", "str"):
                return False
        if op == "+" and (type(a) is str or type(b) is str):
            # MoreStringPackage append/prepend (r16, ADVICE r15) —
            # deliberately different machinery from scripting._rhai_str
            # (a format-table over type(), no isinstance chain). The
            # generator restricts mixed `+` to int/bool operands, so a
            # float here is a generator regression, not a semantics case.
            def conv(v):
                assert type(v) is not float, "float+string: generator regression"
                if type(v) is bool:
                    return "%s" % str(v).lower()
                if v is None:
                    return ""
                return "%s" % v
            return conv(a) + conv(b)
        return {
            "+": lambda: a + b, "-": lambda: a - b, "*": lambda: a * b,
            "<": lambda: a < b, "<=": lambda: a <= b,
            ">": lambda: a > b, ">=": lambda: a >= b,
        }[op]()
    raise AssertionError(f"node {k}")


class _ImpGen(_Gen):
    """Imperative-script generator: terminating while loops (counter
    initialized from a %-bounded int, strictly decremented by a literal),
    reassignment of declared vars, and early returns — the UDF-tier-only
    grammar.

    r16 (verdict r15 ask #7): the r15 conformance closures' fresh
    surface is IN the grammar, not just directed cases — bool exprs
    sprinkle DYNAMICALLY-DEAD ill-typed operands (the _NeedsUdf routing
    class: non-bool logical operands, bool ordering, string/unit
    arithmetic, non-bool if-conditions) behind short-circuit guards, so
    a regression in routing or in the interpreter's lazy error-on-
    evaluation semantics fails at volume. The reference interpreter
    short-circuits natively, so dead operands never evaluate there
    either."""

    # each evaluates to a literal bool on BOTH sides; the ill-typed
    # operand is dynamically dead (Rhai runs these fine — ADVICE r14)
    DEAD_ILLTYPED = [
        "(false && (lang && true))",
        "(false && !likeCount)",
        "(false && (true < false))",
        '(false && ("a" - 1 > 0))',
        "(true || (likeCount && false))",
        "(true || ((if false { 1 }) + 1 > 0))",
        "(false && (if likeCount { true } else { false }))",
        '(false && (lang * 2 == 4))',
    ]

    def expr(self, ty, depth):
        text, bound = super().expr(ty, depth)
        if ty == "b" and self.rng.random() < 0.25:
            guard = self.rng.choice(self.DEAD_ILLTYPED)
            if guard.startswith("(true"):
                return f"({guard} && ({text}))", None
            return f"({guard} || ({text}))", None
        return text, bound

    def imperative_script(self):
        rng = self.rng
        stmts = ["let acc = 0;"]
        # acc deliberately NOT added to self.lets: an update expression
        # referencing acc compounds per iteration (acc = acc + acc*x) and
        # walks past i64 — which is its own DIRECTED contract test below,
        # not a value-differential case
        init, _ = self.expr("i", 2)
        step = rng.randint(1, 3)
        body = [f"let n = ({init}) % 37;"]
        upd, _ = self.expr("i", 2)
        inner = f"acc = acc + ({upd});"
        if rng.random() < 0.3:
            # while-in-while: inner loop over a fresh bounded counter
            body.append(
                f"while n > 0 {{ let m = n % 5; "
                f"while m > 0 {{ {inner} m = m - 1; }} n = n - {step}; }}"
            )
        else:
            body.append(f"while n > 0 {{ {inner} n = n - {step}; }}")
        stmts.extend(body)
        if rng.random() < 0.4:
            cond, _ = self.expr("b", 2)
            ret, _ = self.expr("i", 2)
            stmts.append(f"if {cond} {{ return ({ret}) - acc; }}")
        stmts.append("acc")
        return " ".join(stmts)


def test_fuzz_udf_tier_vs_reference_interpreter(spark):
    """500 generated IMPERATIVE scripts (while/assign/return — the
    grammar only the sandboxed UDF tier runs): the pandas-UDF
    interpreter must agree exactly with the test-local reference
    interpreter on every row."""
    df = _posts_df(spark)
    names = list(S.RHAI_SCOPE_COLUMNS)
    rows = df.select(
        *[F.expr(S.RHAI_SCOPE_COLUMNS[n].replace("__now_epoch__", NOW)).alias(n)
          for n in names]
    ).toPandas()

    scripts = []
    for seed in range(500):
        g = _ImpGen(random.Random(20000 + seed))
        scripts.append(g.imperative_script())

    for i in range(0, len(scripts), 50):
        chunk = scripts[i:i + 50]
        cols = []
        asts = []
        for k, script in enumerate(chunk):
            ast = S._parse(script)
            asts.append(ast)
            cols.append(S._udf_column(ast, NOW, boolean=False).alias(f"u_{k}"))
        got = df.select(*cols).toPandas()
        for k, (script, ast) in enumerate(zip(chunk, asts)):
            for r in range(len(rows)):
                scope = {n: rows.iloc[r][n] for n in names}
                # numpy → python scalars, like the reference's Rhai scope
                scope = {
                    n: (v.item() if hasattr(v, "item") else v)
                    for n, v in scope.items()
                }
                try:
                    want = _ref_eval_block(ast, [scope])
                except _RefReturn as ret:
                    want = ret.v
                have = got.iloc[r][f"u_{k}"]
                assert float(want) == have, (
                    f"divergence on {script!r} row {r}: ref={want} udf={have}"
                )


def test_interpreter_checked_i64_overflow(spark):
    """Found by the imperative fuzz above: an accumulator loop compounding
    past 2^63 produced silent Python bigints (Rhai's checked i64 errors)
    and finally crashed the pandas UDF with a raw OverflowError at
    float(). The interpreter now raises the contract ScriptRuntimeError
    at the first out-of-i64 result."""
    df = _posts_df(spark).limit(1)
    script = (
        "let acc = 2; let n = 70; "
        "while n > 0 { acc = acc * 2; n = n - 1; } acc"
    )
    ast = S._parse(script)
    with pytest.raises(Exception) as exc:
        df.select(S._udf_column(ast, NOW, boolean=False).alias("r")).collect()
    assert "integer overflow" in str(exc.value)
    # under-i64 loops still compute exactly
    ok = (
        "let acc = 1; let n = 62; "
        "while n > 0 { acc = acc * 2; n = n - 1; } acc"
    )
    got = df.select(
        S._udf_column(S._parse(ok), NOW, boolean=False).alias("r")
    ).collect()[0]["r"]
    assert got == float(2 ** 62)


def test_while_iteration_budget_contract(spark):
    """r15 verdict ask #5 (directed iteration-budget cases): a runaway
    `while` must land the contract ScriptRuntimeError at the 100k-
    iteration cap — never a hang, never a raw Python error, and (r15
    fix) never a TRANSLATION error type from inside evaluation. Bounded
    loops just under the cap still complete exactly."""
    df = _posts_df(spark).limit(1)
    runaways = [
        "let n = 0; while true { n = n + 1; } n",
        # condition stays true because the decrement is in a dead branch
        "let n = 5; while n > 0 { if false { n = n - 1 } else { } } n",
        # nested: the INNER loop is the runaway
        "let n = 1; let k = 0; while n > 0 { while true { k = k + 1; } "
        "n = n - 1; } k",
    ]
    for script in runaways:
        with pytest.raises(Exception) as exc:
            df.select(
                S._udf_column(S._parse(script), NOW, boolean=False).alias("v")
            ).collect()
        assert "iteration cap" in str(exc.value), script
    # the exception type is the runtime contract error (was mistyped as
    # ScriptTranslationError pre-r15), visible when evaluating directly
    env = S._Env({n: 0 for n in S.RHAI_SCOPE_COLUMNS})
    with pytest.raises(S.ScriptRuntimeError, match="iteration cap"):
        S._eval_block(S._parse(runaways[0]), env)
    # a loop just UNDER the cap completes with the exact count
    under = (
        "let n = 99999; let k = 0; "
        "while n > 0 { k = k + 1; n = n - 1; } k"
    )
    got = df.select(
        S._udf_column(S._parse(under), NOW, boolean=False).alias("v")
    ).collect()[0]["v"]
    assert got == 99999.0


def test_over_i64_literal_rejected_at_parse():
    with pytest.raises(S.ScriptTranslationError, match="i64 range"):
        S._parse("9223372036854775808")
    assert S._parse("9223372036854775807") is not None


def test_boolean_contexts_are_bool_only(spark):
    """r14 review find + r15 ADVICE closure: Rhai has NO truthiness — a
    number/string operand in `&&`/`||`/`!` or an `if`/`while` condition
    is a RUNTIME error the reference unwrap()s. The SQL tier routes
    every statically-detected shape to the interpreter tier (_NeedsUdf
    — r14 hard-failed translation, rejecting dynamically-dead operands
    the reference runs fine); the interpreter raises exactly when the
    operand evaluates, preserving short-circuit."""
    df = _posts_df(spark).limit(2)
    bad = [
        "lang && true",               # string in &&
        "likeCount || false",         # int in ||
        "!likeCount",                 # int in !
        "if likeCount { 1 } else { 2 }",   # int if-condition
        "true && score",              # float on the right
    ]
    for script in bad:
        ast = S._parse(script)
        # SQL tier: needs the interpreter (NOT a translation hard-fail)
        with pytest.raises(S._NeedsUdf):
            S._block_to_sql_typed(ast, {}, NOW)
        # ...so translate_script without the opt-in still fails fast
        with pytest.raises(S.ScriptTranslationError, match="allow_udf"):
            S.translate_script(script, now_epoch_expr=NOW)
        # interpreter tier: the reference's runtime error on evaluation
        with pytest.raises(Exception) as exc:
            df.select(
                S._udf_column(ast, NOW, boolean=False).alias("v")
            ).collect()
        assert "boolean operand" in str(exc.value)
    # while-condition guard (imperative grammar, interpreter only)
    loop = "let n = 1; while n { n = 0; } n"
    with pytest.raises(Exception) as exc:
        df.select(
            S._udf_column(S._parse(loop), NOW, boolean=False).alias("v")
        ).collect()
    assert "boolean operand" in str(exc.value)
    # short-circuit still skips the right side entirely (Rhai semantics):
    # false && <type error> is False, true || <type error> is True —
    # and with allow_udf=True, translate_script now RUNS these scripts
    # end-to-end like the reference does (the r14 behavior failed them
    # at translation; ADVICE r14's exact example is the first)
    good = [("false && (lang && true)", False),
            ("true || !likeCount", True),
            ("false && (true < false)", False),   # dead bool ordering
            ('false && ("a" - 1 > 0)', False)]    # dead string arith
    for script, want in good:
        got = df.select(
            S._udf_column(S._parse(script), NOW, boolean=True).alias("v")
        ).collect()[0]["v"]
        assert got == want, (script, got)
        got2 = df.select(
            S.translate_script(script, now_epoch_expr=NOW, allow_udf=True,
                               boolean=True).alias("v")
        ).collect()[0]["v"]
        assert got2 == want, (script, got2)


def test_string_plus_mixed_types(spark):
    """r16 (ADVICE r15): `+` between a string and ANY standard type is
    Rhai MoreStringPackage append/prepend — `lang + 1` is "en1", never
    a type error (the r15 code asserted it errors; wrong for `+`).
    int/bool operands stay on the SQL tier (concat + CAST renders
    identically); float operands route to the interpreter tier, whose
    _rhai_float_str reproduces FloatWrapper's display (whole floats
    keep ".0", magnitudes outside f32-rounded 1e±13 go scientific
    WITHOUT Python's '+' — "1e14", not "1e+14" or Spark's "1.0E14");
    unit appends nothing. -,*,/,% with a string operand still error."""
    df = _posts_df(spark).limit(2)
    # SQL-tier emission: int/bool operands produce concat+cast, not
    # _NeedsUdf (the ADVICE example is the first)
    for script, frag in [
        ("lang + 1", "concat"),
        ("1 + lang", "concat"),
        ("lang + (likeCount > 3)", "concat"),
    ]:
        sql, ty = S._block_to_sql_typed(S._parse(script), {}, NOW)
        assert frag in sql and ty == "s", (script, sql)
    # float / unknown-typed operands: interpreter tier decides
    for script in ['("x" + score) != ""', '(score + "x") != ""']:
        with pytest.raises(S._NeedsUdf):
            S._block_to_sql_typed(S._parse(script), {}, NOW)
    # interpreter display conformance (FloatWrapper notation + unit)
    cases = [
        ('("x" + 1.5) == "x1.5"', True),
        ('("x" + 2.0) == "x2.0"', True),          # whole float keeps .0
        ('("x" + (3.0 / 0.0)) == "xinf"', True),
        ('("x" + ((0.0 - 3.0) / 0.0)) == "x-inf"', True),
        ('("x" + (0.0 / 0.0)) == "xNaN"', True),
        ('("x" + 100000000000000.0) == "x1e14"', True),   # {:e}, no '+'
        ('("x" + 0.00001) == "x0.00001"', True),  # no sci below 1e-4
        ('("x" + (if false { 1 })) == "x"', True),        # unit appends ""
        ('((if false { 1 }) + "x") == "x"', True),        # unit prepends ""
        ('("a" + true) == "atrue"', True),                # not "aTrue"
    ]
    for script, want in cases:
        got = df.select(
            S._udf_column(S._parse(script), NOW, boolean=True).alias("v")
        ).collect()[0]["v"]
        assert got is want, (script, got)
    # end-to-end through translate_script's fallback
    got = df.select(S.translate_script(
        '("x" + score * 0.0) == "x0.0" || score != 0.0',
        now_epoch_expr=NOW, allow_udf=True, boolean=True).alias("v")
    ).collect()[0]["v"]
    assert got is True
    # the other arithmetic ops on a string operand remain type errors
    for script in ['lang - 1', 'lang * 2', '"a" / 2', '"a" % 2']:
        with pytest.raises(Exception) as exc:
            df.select(
                S._udf_column(S._parse(script), NOW, boolean=False).alias("v")
            ).collect()
        assert "string" in str(exc.value)


def test_cross_type_comparison_table(spark):
    """Exhaustive Rhai conformance (r14 ADVICE r13; corrected r15 per
    ADVICE r14): every type-pair x comparison-operator combination,
    asserted on BOTH tiers against the documented semantics —
    registered pairs (num/num, str/str, bool/bool equality) compare
    for real; every CROSS-type pair is `==` false / `!=` true /
    ordering false (builtin.rs's type1 != type2 default); SAME-type
    bool ordering raises at runtime (ErrorFunctionNotFound in the
    reference — the r14 table wrongly pinned it folding to false)."""
    df = _posts_df(spark).limit(4)
    # representative typed operand EXPRESSIONS (static types the SQL
    # tier can see): i / f / s / b
    operands = {
        "i": "likeCount",
        "f": "score",
        "s": "lang",
        "b": "(likeCount >= 0)",
    }
    registered = {
        ("i", "i"), ("i", "f"), ("f", "i"), ("f", "f"), ("s", "s"),
    }
    ops = ["==", "!=", "<", "<=", ">", ">="]
    scripts = []
    expect_real = []  # None = Rhai default literal; True = real compare
    errors = []       # same-type unregistered ordering: runtime error
    for ta, ea in operands.items():
        for tb, eb in operands.items():
            for op in ops:
                script = f"({ea}) {op} ({eb})"
                if ta == tb == "b" and op not in ("==", "!="):
                    errors.append(script)
                    continue
                pair_cmp = (ta, tb) in registered or (
                    ta == tb == "b" and op in ("==", "!="))
                scripts.append((script, "b"))
                expect_real.append(pair_cmp)
    # both tiers agree exactly on every runnable combination
    for i in range(0, len(scripts), 48):
        _compare_chunk(spark, df, scripts[i:i + 48])
    # the UNREGISTERED cross-type pairs land on the Rhai defaults
    for (script, _), real in zip(scripts, expect_real):
        if real:
            continue
        ast = S._parse(script)
        sql, ty = S._block_to_sql_typed(ast, {}, NOW)
        op = script.split(") ")[1].split(" (")[0]
        want = "true" if op == "!=" else "false"
        assert sql == want and ty == "b", (script, sql)
    # the (b,b) ordering cells error on BOTH tiers: _NeedsUdf at SQL
    # translation (runtime error class -> interpreter decides), the
    # reference's function-not-found shape when evaluated
    for script in errors:
        ast = S._parse(script)
        with pytest.raises(S._NeedsUdf):
            S._block_to_sql_typed(ast, {}, NOW)
        with pytest.raises(Exception) as exc:
            df.select(
                S._udf_column(ast, NOW, boolean=True).alias("v")
            ).collect()
        assert "function not found" in str(exc.value)
    # unit-unit ordering errors too; unit-unit equality is REGISTERED
    # (Rhai: () == () is true) — interpreter-only shapes (unit needs
    # an if-without-else, which the SQL tier cannot express)
    udf = S._udf_column(
        S._parse("let u = if false { 1 }; let v = if false { 2 }; u == v"),
        NOW, boolean=True)
    assert df.select(udf.alias("v")).collect()[0]["v"] is True
    with pytest.raises(Exception) as exc:
        df.select(S._udf_column(
            S._parse("let u = if false { 1 }; let v = if false { 2 }; u < v"),
            NOW, boolean=True).alias("v")).collect()
    assert "function not found" in str(exc.value)
    # unit vs non-unit stays the cross-type default (false), and a unit
    # operand in ARITHMETIC raises the contract error, not a raw
    # TypeError escaping the sandbox (r15 directed probe)
    assert df.select(S._udf_column(
        S._parse("let u = if false { 1 }; u < 1"), NOW,
        boolean=True).alias("v")).collect()[0]["v"] is False
    with pytest.raises(Exception) as exc:
        df.select(S._udf_column(
            S._parse("let u = if false { 1 }; u + 1"), NOW,
            boolean=False).alias("v")).collect()
    assert "unit operand" in str(exc.value)
