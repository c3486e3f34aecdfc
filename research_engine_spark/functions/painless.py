"""A deterministic Painless-subset expression compiler for ES
``script_score`` (reference behavior: Elasticsearch script-score
queries, e.g. ``database/scripts`` search bodies use the stock scoring
path; the script language itself is the public Painless subset that ES
documents for script_score).

Grammar (recursive descent, no statements, no side effects)::

    expr    := term (('+' | '-') term)*
    term    := factor (('*' | '/') factor)*
    factor  := '-' factor | primary
    primary := NUMBER
             | '_score'
             | "doc['field'].value"
             | "params.name" | "params['name']"
             | NAME '(' expr (',' expr)* ')'      -- whitelisted calls
             | '(' expr ')'

Whitelisted calls: ``Math.log  Math.log10  Math.exp  Math.sqrt
Math.abs  Math.min  Math.max  Math.pow  Math.floor  Math.ceil`` plus
the ES script-score helpers ``saturation(x, pivot) = x / (x + pivot)``
and ``sigmoid(x, k, a) = x^a / (k^a + x^a)``.

``params.*`` are constant-folded at parse time, so the compiled AST
contains only numbers, ``_score``, doc-field reads, arithmetic, and
calls.

Two backends compile the same AST:

- ``to_numpy(ast)`` — a vectorized numpy evaluator for the zero-job
  driver-local serving tier.
- ``to_column(ast, score_col, doc_col)`` — a Catalyst ``Column`` for
  the distributed path (stays inside whole-stage codegen; no UDF).

Serving ≡ distributed bit-identity: ``+ - * / sqrt abs min max floor
ceil saturation`` are IEEE-754 correctly-rounded in BOTH numpy and the
JVM, so ASTs built only from those are bit-identical across backends.
``log/log10/exp/pow/sigmoid`` are transcendental — libm and
java.lang.Math may disagree by an ulp — so ``is_exact(ast)`` reports
False and the esdsl serving tier declines those scripts (they run
distributed on both paths instead, keeping the engine's bit-identity
guarantee honest rather than approximate).
"""
from __future__ import annotations

import re

import numpy as np

__all__ = [
    "PainlessError", "parse_script", "doc_fields", "uses_score",
    "is_exact", "to_numpy", "to_column",
]


class PainlessError(ValueError):
    """Raised on syntax errors, unknown names, or non-whitelisted
    calls — script_score must fail loudly, never guess."""


_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<op>[()\[\],+\-*/.])
    )""", re.VERBOSE)

# calls that are IEEE-exact (correctly rounded) in numpy AND the JVM
_EXACT_CALLS = {"Math.sqrt", "Math.abs", "Math.min", "Math.max",
                "Math.floor", "Math.ceil", "saturation"}
_TRANSCENDENTAL = {"Math.log", "Math.log10", "Math.exp", "Math.pow",
                   "sigmoid"}
_ARITY = {"Math.log": 1, "Math.log10": 1, "Math.exp": 1,
          "Math.sqrt": 1, "Math.abs": 1, "Math.floor": 1,
          "Math.ceil": 1, "Math.min": 2, "Math.max": 2,
          "Math.pow": 2, "saturation": 2, "sigmoid": 3}


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            rest = src[pos:].lstrip()
            if not rest:
                break
            raise PainlessError(f"script syntax error at {rest[:20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", float(m.group("num"))))
        elif m.lastgroup == "name":
            out.append(("name", m.group("name")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1]))
        else:
            out.append(("op", m.group("op")))
    return out


class _Parser:
    def __init__(self, tokens, params):
        self.toks = tokens
        self.i = 0
        self.params = params or {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind=None, value=None):
        t = self.peek()
        if t is None or (kind and t[0] != kind) \
                or (value is not None and t[1] != value):
            want = value or kind or "token"
            got = t[1] if t else "end of script"
            raise PainlessError(f"expected {want!r}, got {got!r}")
        self.i += 1
        return t

    def expr(self):
        node = self.term()
        while (t := self.peek()) in (("op", "+"), ("op", "-")):
            self.take()
            node = ("op", t[1], node, self.term())
        return node

    def term(self):
        node = self.factor()
        while (t := self.peek()) and t[0] == "op" and t[1] in "*/":
            self.take()
            node = ("op", t[1], node, self.factor())
        return node

    def factor(self):
        if self.peek() == ("op", "-"):
            self.take()
            return ("neg", self.factor())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t is None:
            raise PainlessError("unexpected end of script")
        if t == ("op", "("):
            self.take()
            node = self.expr()
            self.take("op", ")")
            return node
        if t[0] == "num":
            self.take()
            return ("num", t[1])
        if t[0] != "name":
            raise PainlessError(f"unexpected {t[1]!r}")
        name = self.take()[1]
        if name == "_score":
            return ("score",)
        if name == "doc":
            self.take("op", "[")
            field = self.take("str")[1]
            self.take("op", "]")
            self.take("op", ".")
            tail = self.take("name")[1]
            if tail != "value":
                raise PainlessError(
                    f"only doc['f'].value is supported, got .{tail}")
            return ("doc", field)
        if name == "params" or name.startswith("params."):
            if name == "params":           # params['key'] form
                self.take("op", "[")
                key = self.take("str")[1]
                self.take("op", "]")
            else:
                key = name[len("params."):]
            if key not in self.params:
                raise PainlessError(f"missing script param {key!r}")
            return ("num", float(self.params[key]))
        if self.peek() == ("op", "("):
            if name not in _ARITY:
                raise PainlessError(f"call {name!r} not whitelisted "
                                    f"{sorted(_ARITY)}")
            self.take("op", "(")
            args = [self.expr()]
            while self.peek() == ("op", ","):
                self.take()
                args.append(self.expr())
            self.take("op", ")")
            if len(args) != _ARITY[name]:
                raise PainlessError(
                    f"{name} takes {_ARITY[name]} args, got {len(args)}")
            return ("call", name, args)
        raise PainlessError(f"unknown name {name!r}")


def parse_script(source: str, params: dict | None = None):
    """Parse a script source into an AST tuple; params are folded in."""
    p = _Parser(_tokenize(source), params)
    node = p.expr()
    if p.peek() is not None:
        raise PainlessError(f"trailing tokens at {p.peek()[1]!r}")
    return node


def _walk(node):
    yield node
    kind = node[0]
    if kind == "op":
        yield from _walk(node[2])
        yield from _walk(node[3])
    elif kind == "neg":
        yield from _walk(node[1])
    elif kind == "call":
        for a in node[2]:
            yield from _walk(a)


def doc_fields(node) -> list[str]:
    """Sorted distinct docs-table fields the script reads."""
    return sorted({n[1] for n in _walk(node) if n[0] == "doc"})


def uses_score(node) -> bool:
    return any(n[0] == "score" for n in _walk(node))


def is_exact(node) -> bool:
    """True iff every operation in the AST is IEEE correctly-rounded
    in both backends (see module docstring) — the serving tier's
    bit-identity precondition."""
    return not any(n[0] == "call" and n[1] in _TRANSCENDENTAL
                   for n in _walk(node))


# --------------------------------------------------------------------------
# numpy backend (serving tier)
# --------------------------------------------------------------------------

def to_numpy(node):
    """Compile to ``fn(score: ndarray, docvals: dict[str, ndarray])
    -> ndarray`` (float64 elementwise, vectorized)."""
    kind = node[0]
    if kind == "num":
        v = node[1]
        return lambda s, d: np.full_like(s, v, dtype=np.float64)
    if kind == "score":
        return lambda s, d: s
    if kind == "doc":
        f = node[1]
        return lambda s, d: d[f]
    if kind == "neg":
        inner = to_numpy(node[1])
        return lambda s, d: -inner(s, d)
    if kind == "op":
        op, lhs, rhs = node[1], to_numpy(node[2]), to_numpy(node[3])
        fn = {"+": np.add, "-": np.subtract,
              "*": np.multiply, "/": np.divide}[op]
        return lambda s, d: fn(lhs(s, d), rhs(s, d))
    if kind == "call":
        name, args = node[1], [to_numpy(a) for a in node[2]]
        fns = {"Math.log": np.log, "Math.log10": np.log10,
               "Math.exp": np.exp, "Math.sqrt": np.sqrt,
               "Math.abs": np.abs, "Math.floor": np.floor,
               "Math.ceil": np.ceil, "Math.min": np.minimum,
               "Math.max": np.maximum, "Math.pow": np.power}
        if name in fns:
            fn = fns[name]
            return lambda s, d: fn(*[a(s, d) for a in args])
        if name == "saturation":
            x, p = args
            return lambda s, d: (lambda xv, pv: xv / (xv + pv))(
                x(s, d), p(s, d))
        if name == "sigmoid":
            x, k, a = args
            def _sig(s_, d_):
                xv, kv, av = x(s_, d_), k(s_, d_), a(s_, d_)
                xa = np.power(xv, av)
                return xa / (np.power(kv, av) + xa)
            return _sig
    raise PainlessError(f"unknown AST node {node!r}")


# --------------------------------------------------------------------------
# Catalyst backend (distributed path) — Columns only, no UDF
# --------------------------------------------------------------------------

def to_column(node, score_col, doc_col):
    """Compile to a Catalyst Column. ``score_col`` is the inner-query
    score Column; ``doc_col(field)`` returns the (double-cast,
    missing-coalesced) Column for a docs-table field."""
    from pyspark.sql import functions as F

    kind = node[0]
    if kind == "num":
        return F.lit(float(node[1]))
    if kind == "score":
        return score_col
    if kind == "doc":
        return doc_col(node[1])
    if kind == "neg":
        return -to_column(node[1], score_col, doc_col)
    if kind == "op":
        lhs = to_column(node[2], score_col, doc_col)
        rhs = to_column(node[3], score_col, doc_col)
        return {"+": lhs + rhs, "-": lhs - rhs,
                "*": lhs * rhs, "/": lhs / rhs}[node[1]]
    if kind == "call":
        name = node[1]
        args = [to_column(a, score_col, doc_col) for a in node[2]]
        if name == "Math.log":
            return F.log(args[0])
        if name == "Math.log10":
            return F.log10(args[0])
        if name == "Math.exp":
            return F.exp(args[0])
        if name == "Math.sqrt":
            return F.sqrt(args[0])
        if name == "Math.abs":
            return F.abs(args[0])
        if name == "Math.floor":
            # Catalyst floor/ceil return LongType; script math stays
            # in float64 on both backends
            return F.floor(args[0]).cast("double")
        if name == "Math.ceil":
            return F.ceil(args[0]).cast("double")
        if name == "Math.min":
            return F.least(args[0], args[1])
        if name == "Math.max":
            return F.greatest(args[0], args[1])
        if name == "Math.pow":
            return F.pow(args[0], args[1])
        if name == "saturation":
            return args[0] / (args[0] + args[1])
        if name == "sigmoid":
            xa = F.pow(args[0], args[2])
            return xa / (F.pow(args[1], args[2]) + xa)
    raise PainlessError(f"unknown AST node {node!r}")
