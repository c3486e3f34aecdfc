"""Lucene query-string front-ends: ``query_string`` and
``simple_query_string`` compiled onto the engine's ES query DSL.

The reference drives ES with JSON bodies, but ES's two text-syntax
queries are part of the same `_search` surface (the Kibana search bar
emits ``simple_query_string``; power users write ``query_string``).
This module parses both syntaxes into the DSL trees
``operators/esdsl.py`` already executes, so every leaf is scored by the
same hash-checked primitives (BM25 term clauses, positional phrases,
prefix/wildcard constant-score rewrites, range/exists predicates) and
the whole query inherits the serving-tier/distributed duality for free.

Supported ``query_string`` syntax (parse_query_string):

    hash table              implicit default_operator (or|and)
    hash AND table          also &&; OR / ||; NOT / !
    +hash -table            prefix markers (see deviations)
    "hash join"             phrase (match_phrase)
    "hash join"^2           boosted leaf; groups: (hash | join)^2
    tabl*                   trailing-* prefix query (constant score)
    t?bl* / *able           wildcard query (constant score)
    hash~                   fuzzy match, Lucene AUTO ladder
    lang:en                 field override for one leaf
    lang:(en | de)          field scope over a group
    n_chars:[100 TO 500]    range, inclusive; {..} exclusive; * = open
    _exists_:lang           exists query

Supported ``simple_query_string`` syntax (parse_simple_query_string):

    hash table              implicit default_operator
    hash + table | join     infix + (AND) and | (OR), equal precedence,
                            left-associative - the Lucene
                            SimpleQueryParser fold: a + b | c parses as
                            (a AND b) OR c
    -hash                   negation prefix
    "hash join"             phrase
    tabl*                   trailing-* prefix
    hash~                   fuzzy (AUTO)
    (this | that) + other   grouping

Documented deviations from Lucene (loud, not silently wrong):

* ``query_string`` is parsed with conventional precedence NOT > AND >
  OR (left-associative). Lucene's classic QueryParser instead flattens
  mixed operators into one BooleanQuery with per-clause occur flags,
  which yields surprising results ES itself warns about; the
  conventional grammar is deterministic and matches what the bodies it
  compiles to would say.
* ``+leaf`` / ``-leaf`` markers are honored as required/prohibited
  within an AND group; under OR, ``+`` is treated as an unmarked
  operand (classic QP would promote it to MUST across the whole
  BooleanQuery).
* numeric fuzziness (``term~1``) and phrase slop (``"a b"~2``) raise
  ESQueryError - the engine implements the Lucene AUTO ladder and
  exact phrases only (same restriction as the JSON DSL).
* ``fields`` multi-field application covers match/phrase leaves (via
  multi_match best_fields / phrase); prefix/wildcard/range/exists
  leaves require a single resolved field and raise otherwise.
* ``simple_query_string``'s ES contract of never raising is kept for
  OPERATOR characters (an unmatched quote or paren degrades to literal
  tokens, stripped by analysis where punctuation-only), but unsupported
  ENGINE features (numeric fuzziness / slop) still raise - silent
  wrong-scoring is worse than an error.

Scale posture: parsing is driver-side string work on a query a human
typed (bytes, not data); everything downstream is the DSL's existing
distributed/serving machinery. No Spark job is touched here.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_query_string",
    "parse_simple_query_string",
    "expand_query_strings",
]


class _QSError(Exception):
    """Raised internally; esdsl re-raises as ESQueryError (import cycle
    keeps the real class there)."""


class _QSUnsupported(_QSError):
    """An ENGINE-unsupported feature (numeric fuzziness, phrase slop):
    always loud — never swallowed by simple_query_string's
    degrade-to-literal fallback."""


def _err(msg: str):
    raise _QSError(msg)


# ---------------------------------------------------------------------------
# leaf compilation (shared by both grammars)
# ---------------------------------------------------------------------------

_WILD_CHARS = re.compile(r"[*?]")


def _leaf_word(word: str, field: str | None, fields: list[str],
               boost: float, fuzzy: bool) -> dict:
    """One bare word -> match / prefix / wildcard clause dict."""
    if fuzzy and _WILD_CHARS.search(word):
        _err(f"cannot combine ~ with wildcards: {word!r}")
    if word.endswith("*") and not _WILD_CHARS.search(word[:-1]) \
            and len(word) > 1:
        spec = {"value": word[:-1]}
        if boost != 1.0:
            spec["boost"] = boost
        return {"prefix": {_one_field(field, fields): spec}}
    if _WILD_CHARS.search(word):
        spec = {"value": word}
        if boost != 1.0:
            spec["boost"] = boost
        return {"wildcard": {_one_field(field, fields): spec}}
    return _leaf_text("match", word, field, fields, boost, fuzzy)


def _leaf_text(kind: str, text: str, field: str | None,
               fields: list[str], boost: float, fuzzy: bool) -> dict:
    """match / match_phrase leaf, multi-field aware."""
    if field is None and len(fields) > 1:
        mm = {"query": text, "fields": list(fields),
              "type": "phrase" if kind == "match_phrase" else
                      "best_fields"}
        if fuzzy:
            mm["fuzziness"] = "AUTO"
        if boost != 1.0:
            mm["boost"] = boost
        return {"multi_match": mm}
    spec = {"query": text}
    if fuzzy:
        spec["fuzziness"] = "AUTO"
    if boost != 1.0:
        spec["boost"] = boost
    return {kind: {_one_field(field, fields): spec}}


def _one_field(field: str | None, fields: list[str]) -> str:
    if field is not None:
        return field
    if len(fields) != 1:
        _err("this leaf type needs a single field (got "
             f"{fields!r}); scope it with field:... or set "
             "default_field")
    return fields[0]


def _range_leaf(field: str | None, fields: list[str], lo: str, hi: str,
                lo_inc: bool, hi_inc: bool) -> dict:
    def _num(v: str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    spec: dict = {}
    if lo != "*":
        spec["gte" if lo_inc else "gt"] = _num(lo)
    if hi != "*":
        spec["lte" if hi_inc else "lt"] = _num(hi)
    if not spec:
        _err("range [* TO *] is match_all; write it explicitly")
    return {"range": {_one_field(field, fields): spec}}


def _negate(clause: dict) -> dict:
    return {"bool": {"must": [{"match_all": {}}], "must_not": [clause]}}


def _combine(op: str, positive: list[dict], negative: list[dict],
             boost: float = 1.0) -> dict:
    """AND/OR fold of compiled clauses with prohibited members."""
    if op == "and":
        if not positive and negative:
            positive = [{"match_all": {}}]
        b: dict = {"must": positive}
        if negative:
            b["must_not"] = negative
        if boost != 1.0:
            b["boost"] = boost
        return {"bool": b}
    # OR: a negated member matches where its clause does not
    should = positive + [_negate(n) for n in negative]
    b = {"should": should, "minimum_should_match": 1}
    if boost != 1.0:
        b["boost"] = boost
    return {"bool": b}


def _maybe_unwrap(op: str, positive: list[dict], negative: list[dict],
                  boost: float = 1.0) -> dict:
    if len(positive) == 1 and not negative:
        leaf = positive[0]
        if boost != 1.0:
            leaf = _boost_node(leaf, boost)
        return leaf
    return _combine(op, positive, negative, boost)


def _boost_node(clause: dict, boost: float) -> dict:
    """Apply a group boost to an already-compiled clause."""
    [(kind, spec)] = clause.items()
    spec = dict(spec)
    if kind in ("bool", "multi_match"):
        spec["boost"] = float(spec.get("boost", 1.0)) * boost
        return {kind: spec}
    if kind in ("match", "match_phrase"):
        [(f, s)] = spec.items()
        s = dict(s)
        s["boost"] = float(s.get("boost", 1.0)) * boost
        return {kind: {f: s}}
    if kind in ("prefix", "wildcard"):
        [(f, s)] = spec.items()
        s = dict(s)
        s["boost"] = float(s.get("boost", 1.0)) * boost
        return {kind: {f: s}}
    if kind == "constant_score":
        spec["boost"] = float(spec.get("boost", 1.0)) * boost
        return {kind: spec}
    if kind in ("range", "exists"):
        # constant-score leaves: wrap
        return {"constant_score": {"filter": clause, "boost": boost}}
    _err(f"cannot boost {kind} clause")


# ---------------------------------------------------------------------------
# query_string lexer + recursive-descent parser
# ---------------------------------------------------------------------------

_QS_TOKEN = re.compile(r"""
    \s+
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-(?=\S))
  | (?P<phrase>"(?P<ph>[^"]*)"(?P<phsuf>~\d+(?:\.\d+)?)?)
  | (?P<range>[\[{](?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)[\]}])
  | (?P<fieldgrp>(?P<fgname>[A-Za-z_][\w.]*):(?=\())
  | (?P<fielded>(?P<fname>[A-Za-z_][\w.]*):(?!\())
  | (?P<word>[^\s()^~"]+)
  | (?P<caret>\^(?P<bw>\d+(?:\.\d+)?))
  | (?P<tilde>~(?P<fz>\d+(?:\.\d+)?)?)
""", re.VERBOSE)


def _qs_lex(q: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(q):
        m = _QS_TOKEN.match(q, pos)
        if m is None:
            _err(f"query_string: cannot lex at {q[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind is None:
            continue  # whitespace
        if kind == "phrase":
            if m.group("phsuf"):
                _err("phrase slop (\"...\"~N) is not supported - the "
                     "engine scores exact phrases")
            toks.append(("phrase", m.group("ph")))
        elif kind == "range":
            raw = m.group("range")
            toks.append(("range", (m.group("lo"), m.group("hi"),
                                   raw[0] == "[", raw[-1] == "]")))
        elif kind == "fieldgrp":
            toks.append(("fieldgrp", m.group("fgname")))
        elif kind == "fielded":
            toks.append(("fielded", m.group("fname")))
        elif kind == "caret":
            toks.append(("caret", float(m.group("bw"))))
        elif kind == "tilde":
            if m.group("fz") is not None:
                _err("numeric fuzziness (~N) is not supported - the "
                     "engine implements the Lucene AUTO ladder (~)")
            toks.append(("tilde", None))
        elif kind == "word":
            toks.append(("word", m.group("word")))
        else:
            toks.append((kind, m.group(0)))
    return toks


class _QSParser:
    """or_expr := and_expr ((OR|implicit-or) and_expr)*
    and_expr := unary ((AND|implicit-and) unary)*
    unary    := (NOT|-)? primary | + primary
    primary  := '(' or_expr ')' boost? | field:primary | leaf"""

    def __init__(self, toks, fields: list[str], default_op: str):
        self.toks = toks
        self.i = 0
        self.fields = fields
        self.default_op = default_op

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None,
                                                                  None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> dict:
        node = self.or_expr(None)
        if self.peek()[0] is not None:
            _err(f"query_string: unexpected trailing "
                 f"{self.peek()[1]!r}")
        return node

    def _starts_operand(self, kind) -> bool:
        return kind in ("lparen", "not", "plus", "minus", "phrase",
                        "range", "fieldgrp", "fielded", "word")

    def or_expr(self, field) -> dict:
        parts = [self.and_expr(field)]
        while True:
            kind, _ = self.peek()
            if kind == "or":
                self.take()
                parts.append(self.and_expr(field))
            elif self.default_op == "or" and self._starts_operand(kind):
                parts.append(self.and_expr(field))
            else:
                break
        pos = [p for p, neg in parts if not neg]
        neg = [p for p, n in parts if n]
        if len(parts) == 1:
            p, n = parts[0]
            return _negate(p) if n else p
        return _combine("or", pos, neg)

    def and_expr(self, field):
        """Returns (clause, negated) - negation surfaces so the parent
        can fold it into must_not instead of a match_all wrapper."""
        parts = [self.unary(field)]
        while True:
            kind, _ = self.peek()
            if kind == "and":
                self.take()
                parts.append(self.unary(field))
            elif self.default_op == "and" and self._starts_operand(kind) \
                    and kind not in ("or",):
                parts.append(self.unary(field))
            else:
                break
        if len(parts) == 1:
            return parts[0]
        pos = [p for p, n in parts if not n]
        neg = [p for p, n in parts if n]
        return _combine("and", pos, neg), False

    def unary(self, field):
        kind, _ = self.peek()
        if kind in ("not", "minus"):
            self.take()
            clause, neg = self.unary(field)
            return clause, not neg
        if kind == "plus":
            self.take()
            return self.unary(field)
        return self.primary(field), False

    def primary(self, field) -> dict:
        kind, val = self.take()
        if kind == "lparen":
            node = self.or_expr(field)
            k2, _ = self.take()
            if k2 != "rparen":
                _err("query_string: missing ')'")
            return self._suffix_boost(node)
        if kind == "fieldgrp":
            k2, _ = self.take()
            if k2 != "lparen":
                _err("query_string: field:( requires a group")
            node = self.or_expr(val)
            k3, _ = self.take()
            if k3 != "rparen":
                _err("query_string: missing ')'")
            return self._suffix_boost(node)
        if kind == "fielded":
            if val == "_exists_":
                k2, w = self.take()
                if k2 != "word":
                    _err("_exists_: needs a field name")
                return {"exists": {"field": w}}
            return self.leaf(val)
        if kind in ("word", "phrase", "range"):
            self.i -= 1
            return self.leaf(field)
        _err(f"query_string: unexpected {val!r}")

    def _suffix_boost(self, node: dict) -> dict:
        kind, bw = self.peek()
        if kind == "caret":
            self.take()
            return _boost_node(node, bw)
        return node

    def leaf(self, field) -> dict:
        kind, val = self.take()
        fuzzy = False
        boost = 1.0
        if kind == "range":
            lo, hi, lo_inc, hi_inc = val
            node = _range_leaf(field, self.fields, lo, hi, lo_inc,
                               hi_inc)
            return self._suffix_boost(node)
        # optional suffixes in either order: ~, ^boost
        while True:
            k2, v2 = self.peek()
            if k2 == "tilde" and not fuzzy:
                self.take()
                fuzzy = True
            elif k2 == "caret":
                self.take()
                boost = v2
            else:
                break
        if kind == "phrase":
            if fuzzy:
                _err("phrases cannot be fuzzy")
            return _leaf_text("match_phrase", val, field, self.fields,
                              boost, False)
        if kind == "word":
            return _leaf_word(val, field, self.fields, boost, fuzzy)
        _err(f"query_string: expected a term, got {val!r}")


def parse_query_string(spec: dict) -> dict:
    """``{"query_string": spec}`` -> compiled DSL clause dict.

    spec keys: query (required), default_field (default "text"),
    fields (["f", "f^2", ...] - overrides default_field), \
default_operator ("or"), boost."""
    if not isinstance(spec, dict) or "query" not in spec:
        _err("query_string needs {'query': ...}")
    q = str(spec["query"])
    fields = list(spec.get("fields") or [])
    if fields:
        if spec.get("default_field"):
            _err("query_string: give fields OR default_field, not both")
    else:
        fields = [str(spec.get("default_field", "text"))]
    op = str(spec.get("default_operator", "or")).lower()
    if op not in ("or", "and"):
        _err(f"default_operator must be or|and, got {op!r}")
    boost = float(spec.get("boost", 1.0))
    fields, boost = _single_field_boost(fields, boost)
    toks = _qs_lex(q)
    if not toks:
        _err("query_string: empty query")
    node = _QSParser(toks, fields, op).parse()
    return _boost_node(node, boost) if boost != 1.0 else node


# ---------------------------------------------------------------------------
# simple_query_string
# ---------------------------------------------------------------------------

_SQS_TOKEN = re.compile(r"""
    \s+
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<plus>\+)
  | (?P<or>\|)
  | (?P<minus>-(?=\S))
  | (?P<phrase>"(?P<ph>[^"]*)"(?P<phsuf>~\d+)?)
  | (?P<word>[^\s()|+"]+)
""", re.VERBOSE)


def _sqs_lex(q: str):
    toks = []
    pos = 0
    while pos < len(q):
        m = _SQS_TOKEN.match(q, pos)
        if m is None:
            # ES simple_query_string never fails on operator noise:
            # treat the offending char as a literal word char run
            nxt = re.match(r"\S+", q[pos:])
            toks.append(("word", nxt.group(0)))
            pos += nxt.end()
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind is None:
            continue
        if kind == "phrase":
            if m.group("phsuf"):
                raise _QSUnsupported(
                    "simple_query_string: phrase slop is not "
                    "supported - the engine scores exact phrases")
            toks.append(("phrase", m.group("ph")))
        elif kind == "word":
            toks.append(("word", m.group("word")))
        else:
            toks.append((kind, m.group(0)))
    return toks


class _SQSParser:
    """Lucene SimpleQueryParser shape: one operand stream folded
    left-associatively; ``+``/``|`` and the implicit default operator
    all at EQUAL precedence, so ``a + b | c`` is ((a AND b) OR c)."""

    def __init__(self, toks, fields: list[str], default_op: str):
        self.toks = toks
        self.i = 0
        self.fields = fields
        self.default_op = default_op

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None,
                                                                  None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> dict:
        node, neg = self.expr()
        if self.peek()[0] is not None:
            _err("simple_query_string: unexpected trailing "
                 f"{self.peek()[1]!r}")
        return _negate(node) if neg else node

    def expr(self):
        cur = self.operand()
        while True:
            kind, _ = self.peek()
            if kind == "plus":
                self.take()
                op = "and"
            elif kind == "or":
                self.take()
                op = "or"
            elif kind in ("lparen", "minus", "phrase", "word"):
                op = self.default_op
            else:
                return cur
            nxt = self.operand()
            cur = (self._fold(op, cur, nxt), False)

    @staticmethod
    def _fold(op: str, left, right) -> dict:
        lc, ln = left
        rc, rn = right
        pos = [c for c, n in (left, right) if not n]
        neg = [c for c, n in (left, right) if n]
        return _combine(op, pos, neg)

    def operand(self):
        kind, val = self.peek()
        if kind == "minus":
            self.take()
            clause, neg = self.operand()
            return clause, not neg
        if kind == "lparen":
            self.take()
            node, neg = self.expr()
            k2, _ = self.take()
            if k2 != "rparen":
                _err("simple_query_string: missing ')'")
            return node, neg
        if kind == "phrase":
            self.take()
            return _leaf_text("match_phrase", val, None, self.fields,
                              1.0, False), False
        if kind == "word":
            self.take()
            fuzzy = False
            if val.endswith("~"):
                val, fuzzy = val[:-1], True
            elif re.search(r"~\d+$", val):
                raise _QSUnsupported(
                    "simple_query_string: numeric fuzziness (~N) is "
                    "not supported - use ~ (the Lucene AUTO ladder)")
            return _leaf_word(val, None, self.fields, 1.0,
                              fuzzy), False
        _err(f"simple_query_string: unexpected {val!r}")


def parse_simple_query_string(spec: dict) -> dict:
    """``{"simple_query_string": spec}`` -> compiled DSL clause dict.

    spec keys: query (required), fields (default ["text"]),
    default_operator ("or"), boost."""
    if not isinstance(spec, dict) or "query" not in spec:
        _err("simple_query_string needs {'query': ...}")
    fields = [str(f) for f in (spec.get("fields") or ["text"])]
    op = str(spec.get("default_operator", "or")).lower()
    if op not in ("or", "and"):
        _err(f"default_operator must be or|and, got {op!r}")
    boost = float(spec.get("boost", 1.0))
    fields, boost = _single_field_boost(fields, boost)
    toks = _sqs_lex(str(spec["query"]))
    if not toks:
        _err("simple_query_string: empty query")
    try:
        node = _SQSParser(toks, fields, op).parse()
    except _QSUnsupported:
        raise
    except _QSError:
        # ES's no-syntax-error contract: malformed operator structure
        # (unmatched paren, dangling operator) degrades to a plain
        # bag-of-words query over the default operator
        words = [w.lstrip("-") for w in
                 re.findall(r'[^\s()|+"]+', str(spec["query"]))]
        words = [w for w in words if w]
        if not words:
            raise
        leaves = [_leaf_word(w, None, fields, 1.0, False)
                  for w in words]
        node = _maybe_unwrap(op, leaves, [])
    return _boost_node(node, boost) if boost != 1.0 else node


def _single_field_boost(fields: list[str],
                        boost: float) -> tuple[list[str], float]:
    """A single ``name^w`` field spec folds its weight into the root
    boost (score scaling is linear, so per-leaf and at-root are the
    same number); multi-field specs pass through to multi_match, which
    handles per-field boosts itself."""
    if len(fields) == 1 and "^" in fields[0]:
        name, w = fields[0].split("^", 1)
        return [name], boost * float(w)
    return fields, boost


# ---------------------------------------------------------------------------
# tree rewrite: expand text-syntax nodes anywhere in a DSL tree
# ---------------------------------------------------------------------------

def expand_query_strings(node):
    """Recursively replace {"query_string": spec} /
    {"simple_query_string": spec} clause nodes with their compiled DSL
    equivalents. Leaves every other node untouched; cheap no-op when
    the tree has none."""
    if isinstance(node, list):
        return [expand_query_strings(x) for x in node]
    if isinstance(node, dict):
        if len(node) == 1:
            [(k, v)] = node.items()
            if k == "query_string":
                return parse_query_string(v)
            if k == "simple_query_string":
                return parse_simple_query_string(v)
        return {k: expand_query_strings(v) for k, v in node.items()}
    return node
