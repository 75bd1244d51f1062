"""P6 — the reference's boolean/arithmetic condition grammar compiled to
Catalyst expressions.

The reference evaluates conditions like
    "x.a > 7 AND x.b < 8.0 OR x.c * 2 - 6 == 4"
with a pyparsing grammar + recursive interpreter per candidate match
(``patternmatching/query/ConditionParser.py:20-54`` grammar, ``:68-133``
interpreter, numeric coercion ``:77-80,118-127``). Every construct in that
grammar — ``symbol.prop`` terms, ``* / + -``, ``>= <= != == > <``,
``NOT/AND/OR`` — is Catalyst-expressible, so our "interpreter" is a
compile step producing a ``pyspark.sql.Column``; evaluation happens
JVM-side inside whole-stage codegen (SURVEY.md §2.9: no UDF needed).

``symbol.prop`` resolves to column ``symbol_prop`` (the relational
encoding of the reference's per-symbol nodemap); bare identifiers resolve
to their own column name.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, functions as F

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d+|\d+)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<ident>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
    r"|(?P<op>>=|<=|!=|==|[><()*/+-])"
    r")"
)

_KEYWORDS = {"AND", "OR", "NOT"}


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            if text[i:].strip() == "":
                break
            raise ValueError(f"bad condition syntax at: {text[i:]!r}")
        out.append(m.group(0).strip())
        i = m.end()
    return out


def default_resolver(name: str) -> Column:
    """'a.score' → col('a_score'); bare names → their own column."""
    return F.col(name.replace(".", "_"))


class _Parser:
    def __init__(self, tokens: list[str], resolver: Callable[[str], Column]):
        self.toks = tokens
        self.i = 0
        self.resolver = resolver

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of condition")
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.take()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    # expr := and_expr (OR and_expr)*
    def expr(self) -> Column:
        left = self.and_expr()
        while self.peek() == "OR":
            self.take()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while self.peek() == "AND":
            self.take()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if self.peek() == "NOT":
            self.take()
            return ~self.not_expr()
        return self.comparison()

    def comparison(self) -> Column:
        left = self.arith()
        op = self.peek()
        if op in (">=", "<=", "!=", "==", ">", "<"):
            self.take()
            right = self.arith()
            return {
                ">=": left >= right,
                "<=": left <= right,
                "!=": left != right,
                "==": left == right,
                ">": left > right,
                "<": left < right,
            }[op]
        return left  # bare boolean column

    def arith(self) -> Column:
        left = self.term()
        while self.peek() in ("+", "-"):
            op = self.take()
            right = self.term()
            left = left + right if op == "+" else left - right
        return left

    def term(self) -> Column:
        left = self.factor()
        while self.peek() in ("*", "/"):
            op = self.take()
            right = self.factor()
            left = left * right if op == "*" else left / right
        return left

    def factor(self) -> Column:
        t = self.take()
        if t == "(":
            inner = self.expr()
            self.expect(")")
            return inner
        if re.fullmatch(r"\d+\.\d+", t):
            return F.lit(float(t))
        if re.fullmatch(r"\d+", t):
            return F.lit(int(t))
        if t[0] in "'\"":
            return F.lit(t[1:-1])
        if t in _KEYWORDS:
            raise ValueError(f"unexpected keyword {t!r}")
        return self.resolver(t)


def compile_condition(
    text: str, resolver: Callable[[str], Column] = default_resolver
) -> Column:
    """Compile a reference-grammar condition string to a Spark Column."""
    p = _Parser(_tokenize(text), resolver)
    col = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return col
