"""The reference's mini predicate / aggregation grammar → Spark ``Column``.

Re-expresses the v1 query language (tokenizer ``v1/src/main.rs:440-464``,
recursive-descent parser ``:479-587``, aggregation parser ``:1209-1232``) as a
~150-line translator that emits native ``pyspark.sql.Column`` expressions.
Because the output is a plain Catalyst expression tree, everything downstream
— predicate pushdown, row-group pruning, NOT-normalization (De Morgan),
constant folding — is handled by the optimizer; the reference implements each
of those by hand (``v1/src/main.rs:626-685`` pruning, ``:663-684`` NOT
pushdown).

Grammar (same precedence as the reference: OR < AND < NOT < parens):

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := not_expr (AND not_expr)*
    not_expr := NOT not_expr | '(' expr ')' | comparison
    comparison := IDENT op literal | literal op IDENT
    op       := '<' | '<=' | '==' | '=' | '!=' | '>=' | '>'

Literal typing follows v1's inference order (``v1/src/main.rs:556-587``):
ISO datetime ``%Y-%m-%d-%H:%M:%S`` → timestamp, ``true``/``false`` → boolean,
contains ``.`` → float, all digits → int, otherwise (quoted or bare) → string.

The five comparison ops of v1 (``Comparison`` enum ``v1/src/main.rs:418-438``)
are extended with ``!=`` for engine completeness.

Aggregations: ``OP(column)`` for OP in SUM/AVG/MIN/MAX/COUNT
(``parse_aggregation`` ``v1/src/main.rs:1209-1232``). COUNT follows v1's
non-null-count semantics (``.iter().flatten()`` at ``v1/src/main.rs:1517``)
which is exactly Spark's ``F.count(col)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<comma>,) |
        (?P<op><=|>=|==|!=|=|<|>) |
        (?P<squoted>'(?:[^'\\]|\\.)*') |
        (?P<dquoted>"(?:[^"\\]|\\.)*") |
        (?P<word>[A-Za-z0-9_.:\-]+)
    )""",
    re.VERBOSE,
)

_DATETIME_RE = re.compile(r"^\d{4}-\d{2}-\d{2}-\d{2}:\d{2}:\d{2}$")
_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?\d+\.\d*$|^-?\.\d+$")


@dataclass
class _Token:
    kind: str  # lparen | rparen | op | word | string
    text: str


def _tokenize(s: str) -> list[_Token]:
    tokens: list[_Token] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize predicate at: {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind in ("squoted", "dquoted"):
            tokens.append(_Token("string", text[1:-1]))
        else:
            tokens.append(_Token(kind, text))
    return tokens


def _literal(tok: _Token) -> Column:
    """Typed literal inference, v1 order: datetime → bool → float → int → str."""
    if tok.kind == "string":
        return F.lit(tok.text)
    t = tok.text
    if _DATETIME_RE.match(t):
        # v1 parses "%Y-%m-%d-%H:%M:%S" into epoch-millis Int64
        # (v1/src/main.rs:589-595); we emit a proper timestamp literal so
        # Catalyst can still push the comparison down to Parquet.
        return F.to_timestamp(F.lit(t), "yyyy-MM-dd-HH:mm:ss")
    low = t.lower()
    if low in ("true", "false"):
        return F.lit(low == "true")
    if _FLOAT_RE.match(t):
        return F.lit(float(t))
    if _INT_RE.match(t):
        return F.lit(int(t))
    return F.lit(t)


_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: a >= b,
    ">": lambda a, b: a > b,
}

_KEYWORDS = {"and", "or", "not"}


class _Parser:
    def __init__(self, tokens: list[_Token]):
        self.tokens = tokens
        self.pos = 0

    def peek(self) -> _Token | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> _Token:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of predicate")
        self.pos += 1
        return tok

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens at {self.peek().text!r}")
        return col

    def or_expr(self) -> Column:
        left = self.and_expr()
        while (t := self.peek()) and t.kind == "word" and t.text.lower() == "or":
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while (t := self.peek()) and t.kind == "word" and t.text.lower() == "and":
            self.next()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        t = self.peek()
        if t and t.kind == "word" and t.text.lower() == "not":
            self.next()
            return ~self.not_expr()
        if t and t.kind == "lparen":
            self.next()
            inner = self.or_expr()
            if self.next().kind != "rparen":
                raise ValueError("expected ')'")
            return inner
        return self.comparison()

    def comparison(self) -> Column:
        left = self.next()
        op = self.peek()
        # extended predicates (beyond the reference's five comparators):
        #   col IN (v1, v2, ...) | col BETWEEN lo AND hi | col LIKE 'pat%'
        if op is not None and op.kind == "word":
            kw = op.text.lower()
            if kw == "in":
                self.next()
                return self._in_list(left)
            if kw == "between":
                self.next()
                lo = _literal(self.next())
                and_tok = self.next()
                if not (and_tok.kind == "word" and and_tok.text.lower() == "and"):
                    raise ValueError("expected AND in BETWEEN")
                hi = _literal(self.next())
                return F.col(left.text).between(lo, hi)
            if kw == "like":
                self.next()
                pat = self.next()
                return F.col(left.text).like(pat.text)
        op = self.next()
        if op.kind != "op":
            raise ValueError(f"expected comparison operator, got {op.text!r}")
        right = self.next()
        left_is_col = left.kind == "word" and not _is_literal_word(left)
        if left_is_col:
            return _OPS[op.text](F.col(left.text), _literal(right))
        # literal OP column — flip to keep the column on the left
        flipped = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op.text, op.text)
        return _OPS[flipped](F.col(right.text), _literal(left))


    def _in_list(self, col_tok: _Token) -> Column:
        if self.next().kind != "lparen":
            raise ValueError("expected '(' after IN")
        values = []
        while True:
            tok = self.next()
            if tok.kind == "rparen":
                break
            if tok.kind == "comma":
                continue
            if tok.kind in ("word", "string"):
                values.append(_literal(tok))
            else:
                raise ValueError(f"unexpected token in IN list: {tok.text!r}")
        if not values:
            raise ValueError("empty IN list")
        return F.col(col_tok.text).isin(*values)


def _is_literal_word(tok: _Token) -> bool:
    t = tok.text
    return bool(
        _DATETIME_RE.match(t)
        or _INT_RE.match(t)
        or _FLOAT_RE.match(t)
        or t.lower() in ("true", "false")
    )


def parse_predicate(expr: str) -> Column:
    """Parse a v1-grammar predicate string into a Spark ``Column``.

    >>> df.filter(parse_predicate("memoryUsed > 151194126688"))
    """
    return _Parser(_tokenize(expr)).parse()


def parse_predicate_by_index(expr: str, columns: list[str]) -> Column:
    """The v2 variant of the grammar: columns referenced by ORDINAL —
    ``"92 > 151194126688"`` means column #92 (``v2/src/main.rs:643-796``,
    invocation ``:737``). Indices are resolved against ``columns`` (0-based,
    like v2's schema vector) and the rewritten text goes through the normal
    parser, so all boolean structure works identically."""
    toks = _tokenize(expr)
    out = []
    for i, tok in enumerate(toks):
        # an integer is a column ordinal iff it sits in column position:
        # immediately BEFORE a comparison operator (v2 puts the column on
        # the left and the literal on the right)
        if (
            tok.kind == "word"
            and _INT_RE.match(tok.text)
            and i + 1 < len(toks)
            and toks[i + 1].kind == "op"
        ):
            idx = int(tok.text)
            if not 0 <= idx < len(columns):
                raise ValueError(f"column index {idx} out of range")
            tok = _Token("word", columns[idx])
        out.append(tok)
    return _Parser(out).parse()


_AGG_RE = re.compile(r"^\s*(SUM|AVG|MIN|MAX|COUNT)\s*\(\s*([A-Za-z0-9_]+)\s*\)\s*$", re.I)

_AGG_FUNCS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,  # non-null count, matching v1 (v1/src/main.rs:1517)
}


def parse_aggregation(spec: str, alias: str | None = None) -> Column:
    """``"SUM(memoryUsed)"`` → ``F.sum("memoryUsed")`` (v1 ``parse_aggregation``,
    ``v1/src/main.rs:1209-1232``; name formatting ``get_name`` ``:1552-1554``)."""
    m = _AGG_RE.match(spec)
    if not m:
        raise ValueError(f"unsupported aggregation: {spec!r}")
    op, col = m.group(1).lower(), m.group(2)
    out = _AGG_FUNCS[op](F.col(col))
    return out.alias(alias if alias is not None else f"{op}_{col}")


def parse_aggregations(specs: list[str] | list[tuple[str, str]]) -> list[Column]:
    """Parse a list of aggregation specs, optionally ``(spec, alias)`` pairs."""
    cols = []
    for spec in specs:
        if isinstance(spec, tuple):
            cols.append(parse_aggregation(spec[0], spec[1]))
        else:
            cols.append(parse_aggregation(spec))
    return cols
