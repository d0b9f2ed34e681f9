"""Tokenizer shared by the SPARQL-subset parser and the Janus-QL parser."""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>"{}|^`\s]*>)
    | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
    | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<NUM>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<PNAME>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z0-9_.\-]*)
    | (?P<KW>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\],;.=<>!+\-*/@|^?])
    """,
    re.X,
)


@dataclass(frozen=True)
class Token:
    kind: str  # IRI VAR STRING NUM PNAME KW OP EOF
    text: str
    pos: int


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SyntaxError(f"unexpected character {text[i]!r} at offset {i}: ...{text[max(0,i-30):i+30]!r}...")
        kind = m.lastgroup
        if kind != "WS":
            tokens.append(Token(kind, m.group(), i))
        i = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens


class TokenStream:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def peek(self, ahead: int = 1) -> Token:
        j = min(self.i + ahead, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        t = self.cur
        if t.kind != "EOF":
            self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        return self.cur.kind == "KW" and self.cur.text.upper() in words

    def eat_kw(self, word: str) -> Token:
        if not self.at_kw(word):
            raise SyntaxError(f"expected {word}, got {self.cur.text!r} at offset {self.cur.pos}")
        return self.advance()

    def at_op(self, *ops: str) -> bool:
        return self.cur.kind == "OP" and self.cur.text in ops

    def eat_op(self, op: str) -> Token:
        if not self.at_op(op):
            raise SyntaxError(f"expected {op!r}, got {self.cur.text!r} at offset {self.cur.pos}")
        return self.advance()


def unquote_string(tok_text: str) -> str:
    body = tok_text[1:-1]
    return (
        body.replace('\\"', '"')
        .replace("\\'", "'")
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\\\", "\\")
    )
