"""Recursive-descent parser for the SPARQL subset the engine evaluates.

Covers the surface the reference exposes (SURVEY §2.2): BGPs with
``;``/``,`` property-object lists, FILTER with full expression grammar and
extension functions, GRAPH, OPTIONAL, UNION, MINUS, BIND, VALUES,
aggregates + GROUP BY/HAVING, DISTINCT, ORDER BY/LIMIT/OFFSET, ASK,
``a`` == rdf:type.  (The reference inherits these from Oxigraph; here they
are parsed natively and lowered to DataFrame plans.)
"""

from __future__ import annotations

from janus_spark.compiler.ast import (
    AGGREGATES,
    Bind,
    EBin,
    EBool,
    ECall,
    EIri,
    ENum,
    EStr,
    EUn,
    EVar,
    Expr,
    Filter,
    GraphGroup,
    Group,
    InlineValues,
    Iri,
    Literal,
    MinusGroup,
    OptionalGroup,
    SelectQuery,
    Term,
    TriplePattern,
    UnionGroup,
    Var,
)
from janus_spark.compiler.tokenizer import TokenStream, tokenize, unquote_string

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# Builtin scalar functions recognized as calls when followed by '('.
BUILTIN_FNS = {
    "STR", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE", "LCASE",
    "CONTAINS", "STRSTARTS", "STRENDS", "SUBSTR", "REPLACE", "REGEX", "IF",
    "COALESCE", "BOUND", "ISIRI", "ISURI", "ISLITERAL", "ISNUMERIC", "ISBLANK",
    "SAMETERM", "RAND", "NOW", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "STRBEFORE", "STRAFTER",
    "DATATYPE", "LANG", "ENCODE_FOR_URI", "IRI", "URI",
    "TZ", "UUID", "STRUUID", "LANGMATCHES", "STRLANG", "STRDT",
}

DEFAULT_PREFIXES = {
    "janus": "https://janus.rs/fn#",
    "baseline": "https://janus.rs/baseline#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
}


class SparqlParser:
    def __init__(self, text: str, prefixes: dict[str, str] | None = None):
        self.ts = TokenStream(tokenize(text))
        self.prefixes = dict(DEFAULT_PREFIXES)
        if prefixes:
            self.prefixes.update(prefixes)

    # ------------------------------------------------------------ entry
    def parse_query(self) -> SelectQuery:
        self.parse_prologue()
        if self.ts.at_kw("ASK"):
            self.ts.advance()
            if self.ts.at_kw("WHERE"):
                self.ts.advance()
            where = self.parse_group()
            return SelectQuery(projection=[], where=where, ask=True)
        if self.ts.at_kw("CONSTRUCT"):
            return self.parse_construct()
        if self.ts.at_kw("DESCRIBE"):
            return self.parse_describe()
        q = self.parse_select()
        if self.ts.cur.kind != "EOF":
            raise SyntaxError(f"trailing tokens at offset {self.ts.cur.pos}: {self.ts.cur.text!r}")
        return q

    def parse_construct(self):
        from janus_spark.compiler.ast import ConstructQuery

        self.ts.eat_kw("CONSTRUCT")
        template_group = self.parse_group()
        template = [el for el in template_group.elements if isinstance(el, TriplePattern)]
        if self.ts.at_kw("WHERE"):
            self.ts.advance()
        where = self.parse_group()
        limit = None
        if self.ts.at_kw("LIMIT"):
            self.ts.advance()
            limit = int(self.ts.advance().text)
        return ConstructQuery(template=template, where=where, limit=limit)

    def parse_describe(self):
        from janus_spark.compiler.ast import DescribeQuery, Iri, Var

        self.ts.eat_kw("DESCRIBE")
        resources: list = []
        if self.ts.at_op("*"):
            self.ts.advance()  # empty resources ⇒ all in-scope vars
        else:
            while self.ts.cur.kind in ("VAR", "IRI", "PNAME"):
                t = self.parse_term()
                if not isinstance(t, (Var, Iri)):
                    raise SyntaxError("DESCRIBE takes variables or IRIs")
                resources.append(t)
            if not resources:
                raise SyntaxError("empty DESCRIBE clause")
        where = None
        if self.ts.at_kw("WHERE") or self.ts.at_op("{"):
            if self.ts.at_kw("WHERE"):
                self.ts.advance()
            where = self.parse_group()
        if self.ts.cur.kind != "EOF":
            raise SyntaxError(f"trailing tokens at offset {self.ts.cur.pos}: {self.ts.cur.text!r}")
        return DescribeQuery(resources=resources, where=where)

    def parse_prologue(self) -> None:
        while self.ts.at_kw("PREFIX", "BASE"):
            kw = self.ts.advance().text.upper()
            if kw == "PREFIX":
                pname = self.ts.advance()
                if pname.kind != "PNAME":
                    raise SyntaxError(f"expected prefix name, got {pname.text!r}")
                iri = self.ts.advance()
                if iri.kind != "IRI":
                    raise SyntaxError(f"expected IRI after PREFIX, got {iri.text!r}")
                self.prefixes[pname.text[:-1] if pname.text.endswith(":") else pname.text.split(":")[0]] = iri.text[1:-1]
            else:
                self.ts.advance()  # BASE <iri> — accepted, unused

    # ----------------------------------------------------------- select
    def parse_select(self) -> SelectQuery:
        self.ts.eat_kw("SELECT")
        distinct = False
        if self.ts.at_kw("DISTINCT"):
            self.ts.advance()
            distinct = True
        elif self.ts.at_kw("REDUCED"):
            self.ts.advance()
        projection: list[tuple[Expr, str]] | None
        if self.ts.at_op("*"):
            self.ts.advance()
            projection = None
        else:
            projection = []
            while True:
                if self.ts.cur.kind == "VAR":
                    v = self.ts.advance().text[1:]
                    projection.append((EVar(v), v))
                elif self.ts.at_op("("):
                    self.ts.advance()
                    e = self.parse_expr()
                    self.ts.eat_kw("AS")
                    vtok = self.ts.advance()
                    if vtok.kind != "VAR":
                        raise SyntaxError(f"expected variable after AS, got {vtok.text!r}")
                    self.ts.eat_op(")")
                    projection.append((e, vtok.text[1:]))
                else:
                    break
            if not projection:
                raise SyntaxError("empty SELECT clause")
        # ignore FROM clauses (dataset selection is the engine's job)
        while self.ts.at_kw("FROM"):
            self.ts.advance()
            if self.ts.at_kw("NAMED"):
                self.ts.advance()
            self.ts.advance()
        if self.ts.at_kw("WHERE"):
            self.ts.advance()
        where = self.parse_group()
        q = SelectQuery(projection=projection, where=where, distinct=distinct)
        self.parse_modifiers(q)
        return q

    def parse_modifiers(self, q: SelectQuery) -> None:
        if self.ts.at_kw("GROUP"):
            self.ts.advance()
            self.ts.eat_kw("BY")
            while True:
                if self.ts.cur.kind == "VAR":
                    q.group_by.append((EVar(self.ts.advance().text[1:]), None))
                elif self.ts.at_op("("):
                    self.ts.advance()
                    e = self.parse_expr()
                    alias = None
                    if self.ts.at_kw("AS"):
                        self.ts.advance()
                        alias = self.ts.advance().text[1:]
                    self.ts.eat_op(")")
                    q.group_by.append((e, alias))
                else:
                    break
        if self.ts.at_kw("HAVING"):
            self.ts.advance()
            q.having = self.parse_expr()
        if self.ts.at_kw("ORDER"):
            self.ts.advance()
            self.ts.eat_kw("BY")
            while True:
                if self.ts.at_kw("ASC", "DESC"):
                    asc = self.ts.advance().text.upper() == "ASC"
                    self.ts.eat_op("(")
                    e = self.parse_expr()
                    self.ts.eat_op(")")
                    q.order_by.append((e, asc))
                elif self.ts.cur.kind == "VAR":
                    q.order_by.append((EVar(self.ts.advance().text[1:]), True))
                elif self.ts.at_op("("):
                    self.ts.advance()
                    e = self.parse_expr()
                    self.ts.eat_op(")")
                    q.order_by.append((e, True))
                else:
                    break
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.ts.at_kw("LIMIT"):
                self.ts.advance()
                q.limit = int(self.ts.advance().text)
            if self.ts.at_kw("OFFSET"):
                self.ts.advance()
                q.offset = int(self.ts.advance().text)

    # ------------------------------------------------------------ group
    def parse_group(self) -> Group:
        self.ts.eat_op("{")
        g = Group()
        while not self.ts.at_op("}"):
            if self.ts.at_kw("FILTER"):
                self.ts.advance()
                g.elements.append(Filter(self.parse_bracketed_or_call_expr()))
            elif self.ts.at_kw("OPTIONAL"):
                self.ts.advance()
                g.elements.append(OptionalGroup(self.parse_group()))
            elif self.ts.at_kw("MINUS"):
                self.ts.advance()
                g.elements.append(MinusGroup(self.parse_group()))
            elif self.ts.at_kw("GRAPH"):
                self.ts.advance()
                term = self.parse_term()
                g.elements.append(GraphGroup(term, self.parse_group()))
            elif self.ts.at_kw("BIND"):
                self.ts.advance()
                self.ts.eat_op("(")
                e = self.parse_expr()
                self.ts.eat_kw("AS")
                v = self.ts.advance().text[1:]
                self.ts.eat_op(")")
                g.elements.append(Bind(e, v))
            elif self.ts.at_kw("VALUES"):
                self.ts.advance()
                g.elements.append(self.parse_values())
            elif self.ts.at_op("{"):
                if self.ts.peek().kind == "KW" and self.ts.peek().text.upper() == "SELECT":
                    from janus_spark.compiler.ast import SubSelect

                    self.ts.advance()
                    sub = self.parse_select()
                    self.ts.eat_op("}")
                    g.elements.append(SubSelect(sub))
                else:
                    first = self.parse_group()
                    branches = [first]
                    while self.ts.at_kw("UNION"):
                        self.ts.advance()
                        branches.append(self.parse_group())
                    g.elements.append(UnionGroup(branches) if len(branches) > 1 else first)
            else:
                self.parse_triples_block(g)
            if self.ts.at_op("."):
                self.ts.advance()
        self.ts.eat_op("}")
        return g

    def parse_values(self) -> InlineValues:
        var_names: list[str] = []
        if self.ts.cur.kind == "VAR":
            var_names = [self.ts.advance().text[1:]]
            self.ts.eat_op("{")
            rows = []
            while not self.ts.at_op("}"):
                rows.append([self._values_term()])
            self.ts.advance()
            return InlineValues(var_names, rows)
        self.ts.eat_op("(")
        while self.ts.cur.kind == "VAR":
            var_names.append(self.ts.advance().text[1:])
        self.ts.eat_op(")")
        self.ts.eat_op("{")
        rows = []
        while self.ts.at_op("("):
            self.ts.advance()
            row = []
            while not self.ts.at_op(")"):
                row.append(self._values_term())
            self.ts.advance()
            rows.append(row)
        self.ts.eat_op("}")
        return InlineValues(var_names, rows)

    def _values_term(self):
        t = self.ts.cur
        if t.kind == "KW" and t.text.upper() == "UNDEF":
            self.ts.advance()
            return None
        term = self.parse_term()
        if isinstance(term, Iri):
            return term.value
        if isinstance(term, Literal):
            return term.numeric if term.numeric is not None else term.lexical
        raise SyntaxError(f"unexpected VALUES term at offset {t.pos}")

    # ---------------------------------------------------------- triples
    def parse_triples_block(self, g: Group) -> None:
        s = self.parse_term()
        while True:
            p = self.parse_verb()
            while True:
                o = self.parse_term()
                g.elements.append(TriplePattern(s, p, o))
                if self.ts.at_op(","):
                    self.ts.advance()
                    continue
                break
            if self.ts.at_op(";"):
                self.ts.advance()
                if self.ts.at_op(".", "}"):
                    break
                continue
            break

    def parse_verb(self):
        """Predicate position: plain IRI/var, or a property path
        (seq ``/``, alt ``|``, inverse ``^``, ``+``/``*`` closures)."""
        if self.ts.cur.kind == "VAR":
            return self.parse_term()
        path = self._parse_path_alt()
        if path.op == "link":
            return Iri(path.iri)
        return path

    def _parse_path_alt(self):
        from janus_spark.compiler.ast import Path

        left = self._parse_path_seq()
        branches = [left]
        while self.ts.at_op("|"):
            self.ts.advance()
            branches.append(self._parse_path_seq())
        return branches[0] if len(branches) == 1 else Path("alt", tuple(branches))

    def _parse_path_seq(self):
        from janus_spark.compiler.ast import Path

        parts = [self._parse_path_elt()]
        while self.ts.at_op("/"):
            self.ts.advance()
            parts.append(self._parse_path_elt())
        return parts[0] if len(parts) == 1 else Path("seq", tuple(parts))

    def _parse_path_elt(self):
        from janus_spark.compiler.ast import Path

        inverse = False
        if self.ts.at_op("^"):
            self.ts.advance()
            inverse = True
        p = self._parse_path_primary()
        if self.ts.at_op("+"):
            self.ts.advance()
            p = Path("plus", (p,))
        elif self.ts.at_op("*"):
            self.ts.advance()
            p = Path("star", (p,))
        elif self.ts.at_op("?"):
            self.ts.advance()
            p = Path("opt", (p,))
        if inverse:
            p = Path("inv", (p,))
        return p

    def _parse_path_primary(self):
        from janus_spark.compiler.ast import Path

        t = self.ts.cur
        if t.kind == "OP" and t.text == "!":
            # negated property set: !ex:p or !(ex:p1|ex:p2|...)
            self.ts.advance()
            links = []
            if self.ts.at_op("("):
                self.ts.advance()
                links.append(self._parse_path_primary())
                while self.ts.at_op("|"):
                    self.ts.advance()
                    links.append(self._parse_path_primary())
                self.ts.eat_op(")")
            else:
                links.append(self._parse_path_primary())
            if any(l.op != "link" for l in links):
                raise SyntaxError("negated property set supports only forward IRIs")
            return Path("negset", tuple(links))
        if t.kind == "OP" and t.text == "(":
            self.ts.advance()
            p = self._parse_path_alt()
            self.ts.eat_op(")")
            return p
        if t.kind == "KW" and t.text == "a":
            self.ts.advance()
            return Path("link", iri=RDF_TYPE)
        if t.kind == "IRI":
            self.ts.advance()
            return Path("link", iri=t.text[1:-1])
        if t.kind == "PNAME":
            self.ts.advance()
            return Path("link", iri=self.expand_pname(t.text))
        raise SyntaxError(f"expected path element, got {t.text!r} at offset {t.pos}")

    def parse_term(self) -> Term:
        t = self.ts.cur
        if t.kind == "VAR":
            self.ts.advance()
            return Var(t.text[1:])
        if t.kind == "IRI":
            self.ts.advance()
            return Iri(t.text[1:-1])
        if t.kind == "PNAME":
            self.ts.advance()
            return Iri(self.expand_pname(t.text))
        if t.kind == "STRING":
            self.ts.advance()
            lex = unquote_string(t.text)
            # strip optional datatype / lang tag (reference strips both,
            # rdf_parser.rs:130-161)
            if self.ts.at_op("^^"):
                self.ts.advance()
                self.ts.advance()  # the datatype IRI/PNAME
            elif self.ts.at_op("@"):
                self.ts.advance()
                self.ts.advance()  # lang tag
            return Literal(lex, _try_num(lex))
        if t.kind == "NUM":
            self.ts.advance()
            v = _num(t.text)
            return Literal(t.text, v)
        if t.kind == "OP" and t.text == "-" and self.ts.peek().kind == "NUM":
            self.ts.advance()
            n = self.ts.advance()
            return Literal("-" + n.text, -_num(n.text))
        if t.kind == "KW" and t.text.upper() in ("TRUE", "FALSE"):
            self.ts.advance()
            return Literal(t.text.lower())
        raise SyntaxError(f"expected term, got {t.kind} {t.text!r} at offset {t.pos}")

    def expand_pname(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise SyntaxError(f"unknown prefix {prefix!r} in {pname!r}")
        return self.prefixes[prefix] + local

    # ------------------------------------------------------ expressions
    def parse_bracketed_or_call_expr(self) -> Expr:
        # FILTER(expr) | FILTER builtin(...) | FILTER janus:fn(...)
        return self.parse_primary() if not self.ts.at_op("(") else self._parse_paren_expr()

    def _parse_paren_expr(self) -> Expr:
        self.ts.eat_op("(")
        e = self.parse_expr()
        self.ts.eat_op(")")
        return e

    def parse_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        e = self.parse_and()
        while self.ts.at_op("||"):
            self.ts.advance()
            e = EBin("||", e, self.parse_and())
        return e

    def parse_and(self) -> Expr:
        e = self.parse_relational()
        while self.ts.at_op("&&"):
            self.ts.advance()
            e = EBin("&&", e, self.parse_relational())
        return e

    def parse_relational(self) -> Expr:
        e = self.parse_additive()
        if self.ts.at_op("=", "!=", "<", "<=", ">", ">="):
            op = self.ts.advance().text
            return EBin(op, e, self.parse_additive())
        if self.ts.at_kw("IN"):
            self.ts.advance()
            return ECall("IN", (e, *self._parse_arg_list()))
        if self.ts.at_kw("NOT"):
            self.ts.advance()
            if self.ts.at_kw("EXISTS"):
                self.ts.advance()
                from janus_spark.compiler.ast import EExists

                return EUn("!", EExists(self.parse_group()))
            self.ts.eat_kw("IN")
            return EUn("!", ECall("IN", (e, *self._parse_arg_list())))
        return e

    def parse_additive(self) -> Expr:
        e = self.parse_multiplicative()
        while self.ts.at_op("+", "-"):
            op = self.ts.advance().text
            e = EBin(op, e, self.parse_multiplicative())
        return e

    def parse_multiplicative(self) -> Expr:
        e = self.parse_unary()
        while self.ts.at_op("*", "/"):
            op = self.ts.advance().text
            e = EBin(op, e, self.parse_unary())
        return e

    def parse_unary(self) -> Expr:
        if self.ts.at_op("!"):
            self.ts.advance()
            return EUn("!", self.parse_unary())
        if self.ts.at_op("-"):
            self.ts.advance()
            return EUn("-", self.parse_unary())
        if self.ts.at_op("+"):
            self.ts.advance()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> Expr:
        t = self.ts.cur
        if t.kind == "OP" and t.text == "(":
            return self._parse_paren_expr()
        if t.kind == "VAR":
            self.ts.advance()
            return EVar(t.text[1:])
        if t.kind == "NUM":
            self.ts.advance()
            return ENum(_num(t.text))
        if t.kind == "STRING":
            self.ts.advance()
            lex = unquote_string(t.text)
            if self.ts.at_op("^^"):
                self.ts.advance()
                self.ts.advance()
                n = _try_num(lex)
                return ENum(n) if n is not None else EStr(lex)
            if self.ts.at_op("@"):
                self.ts.advance()
                self.ts.advance()
            return EStr(lex)
        if t.kind == "KW":
            word = t.text.upper()
            if word in ("TRUE", "FALSE"):
                self.ts.advance()
                return EBool(word == "TRUE")
            if word == "EXISTS":
                from janus_spark.compiler.ast import EExists

                self.ts.advance()
                return EExists(self.parse_group())
            if word == "NOT" and self.ts.peek().kind == "KW" and self.ts.peek().text.upper() == "EXISTS":
                from janus_spark.compiler.ast import EExists

                self.ts.advance()
                self.ts.advance()
                return EUn("!", EExists(self.parse_group()))
            if word in AGGREGATES or word in BUILTIN_FNS:
                self.ts.advance()
                return self._parse_call(word)
            raise SyntaxError(f"unexpected keyword {t.text!r} in expression at offset {t.pos}")
        if t.kind == "PNAME":
            self.ts.advance()
            full = self.expand_pname(t.text)
            if self.ts.at_op("("):
                return self._parse_call_named(_normalize_fn(full))
            return EIri(full)
        if t.kind == "IRI":
            self.ts.advance()
            full = t.text[1:-1]
            if self.ts.at_op("("):
                return self._parse_call_named(_normalize_fn(full))
            return EIri(full)
        raise SyntaxError(f"unexpected token {t.text!r} in expression at offset {t.pos}")

    def _parse_call(self, word: str) -> Expr:
        self.ts.eat_op("(")
        distinct = False
        if self.ts.at_kw("DISTINCT"):
            self.ts.advance()
            distinct = True
        if word == "COUNT" and self.ts.at_op("*"):
            self.ts.advance()
            self.ts.eat_op(")")
            return ECall("COUNT_STAR", (), distinct)
        args: list[Expr] = []
        extra = None
        if not self.ts.at_op(")"):
            args.append(self.parse_expr())
            while self.ts.at_op(","):
                self.ts.advance()
                args.append(self.parse_expr())
            # GROUP_CONCAT(?x ; SEPARATOR="...")
            if self.ts.at_op(";"):
                self.ts.advance()
                self.ts.eat_kw("SEPARATOR")
                self.ts.eat_op("=")
                extra = unquote_string(self.ts.advance().text)
        self.ts.eat_op(")")
        return ECall(word, tuple(args), distinct, extra)

    def _parse_call_named(self, name: str) -> Expr:
        self.ts.eat_op("(")
        args: list[Expr] = []
        if not self.ts.at_op(")"):
            args.append(self.parse_expr())
            while self.ts.at_op(","):
                self.ts.advance()
                args.append(self.parse_expr())
        self.ts.eat_op(")")
        return ECall(name, tuple(args))

    def _parse_arg_list(self) -> tuple[Expr, ...]:
        self.ts.eat_op("(")
        args: list[Expr] = []
        if not self.ts.at_op(")"):
            args.append(self.parse_expr())
            while self.ts.at_op(","):
                self.ts.advance()
                args.append(self.parse_expr())
        self.ts.eat_op(")")
        return tuple(args)


def _num(text: str) -> float | int:
    return int(text) if ("." not in text and "e" not in text.lower()) else float(text)


def _try_num(text: str) -> float | int | None:
    try:
        return _num(text)
    except ValueError:
        return None


def _normalize_fn(iri: str) -> str:
    """Extension-function IRI → registry key, e.g.
    ``https://janus.rs/fn#zscore`` → ``zscore`` (registry.rs:12-23)."""
    for sep in ("#", "/"):
        if sep in iri:
            return iri.rsplit(sep, 1)[1]
    return iri


def parse_sparql(text: str, prefixes: dict[str, str] | None = None) -> SelectQuery:
    return SparqlParser(text, prefixes).parse_query()
