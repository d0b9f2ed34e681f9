"""Janus-QL parser and hybrid-query decomposition — operators C1/C2.

Grammar (reference src/parsing/janusql_parser.rs:144-413; window spec
match at :381-402)::

    PREFIX p: <iri> ...
    REGISTER RStream <out> AS
    SELECT <projection>
    FROM NAMED WINDOW <w> ON STREAM <s> [RANGE r STEP st]          -- live
    FROM NAMED WINDOW <w> ON STREAM|LOG <s> [START a END b]        -- hist fixed
    FROM NAMED WINDOW <w> ON LOG <s> [OFFSET o RANGE r STEP st]    -- hist sliding
    USING BASELINE <w> LAST|AGGREGATE
    WHERE { WINDOW <w> { ... } ...  non-window patterns ... }

Decomposition (C2, janusql_parser.rs:453-530): each historical window's
body becomes its own per-window query with the SELECT pruned to variables
bound inside that window; the live windows plus the NON-window patterns
(which is how baseline triples join in) form the live query.  Here the
decomposition produces AST objects compiled straight to DataFrame plans —
no intermediate query strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from janus_spark.compiler.ast import (
    Bind,
    Filter,
    Group,
    InlineValues,
    SelectQuery,
    TriplePattern,
    UnionGroup,
    Var,
    expr_vars,
)
from janus_spark.compiler.ast import EVar, GraphGroup, MinusGroup, OptionalGroup
from janus_spark.compiler.parser import SparqlParser
from janus_spark.compiler.tokenizer import TokenStream, tokenize

LIVE_SLIDING = "live_sliding"
HIST_FIXED = "historical_fixed"
HIST_SLIDING = "historical_sliding"


@dataclass
class WindowDef:
    name: str  # window IRI
    source: str  # stream/log IRI
    on: str  # "STREAM" | "LOG"
    kind: str  # LIVE_SLIDING | HIST_FIXED | HIST_SLIDING
    range_ms: int | None = None
    step_ms: int | None = None
    start_ts: int | None = None
    end_ts: int | None = None
    offset_ms: int | None = None


@dataclass
class JanusQuery:
    prefixes: dict[str, str]
    operator: str  # "RStream" (the only R2S operator the reference emits)
    output: str  # output stream IRI
    projection: list  # same shape as SelectQuery.projection (None = *)
    distinct: bool
    group_by: list
    having: object
    order_by: list
    limit: int | None
    offset: int | None
    windows: list[WindowDef] = field(default_factory=list)
    baseline_window: str | None = None
    baseline_mode: str | None = None  # "LAST" | "AGGREGATE"
    window_bodies: dict[str, Group] = field(default_factory=dict)
    non_window: Group | None = None

    @property
    def live_windows(self) -> list[WindowDef]:
        return [w for w in self.windows if w.kind == LIVE_SLIDING]

    @property
    def historical_windows(self) -> list[WindowDef]:
        return [w for w in self.windows if w.kind in (HIST_FIXED, HIST_SLIDING)]

    def is_hybrid(self) -> bool:
        return bool(self.live_windows) and bool(self.historical_windows)

    # ---------------------------------------------------- decomposition
    def historical_query(self, window: WindowDef) -> SelectQuery:
        """Per-historical-window query with SELECT pruned to vars bound in
        that window's pattern (janusql_parser.rs:512-521,567-593)."""
        body = self.window_bodies[window.name]
        bound = group_vars(body)
        if self.projection is None:
            proj = None
        else:
            proj = [(e, a) for e, a in self.projection if expr_vars(e) and expr_vars(e) <= bound]
            if not proj:
                proj = [(EVar(v), v) for v in sorted(bound)]
        # projection aliases (e.g. (COUNT(?e) AS ?n)) are in scope for
        # HAVING/ORDER BY even though no pattern binds them
        in_scope = bound | ({a for _, a in proj} if proj else set())
        return SelectQuery(
            projection=proj,
            where=body,
            distinct=self.distinct,
            group_by=[g for g in self.group_by if _grp_vars(g) <= bound],
            having=self.having if (self.having is not None and expr_vars(self.having) <= in_scope) else None,
            order_by=[(e, asc) for e, asc in self.order_by if expr_vars(e) <= in_scope],
            limit=self.limit,
            offset=self.offset,
        )

    def live_query(self) -> SelectQuery:
        """The live-side query: all live-window bodies merged (cross-window
        merge at fire time, live_stream_processing.rs:466-482) plus the
        non-window patterns (baseline joins)."""
        g = Group()
        for w in self.live_windows:
            g.elements.extend(self.window_bodies[w.name].elements)
        if self.non_window is not None:
            g.elements.extend(self.non_window.elements)
        bound = group_vars(g)
        proj = self.projection
        if proj is not None:
            proj = [(e, a) for e, a in proj if not expr_vars(e) or expr_vars(e) <= bound]
        return SelectQuery(
            projection=proj,
            where=g,
            distinct=self.distinct,
            group_by=self.group_by,
            having=self.having,
            order_by=self.order_by,
            limit=self.limit,
            offset=self.offset,
        )


def _grp_vars(g) -> set[str]:
    e, _ = g
    return expr_vars(e)


def group_vars(g: Group) -> set[str]:
    """All variables bound by patterns in a group (recursively)."""
    out: set[str] = set()
    for el in g.elements:
        if isinstance(el, TriplePattern):
            for t in (el.s, el.p, el.o):
                if isinstance(t, Var):
                    out.add(t.name)
        elif isinstance(el, (OptionalGroup, MinusGroup)):
            out |= group_vars(el.group)
        elif isinstance(el, GraphGroup):
            out |= group_vars(el.group)
            if isinstance(el.term, Var):
                out.add(el.term.name)
        elif isinstance(el, UnionGroup):
            for b in el.branches:
                out |= group_vars(b)
        elif isinstance(el, Bind):
            out.add(el.var)
        elif isinstance(el, InlineValues):
            out |= set(el.var_names)
        elif isinstance(el, Group):
            out |= group_vars(el)
    return out


class JanusQLParser(SparqlParser):
    """Extends the SPARQL parser with the Janus-QL clauses."""

    def parse_janus(self) -> JanusQuery:
        self.parse_prologue()

        # REGISTER RStream <out> AS  (janusql_parser.rs:309-328)
        operator, output = "RStream", ""
        if self.ts.at_kw("REGISTER"):
            self.ts.advance()
            operator = self.ts.advance().text  # RStream / IStream / DStream
            out_tok = self.ts.advance()
            if out_tok.kind == "IRI":
                output = out_tok.text[1:-1]
            elif out_tok.kind == "PNAME":
                output = self.expand_pname(out_tok.text)
            self.ts.eat_kw("AS")

        self.ts.eat_kw("SELECT")
        distinct = False
        if self.ts.at_kw("DISTINCT"):
            self.ts.advance()
            distinct = True
        projection = self._parse_projection()

        windows: list[WindowDef] = []
        while self.ts.at_kw("FROM"):
            windows.append(self._parse_window_clause())

        baseline_window = baseline_mode = None
        if self.ts.at_kw("USING"):
            self.ts.advance()
            self.ts.eat_kw("BASELINE")
            w = self.ts.advance()
            baseline_window = w.text[1:-1] if w.kind == "IRI" else self.expand_pname(w.text)
            if self.ts.cur.kind == "KW" and self.ts.cur.text.upper() in ("LAST", "AGGREGATE"):
                baseline_mode = self.ts.advance().text.upper()
            else:
                baseline_mode = "LAST"  # reference default (janus_api.rs:150-166)

        if self.ts.at_kw("WHERE"):
            self.ts.advance()
        window_bodies, non_window = self._parse_janus_where()

        q = JanusQuery(
            prefixes=dict(self.prefixes),
            operator=operator,
            output=output,
            projection=projection,
            distinct=distinct,
            group_by=[],
            having=None,
            order_by=[],
            limit=None,
            offset=None,
            windows=windows,
            baseline_window=baseline_window,
            baseline_mode=baseline_mode,
            window_bodies=window_bodies,
            non_window=non_window,
        )
        sq = SelectQuery(projection=projection, where=Group())
        self.parse_modifiers(sq)
        q.group_by, q.having, q.order_by = sq.group_by, sq.having, sq.order_by
        q.limit, q.offset = sq.limit, sq.offset

        # validation (janusql_parser.rs:253-263)
        names = {w.name for w in q.windows}
        for wname in q.window_bodies:
            if wname not in names:
                raise SyntaxError(f"WINDOW {wname} in WHERE has no FROM NAMED WINDOW clause")
        if q.baseline_window is not None:
            hist = {w.name for w in q.historical_windows}
            if q.baseline_window not in hist:
                raise SyntaxError(f"USING BASELINE {q.baseline_window} does not name a historical window")
        return q

    def _parse_projection(self):
        if self.ts.at_op("*"):
            self.ts.advance()
            return None
        projection = []
        while True:
            if self.ts.cur.kind == "VAR":
                v = self.ts.advance().text[1:]
                projection.append((EVar(v), v))
            elif self.ts.at_op("("):
                self.ts.advance()
                e = self.parse_expr()
                self.ts.eat_kw("AS")
                v = self.ts.advance().text[1:]
                self.ts.eat_op(")")
                projection.append((e, v))
            else:
                break
        if not projection:
            raise SyntaxError("empty SELECT clause")
        return projection

    def _parse_window_clause(self) -> WindowDef:
        self.ts.eat_kw("FROM")
        self.ts.eat_kw("NAMED")
        self.ts.eat_kw("WINDOW")
        name = self._iri()
        self.ts.eat_kw("ON")
        if self.ts.at_kw("STREAM"):
            on = "STREAM"
        elif self.ts.at_kw("LOG"):
            on = "LOG"
        else:
            raise SyntaxError(f"expected STREAM or LOG, got {self.ts.cur.text!r}")
        self.ts.advance()
        source = self._iri()
        self.ts.eat_op("[")
        spec: dict[str, int] = {}
        order: list[str] = []
        while not self.ts.at_op("]"):
            kw = self.ts.advance().text.upper()
            val = int(self.ts.advance().text)
            spec[kw] = val
            order.append(kw)
        self.ts.eat_op("]")

        # spec → kind (janusql_parser.rs:381-402); ON STREAM with START/END
        # is accepted as historical-fixed (WINDOW_TYPES_EXPLAINED.md:12,87)
        if "START" in spec and "END" in spec:
            return WindowDef(name, source, on, HIST_FIXED, start_ts=spec["START"], end_ts=spec["END"])
        if "OFFSET" in spec:
            if on != "LOG":
                raise SyntaxError("OFFSET/RANGE/STEP windows require ON LOG")
            return WindowDef(
                name, source, on, HIST_SLIDING,
                offset_ms=spec["OFFSET"], range_ms=spec["RANGE"], step_ms=spec.get("STEP", spec["RANGE"]),
            )
        if "RANGE" in spec:
            if on == "LOG":
                raise SyntaxError("RANGE/STEP live windows are invalid ON LOG (janusql_parser.rs:383-389)")
            return WindowDef(
                name, source, on, LIVE_SLIDING,
                range_ms=spec["RANGE"], step_ms=spec.get("STEP", spec["RANGE"]),
            )
        raise SyntaxError(f"unrecognized window spec {spec!r}")

    def _iri(self) -> str:
        t = self.ts.advance()
        if t.kind == "IRI":
            return t.text[1:-1]
        if t.kind == "PNAME":
            return self.expand_pname(t.text)
        raise SyntaxError(f"expected IRI, got {t.text!r} at offset {t.pos}")

    def _parse_janus_where(self) -> tuple[dict[str, Group], Group]:
        self.ts.eat_op("{")
        bodies: dict[str, Group] = {}
        non_window = Group()
        while not self.ts.at_op("}"):
            if self.ts.at_kw("WINDOW"):
                self.ts.advance()
                name = self._iri()
                body = self.parse_group()
                if name in bodies:
                    bodies[name].elements.extend(body.elements)
                else:
                    bodies[name] = body
            else:
                sub = self._parse_group_element()
                non_window.elements.extend(sub)
            if self.ts.at_op("."):
                self.ts.advance()
        self.ts.eat_op("}")
        return bodies, non_window

    def _parse_group_element(self) -> list:
        """One non-window WHERE element (triples / FILTER / BIND / ...)."""
        g = Group()
        if self.ts.at_kw("FILTER"):
            self.ts.advance()
            g.elements.append(Filter(self.parse_bracketed_or_call_expr()))
        elif self.ts.at_kw("BIND"):
            self.ts.advance()
            self.ts.eat_op("(")
            e = self.parse_expr()
            self.ts.eat_kw("AS")
            v = self.ts.advance().text[1:]
            self.ts.eat_op(")")
            g.elements.append(Bind(e, v))
        elif self.ts.at_kw("OPTIONAL"):
            self.ts.advance()
            g.elements.append(OptionalGroup(self.parse_group()))
        else:
            self.parse_triples_block(g)
        return g.elements


def parse_janusql(text: str, prefixes: dict[str, str] | None = None) -> JanusQuery:
    return JanusQLParser(text, prefixes).parse_janus()
