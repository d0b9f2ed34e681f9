"""SPARQL-subset algebra AST.

The reference has no algebra of its own (SPARQL evaluation is delegated
to Oxigraph, src/querying/oxigraph_adapter.rs:104-148); this module is the
replacement's intermediate representation, designed to lower directly to
DataFrame operators (see compile.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- terms
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Literal:
    lexical: str
    numeric: float | int | None = None  # set when the literal is numeric

    @staticmethod
    def number(v: float | int) -> "Literal":
        s = repr(v)
        return Literal(s, v)


@dataclass(frozen=True)
class Path:
    """Property path (SPARQL 1.1 subset): link / seq / alt / inv / plus /
    star / opt (zero-or-one) / negset (negated property set).  ``parts``
    holds child Paths; a link's ``iri`` is set; a negset's ``parts`` are
    the excluded links."""

    op: str  # "link" | "seq" | "alt" | "inv" | "plus" | "star" | "opt" | "negset"
    parts: tuple = ()
    iri: str | None = None


Term = Var | Iri | Literal


# ---------------------------------------------------------- expressions
@dataclass(frozen=True)
class EVar:
    name: str


@dataclass(frozen=True)
class ENum:
    value: float | int


@dataclass(frozen=True)
class EStr:
    value: str


@dataclass(frozen=True)
class EBool:
    value: bool


@dataclass(frozen=True)
class EIri:
    value: str


@dataclass(frozen=True)
class EBin:
    op: str  # || && = != < <= >= > + - * / IN NOTIN
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class EUn:
    op: str  # ! -
    operand: "Expr"


@dataclass(frozen=True)
class ECall:
    """Function call: SPARQL builtin, aggregate, or extension function
    (by normalized name, e.g. ``janus:zscore`` -> ``zscore``)."""

    name: str
    args: tuple["Expr", ...] = ()
    distinct: bool = False  # for aggregates
    extra: str | None = None  # e.g. GROUP_CONCAT separator

    def is_aggregate(self) -> bool:
        return self.name in AGGREGATES


AGGREGATES = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT", "COUNT_STAR"}


@dataclass(frozen=True, eq=False)
class EExists:
    """FILTER [NOT] EXISTS { group } — compiled as a semi/anti join, not a
    Column (handled at Filter level in compile_group)."""

    group: object  # Group


Expr = EVar | ENum | EStr | EBool | EIri | EBin | EUn | ECall | EExists


# ------------------------------------------------------------- patterns
@dataclass
class TriplePattern:
    s: Term
    p: Term
    o: Term


@dataclass
class Filter:
    expr: Expr


@dataclass
class Bind:
    expr: Expr
    var: str


@dataclass
class InlineValues:
    var_names: list[str]
    rows: list[list[str | float | int | None]]  # None = UNDEF


@dataclass
class Group:
    elements: list = field(default_factory=list)


@dataclass
class GraphGroup:
    term: Term  # Iri or Var
    group: Group


@dataclass
class OptionalGroup:
    group: Group


@dataclass
class UnionGroup:
    branches: list[Group] = field(default_factory=list)


@dataclass
class MinusGroup:
    group: Group


# ---------------------------------------------------------------- query
@dataclass
class SelectQuery:
    projection: list[tuple[Expr, str]] | None  # None = SELECT *
    where: Group
    distinct: bool = False
    group_by: list[tuple[Expr, str | None]] = field(default_factory=list)
    having: Expr | None = None
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, ascending)
    limit: int | None = None
    offset: int | None = None
    ask: bool = False

    def has_aggregates(self) -> bool:
        if self.group_by:
            return True
        if self.projection is None:
            return False
        return any(_contains_aggregate(e) for e, _ in self.projection)


@dataclass
class SubSelect:
    """Nested ``{ SELECT ... }`` inside a group — joined on shared vars."""

    query: "SelectQuery"


@dataclass
class ConstructQuery:
    """CONSTRUCT { template } WHERE { pattern } — Q8."""

    template: list[TriplePattern]
    where: Group
    limit: int | None = None


@dataclass
class DescribeQuery:
    """DESCRIBE ?v/<iri>… [WHERE { pattern }] — subject-outgoing
    description.  SPARQL 1.1 §16.4 leaves the result form implementation-
    defined; we emit all triples whose subject is a described resource,
    the minimal behavior (Oxigraph-inherited surface in the reference:
    its adapter formats any QueryResults::Graph,
    src/querying/oxigraph_adapter.rs:183-195)."""

    resources: list  # Var | Iri; empty ⇒ DESCRIBE * (all in-scope vars)
    where: "Group | None" = None


def _contains_aggregate(e: Expr) -> bool:
    if isinstance(e, ECall):
        return e.is_aggregate() or any(_contains_aggregate(a) for a in e.args)
    if isinstance(e, EBin):
        return _contains_aggregate(e.left) or _contains_aggregate(e.right)
    if isinstance(e, EUn):
        return _contains_aggregate(e.operand)
    return False


def expr_vars(e: Expr) -> set[str]:
    if isinstance(e, EVar):
        return {e.name}
    if isinstance(e, EBin):
        return expr_vars(e.left) | expr_vars(e.right)
    if isinstance(e, EUn):
        return expr_vars(e.operand)
    if isinstance(e, ECall):
        out: set[str] = set()
        for a in e.args:
            out |= expr_vars(a)
        return out
    return set()
