from janus_spark.compiler.ast import (
    Bind,
    Filter,
    GraphGroup,
    Group,
    InlineValues,
    Iri,
    Literal,
    MinusGroup,
    OptionalGroup,
    SelectQuery,
    TriplePattern,
    UnionGroup,
    Var,
)
from janus_spark.compiler.parser import SparqlParser, parse_sparql
from janus_spark.compiler.compile import SparqlCompiler, compile_sparql

__all__ = [
    "Var",
    "Iri",
    "Literal",
    "TriplePattern",
    "Group",
    "GraphGroup",
    "Filter",
    "OptionalGroup",
    "UnionGroup",
    "MinusGroup",
    "Bind",
    "InlineValues",
    "SelectQuery",
    "SparqlParser",
    "parse_sparql",
    "SparqlCompiler",
    "compile_sparql",
]
