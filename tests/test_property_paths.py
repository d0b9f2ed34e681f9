"""Property paths (SPARQL 1.1 subset: / | ^ + *)."""

import pytest
from pyspark.sql import functions as F

from janus_spark.compiler import compile_sparql, parse_sparql

EX = "http://ex/"


@pytest.fixture(scope="module")
def graph_quads(spark):
    # a small org chart: alice -manages-> bob -manages-> carol -manages-> dave
    # plus knows edges and names
    rows = [
        (0, f"{EX}alice", f"{EX}manages", f"{EX}bob", ""),
        (0, f"{EX}bob", f"{EX}manages", f"{EX}carol", ""),
        (0, f"{EX}carol", f"{EX}manages", f"{EX}dave", ""),
        (0, f"{EX}alice", f"{EX}knows", f"{EX}carol", ""),
        (0, f"{EX}bob", f"{EX}name", "Bob", ""),
        (0, f"{EX}carol", f"{EX}name", "Carol", ""),
        (0, f"{EX}dave", f"{EX}name", "Dave", ""),
    ]
    return spark.createDataFrame(rows, ["ts", "subject", "predicate", "object", "graph"]).cache()


def run(quads, text):
    return compile_sparql(parse_sparql(text), quads)


def test_sequence_path(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?who ?n WHERE {{ ?who <{EX}manages>/<{EX}name> ?n . }}",
    ).collect()
    assert {(r["who"], r["n"]) for r in rows} == {
        (f"{EX}alice", "Bob"),
        (f"{EX}bob", "Carol"),
        (f"{EX}carol", "Dave"),
    }


def test_three_step_sequence(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?n WHERE {{ <{EX}alice> <{EX}manages>/<{EX}manages>/<{EX}name> ?n . }}",
    ).collect()
    assert [r["n"] for r in rows] == ["Carol"]


def test_alternative_path(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}alice> <{EX}manages>|<{EX}knows> ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {f"{EX}bob", f"{EX}carol"}


def test_inverse_path(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?boss WHERE {{ <{EX}bob> ^<{EX}manages> ?boss . }}",
    ).collect()
    assert [r["boss"] for r in rows] == [f"{EX}alice"]


def test_plus_closure(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}alice> <{EX}manages>+ ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {f"{EX}bob", f"{EX}carol", f"{EX}dave"}


def test_star_closure_includes_zero_length(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}alice> <{EX}manages>* ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {f"{EX}alice", f"{EX}bob", f"{EX}carol", f"{EX}dave"}


def test_path_join_with_pattern(graph_quads):
    # closure feeding a regular BGP join
    rows = run(
        graph_quads,
        f"""SELECT ?x ?n WHERE {{
              <{EX}alice> <{EX}manages>+ ?x .
              ?x <{EX}name> ?n .
            }}""",
    ).collect()
    assert {r["n"] for r in rows} == {"Bob", "Carol", "Dave"}


def test_cycle_terminates(spark):
    rows_data = [
        (0, f"{EX}a", f"{EX}next", f"{EX}b", ""),
        (0, f"{EX}b", f"{EX}next", f"{EX}c", ""),
        (0, f"{EX}c", f"{EX}next", f"{EX}a", ""),  # cycle
    ]
    quads = spark.createDataFrame(rows_data, ["ts", "subject", "predicate", "object", "graph"])
    rows = run(quads, f"SELECT ?x WHERE {{ <{EX}a> <{EX}next>+ ?x . }}").collect()
    assert {r["x"] for r in rows} == {f"{EX}a", f"{EX}b", f"{EX}c"}


def test_zero_or_one_path(graph_quads):
    # alice manages? x: alice herself (zero) + bob (one step)
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}alice> <{EX}manages>? ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {f"{EX}alice", f"{EX}bob"}


def test_zero_or_one_in_sequence(graph_quads):
    # manages?/name: own name (zero) plus direct report's name (one)
    rows = run(
        graph_quads,
        f"SELECT ?n WHERE {{ <{EX}bob> <{EX}manages>?/<{EX}name> ?n . }}",
    ).collect()
    assert {r["n"] for r in rows} == {"Bob", "Carol"}


def test_negated_property_set(graph_quads):
    # everything alice points to EXCEPT manages edges
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}alice> !<{EX}manages> ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {f"{EX}carol"}


def test_negated_property_set_multi(graph_quads):
    rows = run(
        graph_quads,
        f"SELECT ?x WHERE {{ <{EX}bob> !(<{EX}manages>|<{EX}knows>) ?x . }}",
    ).collect()
    assert {r["x"] for r in rows} == {"Bob"}  # only the name edge remains
