"""PageRank operator semantics (mass conservation, known fixed points,
dangling-node redistribution)."""

import pytest
from pyspark.sql import functions as F

from janus_spark.operators.graph import pagerank


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_cycle_is_uniform_fixed_point(spark):
    # 3-cycle: uniform 1/3 is the exact fixed point at any damping
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    out = _ranks(pagerank(edges, iterations=5))
    for v in out.values():
        assert v == pytest.approx(1 / 3, rel=1e-12)


def test_mass_conserved_with_dangling_node(spark):
    # b has no out-links; its mass must be redistributed, total stays 1
    edges = spark.createDataFrame([("a", "b"), ("c", "b")], "src string, dst string")
    out = pagerank(edges, iterations=4)
    total = out.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, rel=1e-9)
    r = _ranks(out)
    assert r["b"] > r["a"] and r["b"] > r["c"]  # sink collects rank
    assert r["a"] == pytest.approx(r["c"], rel=1e-12)  # symmetric sources


def test_duplicate_edges_do_not_multiply_votes(spark):
    once = spark.createDataFrame([("a", "b"), ("a", "c")], "src string, dst string")
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string"
    )
    assert _ranks(pagerank(once, iterations=3)) == _ranks(pagerank(dup, iterations=3))


def test_one_iteration_matches_hand_computation(spark):
    # star: a->b, a->c ; b,c dangling.  After 1 iter (d=0.85, n=3):
    # dangling mass = 2/3; base = 0.15/3 + 0.85*(2/3)/3
    edges = spark.createDataFrame([("a", "b"), ("a", "c")], "src string, dst string")
    base = 0.15 / 3 + 0.85 * (2 / 3) / 3
    r = _ranks(pagerank(edges, iterations=1))
    assert r["a"] == pytest.approx(base, rel=1e-12)
    assert r["b"] == pytest.approx(base + 0.85 * (1 / 3) / 2, rel=1e-12)
    assert r["c"] == pytest.approx(r["b"], rel=1e-12)


def test_triangle_count_k4_and_star(spark):
    from janus_spark.operators.graph import triangle_count

    # K4: every node is in C(3,2)=3 triangles; star hub: none
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    star = [("hub", f"leaf{i}") for i in range(5)]
    edges = spark.createDataFrame(k4 + star, ["src", "dst"])
    out = {r["id"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_count_collapses_duplicates_and_loops(spark):
    from janus_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"), ("b", "c")],
        ["src", "dst"],
    )
    out = {r["id"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_personalized_pagerank_localizes_mass(spark):
    from janus_spark.operators.graph import pagerank

    # two disconnected 3-cycles; seeding in the first keeps ALL mass there
    c1 = [("a", "b"), ("b", "c"), ("c", "a")]
    c2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(c1 + c2, ["src", "dst"])
    ranks = {r["id"]: r["rank"] for r in
             pagerank(edges, iterations=5, seeds=["a"]).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert all(ranks[v] == 0.0 for v in ("x", "y", "z"))
    assert ranks["a"] > ranks["b"] > 0  # seed holds the most mass
    # uniform teleport spreads across both components
    uni = {r["id"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert all(uni[v] > 0 for v in "abcxyz")


def test_bfs_hops_takes_min_path(spark):
    from janus_spark.operators.graph import bfs_hops

    # two routes to d: a->b->c->d (3 hops) and a->x->d (2 hops)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x"), ("x", "d"), ("z", "q")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert got == {"a": 0, "b": 1, "x": 1, "c": 2, "d": 2}
    # unreachable nodes (z, q from a different component... q IS reachable
    # from z only) are absent


def test_bfs_hops_multi_seed_and_bound(spark):
    from janus_spark.operators.graph import bfs_hops

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (7,)], "id long")
    got = {r["id"]: r["hops"] for r in bfs_hops(chain, seeds, max_hops=2).collect()}
    # node 8 is 8 hops from seed 0 but 1 hop from seed 7 -> min wins;
    # max_hops=2 truncates the frontier at distance 2
    assert got[8] == 1 and got[9] == 2 and got[2] == 2 and 3 not in got


def test_shortest_paths_prefers_cheaper_long_route(spark):
    from janus_spark.operators.graph import shortest_paths

    # a->d direct costs 10; a->b->c->d costs 1+1+1
    edges = spark.createDataFrame(
        [("a", "d", 10.0), ("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
        "src string, dst string, w double",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["dist"] for r in shortest_paths(edges, seeds).collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}


def test_shortest_paths_rejects_negative_weights(spark):
    import pytest

    from janus_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(ValueError):
        shortest_paths(edges, seeds)


def test_harmonic_centrality_hand_check(spark):
    from janus_spark.operators.graph import harmonic_centrality

    # path graph 0→1→2→3 plus shortcut 0→2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(0,), (1,)], "id long")
    out = {r["id"]: r for r in harmonic_centrality(edges, sources).collect()}
    # d(0,1)=1; d(0,2)=1, d(1,2)=1; d(0,3)=2, d(1,3)=2
    assert out[1]["harmonic"] == 1.0 and out[1]["n_reached"] == 1
    assert out[2]["harmonic"] == 2.0 and out[2]["n_reached"] == 2
    assert out[3]["harmonic"] == 1.0 and out[3]["n_reached"] == 2
    assert 0 not in out  # no source reaches node 0


def test_harmonic_centrality_lcm_guard(spark):
    import pytest

    from janus_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    sources = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        harmonic_centrality(edges, sources, max_hops=43)
