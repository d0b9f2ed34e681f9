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


def test_triangle_paths_identical_forward_vs_wedge(spark, monkeypatch):
    """The size gate picks between two DIFFERENT algorithms since r10:
    forward edge-iterator (below cap) vs oriented-wedge join (above cap).
    Pin them row-identical on a graph with cliques, a bridge, pendants,
    and an isolated edge — for both triangle_count and
    clustering_coefficient."""
    from janus_spark.operators.graph import clustering_coefficient, triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    extra = [("d", "e"), ("e", "f"), ("f", "d"), ("f", "g"), ("x", "y")]
    edges = spark.createDataFrame(k4 + extra, ["src", "dst"])

    def rows(fn):
        return sorted(tuple(r) for r in fn(edges).collect())

    fwd_tri, fwd_cc = rows(triangle_count), rows(clustering_coefficient)
    monkeypatch.setenv("JANUS_TRIANGLE_BROADCAST_EDGES", "0")  # force wedge path
    assert rows(triangle_count) == fwd_tri
    assert rows(clustering_coefficient) == fwd_cc


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


def test_clustering_coefficient_hand_check(spark):
    from janus_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 3-4 (duplicate/reverse edges collapse)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1)], ["src", "dst"]
    )
    out = {r["id"]: r for r in clustering_coefficient(edges).collect()}
    assert out[1]["coeff"] == 1.0 and out[1]["deg"] == 2
    assert out[2]["coeff"] == 1.0
    # node 3: deg 3, one triangle -> 2*1/(3*2) = 1/3
    assert out[3]["deg"] == 3 and out[3]["n_triangles"] == 1
    assert abs(out[3]["coeff"] - 1 / 3) < 1e-15
    assert 4 not in out  # deg 1 excluded


def test_khop_neighbor_agg_path_graph(spark):
    from janus_spark.operators.graph import khop_neighbor_agg

    # path 1-2-3-4; feats on all nodes
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    feats = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], ["id", "feat"]
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r for r in khop_neighbor_agg(edges, feats, k=2, seeds=seeds).collect()}
    # within <=2 hops of 1: {2, 3}; self excluded, 4 is 3 hops away
    assert out[1]["n_neighbors"] == 2
    assert out[1]["mean_feat"] == 25.0
    # k=1: only the direct neighbor
    o1 = khop_neighbor_agg(edges, feats, k=1, seeds=seeds).collect()[0]
    assert o1["n_neighbors"] == 1 and o1["mean_feat"] == 20.0


def test_negative_edges_deterministic_and_disjoint(spark):
    from janus_spark.operators.graph import negative_edges

    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (3, 103)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(101, 111)], "id long")
    a = sorted(tuple(r) for r in negative_edges(edges, nodes, m=4, seed=3).collect())
    b = sorted(tuple(r) for r in negative_edges(edges, nodes, m=4, seed=3).collect())
    assert a == b and a  # deterministic, non-empty
    real = {(1, 101), (1, 102), (2, 101), (3, 103)}
    assert not (set((s, d) for s, d, _ in a) & real)  # never a real edge
    assert all(101 <= d <= 110 for _, d, _ in a)  # drawn from the dst universe
    assert len(a) <= 3 * 4
    # a different seed gives a different draw
    c = sorted(tuple(r) for r in negative_edges(edges, nodes, m=4, seed=4).collect())
    assert c != a


def test_link_prediction_hand_check(spark):
    # Path graph a-b-c-d-e: non-adjacent pairs at distance 2 share exactly
    # one middle.  deg(b)=deg(c)=deg(d)=2, so RA = 1/2 for each.
    from janus_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "src string, dst string"
    )
    out = {(r["u"], r["v"]): (r["cn"], r["ra"]) for r in link_prediction(edges).collect()}
    assert set(out) == {("a", "c"), ("b", "d"), ("c", "e")}
    for cn, ra in out.values():
        assert cn == 1
        assert ra == pytest.approx(0.5, abs=1e-15)


def test_link_prediction_excludes_adjacent_and_damps_hubs(spark):
    from janus_spark.operators.graph import link_prediction

    # Triangle a-b-c plus hub h connected to everything: (a,b) adjacent ->
    # never emitted even though they share neighbors.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")],
        "src string, dst string",
    )
    out = {(r["u"], r["v"]): r for r in link_prediction(edges).collect()}
    assert all(u < v for u, v in out)
    assert ("a", "b") not in out and ("a", "c") not in out and ("b", "c") not in out
    # (a, d) share only the hub h (deg 4): cn=1, ra=1/4
    assert out[("a", "d")]["cn"] == 1
    assert out[("a", "d")]["ra"] == pytest.approx(0.25, abs=1e-15)
    # hub damping at max_middle_deg=3 removes h as a middle: (a, d) gone
    damped = {
        (r["u"], r["v"]): r
        for r in link_prediction(edges, max_middle_deg=3).collect()
    }
    assert ("a", "d") not in damped


def test_link_prediction_min_common_threshold(spark):
    from janus_spark.operators.graph import link_prediction

    # u and v share middles m1, m2 -> cn=2; u and w share only m1 -> cn=1
    edges = spark.createDataFrame(
        [("u", "m1"), ("u", "m2"), ("v", "m1"), ("v", "m2"), ("w", "m1")],
        "src string, dst string",
    )
    # undirected: m1/m2 likewise share the two middles u and v
    out = {(r["u"], r["v"]): r["cn"] for r in link_prediction(edges, min_common=2).collect()}
    assert out == {("u", "v"): 2, ("m1", "m2"): 2}


def test_label_propagation_two_cliques_with_bridge(spark):
    # Two triangles joined by one bridge edge: each triangle converges to
    # its own min-id community.
    from janus_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    out = {r["id"]: r["community"] for r in label_propagation(edges, iterations=4).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6]
    assert out[4] != out[1]


def test_label_propagation_deterministic_tie_break(spark):
    # Star a-b, a-c: b and c each see only a; a sees the tie {b, c} and
    # must take the SMALLEST label.
    from janus_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([("a", "b"), ("a", "c")], "src string, dst string")
    one = label_propagation(edges, iterations=1).collect()
    got = {r["id"]: r["community"] for r in one}
    assert got["a"] == "b"  # min of the tied {b, c}
    assert got["b"] == "a" and got["c"] == "a"


def test_edge_support_hand_check(spark):
    # K4 minus one edge: the two "diagonal-adjacent" structure —
    # edges of K4 \ {(c,d)}: (a,b) sits in triangles abc and abd -> 2;
    # (a,c),(b,c),(a,d),(b,d) each in exactly one; pendant edge -> 0.
    from janus_spark.operators.graph import edge_support

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = {(r["a"], r["b"]): r["support"] for r in edge_support(edges).collect()}
    assert out[("a", "b")] == 2
    assert out[("a", "c")] == out[("b", "c")] == out[("a", "d")] == out[("b", "d")] == 1
    assert out[("d", "e")] == 0
    # duplicate/reverse edges collapse
    dup = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    out2 = {(r["a"], r["b"]): r["support"] for r in edge_support(dup).collect()}
    assert out2 == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_k_core_fixpoint_hand_check(spark):
    # K4 (a,b,c,d) plus a pendant path d-e-f: 3-core = exactly the K4
    # (peeling f removes e next round — the cascade matters)
    from janus_spark.operators.graph import k_core

    k4 = [(x, y) for x in "abcd" for y in "abcd" if x < y]
    edges = spark.createDataFrame(k4 + [("d", "e"), ("e", "f")], "src string, dst string")
    out = {r["id"]: r["core_deg"] for r in k_core(edges, k=3).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    # k=2: the path dies entirely (f deg1 -> e deg1 -> gone), K4 survives
    out2 = {r["id"]: r["core_deg"] for r in k_core(edges, k=2).collect()}
    assert set(out2) == set("abcd")
    # k above max degree: empty core
    assert k_core(edges, k=10).count() == 0


def test_k_core_bounded_rounds_matches_unrolled_semantics(spark):
    # chain 0-1-2-3-4 with k=2: fixpoint is empty, but ONE round only
    # removes the endpoints' effect — bounded peel reports the
    # intermediate subgraph's degrees (survivors may hold deg < k).
    from janus_spark.operators.graph import k_core

    chain = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    one = {r["id"]: r["core_deg"] for r in k_core(chain, k=2, max_rounds=1).collect()}
    # round 0 removes nodes 0 and 4; surviving edges 1-2, 2-3
    assert one == {1: 1, 2: 2, 3: 1}
    assert k_core(chain, k=2).count() == 0  # fixpoint: nothing survives


def test_k_core_gate_is_not_vacuous(spark, sf_dir):
    # VERDICT r5: the driver gate "passed" with 0 rows on both sides at
    # sf0.01 (k=30 empties the co-purchase core), pinning nothing.  The
    # gate's k is now chosen so every driver fixture exercises a real
    # core — this guard keeps it that way if fixtures or k ever change.
    from janus_spark.queries import q_k_core

    assert q_k_core(spark, sf_dir).count() > 0


def test_k_truss_clique_survives_pendants_peel(spark):
    from janus_spark.operators.graph import k_truss

    # 4-clique {1,2,3,4} + a lone triangle {10,11,12} + pendant edge 4-20
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tri = [(10, 11), (10, 12), (11, 12)]
    edges = spark.createDataFrame(clique + tri + [(4, 20)], "src long, dst long")
    # k=3: every edge in >=1 triangle survives; the pendant peels
    t3 = {(r["a"], r["b"]) for r in k_truss(edges, k=3).collect()}
    assert t3 == set(clique) | set(tri)
    # k=4: each 4-clique edge sits in 2 triangles; the lone triangle peels
    t4 = k_truss(edges, k=4).collect()
    assert {(r["a"], r["b"]) for r in t4} == set(clique)
    assert all(r["support"] == 2 for r in t4)


def test_k_truss_cascading_peel_needs_iteration(spark):
    from janus_spark.operators.graph import k_truss

    # triangle strip 1-2-3, 2-3-4: edge (2,3) has support 2, others 1.
    # k=4 (support>=2): round 1 drops the support-1 edges, which kills
    # (2,3)'s triangles -> fixpoint must be EMPTY (a single pass is not).
    strip = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(strip, "src long, dst long")
    assert k_truss(edges, k=4).count() == 0
    # bounded r=1 returns the mid-peel state instead (support of e1)
    bounded = {(r["a"], r["b"]): r["support"] for r in k_truss(edges, k=4, max_rounds=1).collect()}
    assert bounded == {(2, 3): 0}


def test_k_truss_rejects_k_below_3(spark):
    import pytest

    from janus_spark.operators.graph import k_truss

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_truss(edges, k=2)


def test_modularity_known_graph(spark):
    from janus_spark.operators.graph import modularity

    # two triangles bridged by one edge; m = 7
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    split = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)], "id long, community long"
    )
    row = modularity(edges, split).collect()[0]
    assert abs(row["modularity"] - 5.0 / 14.0) < 1e-12  # exact rational 70/196
    assert row["n_communities"] == 2 and row["m_edges"] == 7
    # the degenerate all-one-community assignment scores exactly 0
    allone = spark.createDataFrame([(i, 0) for i in range(1, 7)], "id long, community long")
    assert modularity(edges, allone).collect()[0]["modularity"] == 0.0


def test_modularity_rejects_empty_graph(spark):
    import pytest

    from janus_spark.operators.graph import modularity

    e = spark.createDataFrame([], "src long, dst long")
    lab = spark.createDataFrame([], "id long, community long")
    with pytest.raises(ValueError):
        modularity(e, lab)


def test_ari_known_values(spark):
    from janus_spark.operators.graph import adjusted_rand_index

    a = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)], "id long, community long"
    )
    # identical partition (different label names): ARI = 1
    b_same = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 7), (5, 7), (6, 7)], "id long, community long"
    )
    assert adjusted_rand_index(a, b_same).collect()[0]["ari"] == 1.0
    # sklearn-checked reference: [1,1,1,2,2,2] vs [1,1,2,2,3,3] -> 0.2424...
    b_diff = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3)], "id long, community long"
    )
    r = adjusted_rand_index(a, b_diff).collect()[0]
    # exact rational: sij=2 sa=6 sb=3 p=15 -> num=2*2*15-2*18=24, den=15*9-36=99
    assert abs(r["ari"] - 24.0 / 99.0) < 1e-15
    assert (r["pairs_both"], r["pairs_a"], r["pairs_b"]) == (2, 6, 3)


def test_ari_degenerate_all_singletons(spark):
    from janus_spark.operators.graph import adjusted_rand_index

    a = spark.createDataFrame([(i, i) for i in range(1, 5)], "id long, community long")
    assert adjusted_rand_index(a, a).collect()[0]["ari"] == 1.0  # diagonal, den=0
