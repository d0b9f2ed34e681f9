"""Hypothesis property tests for the local union-find tier of
``dedup_clusters`` (janus_spark/datapipe/dedup.py::_local_components):
against a brute-force transitive-closure reference, the component
representative must be the component MINIMUM for every node — the same
fixed point the distributed label propagation converges to."""

from hypothesis import given, settings, strategies as st

from janus_spark.datapipe.dedup import _local_components


def _brute_components(edges):
    nodes = {x for e in edges for x in e}
    comp = {x: {x} for x in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            if comp[a] is not comp[b]:
                merged = comp[a] | comp[b]
                for x in merged:
                    comp[x] = merged
                changed = True
    return {x: min(comp[x]) for x in nodes}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=120,
    )
)
def test_local_components_match_brute_force(edges):
    assert _local_components(edges) == _brute_components(edges)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("ab", max_size=3), st.text("ab", max_size=3)),
        min_size=0,
        max_size=60,
    )
)
def test_local_components_string_ids(edges):
    assert _local_components(edges) == _brute_components(edges)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=80,
    ),
    st.randoms(),
)
def test_local_components_edge_order_invariant(edges, rnd):
    want = _local_components(edges)
    shuffled = edges[:]
    rnd.shuffle(shuffled)
    assert _local_components(shuffled) == want
