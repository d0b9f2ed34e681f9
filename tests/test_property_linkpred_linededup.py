"""Hypothesis nets for link_prediction and line_dedup: differential
checks against independent brute-force Python references on arbitrary
small inputs."""

from collections import Counter
from fractions import Fraction

from hypothesis import given, settings, strategies as st

from janus_spark.datapipe.dedup import line_dedup
from janus_spark.operators.graph import link_prediction

_SCALE = 10**18


def _py_link_prediction(edge_list, max_middle_deg=None, min_common=1):
    edges = set()
    for a, b in edge_list:
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(nbs) for n, nbs in adj.items()}
    out = {}
    for w, nbs in adj.items():
        if max_middle_deg is not None and deg[w] > max_middle_deg:
            continue
        nbs = sorted(nbs)
        for i, u in enumerate(nbs):
            for v in nbs[i + 1:]:
                cn, s = out.get((u, v), (0, 0))
                out[(u, v)] = (cn + 1, s + _SCALE // deg[w])
    return {
        (u, v): (cn, float(s) / float(_SCALE))
        for (u, v), (cn, s) in out.items()
        if cn >= min_common and (u, v) not in edges
    }


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
    ),
    cap=st.one_of(st.none(), st.integers(1, 5)),
)
def test_link_prediction_matches_brute_force(spark, edges, cap):
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    got = {
        (int(r["u"]), int(r["v"])): (r["cn"], r["ra"])
        for r in link_prediction(df, max_middle_deg=cap).collect()
    }
    want = _py_link_prediction(edges, max_middle_deg=cap)
    assert got == want  # fixed-point terms: floats must be BIT-identical


def _py_line_dedup(docs, min_docs=2, min_chars=1):
    lines = {i: t.split("\n") for i, t in docs}
    counts = Counter()
    for i, ls in lines.items():
        for l in set(ls):
            if len(l.strip()) >= min_chars:
                counts[l] += 1
    dup = {l for l, c in counts.items() if c >= min_docs}
    out = {}
    for i, ls in lines.items():
        kept = [l for l in ls if l not in dup]
        out[i] = (len(ls), len(kept), "\n".join(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aaa", "bb bb", "c", "dd", "boiler plate", ""]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(2, 3),
    min_chars=st.integers(1, 3),
)
def test_line_dedup_matches_brute_force(spark, docs, min_docs, min_chars):
    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_lines"], r["kept_lines"], r["clean_text"])
        for r in line_dedup(df, min_docs=min_docs, min_chars=min_chars).collect()
    }
    assert got == _py_line_dedup(rows, min_docs=min_docs, min_chars=min_chars)


def _py_label_propagation(edge_list, iterations=3):
    edges = set()
    for a, b in edge_list:
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(iterations):
        nxt = {}
        for n, nbs in adj.items():
            counts = {}
            for w in nbs:
                counts[lbl[w]] = counts.get(lbl[w], 0) + 1
            # most frequent, ties -> smallest label
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        lbl = nxt
    return lbl


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    ),
    iters=st.integers(1, 4),
)
def test_label_propagation_matches_brute_force(spark, edges, iters):
    from janus_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    got = {
        r["id"]: r["community"]
        for r in label_propagation(df, iterations=iters).collect()
    }
    assert got == _py_label_propagation(edges, iterations=iters)
