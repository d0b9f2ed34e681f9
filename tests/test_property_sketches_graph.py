"""Hypothesis nets for the deterministic sketches and graph operators:
invariants that must hold for ANY input, not just the fixtures."""

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from janus_spark.functions import sketches
from janus_spark.operators.graph import bfs_hops
from janus_spark.operators.timeseries import cusum


def _py_hll_det(values, p=12):
    """Independent Python reference of the deterministic HLL estimate."""
    m = 1 << p
    wbits = 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg, w = h % m, h >> p
        rank = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(1 << (50 - r) for r in regs.values()) + (m - len(regs)) * (1 << 50)
    a = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 50)
    raw = a / float(s)
    v0 = m - len(regs)
    if raw <= 2.5 * m and v0 > 0:
        import math

        raw = float(m) * math.log(float(m) / v0)
    return round(raw, 4)


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60))
def test_hll_det_matches_python_reference(spark, vals):
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v long")
    got = sketches.hll_det_distinct(df, "v", ["g"]).collect()[0]["approx_distinct"]
    assert got == _py_hll_det(vals)


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=80))
def test_cms_estimate_bounds(spark, vals):
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v long")
    partials = sketches.cms_partials(df, "v", ["g"], depth=3, width=32)
    probes = df.select("v").distinct()
    est = {
        r["item"]: r["est"]
        for r in sketches.cms_estimate(partials, probes, "v", ["g"], depth=3, width=32).collect()
    }
    from collections import Counter

    true = Counter(vals)
    for v, n in true.items():
        assert n <= est[v] <= len(vals)  # never undercounts, never exceeds N


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    )
)
def test_bfs_hops_matches_python_bfs(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["hops"] for r in bfs_hops(df, seeds, max_hops=15).collect()}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist, frontier = {0: 0}, [0]
    while frontier:
        nxt = []
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    nxt.append(w)
        frontier = nxt
    assert got == dist


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    ),
    drift=st.sampled_from([0.0, 0.5, 2.0]),
)
def test_cusum_closed_form_property(spark, vals, drift):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "k int, ts_ms long, value double"
    )
    out = {r["ts_ms"]: (r["s_pos"], r["s_neg"]) for r in
           cusum(df, ["k"], target=0.0, drift=drift).collect()}
    sp = sn = 0.0
    for i, x in enumerate(vals):
        sp = max(0.0, sp + (x - drift))
        sn = max(0.0, sn + (-x - drift))
        assert abs(out[i][0] - sp) < 1e-4 and abs(out[i][1] - sn) < 1e-4
