"""Property-based tests (hypothesis) for the entity-resolution family.

Small random record corpora generated driver-side; Spark evaluates the
distributed plan; the invariant is checked against a brute-force python
model of the same definition (sorted-neighborhood window membership) or
a structural identity (ARI symmetry / self-agreement, eval count
algebra).  Few examples per property — each example is a Spark job.
"""

import itertools

import pytest
from hypothesis import given, settings, strategies as st

key_st = st.integers(min_value=0, max_value=6)  # few keys -> many ties


@pytest.fixture(scope="module")
def sess():
    from janus_spark.session import get_spark

    return get_spark("prop_entity")


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(key_st, min_size=2, max_size=40),
    window=st.integers(min_value=2, max_value=7),
)
def test_sorted_neighborhood_equals_bruteforce(sess, keys, window):
    from janus_spark.datapipe.entity import sorted_neighborhood_candidates

    rows = [(i + 1, ["t"], "k%02d" % k, 0.0) for i, k in enumerate(keys)]
    df = sess.createDataFrame(rows, "id long, toks array<string>, blk string, val double")
    got = {
        (r["a"], r["b"])
        for r in sorted_neighborhood_candidates(df, "id", "blk", window, ["toks"]).collect()
    }
    order = [i for i, _, k, _ in sorted(rows, key=lambda r: (r[2], r[0]))]
    want = {
        tuple(sorted((order[i], order[j])))
        for i, j in itertools.combinations(range(len(order)), 2)
        if abs(i - j) <= window - 1
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    labels_a=st.lists(st.integers(0, 3), min_size=2, max_size=25),
    labels_b_seed=st.integers(0, 3),
)
def test_ari_symmetric_and_self_is_one(sess, labels_a, labels_b_seed):
    from janus_spark.operators.graph import adjusted_rand_index

    n = len(labels_a)
    labels_b = [(la + i * labels_b_seed) % 4 for i, la in enumerate(labels_a)]
    a = sess.createDataFrame(
        [(i + 1, la) for i, la in enumerate(labels_a)], "id long, community long"
    )
    b = sess.createDataFrame(
        [(i + 1, lb) for i, lb in enumerate(labels_b)], "id long, community long"
    )
    ab = adjusted_rand_index(a, b).collect()[0]
    ba = adjusted_rand_index(b, a).collect()[0]
    assert ab["ari"] == ba["ari"]  # symmetry, bit-exact
    assert -1.0 <= ab["ari"] <= 1.0
    assert adjusted_rand_index(a, a).collect()[0]["ari"] == 1.0


@settings(max_examples=6, deadline=None)
@given(ents=st.lists(st.integers(0, 4), min_size=2, max_size=20))
def test_eval_count_algebra(sess, ents):
    """tp+fp must equal the total predicted pairs Σ C(|entity|,2), and
    tp+fn the truth size, for ANY truth subset."""
    from janus_spark.datapipe.entity import evaluate_resolution

    assign = sess.createDataFrame(
        [(i + 1, e) for i, e in enumerate(ents)], "id long, entity_id long"
    )
    groups = {}
    for i, e in enumerate(ents):
        groups.setdefault(e, []).append(i + 1)
    pred = [
        p for ids in groups.values() for p in itertools.combinations(sorted(ids), 2)
    ]
    truth = pred[::2] + [(998, 999)]  # half the true pairs + one miss
    t = sess.createDataFrame(truth, "a long, b long")
    r = evaluate_resolution(assign, t, "id").collect()[0]
    assert r["tp"] + r["fp"] == len(pred)
    assert r["tp"] + r["fn"] == len(truth)
    assert r["tp"] == len(pred[::2])
