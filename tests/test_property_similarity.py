"""Property-based tests (hypothesis) for the similarity-search suite.

One Spark job per example: hypothesis generates small random embedding
corpora driver-side; Spark evaluates both the exact and the IVF path on
the same data.  The invariant is structural, not numeric: with
``nprobe = n_cells`` every inverted list is probed, so IVF must return
exactly the brute-force top-k regardless of what k-means did.
"""

import math

import pytest
from hypothesis import given, settings, strategies as st

from janus_spark.datapipe.similarity import cosine_topk, ivf_topk

vec_st = st.lists(
    st.floats(
        min_value=-10,
        max_value=10,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=4,
    max_size=4,
)


@pytest.fixture(scope="module")
def sess():
    from janus_spark.session import get_spark

    return get_spark("prop_similarity")


@settings(max_examples=10, deadline=None)
@given(vecs=st.lists(vec_st, min_size=5, max_size=20, unique_by=tuple))
def test_ivf_probe_all_matches_bruteforce(sess, vecs):
    df = sess.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    queries = df.where("vec_id < 2")
    k = 3
    exact = cosine_topk(df, queries, k=k).collect()
    ivf = ivf_topk(df, queries, k=k, n_cells=4, nprobe=4, iters=1).collect()

    def ranking(rows):
        return sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)

    assert ranking(ivf) == ranking(exact)
    sims_e = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    for r in ivf:
        e = sims_e[(r["query_id"], r["vec_id"])]
        if e is None or r["sim"] is None:  # zero-norm vectors: null cosine
            assert e is None and r["sim"] is None
        else:
            assert math.isclose(r["sim"], e, rel_tol=0, abs_tol=1e-9)
