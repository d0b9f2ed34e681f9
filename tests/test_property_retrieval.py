"""Property tests: BM25 against a pure-Python reference on random
corpora; RRF score algebra."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["ab", "cd", "ef", "gh", "ij", "kl"]


def _ref_bm25(corpus, qterms, k1=1.2, b=0.75):
    """(doc_id -> score) over set-semantics query terms."""
    toks = {i: t.split() for i, t in corpus}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(corpus)
    total = sum(dl.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in set(qterms):
            tf = ts.count(t)
            if tf == 0 or t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * (dl[i] * n) / total))
        if s > 0:
            out[i] = s
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=8), min_size=2, max_size=6
    ),
    q=st.lists(st.sampled_from(WORDS), min_size=1, max_size=4),
)
def test_bm25_matches_python_reference(spark, docs, q):
    from janus_spark.datapipe.retrieval import bm25_topk

    corpus = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    qdf = spark.createDataFrame([("q", " ".join(q))], ["query_id", "qtext"])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, qdf, k=100, round_score=None).collect()
    }
    want = _ref_bm25(corpus, q)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9
