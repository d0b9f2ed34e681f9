"""Tests for datapipe/retrieval.py (BM25, RRF) and the round-3 frontier/
sequence operators (skyline2d, markov_transitions, linreg_trend)."""

import math

import pytest
from pyspark.sql import functions as F

from janus_spark.datapipe.retrieval import bm25_topk, rrf_fuse
from janus_spark.operators.analytics import markov_transitions, skyline2d
from janus_spark.operators.timeseries import linreg_trend


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_matches_hand_computation(spark):
    docs = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
    )
    q = spark.createDataFrame([("q", "apple cherry")], ["query_id", "qtext"])
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, q, k=10, round_score=None).collect()
    }
    n, total = 3, 3 + 2 + 4
    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))
    def term(tf, dl, df):
        return idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl * n) / total))
    assert out[1] == pytest.approx(term(2, 3, 1), rel=1e-12)  # apple in doc1
    assert out[2] == pytest.approx(term(1, 2, 2), rel=1e-12)  # cherry in doc2
    assert out[3] == pytest.approx(term(3, 4, 2), rel=1e-12)  # cherry in doc3


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = _docs(spark, [(1, "apple"), (2, "pear")])
    q1 = spark.createDataFrame([("q", "apple")], ["query_id", "qtext"])
    q2 = spark.createDataFrame([("q", "apple apple apple")], ["query_id", "qtext"])
    s1 = bm25_topk(docs, q1, round_score=None).collect()[0]["score"]
    s2 = bm25_topk(docs, q2, round_score=None).collect()[0]["score"]
    assert s1 == s2


def test_rrf_missing_ranker_contributes_zero(spark):
    a = spark.createDataFrame([("q", 1, 1), ("q", 2, 2)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([("q", 1, 1), ("q", 3, 2)], ["query_id", "doc_id", "rank"])
    out = {r["doc_id"]: r["score"] for r in rrf_fuse(a, b, k=10, round_score=None).collect()}
    assert out[1] == pytest.approx(2 / 61)
    assert out[2] == pytest.approx(1 / 62)
    assert out[3] == pytest.approx(1 / 62)
    ranks = {r["doc_id"]: r["rank"] for r in rrf_fuse(a, b, k=10).collect()}
    assert ranks[1] == 1 and ranks[2] == 2 and ranks[3] == 3  # tie → id asc


def test_skyline2d_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(300)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {(r["x"], r["y"]) for r in skyline2d(df, "x", "y", n_grid=8).collect()}
    distinct = set(pts)
    expect = {
        (x, y)
        for x, y in distinct
        if not any(
            bx <= x and by <= y and (bx < x or by < y) for bx, by in distinct
        )
    }
    assert got == expect


def test_skyline2d_constant_x_and_duplicates(spark):
    df = spark.createDataFrame([(5, 3), (5, 3), (5, 9)], ["x", "y"])
    assert {(r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect()} == {(5, 3)}


def test_markov_rows_sum_to_one(spark):
    ev = spark.createDataFrame(
        [(1, i, t, i * 10) for i, t in enumerate("abacabab")]
        + [(2, i, t, i * 10) for i, t in enumerate("bcbc")],
        ["user_id", "event_id", "event_type", "ts_ms"],
    )
    out = markov_transitions(ev, order_cols=["ts_ms", "event_id"], round_p=None)
    sums = out.groupBy("state").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert r["s"] == pytest.approx(1.0)
    m = {(r["state"], r["next_state"]): r["n_pairs"] for r in out.collect()}
    # user1 pairs: ab,ba,ac,ca,ab,ba,ab ; user2: bc,cb,bc
    assert m[("a", "b")] == 3 and m[("b", "a")] == 2 and m[("a", "c")] == 1
    assert m[("b", "c")] == 2 and m[("c", "b")] == 1 and m[("c", "a")] == 1


def test_linreg_trend_matches_closed_form(spark):
    rows = [("k", x, 2.5 * x + 7 + (0.25 if x % 2 else -0.25)) for x in range(20)]
    df = spark.createDataFrame(rows, ["k", "ts_ms", "value"])
    out = linreg_trend(df, ["k"]).collect()[0]
    import numpy as np

    xs = np.array([r[1] for r in rows], dtype=float)
    ys = np.array([r[2] for r in rows], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert out["slope"] == pytest.approx(slope, abs=1e-6)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert 0.99 < out["r2"] <= 1.0
    assert out["n"] == 20


def test_linreg_trend_degenerate_and_nulls(spark):
    df = spark.createDataFrame(
        [("one", 5, 1.0), ("zerovar", 3, 1.0), ("zerovar", 3, 2.0),
         ("nulls", 1, 4.0), ("nulls", 2, None), ("nulls", 3, 8.0)],
        ["k", "ts_ms", "value"],
    )
    out = {r["k"]: r for r in linreg_trend(df, ["k"]).collect()}
    assert out["one"]["slope"] is None and out["one"]["n"] == 1
    assert out["zerovar"]["slope"] is None
    assert out["nulls"]["n"] == 2 and out["nulls"]["slope"] == pytest.approx(2.0)


def test_cross_corr_exact_signs(spark):
    from janus_spark.operators.timeseries import cross_corr

    rows = []
    for b in range(12):
        rows.append(("up", b * 1000, float(b)))        # increasing
        rows.append(("up2", b * 1000, float(2 * b)))   # same direction
        rows.append(("down", b * 1000, float(24 - b))) # opposite
        rows.append(("flat", b * 1000, 3.0))           # zero variance
    df = spark.createDataFrame(rows, ["event_type", "ts_ms", "value"])
    out = {(r["key_a"], r["key_b"]): r for r in cross_corr(df, bucket_ms=1000).collect()}
    assert out[("up", "up2")]["corr"] == pytest.approx(1.0)
    assert out[("down", "up")]["corr"] == pytest.approx(-1.0)
    assert out[("flat", "up")]["corr"] is None  # zero-variance side
    assert out[("up", "up2")]["n_buckets"] == 12


def test_cross_corr_inner_alignment(spark):
    from janus_spark.operators.timeseries import cross_corr

    rows = [("a", b * 1000, float(b)) for b in range(10)] + [
        ("b", b * 1000, float(b)) for b in range(5, 15)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms", "value"])
    out = cross_corr(df, bucket_ms=1000).collect()[0]
    assert out["n_buckets"] == 5  # only the overlapping buckets
    assert out["corr"] == pytest.approx(1.0)


def test_skyline_ddim_matches_bruteforce(spark):
    import random

    from janus_spark.operators.analytics import skyline

    rng = random.Random(11)
    pts = [(rng.randint(0, 20), rng.randint(0, 20), rng.randint(0, 20)) for _ in range(250)]
    df = spark.createDataFrame(pts, ["x", "y", "z"])
    got = {(r["x"], r["y"], r["z"]) for r in skyline(df, ["x", "y", "z"]).collect()}
    distinct = set(pts)
    expect = {
        p
        for p in distinct
        if not any(
            all(qc <= pc for qc, pc in zip(q, p)) and q != p for q in distinct
        )
    }
    assert got == expect


def test_skyline_max_frontier_guard(spark):
    import pytest

    from janus_spark.operators.analytics import skyline

    # anti-diagonal: every point is on the frontier, nothing prunes
    df = spark.createDataFrame([(i, 100 - i) for i in range(101)], ["x", "y"])
    with pytest.raises(ValueError):
        skyline(df, ["x", "y"], max_frontier=10)


def _mini_corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a quick brown dog barks at the fox"),
        (2, "lorem ipsum dolor sit amet"),
        (3, "the fox and the hound are friends"),
        (4, "dogs and foxes and wolves"),
        (5, ""),
        (6, "quick quick quick brown"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _probe(spark):
    return spark.createDataFrame(
        [("qa", "quick fox"), ("qb", "lazy dog")], ["query_id", "qtext"]
    )


def test_incremental_bm25_equals_full_rebuild(spark, tmp_path):
    from janus_spark.datapipe.retrieval import IncrementalBM25Index

    docs = _mini_corpus(spark)
    idx = IncrementalBM25Index(spark, str(tmp_path / "idx"))
    idx.update(docs.where("doc_id < 3"))
    idx.update(docs.where("doc_id >= 3"))
    got = sorted(
        tuple(r) for r in idx.query(_probe(spark), k=5).collect()
    )
    want = sorted(tuple(r) for r in bm25_topk(docs, _probe(spark), k=5).collect())
    assert got == want and len(got) > 0


def test_incremental_bm25_skip_existing_is_idempotent(spark, tmp_path):
    from janus_spark.datapipe.retrieval import IncrementalBM25Index

    docs = _mini_corpus(spark)
    idx = IncrementalBM25Index(spark, str(tmp_path / "idx"))
    idx.update(docs.where("doc_id < 4"))
    idx.update(docs.where("doc_id >= 2"), skip_existing=True)  # overlap 2,3
    idx.update(docs.where("doc_id >= 2"), skip_existing=True)  # full replay
    got = sorted(tuple(r) for r in idx.query(_probe(spark), k=5).collect())
    want = sorted(tuple(r) for r in bm25_topk(docs, _probe(spark), k=5).collect())
    assert got == want
    # stats were not double-counted
    st = spark.read.parquet(f"{idx._vdir(idx.current_version())}/stats").collect()[0]
    assert st["n_docs"] == 7


def test_incremental_bm25_crash_safety(spark, tmp_path):
    import os

    from janus_spark.datapipe.retrieval import IncrementalBM25Index

    docs = _mini_corpus(spark)
    path = str(tmp_path / "idx")
    idx = IncrementalBM25Index(spark, path)
    idx.update(docs.where("doc_id < 3"))
    assert idx.current_version() == 1
    # simulate a crash mid-update: staging dir with only one leg written
    os.makedirs(f"{path}/.staging-v=2/postings", exist_ok=True)
    assert idx.current_version() == 1  # invisible
    v2 = idx.update(docs.where("doc_id >= 3"))
    assert v2 == 2 and idx.current_version() == 2
    got = sorted(tuple(r) for r in idx.query(_probe(spark), k=5).collect())
    want = sorted(tuple(r) for r in bm25_topk(docs, _probe(spark), k=5).collect())
    assert got == want
    # vacuum clears old versions and stray staging dirs
    os.makedirs(f"{path}/.staging-v=9", exist_ok=True)
    assert idx.vacuum_versions(keep=1) == 1
    assert not os.path.isdir(f"{path}/.staging-v=9")
    with pytest.raises(Exception):
        idx.query(_probe(spark), version=1).collect()


def test_incremental_bm25_query_empty_raises(spark, tmp_path):
    from janus_spark.datapipe.retrieval import IncrementalBM25Index

    idx = IncrementalBM25Index(spark, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="no committed version"):
        idx.query(_probe(spark))
