"""target_encode / diff_in_diff / grid_radius_join hand-checks."""

import pytest
from pyspark.sql import functions as F

from janus_spark.datapipe.features import target_encode
from janus_spark.operators.analytics import diff_in_diff
from janus_spark.operators.spatial import grid_radius_join


def test_target_encode_loo_hand_check(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0), (5, "b", None)],
        "id long, cat string, value double",
    )
    out = {r["id"]: r["loo_mean"] for r in target_encode(df, ["cat"], "value").collect()}
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    # 'b' has ONE non-null row: LOO denominator 0 -> null; null target -> null
    assert out[4] is None and out[5] is None


def test_target_encode_smoothed_shrinks_to_global(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 40.0), (4, "b", 50.0)],
        "id long, cat string, value double",
    )
    # exact integer rational in cents: row1 ->
    # ((s-y)*gn + m*gs) / ((n-1+m)*gn) / 100 = (2000*4 + 2*12000)/(3*4)/100
    out = {r["id"]: r["loo_mean"] for r in
           target_encode(df, ["cat"], "value", smoothing=2).collect()}
    assert out[1] == (2000 * 4 + 2 * 12000) / (3 * 4) / 100  # same division tree
    # singleton-in-category is no longer null under smoothing
    one = spark.createDataFrame([(1, "a", 10.0), (2, "b", 30.0)],
                                "id long, cat string, value double")
    o = {r["id"]: r["loo_mean"] for r in
         target_encode(one, ["cat"], "value", smoothing=1).collect()}
    # row 1: ((0)*2 + 1*40) / ((0+1)*2) / ... -> 40/2 = 20 (the global mean)
    assert o[1] == 20.0 and o[2] == 20.0


def test_target_encode_rejects_negative_smoothing(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, cat string, value double")
    with pytest.raises(ValueError):
        target_encode(df, ["cat"], "value", smoothing=-1)


def test_diff_in_diff_hand_check(spark):
    rows = [
        # control: pre mean 10, post mean 12  (drift +2)
        (False, False, 9.0), (False, False, 11.0),
        (False, True, 11.0), (False, True, 13.0),
        # treated: pre mean 20, post mean 27  (drift +7 -> DiD = +5)
        (True, False, 19.0), (True, False, 21.0),
        (True, True, 26.0), (True, True, 28.0),
    ]
    df = spark.createDataFrame(rows, "treat boolean, post boolean, value double")
    r = diff_in_diff(df, "treat", "post").collect()[0]
    assert (r["n_tp"], r["n_tq"], r["n_cp"], r["n_cq"]) == (2, 2, 2, 2)
    assert r["mean_treat_post"] == 27.0 and r["mean_control_pre"] == 10.0
    assert r["did"] == 5.0


def test_diff_in_diff_requires_all_cells(spark):
    df = spark.createDataFrame(
        [(True, True, 1.0), (True, False, 1.0), (False, True, 1.0)],
        "treat boolean, post boolean, value double",
    )
    # lazy contract: constructing the plan is free; the empty-cell
    # check fires in-plan at execution time
    out = diff_in_diff(df, "treat", "post")
    with pytest.raises(Exception, match="non-empty"):
        out.collect()
    # and it survives column pruning — selecting only `did` still raises
    with pytest.raises(Exception, match="non-empty"):
        out.select("did").collect()


def test_grid_radius_join_boundary_and_completeness(spark):
    # points on a line; radius 10 — the pair at EXACTLY distance 10 is
    # included (<=), 11 is not; the 3x3 neighborhood spans cell borders
    pts = spark.createDataFrame(
        [(1, 100, 100), (2, 110, 100), (3, 111, 100), (4, 95, 100), (5, 3000, 3000)],
        "id long, x long, y long",
    )
    qs = pts.where(F.col("id") == 1)
    got = {(r["q_id"], r["p_id"]): r["dist2"]
           for r in grid_radius_join(pts, qs, radius=10).collect()}
    assert got == {(1, 2): 100, (1, 4): 25}
    # brute-force parity on a denser fixture (completeness of the grid)
    import itertools
    coords = [(i, (i * 37) % 50, (i * 91) % 50) for i in range(40)]
    pdf = spark.createDataFrame(coords, "id long, x long, y long")
    out = {(r["q_id"], r["p_id"]) for r in grid_radius_join(pdf, pdf, radius=7).collect()}
    want = {
        (a, b)
        for (a, xa, ya), (b, xb, yb) in itertools.permutations(coords, 2)
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= 49
    }
    assert out == want


def test_grid_radius_join_cell_scale_parity(spark):
    # finer grids (cell_scale>1) must return exactly the same pairs as
    # the base 3x3 plan — including radii that don't divide evenly (the
    # ceil'd cell size keeps k*cell >= radius, so the (2k+1)^2
    # neighborhood stays complete)
    import itertools

    coords = [(i, (i * 37) % 60, (i * 91) % 60) for i in range(50)]
    pdf = spark.createDataFrame(coords, "id long, x long, y long")
    for radius in (7, 10):
        want = {
            (a, b)
            for (a, xa, ya), (b, xb, yb) in itertools.permutations(coords, 2)
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius
        }
        for k in (2, 3):
            out = {
                (r["q_id"], r["p_id"])
                for r in grid_radius_join(pdf, pdf, radius=radius, cell_scale=k).collect()
            }
            assert out == want, (radius, k)
    import pytest

    with pytest.raises(ValueError):
        grid_radius_join(pdf, pdf, radius=10, cell_scale=0)


def test_grid_radius_join_rejects_bad_inputs(spark):
    pts = spark.createDataFrame([(1, -5, 3)], "id long, x long, y long")
    with pytest.raises(ValueError):
        grid_radius_join(pts, pts, radius=0)
    with pytest.raises(Exception):  # negative coordinate raises at execution
        grid_radius_join(pts, pts, radius=10).collect()


def test_feature_hash_matches_python_reference(spark):
    import hashlib

    from janus_spark.datapipe.features import feature_hash

    docs = [(1, "red fox red Fox"), (2, "  lazy   dog "), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_id"], r["idx"]): r["val"]
           for r in feature_hash(df, n_features=64).collect()}

    def h(s, seed=None):
        x = (f"{seed}:{s}" if seed is not None else s).encode()
        return int(hashlib.md5(x).hexdigest()[:15], 16)

    want = {}
    for did, text in docs:
        for tok in [t for t in text.strip().lower().split() if t]:
            key = (did, h(tok) % 64)
            want[key] = want.get(key, 0) + (1 if h(tok, 1) % 2 == 0 else -1)
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_qhist_quantiles_and_parquet_merge(spark, tmp_path):
    from janus_spark.functions.sketches import qhist_partials, qhist_quantile

    rows = [(1, float(v)) for v in range(1, 101)] + [(2, -3.25), (2, -1.75), (2, 4.5)]
    df = spark.createDataFrame(rows, "k int, value double")
    parts = qhist_partials(df, "value", ["k"], width_cents=100)
    q = {r["k"]: r for r in qhist_quantile(parts, ["k"], 1, 2, 100).collect()}
    # k=1: rank ceil(100/2)=50 -> value 50 is in bin 50 (lower edge 50.0)
    assert q[1]["n"] == 100 and q[1]["q_value"] == 50.0
    # k=2: rank 2 of {-3.25, -1.75, 4.5}; bins floor: -4, -2, 4 -> median bin -2
    assert q[2]["q_value"] == -2.0
    p95 = {r["k"]: r["q_value"] for r in qhist_quantile(parts, ["k"], 19, 20, 100).collect()}
    assert p95[1] == 95.0
    # mergeability: two half-partials written to parquet, re-read, summed
    h1 = qhist_partials(df.where(F.col("value") <= 40), "value", ["k"], 100)
    h2 = qhist_partials(df.where(F.col("value") > 40), "value", ["k"], 100)
    p = str(tmp_path / "qh")
    h1.unionByName(h2).write.parquet(p)
    merged = (
        spark.read.parquet(p).groupBy("k", "bin").agg(F.sum("cnt").alias("cnt"))
    )
    q2 = {r["k"]: r["q_value"] for r in qhist_quantile(merged, ["k"], 1, 2, 100).collect()}
    assert q2 == {k: r["q_value"] for k, r in q.items()}


def test_qhist_rejects_bad_fraction(spark):
    from janus_spark.functions.sketches import qhist_partials, qhist_quantile

    df = spark.createDataFrame([(1, 1.0)], "k int, value double")
    parts = qhist_partials(df, "value", ["k"])
    with pytest.raises(ValueError):
        qhist_quantile(parts, ["k"], 0, 2)
    with pytest.raises(ValueError):
        qhist_partials(df, "value", ["k"], width_cents=0)


def test_drift_chi2_matches_float_reference(spark):
    from janus_spark.datapipe.features import drift_chi2

    ref = spark.createDataFrame([(float(v % 7),) for v in range(200)], "value double")
    cur = spark.createDataFrame([(float(v % 5),) for v in range(150)], "value double")
    r = drift_chi2(ref, cur, "value", width_cents=100).collect()[0]
    assert (r["n_ref"], r["n_cur"], r["n_bins"]) == (200, 150, 7)
    # pure-Python pooled 2xk chi-square; the engine quantizes terms at 1e-6
    from collections import Counter
    ca = Counter(v % 7 for v in range(200))
    cb = Counter(v % 5 for v in range(150))
    want = 0.0
    for bin_ in sorted(set(ca) | set(cb)):
        a, b = ca.get(bin_, 0), cb.get(bin_, 0)
        want += (a * 150 - b * 200) ** 2 / ((a + b) * 200 * 150)
    assert r["chi2"] == pytest.approx(want, abs=1e-4)
    # identical distributions -> chi2 == 0 exactly
    z = drift_chi2(ref, ref, "value").collect()[0]
    assert z["chi2"] == 0.0


def test_drift_chi2_empty_side_raises_not_div0(spark):
    """An empty reference or current batch must fail with a diagnosable
    message, not a raw DIVIDE_BY_ZERO (or a silent null chi2 under
    non-ANSI configs) — a drift tripwire must never mask a broken
    feed."""
    from janus_spark.datapipe.features import drift_chi2

    ref = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    empty = spark.createDataFrame([], "value double")
    with pytest.raises(Exception, match="empty reference or current"):
        drift_chi2(ref, empty, "value").collect()
    with pytest.raises(Exception, match="empty reference or current"):
        drift_chi2(empty, ref, "value").collect()
    # all-null current side behaves like empty
    nulls = spark.createDataFrame([(None,)], "value double")
    with pytest.raises(Exception, match="empty reference or current"):
        drift_chi2(ref, nulls, "value").collect()


def test_profile_table_hostile_column_names(spark):
    """Column names are data: spaces, quotes, and backticks must profile
    rather than break (or inject into) the stack() expression."""
    from janus_spark.datapipe.validate import profile_table

    df = spark.range(3).selectExpr(
        "id AS `a b`", "CAST(id AS STRING) AS `x'y`", "id * 2 AS `z``w`"
    )
    rows = {r["column"]: r for r in profile_table(df, numeric_cols=["a b"]).collect()}
    assert set(rows) == {"a b", "x'y", "z`w"}
    assert rows["a b"]["n"] == 3 and rows["a b"]["min_v"] == 0.0
    assert rows["x'y"]["n_distinct"] == 3 and rows["x'y"]["min_v"] is None


def test_drift_chi2_from_binned_matches_two_sample_form(spark):
    """The binned finisher over a single group must equal drift_chi2 on
    the raw frames (same bins, same reference)."""
    from janus_spark.datapipe.features import drift_chi2, drift_chi2_from_binned

    ref = spark.createDataFrame([(float(v % 7),) for v in range(140)], "value double")
    cur = spark.createDataFrame([(float(v % 4),) for v in range(90)], "value double")
    want = drift_chi2(ref, cur, "value", width_cents=100).collect()[0]

    def hist(df):
        return (
            df.groupBy(F.floor(F.col("value")).cast("long").alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    got = drift_chi2_from_binned(
        hist(cur).withColumn("g", F.lit(1)), hist(ref), ["g"]
    ).collect()[0]
    assert (got["n_ref"], got["n_cur"], got["n_bins"]) == (
        want["n_ref"], want["n_cur"], want["n_bins"])
    assert got["chi2"] == want["chi2"]
