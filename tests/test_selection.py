"""DSIR-style data selection (datapipe/selection.py): weight model,
score exactness, selection behavior."""

import math

from pyspark.sql import functions as F

from janus_spark.datapipe.selection import dsir_scores, dsir_topk, dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_target_tokens_score_higher(spark):
    # target speaks 'aa bb'; raw noise speaks 'zz yy' — target-like docs
    # must outrank noise-like docs
    rows = [(i, "aa bb aa bb", "en") for i in range(10)]
    rows += [(100 + i, "zz yy zz yy", "xx") for i in range(10)]
    rows += [(200, "aa bb", "xx"), (201, "zz yy", "xx")]
    docs = _docs(spark, rows)
    target = docs.where(F.col("lang") == "en")
    w = dsir_weights(target, docs, n_buckets=64)
    s = {r["doc_id"]: r["score"] for r in dsir_scores(docs, w, n_buckets=64).collect()}
    assert s[200] > s[201]  # target-like beats noise-like
    top = [r["doc_id"] for r in dsir_topk(docs, w, 11, n_buckets=64).collect()]
    assert 200 in top and 201 not in top


def test_score_matches_hand_computation(spark):
    # one doc, one token, no hash collisions at 1<<20 buckets:
    # w = ln((2)/(nt+B)) - ln((2)/(nr+B)) for the shared token
    docs = _docs(spark, [(1, "tok", "en"), (2, "tok", "xx")])
    target = docs.where(F.col("lang") == "en")
    B = 1 << 20
    w = dsir_weights(target, docs, n_buckets=B)
    [row] = dsir_scores(docs.where("doc_id = 2"), w, n_buckets=B).collect()
    want = round((math.log(2 / (1 + B)) - math.log(3 / (2 + B))) * 1_000_000)
    assert row["score_int"] == want and row["n_tok"] == 1
    assert abs(row["score"] - want / 1_000_000) < 1e-12


def test_tokenless_doc_keeps_null_score_and_is_never_selected(spark):
    docs = _docs(spark, [(1, "aa", "en"), (2, "   ", "xx")])
    target = docs.where(F.col("lang") == "en")
    w = dsir_weights(target, docs, n_buckets=64)
    rows = {r["doc_id"]: r for r in dsir_scores(docs, w, n_buckets=64).collect()}
    assert rows[2]["score"] is None and rows[2]["n_tok"] == 0
    top = [r["doc_id"] for r in dsir_topk(docs, w, 10, n_buckets=64).collect()]
    assert 2 not in top


def test_weight_table_bounded_by_buckets(spark):
    docs = _docs(spark, [(i, f"t{i} u{i} v{i}", "en") for i in range(50)])
    w = dsir_weights(docs, docs, n_buckets=8)
    assert w.count() <= 8
    # target == raw with equal totals: every ratio is ln(x)-ln(x) = 0
    assert all(r["w"] == 0 for r in w.collect())


def test_empty_target_raises_no_error_and_downweights_nothing(spark):
    # degenerate: empty target — every bucket weight is the same constant
    # shift ln((1)/(0+B)) - ln((cr+1)/(nr+B)); scores are still defined
    docs = _docs(spark, [(1, "aa bb", "xx"), (2, "aa", "xx")])
    target = docs.where(F.col("lang") == "en")  # empty
    w = dsir_weights(target, docs, n_buckets=64)
    out = dsir_scores(docs, w, n_buckets=64).collect()
    assert all(r["score"] is not None for r in out)


def test_weight_round_boundary_margin():
    """VERDICT r7 #4 (the sf10 score_int lesson): the DSIR and quality
    gates emit exact integers, but each per-bucket weight is still
    ROUND(double * 1e6) in BOTH engines.  That is cross-engine safe only
    while no bucket's unrounded weight lands at an exact .5 — Spark's
    HALF_UP on a Math.log result vs DuckDB's libm ln can differ by ~1 ulp
    (~1e-9 absolute after the 1e6 scaling).  Pin the margin: at every
    driver SF, for BOTH weight families, every bucket's fractional part
    must clear 0.5 by at least 1e-7 — two orders above the jitter, well
    below the observed minima (4.3e-3 across sf0.001..sf10, NOTES_r8).
    Pure DuckDB (the same CTEs as the gate oracles), no Spark session."""
    import os

    import duckdb

    toks = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
    # (numerator filter, denominator filter): DSIR contrasts the en slice
    # vs the WHOLE corpus; the quality classifier (datapipe/quality.py,
    # same ROUND discipline) contrasts en vs non-en.
    families = {
        "dsir": ("WHERE lang = 'en'", ""),
        "quality": ("WHERE lang = 'en'", "WHERE lang <> 'en'"),
    }
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
        for fam, (posf, denf) in families.items():
            [(margin, nbuckets)] = con.execute(f"""
                WITH toks AS (SELECT doc_id, unnest({toks}) AS t FROM documents),
                bt AS (SELECT doc_id,
                              ('0x' || substr(md5(t), 1, 15))::BIGINT % 4096 AS b
                       FROM toks),
                tgt AS (SELECT b FROM bt JOIN documents USING (doc_id) {posf}),
                den AS (SELECT b FROM bt JOIN documents USING (doc_id) {denf}),
                tcnt AS (SELECT b, COUNT(*) AS ct FROM tgt GROUP BY b),
                rcnt AS (SELECT b, COUNT(*) AS cr FROM den GROUP BY b),
                nt AS (SELECT COUNT(*) AS nt FROM tgt),
                nr AS (SELECT COUNT(*) AS nr FROM den),
                wraw AS (SELECT (ln((COALESCE(ct, 0) + 1)
                                    / ((SELECT nt FROM nt) + 4096.0))
                               - ln((COALESCE(cr, 0) + 1)
                                    / ((SELECT nr FROM nr) + 4096.0)))
                              * 1000000 AS wr
                         FROM tcnt FULL JOIN rcnt ON tcnt.b = rcnt.b)
                SELECT MIN(ABS(ABS(wr) - FLOOR(ABS(wr)) - 0.5)), COUNT(*)
                FROM wraw
            """).fetchall()
            assert nbuckets > 0, (sf, fam)
            assert margin > 1e-7, (
                f"{sf}/{fam}: a bucket weight sits {margin} from the .5 "
                f"ROUND boundary — inside cross-engine log-jitter range; "
                f"restructure the weight to exact-integer form (see the "
                f"q_dsir_scores docstring)"
            )
        con.close()


def test_flagged_scores_prebuilt_pairs_identical(spark):
    """The r11 curation fuse: dsir_flagged_scores fed a prebuilt
    (id, __f, b, cnt) frame — including one built over a SUPERSET corpus
    and semi-join-restricted to df's ids — must return bit-identical
    weights and scores to the self-built pass, in both modes."""
    from janus_spark.datapipe.selection import (
        _doc_bucket_pairs,
        dsir_flagged_scores,
    )

    rows = [(i, f"aa bb cc{i % 3} dd{i % 5} aa", "en" if i % 2 else "xx")
            for i in range(40)]
    rows += [(100, "", "en"), (101, None, "xx"), (102, "aa", None)]
    docs = _docs(spark, rows).localCheckpoint(eager=True)
    sub = docs.where("doc_id % 3 != 1").localCheckpoint(eager=True)
    flag = F.col("lang") == "en"
    super_pairs = _doc_bucket_pairs(
        docs, "text", "doc_id", 64, extra={"__f": flag}
    ).localCheckpoint(eager=True)
    for frame in (docs, sub):
        pre = super_pairs.join(frame.select("doc_id"), "doc_id", "semi")
        for mode in ("target", "split"):
            w0, s0 = dsir_flagged_scores(frame, flag, mode, n_buckets=64)
            w1, s1 = dsir_flagged_scores(
                frame, flag, mode, n_buckets=64, pairs=pre
            )
            assert w0.exceptAll(w1).count() == 0
            assert w1.exceptAll(w0).count() == 0
            assert s0.exceptAll(s1).count() == 0
            assert s1.exceptAll(s0).count() == 0
