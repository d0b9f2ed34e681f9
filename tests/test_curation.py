"""The composed curation pipeline (gopher → quality → minhash-dedup →
DSIR top-k → pack): stage-interaction invariants and the shuffle-budget
plan pin.  Exact values are pinned cross-engine by the q_curation_full
oracle; these tests pin the composition properties the oracle can't
see."""

import re

import pytest
from pyspark.sql import functions as F

from janus_spark.datapipe.curation import curation_pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline_out(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curation_pipeline(docs, k_top=100, budget_tokens=512, n_shards=4)
    return docs, out.localCheckpoint(eager=True)


def test_pipeline_output_is_survivor_subset(spark, pipeline_out):
    """Every packed doc passed EVERY stage: gopher pred, the corpus-
    relative quality predicate evaluated over the gopher survivors, and
    near-dup removal (never the higher id of a qualifying pair)."""
    from janus_spark.datapipe.dedup import minhash_lsh_pairs
    from janus_spark.datapipe.quality import (
        gopher_quality,
        nb_quality_weights,
        quality_filter_relative,
    )

    docs, out = pipeline_out
    ids = {r["id"] for r in out.select("id").collect()}
    assert len(ids) == 100  # k_top met at this SF

    gq = gopher_quality(docs, min_tok=20, top2_max=(1, 10), min_stopwords=1)
    gopher_keep = {r["doc_id"] for r in gq.where("pred").select("doc_id").collect()}
    assert ids <= gopher_keep

    s1 = docs.join(
        gq.where("pred").select("doc_id"), "doc_id", "semi"
    ).localCheckpoint(eager=True)
    w = nb_quality_weights(
        s1.where("lang = 'en'"), s1.where("lang <> 'en'")
    )
    q_keep = {
        r["doc_id"]
        for r in quality_filter_relative(s1, w).select("doc_id").collect()
    }
    assert ids <= q_keep

    s2 = s1.join(
        spark.createDataFrame([(i,) for i in q_keep], "doc_id long"),
        "doc_id",
        "semi",
    ).localCheckpoint(eager=True)
    dup_b = {
        r["b"]
        for r in minhash_lsh_pairs(
            s2, jaccard_threshold=0.5, hash_fn="md5"
        ).select("b").collect()
    }
    assert not (ids & dup_b)


def test_pipeline_packing_is_contiguous(pipeline_out):
    """Within each shard the selected docs tile the token stream:
    offsets sorted by start are gap-free and end-exclusive."""
    _, out = pipeline_out
    by_shard = {}
    for r in out.collect():
        by_shard.setdefault(r["shard"], []).append(
            (r["start_offset"], r["end_offset"], r["n_tokens"])
        )
    for shard, rows in by_shard.items():
        rows.sort()
        pos = 0
        for start, end, n in rows:
            assert start == pos and end == start + n
            pos = end


def test_curation_pipeline_shuffle_budget(spark, pipeline_out):
    """The final plan segment (everything after the dedup-stage cut:
    DSIR weight training [2 token-bucket groupBys + 2 scalar totals],
    scoring groupBy + doc join-back, the top-k sort, the selection semi
    join, and the pack shard window) must stay within its stage budget
    of 8 shuffle exchanges — a regression (lost broadcast, re-scored
    subtree) shows up as exchange #9."""
    docs, _ = pipeline_out
    out = curation_pipeline(docs, k_top=100, budget_tokens=512, n_shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    shuffles = len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )
    assert shuffles <= 8, f"final segment shuffles grew: {shuffles}\n{plan}"
    # weight tables and scalar totals must ride broadcasts, not shuffles
    assert "BroadcastExchange" in plan


def test_funnel_matches_pipeline_stages(spark, pipeline_out):
    """The funnel's counts must equal what the pipeline's own output
    implies: monotone non-increasing, selected == packed row count, and
    raw == the input corpus."""
    from janus_spark.datapipe.curation import curation_funnel

    docs, out = pipeline_out
    rows = curation_funnel(docs, k_top=100).collect()
    # collected order IS stage_no order — the docstring promises it
    # (ADVICE r9: a bare union's order is partition-dependent)
    assert [r["stage_no"] for r in rows] == [0, 1, 2, 3, 4]
    funnel = {r["stage"]: r["n_docs"] for r in rows}
    assert funnel["raw"] == docs.count()
    assert funnel["selected"] == out.count() == 100
    order = ["raw", "gopher", "quality", "dedup", "selected"]
    vals = [funnel[s] for s in order]
    assert vals == sorted(vals, reverse=True)


# ------------------------------------------------- incremental curation
@pytest.fixture(scope="module")
def inc_setup(spark, tmp_path_factory):
    """Bootstrap on doc_id < 250, one increment for the rest — shared by
    the equivalence, batch-parity and replay tests."""
    from janus_spark.datapipe.curation import (
        curation_bootstrap,
        curation_increment,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(
        eager=True
    )
    boot = docs.where("doc_id < 250")
    arr = docs.where("doc_id >= 250")
    store = str(tmp_path_factory.mktemp("cur_inc") / "store")
    surv0, model = curation_bootstrap(boot, store)
    surv0 = surv0.localCheckpoint(eager=True)
    surv1 = curation_increment(arr, store, model).localCheckpoint(eager=True)
    return docs, boot, arr, store, model, surv0, surv1


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_bootstrap_plus_increment_equals_frozen_batch(spark, inc_setup):
    """The incrementality theorem: bootstrap survivors ∪ increment
    survivors == one-shot frozen-batch application over the full corpus
    (id-monotone split, frozen model, store keeps dropped signatures).
    The q_curation_increment gate pins the same identity cross-engine
    against the batch SQL oracle."""
    from janus_spark.datapipe.curation import curation_frozen_batch

    docs, _, _, _, model, surv0, surv1 = inc_setup
    i0, i1 = _ids(surv0), _ids(surv1)
    assert i0 and i1, "split must exercise both paths"
    assert not (i0 & i1)
    assert i0 | i1 == _ids(curation_frozen_batch(docs, model))


def test_bootstrap_equals_batch_stages(spark, inc_setup):
    """Bootstrap == the batch pipeline's dedup-stage survivors on the
    founding corpus: the frozen totals are the corpus's own, so the
    frozen comparison IS quality_filter_relative's cross-multiplied
    decision."""
    from janus_spark.datapipe.curation import _curation_stages

    _, boot, _, _, _, surv0, _ = inc_setup
    s3 = _curation_stages(
        boot, 100, 0.5, 4096, "text", "doc_id", "lang", None
    )[2]
    assert _ids(surv0) == _ids(s3)


def test_increment_replay_detection(spark, inc_setup):
    """Retrying an already-applied batch must return nothing and leave
    the store untouched (the incremental_entity_resolution discipline:
    a crashed-after-append run can always be retried)."""
    from janus_spark.datapipe.curation import curation_increment

    _, _, arr, store, model, _, _ = inc_setup
    n_store = spark.read.parquet(store).count()
    replay = curation_increment(arr, store, model)
    assert replay.count() == 0
    assert spark.read.parquet(store).count() == n_store


def test_curation_sink_step_retry_idempotent(spark, tmp_path):
    """The at-least-once contract of the streaming sink: retrying a
    committed batch id recomputes byte-identical survivors against the
    unchanged store prefix, overwrites its own partition, and does not
    grow the store; a later batch still sees the full history."""
    from janus_spark.datapipe.curation import (
        _curation_sink_step,
        train_curation_model,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(
        eager=True
    )
    model = train_curation_model(docs.where("doc_id < 250"))
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    b0 = docs.where("doc_id < 250")
    b1 = docs.where("doc_id >= 250")

    _curation_sink_step(b0, 0, store, model, out)
    n_store = spark.read.parquet(store).count()
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # retry the SAME batch id — store must not grow, publish unchanged
    _curation_sink_step(b0, 0, store, model, out)
    assert spark.read.parquet(store).count() == n_store
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    ) == first
    # a genuinely new batch appends and dedups against batch 0's history
    _curation_sink_step(b1, 1, store, model, out)
    assert spark.read.parquet(store).count() > n_store
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert set(first) < set(got)


def test_curation_sink_equals_increments(spark, tmp_path, inc_setup):
    """Two sink steps over the id-split corpus == bootstrap + increment
    (the streaming sink is curation_increment per batch, so the
    incrementality theorem carries over); survivors re-read from the
    partitioned publish."""
    from janus_spark.datapipe.curation import _curation_sink_step

    docs, boot, arr, _, model, surv0, surv1 = inc_setup
    store = str(tmp_path / "store2")
    out = str(tmp_path / "out2")
    _curation_sink_step(boot, 0, store, model, out)
    _curation_sink_step(arr, 1, store, model, out)
    got = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert got == _ids(surv0) | _ids(surv1)


def test_incremental_minhash_legacy_store_warns(spark, tmp_path):
    """A batch-marked call against a store written without markers must
    say loudly that replay detection is impossible (RuntimeWarning),
    not silently take the non-idempotent path."""
    import warnings

    from janus_spark.datapipe.dedup import incremental_minhash_dedup

    store = str(tmp_path / "legacy_store")
    d1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    incremental_minhash_dedup(d1, store, hash_fn="md5").count()  # unmarked
    d2 = spark.createDataFrame(
        [(2, "zeta eta theta iota kappa")], "doc_id long, text string"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        incremental_minhash_dedup(d2, store, hash_fn="md5", batch_id=7).count()
    msgs = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert any("batch-marker" in str(w.message) for w in msgs)


def test_select_model_increment_equals_frozen_batch(spark, tmp_path):
    """The frozen-DSIR selection stage preserves the incrementality
    theorem: selection is per-document and applied AFTER the store
    append, so bootstrap ∪ increment == frozen batch still holds, and
    the selected set is a subset of the no-selection survivors."""
    from janus_spark.datapipe.curation import (
        _curation_sink_step,
        curation_bootstrap,
        curation_frozen_batch,
        curation_increment,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(
        eager=True
    )
    boot = docs.where("doc_id < 250")
    arr = docs.where("doc_id >= 250")
    store = str(tmp_path / "store_sel")
    surv0, model = curation_bootstrap(boot, store, select=True)
    assert "dsir_weights" in model
    surv1 = curation_increment(arr, store, model)
    got = _ids(surv0) | _ids(surv1)
    assert got == _ids(curation_frozen_batch(docs, model))
    # selection only ever removes: the plain (no-select) run is a superset
    store2 = str(tmp_path / "store_plain")
    p_surv0, p_model = curation_bootstrap(boot, store2)
    unselected = _ids(p_surv0) | _ids(curation_increment(arr, store2, p_model))
    assert got < unselected
    # the streaming sink applies the same selection
    store3 = str(tmp_path / "store_sink")
    out3 = str(tmp_path / "out_sink")
    _curation_sink_step(boot, 0, store3, model, out3)
    _curation_sink_step(arr, 1, store3, model, out3)
    sink_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out3).select("doc_id").collect()
    }
    assert sink_ids == got
