"""End-to-end training-data curation: the composed pipeline a real user
runs over a raw document corpus —

    Gopher rules → corpus-relative quality filter → MinHash near-dup
    removal → DSIR top-k selection → token packing

— declared as ONE DataFrame composition so Catalyst sees the whole
program (filters push into every stage's scan; nothing materializes to
disk between stages).

Stage boundaries that feed MULTIPLE consumers (a survivor frame used to
train the next stage's weights AND be scored by them AND flow onward)
are cut with ``localCheckpoint`` — the same discipline as
``quality_filter_relative``'s internal cut: without it Catalyst
re-evaluates the entire upstream pipeline once per consumer (measured
3-4 scans per stage).  On a cluster these become ``persist(DISK_ONLY)``
or staged parquet (see docs/SCALE.md).

Every stage is the SAME operator its standalone gate verifies
(`gopher_quality`, `quality_filter_relative`, `minhash_lsh_pairs`,
`dsir_topk`, `pack_token_stream`) — the pipeline adds composition, not
re-implementation, and its oracle is composed from the same SQL
fragments the standalone oracles use (janus_spark/queries.py), so the
two can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curation_pipeline", "curation_funnel"]


def curation_pipeline(
    docs: DataFrame,
    k_top: int = 100,
    budget_tokens: int = 512,
    n_shards: int = 4,
    jaccard_threshold: float = 0.5,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns the packing layout of the
    final selected documents (one row per selected doc:
    ``(id, shard, n_tokens, start_offset, end_offset, seq_id,
    straddles)``).

    Semantics per stage (each operates on the previous stage's
    survivors — corpus-relative stages therefore self-calibrate on the
    progressively cleaner corpus):

    1. **Gopher rules** (Rae et al. 2021 A1): integer-rational heuristic
       keep/reject.
    2. **Quality filter**: NB log-odds weights trained on the survivors'
       ``lang == 'en'`` / ``lang != 'en'`` split; keep docs whose mean
       per-token log-odds beats the survivor-corpus mean (all-integer
       decision in decimal(38,0)).
    3. **Near-dup removal**: banded MinHash pairs (a < b, exact-Jaccard
       verified); any doc appearing as the HIGHER id of a qualifying
       pair is dropped — the deterministic pairwise keep-lowest rule
       (the CC-based ``dedup_clusters`` is the transitive alternative;
       pairwise is single-plan and oracle-exact).
    4. **DSIR top-k** toward the survivors' English slice, ties by id.
    5. **Packing**: deterministic hash shuffle into ``n_shards`` token
       streams, ``budget_tokens``-sized training sequences.

    Scale shape (100 TB): the corpus flows through exactly the
    standalone operators' plans — no stage adds a shuffle beyond what
    its gate already pays (pinned by
    ``test_curation_pipeline_shuffle_budget``); the only new work is
    one semi/anti join per stage boundary, each on the id key of an
    already-shrinking survivor set.
    """
    s4 = _curation_stages(
        docs,
        k_top,
        jaccard_threshold,
        n_buckets,
        text_col,
        id_col,
        lang_col,
        gopher_kwargs,
    )[-1]

    from janus_spark.datapipe.text import pack_token_stream

    # 5 — pack
    return pack_token_stream(s4, budget_tokens, n_shards, text_col, id_col)


def _curation_stages(
    docs: DataFrame,
    k_top: int,
    jaccard_threshold: float,
    n_buckets: int,
    text_col: str,
    id_col: str,
    lang_col: str,
    gopher_kwargs: dict | None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The survivor frames after each filtering stage: (gopher, quality,
    dedup, selected) — shared by :func:`curation_pipeline` and
    :func:`curation_funnel` so the two can never disagree on stage
    semantics."""
    from janus_spark.datapipe.dedup import minhash_lsh_pairs
    from janus_spark.datapipe.quality import (
        gopher_quality,
        nb_quality_weights,
        quality_filter_relative,
    )
    from janus_spark.datapipe.selection import dsir_topk, dsir_weights

    gk = dict(min_tok=20, top2_max=(1, 10), min_stopwords=1)
    gk.update(gopher_kwargs or {})

    # 1 — Gopher rules
    keep1 = (
        gopher_quality(docs, text_col, id_col, **gk)
        .where("pred")
        .select(id_col)
    )
    s1 = docs.join(keep1, id_col, "semi").localCheckpoint(eager=True)

    # 2 — corpus-relative quality filter (weights trained on s1 itself)
    w = nb_quality_weights(
        s1.where(F.col(lang_col) == "en"),
        s1.where(F.col(lang_col) != "en"),
        text_col,
        id_col,
        n_buckets,
    )
    keep2 = quality_filter_relative(
        s1, w, text_col, id_col, n_buckets
    ).select(id_col)
    s2 = s1.join(keep2, id_col, "semi").localCheckpoint(eager=True)

    # 3 — near-dup removal, pairwise keep-lowest-id
    pairs = minhash_lsh_pairs(
        s2,
        text_col,
        id_col,
        jaccard_threshold=jaccard_threshold,
        hash_fn="md5",
    )
    s3 = s2.join(
        pairs.select(F.col("b").alias(id_col)).distinct(), id_col, "anti"
    ).localCheckpoint(eager=True)

    # 4 — DSIR top-k toward the survivors' English slice
    dw = dsir_weights(
        s3.where(F.col(lang_col) == "en"), s3, text_col, id_col, n_buckets
    )
    keep4 = dsir_topk(s3, dw, k_top, text_col, id_col, n_buckets).select(
        id_col
    )
    s4 = s3.join(keep4, id_col, "semi")
    return s1, s2, s3, s4


def curation_funnel(
    docs: DataFrame,
    k_top: int = 100,
    jaccard_threshold: float = 0.5,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """The curation funnel — per-stage survivor counts, the first thing
    an operator looks at when a curation run misbehaves (one stage
    suddenly eating the corpus is THE classic pipeline failure).

    Returns one row per stage, ordered by ``stage_no``:
    ``(stage_no, stage, n_docs)`` for raw → gopher → quality → dedup →
    selected, all exact integers.  Built on the SAME stage frames as
    :func:`curation_pipeline` (shared ``_curation_stages``), so the
    report can never drift from what the pipeline actually does; the
    stage frames are already localCheckpoint-cut, so the five counts
    add five cheap aggregates, not five pipeline re-runs."""
    s1, s2, s3, s4 = _curation_stages(
        docs,
        k_top,
        jaccard_threshold,
        n_buckets,
        text_col,
        id_col,
        lang_col,
        gopher_kwargs,
    )
    parts = [
        (0, "raw", docs),
        (1, "gopher", s1),
        (2, "quality", s2),
        (3, "dedup", s3),
        (4, "selected", s4),
    ]
    out = None
    for no, name, frame in parts:
        row = frame.agg(
            F.lit(no).cast("long").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        out = row if out is None else out.unionByName(row)
    # a bare union's row order is plan/partition-dependent; the promised
    # stage_no ordering costs one sort of 5 rows
    return out.orderBy("stage_no")
