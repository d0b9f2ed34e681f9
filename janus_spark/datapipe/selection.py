"""Data selection via importance resampling (DSIR-style).

Given a small TARGET corpus (the distribution you want more of — e.g.
high-quality or in-domain text) and the RAW corpus to filter, score each
raw document by the log-likelihood ratio of its hashed token features
under bag-of-words models of target vs raw, then keep the top-scoring
documents.  This is the hashed-n-gram importance-resampling recipe of
Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", DSIR — public knowledge); the repo's variant uses hashed
unigram features and a deterministic top-k selection so the result is
oracle-checkable bit-for-bit.

Exactness discipline (same as the tfidf-match family): per-bucket
log-ratio weights are integer-scaled BIGINTs computed from exact integer
counts, per-document scores are BIGINT sums (order-free across any
partitioning), and floats re-enter only at the final per-document
normalization — one division.

Scale shape (100 TB):
- Feature hashing is map-only Column work (`shared_hash64 % n_buckets`
  — the md5-derived cross-engine family); no vocabulary state, bounded
  model size (n_buckets rows) regardless of corpus size.
- Two aggregations build the models: one over the target (small by
  assumption), one over the raw corpus — each ONE groupBy shuffle on
  the bucket key.
- The weight table is n_buckets rows → broadcast join onto the exploded
  tokens; scoring is then map-side + ONE groupBy on doc_id.
- Selection is top-k (`WindowGroupLimit`-free: global top-k via
  orderBy+limit, which Spark executes as per-partition top-k + driver
  merge of k rows).

Reference: the reference engine has no data-selection operator; this is
part of the training-data-pipeline surface beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from janus_spark.datapipe.dedup import shared_hash64
from janus_spark.datapipe.text import clean_tokens

__all__ = ["dsir_weights", "dsir_scores", "dsir_topk"]


def _bucketed_tokens(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    tok = df.select(
        F.col(id_col), F.explode(clean_tokens(F.col(text_col))).alias("__t")
    )
    return tok.select(
        F.col(id_col), (shared_hash64(F.col("__t")) % n_buckets).alias("b")
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-bucket importance weight: ``round((ln p_target(b) −
    ln p_raw(b)) × scale)`` as BIGINT, with add-one smoothing over the
    ``n_buckets``-bucket hashed-unigram models (so unseen buckets are
    defined on both sides).  Buckets never seen in EITHER corpus are
    omitted — their smoothed ratio is ln((1/(Nt+B))/(1/(Nr+B))), a
    constant that cannot affect any real document's score because no
    token hashes there.  Returns ``(b, w)``, at most ``n_buckets`` rows
    — broadcastable by construction."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    tcnt = (
        _bucketed_tokens(target, text_col, id_col, n_buckets)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    rcnt = (
        _bucketed_tokens(raw, text_col, id_col, n_buckets)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    joined = tcnt.join(rcnt, "b", "full").select(
        "b",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    # scalar totals via window-free cross join of two 1-row aggregates
    tot = (
        tcnt.agg(F.sum("ct").alias("nt"))
        .crossJoin(rcnt.agg(F.sum("cr").alias("nr")))
        .select(
            F.coalesce(F.col("nt"), F.lit(0)).alias("nt"),
            F.coalesce(F.col("nr"), F.lit(0)).alias("nr"),
        )
    )
    b = float(n_buckets)
    return joined.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + 1).cast("double") / (F.col("nt").cast("double") + b))
                - F.log((F.col("cr") + 1).cast("double") / (F.col("nr").cast("double") + b))
            )
            * scale
        )
        .cast("long")
        .alias("w"),
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document importance score over ``raw``: ``score_int`` =
    Σ w(bucket(token)) (exact BIGINT, order-free), ``n_tok`` = token
    count, ``score`` = score_int / (scale × n_tok) — the mean per-token
    log-likelihood ratio, the one float.  Documents with no tokens keep
    a NULL score (no evidence).  One explode + one broadcast join + one
    groupBy; documents join back by id so every input row returns."""
    bt = _bucketed_tokens(raw, text_col, id_col, n_buckets)
    per_doc = (
        bt.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.sum("w").alias("score_int"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("score_int"), F.lit(0)).cast("long").alias("score_int"),
            F.coalesce(F.col("n_tok"), F.lit(0)).cast("long").alias("n_tok"),
            F.when(
                F.col("n_tok") > 0,
                F.col("score_int").cast("double")
                / (F.lit(float(scale)) * F.col("n_tok").cast("double")),
            ).alias("score"),
        )
    )


def dsir_topk(
    raw: DataFrame,
    weights: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic selection: the ``k`` documents with the highest
    mean per-token log-likelihood ratio, ties broken by id (ascending)
    so the selected set is unique — the oracle-checkable stand-in for
    DSIR's Gumbel-noise sampling (the scores are identical; only the
    final draw is derandomized).  Tokenless documents (NULL score) are
    never selected."""
    scores = dsir_scores(raw, weights, text_col, id_col, n_buckets, scale)
    return (
        scores.where(F.col("score").isNotNull())
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
