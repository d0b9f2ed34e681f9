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

from janus_spark.datapipe.dedup import shared_hash64_spark_sql
from janus_spark.datapipe.text import clean_tokens_sql as _clean_tokens_sql

__all__ = ["dsir_weights", "dsir_scores", "dsir_topk", "dsir_flagged_scores"]


def _bucketed_tokens(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    from janus_spark.datapipe.exprcache import cached_expr, qident

    tok = df.select(
        F.col(id_col),
        F.explode(cached_expr(_clean_tokens_sql(qident(text_col)))).alias("__t"),
    )
    return tok.select(
        F.col(id_col),
        cached_expr(
            f"{shared_hash64_spark_sql('__t')} % {int(n_buckets)}"
        ).alias("b"),
    )


def _bucket_array_sql(text_col: str, n_buckets: int) -> str:
    """SQL text of the per-document SORTED token-bucket array — the
    tokenize → hash → sort expression :func:`_doc_bucket_pairs` stages.
    Exposed so a caller that already materializes the corpus (e.g. the
    curation pipeline's gopher checkpoint) can carry this array through
    its own pass and derive the (b, cnt) pairs without a second corpus
    tokenize; the spelling is shared, so the hashes are the identical
    expression."""
    from janus_spark.datapipe.exprcache import qident

    return (
        f"array_sort(transform({_clean_tokens_sql(qident(text_col))}, "
        f"t -> {shared_hash64_spark_sql('t')} % {int(n_buckets)}))"
    )


def _doc_bucket_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra: dict | None = None,
) -> DataFrame:
    """Per-document ``(b, cnt)`` bucket-count pairs computed IN-ARRAY —
    one narrow pass (tokenize → hash → sort → run-length scan), no
    corpus-token shuffle: each doc's bucket ids are sorted in place and
    equal runs of the sorted array ARE the per-bucket occurrence counts
    (the ``_gram_run_stats`` discipline from gopher_quality).  Exploding
    the run-length pairs emits one row per DISTINCT bucket per doc —
    strictly fewer rows than the per-token explode, with identical
    multiset semantics: ``sum(cnt) group by b`` equals the token-level
    ``count(*) group by b`` bit-for-bit.

    ``extra``: ``{name: Column}`` of additional per-row values carried
    through (e.g. a language flag).  Output: ``(id_col, *extra, b,
    cnt)``; tokenless documents emit no rows (same as an explode of no
    tokens)."""
    from janus_spark.datapipe.text import exploded_run_lengths

    from janus_spark.datapipe.exprcache import cached_expr

    extra = dict(extra or {})
    staged = df.select(
        F.col(id_col),
        *[c.alias(nm) for nm, c in extra.items()],
        cached_expr(_bucket_array_sql(text_col, n_buckets)).alias("__bs"),
    )
    # __bs is a materialized projection column, so the run-length scan's
    # element accesses are O(1) attribute reads, not re-evaluations of
    # the tokenize+hash subtree (the word_shingles lesson).
    return exploded_run_lengths(staged, "__bs", keep=[id_col, *extra.keys()]).select(
        F.col(id_col),
        *extra.keys(),
        F.col("v").alias("b"),
        F.col("cnt").alias("cnt"),
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
    ).localCheckpoint(eager=True)  # ≤ n_buckets rows: cut so the scalar
    # totals below read THIS tiny frame instead of re-running both
    # corpus explodes (the r8 form recomputed tcnt AND rcnt a second
    # time for the totals — two extra corpus-scale passes)
    return _weights_from_counts(joined, n_buckets, scale)


def _weights_from_counts(
    joined: DataFrame, n_buckets: int, scale: int
) -> DataFrame:
    """The weight arithmetic of :func:`dsir_weights` over a prebuilt
    per-bucket count frame ``(b, ct, cr)``: scalar totals are ONE tiny
    aggregate of the ≤ n_buckets-row frame (Σct over the full join ==
    Σct over the target counts — the join preserves every bucket row and
    coalesces absences to 0), broadcast back over the same frame.  The
    float expression is verbatim the original so rounding is
    bit-identical."""
    tot = joined.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"),
        F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"),
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


def dsir_flagged_scores(
    df: DataFrame,
    flag,
    mode: str = "target",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
    pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the bucket weights AND score every document from ONE
    tokenize+hash pass, for the ubiquitous case where both model corpora
    are slices of ``df`` itself selected by the boolean Column ``flag``:

    - ``mode="target"``: weights ≡ ``dsir_weights(df.where(flag), df)``
      (DSIR: target slice vs the whole raw corpus).
    - ``mode="split"``: weights ≡ ``nb_quality_weights(df.where(flag),
      df.where(~flag))`` (quality: positive vs negative label rows; rows
      where ``flag`` is NULL belong to neither, exactly as the
      ``where`` slices exclude them).

    Returns ``(weights, scores)`` with ``scores`` ≡
    ``dsir_scores(df, weights)`` ≡ the integer core of
    ``quality_scores`` — bit-identical by construction: per-bucket
    counts are exact integer sums of the per-doc run-length pairs, the
    scalar totals are derived from those same counts, the float weight
    expression is verbatim :func:`dsir_weights`'s, and per-doc
    ``Σ w(bucket(token))`` equals ``Σ cnt·w`` over distinct buckets.

    Plan shape (vs the separate-operator composition, which pays 3–4
    corpus-scale explode passes: target counts, raw counts, re-counts
    for the scalar totals, scoring): ONE narrow pass builds the compact
    per-doc ``(b, cnt)`` pairs frame (localCheckpoint — at cluster
    scale, persist or a staged signature parquet); weights, totals and
    per-doc scores are all cheap aggregates of that frame.  Nothing
    corpus-token-scale ever shuffles.

    ``pairs``: a prebuilt per-doc bucket-pairs frame ``(id_col, __f, b,
    cnt)`` covering exactly ``df``'s documents (the rows
    ``_doc_bucket_pairs(df, …, extra={"__f": flag})`` would emit —
    per-document rows, so a frame built over a superset corpus and
    restricted to ``df``'s ids is identical), already materialized by
    the caller.  Skips this function's own tokenize+hash pass — the
    curation pipeline's one-corpus-pass fuse."""
    if mode not in ("target", "split"):
        raise ValueError(f"unknown mode: {mode!r}")
    if pairs is None:
        pairs = _doc_bucket_pairs(
            df, text_col, id_col, n_buckets, extra={"__f": flag}
        ).localCheckpoint(eager=True)
    ct = F.coalesce(F.sum(F.when(F.col("__f"), F.col("cnt"))), F.lit(0))
    if mode == "split":
        counted = (
            pairs.where(F.col("__f").isNotNull())
            .groupBy("b")
            .agg(
                ct.alias("ct"),
                F.coalesce(
                    F.sum(F.when(~F.col("__f"), F.col("cnt"))), F.lit(0)
                ).alias("cr"),
            )
        )
    else:
        counted = pairs.groupBy("b").agg(
            ct.alias("ct"), F.sum("cnt").alias("cr")
        )
    # counted stays LAZY: its two consumers (the scalar totals and the
    # weight select) are identical subtrees over the checkpointed pairs
    # frame, so Spark's ReuseExchange dedupes the groupBy — a
    # checkpoint here would only add a 32-task job for a ≤ n_buckets-row
    # frame (measured: job-count, not CPU, dominates the curation build)
    w = _weights_from_counts(counted, n_buckets, scale)
    per_doc = (
        pairs.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("score_int"),
            F.sum("cnt").alias("n_tok"),
        )
    )
    scores = (
        df.select(id_col)
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
    return w, scores


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
