"""Sparse and hybrid document retrieval: BM25 scoring over an inverted
index, and reciprocal-rank fusion of heterogeneous rankers.

The lexical complement of the dense-embedding ANN path
(`datapipe/similarity.py`): BM25 is the standard first-stage retriever
for RAG / training-data curation ("find the docs most relevant to these
probe queries"), and RRF is the standard way to combine its ranking with
an embedding ranker without score calibration.

Scale notes (100 TB corpus):
* The query set is broadcast (it is human-sized); the corpus side is ONE
  tokenize+count aggregation — the inverted index — and the score join is
  a broadcast hash join on the term, so the corpus is never shuffled by
  document.  Document frequencies come from the same postings aggregate.
* Per-(query, doc) score summation touches only docs sharing ≥1 query
  term — the postings join bounds candidates exactly like the TF-IDF
  pair join (`similarity.py::tfidf_topk_pairs`).
* RRF joins two rank frames that are top-k-sized (k × |queries| rows):
  driver-free, broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from janus_spark.datapipe.text import clean_tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    round_score: int | None = 6,
) -> DataFrame:
    """Top-k documents per query under BM25 (Robertson/Spärck Jones).

    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); duplicate query
    terms count once (standard bag-of-words query, set semantics).

    dl/avgdl is computed as dl·N/total_len — all-integer numerator, so
    the only floats are one division and one ln per (term, doc), a fixed
    expression tree both engines evaluate identically; `round_score`
    rounds ONCE after the per-doc sum so the k-cut is engine-reproducible
    (ties break on doc id ascending).

    Returns (query_id, doc_id, rank, score).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), clean_tokens(F.col(text_col)).alias("__toks")
    )
    # dl feeds the corpus-stats scalar AND the score join; tf feeds the
    # document-frequency aggregate AND the postings join — lazily
    # checkpoint both so the tokenize+count pass over the corpus runs
    # ONCE instead of once per consumer (this is "materialize the
    # inverted index", the obvious thing to persist at 100 TB)
    dl = toks.select("id", F.size("__toks").alias("dl")).localCheckpoint(eager=False)
    tf = (
        toks.select("id", F.explode("__toks").alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    ).collect()[0]
    n_docs, total_len = int(stats["n_docs"]), int(stats["total_len"])
    dft = tf.groupBy("t").agg(F.count(F.lit(1)).alias("dft"))
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(clean_tokens(F.col(query_text_col))).alias("t"),
        )
        .distinct()
    )
    tfd = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    denom = tfd + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * (F.col("dl") * F.lit(n_docs)).cast("double") / F.lit(float(total_len))
    )
    contrib = idf * tfd * F.lit(k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(qterms), "t")
        .join(F.broadcast(dft), "t")
        .join(dl, "id")
        .groupBy("query_id", "id")
        .agg(F.sum(contrib).alias("score"))
    )
    if round_score is not None:
        scored = scored.withColumn("score", F.round("score", round_score))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "rank", "score")
    )


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    round_score: int | None = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two rank
    frames with columns (query_id, id_col, rank):
    score = 1/(c+rank_a) + 1/(c+rank_b), a missing ranker contributing 0.

    The two terms are pivoted into fixed columns before the addition, so
    the sum has a deterministic operand order (no unordered aggregate) —
    the score is engine-exact given integer ranks.  Ties break on doc id.

    Returns (query_id, doc_id, rank, score).
    """
    a = ranks_a.select("query_id", F.col(id_col).alias("id"), F.col("rank").alias("ra"))
    bdf = ranks_b.select("query_id", F.col(id_col).alias("id"), F.col("rank").alias("rb"))
    term = lambda col: F.when(  # noqa: E731
        F.col(col).isNotNull(), F.lit(1.0) / (F.lit(float(c)) + F.col(col).cast("double"))
    ).otherwise(F.lit(0.0))
    score = term("ra") + term("rb")
    if round_score is not None:
        score = F.round(score, round_score)
    fused = a.join(bdf, ["query_id", "id"], "full_outer").select(
        "query_id", "id", score.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "rank", "score")
    )
