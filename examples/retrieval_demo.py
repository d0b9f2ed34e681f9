"""Retrieval stack tour — the round-3 search additions end to end:

  1. BM25 lexical top-k          (broadcast query terms over the
                                  corpus inverted index)
  2. dense cosine top-k          (broadcast queries, JVM-side folds)
  3. hybrid reciprocal-rank fusion
  4. hard-negative mining        (top-sim among different-label vectors
                                  — contrastive training pairs)
  5. embedding-space decontamination vs a held-out "benchmark" set

    python examples/retrieval_demo.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from janus_spark.datapipe.retrieval import bm25_topk, rrf_fuse
from janus_spark.datapipe.similarity import cosine_topk, semantic_contamination
from janus_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("retrieval_demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    print("== 1. BM25 lexical search ==")
    q = spark.createDataFrame(
        [("q1", "spark window stream"), ("q2", "customer query table")],
        ["query_id", "qtext"],
    )
    bm25_topk(docs, q, k=5).orderBy("query_id", "rank").show(truncate=False)

    print("== 2. dense cosine top-k (queries = first 2 embeddings) ==")
    dense = cosine_topk(embs, embs.where("vec_id < 2"), k=5)
    dense.orderBy("query_id", "rank").show()

    print("== 3. hybrid RRF (BM25 over doc 0-1 text × dense) ==")
    qdocs = docs.where("doc_id < 2").select(
        F.concat(F.lit("d"), "doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    lex = bm25_topk(docs, qdocs, k=10)
    den = cosine_topk(embs, embs.where("vec_id < 2"), k=10).select(
        F.concat(F.lit("d"), "query_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        "rank",
    )
    rrf_fuse(lex, den, k=5).orderBy("query_id", "rank").show()

    print("== 4. hard negatives for anchor vec 0 ==")
    sims = cosine_topk(embs, embs.where("vec_id = 0"), k=None)
    lbl = embs.select("vec_id", "label")
    anchor_label = embs.where("vec_id = 0").collect()[0]["label"]
    (
        sims.join(lbl, "vec_id")
        .where(F.col("label") != anchor_label)
        .orderBy(F.desc("sim"))
        .limit(5)
        .show()
    )

    print("== 5. semantic decontamination (benchmark = last 5 vectors) ==")
    mx = embs.agg(F.max("vec_id")).collect()[0][0]
    flagged = semantic_contamination(
        embs.where(F.col("vec_id") <= mx - 5),
        embs.where(F.col("vec_id") > mx - 5),
        threshold=0.3,
    )
    print(f"flagged {flagged.count()} corpus vectors above 0.3 cosine to benchmark")
    flagged.orderBy(F.desc("max_sim")).limit(5).show()


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
