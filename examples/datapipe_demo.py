"""End-to-end training-data curation pipeline over the documents +
embeddings tables — the workflow a 100 TB pretraining-data run would
execute, at demo scale:

  1. quality + language features        (pure Column expressions)
  2. quality filter                     (Catalyst-pushed predicates)
  3. exact dedup                        (hash-groupBy keep-first)
  4. MinHash-LSH near-dup clustering    (banded candidate join +
                                         pointer-jumping components)
  5. embedding near-dup cross-check     (sign-LSH cosine pairs)
  6. IVF ANN spot check                 (inverted-list probe)

Every stage is a lazy DataFrame transform — the whole pipeline is ONE
Catalyst plan per action, and each stage's shuffle story is documented
in docs/SCALE.md.

    python examples/datapipe_demo.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from janus_spark import get_spark
from janus_spark.datapipe.dedup import dedup_keep_list, exact_dedup, minhash_lsh_pairs
from janus_spark.datapipe.similarity import embedding_near_dup_pairs, ivf_topk
from janus_spark.datapipe.text import lang_id, quality_features


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("datapipe_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} documents from {sf_dir}")

    # 1-2: quality features + filter (all JVM-side Column math)
    feat = lang_id(quality_features(docs))
    kept = feat.where(
        (F.col("q_n_tokens") >= 5)
        & (F.col("q_punct_ratio") < 0.2)
        & (F.col("q_score") >= 0.5)
    )
    print(f"quality filter: {kept.count()} kept")
    print("language mix:")
    kept.groupBy("lang_pred").count().orderBy(F.desc("count")).show(5, False)

    # 3: exact dedup (one shuffle on the normalized-text hash) — keep the
    # lowest doc_id per identical normalized text
    survivors = kept.join(
        exact_dedup(kept).select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    print(f"exact dedup: {survivors.count()} unique texts")

    # 4: MinHash-LSH near-dup pairs -> pointer-jumping clusters -> keep-list
    pairs = minhash_lsh_pairs(survivors, num_perm=16, bands=4)
    keep = dedup_keep_list(survivors, pairs)
    n_dropped = keep.where(~F.col("keep")).count()
    print(f"near-dup clustering: {n_dropped} documents folded into canonicals")

    # 5: embedding-space near-dups (independent signal on the same corpus)
    epairs = embedding_near_dup_pairs(embs, sim_threshold=0.99)
    print(f"embedding near-dup pairs (cos >= 0.99): {epairs.count()}")

    # 6: ANN spot check — 3 query vectors against the corpus via IVF
    queries = embs.where("vec_id < 3")
    print("IVF top-3 neighbors per query (nprobe=4/16):")
    ivf_topk(embs, queries, k=3, n_cells=16, nprobe=4).orderBy(
        "query_id", "rank"
    ).show(9, False)

    spark.stop()


if __name__ == "__main__":
    main()
