"""Interleaved A/B for the r10 jaccard_prefix_candidates materialization:
OLD = prefix subtree inlined on both self-join sides (the pre-r10 shape,
reproduced verbatim below); NEW = the committed form (prefix postings
localCheckpoint-cut before the self-join).  Run A/B/A/B... so box noise
hits both arms equally; report per-arm min and median.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_jaccard_prefix.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from janus_spark.datapipe.dedup import (
        _collapse_shingle_groups,
        _expand_group_pairs,
        _within_group_pairs,
        jaccard_prefix_candidates,
        ngram_jaccard_pairs,
        word_shingles,
    )
    from janus_spark.session import get_spark

    spark = get_spark("ab_jaccard")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    threshold, shingle_k = 0.5, 3

    def old_candidates(sh):
        """Pre-r10 body of jaccard_prefix_candidates (no prefix cut)."""
        posts = sh.select("id", F.size("sh").alias("n"), F.explode("sh").alias("gram"))
        dfreq = posts.groupBy("gram").agg(F.count("*").alias("gdf"))
        ranked = posts.join(dfreq, "gram").withColumn(
            "rk",
            F.row_number().over(W.partitionBy("id").orderBy(F.asc("gdf"), F.asc("gram"))),
        )
        plen = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        prefix = ranked.where(F.col("rk") <= plen)
        return (
            prefix.select("gram", F.col("id").alias("a"), F.col("n").alias("na"))
            .join(prefix.select("gram", F.col("id").alias("b"), F.col("n").alias("nb")), "gram")
            .where(
                (F.col("a") < F.col("b"))
                & (F.col("nb") * F.lit(threshold) <= F.col("na"))
                & (F.col("na") * F.lit(threshold) <= F.col("nb"))
            )
            .select("a", "b")
            .distinct()
        )

    def run(variant: str) -> float:
        spark.sparkContext.setJobDescription(f"ab_jaccard:{variant}")
        t0 = time.monotonic()
        sh = (
            docs.repartition(spark.sparkContext.defaultParallelism)
            .select(F.col("doc_id").alias("id"), word_shingles(F.col("text"), shingle_k).alias("sh"))
            .localCheckpoint(eager=True)
        )
        membership, reps_df = _collapse_shingle_groups(sh)
        rep_sh = sh.join(reps_df.select("id"), "id").localCheckpoint(eager=True)
        if variant == "old":
            cand = old_candidates(rep_sh)
        else:
            cand = jaccard_prefix_candidates(docs, shingles=rep_sh, threshold=threshold)
        verified = ngram_jaccard_pairs(docs, cand, "text", "doc_id", shingle_k, shingles=rep_sh)
        rep_pairs = verified.where(F.col("jaccard") >= F.lit(threshold))
        out = _expand_group_pairs(rep_pairs, membership, reps_df, ["jaccard"]).unionByName(
            _within_group_pairs(membership, [F.lit(1.0).alias("jaccard")])
        ).select("a", "b", F.round("jaccard", 9).alias("jaccard"))
        out.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    times: dict[str, list[float]] = {"old": [], "new": []}
    run("new")  # warm the JVM/codegen once, uncounted
    for _ in range(reps):
        for variant in ("old", "new"):
            times[variant].append(run(variant))
    for variant, ts in times.items():
        ts2 = sorted(ts)
        print(
            f"{variant}: min={ts2[0]:.3f}s median={ts2[len(ts2) // 2]:.3f}s "
            f"runs={[round(t, 3) for t in ts]}"
        )
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
