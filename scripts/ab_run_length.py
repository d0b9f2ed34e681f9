"""Interleaved A/B/C for the term-frequency construction inside
tfidf_topk_pairs (the same tf shape bm25_topk and _doc_bucket_pairs use):

  old    — r5 form: explode every token → groupBy(id, t).count()
           (corpus-token shuffle, map-side combined)
  inline — first r10 form: per-doc sorted run-length pairs as ONE Column
           expression (the run-end scan is referenced 3× inside one
           projection; higher-order functions are interpreted per
           reference, so each row pays the scan three times)
  staged — current form (text.exploded_run_lengths): the run-end scan
           staged as its own projection column, downstream references
           are O(1) attribute reads

Each arm runs the FULL q_tfidf_pairs gate shape end-to-end (only the tf
builder differs) against the noop sink, interleaved A/B/C per rep so box
noise hits all arms equally.  Also asserts all arms return identical
top-k rows before timing.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_run_length.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import functions as F

    from janus_spark.datapipe.text import clean_tokens, exploded_run_lengths
    from janus_spark.session import get_spark

    spark = get_spark("ab_run_length")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    n = docs.count()
    max_df = max(1000, n // 5)

    def sorted_run_length_inline(arr, value_type="string"):
        """The pre-staging one-Column form (reproduced verbatim)."""
        n = F.size(arr)
        ends = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == n) | (F.element_at(arr, i) != F.element_at(arr, i + 1)),
        )
        starts = F.concat(
            F.array(F.lit(0)),
            F.slice(ends, 1, F.greatest(F.size(ends) - 1, F.lit(0))),
        )
        pairs = F.zip_with(
            F.transform(ends, lambda i: F.element_at(arr, i)),
            F.zip_with(ends, starts, lambda e, s: (e - s).cast("long")),
            lambda v, c: F.struct(v.alias("v"), c.alias("cnt")),
        )
        return F.when(
            n == 0, F.array().cast(f"array<struct<v:{value_type},cnt:bigint>>")
        ).otherwise(pairs)

    def build_tf(variant):
        if variant == "old":
            words = docs.select(
                F.col("doc_id").alias("id"), F.explode(clean_tokens(F.col("text"))).alias("t")
            )
            return words.groupBy("id", "t").agg(F.count("*").alias("tf"))
        staged = docs.select(
            F.col("doc_id").alias("id"),
            F.array_sort(clean_tokens(F.col("text"))).alias("__st"),
        ).localCheckpoint(eager=False)
        if variant == "inline":
            return staged.select(
                "id", F.explode(sorted_run_length_inline(F.col("__st"), "string")).alias("__p")
            ).select("id", F.col("__p.v").alias("t"), F.col("__p.cnt").alias("tf"))
        return exploded_run_lengths(staged, "__st", keep=["id"]).select(
            "id", F.col("v").alias("t"), F.col("cnt").alias("tf")
        )

    def gate(variant):
        tf = build_tf(variant)
        n_docs = docs.select(F.countDistinct("doc_id").alias("nd"))
        dft = tf.groupBy("t").agg(F.count("*").alias("dft")).where(F.col("dft") <= max_df)
        w = (
            tf.join(dft, "t")
            .crossJoin(F.broadcast(n_docs))
            .select("id", "t", (F.col("tf") * F.log(F.col("nd") / F.col("dft"))).alias("w"))
            .localCheckpoint(eager=True)
        )
        norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        unit = (
            w.join(norms, "id")
            .select("id", "t", F.try_divide(F.col("w"), F.col("nrm")).alias("u"))
            .localCheckpoint(eager=True)
        )
        pairs = (
            unit.alias("l")
            .join(unit.alias("r"), "t")
            .where(F.col("l.id") < F.col("r.id"))
            .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .agg(F.sum(F.col("l.u") * F.col("r.u")).alias("sim"))
            .withColumn("sim", F.round("sim", 6))
        )
        return pairs.orderBy(F.desc("sim"), F.asc("a"), F.asc("b")).limit(50)

    arms = ("old", "inline", "staged")
    # correctness: identical top-k across arms
    ref = None
    for v in arms:
        rows = [tuple(r) for r in gate(v).collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"arm {v} diverges from old"
    print(f"all arms identical top-50 ({len(ref)} rows)")

    times = {v: [] for v in arms}
    for _ in range(reps):
        for v in arms:
            spark.sparkContext.setJobDescription(f"ab_run_length:{v}")
            t0 = time.monotonic()
            gate(v).write.format("noop").mode("overwrite").save()
            times[v].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    for v, ts in times.items():
        s = sorted(ts)
        print(f"{v}: min={s[0]:.3f}s median={s[len(s) // 2]:.3f}s runs={[round(t, 3) for t in ts]}")
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
