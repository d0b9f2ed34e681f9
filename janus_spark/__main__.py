"""CLI — reference parity for janus_cli / stream_bus_cli.

    python -m janus_spark parse  "<janus-ql>"           # show decomposition
    python -m janus_spark query  "<janus-ql>" [--sf-dir DIR] [--now MS]
    python -m janus_spark serve  [--sf-dir DIR] [--port 8080]
    python -m janus_spark replay --input file.nq --store DIR [--rate HZ]
    python -m janus_spark bench
    python -m janus_spark datapipe [--sf-dir DIR] [--out DIR]
                                   [--min-tokens N] [--min-score X]
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from janus_spark.session import get_spark

    spark = get_spark("janus_cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_parse(args) -> int:
    from janus_spark.parsing import parse_janusql

    q = parse_janusql(args.query)
    out = {
        "operator": q.operator,
        "output": q.output,
        "windows": [vars(w) for w in q.windows],
        "baseline": {"window": q.baseline_window, "mode": q.baseline_mode},
        "live_windows": [w.name for w in q.live_windows],
        "historical_windows": [w.name for w in q.historical_windows],
        "hybrid": q.is_hybrid(),
    }
    print(json.dumps(out, indent=2, default=str))
    return 0


def cmd_query(args) -> int:
    from janus_spark.engine import JanusEngine
    from janus_spark.sources.melt import melt_events, read_events

    spark = _spark()
    quads = melt_events(read_events(spark, args.sf_dir))
    eng = JanusEngine(spark, quads)
    qid = eng.register_query(args.query)
    results = eng.start_historical(qid, now=args.now)
    for wname, df in results.items():
        print(f"== window {wname} ==", file=sys.stderr)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_serve(args) -> int:
    from janus_spark.engine import JanusEngine
    from janus_spark.http_api import create_app
    from janus_spark.sources.melt import melt_events, read_events

    spark = _spark()
    quads = melt_events(read_events(spark, args.sf_dir))
    app = create_app(JanusEngine(spark, quads))
    app.run(host=args.host, port=args.port, threaded=True)
    return 0


def cmd_replay(args) -> int:
    """stream_bus_cli equivalent: N-Quads file → quad store (+ stdout rate)."""
    import time

    from janus_spark.sources.nquads import read_nquads
    from janus_spark.sources.quadstore import QuadStore

    spark = _spark()
    quads = read_nquads(spark, args.input)
    store = QuadStore(spark, args.store)
    t0 = time.perf_counter()
    store.write(quads)
    n = store.read().count()
    dt = time.perf_counter() - t0
    print(json.dumps({"events": n, "seconds": round(dt, 3), "events_per_sec": round(n / dt)}))
    return 0


def cmd_datapipe(args) -> int:
    """Training-data curation over the documents table: PII scrub ->
    quality/language features -> quality + repetition filters -> exact
    dedup -> MinHash-LSH near-dup keep-list -> optional n-gram benchmark
    decontamination -> optional per-source quota -> stable train/eval
    split tags (-> optional chunking).  Writes the curated corpus to
    --out if given; prints one JSON summary line either way."""
    from pyspark.sql import functions as F

    from janus_spark.datapipe.dedup import (
        dedup_keep_list,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_contamination,
    )
    from janus_spark.datapipe.sampling import quota_sample, split_train_eval
    from janus_spark.datapipe.scrub import scrub_documents
    from janus_spark.datapipe.text import lang_id, quality_features, repetition_features

    spark = _spark()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    scrubbed = docs.drop("text").join(
        scrub_documents(docs).withColumnRenamed("id", "doc_id")
        .withColumnRenamed("clean_text", "text"),
        "doc_id",
    )
    feat = lang_id(quality_features(scrubbed))
    kept = feat.where(
        (F.col("q_n_tokens") >= args.min_tokens) & (F.col("q_score") >= args.min_score)
    )
    rep_ok = repetition_features(kept).where(
        F.col("uniq_token_ratio") >= args.min_uniq_ratio
    ).select("doc_id")
    kept = kept.join(rep_ok, "doc_id")
    survivors = kept.join(
        exact_dedup(kept).select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    pairs = minhash_lsh_pairs(survivors)
    if args.keep_best:
        from janus_spark.datapipe.dedup import dedup_keep_best

        keep = dedup_keep_best(survivors, pairs, score_col=F.col("q_score"))
    else:
        keep = dedup_keep_list(survivors, pairs)
    curated = survivors.join(keep.select("doc_id", "keep_id", "keep"), "doc_id")
    summary = {
        "input_docs": docs.count(),
        "after_quality_filter": kept.count(),
        "after_exact_dedup": survivors.count(),
        "near_dup_dropped": curated.where(~F.col("keep")).count(),
    }
    curated = curated.where(F.col("keep"))
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        dirty = ngram_contamination(curated, bench, n=5).select(F.col("id").alias("doc_id"))
        before = curated.count()
        curated = curated.join(dirty, "doc_id", "left_anti")
        summary["decontamination_dropped"] = before - curated.count()
    if args.max_per_source > 0:
        curated = quota_sample(curated, args.max_per_source, strata_col="source")
        summary["after_source_quota"] = curated.count()
    if args.mix_budget > 0:
        from janus_spark.datapipe.sampling import temperature_mix

        curated = temperature_mix(curated, budget=args.mix_budget, alpha=args.mix_alpha)
        summary["after_temperature_mix"] = curated.count()
    curated = split_train_eval(curated, eval_rate=args.eval_rate)
    summary["curated_docs"] = curated.count()
    summary["eval_docs"] = curated.where(F.col("split") == "eval").count()
    if args.out:
        curated.write.mode("overwrite").parquet(args.out)
        summary["out"] = args.out
        if args.chunk_tokens > 0:
            from janus_spark.datapipe.text import chunk_documents

            chunks = chunk_documents(curated, chunk_tokens=args.chunk_tokens,
                                     overlap=max(args.chunk_tokens // 8, 1))
            chunks.write.mode("overwrite").parquet(args.out + "_chunks")
            summary["chunks"] = chunks.count()
    print(json.dumps(summary))
    return 0


def cmd_search(args) -> int:
    """BM25 retrieval over the documents corpus — "grep for your
    corpus": prints one JSON line per hit (doc_id, rank, score,
    snippet)."""
    from pyspark.sql import functions as F

    from janus_spark.datapipe.retrieval import bm25_topk

    spark = _spark()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    qdf = spark.createDataFrame([("q", args.query)], ["query_id", "qtext"])
    hits = (
        bm25_topk(docs, qdf, k=args.k)
        .join(docs.select("doc_id", F.substring("text", 1, 120).alias("snippet")), "doc_id")
        .orderBy("rank")
    )
    for r in hits.collect():
        print(json.dumps({"doc_id": r["doc_id"], "rank": r["rank"],
                          "score": r["score"], "snippet": r["snippet"]}))
    return 0


def cmd_bench(args) -> int:
    import runpy

    runpy.run_module("bench", run_name="__main__")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="janus_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("parse")
    sp.add_argument("query")

    sq = sub.add_parser("query")
    sq.add_argument("query")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sq.add_argument("--now", type=int, default=None)
    sq.add_argument("--limit", type=int, default=100)

    ss = sub.add_parser("serve")
    ss.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ss.add_argument("--host", default="127.0.0.1")
    ss.add_argument("--port", type=int, default=8080)

    sr = sub.add_parser("replay")
    sr.add_argument("--input", required=True)
    sr.add_argument("--store", required=True)
    sr.add_argument("--rate", type=float, default=None)

    sub.add_parser("bench")

    sd = sub.add_parser("datapipe")
    sd.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sd.add_argument("--out", default=None)
    sd.add_argument("--min-tokens", type=int, default=5)
    sd.add_argument("--min-score", type=float, default=0.5)
    sd.add_argument("--min-uniq-ratio", type=float, default=0.2,
                    help="drop docs whose unique-token ratio is below this (repetition filter)")
    sd.add_argument("--benchmark", default=None,
                    help="parquet path of benchmark docs; matching 5-gram docs are dropped")
    sd.add_argument("--max-per-source", type=int, default=0,
                    help="quota-cap documents per source (0 = no cap)")
    sd.add_argument("--mix-budget", type=int, default=0,
                    help="temperature-mix the corpus down to ~N docs (0 = off)")
    sd.add_argument("--mix-alpha", type=float, default=0.5,
                    help="temperature exponent: per-source share ∝ n^alpha")
    sd.add_argument("--eval-rate", type=float, default=0.01,
                    help="fraction tagged 'eval' in the stable train/eval split")
    sd.add_argument("--chunk-tokens", type=int, default=0,
                    help="also emit <out>_chunks parquet of N-token training chunks (0 = off)")
    sd.add_argument("--keep-best", action="store_true",
                    help="near-dup clusters keep the highest-q_score member instead of the lowest id")

    sf = sub.add_parser("search")
    sf.add_argument("query")
    sf.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sf.add_argument("--k", type=int, default=10)

    args = p.parse_args(argv)
    return {
        "parse": cmd_parse,
        "query": cmd_query,
        "serve": cmd_serve,
        "replay": cmd_replay,
        "bench": cmd_bench,
        "search": cmd_search,
        "datapipe": cmd_datapipe,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
