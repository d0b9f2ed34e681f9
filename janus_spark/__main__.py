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
    """Training-data curation over the documents table: quality/language
    features -> quality filter -> exact dedup -> MinHash-LSH near-dup
    keep-list.  Writes the curated corpus (doc + features + keep flags)
    to --out if given; prints one JSON summary line either way."""
    from pyspark.sql import functions as F

    from janus_spark.datapipe.dedup import dedup_keep_list, exact_dedup, minhash_lsh_pairs
    from janus_spark.datapipe.text import lang_id, quality_features

    spark = _spark()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    feat = lang_id(quality_features(docs))
    kept = feat.where(
        (F.col("q_n_tokens") >= args.min_tokens) & (F.col("q_score") >= args.min_score)
    )
    survivors = kept.join(
        exact_dedup(kept).select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    keep = dedup_keep_list(survivors, minhash_lsh_pairs(survivors))
    curated = survivors.join(keep.select("doc_id", "keep_id", "keep"), "doc_id")
    summary = {
        "input_docs": docs.count(),
        "after_quality_filter": kept.count(),
        "after_exact_dedup": survivors.count(),
        "near_dup_dropped": curated.where(~F.col("keep")).count(),
    }
    summary["curated_docs"] = summary["after_exact_dedup"] - summary["near_dup_dropped"]
    if args.out:
        curated.where(F.col("keep")).write.mode("overwrite").parquet(args.out)
        summary["out"] = args.out
    print(json.dumps(summary))
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

    args = p.parse_args(argv)
    return {
        "parse": cmd_parse,
        "query": cmd_query,
        "serve": cmd_serve,
        "replay": cmd_replay,
        "bench": cmd_bench,
        "datapipe": cmd_datapipe,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
