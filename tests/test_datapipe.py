"""Dedup / similarity / text-analysis / multimodal operators."""

import pytest
from pyspark.sql import functions as F

from janus_spark.datapipe import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


# ------------------------------------------------------------------ text
def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], ["text"])
    rows = df.select(text.token_count(F.col("text")).alias("n")).collect()
    assert [r["n"] for r in rows] == [3, 0, 1]


def test_quality_features(docs):
    out = text.quality_features(docs).select("doc_id", "q_n_tokens", "q_score", "q_punct_ratio")
    rows = out.collect()
    assert all(0 <= r["q_score"] <= 1.0 for r in rows)
    assert all(r["q_n_tokens"] > 0 for r in rows)


def test_lang_id_deterministic(docs):
    a = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    b = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    assert a == b
    assert set(a.values()) <= set(list(text.LANG_MARKERS) + ["und"])


def test_fingerprint_stable_under_formatting(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different text")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fp_md5"] for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2]  # normalization collapses case/punct/space
    assert fp[1] != fp[3]


# ----------------------------------------------------------------- dedup
def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "Same  Text here!"), (3, "unique")],
        ["doc_id", "text"],
    )
    out = dedup.exact_dedup(df).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep == {1: 2, 3: 1}


def test_minhash_finds_near_dups(spark, docs):
    # plant a near-duplicate: doc 0's text with one word changed
    base = docs.limit(20)
    mutated = base.where("doc_id = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(mutated)
    pairs = dedup.minhash_lsh_pairs(corpus, jaccard_threshold=0.5).collect()
    assert any((p["a"], p["b"]) == (0, 100000) for p in pairs)
    assert all(p["jaccard"] >= 0.5 for p in pairs)


def test_simhash_near_dups(spark, docs):
    base = docs.limit(20)
    mutated = base.where("doc_id = 1").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(mutated)
    pairs = dedup.simhash_pairs(corpus, max_hamming=4).collect()
    assert any((p["a"], p["b"]) == (1, 100001) for p in pairs)


def test_ngram_jaccard_verification(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u")],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["a", "b"])
    out = {(r["a"], r["b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(df, cand).collect()}
    # shingles(1)={abc,bcd,cde,def}, shingles(2)={abc,bcd,cde,deg} -> 3/5
    assert abs(out[(1, 2)] - 3 / 5) < 1e-9
    assert out[(1, 3)] == 0.0


# ------------------------------------------------------------ similarity
def test_cosine_topk_exact(spark, embs):
    queries = embs.where("vec_id < 3")
    out = similarity.cosine_topk(embs, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q for r in rs)


def test_lsh_topk_recall(spark, embs):
    queries = embs.where("vec_id < 10")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    approx = similarity.lsh_topk(embs, queries, k=5, bands=8, bits_per_band=4).collect()
    exact_top1 = {r["query_id"]: r["vec_id"] for r in exact if r["rank"] == 1}
    approx_hits = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = sum(1 for q, v in exact_top1.items() if (q, v) in approx_hits) / len(exact_top1)
    assert recall >= 0.5, f"top-1 recall too low: {recall}"


def test_ivf_probe_all_equals_exact(spark, embs):
    # nprobe = n_cells means every inverted list is a candidate source, so
    # IVF must reproduce brute force exactly regardless of centroid quality
    queries = embs.where("vec_id < 3")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    ivf = similarity.ivf_topk(embs, queries, k=5, n_cells=8, nprobe=8, iters=2).collect()
    key = lambda rs: sorted((r["query_id"], r["vec_id"], r["rank"]) for r in rs)
    assert key(ivf) == key(exact)
    sims = lambda rs: {(r["query_id"], r["vec_id"]): r["sim"] for r in rs}
    for k2, v in sims(exact).items():
        assert abs(sims(ivf)[k2] - v) < 1e-9


def test_ivf_topk_recall(spark, embs):
    queries = embs.where("vec_id < 10")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    approx = similarity.ivf_topk(embs, queries, k=5, n_cells=16, nprobe=4).collect()
    exact_top1 = {r["query_id"]: r["vec_id"] for r in exact if r["rank"] == 1}
    approx_hits = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = sum(1 for q, v in exact_top1.items() if (q, v) in approx_hits) / len(exact_top1)
    assert recall >= 0.5, f"top-1 recall too low: {recall}"


def test_embedding_near_dup_self(spark, embs):
    # plant an exact duplicate vector
    dup = embs.where("vec_id = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    pairs = similarity.embedding_near_dup_pairs(embs.unionByName(dup), sim_threshold=0.999)
    rows = pairs.collect()
    assert any((r["a"], r["b"]) == (0, 100000) and r["sim"] > 0.999 for r in rows)


# ------------------------------------------------------------ multimodal
def test_multimodal_decode_plumbing(docs):
    media = multimodal.documents_as_media(docs.limit(30))
    decoded = multimodal.decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 30
    assert all(r["n_bytes"] > 0 and r["checksum"] is not None for r in rows)
    videos = [r for r in rows if r["media_type"] == "video"]
    assert videos and all(r["n_frames"] >= 1 for r in videos)
    # deterministic: second run identical
    rows2 = multimodal.decode_media(media, fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_multimodal_decode_stub_raises(docs):
    media = multimodal.documents_as_media(docs.limit(5))
    with pytest.raises(Exception):
        multimodal.decode_media(media, fake=False).collect()


def test_frame_sampling(docs):
    media = multimodal.documents_as_media(docs.limit(30))
    decoded = multimodal.decode_media(media, fake=True)
    frames = multimodal.frame_sample(decoded, every_n=50).collect()
    assert frames
    assert all(r["frame_index"] % 50 == 0 for r in frames)


def test_dedup_clusters_transitive(spark):
    # chain 1-2-3 plus isolated pair 7-8: clusters {1,2,3}->1, {7,8}->7
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["a", "b"])
    out = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_dedup_keep_list(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 10)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["a", "b"])
    out = {r["doc_id"]: (r["keep_id"], r["keep"]) for r in dedup.dedup_keep_list(docs, pairs).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True)  # not in any pair
    assert out[7] == (7, True) and out[8] == (7, False)


def test_dedup_clusters_long_chain_converges(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)], ["a", "b"])
    out = dedup.dedup_clusters(pairs).collect()
    assert all(r["keep_id"] == 0 for r in out)


# -------------------------------------------------------------- sampling
def test_hash_sample_rate_monotone_subset(docs):
    from janus_spark.datapipe import sampling

    small = {r["doc_id"] for r in sampling.hash_sample(docs, 0.1).select("doc_id").collect()}
    big = {r["doc_id"] for r in sampling.hash_sample(docs, 0.5).select("doc_id").collect()}
    n = docs.count()
    assert small <= big  # raising the rate only ADDS rows
    assert 0.02 * n < len(small) < 0.25 * n
    assert 0.3 * n < len(big) < 0.7 * n


def test_hash_sample_deterministic_across_partitionings(docs):
    from janus_spark.datapipe import sampling

    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3).collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(docs.repartition(13), 0.3).collect()}
    assert a == b


def test_stratified_sample_rates(docs):
    from janus_spark.datapipe import sampling

    out = sampling.stratified_sample(docs, {"en": 0.0, "de": 1.0}, default_rate=0.5)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in by_lang  # rate 0 drops the stratum entirely
    assert by_lang["de"] == totals["de"]  # rate 1 keeps everything
    for lg in by_lang:
        if lg not in ("en", "de"):
            assert by_lang[lg] < totals[lg]


def test_quota_sample_caps_and_determinism(docs):
    from janus_spark.datapipe import sampling

    out = sampling.quota_sample(docs, 3, strata_col="source")
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in per)
    again = sampling.quota_sample(docs.repartition(7), 3, strata_col="source")
    assert {tuple(r) for r in out.select("doc_id").collect()} == {
        tuple(r) for r in again.select("doc_id").collect()
    }


def test_weighted_sample_deterministic_and_bounded(docs):
    from janus_spark.datapipe import sampling

    a = {r["doc_id"] for r in sampling.weighted_sample(docs, 50, "n_chars").collect()}
    b = {r["doc_id"] for r in sampling.weighted_sample(docs.repartition(13), 50, "n_chars").collect()}
    assert a == b and len(a) == 50


def test_weighted_sample_prefers_heavy_rows(spark):
    from janus_spark.datapipe import sampling

    # 100 light rows (w=1) vs 100 heavy rows (w=1000): the heavy half
    # must dominate a k=50 draw overwhelmingly
    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else 1000.0) for i in range(200)], "doc_id long, w double"
    )
    picked = sampling.weighted_sample(df, 50, "w").collect()
    heavy = sum(1 for r in picked if r["w"] == 1000.0)
    assert heavy >= 45


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from janus_spark.datapipe import sampling

    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, None), (4, 2.0)], "doc_id long, w double"
    )
    assert [r["doc_id"] for r in sampling.weighted_sample(df, 10, "w").collect()] == [4]


def test_split_stable_under_corpus_growth(docs):
    from janus_spark.datapipe import sampling

    half = docs.where(F.col("doc_id") % 2 == 0)
    full_split = {r["doc_id"]: r["split"] for r in sampling.split_train_eval(docs).collect()}
    half_split = {r["doc_id"]: r["split"] for r in sampling.split_train_eval(half).collect()}
    # adding the other half never moved an existing row across the split
    assert all(full_split[k] == v for k, v in half_split.items())
    assert set(full_split.values()) == {"train", "eval"}


# ------------------------------------------------------------ repetition
def test_doc_logprob_hand_computed(spark):
    import math

    df = spark.createDataFrame([(1, "a a b"), (2, "b c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.doc_logprob(df).collect()}
    # vocab: a=2 b=2 c=1, total=5
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(math.log(2 / 5), rel=1e-12)
    assert out[2]["avg_logprob"] == pytest.approx((math.log(2 / 5) + math.log(1 / 5)) / 2, rel=1e-12)


def test_doc_logprob_blank_doc_excluded(spark):
    df = spark.createDataFrame([(1, "a"), (2, "   ")], "doc_id long, text string")
    assert [r["doc_id"] for r in text.doc_logprob(df).collect()] == [1]


def test_tfidf_pairs_identical_docs_rank_first(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta epsilon")],
        "doc_id long, text string",
    )
    rows = similarity.tfidf_topk_pairs(df, k=5).collect()
    assert (rows[0]["a"], rows[0]["b"]) == (1, 2)
    assert rows[0]["sim"] == pytest.approx(1.0, rel=1e-9)


def test_tfidf_max_df_drops_stop_terms(spark):
    # 'the' appears in all three docs; with max_df=2 it cannot create pairs
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the cat")], "doc_id long, text string"
    )
    rows = similarity.tfidf_topk_pairs(df, k=10, max_df=2).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, 3)]  # only 'cat' joins


def test_repetition_features_known_texts(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words fully distinct"), (3, "  "), (4, "one")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    assert rows[1]["uniq_token_ratio"] == 0.25 and rows[1]["uniq_bigram_ratio"] == pytest.approx(1 / 3)
    assert rows[2]["uniq_token_ratio"] == 1.0 and rows[2]["uniq_bigram_ratio"] == 1.0
    assert rows[3]["n_tokens"] == 0 and rows[3]["uniq_token_ratio"] == 1.0
    assert rows[4]["n_tokens"] == 1 and rows[4]["uniq_bigram_ratio"] == 1.0  # no bigrams


def test_word_freq_counts(spark):
    df = spark.createDataFrame([("b a b",), ("A  b",), ("c",)], ["text"])
    rows = [(r["word"], r["n"]) for r in text.word_freq(df, k=2).collect()]
    assert rows == [("b", 3), ("a", 2)]  # case-folded, count-then-word order


# --------------------------------------------------------- contamination
def test_contamination_flags(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "clean document"), (3, "the QUICK brown fox!!")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([("the quick brown fox",)], ["text"])
    out = dedup.contamination_flags(df, bench).collect()
    assert {r["id"] for r in out} == {1, 3}  # normalization catches the variant


def test_ngram_contamination_catches_embedded_benchmark(spark):
    bench = spark.createDataFrame([(1, "what is the capital of france")], ["doc_id", "text"])
    df = spark.createDataFrame(
        [
            (10, "some page asking What is the Capital of France? among other things"),
            (11, "a completely unrelated clean document about spark joins"),
            (12, "too short"),  # < n tokens: guard path, no grams
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r["n_hits"] for r in dedup.ngram_contamination(df, bench, n=5).collect()}
    assert 10 in out and out[10] >= 2  # embedded phrase found (exact-match would miss it)
    assert 11 not in out and 12 not in out


def test_chunk_documents_coverage_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "tiny doc"), (3, "")], ["doc_id", "text"])
    rows = text.chunk_documents(df, chunk_tokens=32, overlap=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    # every token of doc 1 appears in at least one chunk
    covered = {w for r in by_doc[1] for w in r["chunk_text"].split()}
    assert covered == set(words.split())
    # consecutive chunks share exactly `overlap` tokens
    c = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    for a, b in zip(c, c[1:]):
        assert a["chunk_text"].split()[-4:] == b["chunk_text"].split()[:4]
    assert all(r["n_tokens"] <= 32 for r in rows)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "tiny doc"
    assert 3 not in by_doc  # empty text -> no chunks


# ------------------------------------------------------------------ scrub
def test_redact_pii(spark):
    from janus_spark.datapipe import scrub

    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+spam@corp.example.org or call 555-123-4567 from 10.1.2.3")],
        ["doc_id", "text"],
    )
    (row,) = scrub.scrub_documents(df).collect()
    assert row["clean_text"] == "mail me at <EMAIL> or call <PHONE> from <IPV4>"
    assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (1, 1, 1)


def test_redact_pii_leaves_clean_text_untouched(docs):
    from janus_spark.datapipe import scrub

    out = scrub.scrub_documents(docs)
    joined = out.join(docs, out["id"] == docs["doc_id"])
    assert joined.where(F.col("clean_text") != F.col("text")).count() == 0


def test_datapipe_cli_end_to_end(spark, tmp_path, capsys):
    import json

    from janus_spark.__main__ import main

    out = str(tmp_path / "curated")
    rc = main([
        "datapipe", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--max-per-source", "5", "--chunk-tokens", "16",
        "--benchmark", "/root/testdata/sf0.001/documents.parquet",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the corpus IS the benchmark here -> decontamination drops every doc
    # that survived dedup, so the curated set is empty but the pipeline
    # still runs through quota/split/chunk stages without failing
    assert summary["decontamination_dropped"] > 0
    assert summary["curated_docs"] == summary["eval_docs"] == 0
    assert spark.read.parquet(out + "_chunks").count() == summary["chunks"] == 0


def test_resize_plan_geometry(spark):
    rows = [
        (1, "image", 10, 2048, 1024, 1),   # downscale, width longer
        (2, "image", 10, 100, 200, 1),     # no upscale
        (3, "audio", 10, 1, 1, 500),       # filtered out
        (4, "video", 10, 640, 480, 90),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, n_bytes long, width int, height int, n_frames int"
    )
    out = {r["media_id"]: r for r in multimodal.resize_plan(df, max_side=224).collect()}
    assert (out[1]["target_width"], out[1]["target_height"]) == (224, 112)
    assert (out[2]["target_width"], out[2]["target_height"]) == (100, 200)  # untouched
    assert 3 not in out
    assert (out[4]["target_width"], out[4]["target_height"]) == (224, 168)


def test_extract_features_feeds_ann(docs):
    """decode -> features -> brute-force cosine top-k composes end-to-end:
    multimodal embeddings are first-class similarity inputs."""
    media = multimodal.documents_as_media(docs.limit(50))
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert all(len(r["embedding"]) == 8 for r in rows)
    assert all(abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5 for r in rows)
    # determinism: same payload -> same embedding
    again = {r["media_id"]: r["embedding"] for r in multimodal.extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["embedding"] for r in rows)
    emb = feats.select(F.col("media_id").alias("vec_id"), "embedding")
    topk = similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 2), k=3)
    assert topk.count() == 2 * 3


def test_extract_features_fake_false_raises(spark, docs):
    media = multimodal.documents_as_media(docs.limit(5))
    with pytest.raises(Exception, match="NotImplementedError|encoder"):
        multimodal.extract_features(media, fake=False).collect()


def test_duplicate_passages_merges_adjacent_shingles(spark):
    from janus_spark.datapipe.dedup import duplicate_passages

    boiler = "creative commons license applies to this page"  # 7 tokens
    rows = [
        (1, f"alpha beta {boiler} gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta iota"),
        (3, "totally unique words nothing shared here at all"),
        (4, "tiny doc"),  # shorter than k -> no shingles, no crash
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in duplicate_passages(df, k=5).collect()}
    # doc 1: boiler starts at token 3 (1-based); 7 tokens -> 3 shingles
    # of 5 merge into one span [3, 9]
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["n_shingles"]) == (3, 9, 3)
    # doc 2: boiler at tokens 1..7 -> span [1, 7]
    assert (out[2]["span_start"], out[2]["span_end"], out[2]["n_shingles"]) == (1, 7, 3)
    assert 3 not in out and 4 not in out


def test_duplicate_passages_keeps_distant_spans_separate(spark):
    from janus_spark.datapipe.dedup import duplicate_passages

    a = "shared passage one two three"
    b = "other shared block four five"
    filler = " ".join(f"f{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, f"{a} {filler} {b}"), (2, f"{a} x y z w v"), (3, f"{b} q r s t u")],
        ["doc_id", "text"],
    )
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_passages(df, k=5).where("id = 1").collect()
    )
    assert spans == [(1, 5), (16, 20)]


def test_minhash_lsh_join_only_pairs_across_corpora(spark):
    from janus_spark.datapipe.dedup import minhash_lsh_join

    base = "the quick brown fox jumps over the lazy dog again and again today"
    crawl = spark.createDataFrame(
        [(1, base + " extra"), (2, base + " extra"), (3, "entirely different words here")],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame(
        [(10, base), (11, base), (12, "unrelated reference text content")],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_join(crawl, ref, jaccard_threshold=0.5).collect()
    got = {(r["corpus_id"], r["ref_id"]) for r in pairs}
    # near-dup crawl docs pair with BOTH matching refs; crawl 1-2 (dups of
    # each other) and ref 10-11 never pair — the join is strictly bipartite
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_pack_token_stream_contiguous_per_shard(spark):
    from janus_spark.datapipe.text import pack_token_stream

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7 + 1))) for i in range(50)],
        ["doc_id", "text"],
    )
    out = pack_token_stream(docs, budget_tokens=10, n_shards=3).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2} and len(out) == 50
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        # offsets tile the shard's token stream with no gaps or overlaps
        pos = 0
        for r in rows:
            assert r["start_offset"] == pos
            assert r["end_offset"] == pos + r["n_tokens"]
            assert r["seq_id"] == pos // 10
            assert r["straddles"] == (pos + r["n_tokens"] > (pos // 10 + 1) * 10)
            pos = r["end_offset"]


def test_containment_join_detects_subset_duplicate(spark):
    from janus_spark.datapipe.dedup import containment_join

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short = "gamma delta epsilon zeta eta"  # fully contained phrase
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, other)], "doc_id long, text string"
    )
    out = containment_join(df, shingle_k=3, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == (1, 2)
    # every shingle of the short doc appears in the long doc
    assert r["containment_b_in_a"] == 1.0
    assert r["containment_a_in_b"] < 0.9


def test_containment_asymmetric_where_jaccard_blind(spark):
    """The motivating case: subset-dup with Jaccard far below any usable
    threshold but containment at 1.0 from the short side."""
    from janus_spark.datapipe.dedup import containment_join, jaccard_similarity_join

    long = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(20, 28))
    df = spark.createDataFrame([(1, long), (2, short)], "doc_id long, text string")
    jac = jaccard_similarity_join(df, threshold=0.5).collect()
    assert jac == []  # symmetric measure misses it
    cont = containment_join(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment_b_in_a"] == 1.0


def test_collapse_exact_parity_on_duplicated_corpus(spark):
    """collapse_exact=True must return the EXACT same pair set and values
    as the uncollapsed formulations on a corpus with heavy exact
    duplication — including within-group (J=1) pairs, cross-group
    near-dups, directional containment orientation, and short docs with
    empty shingle sets (which must never pair)."""
    from janus_spark.datapipe.dedup import containment_join, jaccard_similarity_join

    base = {
        "t1": "the quick brown fox jumps over the lazy dog again and again",
        "t2": "the quick brown fox jumps over the lazy dog again and often",
        "t3": "entirely different words about completely other topics here now",
        "sub": "fox jumps over the lazy",  # contained in t1/t2
        "tiny": "too short",  # < k tokens -> whole text as one shingle
    }
    rows = []
    i = 0
    for key, text in base.items():
        copies = {"t1": 4, "t2": 3, "t3": 2, "sub": 3, "tiny": 2}[key]
        for _ in range(copies):
            rows.append((i, text))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for kwargs in ({"prefix_filter": True}, {"prefix_filter": False}):
        fast = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_similarity_join(
                df, threshold=0.3, collapse_exact=True, **kwargs
            ).collect()
        }
        slow = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_similarity_join(
                df, threshold=0.3, collapse_exact=False, **kwargs
            ).collect()
        }
        assert fast == slow and len(fast) > 10

    cfast = {
        (r["a"], r["b"]): (r["containment_a_in_b"], r["containment_b_in_a"])
        for r in containment_join(df, threshold=0.9, collapse_exact=True).collect()
    }
    cslow = {
        (r["a"], r["b"]): (r["containment_a_in_b"], r["containment_b_in_a"])
        for r in containment_join(df, threshold=0.9, collapse_exact=False).collect()
    }
    assert cfast == cslow and len(cfast) > 10
    # directional orientation survives expansion: sub (later ids) is
    # contained in t1 (earlier ids), so b-in-a = 1.0 on those pairs
    t1_ids, sub_ids = range(0, 4), range(9, 12)
    for a in t1_ids:
        for b in sub_ids:
            assert cfast[(a, b)][1] == 1.0
    # sub-k-token docs shingle to the whole text, so identical tiny docs
    # pair with each other (J = 1) but with nothing else
    tiny_ids = {12, 13}
    tiny_pairs = {(a, b) for a, b in fast if a in tiny_ids or b in tiny_ids}
    assert tiny_pairs == {(12, 13)} and fast[(12, 13)] == 1.0


def test_temperature_mix_flattens_distribution(spark):
    from janus_spark.datapipe.sampling import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(i + 10_000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, budget=200, alpha=0.5).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    # sqrt temperature: shares ∝ sqrt(900):sqrt(100) = 3:1 instead of 9:1
    assert 120 <= got["big"] <= 180
    assert 30 <= got["small"] <= 70
    # alpha=1 keeps natural proportions (~180:20)
    nat = temperature_mix(df, budget=200, alpha=1.0).groupBy("source").count().collect()
    nat = {r["source"]: r["count"] for r in nat}
    assert nat["big"] > 2.5 * got["small"] and nat["small"] < got["small"]


def test_temperature_mix_deterministic_and_capped(spark):
    from janus_spark.datapipe.sampling import temperature_mix

    rows = [(i, "a") for i in range(50)] + [(i + 1000, "b") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in temperature_mix(df, budget=300).collect())
    b = sorted(r["doc_id"] for r in temperature_mix(df, budget=300).collect())
    assert a == b  # md5 draw: identical across runs
    # a tiny source whose fair share exceeds its size is kept whole (rate capped at 1)
    kept_a = [d for d in a if d < 1000]
    assert len(kept_a) == 50


def test_bigram_logprob_ranks_word_salad_below_fluent(spark):
    from janus_spark.datapipe.text import bigram_logprob

    fluent = "the cat sat on the mat " * 5
    salad = "mat the on sat cat the cat mat on the sat mat on cat the sat on mat cat sat the mat cat on"
    df = spark.createDataFrame(
        [(1, fluent.strip()), (2, salad), (3, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert 3 not in out  # < 2 tokens → no bigrams → dropped
    # same unigram vocabulary, but the salad's bigrams are rare
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_pq_codes_shape_and_determinism(spark, embs):
    from janus_spark.datapipe import similarity

    cbs = similarity.pq_train(embs, m=4, k_codes=16)
    assert len(cbs) == 4 and all(len(cb) == 16 for cb in cbs)
    assert all(len(c) == 16 for cb in cbs for c in cb)  # 64-dim / 4 subspaces
    enc = embs.select(
        "vec_id", similarity.pq_codes(F.col("embedding"), cbs).alias("codes")
    )
    rows = enc.collect()
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert all(again[r["vec_id"]] == r["codes"] for r in rows)  # RNG-free


def test_pq_rerank_recall_monotone_and_lloyd_helps(spark, embs):
    """Recall@5 vs exact cosine grows monotonically with the rerank
    width, and Lloyd-refined codebooks beat the raw coreset.  The
    fixture embeddings are near-random (PQ's worst case — no cluster
    structure), so absolute recall is modest by design; everything here
    is RNG-free, so the assertions are deterministic."""
    from janus_spark.datapipe import similarity

    queries = embs.where("vec_id < 10")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in exact}

    def recall(rerank, codebooks):
        out = similarity.pq_topk(
            embs, queries, k=5, m=4, k_codes=16, codebooks=codebooks, rerank=rerank
        ).collect()
        return len(truth & {(r["query_id"], r["vec_id"]) for r in out}) / len(truth)

    raw = similarity.pq_train(embs, m=4, k_codes=16)
    r0, r50, r150 = recall(0, raw), recall(50, raw), recall(150, raw)
    assert r0 <= r50 <= r150
    assert r150 >= 0.5  # 30%-of-corpus rerank floor on the fixture
    refined = similarity.pq_train(embs, m=4, k_codes=16, iters=3)
    assert recall(100, refined) >= recall(100, raw)


def test_novelty_scores_order_sensitive(spark):
    from janus_spark.datapipe.text import novelty_scores

    rows = [
        (1, "alpha beta gamma delta epsilon"),      # first: all novel
        (2, "alpha beta gamma delta epsilon"),       # exact copy: 0 novel
        (3, "alpha beta gamma zeta eta theta iota"), # partial overlap
        (4, "one two three four five"),              # disjoint: all novel
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["novelty"] for r in novelty_scores(df).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.0
    assert 0.0 < out[3] < 1.0
    assert out[4] == 1.0


def test_ivfadc_probe_all_matches_pq(spark, embs):
    """nprobe = n_cells degrades IVFADC to plain PQ ADC over the whole
    corpus — the correctness anchor tying the composition to its parts."""
    from janus_spark.datapipe import similarity

    queries = embs.where("vec_id < 5")
    pq = similarity.pq_topk(embs, queries, k=5, m=4, k_codes=16).collect()
    ivfadc = similarity.ivfadc_topk(
        embs, queries, k=5, n_cells=16, nprobe=16, m=4, k_codes=16
    ).collect()
    key = lambda rs: sorted((r["query_id"], r["vec_id"], r["rank"]) for r in rs)
    assert key(ivfadc) == key(pq)


def test_ivfadc_rerank_recall(spark, embs):
    from janus_spark.datapipe import similarity

    queries = embs.where("vec_id < 10")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in exact}
    out = similarity.ivfadc_topk(
        embs, queries, k=5, n_cells=16, nprobe=8, m=4, k_codes=16, rerank=100
    ).collect()
    hit = len(truth & {(r["query_id"], r["vec_id"]) for r in out}) / len(truth)
    assert hit >= 0.3  # probe-half + wide rerank floor on the random fixture


def test_datapipe_cli_with_temperature_mix(spark, tmp_path, capsys):
    import json

    from janus_spark.__main__ import main

    rc = main([
        "datapipe", "--sf-dir", "/root/testdata/sf0.001",
        "--mix-budget", "20", "--mix-alpha", "0.5",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < summary["after_temperature_mix"] <= summary["after_exact_dedup"]
    assert summary["curated_docs"] == summary["after_temperature_mix"]


def test_ivfadc_residual_full_probe_rerank_is_exact(spark, embs):
    """probe-all + rerank-over-everything reduces residual IVFADC to
    exact cosine regardless of code quality — the anchor that ties the
    residual path's plumbing (cells, residuals, codes, shortlist) to
    ground truth."""
    from janus_spark.datapipe import similarity

    queries = embs.where("vec_id < 3")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    out = similarity.ivfadc_topk(
        embs, queries, k=5, n_cells=8, nprobe=8, m=4, k_codes=16,
        residual=True, rerank=10_000,
    ).collect()
    key = lambda rs: sorted((r["query_id"], r["vec_id"], r["rank"]) for r in rs)
    assert key(out) == key(exact)


def test_ivfadc_residual_helps_with_trained_centroids(spark, embs):
    """With Lloyd-refined coarse centroids the residuals are smaller than
    the raw vectors, so residual codes carry less quantization error —
    ADC recall must not degrade versus raw-vector codes.  (With raw
    coreset centroids residuals are LARGER — x minus an arbitrary vector
    — which is why residual=False is the default for iters=0 use.)
    Deterministic fixture, so the comparison is stable."""
    from janus_spark.datapipe import similarity

    queries = embs.where("vec_id < 10")
    exact = similarity.cosine_topk(embs, queries, k=5).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in exact}
    cents = similarity.ivf_train(embs, 16, iters=3)

    def recall(residual):
        out = similarity.ivfadc_topk(
            embs, queries, k=5, n_cells=16, nprobe=8, m=4, k_codes=16,
            centroids=cents, residual=residual,
        ).collect()
        return len(truth & {(r["query_id"], r["vec_id"]) for r in out}) / len(truth)

    assert recall(True) >= recall(False)


def test_corpus_report_dominant_language(spark):
    from janus_spark.datapipe.text import corpus_report

    rows = [
        (1, "a b c", "en", "web"), (2, "d e", "en", "web"), (3, "f", "de", "web"),
        (4, "g h i j", "fr", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in corpus_report(df).collect()}
    web = out["web"]
    assert web["n_docs"] == 3 and web["total_tokens"] == 6 and web["n_langs"] == 2
    assert web["top_lang"] == "en" and abs(web["top_lang_share"] - 2 / 3) < 1e-6
    assert out["books"]["top_lang_share"] == 1.0


def test_pq_permutation_balances_subspace_variance(spark):
    import random

    from janus_spark.datapipe.similarity import apply_permutation, pq_permutation

    # anisotropic: dims 0-7 carry all the signal, the rest are near-zero
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-10, 10) if d < 8 else rng.uniform(-0.1, 0.1) for d in range(32)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    perm = pq_permutation(df, m=4)
    assert sorted(perm) == list(range(32))

    def subspace_energy(d):
        from pyspark.sql import functions as F

        var_rows = (
            d.select(F.posexplode("embedding").alias("pos", "x"))
            .groupBy("pos").agg(F.var_samp("x").alias("v")).collect()
        )
        v = {r["pos"]: r["v"] for r in var_rows}
        sums = [sum(v[p] for p in range(j * 8, (j + 1) * 8)) for j in range(4)]
        return max(sums) - min(sums)

    spread_id = subspace_energy(df)
    spread_perm = subspace_energy(apply_permutation(df, perm))
    # identity packs all 8 hot dims into subspace 0; the permutation
    # spreads them 2 per subspace
    assert spread_perm < spread_id / 5


def test_pq_permutation_improves_recall_on_anisotropic_data(spark, sf_dir):
    import random

    from pyspark.sql import functions as F

    from janus_spark.datapipe.similarity import apply_permutation, pq_permutation, pq_topk

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-10, 10) if d < 8 else rng.uniform(-0.05, 0.05) for d in range(32)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 8")

    def recall(frame, q):
        got = pq_topk(frame, q, k=10, m=4, k_codes=16)
        exact = {}
        rows_ = frame.collect()
        qs = {r["vec_id"]: r["embedding"] for r in q.collect()}
        import math

        def cos(a, b):
            na = math.sqrt(sum(x * x for x in a)) or 1.0
            nb = math.sqrt(sum(x * x for x in b)) or 1.0
            return sum(x * y for x, y in zip(a, b)) / na / nb

        for qid, qv in qs.items():
            sims = sorted(
                ((cos(qv, r["embedding"]), r["vec_id"]) for r in rows_ if r["vec_id"] != qid),
                reverse=True,
            )
            exact[qid] = {v for _, v in sims[:10]}
        hits = total = 0
        for r in got.collect():
            if r["query_id"] in exact:
                total += 1
                hits += r["vec_id"] in exact[r["query_id"]]
        return hits / max(total, 1)

    perm = pq_permutation(df, m=4)
    r_id = recall(df, queries)
    r_perm = recall(apply_permutation(df, perm), apply_permutation(queries, perm))
    assert r_perm >= r_id  # balancing never hurts on this anisotropy


def test_incremental_dedup_across_batches_and_restart(spark, sf_dir, tmp_path):
    from janus_spark.datapipe.dedup import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "fp_store")
    b1 = docs.where("doc_id < 100")
    fresh1 = incremental_dedup(b1, store)
    n1 = fresh1.count()
    assert n1 <= 100  # in-batch dupes collapse too
    # batch 2 overlaps batch 1 (same texts, shifted ids) + genuinely new docs
    b2 = docs.where("doc_id < 150").withColumn("doc_id", F.col("doc_id") + 10_000)
    fresh2 = incremental_dedup(b2, store)
    ids2 = {r["doc_id"] for r in fresh2.select("doc_id").collect()}
    # everything with text already in the store is dropped; only texts of
    # docs 100-149 (modulo in-corpus dupes) survive
    texts1 = {r["text"] for r in b1.select("text").collect()}
    surviving_texts = {
        r["text"] for r in docs.where("doc_id >= 100 AND doc_id < 150").collect()
        if r["text"] not in texts1
    }
    assert len(ids2) <= len(surviving_texts) + 1
    # replay batch 2 wholesale (a restart / at-least-once redelivery):
    # nothing is fresh anymore
    fresh3 = incremental_dedup(b2, store)
    assert fresh3.count() == 0


def test_incremental_minhash_equals_single_shot(spark, sf_dir, tmp_path):
    """Feeding the corpus through the maintained near-dup store in
    id-monotone batches yields the SAME survivor set as the single-shot
    drop rule (corpus minus the b-side of minhash_lsh_pairs)."""
    from janus_spark.datapipe.dedup import incremental_minhash_dedup, minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id < 60")
    mutated = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    dropped_full = {
        r["b"]
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.5, hash_fn="md5")
        .select("b").collect()
    }
    store = str(tmp_path / "mh_store")
    got = set()
    for lo, hi in ((0, 30), (30, 60), (1000, 2000)):
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        s = incremental_minhash_dedup(batch, store, hash_fn="md5")
        got |= {r["doc_id"] for r in s.select("doc_id").collect()}
    assert dropped_full, "fixture must exercise real near-dup drops"
    assert got == all_ids - dropped_full


def test_incremental_minhash_dropped_docs_still_block(spark, tmp_path):
    """Near-dup is not transitive: B ~ A (B dropped) and C ~ B but
    C !~ A must still drop C — i.e. dropped documents' signatures stay
    in the store and block future near-copies."""
    from janus_spark.datapipe.dedup import incremental_minhash_dedup, minhash_lsh_pairs

    # token sets (shingle_k=1): J(A,B) = J(B,C) = 4/8 = 0.5, J(A,C) = 0.2.
    # The "w26_" prefix is chosen so the deterministic md5-family LSH
    # banding (16 perms / 4 bands) collides on BOTH qualifying pairs —
    # J = 0.5 collides with p ≈ 0.23 per pair, so most prefixes exercise
    # nothing (searched offsets 0..400: 26 is the first that works).
    a = " ".join(f"w26_{i}" for i in range(1, 7))
    b = " ".join(f"w26_{i}" for i in range(3, 9))
    c = " ".join(f"w26_{i}" for i in range(5, 11))
    corpus = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    pairs = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            corpus, jaccard_threshold=0.5, shingle_k=1, hash_fn="md5"
        ).select("a", "b").collect()
    }
    # precondition: LSH banding (deterministic md5 family) finds both pairs
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs
    store = str(tmp_path / "mh_store")
    surv = set()
    for i in (1, 2, 3):
        s = incremental_minhash_dedup(
            corpus.where(F.col("doc_id") == i), store, shingle_k=1, hash_fn="md5"
        )
        surv |= {r["doc_id"] for r in s.collect()}
    assert surv == {1}  # B dropped via A; C dropped via the DROPPED B


def test_incremental_minhash_new_ids_same_content_dropped(spark, sf_dir, tmp_path):
    """Re-ingesting the same content under fresh ids (a crawler re-crawl)
    drops the whole second batch against the store."""
    from janus_spark.datapipe.dedup import incremental_minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id < 40")
    store = str(tmp_path / "mh_store")
    first = incremental_minhash_dedup(docs.select("doc_id", "text"), store, hash_fn="md5")
    n1 = first.count()
    assert n1 > 0
    again = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    second = incremental_minhash_dedup(again, store, hash_fn="md5")
    assert second.count() == 0


def test_shuffle_shard_deterministic_and_total(spark, sf_dir):
    """Shard/pos assignment is identical across partitionings, pos is
    contiguous 1..|shard| within every shard, and a different seed
    produces a genuinely different order."""
    from janus_spark.datapipe.sampling import shuffle_shard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shard(docs, 8, seed=1).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shard(docs.repartition(3), 8, seed=1).collect()}
    assert a == b and len(a) == docs.count()
    by_shard = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    c = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shard(docs, 8, seed=2).collect()}
    assert c != a  # epoch re-seed reshuffles


def test_incremental_minhash_differential_random_corpora(spark, tmp_path):
    """Hypothesis-style differential net (fixed seeds for runtime): on
    random small-vocab corpora and random id-monotone batch splits, the
    maintained store's survivor set equals the single-shot drop rule."""
    import random

    from janus_spark.datapipe.dedup import incremental_minhash_dedup, minhash_lsh_pairs

    for case in range(4):
        rng = random.Random(1000 + case)
        vocab = [f"v{case}_{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9))))
            for i in range(24)
        ]
        corpus = spark.createDataFrame(rows, ["doc_id", "text"])
        dropped_full = {
            r["b"]
            for r in minhash_lsh_pairs(
                corpus, jaccard_threshold=0.5, shingle_k=1, hash_fn="md5"
            ).select("b").collect()
        }
        cut1 = rng.randint(1, 22)
        cut2 = rng.randint(cut1 + 1, 23)
        store = str(tmp_path / f"mh_store_{case}")
        got = set()
        for lo, hi in ((0, cut1), (cut1, cut2), (cut2, 24)):
            s = incremental_minhash_dedup(
                corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
                store, shingle_k=1, hash_fn="md5",
            )
            got |= {r["doc_id"] for r in s.collect()}
        assert got == set(range(24)) - dropped_full, (case, cut1, cut2)


def test_shuffle_shard_no_global_sort_in_plan(spark, sf_dir):
    """The canonical-order rank must be a per-shard window — a plan that
    funnels the corpus through a single partition (global sort /
    unpartitioned window) would deadlock the operator at 100 TB."""
    from janus_spark.datapipe.sampling import shuffle_shard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    plan = shuffle_shard(docs, 8, seed=1)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan and "hashpartitioning(shard" in plan, plan


def test_bpe_learn_merges_matches_reference(spark):
    """Distributed BPE merge learning reproduces a plain-Python reference
    implementation (same tie rule: max count, then lexical pair order)."""
    from janus_spark.datapipe.text import bpe_learn_merges

    corpus = ["low lower lowest", "new newer newest", "low new low"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])

    # reference implementation
    def ref_merges(texts, k):
        words = [list(w) for t in texts for w in t.lower().split()]
        out = []
        for _ in range(k):
            counts = {}
            for w in words:
                for a, b in zip(w, w[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + 1
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))[0]
            out.append(best)
            merged = []
            for w in words:
                nw, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                        nw.append(w[i] + w[i + 1])
                        i += 2
                    else:
                        nw.append(w[i])
                        i += 1
                merged.append(nw)
            words = merged
        return out

    got = bpe_learn_merges(df, 6)
    assert got == ref_merges(corpus, 6)


def test_char_pair_counts_hand_check(spark):
    from janus_spark.datapipe.text import char_pair_counts

    df = spark.createDataFrame([("aba ab x",)], ["text"])
    out = {r["pair"]: r["n"] for r in char_pair_counts(df).collect()}
    # 'aba' -> ab, ba ; 'ab' -> ab ; 'x' too short
    assert out == {"ab": 2, "ba": 1}


def test_validate_rules_hand_check(spark):
    from janus_spark.datapipe.validate import validate

    df = spark.createDataFrame(
        [(1, "a", 5.0, "x1"), (2, "a", 50.0, "x2"), (None, "q", 7.0, "bad"),
         (2, None, None, "x3")],
        "id long, code string, v double, tag string",
    )
    parents = spark.createDataFrame([(1,), (3,)], "pid long")
    out = {
        (r["rule"], r["column"]): (r["n_violations"], r["passed"])
        for r in validate(
            df,
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("in_set", "code", ["a", "b"]),
                ("in_range", "v", 0.0, 10.0),
                ("matches", "tag", "^x[0-9]$"),
                ("foreign_key", "id", parents, "pid"),
            ],
        ).collect()
    }
    assert out[("not_null", "id")] == (1, False)
    assert out[("unique", "id")] == (1, False)          # id=2 twice
    assert out[("in_set", "code")] == (1, False)        # 'q'
    assert out[("in_range", "v")] == (1, False)         # 50.0 (null passes)
    assert out[("matches", "tag")] == (1, False)        # 'bad'
    assert out[("foreign_key", "id")] == (2, False)     # both id=2 rows


def test_validate_rejects_unknown_rule(spark):
    import pytest

    from janus_spark.datapipe.validate import validate

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate(df, [("positive", "id")])


def test_line_dedup_drops_all_occurrences_and_reassembles(spark):
    from janus_spark.datapipe.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nBOILERPLATE FOOTER\nunique two"),
            (2, "other text\nBOILERPLATE FOOTER"),
            (3, "solo document"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["kept_lines"] == 2
    assert out[1]["clean_text"] == "unique one\nunique two"
    # the duplicated line is dropped from EVERY doc, not kept-first
    assert out[2]["kept_lines"] == 1 and out[2]["clean_text"] == "other text"
    assert out[3]["kept_lines"] == 1 and out[3]["clean_text"] == "solo document"


def test_line_dedup_short_line_exemption_and_empty_survival(spark):
    from janus_spark.datapipe.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "ok\nSHARED LINE"), (2, "ok\nSHARED LINE"), (3, "ok")],
        "doc_id long, text string",
    )
    # min_chars=3 exempts "ok" (len 2) from removal despite 3 occurrences
    out = {r["id"]: r for r in line_dedup(docs, min_chars=3).collect()}
    assert out[3]["clean_text"] == "ok"
    assert out[1]["clean_text"] == "ok" and out[1]["kept_lines"] == 1
    # fully-boilerplate doc survives with kept_lines=0, clean_text=''
    out2 = {r["id"]: r for r in line_dedup(docs, min_chars=1).collect()}
    assert out2[3]["n_lines"] == 1 and out2[3]["kept_lines"] == 0
    assert out2[3]["clean_text"] == ""


def test_leakage_safe_split_never_straddles_clusters(spark):
    # near-dup pairs must land on the same side of the split — the whole
    # point of splitting by cluster representative instead of doc id
    from janus_spark.datapipe.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "a long, b long"
    )
    clusters = dedup_clusters(pairs)
    got = {r["id"]: r["keep_id"] for r in clusters.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    # and the gate's invariant end-to-end at sf0.001
    from janus_spark.queries import QUERIES

    out = QUERIES["q_split_leakage_safe"](spark, "/root/testdata/sf0.001")
    side = {r["doc_id"]: (r["cluster_rep"], r["split"]) for r in out.collect()}
    by_rep = {}
    for rep, split in side.values():
        by_rep.setdefault(rep, set()).add(split)
    assert all(len(s) == 1 for s in by_rep.values())
    assert any(rep != d for d, (rep, _) in side.items())  # non-trivial clusters exist


def test_line_dedup_null_text_and_regex_special_sep(spark):
    from janus_spark.datapipe.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "a.SHARED.b"), (2, "x.SHARED"), (3, None)], "doc_id long, text string"
    )
    out = {r["id"]: r for r in line_dedup(docs, sep=".", min_chars=2).collect()}
    assert out[1]["clean_text"] == "a.b"  # '.' treated literally, not regex-any
    assert out[2]["clean_text"] == "x"
    # null text survives as an empty document
    assert out[3]["n_lines"] == 1 and out[3]["clean_text"] == ""


def test_dedup_clusters_local_equals_distributed(spark, monkeypatch):
    """The bounded local union-find and the distributed label-propagation
    path must produce the identical fixed point (keep_id = component
    min) on a random graph with chains, cliques, and singleton pairs."""
    import random

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(0, 40)]                 # long chain
    edges += [(100 + a, 100 + b) for a in range(8) for b in range(a + 1, 8)]
    edges += [(rng.randint(200, 260), rng.randint(200, 260)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["a", "b"])
    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "1000000")
    local = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "0")  # force distributed
    dist = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert local == dist and local  # same assignment, non-empty


def test_dedup_clusters_distributed_path_still_converges(spark, monkeypatch):
    """Pin the >threshold path: with the local solve disabled, the
    propagation loop must still reach the component-min fixed point."""
    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "0")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30)], ["a", "b"])
    out = dedup.dedup_clusters(pairs).collect()
    assert all(r["keep_id"] == 0 for r in out)


def test_dedup_clusters_string_ids_local(spark):
    pairs = spark.createDataFrame([("b", "c"), ("a", "b")], ["a", "b"])
    out = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}


def test_dedup_clusters_nonconvergence_raises(spark, monkeypatch):
    """VERDICT r7 #3: exhausting max_iterations with labels still moving
    must raise, not silently return a split clustering.  A 3-chain
    (0-1-2) on the forced-distributed path needs more than one round for
    node 2 to learn label 0, so max_iterations=1 must fail loudly."""
    import pytest

    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "0")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, max_iterations=1)
    # sanity: enough rounds converges fine on the same input
    out = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {0: 0, 1: 0, 2: 0}


def test_dedup_clusters_null_ids_both_tiers_agree(spark, monkeypatch):
    """ADVICE r7: null endpoints used to TypeError on the local tier but
    silently drop on the distributed tier.  Now both tiers filter them
    above the split and agree."""
    pairs = spark.createDataFrame(
        [(None, 1), (1, 2), (3, None), (None, None), (4, 5)],
        "a int, b int",
    )
    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "1000000")
    local = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    monkeypatch.setenv("JANUS_LOCAL_CC_EDGES", "0")
    dist = {r["id"]: r["keep_id"] for r in dedup.dedup_clusters(pairs).collect()}
    assert local == dist == {1: 1, 2: 1, 4: 4, 5: 4}


def test_duplicate_spans_cross_doc_and_merging(spark):
    """Two docs sharing a 10-token run with k=4: flagged starts 0..6 in
    the shared region merge into ONE maximal span per doc; unique text
    is never flagged."""
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique1 text1 here1 now1"),
            (2, f"other2 words2 first2 {shared}"),
            (3, "totally different content with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    }
    # doc 1: shared run at tokens 0..9; doc 2: at tokens 3..12
    assert out == {1: (0, 9, 10), 2: (3, 12, 10)}


def test_duplicate_spans_intra_doc_repeat(spark):
    """min_count counts ALL occurrences, including a doc repeating its
    own k-gram: both copies are flagged."""
    docs = spark.createDataFrame(
        [(1, "x y z w middle1 middle2 x y z w")],
        "doc_id long, text string",
    )
    out = sorted(
        (r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    )
    assert out == [(0, 3), (6, 9)]


def test_duplicate_spans_distinct_islands(spark):
    """Two separated duplicated regions in one doc stay TWO spans (the
    gap between flagged starts exceeds k)."""
    docs = spark.createDataFrame(
        [
            (1, "p q r s gapA gapB gapC gapD gapE t u v w"),
            (2, "p q r s other filler words here xx t u v w"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    }
    assert spans == {(1, 0, 3), (1, 9, 12), (2, 0, 3), (2, 9, 12)}


def test_duplicate_spans_short_docs_skipped(spark):
    """Docs shorter than k tokens produce no grams and never crash."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "")],
        "doc_id long, text string",
    )
    assert dedup.duplicate_spans(docs, k=4).collect() == []


def test_duplicate_spans_verify_mode(spark, monkeypatch):
    """verify=True adds an exact gram-equality pass so a hash collision
    can't flag unique text.  Forcing ALL grams onto one hash value (the
    worst-case collision) makes verify=False flag every position, while
    verify=True recovers exactly the hash-free answer."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d unique1 only2 here3 now4"),
            (2, "x y z a b c d w"),
        ],
        "doc_id long, text string",
    )
    honest = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    }
    assert honest == {(1, 0, 3), (2, 3, 6)}
    monkeypatch.setattr(
        dedup, "shared_hash64", lambda col, seed=None: F.lit(0).cast("long")
    )
    collided_raw = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(docs, k=4).collect()
    }
    assert collided_raw != honest  # unique text falsely flagged
    collided_verified = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(docs, k=4, verify=True).collect()
    }
    assert collided_verified == honest


def test_cut_duplicate_spans_keep_first(spark):
    """The globally-first occurrence (min (doc_id, pos)) survives; every
    other copy is cut; untouched and empty docs pass through."""
    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (2, f"other2 words2 first2 {shared}"),
            (1, f"{shared} unique1 text1 here1 now1"),
            (3, "totally different content with no repeats at all"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tok"], r["kept_tok"], r["clean_text"])
        for r in dedup.cut_duplicate_spans(docs, k=4).collect()
    }
    assert out[1] == (14, 14, f"{shared} unique1 text1 here1 now1")
    assert out[2] == (13, 3, "other2 words2 first2")
    assert out[3][0] == out[3][1] == 8
    assert out[4] == (0, 0, "")


def test_cut_duplicate_spans_intra_doc(spark):
    """A doc repeating its own gram keeps only the first copy — the
    min-(id,pos) rule applies within a document too."""
    docs = spark.createDataFrame(
        [(7, "x y z w middle1 middle2 x y z w")],
        "doc_id long, text string",
    )
    [r] = dedup.cut_duplicate_spans(docs, k=4).collect()
    assert (r["n_tok"], r["kept_tok"]) == (10, 6)
    assert r["clean_text"] == "x y z w middle1 middle2"


def test_cut_duplicate_spans_verify_mode(spark, monkeypatch):
    """verify=True applies the exact gram-equality pass on the cut path
    as well: under a forced total hash collision the default would cut
    unique text, verify mode cuts only true duplicates."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d unique1 only2 here3 now4"),
            (2, "x y z a b c d w"),
        ],
        "doc_id long, text string",
    )
    honest = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.cut_duplicate_spans(docs, k=4).collect()
    }
    assert honest == {
        1: "a b c d unique1 only2 here3 now4",
        2: "x y z w",
    }
    monkeypatch.setattr(
        dedup, "shared_hash64", lambda col, seed=None: F.lit(0).cast("long")
    )
    collided = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.cut_duplicate_spans(docs, k=4, verify=True).collect()
    }
    assert collided == honest


def test_cut_duplicate_spans_is_doc_scale(spark):
    """The apply step must never shuffle token rows: no exchange may
    partition on (id, pos) — covered positions aggregate to one array
    per doc and the cut is in-array surgery (VERDICT r9 'Next round'
    #3; the old plan anti-joined every corpus token)."""
    import re

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l a b c d e f m n")],
        "doc_id long, text string",
    )
    plan = (
        dedup.cut_duplicate_spans(docs, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",")[:-1]}
        assert cols != {"id", "pos"}, f"token-scale exchange: {m.group(0)}"


# ---------------------------------------------------- domain mixture
def test_largest_remainder_exact_invariants():
    """Allocations are exact integers summing to the budget (or total
    capacity), respect caps, and are deterministic with documented
    tie-breaks (larger remainder first, then name ascending)."""
    from janus_spark.datapipe.sampling import largest_remainder as lr

    assert lr([("a", 1), ("b", 1), ("c", 1)], 10) == {"a": 4, "b": 3, "c": 3}
    assert lr([("a", 3), ("b", 3)], 7) == {"a": 4, "b": 3}  # tie -> 'a'
    got = lr([("a", 5), ("b", 1)], 12, caps={"a": 4})
    assert got == {"a": 4, "b": 8}  # freed budget re-apportioned
    got = lr([("a", 5), ("b", 1), ("c", 1)], 14, caps={"a": 2, "b": 3})
    assert got["a"] == 2 and got["b"] == 3 and got["c"] == 9
    # budget beyond capacity: caps filled, surplus unspent
    assert lr([("a", 1), ("b", 1)], 100, caps={"a": 3, "b": 4}) == {
        "a": 3, "b": 4,
    }
    assert lr([("a", 0), ("b", 2)], 7) == {"a": 0, "b": 7}
    assert lr([], 5) == {}
    import pytest as _pt

    with _pt.raises(ValueError):
        lr([("a", -1)], 5)
    with _pt.raises(ValueError):
        lr([("a", 1), ("a", 2)], 5)


def test_largest_remainder_hypothesis_sum():
    from hypothesis import given, settings, strategies as st

    from janus_spark.datapipe.sampling import largest_remainder as lr

    @settings(max_examples=50, deadline=None)
    @given(
        ws=st.lists(st.integers(0, 9), min_size=1, max_size=8),
        budget=st.integers(0, 500),
        cap=st.integers(0, 30),
    )
    def check(ws, budget, cap):
        names = [f"d{i}" for i in range(len(ws))]
        target = list(zip(names, ws))
        if sum(ws) == 0:
            return
        uncapped = lr(target, budget)
        assert sum(uncapped.values()) == budget
        capped = lr(target, budget, caps={names[0]: cap})
        assert capped[names[0]] <= cap
        if any(w > 0 for _, w in target[1:]):
            # uncapped domains absorb whatever the cap frees
            assert sum(capped.values()) == budget
        else:
            # the capped domain is the only positive weight
            assert sum(capped.values()) == min(budget, cap)

    check()


def test_domain_mixture_matches_python_and_is_scale_free(spark):
    """The in-engine apportionment equals the pure-python reference;
    the allocation ignores availability (only n_avail varies with the
    corpus) and absent target domains surface n_avail=0."""
    from janus_spark.datapipe.sampling import domain_mixture, largest_remainder

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    target = [("src0", 3), ("src1", 1), ("src2", 1), ("ghost", 2)]
    rows = {
        r["source"]: (r["n_avail"], r["alloc"])
        for r in domain_mixture(docs, target, 50).collect()
    }
    py = largest_remainder(target, 50)
    assert {k: v[1] for k, v in rows.items()} == py
    assert rows["ghost"] == (0, py["ghost"])
    assert sum(v[1] for v in rows.values()) == 50
    # doubling the corpus changes n_avail only
    rows2 = {
        r["source"]: r["alloc"]
        for r in domain_mixture(docs.union(docs), target, 50).collect()
    }
    assert rows2 == {k: v[1] for k, v in rows.items()}


def test_mixture_sample_honors_allocation_and_order_free(spark):
    """Per-domain counts equal min(alloc, avail); the winner set is
    invariant under input row order and partitioning."""
    from janus_spark.datapipe.sampling import (
        domain_mixture,
        largest_remainder,
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(40)], "doc_id long, source string"
    )
    target = [("src0", 8), ("src1", 1), ("src2", 1)]  # src3 not targeted
    py = largest_remainder(target, 20)
    out = mixture_sample(docs, target, 20)
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    avail = 10  # each src has 10 docs
    assert got == {k: min(v, avail) for k, v in py.items() if min(v, avail) > 0}
    ids = sorted(r["doc_id"] for r in out.collect())
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(7)
    ids2 = sorted(
        r["doc_id"] for r in mixture_sample(shuffled, target, 20).collect()
    )
    assert ids == ids2


def test_unimax_is_capped_equal_weight_apportionment(spark):
    """The closed-form integer water-filling in unimax_allocations must
    equal what the iterative largest_remainder converges to for equal
    weights + caps, on arbitrary count/budget shapes (including
    budget > capacity, single domain, and cap-tie knife edges)."""
    from hypothesis import given, settings, strategies as st

    from janus_spark.datapipe.sampling import (
        largest_remainder,
        unimax_allocations,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        ns=st.lists(st.integers(1, 9), min_size=1, max_size=5),
        budget=st.integers(0, 60),
        me=st.integers(1, 3),
    )
    def check(ns, budget, me):
        rows, rid = [], 0
        for d, n in enumerate(ns):
            for _ in range(n):
                rows.append((rid, f"d{d}"))
                rid += 1
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {
            r["source"]: r["alloc"]
            for r in unimax_allocations(df, budget, me).collect()
        }
        ref = largest_remainder(
            [(f"d{d}", 1) for d in range(len(ns))],
            budget,
            caps={f"d{d}": n * me for d, n in enumerate(ns)},
        )
        assert got == ref
        assert sum(got.values()) == min(budget, sum(ns) * me)

    check()


def test_mixture_sample_tokens_prefix_and_boundary(spark):
    """Kept docs form a contiguous prefix of each domain's hash order
    (tok_before chains exactly), the last kept doc STARTS under the
    domain's token allocation, and the first excluded doc would not."""
    from janus_spark.datapipe.sampling import (
        largest_remainder,
        mixture_sample_tokens,
    )

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", "w " * (3 + i % 5)) for i in range(30)],
        "doc_id long, source string, text string",
    )
    target = [("src0", 2), ("src1", 1), ("src2", 1)]
    budget = 40
    py = largest_remainder(target, budget)
    out = mixture_sample_tokens(docs, target, budget)
    bysrc = {}
    for r in out.collect():
        bysrc.setdefault(r["source"], []).append((r["tok_before"], r["n_tok"]))
    assert set(bysrc) <= set(py)
    for s, lst in bysrc.items():
        lst.sort()
        total = 0
        for tb, n in lst:
            assert tb == total  # contiguous prefix, no gaps
            total += n
        last_start = lst[-1][0]
        assert last_start < py[s]  # last kept doc starts in budget
        assert total >= py[s] or total == sum(
            n for _, n in lst
        )  # either filled (possibly straddling) or domain exhausted
    # order/partition independence
    ids = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample_tokens(
            docs.orderBy(F.desc("doc_id")).repartition(5), target, budget
        ).collect()
    )
    assert ids == ids2


def test_quota_prefiltered_identical_both_paths(spark):
    """quota_sample_prefiltered must equal quota_sample exactly on BOTH
    paths: generous ratio (pre-cut retains everything needed) and
    ratio=1 with tiny strata (rescue path forced — retention < n)."""
    from janus_spark.datapipe.sampling import (
        quota_sample,
        quota_sample_prefiltered,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(200)] + [(1000, "lone")],
        "doc_id long, source string",
    )
    plain = sorted(
        (r["doc_id"], r["source"])
        for r in quota_sample(docs, 4).select("doc_id", "source").collect()
    )
    for ratio in (1, 3, 50):
        fast = sorted(
            (r["doc_id"], r["source"])
            for r in quota_sample_prefiltered(docs, 4, ratio=ratio)
            .select("doc_id", "source")
            .collect()
        )
        assert fast == plain, ratio
    # order/partition independence of the prefiltered plan
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(9)
    fast2 = sorted(
        (r["doc_id"], r["source"])
        for r in quota_sample_prefiltered(shuffled, 4, ratio=2)
        .select("doc_id", "source")
        .collect()
    )
    assert fast2 == plain


def test_quota_prefiltered_rescues_zero_survivor_stratum(spark):
    """A stratum whose EVERY row hashes above the pre-filter threshold
    leaves zero survivors — it is then absent from the survivor counts,
    and an inner join there would silently drop the whole stratum
    instead of rescuing it (ADVICE r9, medium).  Construct exactly that
    stratum by sieving keys against the same md5 prefix the engine
    compares, and pin prefiltered == plain."""
    import hashlib

    from janus_spark.datapipe.sampling import (
        _HASH_SPACE,
        quota_sample,
        quota_sample_prefiltered,
    )

    n, ratio, cnt = 2, 1, 40
    # the engine's threshold: floor(least(1, ratio*n/cnt) * 16^8) in hex
    thr = format(int(min(1.0, float(ratio * n) / cnt) * _HASH_SPACE), "08x")

    def h(k):
        return hashlib.md5((str(k) + ":quota").encode()).hexdigest()[:8]

    unlucky, k = [], 0
    while len(unlucky) < cnt:
        if h(k) >= thr:
            unlucky.append(k)
        k += 1
    rows = [(i, "unlucky") for i in unlucky] + [
        (10_000 + i, "normal") for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sorted(
        (r["doc_id"], r["source"])
        for r in quota_sample(docs, n).select("doc_id", "source").collect()
    )
    fast = sorted(
        (r["doc_id"], r["source"])
        for r in quota_sample_prefiltered(docs, n, ratio=ratio)
        .select("doc_id", "source")
        .collect()
    )
    assert fast == plain
    assert sum(1 for _, s in fast if s == "unlucky") == n


def _sieve_keys(n, salt, thr_hex, below=0, start=0):
    """First ``n`` integer keys whose md5 prefix is >= ``thr_hex`` under
    ``salt`` (plus ``below`` keys strictly under it) — deterministic
    construction of a domain whose pre-filter survivor count is exactly
    ``below``."""
    import hashlib

    def h(k):
        return hashlib.md5((str(k) + salt).encode()).hexdigest()[:8]

    above, under, k = [], [], start
    while len(above) < n or len(under) < below:
        (under if h(k) < thr_hex else above).append(k)
        k += 1
    return above[:n] + under[:below]


def test_mixture_prefiltered_identical_both_paths(spark):
    """mixture_sample_prefiltered must equal mixture_sample exactly on
    every path: generous ratio, ratio=1 (rescue likely), and a sieved
    domain whose pre-filter keeps ZERO rows (rescue forced through the
    zero-survivor branch)."""
    from janus_spark.datapipe.sampling import (
        _HASH_SPACE,
        largest_remainder,
        mixture_sample,
        mixture_sample_prefiltered,
    )

    target = [("unlucky", 1), ("normal", 1)]
    budget = 4
    alloc = largest_remainder(target, budget)  # 2 each
    # engine rate for the unlucky domain at ratio=1: alloc / n_avail
    thr = format(int(min(1.0, float(alloc["unlucky"]) / 40) * _HASH_SPACE), "08x")
    unlucky = _sieve_keys(40, ":mixsample", thr)
    rows = [(k, "unlucky") for k in unlucky] + [
        (10_000 + i, "normal") for i in range(40)
    ] + [(20_000 + i, "ignored") for i in range(10)]  # untargeted domain
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sorted(
        (r["doc_id"], r["source"])
        for r in mixture_sample(docs, target, budget).collect()
    )
    assert sum(1 for _, s in plain if s == "unlucky") == alloc["unlucky"]
    for ratio in (1, 3, 50):
        fast = sorted(
            (r["doc_id"], r["source"])
            for r in mixture_sample_prefiltered(
                docs, target, budget, ratio=ratio
            ).collect()
        )
        assert fast == plain, ratio
    # order/partition independence
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(9)
    fast2 = sorted(
        (r["doc_id"], r["source"])
        for r in mixture_sample_prefiltered(
            shuffled, target, budget, ratio=2
        ).collect()
    )
    assert fast2 == plain


def test_mixture_tokens_prefiltered_identical_both_paths(spark):
    """mixture_sample_tokens_prefiltered must equal mixture_sample_tokens
    exactly, including tok_before, on: generous ratio, a sieved domain
    with ZERO survivors, and a sieved domain whose survivors exist but
    carry fewer tokens than the allocation (the token-shortfall rescue,
    which the doc-count condition alone would miss)."""
    from janus_spark.datapipe.sampling import (
        _HASH_SPACE,
        mixture_sample_tokens,
        mixture_sample_tokens_prefiltered,
    )

    target = [("zero", 1), ("partial", 1), ("normal", 1)]
    budget = 18  # 6 tokens per domain; docs are 3 tokens each
    # engine rate at ratio=1: alloc_tokens / domain_total_tokens = 6/120
    thr = format(int(min(1.0, 6.0 / 120.0) * _HASH_SPACE), "08x")
    zero = _sieve_keys(40, ":mixtok", thr)
    partial = _sieve_keys(39, ":mixtok", thr, below=1, start=100_000)
    rows = (
        [(k, "zero", "w w w") for k in zero]
        + [(k, "partial", "w w w") for k in partial]
        + [(200_000 + i, "normal", "w w w") for i in range(40)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    key = lambda r: (r["doc_id"], r["source"], r["n_tok"], r["tok_before"])
    plain = sorted(key(r) for r in mixture_sample_tokens(docs, target, budget).collect())
    # each domain fills its 6-token allocation with 2 docs
    assert len(plain) == 6
    for ratio in (1, 4, 50):
        fast = sorted(
            key(r)
            for r in mixture_sample_tokens_prefiltered(
                docs, target, budget, ratio=ratio
            ).collect()
        )
        assert fast == plain, ratio
    # order/partition independence
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(9)
    fast2 = sorted(
        key(r)
        for r in mixture_sample_tokens_prefiltered(
            shuffled, target, budget, ratio=1
        ).collect()
    )
    assert fast2 == plain


def test_prefiltered_samplers_scan_budget(spark):
    """The prefiltered scale paths must not multiply corpus scans: the
    final plan reads the corpus exactly TWICE (survivor count +
    rescue-fused filter pass) — the model frames are checkpointed and
    the anti/semi rescue pair is fused into one where() (r10; the first
    cut showed 9-10 parquet scans from per-consumer re-evaluation)."""
    from janus_spark.datapipe.sampling import (
        mixture_sample_prefiltered,
        mixture_sample_tokens_prefiltered,
        quota_sample_prefiltered,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = [("web", 2), ("wiki", 1), ("books", 1)]
    for name, out in (
        ("quota", quota_sample_prefiltered(docs, 5, ratio=3)),
        ("mixture", mixture_sample_prefiltered(docs, target, 50, ratio=3)),
        (
            "mixture_tokens",
            mixture_sample_tokens_prefiltered(docs, target, 500, ratio=3),
        ),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        scans = plan.count("Scan parquet")
        assert scans <= 2, f"{name}: {scans} corpus scans\n{plan[:2000]}"
        assert "BroadcastExchange" in plan  # rates/rescue ride broadcasts


def test_domain_mixture_rejects_duplicate_domains(spark):
    """A duplicated target domain would join into duplicate rows and
    silently over-allocate the budget — reject it like
    largest_remainder does (ADVICE r9, low)."""
    import pytest

    from janus_spark.datapipe.sampling import domain_mixture

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        domain_mixture(docs, [("a", 1), ("a", 2)], 10)
