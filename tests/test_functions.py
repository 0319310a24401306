"""Unit tests for the training-data pipeline functions: planted-duplicate
recovery, ANN sanity, text metrics, multimodal plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tiflow_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    """Tiny corpus with planted exact + near duplicates."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    other = "completely different content about spark shuffles and partitions here"
    rows = [
        (0, base),
        (1, base),        # exact dup of 0
        (2, near),        # near dup of 0 (one token changed)
        (3, other),
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_groups_finds_planted_dup(docs):
    out = {r["text_hash"]: r for r in dedup.exact_groups(docs).collect()}
    sizes = sorted(r["n_copies"] for r in out.values())
    assert sizes == [1, 1, 1, 2]
    dup = next(r for r in out.values() if r["n_copies"] == 2)
    assert dup["keeper_doc_id"] == 0  # keep-first


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0       # exact dup → jaccard 1
    assert (0, 2) in pairs            # near dup detected
    assert 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs        # unrelated not paired


def test_minhash_lsh_estimates(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs[(0, 1)]["matching_minhashes"] == 16  # exact dup: all match
    assert pairs[(0, 1)]["est_jaccard"] == 1.0
    if (0, 2) in pairs:  # near-dup may or may not clear a full band
        assert pairs[(0, 2)]["matching_minhashes"] < 16


def test_simhash_exact_dup_is_hamming_zero(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    near = pairs.get((0, 2))
    assert near is not None and near <= 10


def test_simhash_partition_invariance(docs, spark):
    one = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dedup.simhash_pairs(docs.coalesce(1)).collect()}
    many = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in dedup.simhash_pairs(docs.repartition(7)).collect()}
    assert one == many


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),   # near 0
        (2, [0.0, 1.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0], 1),
        (4, [0.0, 0.1, 0.99], 1),   # near 3
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_orders_by_cosine(emb):
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_ivf_topk_respects_cells(emb):
    out = similarity.ivf_topk(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    assert {r["neighbor_id"] for r in out} == {1, 2}  # only label-0 cell probed


def test_ivf_centroids_shape(emb):
    cents = similarity.ivf_centroids(emb).collect()
    assert len(cents) == 2
    c0 = next(r for r in cents if r["label"] == 0)["centroid"]
    assert len(c0) == 3
    assert abs(c0[0] - (1.0 + 0.99) / 3) < 1e-6


def test_text_stats_counts(spark):
    docs = spark.createDataFrame([(1, "a bb ccc a")], "doc_id long, text string")
    r = text.text_stats(docs).collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_distinct"] == 3
    assert r["ttr_permille"] == 750
    assert r["max_token_len"] == 3
    assert r["n_chars"] == 10
    assert r["bpe_est_tokens"] == 3  # ceil(10/4)
    assert r["bpe_regex_tokens"] == 4  # letter runs: a, bb, ccc, a
    r2 = text.text_stats(
        spark.createDataFrame([(2, "it's 42%!")], "doc_id long, text string")
    ).collect()[0]
    # it, ', s, 4, 2, %! — digits one-per-token, punct runs fused
    assert r2["bpe_regex_tokens"] == 6


def test_langid_self_consistent(spark):
    rows = [(i, "alpha beta gamma", "aa") for i in range(5)] + [
        (i + 10, "uno dos tres", "bb") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = text.langid_predictions(docs, top_k=3).collect()
    assert all(r["pred_lang"] == r["lang"] for r in out)


def test_fingerprints_bag_invariant_to_order(spark):
    docs = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a"), (3, "a x y")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.fingerprints(docs).collect()}
    assert out[1]["bag_fp"] == out[2]["bag_fp"]       # order-insensitive
    assert out[1]["exact_fp"] != out[2]["exact_fp"]   # raw differs
    assert out[1]["bag_fp"] != out[3]["bag_fp"]


def test_multimodal_meta_matches_hashlib(spark):
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    r = multimodal.extract_media_meta(multimodal.binary_media(docs)).collect()[0]
    assert r["n_bytes"] == 11
    assert r["first_byte"] == ord("h")
    assert r["sha16"] == hashlib.sha256(b"hello world").hexdigest()[:16]
    assert r["frame_count"] == 0


def test_multimodal_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")


def test_connected_components_chain_and_islands(spark):
    from tiflow_spark.functions.graph import connected_components, resolve_clusters

    # chain 1-2-3-4 (diameter 3), pair {10,11}, singleton 99 (only in docs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    cc = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]],
                                 "doc_id long")
    res = resolve_clusters(docs, pairs).collect()
    rows = {r.doc_id: r for r in res}
    assert rows[99].cluster_id == 99 and rows[99].is_keeper
    assert rows[99].cluster_size == 1
    assert rows[4].cluster_id == 1 and not rows[4].is_keeper
    assert rows[1].is_keeper and rows[1].cluster_size == 4
    # exactly one keeper per cluster
    keepers = [r for r in res if r.is_keeper]
    assert len(keepers) == len({r.cluster_id for r in res})


def test_connected_components_driver_and_distributed_agree(spark):
    """The union-find cutover (edges ≤ driver_threshold) and the hash-min
    label propagation must produce identical (node, cluster_id) maps."""
    import random

    from tiflow_spark.functions.graph import connected_components

    rng = random.Random(13)
    # random graph: 200 nodes, 150 edges — mix of chains, cliques, islands
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    via_driver = {
        r.node: r.cluster_id
        for r in connected_components(pairs, driver_threshold=10**6).collect()
    }
    via_dist = {
        r.node: r.cluster_id
        for r in connected_components(
            pairs, driver_threshold=0, max_iter=60
        ).collect()
    }
    assert via_driver == via_dist
    assert via_driver  # non-empty


def test_jaccard_prefix_filter_lossless_and_tighter(spark):
    from tiflow_spark.functions.dedup import (
        _doc_shingles,
        _jaccard_candidates,
        ngram_jaccard_pairs,
    )

    # every doc shares one hot trigram; only 0/1 are truly near-dup
    hot = "the quick fox"
    rows = [(0, f"{hot} alpha beta gamma delta one"),
            (1, f"{hot} alpha beta gamma delta two")]
    rows += [(i, f"{hot} unique{i} u{i}a u{i}b u{i}c u{i}d") for i in range(2, 22)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = sorted(
        (r.doc_a, r.doc_b, r.n_inter, r.jaccard)
        for r in ngram_jaccard_pairs(docs, prefix_filter=False).collect()
    )
    pref = sorted(
        (r.doc_a, r.doc_b, r.n_inter, r.jaccard)
        for r in ngram_jaccard_pairs(docs, prefix_filter=True).collect()
    )
    assert pref == exact and any(a == 0 and b == 1 for a, b, *_ in pref)

    sh = _doc_shingles(docs, 3)
    naive = _jaccard_candidates(sh, 0.5, prefix_filter=False).count()
    filtered = _jaccard_candidates(sh, 0.5, prefix_filter=True).count()
    # hot shingle makes naive quadratic (all 231 pairs); prefixes hold only
    # rare shingles, so the hot block vanishes
    assert naive == 22 * 21 // 2
    assert filtered < naive / 10


def test_simhash_block_guard_lossless(spark):
    from tiflow_spark.functions.dedup import simhash_pairs

    # near-identical docs (small hamming) + filler sharing vocabulary so
    # chunk blocks actually repeat
    rows = [(0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta")]
    rows += [(i, f"alpha beta filler{i % 3} gamma x{i}") for i in range(2, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    normal = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3, block_cap=10**9).collect()
    )
    guarded = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3, block_cap=0).collect()
    )
    # cap=0 forces EVERY block through the secondary sub-band path — output
    # must be identical (the guard is lossless)
    assert guarded == normal


def test_kmeans_recovers_clusters_and_fresh_dedup(spark):
    """k-means on a WELL-SEPARATED synthetic corpus (the driver's stored
    embeddings are deliberately near-orthogonal — label is not a geometric
    cluster there): 3 orthogonal cluster axes + small noise; farthest-first
    init + Lloyd's must recover the partition exactly, and fresh-corpus
    dedup blocking (learned cells) must equal stored-label blocking."""
    import numpy as np

    from tiflow_spark.functions.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_fresh,
    )
    from tiflow_spark.functions.similarity import assign_cells, kmeans_fit

    rng = np.random.default_rng(7)
    dim, per = 8, 20
    rows = []
    for c in range(3):
        base = np.zeros(dim)
        base[c] = 1.0
        for j in range(per):
            v = base + 0.08 * rng.standard_normal(dim)
            v = v / np.linalg.norm(v)
            rows.append((c * per + j, [float(x) for x in v], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    true = {r[0]: r[2] for r in rows}

    assigned, cents = kmeans_fit(emb, k=3, max_iter=8)
    got = {r.vec_id: r.cell for r in assigned.collect()}
    mapping = {}
    for vid, cell in got.items():
        mapping.setdefault(cell, set()).add(true[vid])
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len(mapping) == 3

    # assignment against the learned codebook is stable (home cell = own)
    home = {r.vec_id: r.cell for r in
            assign_cells(emb, cents, nprobe=1, cell_col="cell").collect()}
    assert home == got

    # fresh-corpus dedup == label-blocked dedup once cells == labels
    want = sorted(
        (r.vec_a, r.vec_b, r.cos)
        for r in embedding_dup_pairs(emb, threshold=0.9).collect()
    )
    fresh = sorted(
        (r.vec_a, r.vec_b, r.cos)
        for r in embedding_dup_pairs_fresh(emb, threshold=0.9, k=3).collect()
    )
    assert fresh == want and len(want) > 100


def test_incremental_minhash_matches_full_restricted(docs):
    """new×(base∪new) pairs must equal the full-corpus pair set restricted
    to pairs touching the batch — and never contain a base×base pair."""
    new = docs.filter(F.col("doc_id").isin(0, 4))
    base = docs.filter(~F.col("doc_id").isin(0, 4))
    inc = {(r["doc_a"], r["doc_b"]): r["matching_minhashes"]
           for r in dedup.incremental_minhash_pairs(base, new).collect()}
    full = {(r["doc_a"], r["doc_b"]): r["matching_minhashes"]
            for r in dedup.minhash_lsh_pairs(docs).collect()}
    expected = {k: v for k, v in full.items() if k[0] in (0, 4) or k[1] in (0, 4)}
    assert inc == expected
    assert all(a in (0, 4) or b in (0, 4) for a, b in inc)


def test_minhash_index_persist_and_match(spark, docs, tmp_path):
    """Index the base corpus, then match an arriving batch containing an
    exact dup of an indexed doc and a dup of another batch doc."""
    idx_path = str(tmp_path / "mh_index")
    base = docs.filter(F.col("doc_id") <= 3)
    idx = dedup.MinHashIndex(idx_path, k=16, bands=4, n=3)
    idx.add(base)

    base_text = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    batch = spark.createDataFrame(
        [(10, base_text), (11, "fresh unseen content nothing like it"),
         (12, "fresh unseen content nothing like it")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["matching_minhashes"]
             for r in idx.match(spark, batch).collect()}
    assert pairs[(0, 10)] == 16      # batch vs indexed corpus
    assert pairs[(1, 10)] == 16      # 1 is an exact dup of 0 in the index
    assert pairs[(11, 12)] == 16     # intra-batch dup
    assert all(a >= 10 or b >= 10 for a, b in pairs)  # never base×base

    # reopen: parameters come from the meta file, appends accumulate
    idx2 = dedup.MinHashIndex(idx_path)
    assert (idx2.k, idx2.bands, idx2.n) == (16, 4, 3)
    idx2.add(batch)
    assert idx2.banded(spark).select("doc_id").distinct().count() == 7

    # intra-batch matching can be turned off: only corpus hits remain
    only_corpus = dedup.MinHashIndex(idx_path + "_b", k=16, bands=4, n=3)
    only_corpus.add(base)
    p2 = {(r["doc_a"], r["doc_b"])
          for r in only_corpus.match(spark, batch, include_intra_batch=False).collect()}
    assert (11, 12) not in p2 and (0, 10) in p2


def test_bmp_pixel_codec_roundtrip_and_resize():
    """decode_bmp/encode_bmp round-trip byte-exactly on non-constant pixel
    data (padding, bottom-up rows, BGR order all exercised), and
    nearest-neighbor resize picks exact source pixels."""
    import numpy as np

    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    blob = multimodal.encode_bmp(pix)
    back = multimodal.decode_bmp(blob)
    assert np.array_equal(back, pix)
    assert multimodal.encode_bmp(back) == blob
    # header fields readable by the existing header decoder
    meta = multimodal.decode_media_header(blob)
    assert (meta["fmt"], meta["width"], meta["height"]) == ("bmp", 7, 5)
    small = multimodal.resize_nearest(pix, 3, 2)
    assert small.shape == (2, 3, 3)
    ys = (np.arange(2) * 5) // 2
    xs = (np.arange(3) * 7) // 3
    assert np.array_equal(small, pix[ys][:, xs])
    with pytest.raises(ValueError):  # payload-less header-only BMP
        multimodal.decode_bmp(multimodal.make_bmp(4, 4))
    bad = bytearray(multimodal.make_bmp(4, 4, (1, 2, 3)))
    bad[28] = 8  # biBitCount = 8
    with pytest.raises(NotImplementedError):
        multimodal.decode_bmp(bytes(bad))


def test_video_split_and_frame_sample(spark):
    """split_video walks frames by bfSize; frame_sample decodes every 2nd
    frame with exact per-frame constant colors; a desynced container
    raises instead of yielding garbage."""
    import numpy as np

    frames = [multimodal.make_bmp(6, 3, (10 + f, 20 + f, 30 + f)) for f in range(4)]
    video = b"".join(frames)
    parts = multimodal.split_video(video)
    assert parts == frames
    with pytest.raises(ValueError, match="desync"):
        multimodal.split_video(video[:-3])

    docs = spark.createDataFrame([(7,), (8,)], "doc_id long")
    out = multimodal.frame_sample(
        multimodal.synthesize_video(docs), stride=2
    ).collect()
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in out}
    # doc 7: 1 + 7%5 = 3 frames -> sampled {0, 2}; doc 8: 4 frames -> {0, 2}
    assert set(by_key) == {(7, 0), (7, 2), (8, 0), (8, 2)}
    r = by_key[(7, 2)]
    assert (r["width"], r["height"]) == (8 + 7 % 8, 4 + 7 % 4)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
        (7 + 2) % 256, (7 * 3 + 2) % 256, (7 * 5 + 2) % 256
    )


def test_pii_redact_counts_and_masks(spark):
    docs = spark.createDataFrame([(42, "plain words only")], "doc_id long, text string")
    r = text.pii_redact(docs).collect()[0]
    # the synthetic augmentation plants exactly one of each PII kind
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    red = r["redacted"]
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    assert "@example.com" not in red
    assert "+1-555-" not in red
    assert "10.42." not in red
    assert red.startswith("plain words only Contact ")
    assert red.endswith(" ok")


def test_repetition_scores_planted(spark):
    # "x y x y x y" : top 2-gram "x y" count=3, len=3, nc=11 -> floor(9000/11)=818
    docs = spark.createDataFrame([(1, "x y x y x y")], "doc_id long, text string")
    r = text.repetition_scores(docs).collect()[0]
    assert r["top2_permille"] == 818
    # top 3-gram "x y x" count=2 (overlapping), len=5 -> floor(10000/11)=909
    assert r["top3_permille"] == 909
    # 5-grams: "x y x y x" x1, "y x y x y" x1 -> no dup
    assert r["dup5_permille"] == 0
    # fully repeated text -> duplicated 5-grams dominate
    docs2 = spark.createDataFrame([(2, "a a a a a a a a")], "doc_id long, text string")
    r2 = text.repetition_scores(docs2).collect()[0]
    assert r2["dup5_permille"] == 1000


def test_decontamination_flags_shared_shingles(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    contaminated = "intro words then alpha beta gamma delta epsilon closing"
    clean = "totally unrelated tokens with no overlap at all here"
    rows = [(0, bench_text), (1, contaminated), (2, clean), (7, "more bench stuff here now ok")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.decontamination(docs, bench_mod=7, n=5).collect()}
    # bench docs (0, 7) are excluded from the output
    assert set(out) == {1, 2}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1  # one shared 5-gram
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
