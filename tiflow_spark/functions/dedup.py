"""Deduplication operators over the documents/embeddings corpus.

Five strategies, each with a distinct scale profile:

- exact:        one hash-groupBy shuffle on md5(text); map-side combine.
- ngram-jaccard: candidate generation by shared-shingle self-join (blocked),
                 exact Jaccard on the candidates only.
- minhash-LSH:  k seeded MinHashes → b bands → candidates share a band
                 bucket; the shuffle is on tiny band signatures, never on
                 full shingle sets — the 100 TB path.
- simhash:      32-bit signed-projection signature; Hamming-≤-t pairs found
                 by pigeonhole band blocking (t<4 ⇒ some 8-bit chunk equal).
- embedding:    cosine near-dup within coarse blocks (label/IVF cell) so the
                 pair space is |block|² not |corpus|².

All signatures are built from md5-derived hashes (functions/hashing.py) so
every pipeline is bit-reproducible in any engine — the DuckDB oracle
recomputes them exactly. No Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions import similarity as _similarity
from tiflow_spark.functions.text import shingles_expr


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the input across all cores when the source has fewer
    input files than the cluster has slots (a small-file artifact of local
    tests: one parquet file → one task, so a per-row-heavy projection would
    run on one core). At corpus scale the scan's own input splits already
    exceed the slot count and this is a no-op.

    Uses ``df.inputFiles()`` (metadata-only, Connect-safe) instead of
    ``df.rdd.getNumPartitions()``, which forces an RDD conversion plan."""
    try:
        n = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext — skip the local fix-up
        return df
    files = df.inputFiles()
    return df.repartition(n) if 0 < len(files) < n else df


def exact_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by content hash; keeper = min doc_id (stable
    keep-first under any partitioning). Output one row per distinct text."""
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


def _doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        docs.select("doc_id", F.explode(shingles_expr("text", n)).alias("shingle"))
        .distinct()
    )


def _jaccard_candidates(
    sh: DataFrame, threshold: float, prefix_filter: bool
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs for Jaccard ≥ threshold.

    prefix_filter=False: pairs sharing ANY shingle — a high-document-
    frequency shingle ("it is a") forms a quadratic candidate block; fine
    at test scale, a scale-killer on a real corpus. Kept as the reference
    blocking for equivalence tests.
    """
    if not prefix_filter:
        return (
            sh.alias("a")
            .join(sh.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    packed = _packed_shingles(sh, threshold)
    prefix = packed.select("doc_id", F.explode("prefix_sh").alias("shingle"))
    return (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _packed_shingles(sh: DataFrame, threshold: float) -> DataFrame:
    """One row per doc: (doc_id, sh_set, n_sh, prefix_sh).

    prefix_sh is the PPJoin blocking prefix (Xiao et al. WWW'08 §3 —
    LOSSLESS for the threshold): shingles ordered by global
    (document-frequency ASC, shingle ASC), first ``|d| − ⌈t·|d|⌉ + 1``
    kept. Any pair with J ≥ t has |∩| ≥ ⌈t·|d|⌉ in both docs, so both
    prefixes must share an element — and prefixes are dominated by RARE
    shingles (high-df shingles sort last and fall out of every prefix), so
    hot-shingle quadratic candidate blocks disappear without dropping a
    single true pair.

    Plan shape: df-count aggregate (shuffle on shingle, map-side combined),
    join df back (colocated — the aggregate's output is already hashed on
    shingle), re-pack per doc (shuffle on doc_id), then ordering + prefix
    slice IN-ROW via array_sort — no windows, one pass over the shingles.
    The per-doc shingle dedupe happens in-row upstream (array_distinct), so
    ``sh`` carries no shuffle in its lineage and rescanning it is cheap.
    """
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    packed = (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("df", "shingle")).alias("_dfsh"),
            F.count("*").alias("n_sh"),
        )
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    return packed.select(
        "doc_id",
        F.transform(F.array_sort("_dfsh"), lambda x: x["shingle"]).alias("sh_set"),
        "n_sh",
        F.transform(
            F.slice(F.array_sort("_dfsh"), F.lit(1), prefix_len.cast("int")),
            lambda x: x["shingle"],
        ).alias("prefix_sh"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Default (100 TB) path: pack each doc's shingle set + PPJoin prefix into
    ONE row (see ``_packed_shingles``), generate candidates by a self-join
    on exploded prefixes only, then verify each candidate IN-ROW with
    ``array_intersect`` against the two full sets — |∩| and |∪| never touch
    a shuffle, and a hot shingle cannot form a quadratic block. Output is
    identical to the naive shared-shingle blocking (prefix filtering is
    lossless for the threshold).
    """
    if not prefix_filter:
        return _ngram_jaccard_naive(_doc_shingles(docs, n), threshold)
    # in-row per-doc dedupe: no distinct shuffle, cheap to rescan
    sh = _spread(docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingles_expr("text", n))).alias("shingle"),
    )
    packed = _packed_shingles(sh, threshold).persist()
    prefix = packed.select("doc_id", F.explode("prefix_sh").alias("shingle"))
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = packed.select("doc_id", "sh_set", "n_sh")
    verified = (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("sh_set", "sh_a")
                  .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh_set", "sh_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "n_inter", "jaccard")


def _ngram_jaccard_naive(sh: DataFrame, threshold: float) -> DataFrame:
    """Reference formulation: shared-shingle blocking + join-count |∩|."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


MINHASH_P = 2_147_483_647  # 2^31 − 1 (Mersenne); a·h + b < 2^61 < long max


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutation family
    h_i(x) = (a_i·x + b_i) mod p — Knuth multiplicative constants, odd a."""
    return [
        ((2654435761 * (i + 1)) % MINHASH_P | 1, (40503 * (i + 13) + 97) % MINHASH_P)
        for i in range(k)
    ]


def minhash_signatures(docs: DataFrame, k: int = 16, n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per document.

    Base hash: ONE md5 per shingle, folded to a 30-bit int from two
    ascii-pairs of its hex (portable: identical in any ANSI engine with
    md5/ascii/substr — the DuckDB oracle recomputes it bit-exactly). The k
    permutations are then universal hashes (a·h + b) mod (2^31−1): integer
    multiply-add instead of k md5 calls per shingle — the asymptotic cost per
    shingle drops from k digests to one.

    Computed as a pure projection — ``array_min ∘ transform`` over the
    in-row shingle array (duplicate shingles cannot change a min, so no
    distinct is needed) — ZERO shuffles before LSH banding; the plan's first
    exchange is the constant-size band-key join (plus the round-robin
    ``_spread`` only when the local source is under-split)."""
    sh = _spread(docs).select("doc_id", shingles_expr("text", n).alias("sh"))

    def h30(s):
        # 30-bit int from hex chars 1-4 of md5: (pair1 % 2^14)·2^16 + pair2
        h = F.md5(s)
        p1 = F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
        p2 = F.ascii(F.substring(h, 3, 1)) * 256 + F.ascii(F.substring(h, 4, 1))
        return (F.pmod(p1, F.lit(16384)) * 65536 + p2).cast("long")

    hashed = sh.select("doc_id", F.transform("sh", h30).alias("hs"))

    def perm(a: int, b: int):
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P))

    cols = [
        F.array_min(F.transform("hs", perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return hashed.select("doc_id", *cols)


def minhash_banded(docs: DataFrame, k: int = 16, bands: int = 4, n: int = 3) -> DataFrame:
    """Signature rows exploded to one row per (doc, band):
    (doc_id, mh0..mh{k-1}, band_idx, band_hash). This IS the LSH index
    relation — persist it keyed on (band_idx, band_hash) and near-dup
    lookup becomes an equi-join."""
    rows = k // bands
    sig = minhash_signatures(docs, k, n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        *[F.col(f"mh{i}") for i in range(k)],
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bnd"),
    ).select("doc_id", *[f"mh{i}" for i in range(k)], "bnd.band_idx", "bnd.band_hash")


def _pairs_from_banded(left: DataFrame, right: DataFrame, k: int) -> DataFrame:
    """Candidate pairs from two banded relations: equi-join on the band key,
    canonicalize (doc_a < doc_b), estimate Jaccard from full-signature
    agreement. The mh-equality columns are symmetric, so a pair surfacing in
    both orientations (or via several bands) collapses in the distinct."""
    cand = (
        left.alias("a")
        .join(right.alias("b"), ["band_idx", "band_hash"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            *[
                (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int").alias(f"eq{i}")
                for i in range(k)
            ],
        )
        .distinct()
    )
    match_count = sum(F.col(f"eq{i}") for i in range(k))
    return cand.select(
        "doc_a",
        "doc_b",
        match_count.cast("int").alias("matching_minhashes"),
        (match_count / F.lit(float(k))).alias("est_jaccard"),
    )


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """MinHash + LSH banding: signature → b bands of k/b rows; a pair is a
    candidate iff some band signature matches. Estimated Jaccard =
    matching minhashes / k, exact in binary (k a power of two).

    The only wide exchange is on (band_idx, band_hash) — constant-size keys
    regardless of document length: the shuffle volume at 100 TB is
    O(docs × bands × 16 bytes), not O(corpus text).
    """
    banded = minhash_banded(docs, k, bands, n)
    return _pairs_from_banded(banded, banded, k)


def incremental_minhash_pairs(
    base: DataFrame, new: DataFrame, k: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """Incremental near-dup detection: match a NEW batch of documents
    against an already-ingested BASE corpus plus itself, without ever
    re-pairing base×base — the ingest-time dedup step of a training-data
    pipeline, where each arriving batch must be checked against everything
    already accepted.

    Cost is O(batch), not O(corpus): the base side contributes only its
    banded signature relation (the LSH index — 16 ints + a band key per
    doc·band, built once and in practice persisted via ``MinHashIndex``),
    and the join probes it with the batch's band keys. At 100 TB the index
    is stored bucketed on (band_idx, band_hash), so the corpus side never
    re-shuffles — only the new batch (small by construction) is hashed,
    exploded, and exchanged. Returns the same shape as
    ``minhash_lsh_pairs`` restricted to pairs with ≥1 new document:
    new×base ∪ new×new, never base×base.
    """
    banded_new = minhash_banded(new, k, bands, n)
    banded_all = minhash_banded(base, k, bands, n).unionByName(banded_new)
    return _pairs_from_banded(banded_new, banded_all, k)


SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """SimHash: 64-dimensional signed projection over token hashes.

    Dimensions 0-31 take the top bit of each hex digit of md5(t); dimensions
    32-63 the same from md5('x:' || t) (an independent seeded hash) — 64
    unbiased ±1 projections per token. Signature bit d = sign of the
    frequency-weighted sum over the document's tokens (the Charikar/Manku
    form: each occurrence contributes, so the signature reflects the term
    distribution, not just the vocabulary — essential when documents share a
    small vocabulary). Emitted as a 64-char '0'/'1' string plus 4 × 16-bit
    chunk keys for pigeonhole blocking. One explode + one groupBy; integer
    sums only (bit-deterministic at any parallelism).
    """
    bits = SIMHASH_BITS
    # 8-hex-char slices of each hash parsed once into 32-bit ints; per-bit
    # work is then a codegen'd shift+mask (the instr/substring formulation
    # costs ~128 string scans per token — this is the same bits ~10x cheaper)
    toks = _spread(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        *[
            F.conv(F.substring(F.md5("tok"), j * 8 + 1, 8), 16, 10)
            .cast("long").alias(f"c{j}")
            for j in range(4)
        ],
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit("x:"), F.col("tok"))), j * 8 + 1, 8),
                16, 10,
            ).cast("long").alias(f"c{j + 4}")
            for j in range(4)
        ],
    )

    def top_bit(d: int):
        # hex digit d of the concatenated (h1 || h2) digest: slice j holds
        # digits 8j..8j+7, most-significant first; the digit's high bit
        # (digit >= 8) sits at bit 4*(7 - pos) + 3 of the parsed slice
        j, pos = d // 8, d % 8
        return F.shiftright(F.col(f"c{j}"), 4 * (7 - pos) + 3).bitwiseAND(F.lit(1))

    aggs = [F.count("*").alias("n_toks")] + [
        F.sum(top_bit(d)).alias(f"p{d}") for d in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    # sign of sum(±1) = sign of 2*popcount - n
    sign = lambda d: (2 * F.col(f"p{d}") - F.col("n_toks") >= 0)  # noqa: E731
    fp = F.concat(
        *[F.when(sign(d), "1").otherwise("0") for d in range(bits)]
    ).alias("simhash")
    width = bits // SIMHASH_CHUNKS
    # chunks as INTs (bit 16c+j at weight 2^(15-j), matching the string's
    # left-to-right order): join keys and hamming stay integer-side —
    # popcount(xor) per chunk beats 64 per-char comparisons per candidate
    chunk_cols = [
        sum(
            F.when(sign(c * width + j), F.lit(1 << (width - 1 - j))).otherwise(0)
            for j in range(width)
        ).cast("int").alias(f"chunk{c}")
        for c in range(SIMHASH_CHUNKS)
    ]
    return sums.select("doc_id", fp, *chunk_cols)


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, block_cap: int = 4096
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ t via pigeonhole blocking:
    t < 4 differing bits cannot touch all 4 chunks, so every true pair
    shares ≥1 exact 16-bit chunk — candidates come from 4 chunk-equality
    joins (union), then the exact Hamming check runs per candidate.

    Skew guard (Manku et al. WWW'07 §3's extra permutation tables, in
    banded form): a popular 16-bit chunk value forms a quadratic candidate
    block at corpus scale. Blocks over ``block_cap`` docs are re-banded by a
    SECOND pigeonhole over the remaining 48 bits split into 4 × 12-bit
    sub-bands — ≤3 differing bits cannot touch all 4 sub-bands either, so a
    true pair in an oversized block still shares (chunk, sub-band) and the
    block's quadratic term drops by the sub-band fan-out. LOSSLESS: both
    paths over-generate candidates and the exact Hamming check prunes.
    """
    bits = SIMHASH_BITS
    sig = simhash_signatures(docs)
    # one banded self-join on (chunk_idx, chunk_value) — the same plan shape
    # as MinHash-LSH banding: a single constant-key-size exchange instead of
    # 4 chunk-joins unioned (which costs 4 joins and re-shuffles per branch)
    chunk_names = [f"chunk{c}" for c in range(SIMHASH_CHUNKS)]
    banded = sig.select(
        "doc_id",
        *chunk_names,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_idx"), F.col(f"chunk{c}").alias("chunk_val")
                )
                for c in range(SIMHASH_CHUNKS)
            ])
        ).alias("bnd"),
    ).select("doc_id", *chunk_names, "bnd.chunk_idx", "bnd.chunk_val")
    # hamming BEFORE distinct: popcount(xor) on the int chunks is 4 integer
    # ops per candidate, and the ≤ t filter shrinks the distinct's input from
    # |candidates| to |true pairs|
    hamming = sum(
        F.bit_count(
            F.col(f"a.chunk{c}").bitwiseXOR(F.col(f"b.chunk{c}"))
        )
        for c in range(SIMHASH_CHUNKS)
    )

    def pairs_from(blocked: DataFrame, keys: list[str]) -> DataFrame:
        return (
            blocked.alias("a")
            .join(blocked.alias("b"), keys)
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                hamming.cast("int").alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )

    # block size via a window over the banding key: ONE shuffle (reused by
    # the self-joins below via the cache) instead of aggregate + re-join.
    # PERSISTED: four join sides read this table; without the cache each
    # would re-run the token explode + 65-aggregate signature pipeline.
    from pyspark.sql.window import Window

    banded = banded.withColumn(
        "_blk", F.count("*").over(Window.partitionBy("chunk_idx", "chunk_val"))
    ).persist()
    small = banded.filter(F.col("_blk") <= block_cap)

    # oversized blocks: re-band on 12-bit sub-values of the OTHER 48 bits
    # (other chunks concatenated in index order, MSB first)
    width = bits // SIMHASH_CHUNKS
    other48 = None
    for c in range(SIMHASH_CHUNKS):
        rest = [j for j in range(SIMHASH_CHUNKS) if j != c]
        val = sum(
            F.shiftleft(
                F.col(f"chunk{j}").cast("long"), width * (len(rest) - 1 - i)
            )
            for i, j in enumerate(rest)
        )
        cond = F.col("chunk_idx") == c
        other48 = F.when(cond, val) if other48 is None else other48.when(cond, val)
    big = (
        banded.filter(F.col("_blk") > block_cap)
        .withColumn("_o48", other48)
        .select(
            "doc_id",
            *chunk_names,
            "chunk_idx",
            "chunk_val",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(s).alias("sub_idx"),
                        F.shiftright(F.col("_o48"), 36 - 12 * s)
                        .bitwiseAND(F.lit(0xFFF))
                        .alias("sub_val"),
                    )
                    for s in range(4)
                ])
            ).alias("sb"),
        )
        .select(
            "doc_id", *chunk_names, "chunk_idx", "chunk_val",
            "sb.sub_idx", "sb.sub_val",
        )
    )
    out = pairs_from(small, ["chunk_idx", "chunk_val"]).union(
        pairs_from(big, ["chunk_idx", "chunk_val", "sub_idx", "sub_val"])
    )
    return out.distinct()  # a pair may share several (sub-)bands/paths


def embedding_dup_pairs_fresh(
    emb: DataFrame, threshold: float = 0.98, k: int = 10, max_iter: int = 10
) -> DataFrame:
    """Embedding near-dup for a corpus with NO stored block/cluster column:
    train a k-means codebook (similarity.kmeans_fit — deterministic
    farthest-first init + Lloyd's), block by the learned cell, then the
    per-block quadratic pair scan. The full fresh-corpus path the stored
    ``label`` column short-circuits in ``embedding_dup_pairs``."""
    from tiflow_spark.functions.similarity import kmeans_fit

    assigned, _ = kmeans_fit(emb, k=k, max_iter=max_iter)
    blocked = emb.join(assigned, "vec_id")
    return embedding_dup_pairs(blocked, threshold, block_col="cell")


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.98, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by ``block_col`` (a coarse
    cluster id — here the IVF cell) so the candidate space is per-block
    quadratic, not corpus-quadratic."""
    # hoist the cast + norm to one projection per VECTOR: the block join is
    # pair-quadratic, so per-pair work drops from three 128-element
    # aggregates (dot + both norms) to the dot alone — bit-identical cos,
    # the hoisted subtrees are unchanged
    e = _similarity._with_vec(emb, ["vec_id", block_col])
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, on=[F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                      F.col("a.vec_id") < F.col("b.vec_id")])
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _similarity.dot_expr(F.col("a._demb"), F.col("b._demb"))
                / (F.col("a._norm") * F.col("b._norm")), 6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


class MinHashIndex:
    """Persisted LSH index over the banded-signature relation — the
    ingest-time incarnation of ``incremental_minhash_pairs``.

    Layout: ``<path>/banded/`` parquet partitioned by ``band_idx`` (one
    append per ingested batch), ``<path>/_index_meta.json`` pinning
    (k, bands, n) so every future batch hashes with the exact parameters
    the index was built with (a k or n drift would silently miss dups).

    Scale: the index holds k ints + a 32-char band hash per doc·band —
    ~200 bytes/doc at k=16/bands=4 — so a 100 TB corpus of 100 B docs
    indexes into ~20 TB of signatures, and each arriving batch probes it
    with an equi-join on (band_idx, band_hash). Partitioning by band_idx
    prunes 1/bands of the index per probe side; on a warehouse deployment
    the relation would additionally be stored bucketed on band_hash so the
    probe join never re-shuffles the index (only the new batch exchanges).
    ``add`` is append-only: ingesting a batch never rewrites prior
    signatures.
    """

    META = "_index_meta.json"

    def __init__(self, path: str, k: int = 16, bands: int = 4, n: int = 3):
        import json
        import os

        self.path = path
        self._banded_dir = os.path.join(path, "banded")
        meta_p = os.path.join(path, self.META)
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            self.k, self.bands, self.n = meta["k"], meta["bands"], meta["n"]
        else:
            os.makedirs(path, exist_ok=True)
            self.k, self.bands, self.n = k, bands, n
            tmp = meta_p + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"k": k, "bands": bands, "n": n}, f)
            os.rename(tmp, meta_p)

    def add(self, docs: DataFrame) -> None:
        """Hash + band a batch and append it to the index."""
        minhash_banded(docs, self.k, self.bands, self.n).write.partitionBy(
            "band_idx"
        ).mode("append").parquet(self._banded_dir)

    def banded(self, spark) -> DataFrame:
        import os

        if not os.path.exists(self._banded_dir):
            raise FileNotFoundError(f"empty index at {self.path} — add() first")
        return spark.read.parquet(self._banded_dir)

    def match(
        self, spark, new_docs: DataFrame, include_intra_batch: bool = True
    ) -> DataFrame:
        """Near-dup pairs between ``new_docs`` and everything indexed
        (plus, by default, within the batch itself). The caller decides
        what to do with matches — typically drop the new duplicates, then
        ``add()`` the survivors."""
        banded_new = minhash_banded(new_docs, self.k, self.bands, self.n)
        right = self.banded(spark)
        if include_intra_batch:
            right = right.unionByName(banded_new)
        return _pairs_from_banded(banded_new, right, self.k)
