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

from tiflow_spark.functions.similarity import cosine_expr
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


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Candidates = pairs sharing ≥1 shingle (equi-join on shingle — the
    blocking step; a pair sharing nothing has Jaccard 0 and is skipped
    without ever being formed). Then |∩| via the join count and
    |∪| = |A|+|B|−|∩|. Shuffles on shingle and on (a,b) pair keys only.
    """
    sh = _doc_shingles(docs, n)
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
    rows = k // bands
    sig = minhash_signatures(docs, k, n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id",
        *[F.col(f"mh{i}") for i in range(k)],
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bnd"),
    ).select("doc_id", *[f"mh{i}" for i in range(k)], "bnd.band_idx", "bnd.band_hash")

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[
                (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int").alias(f"eq{i}")
                for i in range(k)
            ],
        )
        .distinct()  # a pair may share several bands
    )
    match_count = sum(F.col(f"eq{i}") for i in range(k))
    return cand.select(
        "doc_a",
        "doc_b",
        match_count.cast("int").alias("matching_minhashes"),
        (match_count / F.lit(float(k))).alias("est_jaccard"),
    )


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


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ t via pigeonhole blocking:
    t < 4 differing bits cannot touch all 4 chunks, so every true pair
    shares ≥1 exact 16-bit chunk — candidates come from 4 chunk-equality
    joins (union), then the exact Hamming check runs per candidate."""
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
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["chunk_idx", "chunk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may share several chunks
    )


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.98, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by ``block_col`` (a coarse
    cluster id — here the IVF cell) so the candidate space is per-block
    quadratic, not corpus-quadratic."""
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, on=[F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                      F.col("a.vec_id") < F.col("b.vec_id")])
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
