"""Text analysis over the documents corpus — all JVM-side column expressions.

Scale notes (100 TB): every function here is a narrow per-row projection
(no shuffle at all) except ``langid_predictions``, which is one small
aggregation (vocab-sized, broadcastable) plus one exploded join that Catalyst
broadcasts; token explosion is bounded by document length and never
materializes per-row Python objects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles_expr(text_col: str = "text", n: int = 3) -> Column:
    """Word n-gram shingles as an array column (for MinHash / Jaccard).

    Pure SQL transform over a token sequence — no UDF, vectorized."""
    return F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality/statistics projection:

    - whitespace token count + distinct-token count,
    - type-token ratio (integerized: permille, exact in any engine),
    - max token length, char count,
    - BPE-ish subword estimate: ceil(chars / 4) — the standard ~4 chars/token
      heuristic for byte-pair encoders (computed without a tokenizer model).
    """
    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.floor(
            F.lit(1000.0) * F.size(F.array_distinct(toks)) / F.size(toks)
        ).cast("long").alias("ttr_permille"),
        F.expr("aggregate(transform(split(text,' '), t -> length(t)), 0, (a,x) -> greatest(a,x))")
        .cast("int").alias("max_token_len"),
        F.length("text").cast("long").alias("n_chars"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("bpe_est_tokens"),
        # BPE-ish pretokenizer count: the GPT-2 pattern simplified to the
        # Java-regex ∩ RE2 subset (letter runs / single digits / punct runs
        # — digits split one-per-token as modern BPE vocabularies do)
        F.size(F.regexp_extract_all(
            "text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"), 0
        )).cast("long").alias("bpe_regex_tokens"),
    )


def lang_profiles(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus-trained language profiles: the ``top_k`` most frequent tokens
    per language, ranked by (count desc, token asc) for determinism.

    Tiny output (langs × top_k) — always broadcast into the scorer.
    """
    from pyspark.sql.window import Window

    tok_counts = (
        docs.select("lang", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    return (
        tok_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("lang", "tok")
    )


def langid_predictions(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """N-gram-profile language ID (Cavnar–Trenkle style, token-level):
    score(doc, lang) = # of the doc's token occurrences present in the
    language's top-k profile; prediction = argmax with (score desc, lang asc)
    tiebreak. Integer scores → bit-deterministic at any parallelism.

    Plan shape: explode → broadcast-join the tiny profile → two-level agg.
    """
    from pyspark.sql.window import Window

    profiles = F.broadcast(
        lang_profiles(docs, top_k).withColumnRenamed("lang", "cand_lang")
    )
    doc_toks = docs.select(
        "doc_id", F.col("lang").alias("true_lang"), F.explode(tokens_col("text")).alias("tok")
    )
    scored = (
        doc_toks.join(profiles, "tok")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("true_lang").alias("lang"),
            F.col("cand_lang").alias("pred_lang"),
            F.col("score").cast("long").alias("score"),
        )
    )


STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

PUNCT_CLASS = "[^.,!?;:]"


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality scoring (length / punctuation / stopword
    ratios), the filter stage of a pre-training corpus pipeline.

    All ratios are integerized (permille, floor) so the score is
    bit-deterministic at any parallelism and reproducible by the oracle:

    - ``punct_permille``: punctuation chars / total chars,
    - ``stop_permille``: stopword tokens / tokens (English function-word
      rate — near-zero signals non-text or keyword spam),
    - ``mean_tok_len_permille``: chars per token ×1000 (degenerate short/long
      tokens signal boilerplate or binary junk),
    - ``keep``: the composite gate (C4-style heuristics: enough tokens,
      token shape in the natural-language band).
    """
    toks = tokens_col("text")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_toks = F.size(toks)
    punct = F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    stops = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({stop_list}))"))
    mean_len = F.floor(F.lit(1000.0) * F.length("text") / n_toks).cast("long")
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.floor(
            F.lit(1000.0) * punct / F.greatest(F.length("text"), F.lit(1))
        ).cast("long").alias("punct_permille"),
        F.floor(F.lit(1000.0) * stops / n_toks).cast("long").alias("stop_permille"),
        mean_len.alias("mean_tok_len_permille"),
        ((n_toks >= 5) & (mean_len >= 2000) & (mean_len <= 12000)).alias("keep"),
    )


# PII patterns — a conservative subset that parses identically under Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded quantifiers, \b.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,3}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def with_synthetic_pii(docs: DataFrame) -> Column:
    """Deterministically augment each document with one email, one phone,
    and one IPv4 derived from doc_id arithmetic — the corpus itself is
    PII-free word salad, so the fixture is synthesized in-query (same
    precedent as the synthesized media containers in mm_decode_meta) and
    the oracle reproduces it with the same arithmetic."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" Contact doc"), d.cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (d % 256).cast("string"),
        F.lit("."), ((d * 3) % 256).cast("string"),
        F.lit("."), ((d % 254) + 1).cast("string"),
        F.lit(" ok"),
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrubbing — the redaction stage of a pre-training corpus
    pipeline: count and mask emails, E.164-style phone numbers, and IPv4
    addresses. Pure regexp column expressions (JVM-side, codegen'd, no
    shuffle); replacement order is email → phone → IP so the email pass
    can't eat the dotted-quad and vice versa."""
    aug = with_synthetic_pii(docs)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>"),
        PII_IPV4, "<IP>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(PII_EMAIL), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PII_PHONE), 0)).cast("int").alias("n_phones"),
        F.size(F.regexp_extract_all(aug, F.lit(PII_IPV4), 0)).cast("int").alias("n_ips"),
        red.alias("redacted"),
    )


def _gram_counts(docs: DataFrame, n: int) -> DataFrame:
    return (
        docs.select("doc_id", F.explode(shingles_expr("text", n)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Repetition-based quality signals (the Gopher / MassiveText rules,
    Rae et al. 2021 §A1.1): fraction of characters inside the single most
    frequent 2-gram and 3-gram, and the fraction of 5-gram occurrences
    (char-weighted) that belong to duplicated 5-grams. All permille-floored
    integers → bit-deterministic at any parallelism.

    Plan shape: three per-doc aggregations (map-side combined, keys are
    doc-local so never skewed), window top-1 per doc for the max-gram
    signals, one join back to the per-doc char count. No Python anywhere.
    """
    from pyspark.sql.window import Window

    # greatest(.., 1): an empty-text doc would divide by zero, where Spark
    # (non-ANSI → NULL) and DuckDB (inf/NULL by flag) disagree — the guard
    # keeps the permille at 0 bit-identically in both engines
    nchars = docs.select(
        "doc_id", F.greatest(F.length("text"), F.lit(1)).alias("nc")
    )

    def top_gram(n: int, out: str) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
        return (
            _gram_counts(docs, n)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .join(nchars, "doc_id")
            .select(
                "doc_id",
                F.floor(F.lit(1000.0) * F.col("c") * F.length("g") / F.col("nc"))
                .cast("long").alias(out),
            )
        )

    dup5 = (
        _gram_counts(docs, 5)
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.lit(1000.0)
                * F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(F.lit(0)))
                / F.greatest(F.sum(F.col("c") * F.length("g")), F.lit(1))
            ).cast("long").alias("dup5_permille")
        )
    )
    return (
        top_gram(2, "top2_permille")
        .join(top_gram(3, "top3_permille"), "doc_id")
        .join(dup5, "doc_id")
    )


def decontamination(
    docs: DataFrame,
    bench_mod: int = 7,
    n: int = 5,
    bench_docs: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap rule of GPT-3 appendix
    C / PaLM / Llama eval hygiene): flag every training document sharing at
    least one n-token shingle with the benchmark set.

    ``bench_docs``: the benchmark corpus (any DataFrame with a ``text``
    column). When given, ``docs`` is the train corpus AS-IS and the
    benchmark is eval-suite-sized BY CONTRACT (tiny vs the corpus), so its
    distinct shingle set is broadcast — the 100 TB train scan never
    shuffles except the doc-keyed count aggregation. When omitted, the
    benchmark falls back to the deterministic split ``doc_id % bench_mod
    == 0`` of ``docs`` itself (train = the complement); that slice is a
    FIXED FRACTION of the corpus, not eval-suite-sized, so no broadcast
    hint is forced — AQE broadcasts it when it measures small and degrades
    to a shuffle join instead of OOMing when it doesn't."""
    if bench_docs is not None:
        train_docs = docs
        bench = F.broadcast(
            bench_docs.select(F.explode(shingles_expr("text", n)).alias("g"))
            .distinct()
        )
    else:
        train_docs = docs.filter(F.col("doc_id") % bench_mod != 0)
        bench = (
            docs.filter(F.col("doc_id") % bench_mod == 0)
            .select(F.explode(shingles_expr("text", n)).alias("g"))
            .distinct()
        )
    sh = train_docs.select(
        "doc_id", F.explode(shingles_expr("text", n)).alias("g")
    )
    hits = (
        sh.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("h"))
    )
    train = train_docs.select("doc_id")
    n_hits = F.coalesce(F.col("h"), F.lit(0)).cast("long")
    return train.join(hits, "doc_id", "left").select(
        "doc_id", n_hits.alias("n_hits"), (n_hits > 0).alias("contaminated")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprinting:

    - ``bag_fp``: order-insensitive content fingerprint — md5 over the sorted
      distinct token bag (catches shuffled/duplicated-word copies);
    - ``head_fp``: positional fingerprint of the first 8 tokens (cheap
      prefix identity, the rolling-hash-anchor analogue);
    - ``exact_fp``: md5 of the raw text.
    """
    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("bag_fp"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("head_fp"),
        F.md5("text").alias("exact_fp"),
    )
