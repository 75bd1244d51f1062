"""Text-analysis operators for the documents table (training-data
pipeline surface): tokenization, token stats, quality scoring, language
ID, and order-sensitive document fingerprinting.

Everything is Catalyst expressions over ``split``/``posexplode`` — no
Python on the data path. Formulas are deliberately arithmetic-only so the
DuckDB oracle can mirror them exactly (see queries/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .hashing import FP_A, FP_B, P

# deterministic marker vocabularies for the language-ID vote
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "with", "for"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "les", "des", "une", "est"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pos, token): whitespace tokens of lower-cased text,
    1-based positions, empty tokens dropped."""
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos0", "token"),
    )
    return exploded.where(F.col("token") != "").select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "token"
    )


# BPE-ish pre-tokenization: alphanumeric runs + single punctuation marks.
# Chosen so Java (Spark) and RE2 (DuckDB) regex agree byte-for-byte.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens_bpe_ish(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, token): BPE-style pre-tokens — lower-cased alnum runs
    and individual punctuation marks — via JVM ``regexp_extract_all``
    (codegen'd; no Python). The shape real BPE counts tokens over."""
    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0
    )
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(arr).alias("pos0", "token")
    )
    return ex.select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


def token_stats_bpe(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_alnum, n_punct, n_distinct) over the BPE-ish
    pre-tokens — all array expressions on the extracted token list (one
    scan, no explode/shuffle)."""
    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0
    )
    alnum = F.size(F.filter(arr, lambda x: x.rlike("^[a-z0-9]+$")))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(arr).alias("n_tokens"),
        alnum.alias("n_alnum"),
        (F.size(arr) - alnum).alias("n_punct"),
        F.size(F.array_distinct(arr)).alias("n_distinct"),
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len) — F2/A1 over text."""
    t = tokens(docs, id_col, text_col)
    return t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("token")), 6).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, stop_ratio, comma_ratio, quality): deterministic
    length/stopword/punctuation quality heuristic, rounded for
    engine-portable comparison."""
    t = tokens(docs, id_col, text_col)
    per_doc = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("token").isin(*STOPWORDS).cast("long")).alias("n_stop"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        (
            F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit(","), F.lit("")))
        ).alias("n_commas"),
    )
    j = base.join(per_doc, "doc_id", "left").na.fill(0, ["n_tokens", "n_stop"])
    stop_ratio = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    comma_ratio = F.col("n_commas") / F.greatest(F.col("n_chars"), F.lit(1))
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    quality = (
        F.lit(0.5) * length_score
        + F.lit(0.3) * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)))
        + F.lit(0.2) * (F.lit(1.0) - F.least(comma_ratio * 10, F.lit(1.0)))
    )
    return j.select(
        "doc_id",
        "n_chars",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(comma_ratio, 6).alias("comma_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_guess): marker-token vote, deterministic tie order
    (en > es > fr > unknown on equal votes; zero votes → unknown)."""
    t = tokens(docs, id_col, text_col)
    aggs = [
        F.sum(F.col("token").isin(*LANG_MARKERS[lang]).cast("long")).alias(f"v_{lang}")
        for lang in ("en", "es", "fr")
    ]
    votes = t.groupBy("doc_id").agg(*aggs)
    best = (
        F.when(
            (F.col("v_en") >= F.col("v_es")) & (F.col("v_en") >= F.col("v_fr")) & (F.col("v_en") > 0),
            F.lit("en"),
        )
        .when((F.col("v_es") >= F.col("v_fr")) & (F.col("v_es") > 0), F.lit("es"))
        .when(F.col("v_fr") > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(votes, "doc_id", "left")
        .na.fill(0)
        .select("doc_id", best.alias("lang_guess"))
    )


def token_id(col: str | "F.Column" = "token"):
    """Portable hash token id as a Catalyst expression: first 60 bits of
    md5(token) mod P — byte-identical to ``hashing.token_id_sql`` in
    DuckDB. Shuffle-free and vocabulary-free: tid is computed inline per
    row, so minhash/simhash/fingerprint never sort or join a token table
    (the production path at 1e12 tokens). Collisions (~|vocab|²/2P) merge
    two shingles identically in both engines — harmless for the sketch
    semantics and still value-exact vs the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % F.lit(P)


def top_tokens(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, n_occurrences, n_docs) for the k most frequent tokens,
    deterministic tie-break by token — corpus heavy hitters (stopword
    discovery / vocab pruning). One aggregation over the exploded tokens;
    the top-k is a single-partition sort of the (tiny) aggregate, not of
    the data."""
    t = tokens(docs, id_col, text_col)
    agg = t.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, token, tf, tfidf6, rnk): the k highest-TF-IDF terms per
    document — tfidf = tf · ln(N/df) with raw term frequency and natural
    log, ranked by the 6-dp-ROUNDED score (then token asc) so the ranking
    key is identical across engines (ranking on the raw double would let a
    1-ulp libm difference flip near-ties).

    Plan shape: one (doc, token) aggregate for tf, one token aggregate for
    df (derived from tf — no second scan of the text), a join on token,
    and a per-doc top-k window. N is the full documents count (including
    token-less docs)."""
    n_docs = docs.count()
    tf = (
        tokens(docs, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id", "token", "tf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf6"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf6"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "token", "tf", "tfidf6", "rnk")
    )


# redaction patterns chosen so Java (Spark) and RE2 (DuckDB) regex agree
# byte-for-byte on match sets
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("num", r"[0-9]+", "<NUM>"),
)


def redact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...] = REDACT_PATTERNS,
) -> DataFrame:
    """(id, n_<name>…, scrub_md5): PII/pattern scrubbing — per-pattern
    match counts plus the md5 of the text after applying every replacement
    IN ORDER (emails before numbers, so an address's digits are counted
    once). Pure JVM ``regexp_extract_all``/``regexp_replace`` — one scan,
    no Python, stream-safe."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in patterns
    ]
    scrubbed = F.col(text_col)
    for _, pat, repl in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        F.col(id_col).alias("id"), *counts, F.md5(scrubbed).alias("scrub_md5")
    )


def vocab(token_df: DataFrame, method: str = "hash") -> DataFrame:
    """(token, tid) for each distinct token.

    ``method="hash"`` (default, the scale path): tid = portable md5-prefix
    hash, computed inline — no global sort anywhere in the plan.
    ``method="dense"``: dense 1-based ids by lexicographic order via a
    single-partition dense_rank window — a TEST-SCALE device only (every
    distinct token funnels through one reducer); kept for humans who want
    compact ids on small corpora.
    """
    if method == "hash":
        return token_df.select("token").distinct().withColumn("tid", token_id())
    w = Window.orderBy("token")
    return (
        token_df.select("token")
        .distinct()
        .withColumn("tid", F.dense_rank().over(w).cast("long"))
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp): order-sensitive arithmetic document fingerprint
    fp = sum((FP_A*tid + FP_B*pos) % P) % P — the rolling-hash analogue
    that stays in portable 64-bit integer arithmetic. tid is the inline
    hash id (token_id), so the whole plan is one scan + one aggregation."""
    t = tokens(docs, id_col, text_col)
    term = (F.lit(FP_A) * token_id() + F.lit(FP_B) * F.col("pos")) % F.lit(P)
    return t.groupBy("doc_id").agg((F.sum(term) % F.lit(P)).alias("fp"))


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, avg_lp): add-one-smoothed corpus bigram
    language-model score per document — avg over the doc's bigrams of
    ln((c(w1,w2)+1) / (c(w1·)+V)), where c counts bigrams corpus-wide,
    c(w1·) is the prefix total and V the unigram vocabulary size. The
    cheap LM-fluency signal a training-data pipeline uses next to the
    heuristic ``quality_score`` (a doc of common-in-corpus transitions
    scores high; rare-transition noise scores low). Docs with < 2 tokens
    have no bigram and drop out (inner semantics, mirrored in SQL).

    Shape: one ``lead()`` window over the token relation builds bigrams
    (no self-join), two groupBys build the corpus counts, the vocab
    total rides a broadcast crossJoin. All counts are exact integers;
    the only float is the final ln/avg, emitted round-6."""
    t = tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        t.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_n = t.agg(F.countDistinct("token").alias("v"))
    return (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
            ).alias("avg_lp"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_bigrams, top_bigram_n, n_distinct_bigrams):
    Gopher-style within-document repetition signals — the filters that
    catch boilerplate and degenerate generation loops in a training
    corpus. Downstream ratios (top-bigram fraction = top_bigram_n /
    n_bigrams, duplicate-bigram fraction = 1 - distinct/total) are left
    to the caller as exact-integer divisions; the operator emits only
    integers so the oracle comparison is exact.

    Shape: one lead() window builds bigrams (no self-join), one groupBy
    counts per-(doc, bigram), one groupBy folds to per-doc — all counts
    shuffle at bigram-type granularity, not token occurrences. Docs with
    < 2 tokens have no bigram and drop out (inner semantics, mirrored in
    the SQL oracle)."""
    t = tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        t.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    per_bigram = big.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").alias("c")
    )
    reps = per_bigram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
        F.count("*").alias("n_distinct_bigrams"),
    )
    ntok = t.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return ntok.join(reps, "doc_id").select(
        "doc_id", "n_tokens", "n_bigrams", "top_bigram_n", "n_distinct_bigrams"
    )


def inverted_postings(
    docs: DataFrame,
    cap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, df, postings_csv): the inverted-index build — document
    frequency plus the first ``cap`` posting doc ids per token (ascending,
    CSV so the driver comparator sees a scalar column).

    Scale shape: the head of each posting list is taken with a window
    row_number BEFORE any collect_list, so per-token state is bounded by
    ``cap`` even for stopword-grade tokens whose full posting list is the
    corpus; df comes from the same distinct (doc, token) relation. At
    100 TB the full index would sink the ranked relation partitioned by
    token instead of CSV-capping — the dataflow is identical."""
    t = tokens(docs, id_col, text_col).select("doc_id", "token").distinct()
    dfs = t.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("token").orderBy("doc_id")
    heads = (
        t.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_csv")
        )
    )
    return dfs.join(heads, "token").select("token", "df", "postings_csv")


def _word_array(text_col: str):
    """array<string> of lower-cased whitespace words, empties dropped —
    the row-local form of ``tokens`` (no explode, no shuffle)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): fixed-token-window
    chunking with overlap — the context-window packing step every LLM
    training pipeline runs between cleaning and tokenization. Chunk k
    covers tokens [k*stride, k*stride + chunk_size); the tail chunk is
    short rather than dropped, so every token lands in ≥1 chunk.

    Entirely row-local Catalyst array expressions (split → sequence of
    starts → explode → slice → array_join): the only data movement is the
    explode's row multiplication (~n_tokens/stride rows per doc), there
    is no shuffle and nothing Python — at 10^12 documents this runs as a
    stateless map over the corpus scan."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_tokens: chunk_size and stride must be positive")
    base = docs.select(
        F.col(id_col).alias("doc_id"), _word_array(text_col).alias("_xs")
    ).where(F.size("_xs") > 0)
    starts = F.sequence(F.lit(0), F.size("_xs") - 1, F.lit(stride))
    ex = base.select("doc_id", "_xs", F.explode(starts).alias("_start"))
    chunk = F.slice(F.col("_xs"), F.col("_start") + 1, chunk_size)
    return ex.select(
        "doc_id",
        (F.col("_start") / F.lit(stride)).cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def span_duplicates(
    docs: DataFrame,
    span: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(span_md5, n_docs, n_spans, min_doc_id): token spans shared across
    documents — the cross-document companion to ``repetition_stats``
    (within-doc) and the C4/RefinedWeb "remove duplicated spans" dedup
    primitive at token granularity (C4 uses 3-sentence spans; fixed
    ``span``-token windows are the tokenizer-stable equivalent).

    Spans are non-overlapping ``span``-token windows (tail fragments
    shorter than ``span`` are excluded — they would never collide except
    trivially); a span row survives when ≥ ``min_docs`` DISTINCT documents
    contain it. Plan: the stateless ``chunk_tokens`` map, then ONE groupBy
    at span-type granularity keyed on the 16-byte md5 — the same shape as
    exact dedup, so it scales to 10^12 documents (hot spans are bounded by
    corpus vocabulary, not corpus size; the md5 key is portable to any
    engine for the oracle)."""
    if min_docs < 2:
        raise ValueError("span_duplicates: min_docs must be >= 2")
    ch = chunk_tokens(
        docs, chunk_size=span, stride=span, id_col=id_col, text_col=text_col
    )
    return (
        ch.where(F.col("n_tokens") == span)
        .select("doc_id", F.md5(F.col("chunk_text")).alias("span_md5"))
        .groupBy("span_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_spans"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def c4_quality_flags(
    docs: DataFrame,
    min_words: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, total_chars, max_word_freq, n_distinct,
    ends_terminal, keep): C4-style document quality gate (Raffel et al.
    2020's cleaning rules adapted to whole-document granularity) —
    length floor, mean-word-length band, single-word repetition cap,
    vocabulary-diversity floor, terminal-punctuation flag.

    ``keep`` is decided on INTEGER comparisons only (total_chars vs
    3·n/8·n bands, max_word_freq·5 vs n, n_distinct·10 vs 3·n) so the
    DuckDB oracle reproduces it bit-exactly — no float thresholds.
    All columns are row-local array expressions over one split; the
    per-distinct-word frequency scan is O(n·distinct) per row, bounded
    by document length, still a stateless map at corpus scale."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _word_array(text_col).alias("_xs"),
        F.col(text_col).rlike(r"[.!?]\s*$").alias("ends_terminal"),
    )
    stats = base.select(
        "doc_id",
        F.size("_xs").alias("n_words"),
        F.aggregate(
            F.col("_xs"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.array_distinct("_xs"),
                    lambda d: F.size(F.filter(F.col("_xs"), lambda t: t == d)),
                )
            ),
            F.lit(0),
        ).alias("max_word_freq"),
        F.size(F.array_distinct("_xs")).alias("n_distinct"),
        "ends_terminal",
    )
    keep = (
        (F.col("n_words") >= F.lit(min_words))
        & (F.col("total_chars") >= 3 * F.col("n_words"))
        & (F.col("total_chars") <= 8 * F.col("n_words"))
        & (F.col("max_word_freq") * 5 <= F.col("n_words"))
        & (F.col("n_distinct") * 10 >= 3 * F.col("n_words"))
    )
    return stats.withColumn("keep", keep)


# winnowing fingerprint layout: the (kh, pos) argmin is encoded as ONE
# BIGINT key kh*WINNOW_POS_M + pos so a plain windowed min() computes the
# tie-broken argmin identically in any engine; pos < WINNOW_POS_M is
# guaranteed by the token cap (20k) << 2^15
WINNOW_POS_M = 32768


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp): winnowing document fingerprints (Schleimer-
    Wilkerson-Aiken, MOSS): hash every k-token shingle, then from every
    window of w consecutive shingles keep the minimal hash (ties → the
    leftmost position). Guarantees any shared run of w+k-1 tokens between
    two documents shares a selected fingerprint — the density-bounded
    (2/(w+1)) alternative to full shingle sets for plagiarism/near-dup
    detection.

    Plan: one scan → per-doc lead() window builds the shingle hash in
    exact 64-bit arithmetic (each term reduced mod P before summing) →
    one more window computes min(kh*M+pos) over the next w rows → decode
    + distinct. Shuffles once on doc_id; per-doc state is the w-row
    window frame, never the document."""
    from pyspark.sql import Window

    if k < 1 or w < 1:
        raise ValueError("winnow: k and w must be >= 1")
    t = tokens(docs, id_col, text_col).select(
        "doc_id", "pos", token_id().alias("tid")
    )
    ow = Window.partitionBy("doc_id").orderBy("pos")
    kh = F.lit(0).cast("long")
    for j in range(k):
        c = pow(FP_A, j, P)
        tj = F.col("tid") if j == 0 else F.lead("tid", j).over(ow)
        kh = kh + (F.lit(c) * tj) % F.lit(P)
    kg = (
        t.select("doc_id", "pos", (kh % F.lit(P)).alias("kh"))
        .where(F.col("kh").isNotNull())  # drop incomplete trailing shingles
    )
    vw = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    key = F.col("kh") * F.lit(WINNOW_POS_M) + F.col("pos")
    sel = kg.select(
        "doc_id",
        F.min(key).over(vw).alias("selkey"),
        F.count("*").over(vw).alias("cnt"),
    ).where(F.col("cnt") == w)  # full windows only
    return sel.select(
        "doc_id",
        (F.col("selkey") % F.lit(WINNOW_POS_M)).alias("pos"),
        F.expr(f"selkey div {WINNOW_POS_M}").alias("fp"),  # exact int division
    ).distinct()


def winnow_pairs(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, shared): document pairs sharing >= min_shared
    winnowing fingerprints — the MOSS match step. Self-join is bucketed
    BY FINGERPRINT VALUE with a bucket cap (the LSH-pairs discipline:
    a fingerprint shared by more than max_bucket docs is a stop-shingle
    and is dropped, bounding the quadratic term per bucket), so the
    candidate volume is Σ_fp min(|bucket|, cap)² — never all-pairs."""
    fp = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    ).select("doc_id", "fp").distinct()
    sz = fp.groupBy("fp").agg(F.count("*").alias("sz"))
    small = fp.join(sz.where(F.col("sz") <= max_bucket), "fp").select("doc_id", "fp")
    a = small.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = small.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def cdc_chunks(
    docs: DataFrame,
    *,
    k: int = 4,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_pos, n_tokens, chunk_fp): content-defined
    chunking at token granularity — a chunk boundary opens wherever the
    k-token rolling hash ≡ 0 (mod ``divisor``), so boundaries are decided
    by CONTENT, not offsets (the Rabin/FastCDC property that makes chunk
    hashes stable under insertions: an edit only re-chunks its own
    neighborhood, unlike fixed-size chunking where one inserted token
    shifts every later chunk). ``divisor`` sets the expected chunk length
    in tokens. ``chunk_fp`` is a position-weighted polynomial of the
    chunk's token ids reduced mod P — order-sensitive but computed as a
    plain integer SUM, so any engine aggregates it identically.

    Plan: token explode is row-local; the shingle hash and the boundary
    cumulative count are two frames over the SAME doc_id-partitioned
    window (one exchange); the per-chunk fold is one groupBy. Per-doc
    state is the k-row lookahead, never the document."""
    if k < 1 or divisor < 2:
        raise ValueError("cdc_chunks: need k >= 1 and divisor >= 2")
    t = tokens(docs, id_col, text_col).select(
        "doc_id", "pos", token_id().alias("tid")
    )
    ow = Window.partitionBy("doc_id").orderBy("pos")
    kh = F.lit(0).cast("long")
    for j in range(k):
        c = pow(FP_A, j, P)
        tj = F.col("tid") if j == 0 else F.lead("tid", j).over(ow)
        kh = kh + (F.lit(c) * tj) % F.lit(P)
    cum = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    boundary = F.when(
        ((kh % F.lit(P)) % F.lit(divisor) == 0), F.lit(1)
    ).otherwise(F.lit(0))
    cb = t.select(
        "doc_id", "pos", "tid",
        F.sum(boundary).over(cum).alias("chunk_raw"),
    )
    w2 = Window.partitionBy("doc_id", "chunk_raw")
    cl = cb.select(
        "doc_id", "chunk_raw", "pos", "tid",
        (F.col("pos") - F.min("pos").over(w2) + 1).alias("local"),
    )
    ch = cl.groupBy("doc_id", "chunk_raw").agg(
        F.min("pos").cast("long").alias("start_pos"),
        F.count("*").alias("n_tokens"),
        (F.sum((F.col("local") * F.col("tid")) % F.lit(P)) % F.lit(P))
        .cast("long")
        .alias("chunk_fp"),
    )
    wi = Window.partitionBy("doc_id").orderBy("start_pos")
    return ch.select(
        "doc_id",
        (F.row_number().over(wi) - 1).cast("long").alias("chunk_idx"),
        "start_pos",
        "n_tokens",
        "chunk_fp",
    )


def bm25_topk(
    docs: DataFrame,
    k: int = 10,
    n_query_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ranked retrieval: BM25 top-``k`` documents for the query formed
    by the ``n_query_terms`` highest-document-frequency tokens (ties to
    the lexicographically lower token) — the inverted-index scoring path
    of a search/retrieval pipeline, complementary to embedding-ANN
    (dense) and MinHash (set-overlap) similarity.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (Lucene's BM25 idf).

    Plan shape at scale: one tokenize scan feeds tf (doc,token
    aggregate), doc lengths, and df; the query-term relation is
    ``n_query_terms`` rows and joins broadcast, so scoring touches only
    postings of query terms — work ∝ matching postings, never the
    corpus × vocabulary. N and avgdl are two scalar probes (driver
    bytes, not rows). Returns (doc_id, bm25_6) ordered by the ROUNDED
    score (ties → lower doc_id) so ranking is stable cross-engine."""
    tok = tokens(docs, id_col, text_col)
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = tok.count() / n_docs
    lens = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    q = dfq.orderBy(F.col("df").desc(), "token").limit(n_query_terms)
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    per = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
        )
    )
    scored = (
        tf.join(F.broadcast(q), "token")
        .join(lens, "doc_id")
        .select("doc_id", per.alias("s"))
    )
    out = scored.groupBy("doc_id").agg(F.round(F.sum("s"), 6).alias("bm25_6"))
    return out.orderBy(F.col("bm25_6").desc(), "doc_id").limit(k)


def ngram_novelty(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, novel_frac): per-document n-gram novelty vs
    the earlier corpus — the share of the doc's DISTINCT word n-grams
    whose corpus-wide first appearance (min doc_id) is the doc itself.
    The curation signal behind "how much does this shard add": crawl
    snapshots re-fetch mostly old text, and a low novel_frac tail is
    exactly what a dedup-aware mixer downweights (cf. the containment
    view in doc_containment, which compares PAIRS; novelty ranks each
    doc against everything before it).

    Scale shape: shingling is row-local (slice over the word array — no
    explode until the shingle rows, no per-row Python); the only
    shuffles are one groupBy over distinct (shingle → min doc_id) and
    one shingle-keyed join back. novel_frac is a single exact-integer
    division. Docs with fewer than n words have no shingles and are
    absent, as in the SQL mirror."""
    if n < 1:
        raise ValueError("ngram_novelty: n must be >= 1")
    xs = _word_array(text_col)
    sh = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(
                    F.when(
                        F.size(xs) >= n,
                        F.transform(
                            F.sequence(F.lit(1), F.size(xs) - (n - 1)),
                            lambda i: F.concat_ws(" ", F.slice(xs, i, n)),
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                )
            ).alias("g"),
        )
    )
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("novel_frac"),
        )
    )
