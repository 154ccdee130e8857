"""Text-analysis operators over documents (BASELINE.json north-star (†)).

- language-ID: stopword-profile scoring (n-gram-free heuristic; the synthetic
  corpus shares one vocabulary across langs, so the *predictions* are
  degenerate by construction — the operator contract is the deterministic
  scoring pipeline, and the unit tests exercise it on real multilingual
  fixtures);
- quality score: length/punctuation/stopword features combined linearly;
- token counting: whitespace tokens + a BPE-ish regex segmentation;
- fingerprinting: winnowing (k-gram hashes, min over a sliding window) —
  the positional variant of MinHash used for plagiarism-style matching.

Everything is built-in column expressions; ratios are exact integer
divisions in double, rounded to 6 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from gmr_spark.functions.text import exploded_word_shingles, tokens
from gmr_spark.sources.tables import load_tables

# profiles keyed on words that actually occur in the corpus vocabulary
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Tiny public multilingual vocabulary (common function words + everyday
# nouns/adjectives; romanized pinyin for zh) used to build the in-repo
# fixture corpus below — the first 5 words of each language ARE its
# LANG_PROFILES entry, so a fixture doc's dominant vocabulary decides its
# argmax. Documented in FIXTURES.md.
MULTILINGUAL_VOCAB: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is",
           "house", "water", "day", "good", "new"),
    "de": ("der", "die", "und", "das", "ist",
           "haus", "wasser", "tag", "gut", "neu"),
    "es": ("el", "la", "los", "y", "es",
           "casa", "agua", "dia", "bueno", "nuevo"),
    "fr": ("le", "la", "les", "et", "est",
           "maison", "eau", "jour", "bon", "nouveau"),
    "zh": ("de", "le", "shi", "he", "zai",
           "fangzi", "shui", "tian", "hao", "xin"),
}

N_FIXTURE_DOCS_PER_LANG = 5
FIXTURE_DOC_LEN = 12


def multilingual_fixture_rows() -> list[tuple[int, str, str]]:
    """(doc_id, lang, text): ``N_FIXTURE_DOCS_PER_LANG`` deterministic docs
    per language — word j of doc i is ``vocab[(i + j) % 10]``, so every doc
    is dominated by its own language's function words while sharing the
    cross-language homographs (es/fr 'la', fr/zh 'le') that make the argmax
    non-trivial. The DuckDB twin's VALUES list is rendered from this exact
    list (oracle.llm_sql.LANG_ID_MULTILINGUAL)."""
    rows: list[tuple[int, str, str]] = []
    doc_id = 0
    for lang in sorted(MULTILINGUAL_VOCAB):
        vocab = MULTILINGUAL_VOCAB[lang]
        for i in range(N_FIXTURE_DOCS_PER_LANG):
            words = [vocab[(i + j) % len(vocab)] for j in range(FIXTURE_DOC_LEN)]
            rows.append((doc_id, lang, " ".join(words)))
            doc_id += 1
    return rows


def _score(toks: F.Column, words: tuple[str, ...]) -> F.Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def _lang_id_frame(docs: DataFrame) -> DataFrame:
    """Scoring pipeline shared by ``lang_id`` (corpus) and
    ``lang_id_multilingual`` (fixture): argmax stopword-profile hits, ties
    to the lexicographically first language."""
    toks = tokens(F.col("text"))
    scored = F.array(*[
        F.struct(
            (-_score(toks, words)).cast("int").alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_PROFILES.items())
    ])
    best = F.array_min(scored)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        best["lang"].alias("lang_pred"),
        (-best["neg_hits"]).cast("int").alias("score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_actual, lang_pred, score) over the documents corpus.
    The synthetic corpus shares one vocabulary across langs, so predictions
    here are degenerate by construction; ``lang_id_multilingual`` runs the
    SAME pipeline on the embedded multilingual fixture where they are not."""
    return _lang_id_frame(load_tables(spark, sf_dir)["documents"])


def lang_id_multilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_actual, lang_pred, score) over the embedded
    multilingual fixture corpus (round-3 verdict stretch item: a corpus
    where the predictions are non-degenerate — every language is actually
    predicted). ``sf_dir`` is unused by design: fixture corpora ship with
    the repo, exactly like ``graph_file_bfs``'s wheel13.graph."""
    docs = spark.createDataFrame(
        multilingual_fixture_rows(), "doc_id long, lang string, text string"
    )
    return _lang_id_frame(docs)


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stop_ratio, score)."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, v: acc + v
    )
    stop_hits = _score(toks, LANG_PROFILES["en"])
    # NULLIF-style zero guard: Spark yields NULL on double 0/0 while DuckDB
    # yields NaN — make empty docs NULL on both engines
    denom = F.when(n_tok > 0, n_tok.cast("double"))
    avg_len = F.round(tok_chars.cast("double") / denom, 6)
    stop_ratio = F.round(stop_hits.cast("double") / denom, 6)
    score = F.round(
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + F.least(avg_len / 10.0, F.lit(1.0)) * 0.2,
        6,
    )
    return docs.select(
        "doc_id", n_tok.cast("int").alias("n_tokens"),
        avg_len.alias("avg_token_len"), stop_ratio.alias("stop_ratio"),
        score.alias("score"),
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish, n_chars_alpha)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))
        .cast("int").alias("n_bpe_ish"),
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("int")
        .alias("n_chars_alpha"),
    )


def term_frequencies(spark: SparkSession, sf_dir: str, *, min_count: int = 10) -> DataFrame:
    """(token, n_docs, n_occurrences): corpus term stats — the explode +
    two-level aggregation pattern (map-side combine on both levels)."""
    docs = load_tables(spark, sf_dir)["documents"]
    exploded = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    return (
        exploded.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


# Top-V vocabulary size for oov_rate — a module constant so the DuckDB
# twin interpolates the SAME value by construction (the GOPHER_* pattern).
OOV_VOCAB_SIZE = 16


def oov_rate(spark: SparkSession, sf_dir: str,
             *, vocab_size: int = OOV_VOCAB_SIZE) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate): per-document out-of-vocabulary
    rate against the corpus's own top-``vocab_size`` unigram vocabulary —
    the tokenizer-prep / corpus-QA signal (a doc whose tokens mostly fall
    outside the frequency-head vocabulary is the noise a fixed-vocab
    tokenizer will shred into bytes; the round-13 addition to the (†)
    text-analysis family, orthogonal to ``quality_score``'s stopword
    ratio and ``unigram_lm_score``'s rarity mean).

    Determinism: vocabulary = rank by (count DESC, token ASC), take
    ``vocab_size`` — a total order, so the boundary is tie-free on both
    engines; oov_rate ROUND(·,6). Empty docs produce no token rows and
    are absent from the output (the GOPHER word_stats convention).

    Scale: one explode; C(w) is a map-side-combinable aggregation whose
    result is vocabulary-sized (Heaps-law sublinear); the vocabulary
    itself is TakeOrderedAndProject of that frame (top-V, never a global
    sort of token rows) and joins back as an explicit broadcast — bounded
    by the ``vocab_size`` parameter, not by SF, so the hint is safe at
    any corpus size. No window, no driver collect."""
    docs = load_tables(spark, sf_dir)["documents"]
    return oov_rate_frame(docs, vocab_size=vocab_size)


def oov_rate_frame(docs: DataFrame,
                   *, vocab_size: int = OOV_VOCAB_SIZE) -> DataFrame:
    """Core of :func:`oov_rate` over any (doc_id, text) frame — split out
    (the unigram_lm_frame pattern) so the unit test can plant a corpus
    with a genuinely out-of-head token that the synthetic corpus's
    31-word vocabulary would mask."""
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (cnt.orderBy(F.col("c").desc(), F.col("w"))
             .limit(vocab_size).select("w", F.lit(1).alias("in_v")))
    flagged = toks.join(F.broadcast(vocab), "w", "left")
    n_oov = F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
    n_tok = F.count(F.lit(1))
    return (
        flagged.groupBy("doc_id")
        .agg(
            n_tok.cast("long").alias("n_tokens"),
            n_oov.cast("long").alias("n_oov"),
            F.round(n_oov.cast("double") / n_tok, 6).alias("oov_rate"),
        )
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, *, k: int = 5) -> DataFrame:
    """(doc_id, token, tf, df, score): top-k characteristic terms per doc by
    tf·(1/df) — the *unlogged* idf variant, chosen deliberately: log-idf
    needs a transcendental function whose last-ulp behavior differs between
    the JVM and DuckDB's libm, while tf/df is a single IEEE division —
    bit-identical on both engines with no rounding epsilon.

    Scale: tf is one hash aggregation on (doc_id, token); df reuses the tf
    table (already unique per pair) with a second map-side-combinable count;
    df joins back by token (hot tokens = high df = low score, so the skewed
    join keys are exactly the ones the ranking discards); top-k per doc is a
    window partitioned by doc_id — never a global sort."""
    docs = load_tables(spark, sf_dir)["documents"]
    exploded = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = exploded.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "token").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "token", "tf", "df", "score")
    )


def tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, token): tokenization through a Python UDTF + LATERAL
    join — the modern Spark analog of the reference's per-vertex ``map``
    UDTF (one input row → many output rows, gmr.h:97/222-255). The UDTF
    class is defined inside this function so cloudpickle ships it by value
    (workers can't import this package). Functionally identical to the
    built-in explode path used elsewhere; declared to cover the UDTF
    surface of SURVEY §2.2."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # oracle's string_split(NULL) drops the row too
                return
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield doc_id, pos, tok
                    pos += 1

    load_tables(spark, sf_dir)  # registers nothing; ensures nanos conf set
    spark.udtf.register("gmr_tokenize", Tokenize)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents_udtf_src"
    )
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM documents_udtf_src d, LATERAL gmr_tokenize(d.doc_id, d.text) t"
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str, *, window: int = 4) -> DataFrame:
    """(doc_id, fp): winnowing fingerprints — md5 of word-3gram shingles,
    min over each sliding window of ``window`` consecutive positions,
    deduplicated. Robust to local edits; the document-level counterpart of
    minhash."""
    docs = load_tables(spark, sf_dir)["documents"]
    sh = exploded_word_shingles(docs).select(
        "doc_id", "pos", F.md5(F.col("sh")).alias("h")
    )
    w = (
        W.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return sh.select("doc_id", F.min("h").over(w).alias("fp")).distinct()


CHUNK_LEN = 200
CHUNK_STRIDE = 150


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, chunk, chunk_len): overlapping fixed-width
    character chunks (len 200, stride 150) — the standard pre-tokenization
    split for long documents in training pipelines. Narrow plan: sequence +
    posexplode generate chunk offsets row-locally (no shuffle at all); chunk
    count per doc is ceil((len-200)/150)+1 by integer arithmetic, identical
    on both engines (no float ceil)."""
    docs = load_tables(spark, sf_dir)["documents"]
    n_extra = F.when(
        F.length("text") <= CHUNK_LEN, F.lit(0).cast("long")
    ).otherwise(F.expr(f"(length(text) - {CHUNK_LEN - CHUNK_STRIDE + 1}) div {CHUNK_STRIDE}"))
    exploded = docs.select(
        "doc_id", "text",
        F.posexplode(F.sequence(F.lit(0).cast("long"), n_extra)).alias("chunk_id", "_i"),
    )
    chunk = F.col("text").substr(
        (F.col("_i") * CHUNK_STRIDE + 1).cast("int"), F.lit(CHUNK_LEN)
    )
    return exploded.select(
        "doc_id", "chunk_id", chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, scrubbed, n_redactions): redaction pass over the events
    props payload — digit runs (the synthetic corpus's stand-in for numeric
    PII like phones/accounts; real deployments extend the pattern list to
    emails/SSNs the same way) are replaced with a <NUM> sentinel and
    counted. Pure JVM regexp (codegen'd), no shuffle; the same RE2-safe
    pattern runs on both engines."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("scrubbed"),
        F.regexp_count("props", F.lit("[0-9]+")).alias("n_redactions"),
    )


# The Gopher `passes` thresholds — module constants so the DuckDB twins
# (oracle/llm_sql.py GOPHER_QUALITY and the composed CURATION) interpolate
# the SAME values by construction: a threshold change here cannot silently
# leave a twin on the old constants (round-13 review).
GOPHER_MIN_WORDS = 10
GOPHER_TOP_WORD_MAX = 0.2
GOPHER_DUP_2GRAM_MAX = 0.6


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, top_word_frac, dup_2gram_frac, mean_word_len,
    passes): repetition-based quality filters in the style of the Gopher
    rules (Rae et al. 2021, public) — the standard pre-training corpus
    hygiene pass. top_word_frac = count of the most frequent word / total
    words; dup_2gram_frac = 1 - distinct 2-grams / total 2-grams (repetition
    proxy); passes = all thresholds met.

    Scale: two map-side-combinable aggregations keyed on doc_id (word
    counts, 2-gram distincts), joined back — no window over the full corpus,
    no driver collect. Ratios rounded to 6 dp on both engines."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_c"),
        F.sum(F.length("w") * F.col("c")).alias("char_sum"),
    )
    sh2 = exploded_word_shingles(docs, k=2)
    gram_stats = (
        sh2.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_grams"),
             F.count(F.lit(1)).alias("n_distinct_grams"))
    )
    top_frac = F.round(F.col("top_c").cast("double") / F.col("n_words"), 6)
    dup_frac = F.coalesce(
        F.round(F.lit(1.0) - F.col("n_distinct_grams").cast("double")
                / F.col("n_grams"), 6),
        F.lit(0.0),
    )
    mean_len = F.round(F.col("char_sum").cast("double") / F.col("n_words"), 6)
    return (
        word_stats.join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            top_frac.alias("top_word_frac"),
            dup_frac.alias("dup_2gram_frac"),
            mean_len.alias("mean_word_len"),
            ((F.col("n_words") >= GOPHER_MIN_WORDS)
             & (top_frac <= GOPHER_TOP_WORD_MAX)
             & (dup_frac <= GOPHER_DUP_2GRAM_MAX)).alias("passes"),
        )
    )


CONTAM_SHINGLE_K = 5
CONTAM_BENCH_SOURCE = "src0"
CONTAM_THRESHOLD = 0.05


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_overlap, overlap_frac, contaminated):
    benchmark-contamination scan — the fraction of each training doc's
    distinct 5-gram shingles that also occur in a held-out benchmark set
    (here: the source='src0' slice standing in for an eval suite). The
    standard decontamination pass before training (public method: n-gram
    overlap, e.g. GPT-2/3 appendix dedup methodology).

    Scale: the benchmark shingle set is DISTINCT'd then broadcast (eval
    suites are small by construction); the corpus side streams through one
    partitioned left-semi-style count join — never all-pairs. Corpus docs
    from the benchmark source are excluded from the scan."""
    docs = load_tables(spark, sf_dir)["documents"]
    sh = (
        exploded_word_shingles(docs, k=CONTAM_SHINGLE_K)
        .select("doc_id", "sh").distinct()
    )
    bench_ids = docs.filter(F.col("source") == CONTAM_BENCH_SOURCE)
    bench_sh = (
        sh.join(F.broadcast(bench_ids.select("doc_id")), "doc_id", "left_semi")
        .select("sh").distinct()
    )
    train_sh = sh.join(
        F.broadcast(bench_ids.select("doc_id")), "doc_id", "left_anti"
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh.withColumn("_hit", F.lit(1))),
                      "sh", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"))
    )
    frac = F.round(F.col("n_overlap").cast("double") / F.col("n_shingles"), 6)
    return hits.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        frac.alias("overlap_frac"),
        (frac >= CONTAM_THRESHOLD).alias("contaminated"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10

# Embedded retrieval query set (fixture, like multilingual_fixture_rows):
# terms drawn from the synthetic corpus's closed 31-word vocabulary so every
# query matches real documents at every sf. q6 is deliberately stopword-heavy
# — idf discounting must rank it differently from the rare-term queries.
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "spark join merge"),
    (1, "fast scan filter"),
    (2, "customer order query"),
    (3, "hash table join"),
    (4, "window sort group"),
    (5, "big data stream"),
    (6, "the a value"),
    (7, "vector batch column row"),
)


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score, rnk): BM25 top-10 documents per embedded
    query — the retrieval-scoring pass training pipelines run for
    decontamination sweeps and targeted data selection (public method:
    Robertson & Zaragoza 2009). The reference has no text surface at all;
    this extends the mandated (†) text family with query→document ranking
    (tfidf_top_terms is per-document only).

    Deterministic cross-engine variant: idf is the RATIONAL form
    (N - df + 0.5)/(df + 0.5) — positive and strictly decreasing in df like
    the log form, but a single IEEE division instead of a transcendental
    whose last-ulp differs between the JVM and DuckDB's libm (same deliberate
    choice as tfidf_top_terms). Scores ROUND(·,6); ties break on doc_id.

    Scale: tf is one hash aggregation on (token, doc_id) AFTER a broadcast
    semi-join against the (tiny) query-term set — the corpus-wide explode
    never shuffles unmatched tokens; df reuses the tf table; doc lengths are
    a second map-side-combinable count; N/avgdl is a 1-row broadcast cross
    join; top-k per query is a window partitioned by query_id — never a
    global sort."""
    docs = load_tables(spark, sf_dir)["documents"]
    return bm25_frame(docs, spark=spark)


def bm25_frame(docs: DataFrame, *, spark: SparkSession,
               queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
               top_k: int = BM25_TOP_K) -> DataFrame:
    """Core of :func:`bm25_topk` over any (doc_id, text) frame — split out
    so unit tests can prove idf discounting on a corpus with non-uniform
    document frequencies (the synthetic corpus's closed 31-word vocabulary
    puts every term in nearly every document, so df ≈ N across the board
    there)."""
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    # per-doc length from a NARROW scan (array size per row), not a second
    # unfiltered explode+groupBy over every corpus token (the unigram_lm
    # 3x-scan lesson); the dl > 0 filter keeps exact parity with the
    # oracle's explode-derived dl, which never emits zero-token docs
    dl = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in dict.fromkeys(text.split())],
        "query_id int, token string",
    )
    tf = (
        toks.join(F.broadcast(qterms.select("token").distinct()), "token")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "doc_id", "score", F.col("rnk").cast("int").alias("rnk"))
    )


def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, mean_inv_freq, max_inv_freq): corpus-LM scoring —
    the language-model filtering pass of CCNet (Wenzek et al. 2020, public),
    which scores each document by how surprising its tokens are under a
    model trained on the corpus itself and drops the high-perplexity tail.
    Here the LM is the corpus's own unigram distribution p(w) = C(w)/T and
    the score is the mean INVERSE frequency Σ c_dw·(T/C(w)) / n_tokens — the
    rational-form surprisal: strictly increasing in rarity like mean
    -log p(w), but one IEEE division per term instead of a transcendental
    whose last ulp differs between the JVM and DuckDB's libm (same
    deliberate choice as bm25_topk / tfidf_top_terms). max_inv_freq exposes
    the single rarest token — the spike a hard-cutoff filter keys on.

    Scale: C(w) is one map-side-combinable aggregation; per-(doc, term)
    counts are a second; the count join is left UNHINTED — vocabulary grows
    ~Heaps-law-sublinearly, so AQE picks broadcast while it fits and
    degrades to a shuffle join (not an executor OOM) at the 100 TB tail;
    T rides a 1-row broadcast cross join. No window, no global sort."""
    docs = load_tables(spark, sf_dir)["documents"]
    return unigram_lm_frame(docs)


def unigram_lm_frame(docs: DataFrame) -> DataFrame:
    """Core of :func:`unigram_lm_score` over any (doc_id, text) frame —
    split out (bm25_frame pattern) so the unit test can plant a corpus with
    one genuinely rare token and prove the rarity ranking the synthetic
    corpus's near-uniform vocabulary would mask."""
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # T = corpus token count — computed from a NARROW scan (size of the
    # token array per doc, partial-agg'd), not by re-aggregating cnt: the
    # naive cnt.agg(sum) made Catalyst replay the whole explode+groupBy
    # subtree a third time (the plan scanned the corpus 3×)
    tot = docs.agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("t"))
    dtc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cdw"))
    inv = F.col("t").cast("double") / F.col("c")
    return (
        dtc.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("cdw").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("cdw") * inv) / F.sum("cdw"), 6)
            .alias("mean_inv_freq"),
            F.round(F.max(inv), 6).alias("max_inv_freq"),
        )
    )


DSIR_BUCKETS = 256
DSIR_TOP_K = 100
DSIR_TARGET_LANG = "en"


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, score, rnk): DSIR data selection (Xie et al. 2023,
    public) — rank raw-corpus documents by how much their hashed-bigram
    feature distribution resembles a target slice (here ``lang = 'en'``,
    the stand-in for the Wikipedia-quality target a real pipeline picks),
    and keep the top k. This is the importance-*selection* member of the
    (†) sampling family: stratified/temperature sampling reweight by
    membership, DSIR reweights by distributional similarity.

    Deterministic cross-engine variant: per-bucket importance ratio is the
    Laplace-smoothed RATIONAL probability ratio
    ``((ct+1)/(cr+1)) * ((Tr+B)/(Tt+B))`` and the document score is the
    count-weighted ARITHMETIC mean of its buckets' ratios — monotone in the
    same direction as the paper's mean log-ratio but free of
    transcendentals whose last ulp differs between the JVM and DuckDB's
    libm (same deliberate choice as bm25_topk's rational idf). Scores
    ROUND(·,6); ties break on doc_id.

    Scale: bucket hashing folds the unbounded bigram vocabulary into B=256
    ids, so the ratio table is ≤B rows — broadcast, never shuffled; the
    raw/target censuses are cheap ≤256-group map-side aggregations over
    the bigram stream (deliberately NOT derived from the per-(doc, bucket)
    table — see the in-code measurement note); corpus totals come from a
    NARROW array-size scan (the unigram_lm 3×-scan lesson); top-k is
    TakeOrderedAndProject, never a global sort."""
    docs = load_tables(spark, sf_dir)["documents"]
    return dsir_frame(docs)


def dsir_frame(docs: DataFrame, *, n_buckets: int = DSIR_BUCKETS,
               k: int = DSIR_TOP_K,
               target_lang: str = DSIR_TARGET_LANG) -> DataFrame:
    """Core of :func:`dsir_select` over any (doc_id, lang, text) frame —
    split out (bm25_frame pattern) so the unit test can plant a corpus
    whose target slice has a distinctive bigram distribution and prove
    target-resembling docs outrank raw-typical ones."""
    bucket = F.conv(F.substring(F.md5(F.col("sh")), 1, 2), 16, 10).cast("int")
    feats = (
        exploded_word_shingles(docs, k=2)
        .select("doc_id", bucket.alias("b"))
    )
    dbc = feats.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    # rc/tc deliberately re-explode rather than re-aggregate dbc: Catalyst
    # does NOT reuse dbc's (doc_id, b) shuffle across the three consumers
    # (different downstream groupings), so deriving rc = dbc.groupBy(b) and
    # tc = dbc ⋉ target-ids re-RUNS the explode PLUS the wide per-(doc,b)
    # shuffle per consumer — measured 188 s vs 25 s at the 2M-doc proof.
    # The direct forms below keep each extra pass a cheap ≤256-group
    # map-side-combinable aggregation with no (doc,b) shuffle at all; the
    # alternative (checkpoint dbc once) would pin an ~80M-row block set
    # outside any release discipline for a declared per-call query.
    rc = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tc = (
        exploded_word_shingles(docs.filter(F.col("lang") == target_lang), k=2)
        .select(bucket.alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    )
    n_bigrams = F.greatest(F.size(tokens(F.col("text"))) - 1, F.lit(0))
    tot = docs.agg(
        F.sum(n_bigrams).cast("double").alias("tr"),
        F.sum(F.when(F.col("lang") == target_lang, n_bigrams).otherwise(0))
        .cast("double").alias("tt"),
    )
    # ratio table: <= n_buckets rows; parenthesization pinned to match the
    # DuckDB twin operation-for-operation (IEEE determinism)
    ratio = (
        rc.join(tc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("cr") + 1.0))
             * ((F.col("tr") + float(n_buckets))
                / (F.col("tt") + float(n_buckets)))).alias("r"),
        )
    )
    scored = (
        dbc.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("r")) / F.sum("c"), 6)
            .alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
    # rank the k survivors (tiny frame; the single-partition window is k rows)
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, lo, n_docs, avg_words): power-of-two histogram of per-doc
    word counts — the sequence-length planning view every training pipeline
    derives before choosing context length / packing strategy. bucket =
    floor(log2(n_words)) computed EXACTLY on both engines as
    length(bin(n)) - 1 (no float log); lo = 2^bucket."""
    docs = load_tables(spark, sf_dir)["documents"]
    n_words = F.size(tokens(F.col("text")))
    bucket = (F.length(F.bin(n_words.cast("long"))) - 1).cast("int")
    return (
        docs.select(n_words.alias("nw"), bucket.alias("bucket"))
        .filter(F.col("nw") > 0)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("nw").cast("double")), 6).alias("avg_words"),
        )
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").alias("lo"),
            "n_docs", "avg_words",
        )
    )
