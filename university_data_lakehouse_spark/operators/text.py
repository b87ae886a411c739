"""Text-analysis operators for training-data pipelines (SURVEY §2.7).

Everything is JVM-side expression work (regexp_extract_all /
higher-order array functions) — zero Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with one narrow
map stage per document partition (no shuffle at all except the
optional aggregates).

Cross-engine determinism: ratios are CAST(int AS DOUBLE)/int with
identical expression shape in Spark and DuckDB; weighted score uses
left-associated + over identical literals (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import TOKEN_RE, shingles, tokens
from ..sources.loader import DOC_SCATTER_BPT, load_table, scatter

EN_STOP = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")
ES_STOP = ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por")
FR_STOP = ("le", "la", "de", "et", "un", "une", "les", "des", "du", "est")
DE_STOP = ("der", "die", "das", "und", "ein", "zu", "von", "mit", "ist", "den")

PUNCT_RE = "[^.,;:!?]"
ALPHA_RE = "[^A-Za-z]"
DIGIT_RE = "[^0-9]"


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/regex token counting: totals, uniques, mean token
    length (BPE-ish pre-tokenization statistics)."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    char_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return doc.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (
            char_sum.cast("double")
            / F.nullif(F.size(toks), F.lit(0))
        ).alias("avg_token_len"),
    )


def quality_score_expr() -> Column:
    """The quality score as a frame-level Column over the implicit
    ``text`` column — shared by the batch query and the incremental
    corpus pipeline so both gates are definitionally identical."""
    toks = tokens(F.col("text"))
    nd = F.length("text").cast("double")
    alpha = F.length(F.regexp_replace("text", ALPHA_RE, ""))
    digit = F.length(F.regexp_replace("text", DIGIT_RE, ""))
    punct = F.length(F.regexp_replace("text", PUNCT_RE, ""))
    stop = _count_in(toks, EN_STOP)
    alpha_ratio = alpha.cast("double") / F.nullif(nd, F.lit(0.0))
    digit_ratio = digit.cast("double") / F.nullif(nd, F.lit(0.0))
    punct_ratio = punct.cast("double") / F.nullif(nd, F.lit(0.0))
    stop_ratio = stop.cast("double") / F.nullif(
        F.size(toks).cast("double"), F.lit(0.0))
    return (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.1) * (F.lit(1.0) - digit_ratio)
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / digit / stopword-ratio quality scoring
    (the usual pretraining-corpus heuristics)."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    n = F.length("text")
    nd = n.cast("double")
    alpha = F.length(F.regexp_replace("text", ALPHA_RE, ""))
    digit = F.length(F.regexp_replace("text", DIGIT_RE, ""))
    punct = F.length(F.regexp_replace("text", PUNCT_RE, ""))
    stop = _count_in(toks, EN_STOP)
    alpha_ratio = alpha.cast("double") / F.nullif(nd, F.lit(0.0))
    digit_ratio = digit.cast("double") / F.nullif(nd, F.lit(0.0))
    punct_ratio = punct.cast("double") / F.nullif(nd, F.lit(0.0))
    stop_ratio = stop.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
    score = quality_score_expr()
    return doc.select(
        "doc_id",
        n.alias("len_chars"),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic over en/es/fr/de lists with a
    deterministic preference order on ties."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    en, es = _count_in(toks, EN_STOP), _count_in(toks, ES_STOP)
    fr, de = _count_in(toks, FR_STOP), _count_in(toks, DE_STOP)
    pred = (
        F.when((en >= es) & (en >= fr) & (en >= de), "en")
        .when((es >= fr) & (es >= de), "es")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return doc.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        en.alias("en_hits"),
        es.alias("es_hits"),
        fr.alias("fr_hits"),
        de.alias("de_hits"),
        pred.alias("lang_pred"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the token-normalized content +
    min-shingle-hash (a 1-hash MinHash, the rolling-fingerprint
    analog used for container-level dedup)."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    sh = shingles(toks, 3)
    return doc.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("content_md5"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_md5"),
        F.size(sh).alias("n_shingles"),
    )


def text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality scoring — the two-pass corpus
    statistic behind perplexity-style filters: pass 1 aggregates the
    corpus unigram distribution (explode → groupBy token, one
    shuffle; the vocabulary is tiny next to the corpus, so the join
    side broadcasts via AQE); pass 2 scores each doc by its mean
    token log-probability. Every token is in-vocabulary by
    construction (the model IS this corpus), so no smoothing term —
    the statistic is a pure function of exact integer counts, with
    ln() the only float op. libm ln differs by ~1 ulp between JVMs
    and C engines, so the score is rounded to 6 decimals ON BOTH
    SIDES (empirically a fixed point of both engines' ROUND) — the
    exactness strategy of SURVEY §4 applied to the one operator whose
    math cannot be made bit-exact."""
    from ..functions.joins import maybe_broadcast  # noqa: PLC0415

    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    tok = doc.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    # the MODEL (vocabulary + counts) is cached: it is metadata-sized
    # next to the corpus and is read twice (total + score join); the
    # corpus token stream itself is never cached — two scan passes is
    # the statistic's inherent cost (at 100 TB, persist the token
    # table once and both passes read it)
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tf")).cache()
    # corpus total as a broadcast 1-row aggregate (never a driver
    # collect): log p(t) = ln(tf / total)
    total = vocab.agg(F.sum("tf").alias("total"))
    vocab_p = vocab.crossJoin(F.broadcast(total))
    logp = F.log(F.col("tf").cast("double") / F.col("total").cast("double"))
    # size-gated broadcast of the MODEL side: never let the planner
    # build on the corpus-sized token stream (at test SF it otherwise
    # broadcasts the exploded tokens — exactly backwards at scale);
    # past the gate both sides hash-partition on t, and vocab already
    # carries that partitioning from its groupBy
    return (
        tok.join(maybe_broadcast(vocab_p), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


def token_frequency_sketch(
    doc: DataFrame,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 7,
) -> DataFrame:
    """Per-language Count-Min token-frequency sketches — the mergeable
    HEAVY-HITTER state (completing the sketch trio: HLL = distinct,
    CMS = frequency, t-digest = quantiles via approx_percentile): each
    language partition aggregates its token stream once into a CMS
    binary; any language-group's token frequency is then estimated by
    merging stored sketches, never re-scanning text. CMS guarantees
    estimate ∈ [true, true + eps·N] with the given confidence.
    Sketch binaries are engine-specific ⇒ pytest-gated, not an oracle
    key (same rule as the HLL rollup)."""
    tok = doc.select("lang", F.explode(tokens(F.col("text"))).alias("t"))
    return tok.groupBy("lang").agg(
        F.count_min_sketch(
            "t", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("token_cms"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


REP_MAX_RUN = 3           # flag: a token repeated ≥3× consecutively
REP_TOP_BIGRAM_FRAC = 0.10  # flag: one bigram covers >10% of positions
REP_DUP_TOKEN_FRAC = 0.8    # flag: >80% of tokens are repeats


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021,
    public): duplicate-token fraction, most-frequent 1-/2-gram
    coverage, and the longest consecutive same-token run — the
    boilerplate/keyword-stuffing signals n-gram dedup misses. Every
    metric is a pure JVM array expression per document: a narrow map,
    zero shuffle, zero Python, so at 100 TB it is embarrassingly
    parallel. The run length is a strict left fold with struct state
    (order-pinned); DuckDB replays it as a gaps-and-islands window —
    same integers either way. The O(unique×len) mode scan is bounded
    by the per-doc token count, never the corpus."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    n = F.size(toks)

    def mode_count(arr: Column) -> Column:
        return F.array_max(F.transform(
            F.array_distinct(arr),
            lambda d: F.size(F.filter(arr, lambda t: t == d)),
        ))

    def run_step(acc: Column, x: Column) -> Column:
        extended = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            extended.alias("run"),
            F.greatest(acc["best"], extended).alias("best"),
        )

    max_run = F.aggregate(
        toks,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        run_step,
        lambda acc: acc["best"],
    )
    dup_frac = (n - F.size(F.array_distinct(toks))).cast("double") / F.nullif(
        n, F.lit(0))
    top_tok = mode_count(toks).cast("double") / F.nullif(n, F.lit(0))
    top_bi = F.coalesce(
        mode_count(shingles(toks, 2)).cast("double")
        / F.nullif(n - 1, F.lit(0)),
        F.lit(0.0),
    )
    return doc.select(
        "doc_id",
        n.alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        top_bi.alias("top_bigram_frac"),
        max_run.alias("max_run"),
        (
            (max_run >= REP_MAX_RUN)
            | (top_bi > REP_TOP_BIGRAM_FRAC)
            | (dup_frac > REP_DUP_TOKEN_FRAC)
        ).alias("flag_repetitive"),
    )


VOCAB_TOP_K = 20  # merge candidates surfaced per language
VOCAB_PRUNE_BUCKETS = 64  # phase-1 partial-top-K fan-out per language


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-K bigram vocabulary induction — the first
    merge step of BPE-style tokenizer training (the most frequent
    adjacent pair IS the first merge rule), and the corpus statistic
    vocabulary builders rank on. Parity note: the reference has no
    tokenizer surface (its text handling is Trino SQL over conformed
    columns); this is a training-data-pipeline extension.

    Scale shape: bigram generation is a narrow per-doc array map
    (zip of the token array with its own tail — no join); the only
    corpus-sized shuffle is the (lang, bigram) count with map-side
    partial aggregation, so bytes shuffled are bounded by the
    per-partition DISTINCT bigram vocabulary, not the token stream.
    The rank then runs TWO-PHASE: the aggregated vocabulary table is
    bucketed by (lang, hash(bigram) % VOCAB_PRUNE_BUCKETS) and each
    bucket keeps its local top-K — sound because counts are already
    global after the groupBy, so any bigram in the per-lang global
    top-K is necessarily in its bucket's top-K. The final per-lang
    window then sees at most languages × buckets × K rows (metadata),
    never the per-language distinct-bigram vocabulary (billions of
    rows at corpus scale) in a single task. Ties break
    deterministically by bigram text at both phases."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    toks = tokens(F.col("text"))
    bi = doc.select(
        "lang", F.explode(shingles(toks, 2)).alias("bigram")
    )
    counts = bi.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    order = (F.col("n_occurrences").desc(), F.col("bigram"))
    w_bucket = Window.partitionBy(
        "lang",
        F.pmod(F.xxhash64(F.col("bigram")), F.lit(VOCAB_PRUNE_BUCKETS)),
    ).orderBy(*order)
    pruned = (
        counts.withColumn("_pre_rank", F.row_number().over(w_bucket))
        .where(F.col("_pre_rank") <= VOCAB_TOP_K)
        .drop("_pre_rank")
    )
    w = Window.partitionBy("lang").orderBy(*order)
    return (
        pruned.withColumn("vocab_rank", F.row_number().over(w))
        .where(F.col("vocab_rank") <= VOCAB_TOP_K)
        .select("lang", "vocab_rank", "bigram", "n_occurrences")
    )


TFIDF_TOP_K = 5  # keywords surfaced per document


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-K TF-IDF keywords — the classic extraction
    statistic (and the salience weighting behind sparse retrieval).
    Pass 1 aggregates term frequency per (doc, term); pass 2 derives
    document frequency per term from THAT table (one row per
    (doc, term) already, so df is a count, not a distinct) — the df
    side is vocabulary-sized and broadcasts via AQE; N is a broadcast
    1-row count. score = tf · ln(N/df).

    Determinism: libm ln differs in the last ulp across engines, so —
    the text_lm_quality discipline — the score is ROUND(…, 6) on both
    sides and the per-doc rank orders by the ROUNDED score (then term
    text), never the raw double. The rank window shares no state with
    the corpus: it partitions on doc_id over the tf-table rows."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    tf = (
        doc.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_docs = doc.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double")
                        / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("t")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= TFIDF_TOP_K)
        .select("doc_id", "kw_rank", F.col("t").alias("term"),
                "tf", "df", "tfidf")
    )


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/boilerplate signal (low entropy = repeated filler, high
    entropy = encrypted/binary junk) quality pipelines threshold on.
    Pure JVM array expressions: chars → SORTED distinct alphabet →
    per-char counts → -Σ p·ln p folded in alphabet order. Zero
    shuffle, embarrassingly parallel. The ln() sum takes the ROUND 6
    discipline; the alphabet is sorted on BOTH sides so the float
    fold order is pinned (list_distinct order is not guaranteed in
    either engine). O(alphabet × len) per doc, bounded by the doc."""
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    # [\s\S] matches EVERY char incl. newlines — the one split idiom
    # Spark's Java regex and DuckDB's RE2 agree on
    cs = F.regexp_extract_all("text", F.lit(r"[\s\S]"), F.lit(0))
    alphabet = F.array_sort(F.array_distinct(cs))
    n = F.size(cs).cast("double")
    counts = F.transform(
        alphabet, lambda d: F.size(F.filter(cs, lambda c: c == d))
    )
    ent = F.round(
        -F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, c: acc
            + (c.cast("double") / n) * F.log(c.cast("double") / n),
        ),
        6,
    )
    return doc.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(alphabet).alias("n_distinct_chars"),
        ent.alias("char_entropy"),
    )


# Gopher quality-filter thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A1.1
# — public rule set; values are the paper's).  The reference repo has
# no document-quality stage at all, so this is a pure pipeline
# extension, not a parity item.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1     # '#' + '...' per word
GOPHER_MAX_BULLET_RATIO = 0.9     # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_RATIO = 0.3   # lines ending with ... / …
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_N_RULES = 7
# Java \s and RE2 \s disagree on \x0B — both engines split on this
# explicit class so the word lists are identical byte-for-byte.
WS_RE = "[ \\t\\n\\x0B\\f\\r]+"


def gopher_rules(doc: DataFrame) -> DataFrame:
    r"""Gopher repetition-free quality rules per document: word-count
    bounds, mean word length, symbol-to-word ratio ('#' and '...'),
    bullet-start / ellipsis-end line fractions, alphabetic-word ratio
    and a stop-word floor — the published heuristic gate most
    large-scale pretraining pipelines start from.

    One narrow JVM map stage (split + higher-order array folds), zero
    shuffle, embarrassingly parallel at 100 TB.  All metrics are
    int-count ratios (CAST int AS DOUBLE / int with identical
    expression shape in DuckDB) — no libm, so no rounding needed and
    every threshold comparison is bit-identical cross-engine.
    ``rules_passed`` counts the 7 rule booleans; ``keep`` is their
    conjunction.  The whitespace split uses an explicit char class —
    Java's \s includes \x0B where RE2's does not, and the oracle must
    split identically.

    DataFrame-level (r11): a stateless narrow map over ``doc``, so
    the SAME function runs unchanged on batch and streaming frames —
    tests/test_streaming.py pins stream == batch, the pii_scrub/
    sample_gate unification discipline."""
    words = F.filter(F.split(F.col("text"), WS_RE), lambda w: w != "")
    n_words = F.size(words)
    word_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    )
    mean_wl = word_chars.cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    n_hash = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    n_ellipsis = F.size(F.regexp_extract_all("text", F.lit(r"\.\.\."), F.lit(0)))
    sym_ratio = (n_hash + n_ellipsis).cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]")))
    # \z (end of input) in both engines — Java's $ also matches just
    # BEFORE a trailing \r (line-terminator lookahead), RE2's doesn't,
    # so $ would diverge on CRLF-terminated lines.  Tolerate trailing
    # [ \t\r] (mirroring C4_TERMINAL_RE) so CRLF documents — where
    # every non-final line carries a trailing \r after the \n split —
    # still count their '...'-terminated lines toward the rule.
    n_ell_end = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)[ \\t\\r]*\\z"))
    )
    bullet_ratio = n_bullet.cast("double") / n_lines.cast("double")
    ellipsis_ratio = n_ell_end.cast("double") / n_lines.cast("double")
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha_words.cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    stop_hits = _count_in(tokens(F.col("text")), GOPHER_STOP)
    rules = [
        (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS),
        (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN),
        sym_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        bullet_ratio <= GOPHER_MAX_BULLET_RATIO,
        ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO,
        alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO,
        stop_hits >= GOPHER_MIN_STOP_HITS,
    ]
    passed = rules[0].cast("int")
    for r in rules[1:]:
        passed = passed + r.cast("int")
    return doc.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        passed.alias("rules_passed"),
        (passed == GOPHER_N_RULES).cast("int").alias("keep"),
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``gopher_rules`` over the documents table."""
    return gopher_rules(scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT))


# C4 page/line filters (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
# the public clean-crawl rule set; values are the paper's).  Sentence
# count is defined deterministically as the number of [.!?] marks in
# the page (the paper splits heuristically; any fixed definition works
# for the gate as long as both engines share it).
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
# terminal punctuation, allowing trailing spaces/tabs/CR (C4 checks
# the stripped line); \z not $ — Java's $ matches before a final \r.
C4_TERMINAL_RE = "[.!?\"][ \\t\\r]*\\z"


def c4_rules(doc: DataFrame) -> DataFrame:
    """C4 cleaning heuristics per document: lines kept iff they end in
    terminal punctuation AND carry >= 5 words; page dropped on 'lorem
    ipsum', a curly brace, < 3 sentences, or zero kept lines; the
    line-level 'javascript' removals are surfaced as a count.

    Same execution shape as ``text_gopher_rules``: one narrow JVM map
    stage of split + higher-order folds, zero shuffle, embarrassingly
    parallel at 100 TB.  All metrics are int counts or int-ratio
    divisions — no libm — so the DuckDB oracle is bit-identical.
    DataFrame-level and streaming-safe like ``gopher_rules``."""
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)

    def line_words(l):  # noqa: E741
        return F.size(F.filter(F.split(l, WS_RE), lambda w: w != ""))

    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (line_words(l) >= C4_MIN_WORDS_PER_LINE),
    )
    n_kept = F.size(kept)
    n_js = F.size(
        F.filter(lines, lambda l: F.lower(l).contains("javascript"))
    )
    n_sentences = F.size(
        F.regexp_extract_all("text", F.lit("[.!?]"), F.lit(0))
    )
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    keep = (
        (n_sentences >= C4_MIN_SENTENCES)
        & (n_kept >= 1)
        & ~has_lorem
        & ~has_brace
    )
    return doc.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        (n_kept.cast("double") / n_lines.cast("double")).alias(
            "kept_line_ratio"
        ),
        n_sentences.alias("n_sentences"),
        n_js.alias("n_javascript_lines"),
        has_lorem.cast("int").alias("has_lorem_ipsum"),
        has_brace.cast("int").alias("has_curly_brace"),
        keep.cast("int").alias("keep"),
    )


def text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``c4_rules`` over the documents table."""
    return c4_rules(scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT))


# FineWeb quality filters (Penedo et al. 2024, "The FineWeb Datasets"
# §3.1 — the three C4-inspired custom filters; values are the
# paper's). Like the Gopher/C4 gates: a pure pipeline extension (the
# reference has no document-quality stage).
FINEWEB_MIN_PUNCT_RATIO = 0.12    # lines ending in terminal punct
FINEWEB_SHORT_LINE_CHARS = 30
FINEWEB_MAX_SHORT_RATIO = 0.67    # lines shorter than 30 chars
FINEWEB_MAX_DUP_CHAR_RATIO = 0.1  # chars inside duplicated lines


def fineweb_rules(doc: DataFrame) -> DataFrame:
    """FineWeb's three added quality filters per document (the third
    member of the public pretraining-gate trilogy next to
    ``text_gopher_rules`` and ``text_c4_rules``): drop a page when
    the fraction of lines ending in terminal punctuation is ≤ 0.12,
    when the fraction of lines shorter than 30 chars is ≥ 0.67, or
    when the fraction of characters inside DUPLICATED lines is
    ≥ 0.1.

    Duplicate-line detection is SORTED-ADJACENCY, not the naive
    O(L²) per-line recount: sort the line array once and a line is
    duplicated iff it equals a sorted neighbor — O(L log L) per doc,
    and collation doesn't matter because only EQUALITY adjacency is
    read, so any total order groups equal lines identically in both
    engines. Same execution shape as the other two gates: one narrow
    JVM map stage, zero shuffle, int-ratio divisions only (no libm),
    bit-identical DuckDB oracle. DataFrame-level and streaming-safe
    like ``gopher_rules``."""
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_punct = F.size(F.filter(lines, lambda l: l.rlike(C4_TERMINAL_RE)))
    n_short = F.size(
        F.filter(lines,
                 lambda l: F.length(l) < FINEWEB_SHORT_LINE_CHARS))
    s = F.array_sort(lines)
    dup_chars = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n_lines),
            lambda i: F.when(
                ((i > 1) & (F.element_at(s, i) == F.element_at(s, i - 1)))
                | ((i < n_lines)
                   & (F.element_at(s, i) == F.element_at(s, i + 1))),
                F.length(F.element_at(s, i)),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0), lambda a, x: a + x,
    )
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, x: a + x
    )
    punct_ratio = n_punct.cast("double") / n_lines.cast("double")
    short_ratio = n_short.cast("double") / n_lines.cast("double")
    dup_ratio = dup_chars.cast("double") / F.nullif(
        line_chars.cast("double"), F.lit(0.0))
    keep = (
        (punct_ratio > FINEWEB_MIN_PUNCT_RATIO)
        & (short_ratio < FINEWEB_MAX_SHORT_RATIO)
        & (dup_ratio < FINEWEB_MAX_DUP_CHAR_RATIO)
    )
    return doc.select(
        "doc_id",
        n_lines.alias("n_lines"),
        punct_ratio.alias("punct_line_ratio"),
        short_ratio.alias("short_line_ratio"),
        dup_chars.alias("dup_line_chars"),
        dup_ratio.alias("dup_char_ratio"),
        F.coalesce(keep.cast("int"), F.lit(0)).alias("keep"),
    )


def text_fineweb_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``fineweb_rules`` over the documents table."""
    return fineweb_rules(scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT))


def _sql_count_in(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({lst})))"


_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_SHINGLES = (
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
)

QUERIES = {
    "text_gopher_rules": text_gopher_rules,
    "text_c4_rules": text_c4_rules,
    "text_fineweb_rules": text_fineweb_rules,
    "text_entropy": text_entropy,
    "text_tfidf_topk": text_tfidf_topk,
    "text_vocab_topk": text_vocab_topk,
    "text_repetition": text_repetition,
    "text_lm_quality": text_lm_quality,
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

ORACLES = {
    "text_gopher_rules": rf"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(text, '{WS_RE}'),
                       w -> w <> '') AS words,
                   string_split(text, chr(10)) AS lines,
                   LENGTH(text) - LENGTH(replace(text, '#', '')) AS n_hash,
                   len(regexp_extract_all(text, '\.\.\.')) AS n_ellipsis,
                   {_TOKS} AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(words) AS n_words,
                   CAST(list_sum(list_transform(words, w -> LENGTH(w)))
                        AS DOUBLE)
                       / NULLIF(CAST(len(words) AS DOUBLE), 0.0)
                       AS mean_word_len,
                   CAST(n_hash + n_ellipsis AS DOUBLE)
                       / NULLIF(CAST(len(words) AS DOUBLE), 0.0)
                       AS symbol_ratio,
                   CAST(len(list_filter(lines,
                            l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
                       / CAST(len(lines) AS DOUBLE) AS bullet_ratio,
                   CAST(len(list_filter(lines,
                            l -> regexp_matches(l, '(\.\.\.|…)[ \t\r]*\z')))
                        AS DOUBLE)
                       / CAST(len(lines) AS DOUBLE) AS ellipsis_ratio,
                   CAST(len(list_filter(words,
                            l -> regexp_matches(l, '[A-Za-z]'))) AS DOUBLE)
                       / NULLIF(CAST(len(words) AS DOUBLE), 0.0)
                       AS alpha_word_ratio,
                   {_sql_count_in(GOPHER_STOP)} AS stop_hits
            FROM t
        )
        SELECT doc_id, n_words, mean_word_len, symbol_ratio,
               bullet_ratio, ellipsis_ratio, alpha_word_ratio,
               stop_hits, rules_passed,
               CAST(rules_passed = {GOPHER_N_RULES} AS INTEGER) AS keep
        FROM (
            SELECT *,
                   CAST(n_words >= {GOPHER_MIN_WORDS}
                        AND n_words <= {GOPHER_MAX_WORDS} AS INTEGER)
                   + CAST(mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
                          AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
                          AS INTEGER)
                   + CAST(symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
                          AS INTEGER)
                   + CAST(bullet_ratio <= {GOPHER_MAX_BULLET_RATIO}
                          AS INTEGER)
                   + CAST(ellipsis_ratio <= {GOPHER_MAX_ELLIPSIS_RATIO}
                          AS INTEGER)
                   + CAST(alpha_word_ratio >= {GOPHER_MIN_ALPHA_WORD_RATIO}
                          AS INTEGER)
                   + CAST(stop_hits >= {GOPHER_MIN_STOP_HITS} AS INTEGER)
                       AS rules_passed
            FROM m
        )
    """,
    "text_fineweb_rules": rf"""
        WITH t AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS lines,
                   list_sort(string_split(text, chr(10))) AS s
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(lines) AS n_lines,
                   len(list_filter(lines,
                       l -> regexp_matches(l, '{C4_TERMINAL_RE}')))
                       AS n_punct,
                   len(list_filter(lines,
                       l -> LENGTH(l) < {FINEWEB_SHORT_LINE_CHARS}))
                       AS n_short,
                   list_sum(list_transform(range(1, len(s) + 1),
                       i -> CASE WHEN (i > 1 AND s[i] = s[i-1])
                                 OR (i < len(s) AND s[i] = s[i+1])
                            THEN LENGTH(s[i]) ELSE 0 END))
                       AS dup_chars,
                   list_sum(list_transform(lines, l -> LENGTH(l)))
                       AS line_chars
            FROM t
        ),
        r AS (
            SELECT doc_id, n_lines,
                   CAST(n_punct AS DOUBLE) / CAST(n_lines AS DOUBLE)
                       AS punct_line_ratio,
                   CAST(n_short AS DOUBLE) / CAST(n_lines AS DOUBLE)
                       AS short_line_ratio,
                   CAST(dup_chars AS INTEGER) AS dup_line_chars,
                   CAST(dup_chars AS DOUBLE)
                       / NULLIF(CAST(line_chars AS DOUBLE), 0.0)
                       AS dup_char_ratio
            FROM m
        )
        SELECT doc_id, n_lines, punct_line_ratio, short_line_ratio,
               dup_line_chars, dup_char_ratio,
               CAST(COALESCE(
                   punct_line_ratio > {FINEWEB_MIN_PUNCT_RATIO}
                   AND short_line_ratio < {FINEWEB_MAX_SHORT_RATIO}
                   AND dup_char_ratio < {FINEWEB_MAX_DUP_CHAR_RATIO},
                   FALSE) AS INTEGER) AS keep
        FROM r
    """,
    "text_c4_rules": rf"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split(text, chr(10)) AS lines
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(lines) AS n_lines,
                   len(list_filter(lines, l ->
                       regexp_matches(l, '{C4_TERMINAL_RE}')
                       AND len(list_filter(
                               regexp_split_to_array(l, '{WS_RE}'),
                               w -> w <> '')) >= {C4_MIN_WORDS_PER_LINE}))
                       AS n_kept_lines,
                   len(list_filter(lines,
                       l -> contains(lower(l), 'javascript')))
                       AS n_javascript_lines,
                   len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
                   contains(lower(text), 'lorem ipsum') AS lorem,
                   contains(text, '{{') AS brace
            FROM t
        )
        SELECT doc_id, n_lines, n_kept_lines,
               CAST(n_kept_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
                   AS kept_line_ratio,
               n_sentences, n_javascript_lines,
               CAST(lorem AS INTEGER) AS has_lorem_ipsum,
               CAST(brace AS INTEGER) AS has_curly_brace,
               CAST(n_sentences >= {C4_MIN_SENTENCES}
                    AND n_kept_lines >= 1
                    AND NOT lorem AND NOT brace AS INTEGER) AS keep
        FROM m
    """,
    "text_entropy": r"""
        WITH t AS (
            SELECT doc_id, text,
                   regexp_extract_all(text, '[\s\S]') AS cs
            FROM documents
        ),
        a AS (
            SELECT doc_id, text, cs,
                   list_sort(list_distinct(cs)) AS alphabet
            FROM t
        )
        SELECT doc_id,
               LENGTH(text) AS len_chars,
               len(alphabet) AS n_distinct_chars,
               ROUND(-list_reduce(
                   list_prepend(0.0, list_transform(alphabet,
                       d -> (CAST(len(list_filter(cs, c -> c = d))
                                  AS DOUBLE) / CAST(len(cs) AS DOUBLE))
                            * ln(CAST(len(list_filter(cs, c -> c = d))
                                      AS DOUBLE)
                                 / CAST(len(cs) AS DOUBLE)))),
                   (x, y) -> x + y), 6) AS char_entropy
        FROM a
    """,
    "text_tfidf_topk": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS t FROM documents
        ),
        tf AS (
            SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ),
        dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.t, tf.tf, dft.df,
                   ROUND(CAST(tf.tf AS DOUBLE)
                         * ln(CAST(n.n_docs AS DOUBLE)
                              / CAST(dft.df AS DOUBLE)), 6) AS tfidf
            FROM tf JOIN dft USING (t) CROSS JOIN n
        )
        SELECT doc_id, kw_rank, term, tf, df, tfidf FROM (
            SELECT doc_id, t AS term, tf, df, tfidf,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, t)
                        AS INTEGER) AS kw_rank
            FROM scored
        ) WHERE kw_rank <= {TFIDF_TOP_K}
    """,
    "text_vocab_topk": f"""
        WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
        b AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])) AS bigram
            FROM t
        ),
        c AS (
            SELECT lang, bigram, COUNT(*) AS n_occurrences
            FROM b GROUP BY 1, 2
        )
        SELECT lang, vocab_rank, bigram, n_occurrences FROM (
            SELECT lang, bigram, n_occurrences,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY lang
                        ORDER BY n_occurrences DESC, bigram
                   ) AS INTEGER) AS vocab_rank
            FROM c
        ) WHERE vocab_rank <= {VOCAB_TOP_K}
    """,
    "text_repetition": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        e AS (SELECT doc_id, unnest(toks) AS tk,
                     generate_subscripts(toks, 1) AS pos FROM t),
        r AS (SELECT doc_id, tk, pos,
                     pos - ROW_NUMBER() OVER (PARTITION BY doc_id, tk
                                              ORDER BY pos) AS grp
              FROM e),
        runs AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS run_len
                 FROM r GROUP BY doc_id, tk, grp),
        mr AS (SELECT doc_id, MAX(run_len) AS max_run
               FROM runs GROUP BY doc_id),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS dup_token_frac,
                   CAST(list_max(list_transform(list_distinct(toks),
                        d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS top_token_frac,
                   COALESCE(
                       CAST(list_max(list_transform(
                            list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i+1]),
                            d -> len(list_filter(
                                 list_transform(range(1, len(toks)),
                                                i -> toks[i] || ' ' || toks[i+1]),
                                 x -> x = d)))) AS DOUBLE)
                           / NULLIF(len(toks) - 1, 0),
                       0.0) AS top_bigram_frac
            FROM t
        )
        SELECT m.doc_id, m.n_tokens, m.dup_token_frac, m.top_token_frac,
               m.top_bigram_frac,
               COALESCE(mr.max_run, 0) AS max_run,
               (COALESCE(mr.max_run, 0) >= {REP_MAX_RUN}
                OR m.top_bigram_frac > {REP_TOP_BIGRAM_FRAC}
                OR m.dup_token_frac > {REP_DUP_TOKEN_FRAC})
                   AS flag_repetitive
        FROM m LEFT JOIN mr USING (doc_id)
    """,
    "text_lm_quality": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tk FROM documents),
        v AS (SELECT tk, COUNT(*) AS tf FROM t GROUP BY 1),
        tot AS (SELECT SUM(tf) AS total FROM v)
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               ROUND(SUM(ln(CAST(v.tf AS DOUBLE) / CAST(tot.total AS DOUBLE)))
                     / COUNT(*), 6) AS avg_logprob
        FROM t JOIN v USING (tk) CROSS JOIN tot
        GROUP BY 1
    """,
    "text_token_stats": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               LENGTH(text) AS len_chars,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_unique_tokens,
               CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE)
                   / NULLIF(len(toks), 0) AS avg_token_len
        FROM t
    """,
    "text_quality_score": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               LENGTH(text) AS len_chars,
               CAST(LENGTH(regexp_replace(text, '{ALPHA_RE}', '', 'g')) AS DOUBLE)
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0) AS alpha_ratio,
               CAST(LENGTH(regexp_replace(text, '{DIGIT_RE}', '', 'g')) AS DOUBLE)
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0) AS digit_ratio,
               CAST(LENGTH(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE)
                   / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0) AS punct_ratio,
               CAST({_sql_count_in(EN_STOP)} AS DOUBLE)
                   / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS stopword_ratio,
               0.4 * (CAST(LENGTH(regexp_replace(text, '{ALPHA_RE}', '', 'g')) AS DOUBLE)
                      / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0))
               + 0.3 * (CAST({_sql_count_in(EN_STOP)} AS DOUBLE)
                        / NULLIF(CAST(len(toks) AS DOUBLE), 0.0))
               + 0.2 * (1.0 - CAST(LENGTH(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE)
                        / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0))
               + 0.1 * (1.0 - CAST(LENGTH(regexp_replace(text, '{DIGIT_RE}', '', 'g')) AS DOUBLE)
                        / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0))
                   AS quality_score
        FROM t
    """,
    "text_langid": f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               lang AS lang_declared,
               {_sql_count_in(EN_STOP)} AS en_hits,
               {_sql_count_in(ES_STOP)} AS es_hits,
               {_sql_count_in(FR_STOP)} AS fr_hits,
               {_sql_count_in(DE_STOP)} AS de_hits,
               CASE
                 WHEN {_sql_count_in(EN_STOP)} >= {_sql_count_in(ES_STOP)}
                  AND {_sql_count_in(EN_STOP)} >= {_sql_count_in(FR_STOP)}
                  AND {_sql_count_in(EN_STOP)} >= {_sql_count_in(DE_STOP)} THEN 'en'
                 WHEN {_sql_count_in(ES_STOP)} >= {_sql_count_in(FR_STOP)}
                  AND {_sql_count_in(ES_STOP)} >= {_sql_count_in(DE_STOP)} THEN 'es'
                 WHEN {_sql_count_in(FR_STOP)} >= {_sql_count_in(DE_STOP)} THEN 'fr'
                 ELSE 'de'
               END AS lang_pred
        FROM t
    """,
    "text_fingerprint": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, toks, {_SHINGLES} AS sh FROM t)
        SELECT doc_id,
               md5(array_to_string(toks, ' ')) AS content_md5,
               list_min(list_transform(sh, x -> md5(x))) AS min_shingle_md5,
               len(sh) AS n_shingles
        FROM s
    """,
}
