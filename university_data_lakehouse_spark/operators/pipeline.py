"""Corpus-construction operators for training-data pipelines
(SURVEY §2.12): deterministic stratified sampling, token-budget
packing, benchmark decontamination, and PII redaction.

These are the steps between "raw deduped documents" and "training
shards": choose a per-domain mixture, pack documents into
context-length bins, drop eval-set contamination, scrub PII. All four
are pure JVM expressions / window functions (zero Python UDFs) and
all four are oracle-checked.

Scale notes (SURVEY §6):
- sampling + PII are narrow map stages — embarrassingly parallel;
- the sampling decision is a pure hash of the row key, so re-runs
  and backfills pick the SAME rows (no RNG state, no seed file);
- packing windows are PARTITIONED (by lang here, by shard key at
  100 TB) — no global sort, one shuffle per partition column;
- decontamination reuses the cached shingle stage of the dedup suite
  and keeps only (doc_id, shingle) through its one join; the
  benchmark side is distinct-projected first (small — benchmark
  suites are tiny next to a corpus), so AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import TOKEN_RE
from ..sources.loader import DOC_SCATTER_BPT, load_table, scatter
from .dedup import _SH_CTE, _doc_shingle_sets

# --- stratified sampling -------------------------------------------------
# Per-stratum keep rates expressed as exact 32-bit hex thresholds: a row
# is kept iff the first 8 hex chars of md5('sample:' || doc_id) sort
# below the stratum threshold. Fixed-width lowercase hex compares
# lexicographically == numerically, so the SAME predicate runs in Spark
# and DuckDB with no float or integer-parsing dialect hazards.
SAMPLE_RATE_HEX = {"en": "80000000"}      # 0.5 for the dominant stratum
SAMPLE_DEFAULT_HEX = "40000000"           # 0.25 elsewhere

PACK_BUDGET = 256                         # tokens per packed bin

CONTAM_BENCH_MOD = 10                     # doc_id % 10 == 0 -> benchmark
CONTAM_TAU = 0.5                          # shingle-overlap flag threshold

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def _sample_key() -> F.Column:
    return F.substring(
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8
    )


def _sample_thresh() -> F.Column:
    thresh = F.lit(SAMPLE_DEFAULT_HEX)
    for lang, hx in SAMPLE_RATE_HEX.items():
        thresh = F.when(F.col("lang") == lang, F.lit(hx)).otherwise(thresh)
    return thresh


def sample_gate(doc: DataFrame) -> DataFrame:
    """DataFrame-level stratified sample gate — a stateless narrow
    map, so the SAME transform runs on a batch frame or a streaming
    one (pytest: tests/test_streaming.py stream/batch equivalence)."""
    return (
        doc.select("doc_id", "lang", _sample_key().alias("sample_key"))
        .where(F.col("sample_key") < _sample_thresh())
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling (domain-mixture
    weighting): keep a doc iff its salted content-key hash falls under
    the stratum's rate threshold. Hash-gated sampling is the 100 TB
    answer to `df.sample()` — no RNG state, stable under re-runs,
    partitioning, AND late-arriving data (a doc's fate never depends
    on what else is in its partition)."""
    return sample_gate(load_table(spark, sf_dir, "documents"))


# --- weighted (temperature) mixture resampling ---------------------------
# Per-stratum epoch weights as (whole_epochs, fractional_hex) pairs: a
# doc yields whole_epochs copies plus one more iff its salted hash
# falls under the fractional threshold — deterministic upsampling WITH
# replacement (weights may exceed 1), the way temperature-flattened
# domain mixtures repeat small high-quality domains. Same fixed-width
# hex discipline as SAMPLE_RATE_HEX.
WEIGHTED_EPOCHS = {
    "en": (0, "80000000"),   # 0.5  — downsample the dominant stratum
    "zh": (1, "00000000"),   # 1.0
    "es": (1, "80000000"),   # 1.5
    "fr": (2, "00000000"),   # 2.0
    "de": (2, "40000000"),   # 2.25 — upsample the smallest stratum
}
WEIGHTED_DEFAULT = (1, "00000000")


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-mixture resampling: each doc emits
    floor(weight) copies plus a hash-gated extra for the fractional
    part, tagged with an epoch index — upsampling WITH replacement,
    which plain keep/drop gates cannot express. Stateless narrow map +
    explode (fan-out ≤ ceil(max weight), never data-dependent), no RNG
    state, so re-runs, backfills and stream ticks repeat the SAME
    copies. At 100 TB the explode multiplies only the id/lang
    projection; shard assembly joins text back by doc_id afterwards."""
    doc = load_table(spark, sf_dir, "documents")
    whole = F.lit(WEIGHTED_DEFAULT[0])
    frac_hex = F.lit(WEIGHTED_DEFAULT[1])
    for lang, (w, hx) in WEIGHTED_EPOCHS.items():
        whole = F.when(F.col("lang") == lang, F.lit(w)).otherwise(whole)
        frac_hex = F.when(F.col("lang") == lang, F.lit(hx)).otherwise(frac_hex)
    key = F.substring(
        F.md5(F.concat(F.lit("weight:"), F.col("doc_id").cast("string"))),
        1, 8)
    n_copies = whole + F.when(key < frac_hex, 1).otherwise(0)
    return (
        doc.select("doc_id", "lang", n_copies.alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id", "lang", "n_copies",
            # sequence(int, int) yields array<int>, so epoch is INT
            # without a cast (a cast cannot wrap a generator anyway)
            F.explode(
                F.sequence(F.lit(0), F.col("n_copies") - 1)
            ).alias("epoch"),
        )
    )


def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential token-budget packing: within each lang partition,
    docs are laid out in doc_id order and cut into bins of
    PACK_BUDGET tokens — bin_id = floor(tokens-before-this-doc /
    budget), the contiguous-fill packing a shard writer uses. The
    window is PARTITIONED (lang here, shard key at scale) so there is
    no global sort; token counts are ints, so the running sum is
    exact in any engine."""
    doc = load_table(spark, sf_dir, "documents")
    from ..functions.textfns import tokens  # noqa: PLC0415

    nt = F.size(tokens(F.col("text")))
    w = Window.partitionBy("lang").orderBy("doc_id")
    counted = doc.select("doc_id", "lang", nt.alias("n_tokens"))
    binned = counted.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / F.lit(PACK_BUDGET)
        ),
    )
    w2 = Window.partitionBy("lang", "bin_id").orderBy("doc_id")
    return binned.withColumn("pos_in_bin", F.row_number().over(w2))


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs whose 3-gram
    shingles overlap the held-out benchmark set (doc_id %
    CONTAM_BENCH_MOD == 0 plays the benchmark here). The join carries
    only (doc_id, shingle) against the distinct-projected benchmark
    shingle set — at 100 TB the benchmark side is tiny and
    broadcasts; training docs never join each other."""
    sets = _doc_shingle_sets(spark, sf_dir)
    sh = sets.select("doc_id", F.explode("ss").alias("s"))
    bench = (
        sh.where(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("s").distinct()
    )
    hits = (
        sh.where(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT).where(
        F.col("doc_id") % CONTAM_BENCH_MOD != 0
    )
    ratio = F.coalesce(
        F.col("n_hits").cast("double") / F.nullif(F.col("n"), F.lit(0)),
        F.lit(0.0),
    )
    return (
        doc.select("doc_id")
        .join(sets.select("doc_id", "n"), "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_contaminated"),
            ratio.alias("contamination_ratio"),
            (ratio >= CONTAM_TAU).alias("is_contaminated"),
        )
    )


SEM_CONTAM_MOD = 10      # vec_id % 10 == 0 → held-out benchmark side
SEM_CONTAM_TAU = 0.4     # embedding-cosine contamination threshold


def text_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination: flag training docs whose
    EMBEDDING is close (cosine ≥ τ) to any held-out benchmark doc —
    the paraphrase-level leak the n-gram `text_contamination` pass
    cannot see. Candidates come from the banded hyperplane LSH
    (benchmark side broadcast — benchmark suites are tiny next to a
    corpus), exact cosine verify on candidates only; per-doc hit
    count and max benchmark similarity reported, flag from verified
    hits. Deterministic planes make the whole approximate pipeline
    replay in DuckDB — oracle-checked."""
    from .similarity import (  # noqa: PLC0415
        _vectors,
        dot,
        lsh_candidates,
        lsh_signature,
    )

    v = _vectors(spark, sf_dir).withColumn(
        "sig", lsh_signature(F.col("v"))).cache()
    bench = v.where(F.col("vec_id") % SEM_CONTAM_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("v_q"),
        F.col("nrm").alias("n_q"),
        F.col("sig").alias("sig_q"),
    )
    train = v.where(F.col("vec_id") % SEM_CONTAM_MOD != 0)
    cands = lsh_candidates(train, bench)
    cos = dot(F.col("v_q"), F.col("v")) / (F.col("n_q") * F.col("nrm"))
    hits = (
        cands.join(train.select("vec_id", "v", "nrm"), "vec_id")
        .join(F.broadcast(bench.select("query_id", "v_q", "n_q")),
              "query_id")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= SEM_CONTAM_TAU)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_hits"),
             F.max("cosine").alias("mx"))
    )
    return (
        train.select(F.col("vec_id").alias("doc_id"))
        .join(hits.withColumnRenamed("vec_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_semantic_hits"),
            F.col("mx").alias("max_benchmark_cosine"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def _augmented_text() -> F.Column:
    """Documents with synthetic PII appended (deterministic function
    of doc_id, same construction replayed in the oracle): docs get an
    email + phone (doc_id % 4 == 0), a phone only (% 4 == 1), or
    nothing. The testdata contains no organic PII, so — as with
    multimodal payloads — the operator's detect/scrub mechanics run
    on bytes it genuinely has to find."""
    email = F.concat(
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return (
        F.when(F.col("doc_id") % 4 == 0, F.concat("text", email, phone))
        .when(F.col("doc_id") % 4 == 1, F.concat("text", phone))
        .otherwise(F.col("text"))
    )


def pii_scrub(doc: DataFrame) -> DataFrame:
    """DataFrame-level PII detect + redact — stateless narrow map,
    identical on batch and streaming frames (pytest: stream/batch
    equivalence in tests/test_streaming.py)."""
    aug = _augmented_text()
    clean = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact email/phone patterns (dialect-
    portable character-class regexes — no backrefs/lookarounds, so
    Java regex and RE2 agree). One narrow map stage; the redacted
    text is fingerprinted (md5) so the output stays thin."""
    return pii_scrub(scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT))


# --- context-window chunking ---------------------------------------------
# Sliding character windows with overlap: the pre-tokenization split a
# training pipeline applies to documents longer than the model context.
# Chunks start at 0, STRIDE, 2·STRIDE, …; each spans CHUNK_SIZE chars,
# so consecutive chunks overlap by CHUNK_SIZE - STRIDE chars and the
# final chunk is the (non-empty, since SIZE > STRIDE) tail.
CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def chunk_docs(doc: DataFrame) -> DataFrame:
    """Frame-level chunking — a stateless narrow map + bounded
    explode, so the SAME transform runs on a batch frame or a
    streaming one (pytest: tests/test_streaming.py stream/batch
    equivalence)."""
    n = F.length("text")
    extra = F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(CHUNK_SIZE)).cast("double") / F.lit(CHUNK_STRIDE)),
    )
    chunk = F.col("text").substr(
        F.col("chunk_idx") * CHUNK_STRIDE + 1, F.lit(CHUNK_SIZE)
    )
    return (
        doc.select(
            "doc_id", "lang", "text",
            (F.lit(1) + extra).cast("int").alias("n_chunks"),
        )
        .select(
            "doc_id", "lang", "n_chunks", "text",
            F.explode(
                F.sequence(F.lit(0), F.col("n_chunks") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id", "lang", "n_chunks", "chunk_idx",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (fixed width + overlap): each
    doc yields ceil-spaced windows of CHUNK_SIZE chars every
    CHUNK_STRIDE — the canonical long-document split ahead of
    tokenization. Pure narrow map + bounded explode (fan-out =
    len/STRIDE, data-independent of other rows): no shuffle at all, so
    at 100 TB it runs at scan speed and the chunk count per task is
    proportional to its input bytes. Chunk identity travels as an md5
    fingerprint so the output stays thin; shard assembly re-slices the
    text by (doc_id, chunk_idx) downstream."""
    return chunk_docs(load_table(spark, sf_dir, "documents"))


# --- deterministic train/validation/test split ---------------------------
# Same fixed-width-hex hash-gate discipline as SAMPLE_RATE_HEX: the
# split is a pure function of doc_id, so it is stable under re-runs,
# repartitioning, and late-arriving data, and a doc can NEVER migrate
# between splits as the corpus grows (the leakage mode of
# randomSplit()/row_number()-based splits).
SPLIT_TRAIN_HEX = "e6666666"   # ~0.90 of the 32-bit key space
SPLIT_VAL_HEX = "f3333333"     # next ~0.05; remainder is test


def split_assign(doc: DataFrame) -> DataFrame:
    """Frame-level split assignment (see :func:`sample_split`) —
    stateless narrow map, so it runs UNCHANGED on a readStream of the
    documents table (tests/test_streaming.py proves stream == batch,
    the text-gate unification discipline)."""
    key = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
    )
    return doc.select(
        "doc_id", "lang", key.alias("split_key")
    ).withColumn(
        "split",
        F.when(F.col("split_key") < SPLIT_TRAIN_HEX, "train")
        .when(F.col("split_key") < SPLIT_VAL_HEX, "validation")
        .otherwise("test"),
    )


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment: a doc's split
    is decided by where the first 8 hex chars of md5('split:'||doc_id)
    fall between fixed thresholds. Stateless narrow map — no RNG, no
    global count, no coordination — so the assignment is reproducible
    on any cluster layout and append-only growth never reshuffles
    earlier docs across splits."""
    return split_assign(load_table(spark, sf_dir, "documents"))


QUALITY_TAU = 0.645     # documents' scores cluster 0.63-0.66; ~median


def corpus_build_df(doc: DataFrame) -> DataFrame:
    """Frame-level one-shot corpus pipeline over a documents frame —
    shared by the batch query and the incremental bootstrap
    (plans/corpus.py), so both produce definitionally identical
    shards:

        exact-dedup canonicals → quality filter (score ≥ τ) →
        stratified sample gate → token-budget bin packing

    Each stage is the already-oracle-checked operator expression;
    composition adds only doc_id equi-joins (which AQE broadcasts —
    the filter stages emit thin key sets) and the final partitioned
    packing window. The quality threshold comparison is cross-engine
    safe because the score itself hash-matches DuckDB bit-for-bit."""
    from .text import quality_score_expr  # noqa: PLC0415
    from ..functions.textfns import tokens  # noqa: PLC0415

    wdup = Window.partitionBy(F.md5("text"))
    canon = (
        doc.select(
            "doc_id",
            (F.col("doc_id") != F.min("doc_id").over(wdup)).alias("is_dup"),
        )
        .where(~F.col("is_dup"))
        .select("doc_id")
    )
    good = (
        doc.select("doc_id", quality_score_expr().alias("quality_score"))
        .where(F.col("quality_score") >= QUALITY_TAU)
        .select("doc_id")
    )
    survivors = doc.join(canon, "doc_id").join(good, "doc_id")
    sampled = sample_gate(survivors).select("doc_id", "lang")
    counted = (
        sampled.join(doc.select("doc_id", "text"), "doc_id")
        .select("doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    binned = counted.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / F.lit(PACK_BUDGET)
        ),
    )
    w2 = Window.partitionBy("lang", "bin_id").orderBy("doc_id")
    return binned.withColumn("pos_in_bin", F.row_number().over(w2))


def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus construction pass — the pipeline a shard
    writer actually runs (see :func:`corpus_build_df`)."""
    return corpus_build_df(scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT))


def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest over the packed corpus — the index a
    trainer's data loader reads instead of listing files: one row per
    (lang, bin_id) with doc count, token total, doc_id range, and an
    order-canonical md5 of the member list (sorted doc_ids joined) so
    shard integrity is checkable without re-reading text. One extra
    aggregation on the packing output, sharing its (lang) shuffle
    lineage; the manifest is shard-count-sized — tiny at any SF."""
    shards = corpus_build(spark, sf_dir)
    members = F.array_join(
        F.transform(F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string")), ",")
    return shards.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(members).alias("members_md5"),
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus composition report — the funnel numbers a
    data curator reads before training (see :func:`corpus_stats_df`,
    the frame-level twin any source can feed)."""
    return corpus_stats_df(load_table(spark, sf_dir, "documents"))


def corpus_stats_df(doc: DataFrame) -> DataFrame:
    """Composition report over an arbitrary documents frame: docs →
    exact-dedup canonicals → quality survivors → sampled, with token
    totals and the dup rate. One window for the dup flag (shuffle on
    the content hash) and ONE groupBy lang with conditional
    aggregates — no joins, no second scan; every stage predicate is
    the pipeline's own definition (shared expression helpers), so
    this report can never drift from what corpus_build actually
    does."""
    from .text import quality_score_expr  # noqa: PLC0415
    from ..functions.textfns import tokens  # noqa: PLC0415

    wdup = Window.partitionBy(F.md5("text"))
    flagged = doc.select(
        "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        (F.col("doc_id") == F.min("doc_id").over(wdup)).alias("canon"),
        (quality_score_expr() >= QUALITY_TAU).alias("q"),
        (_sample_key() < _sample_thresh()).alias("samp"),
    )
    keep = F.col("canon") & F.col("q") & F.col("samp")
    n_docs = F.count(F.lit(1))
    n_canonical = F.sum(F.col("canon").cast("long"))
    return flagged.groupBy("lang").agg(
        n_docs.alias("n_docs"),
        n_canonical.alias("n_canonical"),
        F.sum((F.col("canon") & F.col("q")).cast("long")).alias("n_quality"),
        F.sum(keep.cast("long")).alias("n_sampled"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(keep, F.col("n_tokens")).otherwise(F.lit(0)))
        .alias("sampled_tokens"),
        (F.lit(1.0) - n_canonical.cast("double") / n_docs.cast("double"))
        .alias("dup_rate"),
    )


# target token shares for the training mixture (the curated-mixture
# config a data lead sets; sums to 1.0)
MIXTURE_TARGETS = {
    "en": 0.40, "zh": 0.20, "es": 0.15, "fr": 0.15, "de": 0.10,
}
MIXTURE_MAX_UPSAMPLE = 5.0   # cap the weight of under-represented langs


def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning: compare each language's ACTUAL
    token share against the configured TARGET share and derive the
    sampling weight that reshapes the corpus (weight = target/actual,
    capped at MIXTURE_MAX_UPSAMPLE so a tiny language cannot explode
    its epoch count) — the number that feeds sample_weighted's
    per-stratum epochs. ONE narrow map (token counts per doc) + ONE
    lang aggregate; shares divide exact integer token totals, so the
    doubles are bit-identical across engines. A language absent from
    the target config gets weight 0 (excluded from the mixture).

    Zero-token guard (r6 ADVICE): a language whose docs ALL tokenize
    to zero tokens (plausible for non-Latin scripts under the
    [a-z0-9]+ tokenizer) has actual_share 0, and target/actual would
    be 0/0 = NaN — which Spark's NaN-is-largest semantics would turn
    into LEAST(NaN, cap) = cap, silently assigning the MAX upsample.
    The weight therefore branches on the EXACT integer n_tokens > 0
    (never on the double share, where NaN > 0 is true in Spark): a
    zero-token lang gets the cap if it is targeted (can't upsample
    what has no tokens — surface it at the cap for the operator to
    flag) and 0.0 if untargeted; the oracle mirrors the branch."""
    from ..functions.textfns import tokens  # noqa: PLC0415

    doc = scatter(load_table(spark, sf_dir, "documents"),
                  bytes_per_task=DOC_SCATTER_BPT)
    per_lang = doc.select(
        "lang", F.size(tokens(F.col("text"))).alias("nt")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
    total = per_lang.agg(F.sum("n_tokens").alias("total_tokens"))
    target = F.coalesce(
        *[F.when(F.col("lang") == lg, F.lit(share))
          for lg, share in sorted(MIXTURE_TARGETS.items())],
        F.lit(0.0),
    )
    actual = (F.col("n_tokens").cast("double")
              / F.col("total_tokens").cast("double"))
    return per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_tokens",
        actual.alias("actual_share"),
        target.alias("target_share"),
        F.when(
            F.col("n_tokens") > 0,
            F.least(target / actual, F.lit(MIXTURE_MAX_UPSAMPLE)),
        ).otherwise(
            F.when(target > 0, F.lit(MIXTURE_MAX_UPSAMPLE))
            .otherwise(F.lit(0.0))
        ).alias("mixture_weight"),
    )


QUERIES = {
    "corpus_mixture_plan": corpus_mixture_plan,
    "sample_stratified": sample_stratified,
    "sample_weighted": sample_weighted,
    "sample_split": sample_split,
    "chunk_documents": chunk_documents,
    "corpus_build": corpus_build,
    "corpus_stats": corpus_stats,
    "corpus_manifest": corpus_manifest,
    "pack_token_bins": pack_token_bins,
    "text_contamination": text_contamination,
    "text_contamination_semantic": text_contamination_semantic,
    "text_pii_redact": text_pii_redact,
}


def _sem_contam_oracle() -> str:
    """Full SQL replay of the semantic decontamination pipeline:
    band-packed signatures (embedded ±1 plane chains), band melt,
    bench×train bucket candidates, exact-cosine verify, per-doc hit
    aggregate — the same replay technique as the sim_knn_lsh oracle.
    The ``v`` CTE applies ``_SQL_VALID_VEC``, twinning the Spark
    side's ``_vectors`` entry filter (r11 — previously parity on
    dirty corpora held only incidentally)."""
    from .similarity import (  # noqa: PLC0415
        _SELF_DOT,
        _SQL_VALID_VEC,
        BAND_SQL,
        LSH_BANDS,
        lsh_band_sql_cols,
    )

    dotqv = ("list_reduce(list_transform(range(1, 65), "
             "i -> q.vv[i] * t.vv[i]), (x, y) -> x + y)")
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv,
                   sqrt({_SELF_DOT}) AS nrm
            FROM embeddings WHERE {_SQL_VALID_VEC}
        ),
        sig AS (SELECT vec_id, {lsh_band_sql_cols()} FROM v),
        melted AS (
            SELECT vec_id, j AS band, {BAND_SQL} AS bsig
            FROM sig, (SELECT unnest(range(0, {LSH_BANDS})) AS j)
        ),
        cand AS (
            SELECT DISTINCT t.vec_id AS doc_id, q.vec_id AS bench_id
            FROM melted t
            JOIN melted q ON t.band = q.band AND t.bsig = q.bsig
            WHERE q.vec_id % {SEM_CONTAM_MOD} = 0
              AND t.vec_id % {SEM_CONTAM_MOD} <> 0
        ),
        scored AS (
            SELECT c.doc_id, {dotqv} / (q.nrm * t.nrm) AS cosine
            FROM cand c
            JOIN v t ON t.vec_id = c.doc_id
            JOIN v q ON q.vec_id = c.bench_id
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits, MAX(cosine) AS mx
            FROM scored WHERE cosine >= {SEM_CONTAM_TAU} GROUP BY 1
        )
        SELECT t.vec_id AS doc_id,
               COALESCE(h.n_hits, 0) AS n_semantic_hits,
               h.mx AS max_benchmark_cosine,
               COALESCE(h.n_hits, 0) > 0 AS is_contaminated
        FROM v t LEFT JOIN hits h ON h.doc_id = t.vec_id
        WHERE t.vec_id % {SEM_CONTAM_MOD} <> 0
    """

_THRESH_SQL = "CASE WHEN lang = 'en' THEN '{en}' ELSE '{other}' END".format(
    en=SAMPLE_RATE_HEX["en"], other=SAMPLE_DEFAULT_HEX
)

_AUG_SQL = (
    "CASE WHEN doc_id % 4 = 0 THEN text || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com' || ' call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "WHEN doc_id % 4 = 1 THEN text || ' call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "ELSE text END"
)

def _corpus_build_oracle() -> str:
    """Chained-CTE replay: each stage embeds the stage-operator's own
    oracle (dedup_exact window, text_quality_score subquery, the
    sample-gate predicate, the packing windows)."""
    from .text import ORACLES as TEXT_ORACLES  # noqa: PLC0415

    quality_sql = TEXT_ORACLES["text_quality_score"]
    return f"""
        WITH canon AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
                           AS is_dup
                FROM documents
            ) WHERE NOT is_dup
        ),
        good AS (
            SELECT doc_id FROM ({quality_sql})
            WHERE quality_score >= {QUALITY_TAU}
        ),
        samp AS (
            SELECT d.doc_id, d.lang, d.text
            FROM documents d
            JOIN canon ON canon.doc_id = d.doc_id
            JOIN good ON good.doc_id = d.doc_id
            WHERE substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  < {_THRESH_SQL}
        ),
        t AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(lower(text),
                       '{TOKEN_RE}')) AS INTEGER) AS n_tokens
            FROM samp
        ),
        c AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY doc_id) AS cum
            FROM t
        ),
        b AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE)
                              / {PACK_BUDGET}) AS BIGINT) AS bin_id
            FROM c
        )
        SELECT doc_id, lang, n_tokens, bin_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang, bin_id
                                       ORDER BY doc_id) AS INTEGER)
                   AS pos_in_bin
        FROM b
    """


_W_WHOLE_SQL = ("CASE lang "
                + " ".join(f"WHEN '{lang}' THEN {w}"
                           for lang, (w, _) in WEIGHTED_EPOCHS.items())
                + f" ELSE {WEIGHTED_DEFAULT[0]} END")
_W_FRAC_SQL = ("CASE lang "
               + " ".join(f"WHEN '{lang}' THEN '{hx}'"
                          for lang, (_, hx) in WEIGHTED_EPOCHS.items())
               + f" ELSE '{WEIGHTED_DEFAULT[1]}' END")

_MIX_TARGET_CASE = ("CASE lang " + " ".join(
    f"WHEN '{lg}' THEN {share}"
    for lg, share in sorted(MIXTURE_TARGETS.items())
) + " ELSE 0.0 END")

ORACLES = {
    "corpus_mixture_plan": f"""
        WITH pl AS (
            SELECT lang, COUNT(*) AS n_docs,
                   SUM(len(regexp_extract_all(lower(text),
                           '[a-z0-9]+'))) AS n_tokens
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT SUM(n_tokens) AS total_tokens FROM pl)
        SELECT lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                   AS actual_share,
               {_MIX_TARGET_CASE} AS target_share,
               CASE WHEN n_tokens > 0
                    THEN LEAST(({_MIX_TARGET_CASE})
                               / (CAST(n_tokens AS DOUBLE)
                                  / CAST(total_tokens AS DOUBLE)),
                               {MIXTURE_MAX_UPSAMPLE})
                    WHEN ({_MIX_TARGET_CASE}) > 0
                    THEN {MIXTURE_MAX_UPSAMPLE}
                    ELSE 0.0 END AS mixture_weight
        FROM pl CROSS JOIN tot
    """,
    "chunk_documents": f"""
        WITH d AS (
            SELECT doc_id, lang, text,
                   CAST(1 + GREATEST(0,
                       CEIL(CAST(length(text) - {CHUNK_SIZE} AS DOUBLE)
                            / {CHUNK_STRIDE})) AS INTEGER) AS n_chunks
            FROM documents
        ),
        e AS (
            SELECT doc_id, lang, n_chunks, text,
                   CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx
            FROM d
        )
        SELECT doc_id, lang, n_chunks, chunk_idx,
               CAST(length(substr(text, chunk_idx * {CHUNK_STRIDE} + 1,
                                  {CHUNK_SIZE})) AS INTEGER) AS chunk_len,
               md5(substr(text, chunk_idx * {CHUNK_STRIDE} + 1,
                          {CHUNK_SIZE})) AS chunk_md5
        FROM e
    """,
    "sample_split": f"""
        SELECT doc_id, lang, split_key,
               CASE WHEN split_key < '{SPLIT_TRAIN_HEX}' THEN 'train'
                    WHEN split_key < '{SPLIT_VAL_HEX}' THEN 'validation'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, lang,
                   substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS split_key
            FROM documents
        )
    """,
    "sample_weighted": f"""
        WITH d AS (
            SELECT doc_id, lang,
                   {_W_WHOLE_SQL}
                   + CASE WHEN substr(md5('weight:'
                                          || CAST(doc_id AS VARCHAR)), 1, 8)
                          < {_W_FRAC_SQL} THEN 1 ELSE 0 END AS n_copies
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(n_copies AS INTEGER) AS n_copies,
               CAST(unnest(range(0, n_copies)) AS INTEGER) AS epoch
        FROM d WHERE n_copies > 0
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang, sample_key FROM (
            SELECT doc_id, lang,
                   substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS sample_key
            FROM documents
        ) WHERE sample_key < {_THRESH_SQL}
    """,
    "pack_token_bins": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(lower(text),
                       '{TOKEN_RE}')) AS INTEGER) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY doc_id) AS cum
            FROM t
        ),
        b AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE)
                              / {PACK_BUDGET}) AS BIGINT) AS bin_id
            FROM c
        )
        SELECT doc_id, lang, n_tokens, bin_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang, bin_id
                                       ORDER BY doc_id) AS INTEGER)
                   AS pos_in_bin
        FROM b
    """,
    "text_contamination": f"""
        WITH {_SH_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        bench AS (
            SELECT DISTINCT s FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        hits AS (
            SELECT sh.doc_id, COUNT(*) AS n_hits
            FROM sh JOIN bench USING (s)
            WHERE sh.doc_id % {CONTAM_BENCH_MOD} <> 0
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(sizes.n, 0) AS n_shingles,
               COALESCE(hits.n_hits, 0) AS n_contaminated,
               COALESCE(CAST(hits.n_hits AS DOUBLE) / NULLIF(sizes.n, 0),
                        0.0) AS contamination_ratio,
               COALESCE(CAST(hits.n_hits AS DOUBLE) / NULLIF(sizes.n, 0),
                        0.0) >= {CONTAM_TAU} AS is_contaminated
        FROM documents d
        LEFT JOIN sizes ON sizes.doc_id = d.doc_id
        LEFT JOIN hits ON hits.doc_id = d.doc_id
        WHERE d.doc_id % {CONTAM_BENCH_MOD} <> 0
    """,
    "text_pii_redact": f"""
        WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '{EMAIL_RE}'))
                    AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(aug, '{PHONE_RE}'))
                    AS INTEGER) AS n_phones,
               md5(regexp_replace(regexp_replace(aug, '{EMAIL_RE}',
                       '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g'))
                   AS clean_md5
        FROM a
    """,
}

ORACLES["corpus_build"] = _corpus_build_oracle()

ORACLES["corpus_manifest"] = f"""
    WITH shards AS ({_corpus_build_oracle()})
    SELECT lang, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id)) AS members_md5
    FROM shards GROUP BY 1, 2
"""


def _corpus_stats_oracle() -> str:
    from .text import ORACLES as TEXT_ORACLES  # noqa: PLC0415

    quality_sql = TEXT_ORACLES["text_quality_score"]
    return f"""
        WITH qs AS (SELECT doc_id, quality_score FROM ({quality_sql})),
        f AS (
            SELECT d.lang,
                   CAST(len(regexp_extract_all(lower(d.text),
                       '{TOKEN_RE}')) AS INTEGER) AS n_tokens,
                   d.doc_id = MIN(d.doc_id)
                       OVER (PARTITION BY md5(d.text)) AS canon,
                   qs.quality_score >= {QUALITY_TAU} AS q,
                   substr(md5('sample:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                       < {_THRESH_SQL} AS samp
            FROM documents d JOIN qs ON qs.doc_id = d.doc_id
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_canonical,
               CAST(SUM(CASE WHEN canon AND q THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality,
               CAST(SUM(CASE WHEN canon AND q AND samp THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sampled,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN canon AND q AND samp THEN n_tokens
                        ELSE 0 END) AS BIGINT) AS sampled_tokens,
               1.0 - CAST(SUM(CASE WHEN canon THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS dup_rate
        FROM f GROUP BY 1
    """


ORACLES["corpus_stats"] = _corpus_stats_oracle()
ORACLES["text_contamination_semantic"] = _sem_contam_oracle()
