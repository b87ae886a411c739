"""Dedup-on-ingest: near-duplicate flagging for STREAMING documents
(SURVEY §2.9 × §2.5).

The batch dedup family (operators/dedup.py) is pair-join shaped and
inherently batch; what a streaming pipeline actually needs is the
front half — signature each incoming document and flag it against the
historical corpus BEFORE it lands, so near-dups never enter the lake.
Structured Streaming expresses this exactly: a stateless per-row
signature map plus a stream-static equi-join against the corpus band
table. The corpus side has three forms, cheapest first:
:func:`roll_corpus_bands` (r14) MERGEs only the NEW documents' band
rows into the managed table per roll; :func:`materialize_corpus_bands`
rebuilds it whole (bootstrap / compaction / post-delete);
passing the live :func:`corpus_band_table` frame works for small
corpora but re-executes the corpus-wide signature fold every
micro-batch.  Roll pickup: a stream-static join re-EXECUTES its
static plan per batch but resolves it once at query start, so new
table versions need :func:`flag_near_dups_foreach_batch`, which
re-reads the latest manifest per batch (a JSON read + thin parquet
scan — pinned by tests/test_streaming.py).

Signature parity is the load-bearing constraint: a streamed doc must
get the SAME 64-bit signature the batch operator would give it, or
ingest-time flags disagree with nightly-batch dedup. Since r15 that
parity holds BY CONSTRUCTION — :func:`simhash_tag` is the single
implementation of the 64-bit bit contract, and the batch stage
(``operators.dedup._simhash_signatures_wide``) is a projection of it
(VERDICT r14 item 3 retired the batch twin's two ``cache()``
barriers, which materialized a corpus-sized token/md5 cache and were
illegal on streams anyway). The fold needs no cache: ONE
``aggregate`` per hash family folds the md5 array into a 32-counter
vote array, and a single-element-explode Generate node keeps project
collapse and pushdown substitution from re-inlining that fold into
downstream derivations.  ``tests/test_streaming.py`` pins the bits
against a pure-Python md5 reference and stream == batch end-to-end;
the DuckDB oracle pins them cross-engine.

At 100 TB: the tagger is map-only (embarrassingly parallel, no state
store, no watermark); the band join broadcasts or shuffles the
CORPUS BAND TABLE, which is 4 thin rows per historical doc — the
stream side never self-joins, so ingest cost is linear in the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..operators.dedup import (
    SIMHASH_WIDE_BANDS,
    SIMHASH_WIDE_BITS,
    SIMHASH_WIDE_MAX_HAMMING,
    SIMHASH_WIDE_SALT,
)

_HALF = SIMHASH_WIDE_BITS // 2
_BAND_WIDTH = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BANDS


def _family_bits(md5_arr) -> "F.Column":
    """32 signature bits for one hash family: fold the doc's md5
    array into a vote-counter array in ONE aggregate (streaming-safe
    — no cache barrier needed because the array expression is
    referenced exactly once), then take each counter's sign.
    Bit definition is identical to the batch stage: position i votes
    +1 iff md5 hex char i has its high bit set (char >= '8')."""
    votes = F.aggregate(
        md5_arr,
        F.array_repeat(F.lit(0), _HALF),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(_HALF)),
                lambda i: F.when(
                    h.substr(i, F.lit(1)) >= "8", 1).otherwise(-1),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.array_join(
        F.transform(votes,
                    lambda v: F.when(v > 0, F.lit("1")).otherwise("0")),
        "",
    )


def simhash_tag(docs: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, simhash, sig_hi, sig_lo) for each document with at least
    one token — a stateless per-row map that runs unchanged on batch
    and streaming frames. THE single implementation of the 64-bit
    signature bit contract (r15): the batch
    ``_simhash_signatures_wide`` stage projects this frame, and the
    bits are pinned against a pure-Python md5 reference
    (tests/test_streaming.py) and the DuckDB oracle."""
    td = F.array_distinct(tokens(F.col(text_col)))
    sig = F.concat(
        _family_bits(F.transform(td, lambda t: F.md5(t))),
        _family_bits(F.transform(
            td, lambda t: F.md5(F.concat(t, F.lit(SIMHASH_WIDE_SALT))))),
    )
    # Single-element explode = a streaming-safe evaluation barrier: a
    # Generate node blocks project collapse AND pushdown substitution,
    # so the two vote folds run once per row.  Without it, downstream
    # derivations (sig_hi/sig_lo, band substrings, pushed isnotnull
    # join predicates) each inline the whole fold — measured 6 folds
    # per side in the flag_near_dups join plan (pinned at 2 by
    # tests/test_streaming.py).
    return (
        docs.where(F.size(td) > 0)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(F.array(sig)).alias("simhash"))
        .select(
            "doc_id",
            "simhash",
            F.conv(F.substring("simhash", 1, _HALF), 2, 10)
            .cast("long").alias("sig_hi"),
            F.conv(F.substring("simhash", _HALF + 1, _HALF), 2, 10)
            .cast("long").alias("sig_lo"),
        )
    )


def corpus_band_table(docs: DataFrame) -> DataFrame:
    """The STATIC side of the ingest join: 4 thin (doc_id, sig_hi,
    sig_lo, band_idx, band) rows per historical document.

    Passing this LIVE DataFrame as the static side works (and the
    end-to-end test keeps that path for small corpora), but a
    stream-static join re-EXECUTES the static plan every micro-batch
    — with a live frame that is the 64-bit signature fold over the
    ENTIRE historical corpus, per batch.  At 100 TB that is a
    corpus-scale recompute on every trigger.  The scale path is
    :func:`materialize_corpus_bands` +
    :func:`flag_near_dups_foreach_batch`: write these rows through
    the managed-table layer once per corpus roll, and let each
    micro-batch re-read only the LATEST manifest (a JSON read) plus
    the thin parquet band files — per-batch cost becomes the join
    itself, and a corpus roll is picked up mid-query without a
    restart."""
    return simhash_tag(docs).select(
        "doc_id",
        "sig_hi",
        "sig_lo",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_idx"),
                    F.substring("simhash", j * _BAND_WIDTH + 1,
                                _BAND_WIDTH).alias("band"),
                )
                for j in range(SIMHASH_WIDE_BANDS)
            ])
        ).alias("bd"),
    ).select("doc_id", "sig_hi", "sig_lo", "bd.band_idx", "bd.band")


def materialize_corpus_bands(docs: DataFrame, table_path: str) -> int:
    """Compute :func:`corpus_band_table` ONCE and commit it through the
    managed-table layer; returns the committed version.  Call this per
    corpus roll (nightly rebuild, backfill, compaction) — the signature
    fold over the historical corpus runs exactly once per roll instead
    of once per micro-batch.  ``mode="overwrite"`` keeps the table a
    pure function of the current corpus while the table layer's
    versioning retains prior rolls for time travel / CDF audits.
    For day-to-day rolls prefer :func:`roll_corpus_bands` — it folds
    only the NEW documents (O(new docs), not O(corpus)); this full
    rebuild is the bootstrap / compaction / post-delete path."""
    from ..tables.format import ManagedTable  # noqa: PLC0415 (cycle-free lazy)

    return ManagedTable(table_path).write(
        corpus_band_table(docs), mode="overwrite",
        operation="corpus_band_roll",
    )


def roll_corpus_bands(new_docs: DataFrame, table_path: str,
                      compact_max_files: int | None = 64) -> int:
    """INCREMENTAL corpus roll: signature-fold ONLY the new documents
    and MERGE their 4 band rows into the materialized table on
    (doc_id, band_idx) — changed docs upsert, unseen docs insert, the
    standing corpus is untouched.  A nightly roll therefore costs
    O(new docs) in signature work (plus the table layer's
    footer-stats-pruned rewrite of overlapping files), not the
    O(corpus) recompute of :func:`materialize_corpus_bands` — at
    100 TB that is the difference between folding a day's ingest and
    folding the lake.  First roll bootstraps the table.

    Retention (r15): every roll ends with the table layer's
    ``maybe_compact`` small-files policy — a no-op until the snapshot
    exceeds ``compact_max_files`` files, then one bin-pack commit —
    so a year of nightly MERGEs cannot accumulate unbounded small
    band files (``None`` disables; physical reclaim of the
    superseded files is the caller's ``vacuum()`` within its safety
    horizon, same split as every other managed table).  Losing the
    compaction's OCC race skips it, never fails the roll.

    ``forget_documents(band_table_path=...)`` purges forgotten docs'
    band rows row-level; the full rebuild remains the recovery path
    for bulk out-of-band surgery."""
    from ..tables.format import ManagedTable  # noqa: PLC0415

    tbl = ManagedTable(table_path)
    bands = corpus_band_table(new_docs)
    if not tbl.exists():
        return tbl.write(bands, operation="corpus_band_roll")
    version = tbl.merge(bands, keys=["doc_id", "band_idx"])
    if compact_max_files is not None:
        # cluster by doc_id: rolls and forgets prune on doc_id footer
        # stats, so the bin-pack re-sorts fragments into disjoint
        # doc_id ranges — post-compaction deletes/MERGEs stay
        # O(touched files)
        compacted = tbl.maybe_compact(new_docs.sparkSession,
                                      max_files=compact_max_files,
                                      cluster_by=["doc_id"])
        if compacted is not None:
            version = compacted
    return version


def read_corpus_bands(spark, table_path: str) -> DataFrame:
    """Latest-version read of the materialized band table — a manifest
    (JSON) resolve plus a parquet scan of 4-thin-rows-per-doc files;
    NO signature recompute."""
    from ..tables.format import ManagedTable  # noqa: PLC0415

    return ManagedTable(table_path).read(spark)


def flag_near_dups_foreach_batch(table_path: str, sink):
    """``foreachBatch`` factory for the MATERIALIZED ingest flagger.

    Structured Streaming resolves a plain stream-static join's static
    side once at query start, so a managed-table snapshot DataFrame
    would pin the version current at ``start()`` for the life of the
    query.  ``foreachBatch`` restores roll pickup: the returned
    function re-reads the LATEST table version at every micro-batch
    (cheap — one manifest JSON + the thin band parquet) and hands
    ``flag_near_dups(batch, bands)`` to ``sink(flags_df, batch_id)``.
    Per-batch cost is the band join on batch-sized input; the
    corpus-scale signature fold never appears in the per-batch plan
    (pinned by tests/test_streaming.py)."""
    def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
        bands = read_corpus_bands(batch_df.sparkSession, table_path)
        sink(flag_near_dups(batch_df, bands), batch_id)

    return _per_batch


def flag_near_dups(incoming: DataFrame,
                   corpus_bands: DataFrame) -> DataFrame:
    """(doc_id, dup_of, hamming) for every incoming document within
    Hamming ≤ k of a historical one — ``incoming`` may be a
    streaming frame (the stream side of a stream-static equi-join),
    ``corpus_bands`` is :func:`corpus_band_table` output.

    Same verification discipline as the batch operator: one
    xor + bit_count per 32-bit half, and each (incoming, historical)
    pair emits exactly once from its FIRST agreeing band — the
    first-match predicate needs only the signature ints already on
    the join row, so no post-join distinct is needed (distinct on a
    stream would demand state the flagger doesn't otherwise need)."""
    new = corpus_band_table(incoming).select(
        F.col("doc_id").alias("in_id"), F.col("sig_hi").alias("in_hi"),
        F.col("sig_lo").alias("in_lo"), "band_idx", "band",
    )
    hist = corpus_bands.select(
        F.col("doc_id").alias("dup_of"), F.col("sig_hi").alias("c_hi"),
        F.col("sig_lo").alias("c_lo"),
        F.col("band_idx").alias("band_idx_c"), F.col("band").alias("band_c"),
    )

    def band_int(hi: str, lo: str, k: int):
        src = F.col(hi) if k < 2 else F.col(lo)
        if k % 2 == 0:
            return F.shiftrightunsigned(src, _BAND_WIDTH)
        return src.bitwiseAND(F.lit((1 << _BAND_WIDTH) - 1))

    no_earlier = F.lit(True)
    for k in range(SIMHASH_WIDE_BANDS - 1):
        no_earlier = no_earlier & (
            (F.col("band_idx") <= k)
            | (band_int("in_hi", "in_lo", k) != band_int("c_hi", "c_lo", k))
        )
    hamming = (
        F.bit_count(F.col("in_hi").bitwiseXOR(F.col("c_hi")))
        + F.bit_count(F.col("in_lo").bitwiseXOR(F.col("c_lo")))
    )
    return (
        new.join(
            hist,
            (F.col("band_idx") == F.col("band_idx_c"))
            & (F.col("band") == F.col("band_c"))
            & (F.col("in_id") != F.col("dup_of")),
        )
        .where(no_earlier)
        .select(F.col("in_id").alias("doc_id"), "dup_of",
                hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= SIMHASH_WIDE_MAX_HAMMING)
    )
